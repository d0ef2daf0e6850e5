"""Call-time vs batch size for the floor-dominated small-d configs.

The tunneled backend costs ~35 ms per device call independent of
payload (doc/performance.md: eager-dispatch cliff), so ms/pulse for
small workloads is set by how much batch the call amortizes.  This
prints total call time and ms/pulse at several batch sizes for the
dd / hadamard / grad / rb benchmark pipelines.

Run: python scripts/exp_batch_knee.py [dd|hadamard|grad|rb ...]
"""
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))


def _time_call(fn, make_input, iters=4):
    import jax
    out = fn(make_input(0))
    np.asarray(jax.block_until_ready(out))
    times = []
    for i in range(iters):
        x = jax.block_until_ready(make_input(i + 1))
        t0 = time.perf_counter()
        for leaf in jax.tree.leaves(fn(x)):
            np.asarray(leaf)
        times.append(time.perf_counter() - t0)
    return min(times)


def run_dd(batches):
    import jax
    import jax.numpy as jnp
    from filter_functions_tpu import functional
    from filter_functions_tpu.basis import Basis
    from filter_functions_tpu.cplx import asc
    from filter_functions_tpu.models import dd

    base = dd.dd_pulse(16, tau=np.pi, tau_pi=1e-9, dd_type='cpmg')
    omega = jnp.asarray(np.logspace(0, 2, 400))

    def batched_ff(p, omega):
        def single(c_coeffs, n_coeffs, dt):
            one = functional.PulseArrays(p.c_opers, c_coeffs, p.n_opers,
                                         n_coeffs, dt, p.basis)
            ctrl = functional.control_matrix(one, omega)
            return (ctrl.re**2 + ctrl.im**2).sum(axis=1)
        return jax.vmap(single)(p.c_coeffs, p.n_coeffs, p.dt)

    fn = jax.jit(batched_ff)
    for batch in batches:
        rng = np.random.default_rng(0)
        scales = 1 + 0.1 * rng.random(batch)

        def make(i):
            s = jnp.asarray(scales * (1 + 1e-13 * i))
            return functional.PulseArrays(
                asc(base.c_opers),
                jnp.broadcast_to(jnp.asarray(base.c_coeffs),
                                 (batch,) + base.c_coeffs.shape)
                / s[:, None, None],
                asc(base.n_opers),
                jnp.broadcast_to(jnp.asarray(base.n_coeffs),
                                 (batch,) + base.n_coeffs.shape),
                jnp.asarray(base.dt[None]) * s[:, None],
                Basis.ggm(2).dev)

        t = _time_call(lambda x: fn(x, omega), make)
        print(f'dd batch {batch:5d}: {t * 1e3:8.1f} ms total, '
              f'{t / batch * 1e3:6.3f} ms/pulse', flush=True)


def run_hadamard(batches):
    import jax
    import jax.numpy as jnp
    from filter_functions_tpu import functional
    from filter_functions_tpu.basis import Basis
    from filter_functions_tpu.cplx import asc

    sx = np.array([[0, 1], [1, 0]], complex)
    sz = np.array([[1, 0], [0, -1]], complex)
    omega_np = np.logspace(-2, 2, 400)
    omega = jnp.asarray(omega_np)
    spectrum = jnp.asarray(1e-3 / omega_np)
    c_coeffs0 = np.array([[np.pi / 4, np.pi / 2]])
    n_coeffs0 = np.array([[1.0, 1.0]])
    dt0 = np.array([1.0, 1.0])

    fn = jax.jit(functional.batched_infidelity, static_argnames='chunk_size')
    for batch in batches:
        rng = np.random.default_rng(0)
        scales = 1 + 0.1 * rng.random(batch)

        def make(i):
            s = jnp.asarray(scales * (1 + 1e-13 * i))
            return functional.PulseArrays(
                asc(sx[None]),
                jnp.asarray(c_coeffs0)[None] / s[:, None, None],
                asc(sz[None]),
                jnp.broadcast_to(jnp.asarray(n_coeffs0),
                                 (batch, 1, 2)),
                jnp.asarray(dt0)[None] * s[:, None],
                Basis.pauli(1).dev)

        t = _time_call(lambda x: fn(x, spectrum, omega), make)
        print(f'hadamard batch {batch:5d}: {t * 1e3:8.1f} ms total, '
              f'{t / batch * 1e3:6.3f} ms/pulse', flush=True)


def run_rb(n_seqs):
    import jax.numpy as jnp
    from filter_functions_tpu.models import rb

    omega_np = np.geomspace(1e-2, 1e2, 301)
    omega = jnp.asarray(omega_np)
    for n_seq in n_seqs:
        rng = np.random.default_rng(0)
        seqs = []
        for _ in range(n_seq):
            idx, rec = rb.sample_sequence(20, rng)
            seqs.append(idx + [rec])
        seqs = np.asarray(seqs)

        def make(i):
            return jnp.asarray(1e-3 / omega_np * (1 + 1e-13 * i))

        t = _time_call(
            lambda s: rb.batched_rb_infidelities(seqs, omega, s), make)
        print(f'rb n_seq {n_seq:5d}: {t * 1e3:8.1f} ms total, '
              f'{t / n_seq * 1e3:6.3f} ms/seq', flush=True)


def run_grad(batches):
    import bench
    for batch in batches:
        # reuse the bench's own builder at a different batch size
        out = bench.config_grad(iters=3, batch=batch, n_omega=200)
        print(f'grad batch {batch:5d}: '
              f'{out["value"] * batch:8.1f} ms total, '
              f'{out["value"]:6.3f} ms/pulse '
              f'({out["vs_baseline"]:.1f}x)', flush=True)


if __name__ == '__main__':
    which = sys.argv[1:] or ['dd', 'hadamard', 'rb']
    if 'dd' in which:
        run_dd([128, 256, 512, 1024])
    if 'hadamard' in which:
        run_hadamard([256, 1024, 4096])
    if 'rb' in which:
        run_rb([128, 512, 1024])
    if 'grad' in which:
        run_grad([64, 256, 512])
