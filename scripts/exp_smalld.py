"""Stage attribution for the small-d (dd config) batched pipeline.

Same k-fold method as scripts/attribute.py (doc/performance.md), but
each stage is vmapped over the 128-pulse batch exactly like
bench.config_dd's fused executable, so the numbers decompose the
75 ms/call that config spends.

Run: python scripts/exp_smalld.py [--cpu]
"""
import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

K_LO, K_HI = 1, 3


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--cpu', action='store_true')
    args = parser.parse_args()

    import jax
    if args.cpu:
        jax.config.update('jax_platforms', 'cpu')
        jax.config.update('jax_enable_x64', True)

    import jax.numpy as jnp
    from filter_functions_tpu import functional, numeric, util
    from filter_functions_tpu.basis import Basis
    from filter_functions_tpu.cplx import asc, ceinsum
    from filter_functions_tpu.models import dd

    batch, n, n_omega = 128, 16, 400
    tau = np.pi
    omega = jnp.asarray(np.logspace(0, 2, n_omega))
    base = dd.dd_pulse(n, tau=tau, tau_pi=1e-9, dd_type='cpmg')
    rng = np.random.default_rng(0)
    scales = 1 + 0.1 * rng.random(batch)
    p = functional.PulseArrays(
        asc(base.c_opers),
        jnp.broadcast_to(jnp.asarray(base.c_coeffs),
                         (batch,) + base.c_coeffs.shape)
        / jnp.asarray(scales)[:, None, None],
        asc(base.n_opers),
        jnp.broadcast_to(jnp.asarray(base.n_coeffs),
                         (batch,) + base.n_coeffs.shape),
        jnp.asarray(base.dt[None] * scales[:, None]),
        Basis.ggm(2).dev)

    # ---- per-pulse intermediates, batched ----
    @jax.jit
    def intermediates(c_coeffs_b, dt_b):
        def one(c_coeffs, dt):
            ham = ceinsum('jmn,jg->gmn', p.c_opers, c_coeffs)
            eigvals, eigvecs, propagators = numeric._diagonalize_jit.\
                __wrapped__(ham, dt)
            ev_prop = numeric._propagate_eigenvectors(propagators[:-1],
                                                      eigvecs)
            n_t = numeric._transform_hamiltonian(eigvecs, p.n_opers,
                                                 p.n_coeffs[0])
            b_t = numeric._conjugate_d2(ev_prop, p.basis)
            t = jnp.concatenate([jnp.zeros(1, dt.dtype), jnp.cumsum(dt)])
            ph = numeric.cexp(t[:-1, None] * omega[None, :])
            integral = numeric._first_order_integral_batched(
                omega, eigvals, dt)
            ctrl = numeric._ctrlmat_contract(n_t, integral, b_t, ph)
            return dict(ham=ham, eigvals=eigvals, eigvecs=eigvecs,
                        propagators=propagators, ev_prop=ev_prop, n_t=n_t,
                        b_t=b_t, ph=ph, integral=integral, ctrl=ctrl,
                        dt=dt, t=t)
        return jax.vmap(one)(c_coeffs_b, dt_b)

    iv = jax.block_until_ready(intermediates(p.c_coeffs, p.dt))

    def jitter(x, eps):
        return jax.tree.map(lambda a: a * (1.0 + eps), x)

    def reduce_out(x):
        return sum(l.sum() for l in jax.tree.leaves(x))

    def s_diag(x):
        def one(h, dt):
            return numeric._diagonalize_jit.__wrapped__(h, dt)
        return jax.vmap(one)((x), iv['dt'])

    def s_transforms(x):
        def one(ev, props):
            out1 = numeric._propagate_eigenvectors(props[:-1], ev)
            out2 = numeric._transform_hamiltonian(ev, p.n_opers,
                                                  p.n_coeffs[0])
            return out1, out2
        ev, props = x
        return jax.vmap(one)(ev, props)

    def s_basis_t(x):
        def one(evp):
            return numeric._conjugate_d2(evp, p.basis)
        return jax.vmap(one)(x)

    def s_phase(x):
        def one(t):
            return numeric.cexp(t[:-1, None] * omega[None, :])
        return jax.vmap(one)(x)

    def s_integral(x):
        def one(eigvals, dt):
            return numeric._first_order_integral_batched(omega, eigvals,
                                                         dt)
        ev, dt = x
        return jax.vmap(one)(ev, dt)

    def s_contract(x):
        def one(n_t, integral, b_t, ph):
            return numeric._ctrlmat_contract(n_t, integral, b_t, ph)
        return jax.vmap(one)(*x)

    def s_ff(x):
        def one(ctrl):
            return (ctrl.re**2 + ctrl.im**2).sum(axis=1)
        return jax.vmap(one)(x)

    stages = [
        ('diag(eigh+prop)', s_diag, iv['ham']),
        ('transforms', s_transforms, (iv['eigvecs'], iv['propagators'])),
        ('basis_transform', s_basis_t, iv['ev_prop']),
        ('phase', s_phase, iv['t']),
        ('integral', s_integral, (iv['eigvals'], iv['dt'])),
        ('contract', s_contract,
         (iv['n_t'], iv['integral'], iv['b_t'], iv['ph'])),
        ('ff', s_ff, iv['ctrl']),
    ]

    def timed(fn, x, k):
        def rep(x):
            out = 0.0
            for i in range(k):
                out = out + reduce_out(fn(jitter(x, 1e-14 * (i + 1))))
            return out
        j = jax.jit(rep)
        jax.block_until_ready(j(x))
        times = []
        for i in range(4):
            xi = jax.block_until_ready(jitter(x, 1e-13 * (i + 1)))
            t0 = time.perf_counter()
            np.asarray(jax.block_until_ready(j(xi)))
            times.append(time.perf_counter() - t0)
        return min(times)

    print(f'{"stage":<18} {"marginal ms":>12}', flush=True)
    total = 0.0
    for name, fn, x in stages:
        t_lo = timed(fn, x, K_LO)
        t_hi = timed(fn, x, K_HI)
        marginal = (t_hi - t_lo) / (K_HI - K_LO) * 1e3
        total += marginal
        print(f'{name:<18} {marginal:>12.2f}', flush=True)
    print(f'{"TOTAL":<18} {total:>12.2f}', flush=True)


if __name__ == '__main__':
    main()


def full_pipeline_marginal():
    """k-fold marginal of the ENTIRE batched dd pipeline (launch-
    overhead-independent chain cost), plus the plain end-to-end time."""
    import jax
    import jax.numpy as jnp
    from filter_functions_tpu import functional
    from filter_functions_tpu.basis import Basis
    from filter_functions_tpu.cplx import asc
    from filter_functions_tpu.models import dd

    batch, n, n_omega = 128, 16, 400
    omega = jnp.asarray(np.logspace(0, 2, n_omega))
    base = dd.dd_pulse(n, tau=np.pi, tau_pi=1e-9, dd_type='cpmg')
    rng = np.random.default_rng(0)
    scales = 1 + 0.1 * rng.random(batch)
    p = functional.PulseArrays(
        asc(base.c_opers),
        jnp.broadcast_to(jnp.asarray(base.c_coeffs),
                         (batch,) + base.c_coeffs.shape)
        / jnp.asarray(scales)[:, None, None],
        asc(base.n_opers),
        jnp.broadcast_to(jnp.asarray(base.n_coeffs),
                         (batch,) + base.n_coeffs.shape),
        jnp.asarray(base.dt[None] * scales[:, None]),
        Basis.ggm(2).dev)

    def batched_ff(p, omega):
        def single(c_coeffs, n_coeffs, dt):
            one = functional.PulseArrays(p.c_opers, c_coeffs, p.n_opers,
                                         n_coeffs, dt, p.basis)
            ctrl = functional.control_matrix(one, omega)
            return (ctrl.re**2 + ctrl.im**2).sum(axis=1)
        return jax.vmap(single)(p.c_coeffs, p.n_coeffs, p.dt)

    def timed_k(k):
        def rep(pp):
            out = 0.0
            for i in range(k):
                cc = pp.c_coeffs * (1.0 + 1e-14 * (i + 1))
                out = out + batched_ff(pp._replace(c_coeffs=cc),
                                       omega).sum()
            return out
        j = jax.jit(rep)
        jax.block_until_ready(j(p))
        times = []
        for i in range(4):
            pi = jax.tree.map(lambda a: a * (1.0 + 1e-13 * (i + 1)), p)
            jax.block_until_ready(pi)
            t0 = time.perf_counter()
            np.asarray(jax.block_until_ready(j(pi)))
            times.append(time.perf_counter() - t0)
        return min(times)

    t1, t3 = timed_k(1), timed_k(3)
    print(f'end-to-end k=1: {t1 * 1e3:.2f} ms')
    print(f'pipeline marginal: {(t3 - t1) / 2 * 1e3:.2f} ms')
