"""Overhead attribution for the batched second-order ETM entry point
(bench.config_second_order shapes: d=4, 8 segments, 200 frequencies,
batch 64) on the tunneled accelerator.

Three questions, answered by A/B timing (median of 5):

A. bench-as-before: every input (operators, coefficients, dt,
   spectrum, frequencies) staged host->device inside the timed call.
B. staged-constants: loop constants staged once; the timed call stages
   only the fresh coefficient batch (the production pattern).
C. device-resident: everything on device; pure dispatch+exec+fetch.

And the pipelining sweep: n_sub back-to-back dispatches before one
fetch drain -- steady-state throughput vs single-call latency.

Round-5 measurements (one v5e chip, tunneled):
    A 108.9 ms/call | B 65.6 | C 61.4     (batch 64, second_order)
    pipelined x1 1.045 ms/eval, x3 0.703, x6 0.660
The ~35 ms dispatch floor plus one fetch round dominates a single
call; back-to-back dispatch overlaps it with device compute, so the
marginal batch-64 call costs ~37 ms ~= pure compute.

Run: python scripts/exp_so_staging.py
"""
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))


def main():
    import jax
    import jax.numpy as jnp
    import filter_functions_tpu as ff_tpu
    from filter_functions_tpu import functional, numeric
    from filter_functions_tpu.cplx import asc

    rng = np.random.default_rng(7)
    d, n_dt, batch, n_omega = 4, 8, 64, 200

    def herm_traceless(k):
        a = rng.standard_normal((k, d, d)) + 1j * rng.standard_normal(
            (k, d, d))
        a = (a + a.conj().swapaxes(-1, -2)) / 2
        return a - (np.trace(a, axis1=-2, axis2=-1)[:, None, None]
                    * np.eye(d) / d)

    c_opers, n_opers = herm_traceless(2), herm_traceless(2)
    c_coeffs = rng.standard_normal((batch, 2, n_dt))
    n_coeffs = np.ones((batch, 2, n_dt))
    dt = np.broadcast_to(1 - rng.random(n_dt), (batch, n_dt)).copy()
    omega = np.geomspace(1e-1, 1e1, n_omega)
    spectrum = 1e-4 / omega
    basis = ff_tpu.Basis.ggm(d)

    def block(x):
        for leaf in jax.tree.leaves(x):
            np.asarray(leaf)

    def med5(fn):
        ts = []
        for i in range(5):
            t0 = time.perf_counter()
            fn(i)
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[2] * 1e3

    def ours_A(i):
        p = functional.PulseArrays(
            c_opers=asc(c_opers),
            c_coeffs=jnp.asarray(c_coeffs * (1.0 + 1e-14 * (i + 1))),
            n_opers=asc(n_opers), n_coeffs=jnp.asarray(n_coeffs),
            dt=jnp.asarray(dt), basis=basis.dev)
        np.asarray(functional.batched_error_transfer_matrix(
            p, spectrum, omega, basis, second_order=True))

    ours_A(0)
    print(f'A all-staged-per-call : {med5(ours_A):7.2f} ms/call')

    c_opers_d, n_opers_d = asc(c_opers), asc(n_opers)
    n_coeffs_d, dt_d = jnp.asarray(n_coeffs), jnp.asarray(dt)
    s = jnp.asarray(np.broadcast_to(spectrum, (2, n_omega)))
    omega_d = jnp.asarray(omega)
    block([c_opers_d, n_opers_d, n_coeffs_d, dt_d, s, omega_d])

    def call(cc):
        p = functional.PulseArrays(
            c_opers=c_opers_d, c_coeffs=jnp.asarray(cc),
            n_opers=n_opers_d, n_coeffs=n_coeffs_d, dt=dt_d,
            basis=basis.dev)
        return functional.batched_error_transfer_matrix(
            p, s, omega_d, basis, second_order=True)

    def ours_B(i):
        np.asarray(call(c_coeffs * (1.0 + 1e-14 * (i + 1))))

    ours_B(0)
    print(f'B staged-constants    : {med5(ours_B):7.2f} ms/call')

    cc_d = jnp.asarray(c_coeffs)
    block(cc_d)

    def ours_C(i):
        p = functional.PulseArrays(
            c_opers=c_opers_d, c_coeffs=cc_d * (1.0 + 1e-14 * (i + 1)),
            n_opers=n_opers_d, n_coeffs=n_coeffs_d, dt=dt_d,
            basis=basis.dev)
        np.asarray(functional.batched_error_transfer_matrix(
            p, s, omega_d, basis, second_order=True))

    ours_C(0)
    print(f'C device-resident     : {med5(ours_C):7.2f} ms/call')

    for n_sub in (1, 3, 6):
        def pipe(i):
            outs = [call(c_coeffs * (1.0 + 1e-14 * (i * 7 + k + 1)))
                    for k in range(n_sub)]
            for o in outs:
                np.asarray(o)
        pipe(0)
        t = med5(pipe)
        print(f'pipelined x{n_sub}: {t:7.2f} ms total  '
              f'{t / (n_sub * batch):6.3f} ms/eval')


if __name__ == '__main__':
    main()
