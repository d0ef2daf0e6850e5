"""Experiment: software-pipelined (skewed) chunking of the batched
flagship infidelity.

The production path evaluates the batch in sequential lax.map chunks;
within one chunk the pipeline is a serial dependency chain, so the MXU
idles during the VPU-heavy stages (diag, transforms, integral tables,
digit slicing) and vice versa.  The skewed variant carries chunk i's
contraction inputs through the scan and computes them concurrently
with chunk i+1's preparation, giving the scheduler independent MXU and
VPU work in every scan body.

Run: python scripts/exp_pipeline.py
"""
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))


def main():
    import jax
    from filter_functions_tpu import config
    config.enable_host_cpu()

    import jax.numpy as jnp
    from filter_functions_tpu import functional, numeric, util
    from filter_functions_tpu.cplx import ceinsum

    from bench import build_inputs, _block, _jitter_eps, CHUNK
    _, p, batched, omega, spectrum = build_inputs()
    omega_j, spectrum_j = jnp.asarray(omega), jnp.asarray(spectrum)
    batch = batched.c_coeffs.shape[0]
    d = p.c_opers.shape[-1]

    def prep(c_coeffs, n_coeffs, dt):
        ham = ceinsum('jmn,jg->gmn', batched.c_opers, c_coeffs)
        eigvals, eigvecs, propagators = numeric._diagonalize_jit(ham, dt)
        t = jnp.concatenate([jnp.zeros(1, dt.dtype), jnp.cumsum(dt)])
        G = eigvals.shape[0]
        return numeric._ctrlmat_step_terms(
            eigvals, eigvecs, propagators[:-1], omega_j, batched.basis,
            batched.n_opers, n_coeffs, dt, t[:-1],
            transform_dtype=config.transform_dtype(G * d * d))

    def contract(terms, spec):
        _, n_t, b_t, ph, integral = terms
        ctrl = numeric._ctrlmat_contract(n_t, integral, b_t, ph)
        diag = (ctrl.re * ctrl.re + ctrl.im * ctrl.im).sum(axis=1)
        return util.integrate(diag * spec, omega_j) / (2 * np.pi * d)

    def skewed(b, spec, chunk_size):
        n_chunks = batch // chunk_size
        parts = tuple(a.reshape((n_chunks, chunk_size) + a.shape[1:])
                      for a in (b.c_coeffs, b.n_coeffs, b.dt))
        vprep = jax.vmap(prep)
        vcontract = jax.vmap(lambda t: contract(t, spec))

        carry0 = vprep(parts[0][0], parts[1][0], parts[2][0])

        def body(carry, xs):
            cc, nc, dts = xs
            out = vcontract(carry)           # chunk i (MXU-heavy)
            new = vprep(cc, nc, dts)         # chunk i+1 (VPU-heavy)
            return new, out
        last, outs = jax.lax.scan(
            body, carry0, tuple(x[1:] for x in parts))
        out_last = vcontract(last)
        n_nops = out_last.shape[-1]
        return jnp.concatenate([outs.reshape(-1, n_nops),
                                out_last.reshape(-1, n_nops)])

    fn_prod = jax.jit(lambda b, s: functional.batched_infidelity(
        b, s, omega_j, chunk_size=CHUNK))
    fn_skew = jax.jit(lambda b, s, c=CHUNK: skewed(b, s, c))

    want = _block(fn_prod(batched, spectrum_j))
    got = _block(fn_skew(batched, spectrum_j))
    err = np.abs(np.asarray(got) - np.asarray(want)).max()
    print(f'value agreement: {err:.2e}')

    for name, fn in (('production lax.map', fn_prod),
                     ('skewed scan', fn_skew)):
        times = []
        for i in range(5):
            s_i = _block(spectrum_j * (1.0 + _jitter_eps(i)))
            t0 = time.perf_counter()
            _block(fn(batched, s_i))
            times.append(time.perf_counter() - t0)
        print(f'{name:<22} {min(times) / batch * 1e3:.2f} ms/pulse',
              flush=True)


if __name__ == '__main__':
    main()
