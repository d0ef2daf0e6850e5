"""Stage attribution for the flagship QFT benchmark.

Method (doc/performance.md): for each stage in isolation, jit one
function containing k in-line replicas of the stage, each fed a
distinctly jittered copy of the stage's own input (so XLA cannot CSE
the replicas and the backend cannot memoize); the (k_hi - k_lo) slope
is the marginal cost of the stage, independent of dispatch overhead.
Per-stage graphs are small, so compiles stay cheap on the remote
backend.

Run: python scripts/attribute.py [--cpu]
"""
import argparse
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

K_LO, K_HI = 1, 5


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--cpu', action='store_true')
    args = parser.parse_args()

    import jax
    if args.cpu:
        jax.config.update('jax_platforms', 'cpu')
        jax.config.update('jax_enable_x64', True)
    else:
        from filter_functions_tpu import config
        config.enable_host_cpu()

    import jax.numpy as jnp
    from filter_functions_tpu import numeric, util
    from filter_functions_tpu.cplx import ceinsum

    from bench import build_inputs
    _, p, _, omega, spectrum = build_inputs()
    omega = jnp.asarray(omega)
    spectrum = jnp.asarray(spectrum)

    # ---- precompute every intermediate once ----
    @jax.jit
    def intermediates(c_coeffs):
        ham = ceinsum('jmn,jg->gmn', p.c_opers, c_coeffs)
        eigvals, eigvecs, propagators = numeric._diagonalize_jit(ham, p.dt)
        ev_prop = numeric._propagate_eigenvectors(propagators[:-1], eigvecs)
        n_t = numeric._transform_hamiltonian(eigvecs, p.n_opers, p.n_coeffs)
        b_t = ceinsum('gba,kbc,gcd->gkad', ev_prop.conj(), p.basis, ev_prop)
        t = jnp.concatenate([jnp.zeros(1, p.dt.dtype), jnp.cumsum(p.dt)])
        ph = numeric.cexp(t[:-1, None] * omega[None, :])
        integral = numeric._first_order_integral_batched(omega, eigvals,
                                                         p.dt)
        ctrl = numeric._ctrlmat_contract(n_t, integral, b_t, ph)
        return dict(ham=ham, eigvals=eigvals, eigvecs=eigvecs,
                    propagators=propagators, ev_prop=ev_prop, n_t=n_t,
                    b_t=b_t, ph=ph, integral=integral, ctrl=ctrl)

    iv = jax.block_until_ready(intermediates(p.c_coeffs))

    def jitter(x, eps):
        import jax as _j
        from filter_functions_tpu.cplx import C as _C
        return _j.tree.map(lambda a: a * (1.0 + eps), x)

    def reduce_out(x):
        import jax as _j
        leaves = _j.tree.leaves(x)
        return sum(l.sum() for l in leaves)

    # ---- stages: (name, fn, primary input key) ----
    def s_diag(x):
        return numeric._diagonalize_jit(x, p.dt)

    from filter_functions_tpu import config as ff_config
    G, d = iv['eigvals'].shape
    use_mxu = ff_config.transform_mxu(G * d * d)

    def s_transforms(x):
        ev, props = x
        out1 = numeric._propagate_eigenvectors(props[:-1], ev)
        if use_mxu:
            out2 = numeric._conjugate_mxu(ev, p.n_opers)._map(
                lambda a: a.swapaxes(0, 1))
            out2 = out2 * jnp.asarray(p.n_coeffs)[:, :, None, None]
        else:
            out2 = numeric._transform_hamiltonian(ev, p.n_opers,
                                                  p.n_coeffs)
        return out1, out2

    def s_basis_t(x):
        if use_mxu:
            return numeric._conjugate_mxu(x, p.basis)
        return ceinsum('gba,kbc,gcd->gkad', x.conj(), p.basis, x)

    def s_integral(x):
        t = jnp.concatenate([jnp.zeros(1, p.dt.dtype), jnp.cumsum(p.dt)])
        ph = numeric.cexp(t[:-1, None] * omega[None, :])
        return ph, numeric._first_order_integral_batched(omega, x, p.dt)

    def s_contract(x):
        n_t, integral, b_t, ph = x
        return numeric._ctrlmat_contract(n_t, integral, b_t, ph)

    def s_ff_integrate(x):
        diag = (x.re**2 + x.im**2).sum(axis=1)
        return util.integrate(diag * spectrum, omega)

    stages = [
        ('diag(eigh+prop)', s_diag, iv['ham']),
        ('transforms', s_transforms, (iv['eigvecs'], iv['propagators'])),
        ('basis_transform', s_basis_t, iv['ev_prop']),
        ('phase+integral', s_integral, iv['eigvals']),
        ('contract', s_contract,
         (iv['n_t'], iv['integral'], iv['b_t'], iv['ph'])),
        ('ff+integrate', s_ff_integrate, iv['ctrl']),
    ]

    def make_rep(fn, k):
        def rep(x):
            out = 0.0
            for i in range(k):
                out = out + reduce_out(fn(jitter(x, 1e-14 * (i + 1))))
            return out
        return jax.jit(rep)

    def timed(j, x):
        jax.block_until_ready(j(x))
        times = []
        for i in range(4):
            xi = jax.block_until_ready(jitter(x, 1e-13 * (i + 1)))
            t0 = time.perf_counter()
            jax.block_until_ready(j(xi))
            times.append(time.perf_counter() - t0)
        return min(times)

    def cost(j, x):
        """XLA cost-analysis (flops, bytes accessed) of the compiled
        replica executable; (nan, nan) when the backend doesn't
        expose it."""
        try:
            ca = j.lower(x).compile().cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            return (float(ca.get('flops', float('nan'))),
                    float(ca.get('bytes accessed', float('nan'))))
        except Exception:
            return float('nan'), float('nan')

    # Single-chip peaks for the roofline columns (TPU v5e defaults:
    # 197 TFLOP/s bf16 MXU, 819 GB/s HBM).  The flops column counts
    # XLA's estimate, which maps int8-MXU digit matmuls to nominal
    # flops, so %MXU is a lower bound for the int8-heavy contraction.
    peak_flops = float(os.environ.get('FF_TPU_PEAK_FLOPS', 197e12))
    peak_bw = float(os.environ.get('FF_TPU_PEAK_BW', 819e9))

    print(f'{"stage":<18} {"marginal ms":>12} {"GFLOP":>9} '
          f'{"%MXU":>7} {"GB":>8} {"%HBM":>7}', flush=True)
    total = 0.0
    for name, fn, x in stages:
        j_lo, j_hi = make_rep(fn, K_LO), make_rep(fn, K_HI)
        t_lo, t_hi = timed(j_lo, x), timed(j_hi, x)
        marginal = (t_hi - t_lo) / (K_HI - K_LO)
        f_lo, b_lo = cost(j_lo, x)
        f_hi, b_hi = cost(j_hi, x)
        mflops = (f_hi - f_lo) / (K_HI - K_LO)
        mbytes = (b_hi - b_lo) / (K_HI - K_LO)
        pct_mxu = 100.0 * mflops / (marginal * peak_flops)
        pct_hbm = 100.0 * mbytes / (marginal * peak_bw)
        total += marginal
        print(f'{name:<18} {marginal * 1e3:>12.2f} {mflops / 1e9:>9.2f} '
              f'{pct_mxu:>7.1f} {mbytes / 1e9:>8.3f} {pct_hbm:>7.1f}',
              flush=True)
    print(f'{"TOTAL":<18} {total * 1e3:>12.2f}', flush=True)


if __name__ == '__main__':
    main()
