"""Sub-attribution of the Ozaki control-matrix contraction
(scripts/attribute.py finds it dominant) at flagship shapes.

Measures the CURRENT default deep-regime path (int8 MXU digits,
int32-factored D, f32 P assembly, 24-bit deep truncation) stage by
stage with the k-fold in-jit method: P assembly, P digit slicing,
D outer-word formation + peel, and the slice-pair matmuls +
recombination.  ``--legacy`` measures the assembled-D bf16 path
instead (the pre-round-3 layout, kept for A/B reference).

Run: python scripts/attr_contract.py [--cpu] [--legacy]
"""
import math
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))


def main():
    import jax
    if '--cpu' in sys.argv:
        jax.config.update('jax_platforms', 'cpu')
        jax.config.update('jax_enable_x64', True)
    else:
        from filter_functions_tpu import config
        config.enable_host_cpu()

    import jax.numpy as jnp
    from filter_functions_tpu import numeric
    from filter_functions_tpu.cplx import ceinsum
    from filter_functions_tpu.ops import ozaki

    from bench import build_inputs
    _, p, _, omega, _ = build_inputs()
    omega = jnp.asarray(omega)

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
        return n_t, b_t, ph, integral

    n_t, b_t, ph, integral = jax.block_until_ready(
        intermediates(p.c_coeffs))

    G, n_w, d, _ = integral.shape
    n_nops = n_t.shape[0]
    n_basis = b_t.shape[1]
    K = G * d * d

    if '--legacy' in sys.argv:
        run_legacy(jax, jnp, ozaki, n_t, b_t, ph, integral,
                   G, n_w, d, n_nops, n_basis)
        return

    # ---- current default deep-regime path ------------------------------
    mxu = 'int8'
    bits = ozaki.DEEP_PRECISION_BITS
    slice_bits, n_p = ozaki._slice_params(K, bits, mxu)
    n_d = -(-30 // slice_bits)
    n_p = max(n_p, n_d)

    def p_build(x):
        integral_, ph_ = x
        integral_ = integral_._map(lambda a: a.astype(jnp.float32))
        ph_ = ph_._map(lambda a: a.astype(jnp.float32))
        p_mat = (integral_ * ph_[:, :, None, None]).reshape(G, n_w, d * d)
        return p_mat._map(
            lambda a: a.transpose(1, 0, 2).reshape(n_w, K))

    p_big = jax.block_until_ready(p_build((integral, ph)))

    def p_slice(x):
        pr, pi = x
        out = []
        for arr in (pr, pi, pr + pi):
            sl, sc = ozaki._slice_fixed_point(arr, -1, n_p, slice_bits,
                                              mxu)
            out.extend(sl)
            out.append(sc)
        return out

    b_fac = n_t._map(
        lambda x: x.transpose(1, 2, 3, 0).reshape(K, n_nops))
    c_fac = b_t._map(
        lambda x: x.transpose(0, 3, 2, 1).reshape(K, n_basis))

    def d_words(x):
        br, bi, cr, ci = x
        re, im = ozaki._ozaki_matmul_c_outer_impl(
            jnp.zeros((8, K), jnp.float32), jnp.zeros((8, K), jnp.float32),
            br, bi, cr, ci, bits, mxu)
        return re, im

    def full(x):
        pr, pi, br, bi, cr, ci = x
        return ozaki._ozaki_matmul_c_outer_impl(pr, pi, br, bi, cr, ci,
                                                bits, mxu)

    stages = [
        ('P assemble (f32)', p_build, (integral, ph)),
        ('P slice x3 (int8)', p_slice, (p_big.re, p_big.im)),
        ('D words+peel (M=8)', d_words,
         (b_fac.re, b_fac.im, c_fac.re, c_fac.im)),
        ('full factored contract', full,
         (p_big.re, p_big.im, b_fac.re, b_fac.im, c_fac.re, c_fac.im)),
    ]
    run_stages(jax, jnp, stages)
    print(f'(slice_bits={slice_bits}, n_p={n_p}, n_d={n_d}, '
          f'pairs/product={n_p * (n_p + 1) // 2}, K={K}, '
          f'P {n_w}x{K}, D {K}x{n_nops * n_basis})')


def run_legacy(jax, jnp, ozaki, n_t, b_t, ph, integral,
               G, n_w, d, n_nops, n_basis):
    def build_pd(x):
        integral_, ph_ = x
        p_mat = (integral_ * ph_[:, :, None, None]).reshape(G, n_w, d * d)
        b_tt = n_t._map(lambda a: a.transpose(1, 2, 3, 0))
        c_tt = b_t._map(lambda a: a.transpose(0, 3, 2, 1))
        d_mat = (b_tt[..., :, None] * c_tt[..., None, :]).reshape(
            G, d * d, n_nops * n_basis)
        p_big = p_mat._map(
            lambda a: a.transpose(1, 0, 2).reshape(n_w, G * d * d))
        d_big = d_mat.reshape(G * d * d, n_nops * n_basis)
        return p_big, d_big

    p_big, d_big = jax.block_until_ready(build_pd((integral, ph)))
    K = p_big.shape[-1]
    slice_bits = min(8, (24 - math.ceil(math.log2(K))) // 2)
    bits = ozaki.DEFAULT_PRECISION_BITS
    n_slices = max(1, -(-bits // slice_bits) - 1) + 1

    def slice_all(x):
        pr, pi, dr, di = x
        out = []
        for arr, ax in ((pr, -1), (pi, -1), (dr, -2), (di, -2)):
            sl, sc = ozaki._slice_fixed_point(arr, ax, n_slices,
                                              slice_bits)
            out.extend(sl)
            out.append(sc)
        return out

    def gauss(x):
        pr, pi, dr, di = x
        p1 = ozaki.ozaki_matmul(pr, dr)
        p2 = ozaki.ozaki_matmul(pi, di)
        p3 = ozaki.ozaki_matmul(pr + pi, dr + di)
        return p1 - p2, p3 - p1 - p2

    stages = [
        ('P+D build', build_pd, (integral, ph)),
        ('slice re/im x4', slice_all,
         (p_big.re, p_big.im, d_big.re, d_big.im)),
        ('full gauss (3 ozaki)', gauss,
         (p_big.re, p_big.im, d_big.re, d_big.im)),
    ]
    run_stages(jax, jnp, stages)


def run_stages(jax, jnp, stages):
    def jitter(x, eps):
        return jax.tree.map(
            lambda a: a * (1.0 + eps) if jnp.issubdtype(a.dtype,
                                                        jnp.floating)
            else a, x)

    def reduce_out(x):
        return sum(jnp.asarray(l, jnp.float64).sum()
                   for l in jax.tree.leaves(x))

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
            jax.block_until_ready(j(xi))
            times.append(time.perf_counter() - t0)
        return min(times)

    print(f'{"stage":<26} {"marginal ms":>12}', flush=True)
    for name, fn, x in stages:
        t_lo = timed(fn, x, 1)
        t_hi = timed(fn, x, 3)
        marginal = (t_hi - t_lo) / 2 * 1e3
        print(f'{name:<26} {marginal:>12.2f}', flush=True)


if __name__ == '__main__':
    main()
