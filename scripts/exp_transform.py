"""A/B experiment: formulations of the basis conjugation
B~[g,k] = W_g^dag C_k W_g at flagship shapes (G=13, d=16, n_k=256).

a) current ceinsum 'gba,kbc,gcd->gkad'
b) explicit two-stage f64 matmuls (stacked (G d, d) @ (d, n_k d),
   then batched (G, n_k d, d) @ (G, d, d))
c) two-stage ozaki_matmul_c (exact digit slices of the f64 inputs;
   truncation is post-hoc result noise, NOT a frame perturbation)

Prints marginal ms (k-fold in-jit method) and max error vs (a).
"""
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
    from filter_functions_tpu.cplx import C, ceinsum
    from filter_functions_tpu.ops import ozaki

    from bench import build_inputs
    _, p, _, omega, _ = build_inputs()

    @jax.jit
    def get_w(c_coeffs):
        ham = ceinsum('jmn,jg->gmn', p.c_opers, c_coeffs)
        eigvals, eigvecs, propagators = numeric._diagonalize_jit(ham, p.dt)
        return numeric._propagate_eigenvectors(propagators[:-1], eigvecs)

    w = jax.block_until_ready(get_w(p.c_coeffs))
    basis = p.basis
    G, d, _ = w.shape
    n_k = basis.shape[0]

    def variant_a(w):
        return ceinsum('gba,kbc,gcd->gkad', w.conj(), basis, w)

    def variant_b(w):
        # stage 1: T1[(g a), (k c)] = sum_b conj(W)[g b a] C[k b c]
        a_stack = w.conj()._map(
            lambda x: x.transpose(0, 2, 1).reshape(G * d, d))
        c_flat = basis._map(
            lambda x: x.transpose(1, 0, 2).reshape(d, n_k * d))
        t1 = a_stack @ c_flat                      # (G d, n_k d)
        # stage 2: out[g, (k a), d'] = sum_c T1[g, a, k, c] W[g, c, d']
        t1 = t1.reshape(G, d, n_k, d)._map(
            lambda x: x.transpose(0, 2, 1, 3).reshape(G, n_k * d, d))
        out = t1 @ w                               # (G, n_k d, d)
        return out.reshape(G, n_k, d, d)

    def variant_c(w):
        a_stack = w.conj()._map(
            lambda x: x.transpose(0, 2, 1).reshape(G * d, d))
        c_flat = basis._map(
            lambda x: x.transpose(1, 0, 2).reshape(d, n_k * d))
        re1, im1 = ozaki.ozaki_matmul_c(a_stack.re, a_stack.im,
                                        c_flat.re, c_flat.im)
        t1 = C(re1, im1).reshape(G, d, n_k, d)._map(
            lambda x: x.transpose(0, 2, 1, 3).reshape(G, n_k * d, d))
        re2, im2 = ozaki.ozaki_matmul_c(t1.re, t1.im, w.re, w.im)
        return C(re2, im2).reshape(G, n_k, d, d)

    ref = jax.block_until_ready(jax.jit(variant_a)(w)).to_numpy()

    def jitter(x, eps):
        return jax.tree.map(lambda a: a * (1.0 + eps), x)

    def timed(fn, k):
        def rep(x):
            out = 0.0
            for i in range(k):
                r = fn(jitter(x, 1e-14 * (i + 1)))
                out = out + sum(jnp.asarray(l, jnp.float64).sum()
                                for l in jax.tree.leaves(r))
            return out
        j = jax.jit(rep)
        jax.block_until_ready(j(w))
        times = []
        for i in range(4):
            xi = jax.block_until_ready(jitter(w, 1e-13 * (i + 1)))
            t0 = time.perf_counter()
            jax.block_until_ready(j(xi))
            times.append(time.perf_counter() - t0)
        return min(times)

    print(f'{"variant":<28} {"marginal ms":>11} {"max err vs a":>13}',
          flush=True)
    for name, fn in (('a ceinsum (current)', variant_a),
                     ('b two-stage f64 matmul', variant_b),
                     ('c two-stage ozaki', variant_c)):
        got = jax.block_until_ready(jax.jit(fn)(w)).to_numpy()
        err = np.abs(got - ref).max()
        t_lo, t_hi = timed(fn, 1), timed(fn, 3)
        print(f'{name:<28} {(t_hi - t_lo) / 2 * 1e3:>11.2f} {err:>13.2e}',
              flush=True)


if __name__ == '__main__':
    main()
