"""Stage attribution for the second-order / error-transfer-matrix
batched pipeline (bench.config_second_order: d=4, 8 segments, 200
frequencies, batch 64).

Same k-fold marginal method as scripts/attribute.py / exp_smalld.py.

Run: python scripts/exp_so.py [--cpu]
"""
import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

K_LO, K_HI = 1, 2


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--cpu', action='store_true')
    parser.add_argument('stages', nargs='*',
                        help='substring filters; empty = all stages')
    args = parser.parse_args()

    import jax
    if args.cpu:
        jax.config.update('jax_platforms', 'cpu')
        jax.config.update('jax_enable_x64', True)

    import jax.numpy as jnp
    import filter_functions_tpu as ff_tpu
    from filter_functions_tpu import functional, numeric, util
    from filter_functions_tpu.cplx import C, asc, ceinsum, expm_real

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
    omega_np = np.geomspace(1e-1, 1e1, n_omega)
    omega = jnp.asarray(omega_np)
    spectrum = 1e-4 / omega_np

    basis = ff_tpu.Basis.ggm(d)
    p = functional.PulseArrays(
        asc(c_opers), jnp.asarray(c_coeffs), asc(n_opers),
        jnp.asarray(n_coeffs), jnp.asarray(dt), basis.dev)
    tg, td = numeric._cumulant_trace_combos(basis)
    tg, td = jnp.asarray(tg), jnp.asarray(td)
    idx = (0, 1)
    idx_arr = jnp.asarray(np.asarray(idx))
    ws = jnp.broadcast_to(jnp.asarray(spectrum), (2, n_omega)) \
        * numeric.trapezoid_weights(omega) / (2 * np.pi)

    # ---- per-pulse intermediates, batched ----
    @jax.jit
    def intermediates(c_coeffs_b, dt_b):
        def one(cc, dti):
            ham = ceinsum('jmn,jg->gmn', p.c_opers, cc)
            eigvals, eigvecs, propagators = \
                numeric._diagonalize_jit.__wrapped__(ham, dti)
            t = jnp.concatenate([jnp.zeros(1, dti.dtype),
                                 jnp.cumsum(dti)])
            (_, n_t, b_t, ph, integral) = numeric._ctrlmat_step_terms(
                eigvals, eigvecs, propagators[:-1], omega, p.basis,
                p.n_opers, p.n_coeffs[0], dti, t[:-1])
            step = numeric._ctrlmat_step_contract(n_t, integral, b_t,
                                                  ph)
            ctrl = step.sum(axis=0)
            cumul = step.cumsum(axis=0)[:-1]
            f = eigvals.dtype
            cum_pad = C(
                jnp.concatenate(
                    [jnp.zeros((1,) + cumul.re.shape[1:], f),
                     cumul.re]),
                jnp.concatenate(
                    [jnp.zeros((1,) + cumul.im.shape[1:], f),
                     cumul.im]))
            ctrl_i = ctrl._map(lambda v: v[idx_arr])
            gamma = ceinsum('ako,ao,alo->akl', ctrl_i.conj(), ws,
                            ctrl_i).re
            delta = numeric._second_order_diag_shifts(
                eigvals, n_t._map(lambda v: v[idx_arr]), b_t,
                step._map(lambda v: v[:, idx_arr]),
                cum_pad._map(lambda v: v[:, idx_arr]), omega, dti, ws,
                dtype=functional._so_shift_dtype()).re
            k_fn = numeric._cumulant_contract_core(gamma, tg) \
                + numeric._cumulant_contract_core(delta, td)
            k_total = k_fn.sum(axis=tuple(range(k_fn.ndim - 2)))
            return dict(ham=ham, eigvals=eigvals, eigvecs=eigvecs,
                        propagators=propagators, n_t=n_t, b_t=b_t,
                        ph=ph, integral=integral, step=step, ctrl=ctrl,
                        cum_pad=cum_pad, gamma=gamma, delta=delta,
                        k_total=k_total, dt=dti, t=t)
        return jax.vmap(one)(c_coeffs_b, dt_b)

    iv = jax.block_until_ready(intermediates(p.c_coeffs, p.dt))

    def jitter(x, eps):
        return jax.tree.map(lambda a: a * (1.0 + eps), x)

    def reduce_out(x):
        return sum(l.sum() for l in jax.tree.leaves(x))

    def s_diag(x):
        return jax.vmap(
            lambda h, dti: numeric._diagonalize_jit.__wrapped__(h, dti)
        )(x, iv['dt'])

    def s_step_terms(x):
        def one(eigvals, eigvecs, props, t, dti):
            return numeric._ctrlmat_step_terms(
                eigvals, eigvecs, props[:-1], omega, p.basis,
                p.n_opers, p.n_coeffs[0], dti, t[:-1])
        ev, evec, props, t = x
        return jax.vmap(one)(ev, evec, props, t, iv['dt'])

    def s_step_contract(x):
        def one(n_t, integral, b_t, ph):
            return numeric._ctrlmat_step_contract(n_t, integral, b_t,
                                                  ph)
        return jax.vmap(one)(*x)

    def s_gamma(x):
        def one(ctrl):
            ctrl_i = ctrl._map(lambda v: v[idx_arr])
            return ceinsum('ako,ao,alo->akl', ctrl_i.conj(), ws,
                           ctrl_i).re
        return jax.vmap(one)(x)

    def s_shifts(x):
        def one(eigvals, n_t, b_t, step, cum_pad, dti):
            return numeric._second_order_diag_shifts(
                eigvals, n_t._map(lambda v: v[idx_arr]), b_t,
                step._map(lambda v: v[:, idx_arr]),
                cum_pad._map(lambda v: v[:, idx_arr]), omega, dti, ws,
                dtype=functional._so_shift_dtype()).re
        ev, n_t, b_t, step, cum = x
        return jax.vmap(one)(ev, n_t, b_t, step, cum, iv['dt'])

    def s_cumulant(x):
        def one(gamma, delta):
            k = numeric._cumulant_contract_core(gamma, tg) \
                + numeric._cumulant_contract_core(delta, td)
            return k.sum(axis=tuple(range(k.ndim - 2)))
        g, dl = x
        return jax.vmap(one)(g, dl)

    def s_expm(x):
        return jax.vmap(expm_real)(x)

    stages = [
        ('diag', s_diag, iv['ham']),
        ('ctrlmat_step_terms', s_step_terms,
         (iv['eigvals'], iv['eigvecs'], iv['propagators'], iv['t'])),
        ('step_contract', s_step_contract,
         (iv['n_t'], iv['integral'], iv['b_t'], iv['ph'])),
        ('gamma (1st order)', s_gamma, iv['ctrl']),
        ('2nd-order shifts', s_shifts,
         (iv['eigvals'], iv['n_t'], iv['b_t'], iv['step'],
          iv['cum_pad'])),
        ('cumulant contract', s_cumulant, (iv['gamma'], iv['delta'])),
        ('expm', s_expm, iv['k_total']),
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

    if args.stages:
        stages = [st for st in stages
                  if any(f in st[0] for f in args.stages)]
    print(f'{"stage":<22} {"marginal ms":>12}', flush=True)
    total = 0.0
    for name, fn, x in stages:
        t_lo = timed(fn, x, K_LO)
        t_hi = timed(fn, x, K_HI)
        marginal = (t_hi - t_lo) / (K_HI - K_LO) * 1e3
        total += marginal
        print(f'{name:<22} {marginal:>12.2f}', flush=True)
    print(f'{"TOTAL":<22} {total:>12.2f}', flush=True)


if __name__ == '__main__':
    main()
