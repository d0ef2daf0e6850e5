"""Purely functional, jit-first pipeline API.

The object API (:class:`~.pulse_sequence.PulseSequence`) manages caches
host-side; this module exposes the same computations as pure functions
of arrays, suitable for ``jax.jit`` / ``jax.vmap`` / ``jax.grad`` /
sharding without any host round-trips.  This is the API the benchmark
and the multi-chip training step are built on.

All complex quantities use the split representation
(:class:`~.cplx.C`); control/noise operators can be passed as numpy
complex arrays and are converted at the boundary.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import numeric, util
from .basis import Basis
from .cplx import C, asc, ceinsum, cexp

__all__ = ['PulseArrays', 'make_pulse_arrays', 'control_matrix',
           'fidelity_filter_function', 'infidelity', 'batched_infidelity',
           'error_transfer_matrix', 'batched_error_transfer_matrix']


class PulseArrays(NamedTuple):
    """The static ingredients of a pulse as a pytree."""
    c_opers: C          # (n_ctrl, d, d)
    c_coeffs: jnp.ndarray   # (n_ctrl, n_dt)
    n_opers: C          # (n_nops, d, d)
    n_coeffs: jnp.ndarray   # (n_nops, n_dt)
    dt: jnp.ndarray     # (n_dt,)
    basis: C            # (n_b, d, d)


def make_pulse_arrays(pulse) -> PulseArrays:
    """Extract PulseArrays from a :class:`PulseSequence`."""
    return PulseArrays(pulse.c_opers_dev, jnp.asarray(pulse.c_coeffs),
                       pulse.n_opers_dev, jnp.asarray(pulse.n_coeffs),
                       jnp.asarray(pulse.dt), pulse.basis.dev)


def control_matrix(p: PulseArrays, omega: jnp.ndarray) -> C:
    """Control matrix (n_nops, n_b, n_omega) from raw arrays: the full
    diagonalize -> propagate -> contract pipeline under one trace."""
    ham = ceinsum('jmn,jg->gmn', p.c_opers, p.c_coeffs)
    eigvals, eigvecs, propagators = numeric._diagonalize_jit(ham, p.dt)
    t = jnp.concatenate([jnp.zeros(1, p.dt.dtype), jnp.cumsum(p.dt)])
    (_, n_t, b_t, ph, integral) = numeric._ctrlmat_step_terms(
        eigvals, eigvecs, propagators[:-1], omega, p.basis, p.n_opers,
        p.n_coeffs, p.dt, t[:-1])
    return numeric._ctrlmat_contract(n_t, integral, b_t, ph)


def fidelity_filter_function(p: PulseArrays, omega: jnp.ndarray) -> C:
    """Fidelity filter function (n_nops, n_nops, n_omega)."""
    ctrl = control_matrix(p, omega)
    return numeric.calculate_filter_function(ctrl, 'fidelity')


def infidelity(p: PulseArrays, spectrum: jnp.ndarray,
               omega: jnp.ndarray) -> jnp.ndarray:
    """Leading-order infidelity per noise operator (n_nops,) for a
    per-operator (or broadcastable) spectrum; traceless-basis path.

    Computes only the diagonal F_aa = sum_k |B_ak|^2 (n_nops x n_omega
    elementwise) instead of the full n_nops^2 cross filter function.
    """
    ctrl = control_matrix(p, omega)
    diag = (ctrl.re * ctrl.re + ctrl.im * ctrl.im).sum(axis=1)
    integrand = diag * spectrum
    d = p.c_opers.shape[-1]
    return util.integrate(integrand, omega) / (2 * np.pi * d)


def error_transfer_matrix(p: PulseArrays, spectrum, omega, basis: Basis,
                          second_order: bool = False) -> jnp.ndarray:
    """Error transfer matrix exp K from raw pulse arrays as ONE fused
    device call: diagonalization, per-step control matrices, decay
    amplitudes, (optionally) the second-order filter function and
    frequency shifts, the cumulant trace contraction, and the matrix
    exponential all run in a single executable.

    The object API (:func:`~.numeric.error_transfer_matrix`) computes
    the identical quantity with cache-population side effects; this is
    the jit/vmap/grad-composable variant.  *basis* supplies the
    (host-precombined) four-element trace tensors.
    """
    n_nops = p.n_opers.shape[0]
    spectrum = util.parse_spectrum(np.asarray(spectrum), omega,
                                   np.arange(n_nops))
    s = jnp.asarray(spectrum.real)
    s_im = jnp.asarray(spectrum.imag) if np.iscomplexobj(spectrum) \
        else None
    tg, td = numeric._cumulant_trace_combos(basis)
    return _etm_core(p, s, s_im, jnp.asarray(omega), jnp.asarray(tg),
                     jnp.asarray(td) if second_order else None,
                     second_order, tuple(range(n_nops)))


@functools.partial(jax.jit, static_argnames=('second_order', 'idx'))
def _etm_core(p: PulseArrays, s, s_im, omega, tg, td,
              second_order: bool, idx):
    ham = ceinsum('jmn,jg->gmn', p.c_opers, p.c_coeffs)
    eigvals, eigvecs, propagators = numeric._diagonalize_jit(ham, p.dt)
    t = jnp.concatenate([jnp.zeros(1, p.dt.dtype), jnp.cumsum(p.dt)])
    (_, n_t, b_t, ph, integral) = numeric._ctrlmat_step_terms(
        eigvals, eigvecs, propagators[:-1], omega, p.basis, p.n_opers,
        p.n_coeffs, p.dt, t[:-1])
    step = numeric._ctrlmat_step_contract(n_t, integral, b_t, ph)
    ctrl = step.sum(axis=0)

    gamma_igrand = numeric._integrand_core(s, s_im, ctrl, None, idx,
                                           'total', 'generalized')
    gamma = util.integrate(gamma_igrand, omega) / (2 * np.pi)
    k_fn = numeric._cumulant_contract_core(gamma, tg)
    if second_order:
        cumul = step.cumsum(axis=0)[:-1]
        f2 = numeric._second_order_scan(eigvals, n_t, b_t, step, cumul,
                                        omega, p.dt, False, False)[0]
        delta_igrand = numeric._integrand_core(s, s_im, None, f2, idx,
                                               'total', 'generalized')
        delta = util.integrate(delta_igrand, omega) / (2 * np.pi)
        k_fn = k_fn + numeric._cumulant_contract_core(delta, td)
    k_total = k_fn.sum(axis=tuple(range(k_fn.ndim - 2)))
    from .cplx import expm_real
    return expm_real(k_total)


def batched_error_transfer_matrix(p: PulseArrays, spectrum, omega,
                                  basis: Basis,
                                  second_order: bool = False
                                  ) -> jnp.ndarray:
    """Error transfer matrices for a batch of pulses (leading batch
    axis on c_coeffs / n_coeffs / dt; shared operators, basis, spectrum
    and frequencies) in one vmapped fused executable.

    Output shape (batch, d^2, d^2)."""
    n_nops = p.n_opers.shape[0]
    spectrum = util.parse_spectrum(np.asarray(spectrum), omega,
                                   np.arange(n_nops))
    s = jnp.asarray(spectrum.real)
    s_im = jnp.asarray(spectrum.imag) if np.iscomplexobj(spectrum) \
        else None
    tg, td = numeric._cumulant_trace_combos(basis)
    return _etm_batched(p, s, s_im, jnp.asarray(omega), jnp.asarray(tg),
                        jnp.asarray(td) if second_order else None,
                        second_order, tuple(range(n_nops)))


@functools.partial(jax.jit, static_argnames=('second_order', 'idx'))
def _etm_batched(p: PulseArrays, s, s_im, omega, tg, td,
                 second_order: bool, idx):
    def single(c_coeffs, n_coeffs, dt):
        pa = PulseArrays(p.c_opers, c_coeffs, p.n_opers, n_coeffs, dt,
                         p.basis)
        return _etm_core.__wrapped__(pa, s, s_im, omega, tg, td,
                                     second_order, idx)
    return jax.vmap(single)(p.c_coeffs, p.n_coeffs, p.dt)


def batched_infidelity(p: PulseArrays, spectrum: jnp.ndarray,
                       omega: jnp.ndarray,
                       chunk_size: Optional[int] = None) -> jnp.ndarray:
    """Infidelity vmapped over a leading batch axis of c_coeffs /
    n_coeffs / dt (shared operators and basis).

    ``vmap`` hoists the per-pulse omega-lattice workspaces for the whole
    batch into HBM at once (~1 GiB/pulse for the d=16, 1000-frequency
    flagship); pass ``chunk_size`` to evaluate the batch in sequential
    ``lax.map`` chunks of that many vmapped pulses, bounding peak memory
    at chunk_size pulses with no accuracy impact.  The batch must divide
    evenly into chunks.

    Output shape (batch, n_nops)."""
    def single(c_coeffs, n_coeffs, dt):
        return infidelity(
            PulseArrays(p.c_opers, c_coeffs, p.n_opers, n_coeffs, dt,
                        p.basis), spectrum, omega)

    batch = p.c_coeffs.shape[0]
    if chunk_size is None or chunk_size >= batch:
        return jax.vmap(single)(p.c_coeffs, p.n_coeffs, p.dt)
    if chunk_size < 1 or batch % chunk_size:
        raise ValueError(f'chunk_size {chunk_size} must be positive and '
                         f'divide batch {batch}')

    def chunked(args):
        return jax.vmap(single)(*args)

    n_chunks = batch // chunk_size
    reshaped = tuple(a.reshape((n_chunks, chunk_size) + a.shape[1:])
                     for a in (p.c_coeffs, p.n_coeffs, p.dt))
    out = jax.lax.map(chunked, reshaped)
    return out.reshape((batch,) + out.shape[2:])
