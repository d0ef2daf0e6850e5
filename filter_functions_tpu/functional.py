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
           'fidelity_filter_function', 'infidelity', 'batched_infidelity']


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
