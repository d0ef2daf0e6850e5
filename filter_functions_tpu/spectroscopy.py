r"""Noise spectroscopy: reconstruct the noise spectral density from
measured infidelities.

The filter-function formalism's measurement counterpart (no reference
equivalent; cf. Alvarez & Suter PRL 107, 230501 (2011) and the
dynamical-decoupling noise-spectroscopy literature): each pulse p with
fidelity filter function F_p(omega) measures the linear functional

    I_p = 1/(2 pi d) \int d omega  F_p(omega) S(omega),

so a set of pulses (e.g. CPMG trains of varying period) turns spectrum
estimation into a linear inverse problem.  Here the spectrum is
parameterized by log-linear interpolation on a coarse frequency grid,
the design matrix assembles from batched filter functions in one fused
device call, and the non-negative least-squares solve runs as a jitted
FISTA loop with projection onto S >= 0 -- everything jit/vmap/grad
composable.

Typical use::

    pulses = [cpmg_pulse(n) for n in (1, 2, 4, 8, 16, 32)]
    A, nodes = design_matrix(pulses, omega, n_nodes=12)
    s_nodes = reconstruct(A, measured_infidelities, ridge=1e-4)
    S = interpolate_spectrum(s_nodes, nodes, omega)
"""
from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from . import util

__all__ = ['design_matrix', 'reconstruct', 'interpolate_spectrum',
           'spectrum_basis']


def spectrum_basis(omega, n_nodes: int,
                   omega_min: Optional[float] = None,
                   omega_max: Optional[float] = None
                   ) -> Tuple[np.ndarray, np.ndarray]:
    """Log-spaced hat-function interpolation basis.

    Returns ``(nodes (n_nodes,), W (n_nodes, n_omega))`` with
    ``S(omega) = sum_k s_k W[k]`` piecewise-linear in log(omega).
    """
    if n_nodes < 2:
        raise ValueError(f'Need n_nodes >= 2 for interpolation, got '
                         f'{n_nodes}')
    omega = np.asarray(omega)
    lo = np.log(omega_min if omega_min is not None else omega.min())
    hi = np.log(omega_max if omega_max is not None else omega.max())
    if not hi > lo:
        raise ValueError('Degenerate frequency range: need '
                         f'omega_max > omega_min > 0, got [{np.exp(lo)}, '
                         f'{np.exp(hi)}]')
    node_logs = np.linspace(lo, hi, n_nodes)
    nodes = np.exp(node_logs)
    x = np.log(np.clip(omega, nodes[0], nodes[-1]))
    w = np.zeros((n_nodes, len(omega)))
    idx = np.clip(np.searchsorted(node_logs, x) - 1, 0, n_nodes - 2)
    frac = (x - node_logs[idx]) / (node_logs[idx + 1] - node_logs[idx])
    cols = np.arange(len(omega))
    w[idx, cols] = 1 - frac
    w[idx + 1, cols] = frac
    return nodes, w


def interpolate_spectrum(s_nodes, nodes, omega) -> jnp.ndarray:
    """Evaluate the reconstructed spectrum on an arbitrary grid."""
    _, w = spectrum_basis(omega, len(np.asarray(nodes)),
                          omega_min=float(np.asarray(nodes)[0]),
                          omega_max=float(np.asarray(nodes)[-1]))
    return jnp.asarray(s_nodes) @ jnp.asarray(w)


def design_matrix(filter_functions, omega, n_nodes: int = 12,
                  d: int = 2,
                  omega_min: Optional[float] = None,
                  omega_max: Optional[float] = None
                  ) -> Tuple[jnp.ndarray, np.ndarray]:
    r"""Assemble A with ``A[p, k] = 1/(2 pi d) \int F_p phi_k`` from a
    stack of fidelity filter functions ``(n_pulses, n_omega)`` (real;
    e.g. the diagonal of :func:`functional.fidelity_filter_function`
    for the probed noise operator).

    Returns ``(A (n_pulses, n_nodes), nodes (n_nodes,))``.
    """
    ff = jnp.asarray(filter_functions)
    omega_arr = np.asarray(omega)
    nodes, w = spectrum_basis(omega_arr, n_nodes, omega_min, omega_max)
    return _design_jit(ff, jnp.asarray(w), jnp.asarray(omega_arr),
                       d), nodes


@functools.partial(jax.jit, static_argnames=('d',))
def _design_jit(ff, w, omega, d: int):
    # integrand[p, k, o] = F_p(o) phi_k(o); trapezoid over omega
    integrand = ff[:, None, :] * w[None, :, :]
    return util.integrate(integrand, omega) / (2 * np.pi * d)


def reconstruct(a, infidelities, ridge: float = 0.0,
                curvature: float = 0.0, n_steps: int = 2000
                ) -> jnp.ndarray:
    r"""Non-negative least squares
    ``min_{s >= 0} ||A s - I||^2 + ridge ||s||^2 + curvature ||D2 s||^2``
    via jitted FISTA with projection (no SciPy; runs on device).

    The rows of A are rescaled to unit norm internally so the
    measurements contribute uniformly regardless of pulse duration.
    """
    a = jnp.asarray(a)
    y = jnp.asarray(infidelities)
    # Guard against all-zero rows (a pulse whose filter function does
    # not overlap any basis hat): leave such rows unscaled instead of
    # poisoning the solve with inf/NaN.
    norms = jnp.linalg.norm(a, axis=1)
    row_scale = 1.0 / jnp.where(norms > 0, norms, 1.0)
    return _fista_nnls(a * row_scale[:, None], y * row_scale,
                       float(ridge), float(curvature), int(n_steps))


@functools.partial(jax.jit, static_argnames=('ridge', 'curvature',
                                             'n_steps'))
def _fista_nnls(a, y, ridge: float, curvature: float, n_steps: int):
    n = a.shape[1]
    ata = a.T @ a + ridge * jnp.eye(n)
    if curvature:
        d2 = (np.diag(np.full(n, -2.0)) + np.diag(np.ones(n - 1), 1)
              + np.diag(np.ones(n - 1), -1))[1:-1]
        ata = ata + curvature * jnp.asarray(d2.T @ d2)
    aty = a.T @ y
    # Lipschitz constant via power iteration (ata is PSD)
    def power(v, _):
        v = ata @ v
        return v / jnp.linalg.norm(v), None
    v0 = jnp.ones(n) / np.sqrt(n)
    v, _ = lax.scan(power, v0, None, length=50)
    lip = jnp.maximum(v @ (ata @ v), 1e-30)
    eta = 1.0 / lip

    def step(carry, _):
        s, z, t = carry
        grad = ata @ z - aty
        s_new = jnp.maximum(z - eta * grad, 0.0)
        t_new = 0.5 * (1 + jnp.sqrt(1 + 4 * t * t))
        z_new = s_new + (t - 1) / t_new * (s_new - s)
        return (s_new, z_new, t_new), None

    s0 = jnp.maximum(jnp.linalg.lstsq(ata, aty)[0], 0.0)
    (s, _, _), _ = lax.scan(step, (s0, s0, jnp.asarray(1.0)), None,
                            length=n_steps)
    return s
