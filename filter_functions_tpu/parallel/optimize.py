"""Pulse optimization (GRAPE) on device meshes.

The reference exposes analytic filter-function gradients
(/root/reference/filter_functions/gradient.py:559-676) for external
optimizers to consume; here the full optimization loop itself runs on
the TPU: an optax optimizer stepped inside ``lax.scan``, with the
pulse batch sharded over the mesh 'batch' axis and the frequency
integral sharded over 'omega'.  Gradients flow through the whole
pipeline (diagonalization, propagator scan, omega-lattice contraction)
via ``jax.grad`` -- the custom eigh JVP and the Ozaki custom VJP keep
them exact on the TPU backend.
"""
from __future__ import annotations

import functools
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:
    import optax
    _HAS_OPTAX = True
except ImportError:  # pragma: no cover - optax ships with the env
    optax = None
    _HAS_OPTAX = False

from .. import functional
from .sharding import shard_omega, _replicate

__all__ = ['OptimizationResult', 'optimize_pulse']


class OptimizationResult(NamedTuple):
    """Outcome of :func:`optimize_pulse`."""
    c_coeffs: jnp.ndarray   # optimized controls, (batch?, n_ctrl, n_dt)
    infidelity: jnp.ndarray  # final per-pulse total infidelity
    history: jnp.ndarray    # loss per iteration, (n_steps,)


def _total_infidelity(c_coeffs, p, spectrum, omega):
    batched = c_coeffs.ndim == 3
    pulse = functional.PulseArrays(p.c_opers, c_coeffs, p.n_opers,
                                   p.n_coeffs, p.dt, p.basis)
    if batched:
        infids = functional.batched_infidelity(pulse, spectrum, omega)
    else:
        infids = functional.infidelity(pulse, spectrum, omega)
    return infids.sum(), infids.sum(axis=-1)


def optimize_pulse(p: functional.PulseArrays, spectrum, omega,
                   n_steps: int = 100, optimizer=None,
                   learning_rate: float = 1e-2,
                   regularizer: Optional[Callable] = None,
                   mesh: Optional[Mesh] = None) -> OptimizationResult:
    """Minimize total leading-order infidelity over the control
    coefficients with an optax optimizer, entirely on device.

    Parameters
    ----------
    p : PulseArrays
        Initial pulse; ``c_coeffs`` may carry a leading batch axis
        (independent candidate pulses optimized in parallel -- the
        standard multi-start strategy for non-convex control
        landscapes).
    spectrum, omega : arrays
        Noise PSD sampled on the frequency grid.
    n_steps : int
        Optimizer iterations, unrolled as ``lax.scan`` (one compile).
    optimizer : optax.GradientTransformation, optional
        Defaults to ``optax.adam(learning_rate)``.
    regularizer : callable, optional
        Extra loss term ``f(c_coeffs) -> scalar`` (e.g. power/slew
        penalties).
    mesh : jax.sharding.Mesh, optional
        (batch, omega) mesh; batch axis shards candidates, omega axis
        shards the frequency integral (reduced with one psum).
    """
    if not _HAS_OPTAX:
        raise RuntimeError('optimize_pulse requires optax')
    if optimizer is None:
        optimizer = optax.adam(learning_rate)

    batched = np.ndim(p.c_coeffs) == 3
    if batched:
        # only c_coeffs needs a batch axis from the caller; broadcast
        # shared n_coeffs / dt to match
        n_batch = np.shape(p.c_coeffs)[0]
        n_coeffs = jnp.asarray(p.n_coeffs)
        dt = jnp.asarray(p.dt)
        if n_coeffs.ndim == 2:
            n_coeffs = jnp.broadcast_to(n_coeffs,
                                        (n_batch,) + n_coeffs.shape)
        if dt.ndim == 1:
            dt = jnp.broadcast_to(dt, (n_batch,) + dt.shape)
        p = p._replace(n_coeffs=n_coeffs, dt=dt)

    if mesh is not None:
        def put_batch(a):
            return jax.device_put(
                jnp.asarray(a),
                NamedSharding(mesh, P('batch', *([None] * (a.ndim - 1)))))
        place = put_batch if batched else functools.partial(
            _replicate, mesh=mesh)
        p = functional.PulseArrays(
            _replicate(p.c_opers, mesh), place(p.c_coeffs),
            _replicate(p.n_opers, mesh), place(p.n_coeffs),
            place(p.dt), _replicate(p.basis, mesh))
        omega = shard_omega(omega, mesh)
        spectrum = shard_omega(spectrum, mesh)
    else:
        omega = jnp.asarray(omega)
        spectrum = jnp.asarray(spectrum)

    # Pulse/spectrum/frequencies are traced arguments (not closure
    # captures), so repeated optimize_pulse calls with the same
    # optimizer configuration and shapes reuse one compiled loop.
    try:
        run = _make_run(optimizer, regularizer, n_steps)
    except TypeError:   # unhashable optimizer/regularizer
        run = _make_run.__wrapped__(optimizer, regularizer, n_steps)
    c_final, final_infid, history = run(jnp.asarray(p.c_coeffs), p,
                                        spectrum, omega)
    return OptimizationResult(c_final, final_infid, history)


@functools.lru_cache(maxsize=8)
def _make_run(optimizer, regularizer, n_steps: int):
    @jax.jit
    def run(c0, p, spectrum, omega):
        def loss_fn(c_coeffs):
            total, per_pulse = _total_infidelity(c_coeffs, p, spectrum,
                                                 omega)
            if regularizer is not None:
                total = total + regularizer(c_coeffs)
            return total, per_pulse

        def step(carry, _):
            c, opt_state = carry
            (loss, _), grad = jax.value_and_grad(
                loss_fn, has_aux=True)(c)
            updates, opt_state = optimizer.update(grad, opt_state, c)
            return (optax.apply_updates(c, updates), opt_state), loss

        (c_final, _), history = jax.lax.scan(
            step, (c0, optimizer.init(c0)), None, length=n_steps)
        _, final_infid = loss_fn(c_final)
        return c_final, final_infid, history

    return run
