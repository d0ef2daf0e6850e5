"""Multi-device sharding for filter-function computation.

The reference is a single-process NumPy library with no distributed
runtime (SURVEY.md section 2.6); here the embarrassingly parallel axes
of the workload -- the frequency grid and the pulse batch -- are
sharded over a :class:`jax.sharding.Mesh`, and the frequency integrals
reduce with XLA collectives inserted automatically by GSPMD.
"""
from .optimize import OptimizationResult, optimize_pulse
from .sharding import (make_mesh, shard_omega, sharded_filter_function,
                       sharded_infidelity, sharded_batched_infidelity,
                       sharded_error_transfer_matrix, grape_step,
                       make_grape_step)

__all__ = ['make_mesh', 'shard_omega', 'sharded_filter_function',
           'sharded_infidelity', 'sharded_batched_infidelity',
           'sharded_error_transfer_matrix', 'grape_step',
           'make_grape_step', 'OptimizationResult', 'optimize_pulse']
