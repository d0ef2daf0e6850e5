"""Low-level TPU compute primitives.

* :mod:`.ozaki` -- high-precision matrix multiplication on the MXU via
  the Ozaki splitting scheme (exact bf16-slice products with f32
  accumulation, recombined in f64).
"""
from . import ozaki

__all__ = ['ozaki']
