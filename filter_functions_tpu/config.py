"""Global configuration for filter_functions_tpu.

Precision strategy
------------------
The library targets <=1e-10 parity with the NumPy reference
(/root/reference/tests/test_precision.py tolerances), which requires
double precision.  TPU hardware has no native complex128 -- on the
available backend complex128 is entirely unsupported -- but *real*
float64 is available (software-emulated).  All complex arithmetic in
this package is therefore carried out on a split representation
(see :mod:`filter_functions_tpu.cplx`): a complex tensor is a pytree of
two real arrays ``(re, im)``.  With x64 enabled those are float64 and
full double-precision results are obtained on TPU.

``jax.config.update('jax_enable_x64', True)`` is applied at import time
of the top-level package unless the environment variable
``FF_TPU_NO_X64`` is set.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp

#: Whether x64 mode was requested (default yes).
X64 = 'FF_TPU_NO_X64' not in os.environ

if X64:
    jax.config.update('jax_enable_x64', True)

# Persistent XLA compilation cache: compile time dominates small-d
# workloads (first jit of the pipeline is seconds on CPU and minutes on
# remote-compiled TPU backends), so cache compiled executables across
# processes.  Opt out with FF_TPU_NO_COMPILE_CACHE=1 or redirect with
# JAX_COMPILATION_CACHE_DIR.
if 'FF_TPU_NO_COMPILE_CACHE' not in os.environ:
    try:
        cache_dir = os.environ.get(
            'JAX_COMPILATION_CACHE_DIR',
            os.path.join(os.path.expanduser('~'), '.cache',
                         'filter_functions_tpu', 'jax_cache'))
        jax.config.update('jax_compilation_cache_dir', cache_dir)
        jax.config.update('jax_persistent_cache_min_compile_time_secs',
                          0.1)
    except Exception:   # pragma: no cover - cache is best-effort
        pass


def float_dtype():
    """The default real dtype (float64 under x64, float32 otherwise)."""
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


def complex_dtype():
    """The native complex dtype matching :func:`float_dtype`.

    Only used at host boundaries and on backends with complex support
    (CPU); device kernels use the split representation.
    """
    return jnp.complex128 if jax.config.jax_enable_x64 else jnp.complex64


def eps() -> float:
    """Machine epsilon of the default real dtype."""
    import numpy as np
    return float(np.finfo(np.dtype(float_dtype())).eps)


def backend() -> str:
    return jax.default_backend()


def enable_host_cpu() -> bool:
    """Make the CPU platform available alongside the accelerator.

    Host-side orchestration math (pulse construction, concatenation
    byproducts) is latency-bound, not FLOP-bound; on a remote-compiled
    TPU backend every tiny distinct-shape op costs seconds of compile
    round trip.  Call this before first backend use; returns True if a
    CPU device is available afterwards.
    """
    try:
        jax.local_devices(backend='cpu')
        return True
    except RuntimeError:
        pass
    try:
        current = jax.config.jax_platforms
        if current and 'cpu' not in current:
            jax.config.update('jax_platforms', current + ',cpu')
        return True
    except Exception:
        return False


def host_device():
    """The CPU device for host-side math, or None."""
    try:
        return jax.local_devices(backend='cpu')[0]
    except RuntimeError:
        return None


class on_host:
    """Context manager running enclosed jax ops on the host CPU device
    (no-op if no CPU backend is registered)."""

    def __enter__(self):
        dev = host_device()
        self._ctx = jax.default_device(dev) if dev is not None else None
        if self._ctx is not None:
            self._ctx.__enter__()
        return self

    def __exit__(self, *exc):
        if self._ctx is not None:
            return self._ctx.__exit__(*exc)
        return False


def _parse_bytes(s: str) -> int:
    """'2G', '512M', '1048576' -> bytes."""
    s = s.strip().upper()
    mult = {'K': 1 << 10, 'M': 1 << 20, 'G': 1 << 30, 'T': 1 << 40}
    if s and s[-1] in mult:
        return int(float(s[:-1]) * mult[s[-1]])
    return int(s)


def device_memory_bytes() -> int:
    """Reported memory of the default device (bytes), or 0 if the
    backend does not expose it (e.g. the CPU platform)."""
    try:
        stats = jax.local_devices()[0].memory_stats()
        if stats:
            return int(stats.get('bytes_limit', 0))
    except Exception:
        pass
    return 0


def memory_budget(fraction: float = 1 / 8,
                  fallback: int = 2 << 30) -> int:
    """Working-buffer byte budget for memory-bounded chunked kernels
    (the K4 scan-table chunking and the K11 concat-rule group batching).

    Resolution order: the ``FF_TPU_MEMORY_BUDGET`` env var (bytes, or
    with a K/M/G/T suffix) overrides everything; otherwise *fraction*
    of the device's reported memory (so a 16 GB v5e gets the tuned
    2 GiB at the default fraction while smaller chips scale down);
    *fallback* when the backend reports nothing.  Clamped to
    [64 MiB, 4 GiB] -- the kernels chunk more/less aggressively, the
    result is identical either way.
    """
    env = os.environ.get('FF_TPU_MEMORY_BUDGET')
    if env:
        return _parse_bytes(env)
    total = device_memory_bytes()
    budget = int(total * fraction) if total else int(fallback)
    return max(64 << 20, min(budget, 4 << 30))


def contraction_mode() -> str:
    """How the hot control-matrix contraction is executed.

    'native' -- one fused XLA einsum in the working precision.
    'ozaki'  -- restructured as batched matmuls running on the MXU via
                the Ozaki bf16-slice scheme (f64-class accuracy at
                matrix-unit speed; see ops/ozaki.py).

    Default: 'ozaki' on TPU backends under x64 (where XLA's f64 matmul
    is scalar-emulated), 'native' elsewhere.  Override with the
    FF_TPU_CONTRACT environment variable.
    """
    mode = os.environ.get('FF_TPU_CONTRACT')
    if mode:
        return mode
    if jax.config.jax_enable_x64 and backend() != 'cpu':
        return 'ozaki'
    return 'native'


def ozaki_operand_dtype(which: str = 'P'):
    """Element dtype in which the Ozaki matmul operand lattices are
    assembled on TPU ('P' the frequency-dependent tensor, 'D' the
    frequency-independent one).

    f32 assembly runs natively on the VPU instead of through f64
    emulation, at ~2^-24 relative element rounding.  Those rounding
    errors grow through the K-deep reduction (measured: full-f32
    operands take the flagship parity from 5.1e-11 to 1.26e-9 at a
    34% speedup), so the default is conservative: P-only f32 -- its
    per-frequency errors average incoherently in the spectral
    integral -- and f64 for D, whose errors are shared by every
    frequency.  FF_TPU_OZAKI_OPERANDS=f64|f32|split overrides
    (f64: all full precision; f32: everything fast; split: the
    default).
    """
    mode = os.environ.get('FF_TPU_OZAKI_OPERANDS', 'split')
    if mode in ('f32', 'float32'):
        return jnp.float32
    if mode in ('f64', 'float64'):
        return jnp.float64
    return jnp.float32 if which == 'P' else jnp.float64


def transform_dtype(reduction_depth: int):
    """Working dtype of the frequency-independent transform chain
    feeding the control-matrix contraction (Q†V, V†BV, the basis
    conjugation), or None for the working precision (the default).

    An OPT-IN fast mode, NOT enabled by default: unlike the factored
    path's post-hoc 23-bit quantization of the finished operands
    (harmless: it perturbs the contraction inputs linearly, measured
    flagship parity 7.9e-11), f32 rounding here perturbs the
    eigenvector frame BEFORE the conjugation, making the transformed
    operators inconsistent with the exact eigenvalues that build the
    frequency-integral kernel.  That inconsistency is amplified ~1e4
    by the d = 16 QFT spectrum: measured 11.0 ms/pulse (vs 14.9) but
    2.7e-3 relative control-matrix error and 9.0e-7 infidelity parity
    -- three orders outside the 1e-10 contract.  Use
    FF_TPU_TRANSFORM_DTYPE=f32 (always) or f32-deep (only when the
    contraction runs the deep factored path) when ~1e-6 parity
    suffices; f64 (default) keeps the working precision.
    """
    mode = os.environ.get('FF_TPU_TRANSFORM_DTYPE', 'f64')
    if mode in ('f64', 'float64'):
        return None
    if mode in ('f32', 'float32'):
        return jnp.float32
    from .ops.ozaki import DEFAULT_PRECISION_BITS, _slice_params
    deep = _slice_params(reduction_depth, DEFAULT_PRECISION_BITS)[0] \
        in (5, 6)
    if deep and contraction_mode() == 'ozaki' and ozaki_factored():
        return jnp.float32
    return None


def transform_mxu(reduction_depth: int) -> bool:
    """Whether the frequency-independent conjugations (V†BV, the basis
    conjugation) run as Ozaki MXU matmuls (numeric._conjugate_mxu)
    instead of emulated-f64 einsums.

    Exact-path alternative to :func:`transform_dtype`: the digit
    slices decompose the f64 eigenvectors error-free, so the only new
    error is ~2^-30-level truncation noise on the RESULT -- measured
    1.5e-10 max element error at flagship shapes, far below the
    factored contraction's own operand quantization; flagship parity
    unchanged.  Default: on whenever the contraction itself runs the
    Ozaki path (TPU + x64) -- measured wins at both ends of the shape
    range (flagship d=16 deep: 13.7 -> 11.3 ms/pulse; batched CPMG
    d=2 shallow: 0.359 -> 0.273 ms/pulse at bit-identical closed-form
    parity, the emulated-f64 conjugation einsums being elementwise-
    bound at every d).  Override with FF_TPU_TRANSFORM_MXU=0|1.
    """
    mode = os.environ.get('FF_TPU_TRANSFORM_MXU')
    if mode is not None:
        return mode != '0'
    return contraction_mode() == 'ozaki'


def ozaki_factored() -> bool:
    """Whether the control-matrix contraction may form the D operand's
    digit slices by native int32 factor arithmetic
    (ops/ozaki.ozaki_matmul_c_outer) instead of assembling D in
    emulated f64.  Disable with FF_TPU_OZAKI_FACTORED=0."""
    return os.environ.get('FF_TPU_OZAKI_FACTORED', '1') != '0'


def ozaki_escalation_tol() -> float:
    """Escalation threshold of the deep factored contraction: when the
    cheap in-graph estimate of the operand-quantization noise on the
    fidelity filter function (numeric._deep_quant_ratio, a sampled
    |P| @ |D| cancellation bound) exceeds this RELATIVE level, the
    contraction re-runs at full precision (f64-assembled operands,
    30-bit truncation) inside a ``lax.cond`` -- so a pathological
    cancellation cannot silently breach the 1e-10 infidelity-parity
    contract.  Calibration (CPU, bit-identical decomposition): the
    estimator reads ~1.2e-3 on the randomized parity ensemble
    (tests/test_accuracy_policy.py; worst TRUE relative parity there
    5.5e-8 ~ 1.1e-11 absolute at flagship infidelity scale) and
    ~1.0e-2 on the flagship bench (true 4e-7 relative = 7.9e-11
    absolute), but 5.7 on a deliberately pathological deep CPMG-300
    train whose refocused F(w -> 0) cancels to 5e-12 of its peak
    (true elementwise FF error there: 9e-4 relative, which escalation
    cuts to the f64 floor).  The default 0.1 sits 10x above the
    flagship and 57x below the pathology: healthy workloads never pay
    the escalation, catastrophic cancellation cannot slip through.
    0 disables escalation entirely.  Override with
    FF_TPU_OZAKI_ESCALATE_TOL."""
    return float(os.environ.get('FF_TPU_OZAKI_ESCALATE_TOL', '0.1'))


def eigh_mode() -> str:
    """How d > 2 Hermitian eigendecompositions run on no-complex
    backends (cplx._eigh_impl).

    'refined'  -- f32 real-embedding eigh + Ogita-Aishima Newton
                  refinement to f64 (matmul-only; the default).  XLA's
                  f64 TPU eigh is scalar-emulated and compiles for
                  minutes while delivering only ~1e-8 residuals; the
                  refined path is faster to run AND to compile at equal
                  or better accuracy.  Caveat: eigenvalue pairs with a
                  *genuine* relative gap inside (1e-12, ~4e-6) are
                  treated as degenerate clusters (backward error up to
                  the gap itself); exact degeneracies are handled
                  exactly.
    'embedded' -- the f64 real-embedding eigh end to end.

    Override with FF_TPU_EIGH.  Read at trace time: set it before the
    first call for a given shape (cached executables keep the mode they
    were traced with).
    """
    return os.environ.get('FF_TPU_EIGH', 'refined')


def supports_native_complex() -> bool:
    """True if the default backend supports the native complex dtype.

    The CPU backend supports complex128; the axon/TPU backend does not
    support complex128 at all (its x64 rewriter aborts), so whenever x64
    is on and we are not on CPU we must avoid native complex arrays.
    """
    if not jax.config.jax_enable_x64:
        return True  # complex64 works everywhere
    return backend() == 'cpu'
