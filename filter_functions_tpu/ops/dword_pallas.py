r"""Pallas TPU kernel fusing the factored-D digit pipeline.

The factored Ozaki contraction (`ops/ozaki.ozaki_matmul_c_outer`,
reference hot loop /root/reference/filter_functions/numeric.py:846-869)
builds the frequency-independent operand ``D[k, (j c)] = B[k, j] *
C[k, c]`` as int8 digit slices via native int32 arithmetic: 12-bit
factor splits, 30-bit outer-product words, per-column normalization,
round-half-up digit peel.  As XLA ops that pipeline materializes the
(K x J*C) int32 word lattice of every Gauss component in HBM several
times (word build, column max, normalize, peel); this kernel fuses the
whole chain so each component's word lattice lives only in VMEM and
the only HBM traffic is the tiny int32 factors in and the int8 digits
out.

All arithmetic is int32 and IDENTICAL to the XLA path (same split,
word, shift, and peel expressions) -- the kernel is bit-exact against
it, which the tests pin.

Grid: ``(J, C // LANE)`` -- one program per (B column, 128-lane C
tile).  Each program makes two passes over K in VMEM-sized chunks
(pass 1 accumulates the per-column |word| maxima of the three Gauss
components, pass 2 recomputes the words, normalizes, and peels),
recomputing the cheap int32 outer words instead of spilling them.

Gated to shapes the grid can express (C a multiple of 128, K with a
small divisor chunking, unbatched factor tensors); `supported()`
reports eligibility and callers fall back to the XLA path otherwise.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

try:  # pragma: no cover - exercised only where pallas is available
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAVE_PALLAS = True
except Exception:  # pragma: no cover
    _HAVE_PALLAS = False

#: lane width of the C tile (TPU vector lane count).
_LANE = 128
#: K-chunk ceiling: keeps the per-chunk int32 temporaries ~2 MB.
_MAX_KC = 512


def _k_chunk(K: int) -> int:
    """Largest divisor of K that is <= _MAX_KC and a multiple of 8."""
    best = 0
    for kc in range(8, min(K, _MAX_KC) + 1, 8):
        if K % kc == 0:
            best = kc
    return best


#: chunk-count ceiling: the kernel statically unrolls K // kc chunk
#: bodies twice (both passes), so a K whose largest divisor <= _MAX_KC
#: is tiny (e.g. K = 8 * 1021 -> kc = 8, ~2000 iterations/pass) would
#: blow up compile time.  Such shapes fall back to the XLA pipeline.
_MAX_CHUNKS = 64


def supported(K: int, J: int, C: int, ndim: int) -> bool:
    """Whether the kernel's grid can express this factored-D shape."""
    if not (_HAVE_PALLAS and ndim == 2 and C % _LANE == 0):
        return False
    kc = _k_chunk(K)
    return kc > 0 and K // kc <= _MAX_CHUNKS


def _split12(z):
    hi = (z + (1 << 11)) >> 12
    return hi, z - (hi << 12)


def _outer_word(b1, b0, c1, c0):
    p2 = b1 * c1
    p1 = b1 * c0 + b0 * c1
    p0 = b0 * c0
    return (p2 << 6) + ((p1 + ((p0 + (1 << 11)) >> 12) + (1 << 5)) >> 6)


def _comp_words(zbr_c, zbi_c, zcr_c, zci_c):
    """The three Gauss-component word lattices for one K chunk:
    (Dr, Di, Dr + Di) scaled by 2^(28 - eB - eC)."""
    sb1, sb0 = _split12(zbr_c)
    si1, si0 = _split12(zbi_c)
    sc1, sc0 = _split12(zcr_c)
    sd1, sd0 = _split12(zci_c)
    w_rr = _outer_word(sb1, sb0, sc1, sc0)
    w_ii = _outer_word(si1, si0, sd1, sd0)
    w_ri = _outer_word(sb1, sb0, sd1, sd0)
    w_ir = _outer_word(si1, si0, sc1, sc0)
    dr = w_rr - w_ii
    di = w_ri + w_ir
    return dr, di, dr + di


def _kernel(zbr_ref, zbi_ref, zcr_ref, zci_ref,
            dig_r_ref, dig_i_ref, dig_s_ref, shift_ref,
            *, n_d: int, slice_bits: int, kc: int, n_kc: int):
    nbits = n_d * slice_bits

    j = pl.program_id(0)

    def chunk_inputs(k):
        # k is a PYTHON chunk index: the K loop is statically unrolled
        # (n_kc is small) -- Mosaic's handling of i64 loop counters
        # under x64 miscompiles/recurses, and static offsets cost
        # nothing here.
        k0 = k * kc

        # B factors arrive whole (tiny); a single-lane dynamic load is
        # not expressible (lane offsets must be 128-aligned), so select
        # this program's column with an iota mask + lane reduction.
        def col(ref):
            x = ref[pl.ds(k0, kc), :]                # (kc, J)
            lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
            # typed zero: weak-type promotion recurses in the pallas
            # trace under x64
            # dtype pinned: jnp.sum would promote int32 to int64 under
            # x64, which Mosaic cannot lower
            return jnp.sum(jnp.where(lane == j, x, jnp.zeros_like(x)),
                           axis=1, keepdims=True,
                           dtype=jnp.int32)          # (kc, 1)

        zbr, zbi = col(zbr_ref), col(zbi_ref)
        zcr = zcr_ref[pl.ds(k0, kc), :]              # (kc, LANE)
        zci = zci_ref[pl.ds(k0, kc), :]
        return _comp_words(zbr, zbi, zcr, zci)

    # ---- pass 1: per-column |word| maxima of the three components ----
    zeros = jnp.zeros((_LANE,), jnp.int32)
    colmax = (zeros, zeros, zeros)
    for k in range(n_kc):
        words = chunk_inputs(k)
        colmax = tuple(jnp.maximum(m, jnp.max(jnp.abs(w), axis=0))
                       for m, w in zip(colmax, words))

    # ceil(log2(max(colmax, 1))) exactly, via the bit length of
    # colmax - 1 (the XLA path uses f64 log2; f32 would round 2^k + eps
    # down and overflow the top digit)
    shifts = []
    for t in range(3):
        e_w = 32 - jax.lax.clz(jnp.maximum(colmax[t], 1) - 1)
        shifts.append(min(nbits, 30) - 1 - e_w)            # (LANE,)
        shift_ref[t, :] = shifts[t]

    # ---- pass 2: recompute words, normalize, peel digits ----
    for k in range(n_kc):
        k0 = k * kc
        words = chunk_inputs(k)
        for t, out_ref in enumerate((dig_r_ref, dig_i_ref, dig_s_ref)):
            shift = shifts[t][None, :]
            lshift = jnp.maximum(shift, 0)
            rshift = jnp.maximum(-shift, 0)
            half = (jnp.int32(1) << rshift) >> 1
            z = ((words[t] << lshift) + half) >> rshift
            for s in range(n_d - 1, 0, -1):
                sh = slice_bits * s
                d = (z + (1 << (sh - 1))) >> sh
                out_ref[n_d - 1 - s, pl.ds(k0, kc), :] = \
                    d.astype(jnp.int8)
                z = z - (d << sh)
            out_ref[n_d - 1, pl.ds(k0, kc), :] = z.astype(jnp.int8)


@functools.partial(jax.jit,
                   static_argnames=('n_d', 'slice_bits', 'interpret'))
def dword_digits(zbr: jnp.ndarray, zbi: jnp.ndarray,
                 zcr: jnp.ndarray, zci: jnp.ndarray,
                 n_d: int, slice_bits: int, interpret: bool = False
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused digit slices of the three Gauss components of the
    factored D operand.

    zbr/zbi: (K, J) int32 fixed-point B factors; zcr/zci: (K, C) int32
    C factors (23-bit column normalization as in
    `ozaki._ozaki_matmul_c_outer_impl`).  Returns ``(digits, shifts)``
    with digits (3, n_d, K, J*C) int8 (components Dr, Di, Dr+Di; digit
    index high first) and shifts (3, J*C) int32 -- the per-column
    normalization exponents that enter the downstream scale
    ``2^(eB + eC - 28 - shift + nbits - slice_bits)``.
    """
    K, J = zbr.shape
    C = zcr.shape[1]
    kc = _k_chunk(K)
    n_ct = C // _LANE
    _i0 = np.int32(0)
    _in = np.int32(n_ct)
    kernel = functools.partial(_kernel, n_d=n_d, slice_bits=slice_bits,
                               kc=kc, n_kc=K // kc)
    dig_shape = jax.ShapeDtypeStruct((n_d, K, J * C), jnp.int8)
    digs_r, digs_i, digs_s, shifts = pl.pallas_call(
        kernel,
        grid=(J, n_ct),
        # index maps compute in i32 throughout: under x64 the traced
        # Python constants otherwise become i64, which Mosaic rejects
        in_specs=[
            pl.BlockSpec((K, J), lambda j, ct: (_i0, _i0)),
            pl.BlockSpec((K, J), lambda j, ct: (_i0, _i0)),
            pl.BlockSpec((K, _LANE), lambda j, ct: (_i0, ct)),
            pl.BlockSpec((K, _LANE), lambda j, ct: (_i0, ct)),
        ],
        out_specs=[
            pl.BlockSpec((n_d, K, _LANE),
                         lambda j, ct: (_i0, _i0, j * _in + ct)),
            pl.BlockSpec((n_d, K, _LANE),
                         lambda j, ct: (_i0, _i0, j * _in + ct)),
            pl.BlockSpec((n_d, K, _LANE),
                         lambda j, ct: (_i0, _i0, j * _in + ct)),
            pl.BlockSpec((3, _LANE),
                         lambda j, ct: (_i0, j * _in + ct)),
        ],
        out_shape=(dig_shape, dig_shape, dig_shape,
                   jax.ShapeDtypeStruct((3, J * C), jnp.int32)),
        # ~19 MB resident blocks (3 double-buffered digit outputs +
        # padded factor inputs) exceed the default 16 MB scoped-VMEM
        # budget; v5e VMEM is far larger
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024),
        interpret=interpret,
    )(zbr, zbi, zcr, zci)
    return jnp.stack([digs_r, digs_i, digs_s]), shifts
