"""Block analysis metrics — public library-parity API (analysis.h:40-221).

The codec pipeline consumes SAD/MAD/variance2 inline (tpu/motion.py,
tpu/ops.py); this module exposes the full analysis.h surface as batched
array helpers, including the as-built quirks (compute_block_variance
accumulates |x - mean| — the squared term is commented out in the
reference, analysis.h:170 — and compute_block_variance3 subtracts a mean
that is never assigned, i.e. zero, analysis.h:204-216). Differentially
tested against the compiled reference in tests/test_analysis.py.

Inputs are (..., 16, 16) luma (and (..., 8, 8) chroma for MAD) integer
arrays; every function reduces the trailing two axes.
"""

from __future__ import annotations

import numpy as np

from .xmath import rounded_div

MB = 16


def _i32(a):
    return np.asarray(a).astype(np.int64).astype(np.int32)


def _abs16(v):
    """The reference's saturating int16 abs: |-32768| = 32767
    (math.h:196-202). Binds when the operand is a raw int16 sample."""
    return np.where(v == -32768, 32767, np.abs(v))


def block_sad(left, right=None):
    """Sum of absolute differences, luma only (analysis.h:42-68).
    One-argument form treats `left` as a delta block — whose samples go
    through the int16-saturating abs overload."""
    if right is None:
        return _abs16(_i32(left)).sum(axis=(-1, -2), dtype=np.int32)
    d = _i32(left) - _i32(right)
    return np.abs(d).sum(axis=(-1, -2), dtype=np.int32)


def block_mse(left, right):
    """Mean squared error: SSD >> 8 (analysis.h:71-84)."""
    return block_ssd(left, right) >> 8


def block_ssd(left, right):
    """Sum of squared differences (analysis.h:86-100), int32 wrap."""
    d = _i32(left) - _i32(right)
    return (d * d).sum(axis=(-1, -2), dtype=np.int32)


def block_mad(left_y, left_u, left_v, right_y, right_u, right_v):
    """Maximum absolute difference INCLUDING chroma — this is the metric
    that gates skip decisions (analysis.h:103-125)."""
    m = np.abs(_i32(left_y) - _i32(right_y)).max(axis=(-1, -2))
    m = np.maximum(m, np.abs(_i32(left_u) - _i32(right_u)).max(axis=(-1, -2)))
    return np.maximum(
        m, np.abs(_i32(left_v) - _i32(right_v)).max(axis=(-1, -2)))


def block_mean(y):
    """(sum + 128) >> 8 (analysis.h:128-139)."""
    s = _i32(y).sum(axis=(-1, -2), dtype=np.int32)
    return (s + 128) >> 8


def nonzero_block_mean(y):
    """rounded_div(sum |nonzero|, count), 0 if none (analysis.h:141-157).
    Samples go through the int16-saturating abs."""
    v = _i32(y)
    nz = v != 0
    s = np.where(nz, _abs16(v), 0).sum(axis=(-1, -2), dtype=np.int32)
    count = nz.sum(axis=(-1, -2), dtype=np.int32)
    # the reference returns int16 (analysis.h:141): wrap like the C cast
    out = np.where(count > 0, rounded_div(s, np.maximum(count, 1)), 0)
    return out.astype(np.int16).astype(np.int32)


def block_variance(y):
    """As-built: the SQUARE is commented out in the reference, so this is
    (sum |x - mean| + 128) >> 8 (analysis.h:159-174)."""
    v = _i32(y)
    mean = block_mean(y)
    s = np.abs(v - mean[..., None, None]).sum(axis=(-1, -2), dtype=np.int32)
    return (s + 128) >> 8


def block_variance2(y):
    """Sum of squares minus rounded mean-square over nonzero non-DC cells
    (analysis.h:176-198) — the adaptive-QP metric. int32 wrap on sum*sum
    matches the as-built reference (docs/FORMAT.md §5)."""
    v = _i32(y)
    mask = v != 0
    mask[..., 0, 0] = False
    count = mask.sum(axis=(-1, -2), dtype=np.int32)
    s = np.where(mask, v, 0).sum(axis=(-1, -2), dtype=np.int32)
    ss = np.where(mask, v * v, 0).sum(axis=(-1, -2), dtype=np.int32)
    prod = (s.astype(np.int64) * s).astype(np.int32)  # wraps like the C
    var = ss - rounded_div(prod, np.maximum(count, 1))
    return np.where(count > 0, var, 0)


def block_variance3(y):
    """As-built: starts from the nonzero mean but subtracts a `mean`
    variable that is never assigned (always 0), then rounded-divides by
    the nonzero count (analysis.h:200-221)."""
    v = _i32(y)
    nz = v != 0
    nz[..., 0, 0] = False
    start = nonzero_block_mean(y)
    s = start + np.where(nz, np.abs(v), 0).sum(axis=(-1, -2),
                                               dtype=np.int32)
    count = nz.sum(axis=(-1, -2), dtype=np.int32)
    # int16 return type in the reference (analysis.h:200)
    out = np.where(count > 0, rounded_div(s, np.maximum(count, 1)), 0)
    return out.astype(np.int16).astype(np.int32)


def format_macroblock(y, u=None, v=None) -> str:
    """print_macroblock equivalent (macroblock.h:104-155): a debug dump of
    the per-plane sample grids as text."""
    parts = []
    for name, plane in (("Y", y), ("U", u), ("V", v)):
        if plane is None:
            continue
        plane = np.asarray(plane)
        parts.append(f"{name} ({plane.shape[0]}x{plane.shape[1]}):")
        for row in plane:
            parts.append(" ".join(f"{int(x):6d}" for x in row))
    return "\n".join(parts)


def print_macroblock(y, u=None, v=None):
    print(format_macroblock(y, u, v))
