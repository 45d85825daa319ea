"""Integer 8x8 DCT-II forward/inverse, batched over blocks (transform.cpp).

The wire format's "16x16" luma transform is four independent 8x8 DCTs on the
quadrants (transform.cpp:485-494), so the 8x8 block is the universal unit.

Exact semantics per line (transform.cpp:264-284, 330-349):
  forward:  t_i = sum_k src[k]*B[i,k];  DC row: (t*45)/128, AC: t/2 (both C
            truncating division); then rounded_div(t, 128); int16 store.
  inverse:  per-term scaling before accumulation — k==0: (v*B*45)/128,
            k>0: (v*B)/2; sum; rounded_div(sum, 128); int16 store.
Row pass then column pass for the forward; column pass then row pass for the
inverse. The intermediate is an int16 scratch block, so each pass wraps.
"""

from __future__ import annotations

import numpy as np

from .. import tables
from ..xmath import rounded_div, trunc_div

_B = tables.DCT_BASIS_8.astype(np.int32)  # B[i, k] = basis row i, sample k


def _fwd_1d(x: np.ndarray) -> np.ndarray:
    """Forward pass over the last axis of (..., 8) int32 samples."""
    t = x @ _B.T  # t[..., i] = sum_k x[..., k] * B[i, k]
    dc = trunc_div(t[..., :1] * 45, 128)
    ac = trunc_div(t[..., 1:], 2)
    return rounded_div(np.concatenate([dc, ac], axis=-1), 128).astype(np.int16)


def _inv_1d(v: np.ndarray) -> np.ndarray:
    """Inverse pass: (..., 8) coefficients -> (..., 8) samples."""
    terms = v[..., :, None] * _B[None, :, :]          # (..., k, i)
    total = trunc_div(terms[..., 0, :] * 45, 128) + trunc_div(terms[..., 1:, :], 2).sum(axis=-2)
    return rounded_div(total, 128).astype(np.int16)


def fdct8(blocks: np.ndarray) -> np.ndarray:
    """Forward 8x8 DCT over (..., 8, 8) int16 blocks (rows, then columns)."""
    t = _fwd_1d(blocks.astype(np.int32))
    return _fwd_1d(t.swapaxes(-1, -2).astype(np.int32)).swapaxes(-1, -2)


def idct8(blocks: np.ndarray) -> np.ndarray:
    """Inverse 8x8 DCT over (..., 8, 8) int16 blocks (columns, then rows)."""
    x = blocks.astype(np.int32)
    t = _inv_1d(x.swapaxes(-1, -2)).swapaxes(-1, -2).astype(np.int32)
    return _inv_1d(t)
