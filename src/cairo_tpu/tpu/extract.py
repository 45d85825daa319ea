"""Gather-free per-macroblock window extraction.

TPU XLA lowers per-row composite gathers poorly (~25 ms per (8160,16,16)
fetch at 1080p) and Mosaic DMA requires 128-aligned lane slices, so instead:

1. `mb_windows`: every MB's search window is at a *static* position
   (px-pad, py-pad), so the (N, S, S) window tensor is built from static
   slices of the padded plane — pure data movement XLA handles well.
2. `extract_blocks`: selecting a block at a *per-MB dynamic* offset inside
   its window is two batched one-hot matmuls (rows then columns) — the MXU
   does the gathering.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def pad_plane(plane, pad_top, pad_left, pad_bottom, pad_right):
    return jnp.pad(plane, ((pad_top, pad_bottom), (pad_left, pad_right)))


def mb_windows(plane, mb_size: int, pad: int, prepad_x: int = 0):
    """(H, W+2*prepad_x) plane -> (hb*wb, S, S) windows, S = mb_size+2*pad.

    Window n covers plane rows [py-pad, py+mb_size+pad) for the MB at
    (px, py); out-of-frame area is zero-padded. `prepad_x` marks an existing
    horizontal margin (neighbor-tile halo under spatial sharding) that is
    used instead of zero padding.
    """
    height = plane.shape[0]
    width = plane.shape[1] - 2 * prepad_x
    hb, wb = height // mb_size, width // mb_size
    size = mb_size + 2 * pad
    if prepad_x > pad:
        plane = plane[:, prepad_x - pad:plane.shape[1] - (prepad_x - pad)]
        padded = jnp.pad(plane, ((pad, pad), (0, 0)))
    else:
        padded = jnp.pad(plane, ((pad, pad), (pad - prepad_x, pad - prepad_x)))
    rows = jnp.stack([padded[r * mb_size:r * mb_size + size] for r in range(hb)])
    wins = jnp.stack([rows[:, :, c * mb_size:c * mb_size + size]
                      for c in range(wb)], axis=1)
    return wins.reshape(hb * wb, size, size)


def _onehot_select(windows, sel):
    """Runs a one-hot row/column selection EXACTLY on every backend.

    Every output element has exactly one nonzero product, so the only
    precision question is representing the window VALUES in the matmul
    operand dtype. On CPU, f32 matmuls are true f32 — one f32 pass is
    exact for any int16 sample. On TPU, f32 matmuls run the MXU at
    DEFAULT precision (operands truncated to bf16 — values beyond +-256
    lose bits; this produced real off-by-one recon errors on chip), and
    Precision.HIGHEST costs ~6 bf16 passes; splitting the values into
    hi/lo bytes (each bf16-exact) costs only 2 native passes and is
    exact by construction.
    """
    if jax.default_backend() == "cpu":
        return sel(windows.astype(jnp.float32)).astype(jnp.int32)
    w32 = windows.astype(jnp.int32)
    lo = sel((w32 & 255).astype(jnp.bfloat16)).astype(jnp.int32)
    hi = sel(((w32 >> 8) & 255).astype(jnp.bfloat16)).astype(jnp.int32)
    w = lo + (hi << 8)
    return ((w + 0x8000) & 0xFFFF) - 0x8000



def extract_blocks(windows, ox, oy, block: int):
    """Extracts (N, block, block) blocks at per-window offsets (ox, oy).

    windows: (N, S, S); ox/oy: (N,) offsets into the window (0 = top-left).
    Implemented as one-hot row/column matmuls (MXU-friendly).
    """
    n, size, _ = windows.shape
    iota_s = jnp.arange(size)
    iota_b = jnp.arange(block)
    ox = jnp.clip(ox, 0, size - block)
    oy = jnp.clip(oy, 0, size - block)
    # rows_sel[n, j, s] = 1 iff s == oy[n] + j.
    rows_sel = (iota_s[None, None, :] ==
                (oy[:, None, None] + iota_b[None, :, None]))
    cols_sel = (iota_s[None, :, None] ==
                (ox[:, None, None] + iota_b[None, None, :]))

    def sel(plane):
        tmp = jnp.einsum("njs,nsc->njc", rows_sel.astype(plane.dtype),
                         plane, preferred_element_type=jnp.float32)
        return jnp.einsum("njc,ncb->njb", tmp.astype(plane.dtype),
                          cols_sel.astype(plane.dtype),
                          preferred_element_type=jnp.float32)

    return _onehot_select(windows, sel)


def extract_blocks_multi(windows, ox, oy, block: int):
    """Extracts (N, K, block, block) blocks at K per-window offsets.

    windows: (N, S, S); ox/oy: (N, K). One windows read serves all K
    candidates (the wavefront searches evaluate a 9-candidate ring per
    step): rows ride one batched matmul, columns a (N, K)-batched one.
    Same f32-exactness argument as extract_blocks.
    """
    n, size, _ = windows.shape
    iota_s = jnp.arange(size)
    iota_b = jnp.arange(block)
    ox = jnp.clip(ox, 0, size - block)
    oy = jnp.clip(oy, 0, size - block)
    rows_sel = (iota_s[None, None, None, :] ==
                (oy[:, :, None, None] + iota_b[None, None, :, None]))
    cols_sel = (iota_s[None, None, :, None] ==
                (ox[:, :, None, None] + iota_b[None, None, None, :]))

    def sel(plane):
        tmp = jnp.einsum("nkjs,nsc->nkjc", rows_sel.astype(plane.dtype),
                         plane, preferred_element_type=jnp.float32)
        return jnp.einsum("nkjc,nkcb->nkjb", tmp.astype(plane.dtype),
                          cols_sel.astype(plane.dtype),
                          preferred_element_type=jnp.float32)

    return _onehot_select(windows, sel)
