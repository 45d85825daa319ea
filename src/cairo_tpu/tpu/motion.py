"""Batched inter motion estimation on device — reference-exact semantics.

Replays the reference search (docs/FORMAT.md §6) for all macroblocks at once
against one frozen reference frame: co-located early-out, 5 refinement rings
(radius 16,8,4,2,1, 9 candidates each in C scan order), then 8 sub-pel
directions × {half, quarter}.

Implementation: every candidate a MB can ever visit lies within ±32 px of
its own position, so each MB carries a static-position search window
(extract.mb_windows) and candidate blocks are pulled from it with one-hot
MXU matmuls (extract.extract_blocks) — no XLA gathers anywhere. One
candidate evaluation over all 8160 MBs of a 1080p frame is ~0.15 ms.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .. import tables
from ..blocktypes import sp_dir_to_index
from . import extract, ops

MB = tables.MACROBLOCK_SIZE
SAD_THRESHOLD = tables.MOTION_SAD_THRESHOLD
RADIUS = tables.MOTION_SEARCH_RADIUS
INT32_MAX = np.int32(0x7FFFFFFF)

Y_PAD = 2 * RADIUS          # max cumulative ring offset is ±31, sub-pel ±1
C_PAD = RADIUS + 1


def search_windows(ref_planes):
    """Builds per-MB search windows for one reference frame."""
    y, u, v = ref_planes
    return (extract.mb_windows(y, MB, Y_PAD),
            extract.mb_windows(u, MB // 2, C_PAD),
            extract.mb_windows(v, MB // 2, C_PAD))


def window_blocks(wins, mx, my):
    """Candidate blocks at per-MB motion offset (mx, my) from the windows."""
    wy, wu, wv = wins
    yb = extract.extract_blocks(wy, mx + Y_PAD, my + Y_PAD, MB)
    ub = extract.extract_blocks(wu, (mx >> 1) + C_PAD, (my >> 1) + C_PAD, MB // 2)
    vb = extract.extract_blocks(wv, (mx >> 1) + C_PAD, (my >> 1) + C_PAD, MB // 2)
    return yb, ub, vb


def _sad(src_y, cand_y):
    return jnp.abs(src_y - cand_y).sum(axis=(1, 2), dtype=jnp.int32)


def _mad(src, cand):
    my = jnp.abs(src[0] - cand[0]).max(axis=(1, 2))
    mu = jnp.abs(src[1] - cand[1]).max(axis=(1, 2))
    mv = jnp.abs(src[2] - cand[2]).max(axis=(1, 2))
    return jnp.maximum(my, jnp.maximum(mu, mv)).astype(jnp.int32)


class SearchState:
    """Per-MB selection state carried through the candidate sequence.

    Offsets (mx, my) are relative to the MB position — the reference tracks
    absolute (best_x, best_y); both formulations are equivalent."""

    def __init__(self, mx, my, best_sad, best_mad, best_ssd, frozen):
        self.mx = mx
        self.my = my
        self.best_sad = best_sad
        self.best_mad = best_mad
        self.best_ssd = best_ssd
        self.frozen = frozen


def _evaluate(state, mx, my, src, wins, valid, mad_thr):
    """One candidate per MB, acceptance per motion.cpp:111-149."""
    cand = window_blocks(wins, mx, my)
    sad = _sad(src[0], cand[0])
    mad = _mad(src, cand)
    ssd = mx * mx + my * my
    copy_branch = state.best_mad < mad_thr
    accept_copy = (mad < state.best_mad) | \
        ((mad == state.best_mad) & (ssd < state.best_ssd))
    accept_plain = (sad < state.best_sad) | \
        ((sad == state.best_sad) & (ssd < state.best_ssd) & (sad < SAD_THRESHOLD)) | \
        (mad < mad_thr)
    accept = valid & ~state.frozen & \
        jnp.where(copy_branch, accept_copy, accept_plain)
    state.mx = jnp.where(accept, mx, state.mx)
    state.my = jnp.where(accept, my, state.my)
    state.best_sad = jnp.where(accept, sad, state.best_sad)
    state.best_mad = jnp.where(accept, mad, state.best_mad)
    state.best_ssd = jnp.where(accept, ssd, state.best_ssd)


def inter_search(src, ref_planes, px, py, quality):
    """Full-pel + sub-pel search for every MB against one reference frame.

    src: (Y (N,16,16), U (N,8,8), V (N,8,8)) int32 source blocks;
    ref_planes: (y, u, v) int32 planes; px/py: (N,) MB pixel coords.
    """
    height, width = ref_planes[0].shape
    mad_thr = (jnp.int32(quality) >> 2) + 1
    wins = search_windows(ref_planes)
    n = px.shape[0]
    zero = jnp.zeros(n, jnp.int32)

    colocated = window_blocks(wins, zero, zero)
    state = SearchState(
        mx=zero, my=zero,
        best_sad=_sad(src[0], colocated[0]),
        best_mad=_mad(src, colocated),
        best_ssd=jnp.full(n, INT32_MAX),
        frozen=jnp.zeros(n, dtype=bool))
    state.frozen = state.best_mad < mad_thr  # co-located early-out

    def in_bounds(mx, my):
        cx, cy = px + mx, py + my
        return (cx >= 0) & (cx <= width - MB) & (cy >= 0) & (cy <= height - MB)

    for step in (16, 8, 4, 2, 1):
        base_x, base_y = state.mx, state.my
        for j in (-step, 0, step):
            for i in (-step, 0, step):
                mx, my = base_x + i, base_y + j
                _evaluate(state, mx, my, src, wins, in_bounds(mx, my), mad_thr)

    # sub-pel: 8 neighbors × {half, quarter} against the full-pel best
    best_block = window_blocks(wins, state.mx, state.my)
    sp_enabled = jnp.zeros(n, dtype=bool)
    sp_amount = jnp.zeros(n, dtype=bool)
    sp_index = jnp.zeros(n, jnp.int32)
    for dj in (-1, 0, 1):
        for di in (-1, 0, 1):
            if di == 0 and dj == 0:
                continue
            tmx, tmy = state.mx + di, state.my + dj
            valid = in_bounds(tmx, tmy)
            test = window_blocks(wins, tmx, tmy)
            for amount, lerp in ((False, ops.lerp_half), (True, ops.lerp_quarter)):
                cand = tuple(lerp(a, b) for a, b in zip(best_block, test))
                sad = _sad(src[0], cand[0])
                mad = _mad(src, cand)
                copy_branch = state.best_mad < mad_thr
                accept_copy = mad < state.best_mad
                accept_plain = ((sad < state.best_sad) & (sad < SAD_THRESHOLD)) | \
                    (mad < mad_thr)
                accept = valid & ~state.frozen & \
                    jnp.where(copy_branch, accept_copy, accept_plain)
                sp_enabled = jnp.where(accept, True, sp_enabled)
                sp_amount = jnp.where(accept, amount, sp_amount)
                sp_index = jnp.where(accept, sp_dir_to_index(di, dj), sp_index)
                state.best_sad = jnp.where(accept, sad, state.best_sad)
                state.best_mad = jnp.where(accept, mad, state.best_mad)

    motion = (state.mx != 0) | (state.my != 0) | sp_enabled
    copy = state.best_mad < mad_thr
    return dict(sad=state.best_sad, mad=state.best_mad,
                motion_x=state.mx, motion_y=state.my,
                is_motion=motion, is_copy=copy,
                sp_pred=sp_enabled, sp_amount=sp_amount, sp_index=sp_index)
