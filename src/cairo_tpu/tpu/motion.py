"""Batched inter motion estimation on device.

Replays the reference search semantics (docs/FORMAT.md §6) for all
macroblocks of a frame at once against one frozen reference frame:
co-located early-out, 5 refinement rings (radius 16,8,4,2,1, 9 candidates
each, evaluated in the C scan order so argmin ties break identically), then
8 sub-pel directions × {half, quarter}.

Candidate blocks are fetched with dense gathers; invalid (out-of-bounds)
candidates are masked out of the acceptance logic. Everything is int32.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .. import tables
from . import ops

MB = tables.MACROBLOCK_SIZE
SAD_THRESHOLD = tables.MOTION_SAD_THRESHOLD
RADIUS = tables.MOTION_SEARCH_RADIUS
INT32_MAX = np.int32(0x7FFFFFFF)

def _sp_index(di, dj):
    """sub-pel direction -> 3-bit index (motion.cpp:61-84)."""
    from ..blocktypes import sp_dir_to_index
    return sp_dir_to_index(di, dj)


def gather_blocks(y, u, v, bx, by):
    """Fetches (N,16,16) Y and (N,8,8) U/V blocks at pixel coords (bx, by).

    Coordinates are clipped for addressing; callers mask invalid candidates.
    """
    height, width = y.shape
    bx = jnp.clip(bx, 0, width - MB)
    by = jnp.clip(by, 0, height - MB)
    ry = by[:, None] + jnp.arange(MB)
    cx = bx[:, None] + jnp.arange(MB)
    yb = y[ry[:, :, None], cx[:, None, :]]
    cy2 = (by >> 1)[:, None] + jnp.arange(MB // 2)
    cx2 = (bx >> 1)[:, None] + jnp.arange(MB // 2)
    ub = u[cy2[:, :, None], cx2[:, None, :]]
    vb = v[cy2[:, :, None], cx2[:, None, :]]
    return yb, ub, vb


def _sad(src_y, cand_y):
    return jnp.abs(src_y - cand_y).sum(axis=(1, 2), dtype=jnp.int32)


def _mad(src, cand):
    my = jnp.abs(src[0] - cand[0]).max(axis=(1, 2))
    mu = jnp.abs(src[1] - cand[1]).max(axis=(1, 2))
    mv = jnp.abs(src[2] - cand[2]).max(axis=(1, 2))
    return jnp.maximum(my, jnp.maximum(mu, mv)).astype(jnp.int32)


class SearchState:
    """Per-MB selection state carried through the candidate sequence."""

    def __init__(self, best_x, best_y, best_sad, best_mad, best_ssd, frozen):
        self.best_x = best_x
        self.best_y = best_y
        self.best_sad = best_sad
        self.best_mad = best_mad
        self.best_ssd = best_ssd
        self.frozen = frozen  # early-out MBs: no further updates


def _evaluate(state: SearchState, cand_xy, src, ref_planes, px, py, mad_thr,
              valid):
    """One candidate per MB, acceptance per motion.cpp:111-149."""
    cx, cy = cand_xy
    cand = gather_blocks(*ref_planes, cx, cy)
    sad = _sad(src[0], cand[0])
    mad = _mad(src, cand)
    ssd = (cx - px) ** 2 + (cy - py) ** 2
    copy_branch = state.best_mad < mad_thr
    accept_copy = (mad < state.best_mad) | \
        ((mad == state.best_mad) & (ssd < state.best_ssd))
    accept_plain = (sad < state.best_sad) | \
        ((sad == state.best_sad) & (ssd < state.best_ssd) & (sad < SAD_THRESHOLD)) | \
        (mad < mad_thr)
    accept = valid & ~state.frozen & \
        jnp.where(copy_branch, accept_copy, accept_plain)
    state.best_x = jnp.where(accept, cx, state.best_x)
    state.best_y = jnp.where(accept, cy, state.best_y)
    state.best_sad = jnp.where(accept, sad, state.best_sad)
    state.best_mad = jnp.where(accept, mad, state.best_mad)
    state.best_ssd = jnp.where(accept, ssd, state.best_ssd)


def inter_search(src, ref_planes, px, py, quality):
    """Full-pel + sub-pel search for every MB against one reference frame.

    src: (Y (N,16,16), U (N,8,8), V (N,8,8)) int32 source blocks
    ref_planes: (y, u, v) int32 reference planes
    px, py: (N,) MB pixel coordinates
    Returns dict of per-MB selection arrays.
    """
    height, width = ref_planes[0].shape
    mad_thr = (jnp.int32(quality) >> 2) + 1

    colocated = gather_blocks(*ref_planes, px, py)
    state = SearchState(
        best_x=px, best_y=py,
        best_sad=_sad(src[0], colocated[0]),
        best_mad=_mad(src, colocated),
        best_ssd=jnp.full_like(px, INT32_MAX),
        frozen=jnp.zeros(px.shape, dtype=bool))
    state.frozen = state.best_mad < mad_thr  # co-located early-out

    for step in (16, 8, 4, 2, 1):
        base_x, base_y = state.best_x, state.best_y
        for j in (-step, 0, step):
            for i in (-step, 0, step):
                cx, cy = base_x + i, base_y + j
                valid = (cx >= 0) & (cx <= width - MB) & \
                        (cy >= 0) & (cy <= height - MB)
                _evaluate(state, (cx, cy), src, ref_planes, px, py, mad_thr,
                          valid)

    # sub-pel: 8 neighbors × {half, quarter} against the full-pel best
    best_block = gather_blocks(*ref_planes, state.best_x, state.best_y)
    sp_enabled = jnp.zeros(px.shape, dtype=bool)
    sp_amount = jnp.zeros(px.shape, dtype=bool)
    sp_index = jnp.zeros(px.shape, dtype=jnp.int32)
    for dj in (-1, 0, 1):
        for di in (-1, 0, 1):
            if di == 0 and dj == 0:
                continue
            tx, ty = state.best_x + di, state.best_y + dj
            valid = (tx >= 0) & (tx <= width - MB) & \
                    (ty >= 0) & (ty <= height - MB)
            test = gather_blocks(*ref_planes, tx, ty)
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
                sp_index = jnp.where(accept, _sp_index(di, dj), sp_index)
                state.best_sad = jnp.where(accept, sad, state.best_sad)
                state.best_mad = jnp.where(accept, mad, state.best_mad)

    motion = (state.best_x != px) | (state.best_y != py) | sp_enabled
    copy = state.best_mad < mad_thr
    return dict(sad=state.best_sad, mad=state.best_mad,
                motion_x=state.best_x - px, motion_y=state.best_y - py,
                is_motion=motion, is_copy=copy,
                sp_pred=sp_enabled, sp_amount=sp_amount, sp_index=sp_index)
