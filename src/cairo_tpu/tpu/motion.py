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

import jax
import jax.numpy as jnp
import numpy as np

from .. import tables
from ..blocktypes import sp_dir_to_index
from . import backend, extract, ops

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


def window_blocks_multi(wins, mx, my):
    """K candidates per MB at once: mx/my (N, K) -> (N, K, ...) blocks."""
    wy, wu, wv = wins
    yb = extract.extract_blocks_multi(wy, mx + Y_PAD, my + Y_PAD, MB)
    ub = extract.extract_blocks_multi(wu, (mx >> 1) + C_PAD,
                                      (my >> 1) + C_PAD, MB // 2)
    vb = extract.extract_blocks_multi(wv, (mx >> 1) + C_PAD,
                                      (my >> 1) + C_PAD, MB // 2)
    return yb, ub, vb


def _sad_k(src_y, cand_y):
    return jnp.abs(src_y[:, None] - cand_y).sum(axis=(2, 3),
                                                dtype=jnp.int32)


def _mad_k(src, cand):
    m = jnp.abs(src[0][:, None] - cand[0]).max(axis=(2, 3))
    m = jnp.maximum(m, jnp.abs(src[1][:, None] - cand[1]).max(axis=(2, 3)))
    return jnp.maximum(
        m, jnp.abs(src[2][:, None] - cand[2]).max(axis=(2, 3))
    ).astype(jnp.int32)


def _sad(src_y, cand_y):
    return jnp.abs(src_y - cand_y).sum(axis=(1, 2), dtype=jnp.int32)


def _mad(src, cand):
    my = jnp.abs(src[0] - cand[0]).max(axis=(1, 2))
    mu = jnp.abs(src[1] - cand[1]).max(axis=(1, 2))
    mv = jnp.abs(src[2] - cand[2]).max(axis=(1, 2))
    return jnp.maximum(my, jnp.maximum(mu, mv)).astype(jnp.int32)


def inter_search_exact(src, ref_planes, px, py, quality):
    """Full-pel + sub-pel search for every MB against one reference frame.

    src: (Y (N,16,16), U (N,8,8), V (N,8,8)) int32 source blocks;
    ref_planes: (y, u, v) int32 planes; px/py: (N,) MB pixel coords.
    """
    height, width = ref_planes[0].shape
    mad_thr = (jnp.int32(quality) >> 2) + 1
    # materialize the windows once (prevents re-fusing the 200MB slice tree
    # into each of the ~60 candidate evaluations)
    wins = jax.lax.optimization_barrier(search_windows(ref_planes))
    n = px.shape[0]
    zero = jnp.zeros(n, jnp.int32)

    colocated = window_blocks(wins, zero, zero)
    co_sad = _sad(src[0], colocated[0])
    co_mad = _mad(src, colocated)
    frozen = co_mad < mad_thr  # co-located early-out

    def in_bounds(mx, my):
        cx, cy = px + mx, py + my
        return (cx >= 0) & (cx <= width - MB) & (cy >= 0) & (cy <= height - MB)

    # 5 rings x 9 candidates: candidate POSITIONS within a ring depend
    # only on the ring-entry best, so each ring's 9 extractions/metrics
    # batch into one multi call; the order-dependent acceptance
    # (evaluate_motion_candidate, motion.cpp:111-149) folds sequentially.
    rings = jnp.asarray(
        [[(i, j) for j in (-step, 0, step) for i in (-step, 0, step)]
         for step in (16, 8, 4, 2, 1)], jnp.int32)  # (5, 9, 2)

    def in_bounds_k(cx, cy):
        gx, gy = px[:, None] + cx, py[:, None] + cy
        return (gx >= 0) & (gx <= width - MB) & \
               (gy >= 0) & (gy <= height - MB)

    def ring_fold(carry, offs, c_sad, c_mad, cx, cy, ok):
        mx, my, sad, mad, ssd = carry
        for k in range(offs.shape[0]):
            c_ssd = cx[:, k] * cx[:, k] + cy[:, k] * cy[:, k]
            copy_branch = mad < mad_thr
            accept_copy = (c_mad[:, k] < mad) | \
                ((c_mad[:, k] == mad) & (c_ssd < ssd))
            accept_plain = (c_sad[:, k] < sad) | \
                ((c_sad[:, k] == sad) & (c_ssd < ssd) &
                 (c_sad[:, k] < SAD_THRESHOLD)) | \
                (c_mad[:, k] < mad_thr)
            accept = ok[:, k] & ~frozen & \
                jnp.where(copy_branch, accept_copy, accept_plain)
            mx = jnp.where(accept, cx[:, k], mx)
            my = jnp.where(accept, cy[:, k], my)
            sad = jnp.where(accept, c_sad[:, k], sad)
            mad = jnp.where(accept, c_mad[:, k], mad)
            ssd = jnp.where(accept, c_ssd, ssd)
        return (mx, my, sad, mad, ssd)

    def ring_body(carry, offs):
        mx, my = carry[0], carry[1]
        cx = mx[:, None] + offs[None, :, 0]   # frozen ring base
        cy = my[:, None] + offs[None, :, 1]
        ok = in_bounds_k(cx, cy)
        cand = window_blocks_multi(wins, cx, cy)
        c_sad = _sad_k(src[0], cand[0])
        c_mad = _mad_k(src, cand)
        return ring_fold(carry, offs, c_sad, c_mad, cx, cy, ok), None

    carry = (zero, zero, co_sad, co_mad, jnp.full(n, INT32_MAX))
    carry, _ = jax.lax.scan(ring_body, carry, rings[:4])

    # last ring inline so its candidates stay live: the final best is one
    # of these 9 positions ((0,0) is the ring base), so best_block is a
    # per-MB pick instead of a fresh extraction
    offs = rings[4]
    lcx = carry[0][:, None] + offs[None, :, 0]
    lcy = carry[1][:, None] + offs[None, :, 1]
    lok = in_bounds_k(lcx, lcy)
    lcand = window_blocks_multi(wins, lcx, lcy)
    l_sad = _sad_k(src[0], lcand[0])
    l_mad = _mad_k(src, lcand)
    mx, my, best_sad, best_mad, best_ssd = ring_fold(
        carry, offs, l_sad, l_mad, lcx, lcy, lok)
    k_sel = jnp.argmax((lcx == mx[:, None]) & (lcy == my[:, None]), axis=1)
    ksel4 = k_sel[:, None, None, None]
    best_block = tuple(
        jnp.take_along_axis(c, ksel4, axis=1)[:, 0] for c in lcand)

    # sub-pel: all 8 neighbor tests at once; the acceptance folds in the
    # reference's order (per direction: half then quarter)
    sp_offsets = np.asarray(
        [(di, dj, sp_dir_to_index(di, dj))
         for dj in (-1, 0, 1) for di in (-1, 0, 1) if (di, dj) != (0, 0)],
        np.int32)  # (8, 3)
    doffs = jnp.asarray(sp_offsets)
    tmx = mx[:, None] + doffs[None, :, 0]
    tmy = my[:, None] + doffs[None, :, 1]
    ok8 = in_bounds_k(tmx, tmy) & ~frozen[:, None]
    tests = window_blocks_multi(wins, tmx, tmy)
    halves = tuple(ops.lerp_half(b[:, None], t)
                   for b, t in zip(best_block, tests))
    quarters = tuple(ops.lerp_quarter(b[:, None], t)
                     for b, t in zip(best_block, tests))
    h_sad = _sad_k(src[0], halves[0])
    h_mad = _mad_k(src, halves)
    q_sad = _sad_k(src[0], quarters[0])
    q_mad = _mad_k(src, quarters)

    sad_s, mad_s = best_sad, best_mad
    sp_enabled = jnp.zeros(n, bool)
    sp_amount = jnp.zeros(n, bool)
    sp_index = jnp.zeros(n, jnp.int32)
    for d in range(8):
        for amount, c_sad, c_mad in ((False, h_sad[:, d], h_mad[:, d]),
                                     (True, q_sad[:, d], q_mad[:, d])):
            copy_branch = mad_s < mad_thr
            accept = ok8[:, d] & jnp.where(
                copy_branch, c_mad < mad_s,
                ((c_sad < sad_s) & (c_sad < SAD_THRESHOLD))
                | (c_mad < mad_thr))
            sp_enabled = jnp.where(accept, True, sp_enabled)
            sp_amount = jnp.where(accept, amount, sp_amount)
            sp_index = jnp.where(accept, int(sp_offsets[d, 2]), sp_index)
            sad_s = jnp.where(accept, c_sad, sad_s)
            mad_s = jnp.where(accept, c_mad, mad_s)
    best_sad, best_mad = sad_s, mad_s

    motion = (mx != 0) | (my != 0) | sp_enabled
    copy = best_mad < mad_thr
    return dict(sad=best_sad, mad=best_mad,
                motion_x=mx, motion_y=my,
                is_motion=motion, is_copy=copy,
                sp_pred=sp_enabled, sp_amount=sp_amount, sp_index=sp_index)


# --------------------------------------------------------------------------
# Dense search (fast-mode default)
#
# Exhaustively evaluates every full-pel offset in [-R, R]^2 with shifted-
# plane passes (static slices, no per-MB extraction), then selects per MB
# with a deterministic policy mirroring the reference's preferences:
#   1. co-located early-out if its MAD < threshold (motion.cpp:450-453);
#   2. else among copy-grade offsets (MAD < threshold): lexicographic
#      (MAD, pixel-distance^2, scan order);
#   3. else lexicographic (SAD, pixel-distance^2, scan order).
# This dominates the reference's 45-candidate hill-climb in RD terms (it
# sees every offset the initial ring could reach) while being pure dense
# VPU work. Sub-pel refinement then replays the reference's 8-direction
# half/quarter evaluation from per-MB windows.

DENSE_R = RADIUS  # +/-16


def _chroma_max_maps(src_u, src_v, ref_u_wide, ref_v_wide, radius):
    """(n_off, hb, wb, n_off) chroma abs-max maps over offsets
    [-radius, radius]. ref planes carry a `radius` horizontal margin."""
    height, width = src_u.shape
    span = 2 * radius + 1
    hb, wb = height // 8, width // 8
    pu = jnp.pad(ref_u_wide.astype(jnp.int16), ((radius, radius), (0, 0)))
    pv = jnp.pad(ref_v_wide.astype(jnp.int16), ((radius, radius), (0, 0)))
    su = src_u.astype(jnp.int32)
    sv = src_v.astype(jnp.int32)

    def row(dy, maps):
        slab_u = jax.lax.dynamic_slice(pu, (dy, 0), (height, width + 2 * radius))
        slab_v = jax.lax.dynamic_slice(pv, (dy, 0), (height, width + 2 * radius))

        def col(dx, row_map):
            du = jnp.abs(su - jax.lax.dynamic_slice(
                slab_u, (0, dx), (height, width)).astype(jnp.int32))
            dv = jnp.abs(sv - jax.lax.dynamic_slice(
                slab_v, (0, dx), (height, width)).astype(jnp.int32))
            d = jnp.maximum(du, dv).reshape(hb, 8, wb, 8)
            return jax.lax.dynamic_update_slice(
                row_map, d.max(axis=(1, 3))[:, :, None], (0, 0, dx))

        row_map = jax.lax.fori_loop(
            0, span, col, jnp.zeros((hb, wb, span), jnp.int32))
        return jax.lax.dynamic_update_slice(maps, row_map[None], (dy, 0, 0, 0))

    return jax.lax.fori_loop(0, span, row,
                             jnp.zeros((span, hb, wb, span), jnp.int32))


def _dense_select(src_y, ref_y_wide, cmax, px, py, x0, width, height,
                  mad_thr, hb, wb):
    """Sweeps all offsets in [-R, R]^2, carrying per-MB running selections
    instead of materializing offset maps (keeps HBM traffic to the two
    planes per shifted row).

    Returns (mx, my, sad, mad, frozen) per MB under the fast-mode policy:
    co-located early-out; else lexicographic (MAD, dist^2, scan) among
    copy-grade offsets; else lexicographic (SAD, dist^2, scan).
    """
    span = 2 * DENSE_R + 1
    cr = DENSE_R // 2
    tile_w = src_y.shape[1]
    padded = jnp.pad(ref_y_wide.astype(jnp.int16), ((DENSE_R, DENSE_R), (0, 0)))
    src = src_y.astype(jnp.int32)
    pxm = px.reshape(hb, wb)
    pym = py.reshape(hb, wb)
    big = jnp.full((hb, wb), INT32_MAX, jnp.int32)
    zero = jnp.zeros((hb, wb), jnp.int32)

    def row(dy, carry):
        oy = dy - DENSE_R
        slab = jax.lax.dynamic_slice(padded, (dy, 0),
                                     (src_y.shape[0], tile_w + 2 * DENSE_R))
        cdy = (oy >> 1) + cr
        cmax_row = jax.lax.dynamic_slice(
            cmax, (cdy, 0, 0, 0), (1, hb, wb, 2 * cr + 1))[0]

        def col(dx, carry):
            (p_sad, p_ssd, p_mad, p_ox, p_oy,
             c_mad, c_ssd, c_sad, c_ox, c_oy,
             has_copy, co_sad, co_mad) = carry
            ox = dx - DENSE_R
            diff = jnp.abs(src - jax.lax.dynamic_slice(
                slab, (0, dx), (src_y.shape[0], tile_w)).astype(jnp.int32))
            d = diff.reshape(hb, MB, wb, MB)
            sad = d.sum(axis=(1, 3), dtype=jnp.int32)
            mad = jnp.maximum(
                d.max(axis=(1, 3)),
                jax.lax.dynamic_index_in_dim(cmax_row, (ox >> 1) + cr, axis=2,
                                             keepdims=False))
            ssd = ox * ox + oy * oy
            gx = x0 + pxm + ox
            gy = pym + oy
            valid = (gx >= 0) & (gx <= width - MB) & \
                    (gy >= 0) & (gy <= height - MB)

            better = valid & ((sad < p_sad) | ((sad == p_sad) & (ssd < p_ssd)))
            p_sad = jnp.where(better, sad, p_sad)
            p_ssd = jnp.where(better, ssd, p_ssd)
            p_mad = jnp.where(better, mad, p_mad)
            p_ox = jnp.where(better, ox, p_ox)
            p_oy = jnp.where(better, oy, p_oy)

            is_copy = valid & (mad < mad_thr)
            better_c = is_copy & ((mad < c_mad) | ((mad == c_mad) & (ssd < c_ssd)))
            c_mad = jnp.where(better_c, mad, c_mad)
            c_ssd = jnp.where(better_c, ssd, c_ssd)
            c_sad = jnp.where(better_c, sad, c_sad)
            c_ox = jnp.where(better_c, ox, c_ox)
            c_oy = jnp.where(better_c, oy, c_oy)
            has_copy = has_copy | is_copy

            is_center = (oy == 0) & (dx == DENSE_R)
            co_sad = jnp.where(is_center, sad, co_sad)
            co_mad = jnp.where(is_center, mad, co_mad)
            return (p_sad, p_ssd, p_mad, p_ox, p_oy,
                    c_mad, c_ssd, c_sad, c_ox, c_oy, has_copy, co_sad, co_mad)

        return jax.lax.fori_loop(0, span, col, carry)

    carry = (big, big, big, zero, zero,
             big, big, big, zero, zero,
             jnp.zeros((hb, wb), bool), zero, zero)
    (p_sad, p_ssd, p_mad, p_ox, p_oy,
     c_mad, c_ssd, c_sad, c_ox, c_oy,
     has_copy, co_sad, co_mad) = jax.lax.fori_loop(0, span, row, carry)

    frozen = co_mad < mad_thr
    use_copy = has_copy & ~frozen
    mx = jnp.where(frozen, 0, jnp.where(use_copy, c_ox, p_ox)).reshape(-1)
    my = jnp.where(frozen, 0, jnp.where(use_copy, c_oy, p_oy)).reshape(-1)
    sad = jnp.where(frozen, co_sad, jnp.where(use_copy, c_sad, p_sad)).reshape(-1)
    mad = jnp.where(frozen, co_mad, jnp.where(use_copy, c_mad, p_mad)).reshape(-1)
    return mx, my, sad, mad, frozen.reshape(-1)




# Window geometry shared by sub-pel search and prediction assembly:
# Y windows pad DENSE_R+1 (=17) around each MB -> (N, 50, 50);
# chroma pad DENSE_R//2+1 (=9) -> (N, 26, 26). A block at motion offset m
# with sub-pel neighbor d lives at window offset m+d+pad, d in [-1, 1].
Y_WPAD = DENSE_R + 1
C_WPAD = DENSE_R // 2 + 1


def pred_windows(ref_planes, halo=0):
    """Builds the per-MB prediction/sub-pel windows for one frame."""
    y, u, v = ref_planes
    return (extract.mb_windows(y, MB, Y_WPAD, prepad_x=halo),
            extract.mb_windows(u, MB // 2, C_WPAD, prepad_x=halo // 2),
            extract.mb_windows(v, MB // 2, C_WPAD, prepad_x=halo // 2))


def pred_block_from_windows(wins, mx, my, sp_pred, sp_amount, sp_index):
    """Assembles the (possibly sub-pel interpolated) prediction macroblock
    for every MB from its cached windows."""
    wy, wu, wv = wins
    d = jnp.asarray(
        [(-1, -1), (0, -1), (1, -1), (-1, 0), (1, 0), (-1, 1), (0, 1), (1, 1)],
        jnp.int32)[sp_index]
    beta_y = extract.extract_blocks(wy, mx + Y_WPAD, my + Y_WPAD, MB)
    beta_u = extract.extract_blocks(wu, (mx >> 1) + C_WPAD, (my >> 1) + C_WPAD, MB // 2)
    beta_v = extract.extract_blocks(wv, (mx >> 1) + C_WPAD, (my >> 1) + C_WPAD, MB // 2)
    tx, ty = mx + d[:, 0], my + d[:, 1]
    sp_y = extract.extract_blocks(wy, tx + Y_WPAD, ty + Y_WPAD, MB)
    sp_u = extract.extract_blocks(wu, (tx >> 1) + C_WPAD, (ty >> 1) + C_WPAD, MB // 2)
    sp_v = extract.extract_blocks(wv, (tx >> 1) + C_WPAD, (ty >> 1) + C_WPAD, MB // 2)
    use_sp = sp_pred[:, None, None]
    amount = sp_amount[:, None, None]
    out = []
    for b, t in ((beta_y, sp_y), (beta_u, sp_u), (beta_v, sp_v)):
        half = ops.lerp_half(b, t)
        quarter = ops.lerp_quarter(b, t)
        out.append(jnp.where(use_sp, jnp.where(amount, quarter, half), b))
    return tuple(out)


def inter_search(src, src_planes, ref_planes, wins, px, py, quality, *,
                 x0=0, full_width=None, halo=0, ring=None, slot=None):
    """Dense fast-mode search. src: per-MB blocks (for sub-pel); src_planes:
    (y, u, v) core planes; ref_planes: (y, u, v) reference planes carrying a
    horizontal margin of `halo` columns each side (0 = single chip).

    Under spatial sharding, `x0` is the tile's global pixel origin and
    `full_width` the global frame width, so candidate validity is judged
    against the real frame while all addressing stays tile-local.

    wins=None selects the Pallas sub-pel window gather from the ring plane
    stacks (`ring` = (ry, ru, rv) of shape (RING, H, W), `slot` a traced
    scalar); otherwise the windows come from the cached per-slot window
    state (XLA anchor)."""
    height = src_planes[0].shape[0]
    width = full_width if full_width is not None else src_planes[0].shape[1]
    mad_thr = (jnp.int32(quality) >> 2) + 1
    span = 2 * DENSE_R + 1
    n = px.shape[0]
    cr = DENSE_R // 2

    def hmargin(plane, radius, chroma):
        h = halo // 2 if chroma else halo
        if h == radius:
            return plane
        if h > radius:
            return plane[:, h - radius:plane.shape[1] - (h - radius)]
        return jnp.pad(plane, ((0, 0), (radius - h, radius - h)))

    hb = height // MB
    wb = src_planes[0].shape[1] // MB
    if backend.use_pallas():
        from . import pallas_motion
        cmax = pallas_motion.chroma_max_maps(
            src_planes[1], src_planes[2],
            hmargin(ref_planes[1], cr, True), hmargin(ref_planes[2], cr, True))
        mx, my, best_sad, best_mad, frozen = pallas_motion.dense_select(
            src_planes[0], hmargin(ref_planes[0], DENSE_R, False), cmax,
            x0, width, height, mad_thr)
    else:
        cmax = _chroma_max_maps(src_planes[1], src_planes[2],
                                hmargin(ref_planes[1], cr, True),
                                hmargin(ref_planes[2], cr, True), cr)
        mx, my, best_sad, best_mad, frozen = _dense_select(
            src_planes[0], hmargin(ref_planes[0], DENSE_R, False), cmax,
            px, py, x0, width, height, mad_thr, hb, wb)

    # ---- sub-pel refinement windows (per-MB, centered at the best mv)
    if wins is None:
        from . import pallas_pred
        ywin = pallas_pred.gather_windows(ring[0], slot, mx, my,
                                          MB + 2, Y_WPAD)
        uwin = pallas_pred.gather_windows(ring[1], slot, mx >> 1, my >> 1,
                                          MB // 2 + 2, C_WPAD)
        vwin = pallas_pred.gather_windows(ring[2], slot, mx >> 1, my >> 1,
                                          MB // 2 + 2, C_WPAD)
    else:
        wy, wu, wv = wins
        ywin = extract.extract_blocks(wy.astype(jnp.int32),
                                      mx + DENSE_R, my + DENSE_R, MB + 2)
        uwin = extract.extract_blocks(wu.astype(jnp.int32),
                                      (mx >> 1) + C_WPAD - 1,
                                      (my >> 1) + C_WPAD - 1, MB // 2 + 2)
        vwin = extract.extract_blocks(wv.astype(jnp.int32),
                                      (mx >> 1) + C_WPAD - 1,
                                      (my >> 1) + C_WPAD - 1, MB // 2 + 2)
    ywin, uwin, vwin = jax.lax.optimization_barrier((ywin, uwin, vwin))

    best_y = ywin[:, 1:17, 1:17]
    best_u = uwin[:, 1:9, 1:9]
    best_v = vwin[:, 1:9, 1:9]

    # scan over the 8 neighbor directions (same evaluation order as the
    # unrolled reference loop; a scan keeps the XLA graph 8x smaller)
    dirs = jnp.asarray([(di, dj, sp_dir_to_index(di, dj))
                        for dj in (-1, 0, 1) for di in (-1, 0, 1)
                        if (di, dj) != (0, 0)], jnp.int32)

    def sp_body(carry, d):
        sad_s, mad_s, sp_enabled, sp_amount, sp_index = carry
        di, dj = d[0], d[1]
        tmx, tmy = mx + di, my + dj
        valid_sp = ((x0 + px + tmx >= 0) & (x0 + px + tmx <= width - MB) &
                    (py + tmy >= 0) & (py + tmy <= height - MB) & ~frozen)
        test_y = jax.lax.dynamic_slice(ywin, (0, 1 + dj, 1 + di),
                                       (n, MB, MB))
        # chroma neighbor offset depends on the parity of mx/my
        cdx = ((mx + di) >> 1) - (mx >> 1)
        cdy = ((my + dj) >> 1) - (my >> 1)

        def cslice(win, cdx, cdy):
            rows = [win[:, 0:8, :], win[:, 1:9, :], win[:, 2:10, :]]
            r = jnp.where((cdy == -1)[:, None, None], rows[0],
                          jnp.where((cdy == 0)[:, None, None], rows[1],
                                    rows[2]))
            cols = [r[:, :, 0:8], r[:, :, 1:9], r[:, :, 2:10]]
            return jnp.where((cdx == -1)[:, None, None], cols[0],
                             jnp.where((cdx == 0)[:, None, None], cols[1],
                                       cols[2]))
        test_u = cslice(uwin, cdx, cdy)
        test_v = cslice(vwin, cdx, cdy)
        for amount, lerp in ((False, ops.lerp_half), (True, ops.lerp_quarter)):
            cy_ = lerp(best_y, test_y)
            cu_ = lerp(best_u, test_u)
            cv_ = lerp(best_v, test_v)
            c_sad = _sad(src[0], cy_)
            c_mad = _mad(src, (cy_, cu_, cv_))
            copy_branch = mad_s < mad_thr
            accept_copy = c_mad < mad_s
            accept_plain = ((c_sad < sad_s) & (c_sad < SAD_THRESHOLD)) | \
                (c_mad < mad_thr)
            accept = valid_sp & jnp.where(copy_branch, accept_copy,
                                          accept_plain)
            sp_enabled = jnp.where(accept, True, sp_enabled)
            sp_amount = jnp.where(accept, amount, sp_amount)
            sp_index = jnp.where(accept, d[2], sp_index)
            sad_s = jnp.where(accept, c_sad, sad_s)
            mad_s = jnp.where(accept, c_mad, mad_s)
        return (sad_s, mad_s, sp_enabled, sp_amount, sp_index), None

    carry = (best_sad, best_mad, jnp.zeros(n, bool), jnp.zeros(n, bool),
             jnp.zeros(n, jnp.int32))
    (sad_s, mad_s, sp_enabled, sp_amount, sp_index), _ = jax.lax.scan(
        sp_body, carry, dirs)

    motion = (mx != 0) | (my != 0) | sp_enabled
    copy = mad_s < mad_thr
    return dict(sad=sad_s, mad=mad_s, motion_x=mx, motion_y=my,
                is_motion=motion, is_copy=copy,
                sp_pred=sp_enabled, sp_amount=sp_amount, sp_index=sp_index)
