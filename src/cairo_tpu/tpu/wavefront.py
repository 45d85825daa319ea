"""Conformance-mode (bit-exact vs the reference encoder) frame encoding on
device via anti-diagonal wavefront scheduling.

The reference encodes macroblocks in raster order; each block's intra
search reads the *current* frame's partially-reconstructed pixels in the
causal region (candidate valid iff cy <= py-16 or cx <= px-16,
motion.cpp:238-241), and every block is reconstructed before the next is
classified (encode.cpp:165-203). The exploitable structure:

- A block's reads of the current reconstruction are bounded: candidate
  reach is +-31 full-pel (16 initial + 8+4+2+1 refinement) plus 1 sub-pel,
  so pixels [px-32, px+48) x [py-48, py+16) — at most block columns
  bi-2..bi+2 of rows above, and bi-2..bi-1 of the rows at/below (via the
  x <= px-16 branch).
- Schedule blocks in waves w = bi + 3*bj (skew 3). Every current-frame
  block a wave member can READ then satisfies wave < w (already written,
  exactly as in raster order), and every raster-successor it can read
  satisfies wave >= w, i.e. still holds the previous ring content — again
  exactly as in raster order (waves use read-all-then-write-all
  semantics). Members of one wave are mutually independent.

At 1080p that is 321 sequential waves with up to 40-way batching instead
of 8160 sequential blocks. Inter candidates have no raster dependency and
are computed densely for all blocks up front with the order-exact
hill-climb replay (motion.inter_search_exact); the classify merge
(encode.cpp:29-54) folds them associatively, so only the intra search and
the encode/reconstruct of each block live in the wave loop.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import tables
from ..blocktypes import COPY_BIT, INTRA_BIT, MOTION_BIT, sp_dir_to_index
from . import deblock as deblock_mod
from . import extract
from . import motion as motion_mod
from . import ops
from . import wire as wire_mod

MB = tables.MACROBLOCK_SIZE
RING = tables.REFERENCE_FRAME_COUNT
SKEW = 3
YPAD = 48            # window reach: x in [-32, 48), y in [-48, 16)
CPAD = 24
INT32_MAX = np.int32(0x7FFFFFFF)
SAD_THRESHOLD = tables.MOTION_SAD_THRESHOLD


def wave_schedule(wb: int, hb: int):
    """Static wave membership tables: (n_waves, P) bi/bj/valid arrays."""
    n_waves = wb + SKEW * (hb - 1)
    members = [[] for _ in range(n_waves)]
    for bj in range(hb):
        for bi in range(wb):
            members[bi + SKEW * bj].append((bi, bj))
    p = max(len(m) for m in members)
    bi_t = np.zeros((n_waves, p), np.int32)
    bj_t = np.zeros((n_waves, p), np.int32)
    valid = np.zeros((n_waves, p), bool)
    for w, m in enumerate(members):
        for k, (bi, bj) in enumerate(m):
            bi_t[w, k], bj_t[w, k], valid[w, k] = bi, bj, True
    return bi_t, bj_t, valid


def _merge_descs(a, b):
    """classify_block merge (encode.cpp:36-54): copy status dominates, then
    strictly-lower SAD; ties keep `a` (the earlier candidate)."""
    take_on_copy = a["is_copy"] != b["is_copy"]
    take = jnp.where(take_on_copy, b["is_copy"], b["sad"] < a["sad"])
    out = {}
    for k in a:
        out[k] = jnp.where(take, b[k], a[k])
    return out


def _dense_inter(src_blocks, src_planes, state, frame_index, quality, n_refs):
    """Order-exact inter candidates for all MBs, folded across ring offsets
    1..n_refs-1; also returns the winning candidates' prediction blocks."""
    aligned_h, aligned_w = src_planes[0].shape
    wb = aligned_w // MB
    n = src_blocks[0].shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    px = (idx % wb) * MB
    py = (idx // wb) * MB

    from . import backend as backend_mod2
    from . import pallas_inter
    refs = [tuple(
        jax.lax.dynamic_index_in_dim(
            state[k], (frame_index + RING - offset) % RING,
            keepdims=False).astype(jnp.int32)
        for k in ("ring_y", "ring_u", "ring_v"))
        for offset in range(1, n_refs)]
    if backend_mod2.use_pallas() and             pallas_inter.supported(aligned_w, aligned_h, n_refs - 1):
        # the whole exact search + classify merge runs as one Mosaic
        # kernel (the XLA replay below costs ~250 ms/frame at 1080p)
        best = pallas_inter.inter_search(
            src_blocks, refs, quality,
            aligned_w=aligned_w, aligned_h=aligned_h)
    else:
        best = None
        for offset, ref in zip(range(1, n_refs), refs):
            cand = motion_mod.inter_search_exact(src_blocks, ref, px, py,
                                                 quality)
            cand = dict(cand, target=jnp.full(n, offset, jnp.int32),
                        is_intra=jnp.zeros(n, bool))
            best = cand if best is None else _merge_descs(best, cand)

    # prediction blocks for the folded winner (window extraction + sub-pel).
    # On TPU the Pallas prediction-gather kernels resolve the per-MB
    # (slot, mv, sub-pel) addressing straight from the ring planes —
    # the XLA window assembly below costs ~300 ms/frame at 1080p.
    from . import backend as backend_mod
    if backend_mod.use_pallas():
        pred = _wide_gather_pred(
            state, frame_index, best["target"], best["motion_x"],
            best["motion_y"], best["sp_pred"], best["sp_amount"],
            best["sp_index"], jnp.zeros(n, bool))
        return best, pred

    slot_per_mb = (frame_index + RING - best["target"]) % RING
    wins = None
    for s in range(RING):
        planes = tuple(state[k][s].astype(jnp.int32)
                       for k in ("ring_y", "ring_u", "ring_v"))
        ws = motion_mod.search_windows(planes)
        m3 = (slot_per_mb == s)[:, None, None]
        if wins is None:
            wins = tuple(jnp.where(m3, w, 0) for w in ws)
        else:
            wins = tuple(jnp.where(m3, w, o) for w, o in zip(ws, wins))

    mx, my = best["motion_x"], best["motion_y"]
    beta = motion_mod.window_blocks(wins, mx, my)
    d = jnp.asarray(
        [(-1, -1), (0, -1), (1, -1), (-1, 0), (1, 0), (-1, 1), (0, 1),
         (1, 1)], jnp.int32)[best["sp_index"]]
    sp = motion_mod.window_blocks(wins, mx + d[:, 0], my + d[:, 1])
    use_sp = best["sp_pred"][:, None, None]
    amount = best["sp_amount"][:, None, None]
    pred = tuple(
        jnp.where(use_sp, jnp.where(amount, ops.lerp_quarter(b, t),
                                    ops.lerp_half(b, t)), b)
        for b, t in zip(beta, sp))
    return best, pred


def _eval_accept(sad, mad, ssd, c_sad, c_mad, c_ssd, ok, mad_thr):
    """evaluate_motion_candidate acceptance (motion.cpp:111-149), incl. the
    C precedence quirk on the SAD-tie branch."""
    copy_branch = mad < mad_thr
    acc_copy = (c_mad < mad) | ((c_mad == mad) & (c_ssd < ssd))
    acc_plain = (c_sad < sad) | \
        ((c_sad == sad) & (c_ssd < ssd) & (c_sad < SAD_THRESHOLD)) | \
        (c_mad < mad_thr)
    return ok & jnp.where(copy_branch, acc_copy, acc_plain)


# full-pel intra candidate rings: initial triangle scan (motion.cpp:381-385)
# then halving refinement rings. Every ring's 9 candidate POSITIONS are
# relative to the best at ring entry (frozen base), so the 9 extractions
# batch into one call; only the acceptance fold stays sequential.
def _intra_rings():
    rings = [[(i, j) for j in (-32, -16, 0) for i in (-16, 0, 16)]]
    for step in (8, 4, 2, 1):
        rings.append([(i, j) for j in (-step, 0, step)
                      for i in (-step, 0, step)])
    return np.asarray(rings, np.int32)  # (5, 9, 2)


_INTRA_RINGS = _intra_rings()
_SP_DIRS = np.asarray([(di, dj, sp_dir_to_index(di, dj))
                       for dj in (-1, 0, 1) for di in (-1, 0, 1)
                       if (di, dj) != (0, 0)], np.int32)


def _wave_windows(pad_y, pad_u, pad_v, px, py):
    """(P,) member pixel coords -> causal windows around each member:
    Y (P, 80, 80) covering [py-48, py+32) x [px-32, px+48) (candidate
    offsets dy in [-48, 16] plus 16-px block extent), chroma halved.
    pad planes carry a YPAD/CPAD zero margin."""
    p = px.shape[0]
    yws, uws, vws = [], [], []
    for k in range(p):
        # padded coords: window row 0 = py-48+YPAD = py
        yws.append(jax.lax.dynamic_slice(pad_y, (py[k], px[k] + 16),
                                         (80, 80)))
        cy, cx = py[k] // 2, px[k] // 2
        uws.append(jax.lax.dynamic_slice(pad_u, (cy, cx + 8), (40, 40)))
        vws.append(jax.lax.dynamic_slice(pad_v, (cy, cx + 8), (40, 40)))
    return jnp.stack(yws), jnp.stack(uws), jnp.stack(vws)


def _extract_cand(ywin, uwin, vwin, dx, dy):
    """Candidate blocks at member-relative offsets (dx in [-32,32],
    dy in [-48,16)) from the causal windows."""
    yb = extract.extract_blocks(ywin, dx + 32, dy + 48, MB)
    ub = extract.extract_blocks(uwin, (dx >> 1) + 16, (dy >> 1) + 24, MB // 2)
    vb = extract.extract_blocks(vwin, (dx >> 1) + 16, (dy >> 1) + 24, MB // 2)
    return yb, ub, vb


def _extract_cand_multi(ywin, uwin, vwin, dx, dy):
    """K candidates per member at once: dx/dy (P, K) -> (P, K, ...)."""
    yb = extract.extract_blocks_multi(ywin, dx + 32, dy + 48, MB)
    ub = extract.extract_blocks_multi(uwin, (dx >> 1) + 16, (dy >> 1) + 24,
                                      MB // 2)
    vb = extract.extract_blocks_multi(vwin, (dx >> 1) + 16, (dy >> 1) + 24,
                                      MB // 2)
    return yb, ub, vb


def _sad_multi(src, cand):
    return jnp.abs(src[:, None] - cand).sum(axis=(2, 3), dtype=jnp.int32)


def _mad3_multi(srcb, cand):
    m = jnp.abs(srcb[0][:, None] - cand[0]).max(axis=(2, 3))
    m = jnp.maximum(m, jnp.abs(srcb[1][:, None] - cand[1]).max(axis=(2, 3)))
    return jnp.maximum(
        m, jnp.abs(srcb[2][:, None] - cand[2]).max(axis=(2, 3))
    ).astype(jnp.int32)


def _sad(a, b):
    return jnp.abs(a - b).sum(axis=(1, 2), dtype=jnp.int32)


def _mad3(s, c):
    m = jnp.abs(s[0] - c[0]).max(axis=(1, 2))
    m = jnp.maximum(m, jnp.abs(s[1] - c[1]).max(axis=(1, 2)))
    return jnp.maximum(m, jnp.abs(s[2] - c[2]).max(axis=(1, 2))).astype(jnp.int32)


def _intra_search_wave(ywin, uwin, vwin, srcb, px, py, self_sad, quality,
                       aligned_w, aligned_h):
    """Exact replay of calculate_intra_prediction for one wave's members.

    Candidate POSITIONS within a ring depend only on the ring-entry best,
    so each ring's 9 extractions/metrics batch into one call; the
    acceptance recurrence (order-dependent, motion.cpp:111-149) folds
    sequentially over the precomputed metrics."""
    p = px.shape[0]
    mad_thr = (jnp.int32(quality) >> 2) + 1

    def causal_ok_multi(dx, dy):
        cx, cy = px[:, None] + dx, py[:, None] + dy
        causal = (cy <= py[:, None] - MB) | (cx <= px[:, None] - MB)
        bounds = (cx >= 0) & (cx <= aligned_w - MB) & \
                 (cy >= 0) & (cy <= aligned_h - MB)
        return causal & bounds

    def ring_body(carry, offs):
        bx, by, sad, mad, ssd = carry
        dx = bx[:, None] + offs[None, :, 0]   # frozen ring base (P, 9)
        dy = by[:, None] + offs[None, :, 1]
        ok = causal_ok_multi(dx, dy)
        cand = _extract_cand_multi(ywin, uwin, vwin, dx, dy)
        c_sad = _sad_multi(srcb[0], cand[0])
        c_mad = _mad3_multi(srcb, cand)
        c_ssd = dx * dx + dy * dy
        nbx, nby = bx, by
        for k in range(offs.shape[0]):
            acc = _eval_accept(sad, mad, ssd, c_sad[:, k], c_mad[:, k],
                               c_ssd[:, k], ok[:, k], mad_thr)
            nbx = jnp.where(acc, dx[:, k], nbx)
            nby = jnp.where(acc, dy[:, k], nby)
            sad = jnp.where(acc, c_sad[:, k], sad)
            mad = jnp.where(acc, c_mad[:, k], mad)
            ssd = jnp.where(acc, c_ssd[:, k], ssd)
        return (nbx, nby, sad, mad, ssd), None

    zero = jnp.zeros(p, jnp.int32)
    carry = (zero, zero, self_sad, jnp.full(p, INT32_MAX),
             jnp.full(p, INT32_MAX))
    (bx, by, sad, mad, ssd), _ = jax.lax.scan(
        ring_body, carry, jnp.asarray(_INTRA_RINGS)[:4])

    # last ring inline so its candidate blocks stay live: the final best
    # position is always one of these 9 (the ring's (0, 0) offset IS the
    # entry best), so best_block is a per-member pick instead of a fresh
    # extraction
    offs = jnp.asarray(_INTRA_RINGS)[4]
    ldx = bx[:, None] + offs[None, :, 0]
    ldy = by[:, None] + offs[None, :, 1]
    lok = causal_ok_multi(ldx, ldy)
    lcand = _extract_cand_multi(ywin, uwin, vwin, ldx, ldy)
    l_sad = _sad_multi(srcb[0], lcand[0])
    l_mad = _mad3_multi(srcb, lcand)
    l_ssd = ldx * ldx + ldy * ldy
    for k in range(offs.shape[0]):
        acc = _eval_accept(sad, mad, ssd, l_sad[:, k], l_mad[:, k],
                           l_ssd[:, k], lok[:, k], mad_thr)
        bx = jnp.where(acc, ldx[:, k], bx)
        by = jnp.where(acc, ldy[:, k], by)
        sad = jnp.where(acc, l_sad[:, k], sad)
        mad = jnp.where(acc, l_mad[:, k], mad)
        ssd = jnp.where(acc, l_ssd[:, k], ssd)
    k_sel = jnp.argmax((ldx == bx[:, None]) & (ldy == by[:, None]), axis=1)
    ksel4 = k_sel[:, None, None, None]
    best_block = tuple(
        jnp.take_along_axis(c, ksel4, axis=1)[:, 0] for c in lcand)

    # sub-pel: all 8 neighbor tests extracted/lerped at once; acceptance
    # folds in the reference's order (per direction: half then quarter)
    dirs = jnp.asarray(_SP_DIRS)
    tx = bx[:, None] + dirs[None, :, 0]
    ty = by[:, None] + dirs[None, :, 1]
    ok8 = causal_ok_multi(tx, ty)
    tests = _extract_cand_multi(ywin, uwin, vwin, tx, ty)
    halves = tuple(ops.lerp_half(b[:, None], t)
                   for b, t in zip(best_block, tests))
    quarters = tuple(ops.lerp_quarter(b[:, None], t)
                     for b, t in zip(best_block, tests))
    h_sad = _sad_multi(srcb[0], halves[0])
    h_mad = _mad3_multi(srcb, halves)
    q_sad = _sad_multi(srcb[0], quarters[0])
    q_mad = _mad3_multi(srcb, quarters)

    sp_en = jnp.zeros(p, bool)
    sp_am = jnp.zeros(p, bool)
    sp_ix = zero
    for d in range(8):
        for amount, c_sad, c_mad in ((False, h_sad[:, d], h_mad[:, d]),
                                     (True, q_sad[:, d], q_mad[:, d])):
            copy_branch = mad < mad_thr
            acc = ok8[:, d] & jnp.where(
                copy_branch, c_mad < mad,
                ((c_sad < sad) & (c_sad < SAD_THRESHOLD))
                | (c_mad < mad_thr))
            sp_en = jnp.where(acc, True, sp_en)
            sp_am = jnp.where(acc, amount, sp_am)
            sp_ix = jnp.where(acc, int(_SP_DIRS[d, 2]), sp_ix)
            sad = jnp.where(acc, c_sad, sad)
            mad = jnp.where(acc, c_mad, mad)

    is_motion = (bx != 0) | (by != 0) | sp_en
    is_copy = mad < mad_thr
    desc = dict(sad=sad, is_copy=is_copy, is_motion=is_motion,
                is_intra=jnp.ones(p, bool), target=jnp.zeros(p, jnp.int32),
                motion_x=bx, motion_y=by, sp_pred=sp_en, sp_amount=sp_am,
                sp_index=sp_ix)
    # intra prediction at the final selection: the chosen sub-pel blocks
    # were already computed above (halves/quarters at direction d); map
    # sp_index back to the evaluation slot and pick — no new extraction
    dir_slot = jnp.asarray(
        np.argsort(_SP_DIRS[:, 2]).astype(np.int32))[sp_ix]
    ds4 = dir_slot[:, None, None, None]
    use_sp = sp_en[:, None, None]
    amount = sp_am[:, None, None]
    pred = tuple(
        jnp.where(use_sp,
                  jnp.where(amount,
                            jnp.take_along_axis(q, ds4, axis=1)[:, 0],
                            jnp.take_along_axis(h_, ds4, axis=1)[:, 0]),
                  b)
        for b, h_, q in zip(best_block, halves, quarters))
    return desc, pred


@functools.partial(jax.jit, static_argnames=("aligned_w", "aligned_h",
                                             "frame_w", "frame_h",
                                             "is_inter", "n_refs",
                                             "src_fmt"),
                   donate_argnums=(1,))
def conformance_encode_step(src_wire, state, *, aligned_w, aligned_h,
                            frame_w, frame_h, is_inter, n_refs=RING,
                            src_fmt="yuv8"):
    """One frame, bit-exact vs the reference encoder (wavefront schedule).

    state: ring planes + coefficient planes + stale q/variance table fields.
    Returns (new_state, outputs) with the block table and coeff planes."""
    wb, hb = aligned_w // MB, aligned_h // MB
    n = wb * hb

    hdr = jax.lax.bitcast_convert_type(src_wire[:8].reshape(2, 4), jnp.int32)
    frame_index, quality = hdr[0], hdr[1]
    unpack_src = (wire_mod.unpack_yuv5d if src_fmt == "yuv5d"
                  else wire_mod.unpack_yuv8)
    y_in, u_in, v_in = unpack_src(src_wire[8:], aligned_h,
                                  aligned_w, frame_w, frame_h)
    src_blocks = (ops.plane_to_blocks(y_in, MB),
                  ops.plane_to_blocks(u_in, MB // 2),
                  ops.plane_to_blocks(v_in, MB // 2))
    self_sad_all = jnp.abs(src_blocks[0]).sum(axis=(1, 2), dtype=jnp.int32)
    mad_thr = (jnp.int32(quality) >> 2) + 1

    if is_inter:
        inter_best, inter_pred = _dense_inter(
            src_blocks, (y_in, u_in, v_in), state, frame_index, quality,
            n_refs)
    else:
        inter_best = inter_pred = None

    # current ring slot (the frame being written) and its padded planes
    slot = frame_index % RING
    cur_y = jax.lax.dynamic_index_in_dim(state["ring_y"], slot,
                                         keepdims=False).astype(jnp.int32)
    cur_u = jax.lax.dynamic_index_in_dim(state["ring_u"], slot,
                                         keepdims=False).astype(jnp.int32)
    cur_v = jax.lax.dynamic_index_in_dim(state["ring_v"], slot,
                                         keepdims=False).astype(jnp.int32)
    pad_y = jnp.pad(cur_y, YPAD)
    pad_u = jnp.pad(cur_u, CPAD)
    pad_v = jnp.pad(cur_v, CPAD)

    # colocated blocks of the INTER_COPY target are part of inter_pred
    # (mx=my=0 there), so no special path is needed.

    table0 = dict(
        block_type=jnp.zeros(n, jnp.int32),
        prediction_target=jnp.zeros(n, jnp.int32),
        motion_x=jnp.zeros(n, jnp.int32), motion_y=jnp.zeros(n, jnp.int32),
        sp_pred=jnp.zeros(n, bool), sp_amount=jnp.zeros(n, bool),
        sp_index=jnp.zeros(n, jnp.int32),
        q_index=state["stale_q"].astype(jnp.int32),
        variance=state["stale_var"].astype(jnp.int32),
    )
    coef0 = (state["coef_y"].astype(jnp.int32),
             state["coef_u"].astype(jnp.int32),
             state["coef_v"].astype(jnp.int32))

    from . import backend as backend_mod
    from . import pallas_wave
    if backend_mod.use_pallas() and pallas_wave.supported(aligned_w,
                                                          aligned_h):
        # the whole sequential wave pass (search + encode + reconstruct)
        # runs as ONE Mosaic kernel; this XLA body only packs/unpacks.
        rec_y, rec_u, rec_v, kdesc, (cy_b, cu_b, cv_b) = \
            pallas_wave.wave_pass(
                src_blocks, self_sad_all, inter_best, inter_pred,
                cur_y, cur_u, cur_v, quality,
                aligned_w=aligned_w, aligned_h=aligned_h,
                is_inter=is_inter)
        keep_q = kdesc["is_copy"] != 0
        table = dict(
            block_type=(kdesc["is_intra"] * INTRA_BIT
                        | kdesc["is_motion"] * MOTION_BIT
                        | kdesc["is_copy"] * COPY_BIT),
            prediction_target=kdesc["target"],
            motion_x=kdesc["motion_x"], motion_y=kdesc["motion_y"],
            sp_pred=kdesc["sp_pred"] != 0,
            sp_amount=kdesc["sp_amount"] != 0,
            sp_index=kdesc["sp_index"],
            q_index=jnp.where(keep_q, table0["q_index"],
                              kdesc["q_index"]),
            variance=jnp.where(keep_q, table0["variance"],
                               kdesc["variance"]),
        )
        w3 = (~keep_q)[:, None, None]
        coef_y = ops.blocks_to_plane(
            jnp.where(w3, cy_b.astype(jnp.int32),
                      ops.plane_to_blocks(coef0[0], MB)),
            aligned_h, aligned_w)
        coef_u = ops.blocks_to_plane(
            jnp.where(w3, cu_b.astype(jnp.int32),
                      ops.plane_to_blocks(coef0[1], MB // 2)),
            aligned_h // 2, aligned_w // 2)
        coef_v = ops.blocks_to_plane(
            jnp.where(w3, cv_b.astype(jnp.int32),
                      ops.plane_to_blocks(coef0[2], MB // 2)),
            aligned_h // 2, aligned_w // 2)
        return _conformance_tail(rec_y, rec_u, rec_v, table,
                                 coef_y, coef_u, coef_v, state, slot,
                                 aligned_w, aligned_h, wb, hb)

    bi_t, bj_t, valid_t = wave_schedule(wb, hb)
    n_waves, p = bi_t.shape
    bi_t = jnp.asarray(bi_t)
    bj_t = jnp.asarray(bj_t)
    valid_t = jnp.asarray(valid_t)


    def wave_body(w, carry):
        pad_y, pad_u, pad_v, coef_y, coef_u, coef_v, table = carry
        bi = jax.lax.dynamic_index_in_dim(bi_t, w, keepdims=False)
        bj = jax.lax.dynamic_index_in_dim(bj_t, w, keepdims=False)
        valid = jax.lax.dynamic_index_in_dim(valid_t, w, keepdims=False)
        px, py = bi * MB, bj * MB
        m = bj * wb + bi  # member MB indices (P,)

        ywin, uwin, vwin = _wave_windows(pad_y, pad_u, pad_v, px, py)
        srcb = tuple(jnp.take(s, m, axis=0) for s in src_blocks)
        self_sad = jnp.take(self_sad_all, m)

        intra_desc, intra_pred = _intra_search_wave(
            ywin, uwin, vwin, srcb, px, py, self_sad, quality,
            aligned_w, aligned_h)

        if is_inter:
            inter_m = {k: jnp.take(v, m, axis=0) for k, v in
                       inter_best.items()}
            desc = _merge_descs(intra_desc, inter_m)
            ip = tuple(jnp.take(v, m, axis=0) for v in inter_pred)
            pred = tuple(
                jnp.where(desc["is_intra"][:, None, None], a, b)
                for a, b in zip(intra_pred, ip))
        else:
            desc = intra_desc
            pred = intra_pred

        intra_default = desc["is_intra"] & ~desc["is_motion"]
        use_pred = ~intra_default
        pred = tuple(jnp.where(use_pred[:, None, None], pr, 0)
                     for pr in pred)

        # ---- encode path (encode.cpp:69-163)
        res = tuple(ops.wrap16(s - pr) for s, pr in zip(srcb, pred))
        ty = ops.quads_to_mb(ops.fdct8(ops.mb_quads(res[0])))
        tu = ops.fdct8(res[1])
        tv = ops.fdct8(res[2])
        variance = ops.wrap16(ops.block_variance2(ty))
        qp = ops.adaptive_qp(quality, ty).astype(jnp.int32)
        qp4 = jnp.repeat(qp, 4)
        quads = ops.mb_quads(ty).reshape(-1, 8, 8)
        qm4 = jnp.repeat(intra_default, 4)[:, None, None]
        qy = jnp.where(qm4, ops.quantize_8x8(quads, qp4, True, True),
                       ops.quantize_8x8(quads, qp4, False, True))
        qu = jnp.where(intra_default[:, None, None],
                       ops.quantize_8x8(tu, qp, True, False),
                       ops.quantize_8x8(tu, qp, False, False))
        qv = jnp.where(intra_default[:, None, None],
                       ops.quantize_8x8(tv, qp, True, False),
                       ops.quantize_8x8(tv, qp, False, False))
        qy_mb = ops.quads_to_mb(qy.reshape(-1, 4, 8, 8))

        # ---- reconstruction (decode.cpp:15-144)
        dqy = jnp.where(qm4, ops.dequantize_8x8(qy, qp4, True, True),
                        ops.dequantize_8x8(qy, qp4, False, True))
        dqu = jnp.where(intra_default[:, None, None],
                        ops.dequantize_8x8(qu, qp, True, False),
                        ops.dequantize_8x8(qu, qp, False, False))
        dqv = jnp.where(intra_default[:, None, None],
                        ops.dequantize_8x8(qv, qp, True, False),
                        ops.dequantize_8x8(qv, qp, False, False))
        ry = ops.quads_to_mb(ops.idct8(dqy.reshape(-1, 4, 8, 8)))
        ru = ops.idct8(dqu)
        rv = ops.idct8(dqv)
        copy3 = desc["is_copy"][:, None, None]
        rec = tuple(jnp.where(copy3, pr, ops.wrap16(r + pr))
                    for r, pr in zip((ry, ru, rv), pred))

        # ---- writes: padding members scatter out of range (dropped);
        # the wave-0/last waves pad with (0,0) whose index collides with a
        # real member otherwise
        mw = jnp.where(valid, m, n)
        keep_q = desc["is_copy"]
        new_table = dict(
            block_type=table["block_type"].at[mw].set(
                desc["is_intra"].astype(jnp.int32) * INTRA_BIT
                | desc["is_motion"].astype(jnp.int32) * MOTION_BIT
                | desc["is_copy"].astype(jnp.int32) * COPY_BIT,
                mode="drop"),
            prediction_target=table["prediction_target"].at[mw].set(
                desc["target"], mode="drop"),
            motion_x=table["motion_x"].at[mw].set(
                desc["motion_x"], mode="drop"),
            motion_y=table["motion_y"].at[mw].set(
                desc["motion_y"], mode="drop"),
            sp_pred=table["sp_pred"].at[mw].set(
                desc["sp_pred"], mode="drop"),
            sp_amount=table["sp_amount"].at[mw].set(
                desc["sp_amount"], mode="drop"),
            sp_index=table["sp_index"].at[mw].set(
                desc["sp_index"], mode="drop"),
            q_index=table["q_index"].at[mw].set(
                jnp.where(keep_q, jnp.take(table["q_index"], m), qp),
                mode="drop"),
            variance=table["variance"].at[mw].set(
                jnp.where(keep_q, jnp.take(table["variance"], m),
                          variance), mode="drop"),
        )

        write_coef = valid & ~desc["is_copy"]
        for k in range(p):
            # coefficient planes (unpadded coords)
            oldy = jax.lax.dynamic_slice(coef_y, (py[k], px[k]), (MB, MB))
            coef_y = jax.lax.dynamic_update_slice(
                coef_y, jnp.where(write_coef[k], qy_mb[k], oldy),
                (py[k], px[k]))
            cyy, cxx = py[k] // 2, px[k] // 2
            oldu = jax.lax.dynamic_slice(coef_u, (cyy, cxx), (8, 8))
            coef_u = jax.lax.dynamic_update_slice(
                coef_u, jnp.where(write_coef[k], qu[k], oldu), (cyy, cxx))
            oldv = jax.lax.dynamic_slice(coef_v, (cyy, cxx), (8, 8))
            coef_v = jax.lax.dynamic_update_slice(
                coef_v, jnp.where(write_coef[k], qv[k], oldv), (cyy, cxx))
            # reconstruction (padded coords)
            oy = jax.lax.dynamic_slice(pad_y, (py[k] + YPAD, px[k] + YPAD),
                                       (MB, MB))
            pad_y = jax.lax.dynamic_update_slice(
                pad_y, jnp.where(valid[k], rec[0][k], oy),
                (py[k] + YPAD, px[k] + YPAD))
            ou = jax.lax.dynamic_slice(pad_u, (cyy + CPAD, cxx + CPAD),
                                       (8, 8))
            pad_u = jax.lax.dynamic_update_slice(
                pad_u, jnp.where(valid[k], rec[1][k], ou),
                (cyy + CPAD, cxx + CPAD))
            ov = jax.lax.dynamic_slice(pad_v, (cyy + CPAD, cxx + CPAD),
                                       (8, 8))
            pad_v = jax.lax.dynamic_update_slice(
                pad_v, jnp.where(valid[k], rec[2][k], ov),
                (cyy + CPAD, cxx + CPAD))
        return (pad_y, pad_u, pad_v, coef_y, coef_u, coef_v, new_table)

    carry = (pad_y, pad_u, pad_v) + coef0 + (table0,)
    pad_y, pad_u, pad_v, coef_y, coef_u, coef_v, table = jax.lax.fori_loop(
        0, n_waves, wave_body, carry)

    rec_y = pad_y[YPAD:YPAD + aligned_h, YPAD:YPAD + aligned_w]
    rec_u = pad_u[CPAD:CPAD + aligned_h // 2, CPAD:CPAD + aligned_w // 2]
    rec_v = pad_v[CPAD:CPAD + aligned_h // 2, CPAD:CPAD + aligned_w // 2]
    return _conformance_tail(rec_y, rec_u, rec_v, table,
                             coef_y, coef_u, coef_v, state, slot,
                             aligned_w, aligned_h, wb, hb)


def _conformance_tail(rec_y, rec_u, rec_v, table, coef_y, coef_u, coef_v,
                      state, slot, aligned_w, aligned_h, wb, hb):
    """Deblock + ring update + outputs, shared by the XLA fori-loop and the
    Mosaic wave-kernel paths."""
    # in-loop deblock (deblock.cpp:201-284) on the finished reconstruction
    is_copy = (table["block_type"] & COPY_BIT) != 0
    copy_map = is_copy.reshape(hb, wb)
    q_map = table["q_index"].reshape(hb, wb)
    rec_y, rec_u, rec_v = deblock_mod.deblock_frame(rec_y, rec_u, rec_v,
                                                    copy_map, q_map)

    new_state = dict(
        ring_y=jax.lax.dynamic_update_index_in_dim(
            state["ring_y"], rec_y.astype(jnp.int16), slot, 0),
        ring_u=jax.lax.dynamic_update_index_in_dim(
            state["ring_u"], rec_u.astype(jnp.int16), slot, 0),
        ring_v=jax.lax.dynamic_update_index_in_dim(
            state["ring_v"], rec_v.astype(jnp.int16), slot, 0),
        coef_y=coef_y.astype(jnp.int16), coef_u=coef_u.astype(jnp.int16),
        coef_v=coef_v.astype(jnp.int16),
        stale_q=table["q_index"].astype(jnp.uint8),
        stale_var=table["variance"].astype(jnp.int16),
    )
    outputs = dict(
        block_type=table["block_type"].astype(jnp.uint8),
        prediction_target=table["prediction_target"].astype(jnp.uint8),
        motion_x=table["motion_x"].astype(jnp.int16),
        motion_y=table["motion_y"].astype(jnp.int16),
        sp_pred=table["sp_pred"], sp_amount=table["sp_amount"],
        sp_index=table["sp_index"].astype(jnp.uint8),
        # q/variance carry the stale copy-block values directly (the table
        # persists across frames; clear_block_desc quirk, common.cpp:67-73)
        q_index=table["q_index"].astype(jnp.uint8),
        variance=table["variance"].astype(jnp.int16),
        coef_y=coef_y.astype(jnp.int16), coef_u=coef_u.astype(jnp.int16),
        coef_v=coef_v.astype(jnp.int16),
    )
    return new_state, outputs


def init_state(aligned_w: int, aligned_h: int):
    n = (aligned_w // MB) * (aligned_h // MB)
    return dict(
        ring_y=jnp.zeros((RING, aligned_h, aligned_w), jnp.int16),
        ring_u=jnp.zeros((RING, aligned_h // 2, aligned_w // 2), jnp.int16),
        ring_v=jnp.zeros((RING, aligned_h // 2, aligned_w // 2), jnp.int16),
        coef_y=jnp.zeros((aligned_h, aligned_w), jnp.int16),
        coef_u=jnp.zeros((aligned_h // 2, aligned_w // 2), jnp.int16),
        coef_v=jnp.zeros((aligned_h // 2, aligned_w // 2), jnp.int16),
        stale_q=jnp.zeros(n, jnp.uint8),
        stale_var=jnp.zeros(n, jnp.int16),
    )


# ==========================================================================
# Wavefront DECODE: reference-origin (intra-motion) streams on device.
#
# Decode needs no search — only raster-causal reconstruction
# (decode.cpp:15-144). Blocks that never read the current frame
# (INTER_*, INTRA_DEFAULT) are reconstructed densely up front; only the
# INTRA_MOTION_* blocks enter the wave loop, over a schedule the host
# COMPACTS to the waves that actually contain intra-motion blocks (the
# arrays keep the full static shape, a while_loop stops after
# `n_active` waves — inter frames with a handful of refresh blocks cost
# a handful of iterations, only intra frames pay the full sweep).
#
# Legality note: a conforming encoder only emits causal intra-motion
# vectors (motion.cpp:238-241), so writing raster-successor blocks
# before a wave member reads its window is invisible — the member never
# selects non-causal window content. Hostile streams with non-causal
# vectors are routed to the validating native decoder by the host
# (api.TpuDecoder), not here.

def decode_schedule(wb: int, hb: int):
    """Static geometry of the compacted decode schedule: (n_waves, p)."""
    bi_t, bj_t, _ = wave_schedule(wb, hb)
    return bi_t.shape


def build_compact_schedule(block_type, wb: int, hb: int):
    """Host-side: wave membership arrays covering only the intra-motion
    blocks of one parsed frame. Returns (bi, bj int16 (n_waves, p) with
    -1 padding, n_active)."""
    n_waves, p = decode_schedule(wb, hb)
    bt = np.asarray(block_type, np.int32)
    im = ((bt & INTRA_BIT) != 0) & ((bt & MOTION_BIT) != 0)
    bi = np.full((n_waves, p), -1, np.int16)
    bj = np.full((n_waves, p), -1, np.int16)
    idx = np.flatnonzero(im)
    if idx.size == 0:
        return bi, bj, 0
    bis = (idx % wb).astype(np.int64)
    bjs = (idx // wb).astype(np.int64)
    waves = bis + SKEW * bjs
    order = np.lexsort((idx, waves))
    w_prev, row, col = -1, -1, 0
    for k in order:
        w = waves[k]
        if w != w_prev:
            row += 1
            col = 0
            w_prev = w
        bi[row, col] = bis[k]
        bj[row, col] = bjs[k]
        col += 1
    return bi, bj, row + 1


WIDE_YPAD = 33   # reference inter reach: +-31 full-pel + 1 sub-pel
WIDE_CPAD = 17


def _wide_gather_pred(state, frame_index, target, mx, my, sp_pred,
                      sp_amount, sp_index, zero):
    """engine._gather_pred with the reference encoder's +-31(+1) motion
    reach (the fast-mode gather covers only |mv| <= 16 + sub-pel)."""
    from . import backend as backend_mod

    slot_per_mb = (frame_index + RING - target) % RING
    if backend_mod.use_pallas():
        from . import pallas_pred
        py, pu, pv = pallas_pred.pred_planes(
            state["ring_y"], state["ring_u"], state["ring_v"], slot_per_mb,
            mx, my, sp_pred, sp_amount, sp_index, zero,
            ypad=WIDE_YPAD, cpad=WIDE_CPAD)
        return (ops.plane_to_blocks(py, MB),
                ops.plane_to_blocks(pu, MB // 2),
                ops.plane_to_blocks(pv, MB // 2))

    wins = None
    for s in range(RING):
        ws = (extract.mb_windows(state["ring_y"][s].astype(jnp.int32),
                                 MB, WIDE_YPAD),
              extract.mb_windows(state["ring_u"][s].astype(jnp.int32),
                                 MB // 2, WIDE_CPAD),
              extract.mb_windows(state["ring_v"][s].astype(jnp.int32),
                                 MB // 2, WIDE_CPAD))
        m3 = (slot_per_mb == s)[:, None, None]
        if wins is None:
            wins = tuple(jnp.where(m3, w, 0) for w in ws)
        else:
            wins = tuple(jnp.where(m3, w, o) for w, o in zip(ws, wins))

    d = jnp.asarray(
        [(-1, -1), (0, -1), (1, -1), (-1, 0), (1, 0), (-1, 1), (0, 1),
         (1, 1)], jnp.int32)[sp_index]
    beta = (extract.extract_blocks(wins[0], mx + WIDE_YPAD, my + WIDE_YPAD,
                                   MB),
            extract.extract_blocks(wins[1], (mx >> 1) + WIDE_CPAD,
                                   (my >> 1) + WIDE_CPAD, MB // 2),
            extract.extract_blocks(wins[2], (mx >> 1) + WIDE_CPAD,
                                   (my >> 1) + WIDE_CPAD, MB // 2))
    tx, ty = mx + d[:, 0], my + d[:, 1]
    sp = (extract.extract_blocks(wins[0], tx + WIDE_YPAD, ty + WIDE_YPAD,
                                 MB),
          extract.extract_blocks(wins[1], (tx >> 1) + WIDE_CPAD,
                                 (ty >> 1) + WIDE_CPAD, MB // 2),
          extract.extract_blocks(wins[2], (tx >> 1) + WIDE_CPAD,
                                 (ty >> 1) + WIDE_CPAD, MB // 2))
    use_sp = sp_pred[:, None, None]
    amount = sp_amount[:, None, None]
    pred = tuple(
        jnp.where(use_sp, jnp.where(amount, ops.lerp_quarter(b, t),
                                    ops.lerp_half(b, t)), b)
        for b, t in zip(beta, sp))
    zm = zero[:, None, None]
    return tuple(jnp.where(zm, 0, pr) for pr in pred)



@functools.partial(jax.jit, static_argnames=("aligned_w", "aligned_h",
                                             "frame_w", "frame_h",
                                             "deblock", "coo_k",
                                             "out_fmt"),
                   donate_argnums=(1,))
def conformance_decode_step(in_wire, state, *, aligned_w, aligned_h,
                            frame_w=None, frame_h=None, deblock=True,
                            coo_k=None, out_fmt="yuv8"):
    """Decodes one parsed frame that carries intra-motion blocks.

    state: the engine decode state (ring + persistent coef planes).
    in_wire: 8-byte [frame_index, n_active] header + residual COO +
    packed block table + compacted schedule (bi, bj int16). Returns
    (new_state, yuv wire) like engine.decode_step_coo."""
    wb, hb = aligned_w // MB, aligned_h // MB
    n = wb * hb
    n_waves, p = decode_schedule(wb, hb)
    k = coo_k if coo_k is not None else wire_mod.COO_K

    hdr = jax.lax.bitcast_convert_type(in_wire[:8].reshape(2, 4), jnp.int32)
    frame_index, n_active = hdr[0], hdr[1]
    body = in_wire[8:]
    coo_pos = jax.lax.bitcast_convert_type(
        body[:4 * k].reshape(k, 4), jnp.int32)
    coo_val = jax.lax.bitcast_convert_type(
        body[4 * k:6 * k].reshape(k, 2), jnp.int16)
    o = 6 * k
    table = wire_mod.unpack_table_wire(body[o:o + 10 * n], n)
    o += 10 * n
    bi_t = jax.lax.bitcast_convert_type(
        body[o:o + 2 * n_waves * p].reshape(n_waves, p, 2), jnp.int16)
    o += 2 * n_waves * p
    bj_t = jax.lax.bitcast_convert_type(
        body[o:o + 2 * n_waves * p].reshape(n_waves, p, 2), jnp.int16)

    ys = aligned_h * aligned_w
    cs = (aligned_h // 2) * (aligned_w // 2)
    flat = jnp.zeros(ys + 2 * cs, jnp.int32).at[coo_pos].add(
        coo_val.astype(jnp.int32), mode="drop")
    new_coef = (flat[:ys].reshape(aligned_h, aligned_w),
                flat[ys:ys + cs].reshape(aligned_h // 2, aligned_w // 2),
                flat[ys + cs:].reshape(aligned_h // 2, aligned_w // 2))
    return _conformance_decode_core(
        frame_index, n_active, table, bi_t, bj_t, new_coef, state,
        aligned_w=aligned_w, aligned_h=aligned_h, frame_w=frame_w,
        frame_h=frame_h, deblock=deblock, out_fmt=out_fmt)


@functools.partial(jax.jit, static_argnames=("aligned_w", "aligned_h",
                                             "frame_w", "frame_h",
                                             "deblock", "out_fmt"),
                   donate_argnums=(4,))
def conformance_decode_step_dense(in_wire, cy_in, cu_in, cv_in, state, *,
                                  aligned_w, aligned_h, frame_w=None,
                                  frame_h=None, deblock=True,
                                  out_fmt="yuv8"):
    """COO-overflow variant: residual coefficients arrive as DENSE int16
    planes (cy/cu/cv) instead of the COO wire, so heavy reference-origin
    streams (e.g. 1080p intra frames at q<=4, ~500k+ nonzeros) still
    decode on the device wave path instead of dropping to the sequential
    native decoder (decode.cpp:146-170 handles every conformant stream at
    full speed; so must we). in_wire: 8-byte header + packed table +
    compacted schedule."""
    wb, hb = aligned_w // MB, aligned_h // MB
    n = wb * hb
    n_waves, p = decode_schedule(wb, hb)

    hdr = jax.lax.bitcast_convert_type(in_wire[:8].reshape(2, 4), jnp.int32)
    frame_index, n_active = hdr[0], hdr[1]
    body = in_wire[8:]
    table = wire_mod.unpack_table_wire(body[:10 * n], n)
    o = 10 * n
    bi_t = jax.lax.bitcast_convert_type(
        body[o:o + 2 * n_waves * p].reshape(n_waves, p, 2), jnp.int16)
    o += 2 * n_waves * p
    bj_t = jax.lax.bitcast_convert_type(
        body[o:o + 2 * n_waves * p].reshape(n_waves, p, 2), jnp.int16)
    new_coef = (cy_in.astype(jnp.int32), cu_in.astype(jnp.int32),
                cv_in.astype(jnp.int32))
    return _conformance_decode_core(
        frame_index, n_active, table, bi_t, bj_t, new_coef, state,
        aligned_w=aligned_w, aligned_h=aligned_h, frame_w=frame_w,
        frame_h=frame_h, deblock=deblock, out_fmt=out_fmt)


def _conformance_decode_core(frame_index, n_active, table, bi_t, bj_t,
                             new_coef, state, *, aligned_w, aligned_h,
                             frame_w, frame_h, deblock, out_fmt="yuv8"):
    from ..blocktypes import COPY_BIT as _COPY

    wb, hb = aligned_w // MB, aligned_h // MB
    n_waves, p = decode_schedule(wb, hb)

    block_type = table["block_type"].astype(jnp.int32)
    is_intra = (block_type & INTRA_BIT) != 0
    is_motion = (block_type & MOTION_BIT) != 0
    is_copy = (block_type & _COPY) != 0
    intra_motion = is_intra & is_motion
    intra_default = is_intra & ~is_motion

    # --- persistent coefficient planes (stale carry on copy blocks)
    copy_map = is_copy.reshape(hb, wb)
    ymask = jnp.repeat(jnp.repeat(copy_map, MB, axis=0), MB, axis=1)
    cmask = ymask[::2, ::2]
    coef_y = jnp.where(ymask, state["coef_y"].astype(jnp.int32),
                       new_coef[0])
    coef_u = jnp.where(cmask, state["coef_u"].astype(jnp.int32),
                       new_coef[1])
    coef_v = jnp.where(cmask, state["coef_v"].astype(jnp.int32),
                       new_coef[2])

    # --- dense residual reconstruction for ALL blocks (IDCT of dequant)
    qp = table["q_index"].astype(jnp.int32)
    qp4 = jnp.repeat(qp, 4)
    qm4 = jnp.repeat(intra_default, 4)[:, None, None]
    quads = ops.mb_quads(ops.plane_to_blocks(coef_y, MB)).reshape(-1, 8, 8)
    dq_y = jnp.where(qm4, ops.dequantize_8x8(quads, qp4, True, True),
                     ops.dequantize_8x8(quads, qp4, False, True))
    cu = ops.plane_to_blocks(coef_u, MB // 2)
    cv = ops.plane_to_blocks(coef_v, MB // 2)
    im3 = intra_default[:, None, None]
    dq_u = jnp.where(im3, ops.dequantize_8x8(cu, qp, True, False),
                     ops.dequantize_8x8(cu, qp, False, False))
    dq_v = jnp.where(im3, ops.dequantize_8x8(cv, qp, True, False),
                     ops.dequantize_8x8(cv, qp, False, False))
    res_y = ops.quads_to_mb(ops.idct8(dq_y.reshape(-1, 4, 8, 8)))
    res_u = ops.idct8(dq_u)
    res_v = ops.idct8(dq_v)

    # --- dense prediction + recon for non-intra-motion blocks
    target = jnp.where(is_intra, 0,
                       table["prediction_target"].astype(jnp.int32))
    mx = jnp.where(is_motion, table["motion_x"].astype(jnp.int32), 0)
    my = jnp.where(is_motion, table["motion_y"].astype(jnp.int32), 0)
    sp_pred = is_motion & table["sp_pred"]
    dense_mx = jnp.where(intra_motion, 0, mx)
    dense_my = jnp.where(intra_motion, 0, my)
    pred = _wide_gather_pred(
        state, frame_index, target, dense_mx, dense_my,
        sp_pred & ~intra_motion, table["sp_amount"],
        table["sp_index"].astype(jnp.int32), intra_default | intra_motion)
    copy3 = is_copy[:, None, None]
    rec0 = tuple(jnp.where(copy3, pr, ops.wrap16(r + pr))
                 for r, pr in zip((res_y, res_u, res_v), pred))

    slot = frame_index % RING
    cur = tuple(
        jax.lax.dynamic_index_in_dim(state[key], slot, keepdims=False)
        .astype(jnp.int32)
        for key in ("ring_y", "ring_u", "ring_v"))
    wmask = ~intra_motion
    ymask_w = jnp.repeat(jnp.repeat(wmask.reshape(hb, wb), MB, axis=0),
                         MB, axis=1)
    cmask_w = ymask_w[::2, ::2]
    rec_y0 = jnp.where(ymask_w,
                       ops.blocks_to_plane(rec0[0], aligned_h, aligned_w),
                       cur[0])
    rec_u0 = jnp.where(cmask_w, ops.blocks_to_plane(
        rec0[1], aligned_h // 2, aligned_w // 2), cur[1])
    rec_v0 = jnp.where(cmask_w, ops.blocks_to_plane(
        rec0[2], aligned_h // 2, aligned_w // 2), cur[2])
    pad_y = jnp.pad(rec_y0, YPAD)
    pad_u = jnp.pad(rec_u0, CPAD)
    pad_v = jnp.pad(rec_v0, CPAD)

    # Raster-successor reads: the reference intra search admits below-left
    # candidates (cx <= px-16 with cy > py-16, motion.cpp:238-241) whose
    # pixels are raster SUCCESSORS of the reading block — at decode time
    # the recon buffer still holds the ring slot's previous (4-frames-ago)
    # content there. The dense phase above already wrote successors into
    # pad_*, so wave reads compose two planes: pixels raster-before the
    # member ((y < py) or (y < py+16 and x < px)) come from the written
    # plane, everything else from the untouched pre-frame (stale) planes.
    # In member-relative window coords that is a STATIC mask.
    stale_y = jnp.pad(cur[0], YPAD)
    stale_u = jnp.pad(cur[1], CPAD)
    stale_v = jnp.pad(cur[2], CPAD)
    wy_r = np.arange(80)[:, None]
    wy_c = np.arange(80)[None, :]
    ym_np = (wy_r < 48) | ((wy_r < 64) & (wy_c < 32))
    cm_r = np.arange(40)[:, None]
    cm_c = np.arange(40)[None, :]
    cm_np = (cm_r < 24) | ((cm_r < 32) & (cm_c < 16))
    ymask_win = jnp.asarray(ym_np)[None]
    cmask_win = jnp.asarray(cm_np)[None]

    # --- wave loop over the compacted intra-motion schedule
    dirs = jnp.asarray(
        [(-1, -1), (0, -1), (1, -1), (-1, 0), (1, 0), (-1, 1), (0, 1),
         (1, 1)], jnp.int32)

    def cond(carry):
        return carry[0] < n_active

    def wave_body(carry):
        w, pad_y, pad_u, pad_v = carry
        bi = jax.lax.dynamic_index_in_dim(bi_t, w, keepdims=False) \
            .astype(jnp.int32)
        bj = jax.lax.dynamic_index_in_dim(bj_t, w, keepdims=False) \
            .astype(jnp.int32)
        valid = bi >= 0
        bi = jnp.maximum(bi, 0)
        bj = jnp.maximum(bj, 0)
        px, py = bi * MB, bj * MB
        m = bj * wb + bi

        ywin_n, uwin_n, vwin_n = _wave_windows(pad_y, pad_u, pad_v, px, py)
        ywin_s, uwin_s, vwin_s = _wave_windows(stale_y, stale_u, stale_v,
                                               px, py)
        ywin = jnp.where(ymask_win, ywin_n, ywin_s)
        uwin = jnp.where(cmask_win, uwin_n, uwin_s)
        vwin = jnp.where(cmask_win, vwin_n, vwin_s)
        dx = jnp.clip(jnp.take(mx, m), -32, 32)
        dy = jnp.clip(jnp.take(my, m), -48, 16)
        beta = _extract_cand(ywin, uwin, vwin, dx, dy)
        spi = jnp.take(table["sp_index"].astype(jnp.int32), m)
        d = dirs[spi]
        sp = _extract_cand(ywin, uwin, vwin,
                           jnp.clip(dx + d[:, 0], -32, 32),
                           jnp.clip(dy + d[:, 1], -48, 16))
        use_sp = jnp.take(sp_pred, m)[:, None, None]
        amount = jnp.take(table["sp_amount"], m)[:, None, None]
        predw = tuple(
            jnp.where(use_sp, jnp.where(amount, ops.lerp_quarter(b, t),
                                        ops.lerp_half(b, t)), b)
            for b, t in zip(beta, sp))
        resw = (jnp.take(res_y, m, axis=0), jnp.take(res_u, m, axis=0),
                jnp.take(res_v, m, axis=0))
        copyw = jnp.take(is_copy, m)[:, None, None]
        rec = tuple(jnp.where(copyw, pr, ops.wrap16(r + pr))
                    for r, pr in zip(resw, predw))

        for kk in range(p):
            oy = jax.lax.dynamic_slice(
                pad_y, (py[kk] + YPAD, px[kk] + YPAD), (MB, MB))
            pad_y = jax.lax.dynamic_update_slice(
                pad_y, jnp.where(valid[kk], rec[0][kk], oy),
                (py[kk] + YPAD, px[kk] + YPAD))
            cyy, cxx = py[kk] // 2, px[kk] // 2
            ou = jax.lax.dynamic_slice(pad_u, (cyy + CPAD, cxx + CPAD),
                                       (8, 8))
            pad_u = jax.lax.dynamic_update_slice(
                pad_u, jnp.where(valid[kk], rec[1][kk], ou),
                (cyy + CPAD, cxx + CPAD))
            ov = jax.lax.dynamic_slice(pad_v, (cyy + CPAD, cxx + CPAD),
                                       (8, 8))
            pad_v = jax.lax.dynamic_update_slice(
                pad_v, jnp.where(valid[kk], rec[2][kk], ov),
                (cyy + CPAD, cxx + CPAD))
        return (w + 1, pad_y, pad_u, pad_v)

    _, pad_y, pad_u, pad_v = jax.lax.while_loop(
        cond, wave_body, (jnp.int32(0), pad_y, pad_u, pad_v))

    rec_y = pad_y[YPAD:YPAD + aligned_h, YPAD:YPAD + aligned_w]
    rec_u = pad_u[CPAD:CPAD + aligned_h // 2, CPAD:CPAD + aligned_w // 2]
    rec_v = pad_v[CPAD:CPAD + aligned_h // 2, CPAD:CPAD + aligned_w // 2]

    if deblock:
        q_map = jnp.where(copy_map, 0, qp.reshape(hb, wb))
        rec_y, rec_u, rec_v = deblock_mod.deblock_frame(
            rec_y, rec_u, rec_v, copy_map, q_map)

    new_state = dict(
        ring_y=jax.lax.dynamic_update_index_in_dim(
            state["ring_y"], rec_y.astype(jnp.int16), slot, 0),
        ring_u=jax.lax.dynamic_update_index_in_dim(
            state["ring_u"], rec_u.astype(jnp.int16), slot, 0),
        ring_v=jax.lax.dynamic_update_index_in_dim(
            state["ring_v"], rec_v.astype(jnp.int16), slot, 0),
        coef_y=coef_y.astype(jnp.int16), coef_u=coef_u.astype(jnp.int16),
        coef_v=coef_v.astype(jnp.int16),
    )
    for key in ("win_y", "win_u", "win_v"):
        if key in state:  # XLA anchor path carries window state
            from . import motion as _motion
            nw = _motion.pred_windows((rec_y.astype(jnp.int32),
                                       rec_u.astype(jnp.int32),
                                       rec_v.astype(jnp.int32)))
            new_state["win_y"] = jax.lax.dynamic_update_index_in_dim(
                state["win_y"], nw[0].astype(jnp.int16), slot, 0)
            new_state["win_u"] = jax.lax.dynamic_update_index_in_dim(
                state["win_u"], nw[1].astype(jnp.int16), slot, 0)
            new_state["win_v"] = jax.lax.dynamic_update_index_in_dim(
                state["win_v"], nw[2].astype(jnp.int16), slot, 0)
            break
    pack = (wire_mod.pack_yuv5d_wire if out_fmt == "yuv5d"
            else wire_mod.pack_yuv_wire)
    yuv = pack(rec_y, rec_u, rec_v,
               frame_w if frame_w is not None else aligned_w,
               frame_h if frame_h is not None else aligned_h)
    return new_state, yuv
