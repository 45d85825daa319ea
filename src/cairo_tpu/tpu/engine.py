"""Jitted per-frame encode/decode steps (fast mode, docs/FORMAT.md §7).

Encode dataflow (single fused jit per frame type):
  8-bit YUV source wire (host-converted) -> per-MB inter searches vs the
  3 previous ring slots -> classification merge -> dense residual DCT ->
  adaptive QP -> quantize -> reconstruction into the ring slot ->
  band-scan deblock -> packed output wire (block table + residual COO).
The host's C++ entropy backend serializes the slice; transfers ride the
packed wires in tpu/wire.py.

The coefficient planes and the recon ring are carried state: copy-block
regions must keep their stale contents (wire-critical, FORMAT.md §4).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import tables
from ..blocktypes import COPY_BIT, INTRA_BIT, MOTION_BIT, INTRA_DEFAULT
from . import backend
from . import deblock as deblock_mod
from . import motion as motion_mod
from . import ops
from . import wire as wire_mod

MB = tables.MACROBLOCK_SIZE
RING = tables.REFERENCE_FRAME_COUNT


def init_state(aligned_w: int, aligned_h: int):
    """Carried codec state as a pytree of device arrays.

    On the Pallas (real-TPU) path, prediction gathering reads the ring
    planes directly (pallas_pred), so the state is just the ring + the
    persistent coefficient planes. The XLA anchor path additionally
    carries cached per-MB prediction/sub-pel windows per ring slot."""
    shape_y = (aligned_h, aligned_w)
    shape_c = (aligned_h // 2, aligned_w // 2)
    state = dict(
        ring_y=jnp.zeros((RING,) + shape_y, jnp.int16),
        ring_u=jnp.zeros((RING,) + shape_c, jnp.int16),
        ring_v=jnp.zeros((RING,) + shape_c, jnp.int16),
        coef_y=jnp.zeros(shape_y, jnp.int16),
        coef_u=jnp.zeros(shape_c, jnp.int16),
        coef_v=jnp.zeros(shape_c, jnp.int16),
    )
    if not backend.use_pallas():
        n = (aligned_h // MB) * (aligned_w // MB)
        ysz = MB + 2 * motion_mod.Y_WPAD
        csz = MB // 2 + 2 * motion_mod.C_WPAD
        state.update(
            win_y=jnp.zeros((RING, n, ysz, ysz), jnp.int16),
            win_u=jnp.zeros((RING, n, csz, csz), jnp.int16),
            win_v=jnp.zeros((RING, n, csz, csz), jnp.int16),
        )
    return state


def _mb_coords(aligned_w, aligned_h):
    wb, hb = aligned_w // MB, aligned_h // MB
    idx = np.arange(wb * hb)
    px = (idx % wb) * MB
    py = (idx // wb) * MB
    return jnp.asarray(px, jnp.int32), jnp.asarray(py, jnp.int32), wb, hb


def _gather_pred(state, frame_index, target, mx, my, sp_pred, sp_amount,
                 sp_index, zero):
    """Prediction blocks for all MBs (zeroed where `zero`, i.e. intra).

    Pallas path: pallas_pred.pred_planes reads the ring planes directly
    and fuses block + sub-pel-neighbor extraction, lerp, and zeroing.
    XLA anchor: the per-MB window is picked from its prediction target's
    ring slot with a masked select over the cached window state, then the
    block and its sub-pel neighbor are extracted with one-hot matmuls.
    Valid fast-path streams have |mv| <= 16 (api checks before dispatch).
    """
    slot_per_mb = (frame_index + RING - target) % RING
    if backend.use_pallas():
        from . import pallas_pred
        py, pu, pv = pallas_pred.pred_planes(
            state["ring_y"], state["ring_u"], state["ring_v"],
            slot_per_mb, mx, my, sp_pred, sp_amount,
            sp_index.astype(jnp.int32), zero)
        return (ops.plane_to_blocks(py, MB),
                ops.plane_to_blocks(pu, MB // 2),
                ops.plane_to_blocks(pv, MB // 2))

    def pick(stack):
        sel = None
        for s_ in range(RING):
            m = (slot_per_mb == s_)[:, None, None]
            sel = jnp.where(m, stack[s_], 0 if sel is None else sel)
        return sel
    wins = (pick(state["win_y"]), pick(state["win_u"]), pick(state["win_v"]))
    pred = motion_mod.pred_block_from_windows(
        wins, mx, my, sp_pred, sp_amount, sp_index.astype(jnp.int32))
    zm = zero[:, None, None]
    return tuple(jnp.where(zm, 0, p) for p in pred)


def _classify_inter(src, src_planes, ring, state_wins, px, py, quality,
                    frame_index, n_refs=RING):
    """Inter-frame classification (encode.cpp:17-67, fast mode).

    The three reference-offset searches run as one lax.scan so the search
    graph compiles once instead of three times."""
    n = px.shape[0]
    best = dict(
        sad=jnp.abs(src[0]).sum(axis=(1, 2), dtype=jnp.int32),
        is_copy=jnp.zeros(n, bool), is_motion=jnp.zeros(n, bool),
        is_intra=jnp.ones(n, bool),
        target=jnp.zeros(n, jnp.int32),
        motion_x=jnp.zeros(n, jnp.int32), motion_y=jnp.zeros(n, jnp.int32),
        sp_pred=jnp.zeros(n, bool), sp_amount=jnp.zeros(n, bool),
        sp_index=jnp.zeros(n, jnp.int32))

    ry, ru, rv = ring

    def body(best, offset):
        slot = (frame_index + RING - offset) % RING
        ref = tuple(jax.lax.dynamic_index_in_dim(p, slot, keepdims=False)
                    .astype(jnp.int32) for p in (ry, ru, rv))
        if state_wins is None:  # pallas: sub-pel windows come from planes
            cand = motion_mod.inter_search(src, src_planes, ref, None, px,
                                           py, quality, ring=(ry, ru, rv),
                                           slot=slot)
        else:
            wins = tuple(jax.lax.dynamic_index_in_dim(w, slot,
                                                      keepdims=False)
                         for w in state_wins)
            cand = motion_mod.inter_search(src, src_planes, ref, wins, px,
                                           py, quality)
        take_on_copy = cand["is_copy"] != best["is_copy"]
        take = jnp.where(take_on_copy, cand["is_copy"],
                         cand["sad"] < best["sad"])
        new = dict(
            sad=jnp.where(take, cand["sad"], best["sad"]),
            is_copy=jnp.where(take, cand["is_copy"], best["is_copy"]),
            is_motion=jnp.where(take, cand["is_motion"], best["is_motion"]),
            is_intra=jnp.where(take, False, best["is_intra"]),
            target=jnp.where(take, offset, best["target"]),
            motion_x=jnp.where(take, cand["motion_x"], best["motion_x"]),
            motion_y=jnp.where(take, cand["motion_y"], best["motion_y"]),
            sp_pred=jnp.where(take, cand["sp_pred"], best["sp_pred"]),
            sp_amount=jnp.where(take, cand["sp_amount"], best["sp_amount"]),
            sp_index=jnp.where(take, cand["sp_index"], best["sp_index"]))
        return new, None

    best, _ = jax.lax.scan(body, best, jnp.arange(1, n_refs,
                                                  dtype=jnp.int32))
    return best


@functools.partial(jax.jit, static_argnames=("aligned_w", "aligned_h",
                                             "frame_w", "frame_h",
                                             "is_inter", "n_refs",
                                             "deblock", "adaptive",
                                             "src_fmt"),
                   donate_argnums=(1,))
def encode_step(src_wire, state, *, aligned_w, aligned_h, frame_w, frame_h,
                is_inter, n_refs=RING, deblock=True, adaptive=True,
                src_fmt="yuv8"):
    """One frame through the device pipeline. The input is the source wire
    (host-converted, frame-edge masking applied on the static pad
    positions — see native.rgb_to_yuv8 / rgb_to_yuv5d) prefixed with an
    8-byte [frame_index, quality] int32 header, so one upload carries
    everything (per-transfer latency on the host link is ~5-15 ms).
    src_fmt picks the wire decode: "yuv8" (plain bytes) or "yuv5d"
    (5-bit-delta packed — ~5/8 the upload bytes, bit-identical planes).
    Returns (new_state, outputs)."""
    px, py, wb, hb = _mb_coords(aligned_w, aligned_h)
    n = wb * hb

    hdr = jax.lax.bitcast_convert_type(src_wire[:8].reshape(2, 4), jnp.int32)
    frame_index, quality = hdr[0], hdr[1]
    unpack_src = (wire_mod.unpack_yuv5d if src_fmt == "yuv5d"
                  else wire_mod.unpack_yuv8)
    y_in, u_in, v_in = unpack_src(src_wire[8:], aligned_h,
                                  aligned_w, frame_w, frame_h)

    src = (ops.plane_to_blocks(y_in, MB),
           ops.plane_to_blocks(u_in, MB // 2),
           ops.plane_to_blocks(v_in, MB // 2))

    ring = (state["ring_y"], state["ring_u"], state["ring_v"])

    # --- classification
    if is_inter:
        state_wins = None if backend.use_pallas() else \
            (state["win_y"], state["win_u"], state["win_v"])
        best = _classify_inter(
            src, (y_in, u_in, v_in), ring, state_wins, px, py,
            quality, frame_index, n_refs)
    else:
        best = dict(
            sad=jnp.zeros(n, jnp.int32),
            is_copy=jnp.zeros(n, bool), is_motion=jnp.zeros(n, bool),
            is_intra=jnp.ones(n, bool), target=jnp.zeros(n, jnp.int32),
            motion_x=jnp.zeros(n, jnp.int32), motion_y=jnp.zeros(n, jnp.int32),
            sp_pred=jnp.zeros(n, bool), sp_amount=jnp.zeros(n, bool),
            sp_index=jnp.zeros(n, jnp.int32))

    block_type = (best["is_intra"].astype(jnp.int32) * INTRA_BIT
                  | best["is_motion"].astype(jnp.int32) * MOTION_BIT
                  | best["is_copy"].astype(jnp.int32) * COPY_BIT)

    # --- prediction blocks (zero for INTRA_DEFAULT)
    pred = _gather_pred(state, frame_index, best["target"], best["motion_x"],
                        best["motion_y"], best["sp_pred"],
                        best["sp_amount"], best["sp_index"],
                        best["is_intra"])

    # --- residual transform
    res = tuple(ops.wrap16(s.astype(jnp.int32) - p)
                for s, p in zip(src, pred))
    ty = ops.quads_to_mb(ops.fdct8(ops.mb_quads(res[0])))
    tu = ops.fdct8(res[1])
    tv = ops.fdct8(res[2])

    # --- adaptive QP + quantization
    variance = ops.block_variance2(ty)  # XLA CSEs with adaptive_qp's copy
    if adaptive:
        qp = ops.adaptive_qp(quality, ty)
    else:  # quantize.cpp:60-77 #else branch: the frame quality everywhere
        qp = jnp.full(n, quality, jnp.int32)
    qp4 = jnp.repeat(qp, 4)
    quads = ops.mb_quads(ty).reshape(-1, 8, 8)
    intra_qm = best["is_intra"] & ~best["is_motion"]  # INTRA_DEFAULT only
    qm4 = jnp.repeat(intra_qm, 4)[:, None, None]
    qy = jnp.where(qm4, ops.quantize_8x8(quads, qp4, True, True),
                   ops.quantize_8x8(quads, qp4, False, True))
    qu = jnp.where(intra_qm[:, None, None],
                   ops.quantize_8x8(tu, qp, True, False),
                   ops.quantize_8x8(tu, qp, False, False))
    qv = jnp.where(intra_qm[:, None, None],
                   ops.quantize_8x8(tv, qp, True, False),
                   ops.quantize_8x8(tv, qp, False, False))

    # --- coefficient planes (stale persistence for copy blocks)
    copy_mb = best["is_copy"]
    qy_mb = ops.quads_to_mb(qy.reshape(-1, 4, 8, 8))
    new_coef_y = jnp.where(copy_mb[:, None, None],
                           ops.plane_to_blocks(state["coef_y"], MB).astype(jnp.int32),
                           qy_mb)
    new_coef_u = jnp.where(copy_mb[:, None, None],
                           ops.plane_to_blocks(state["coef_u"], MB // 2).astype(jnp.int32),
                           qu)
    new_coef_v = jnp.where(copy_mb[:, None, None],
                           ops.plane_to_blocks(state["coef_v"], MB // 2).astype(jnp.int32),
                           qv)
    coef_y = ops.blocks_to_plane(new_coef_y, aligned_h, aligned_w).astype(jnp.int16)
    coef_u = ops.blocks_to_plane(new_coef_u, aligned_h // 2, aligned_w // 2).astype(jnp.int16)
    coef_v = ops.blocks_to_plane(new_coef_v, aligned_h // 2, aligned_w // 2).astype(jnp.int16)

    # --- reconstruction (decoder path, decode.cpp:15-144)
    dq_y = jnp.where(qm4, ops.dequantize_8x8(qy, qp4, True, True),
                     ops.dequantize_8x8(qy, qp4, False, True))
    dq_u = jnp.where(intra_qm[:, None, None],
                     ops.dequantize_8x8(qu, qp, True, False),
                     ops.dequantize_8x8(qu, qp, False, False))
    dq_v = jnp.where(intra_qm[:, None, None],
                     ops.dequantize_8x8(qv, qp, True, False),
                     ops.dequantize_8x8(qv, qp, False, False))
    ry_blocks = ops.quads_to_mb(ops.idct8(dq_y.reshape(-1, 4, 8, 8)))
    ru_blocks = ops.idct8(dq_u)
    rv_blocks = ops.idct8(dq_v)

    copy3 = copy_mb[:, None, None]
    rec = tuple(
        jnp.where(copy3, p, ops.wrap16(r + p))
        for r, p in zip((ry_blocks, ru_blocks, rv_blocks), pred))

    rec_y = ops.blocks_to_plane(rec[0], aligned_h, aligned_w)
    rec_u = ops.blocks_to_plane(rec[1], aligned_h // 2, aligned_w // 2)
    rec_v = ops.blocks_to_plane(rec[2], aligned_h // 2, aligned_w // 2)

    # --- in-loop deblock on the new recon
    if deblock:
        copy_map = copy_mb.reshape(hb, wb)
        q_map = qp.reshape(hb, wb)
        q_map = jnp.where(copy_map, 0, q_map)  # q of copy blocks unsent
        rec_y, rec_u, rec_v = deblock_mod.deblock_frame(rec_y, rec_u, rec_v,
                                                        copy_map, q_map)

    slot = frame_index % RING
    new_state = dict(
        ring_y=jax.lax.dynamic_update_index_in_dim(
            state["ring_y"], rec_y.astype(jnp.int16), slot, 0),
        ring_u=jax.lax.dynamic_update_index_in_dim(
            state["ring_u"], rec_u.astype(jnp.int16), slot, 0),
        ring_v=jax.lax.dynamic_update_index_in_dim(
            state["ring_v"], rec_v.astype(jnp.int16), slot, 0),
        coef_y=coef_y, coef_u=coef_u, coef_v=coef_v,
    )
    if not backend.use_pallas():
        nwy, nwu, nwv = motion_mod.pred_windows((rec_y, rec_u, rec_v))
        new_state.update(
            win_y=jax.lax.dynamic_update_index_in_dim(
                state["win_y"], nwy.astype(jnp.int16), slot, 0),
            win_u=jax.lax.dynamic_update_index_in_dim(
                state["win_u"], nwu.astype(jnp.int16), slot, 0),
            win_v=jax.lax.dynamic_update_index_in_dim(
                state["win_v"], nwv.astype(jnp.int16), slot, 0))
    outputs = dict(
        block_type=block_type.astype(jnp.uint8),
        prediction_target=best["target"].astype(jnp.uint8),
        motion_x=best["motion_x"].astype(jnp.int16),
        motion_y=best["motion_y"].astype(jnp.int16),
        sp_pred=best["sp_pred"], sp_amount=best["sp_amount"],
        sp_index=best["sp_index"].astype(jnp.uint8),
        q_index=jnp.where(copy_mb, 0, qp).astype(jnp.uint8),
        variance=ops.wrap16(variance).astype(jnp.int16),
        coef_y=coef_y, coef_u=coef_u, coef_v=coef_v,
    )
    # head wire = one packed host transfer per frame; the COO tail buffer
    # and the full-size fields stay on device unless the host needs them
    # (count beyond the head capacity / COO overflow / debug)
    outputs["wire"], outputs["wire_tail"] = wire_mod.pack_encode_wire(
        outputs, coef_y, coef_u, coef_v, copy_mb)
    return new_state, outputs


def _decode_common(table, coef_y, coef_u, coef_v, state, frame_index,
                   aligned_w, aligned_h, deblock=True):
    """Shared reconstruction body (decode.cpp:15-144 for fast-mode streams).
    coef planes: int32-valued; returns (new_state, rec_y, rec_u, rec_v)."""
    px, py, wb, hb = _mb_coords(aligned_w, aligned_h)

    block_type = table["block_type"].astype(jnp.int32)
    is_intra = (block_type & INTRA_BIT) != 0
    is_motion = (block_type & MOTION_BIT) != 0
    is_copy = (block_type & COPY_BIT) != 0

    # stale-field gating (FORMAT.md §4)
    target = jnp.where(is_intra, 0, table["prediction_target"].astype(jnp.int32))
    mx = jnp.where(is_motion, table["motion_x"].astype(jnp.int32), 0)
    my = jnp.where(is_motion, table["motion_y"].astype(jnp.int32), 0)
    sp_pred = is_motion & table["sp_pred"]
    qp = table["q_index"].astype(jnp.int32)

    intra_default = is_intra & ~is_motion
    pred = _gather_pred(state, frame_index, target, mx, my, sp_pred,
                        table["sp_amount"],
                        table["sp_index"].astype(jnp.int32), intra_default)

    cy = ops.plane_to_blocks(coef_y, MB)
    cu = ops.plane_to_blocks(coef_u, MB // 2)
    cv = ops.plane_to_blocks(coef_v, MB // 2)

    qp4 = jnp.repeat(qp, 4)
    intra_qm = intra_default
    qm4 = jnp.repeat(intra_qm, 4)[:, None, None]
    quads = ops.mb_quads(cy).reshape(-1, 8, 8)
    dq_y = jnp.where(qm4, ops.dequantize_8x8(quads, qp4, True, True),
                     ops.dequantize_8x8(quads, qp4, False, True))
    dq_u = jnp.where(intra_qm[:, None, None],
                     ops.dequantize_8x8(cu, qp, True, False),
                     ops.dequantize_8x8(cu, qp, False, False))
    dq_v = jnp.where(intra_qm[:, None, None],
                     ops.dequantize_8x8(cv, qp, True, False),
                     ops.dequantize_8x8(cv, qp, False, False))
    ry_blocks = ops.quads_to_mb(ops.idct8(dq_y.reshape(-1, 4, 8, 8)))
    ru_blocks = ops.idct8(dq_u)
    rv_blocks = ops.idct8(dq_v)

    copy3 = is_copy[:, None, None]
    rec = tuple(jnp.where(copy3, p, ops.wrap16(r + p))
                for r, p in zip((ry_blocks, ru_blocks, rv_blocks), pred))

    rec_y = ops.blocks_to_plane(rec[0], aligned_h, aligned_w)
    rec_u = ops.blocks_to_plane(rec[1], aligned_h // 2, aligned_w // 2)
    rec_v = ops.blocks_to_plane(rec[2], aligned_h // 2, aligned_w // 2)

    if deblock:
        copy_map = is_copy.reshape(hb, wb)
        q_map = jnp.where(copy_map, 0, qp.reshape(hb, wb))
        rec_y, rec_u, rec_v = deblock_mod.deblock_frame(rec_y, rec_u, rec_v,
                                                        copy_map, q_map)

    slot = frame_index % RING
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
    if not backend.use_pallas():
        nwy, nwu, nwv = motion_mod.pred_windows((rec_y, rec_u, rec_v))
        new_state.update(
            win_y=jax.lax.dynamic_update_index_in_dim(
                state["win_y"], nwy.astype(jnp.int16), slot, 0),
            win_u=jax.lax.dynamic_update_index_in_dim(
                state["win_u"], nwu.astype(jnp.int16), slot, 0),
            win_v=jax.lax.dynamic_update_index_in_dim(
                state["win_v"], nwv.astype(jnp.int16), slot, 0))
    return new_state, rec_y, rec_u, rec_v


@functools.partial(jax.jit, static_argnames=("width", "height", "aligned_w",
                                             "aligned_h", "deblock"),
                   donate_argnums=(2,))
def decode_step(table, coef, state, frame_index, *, width, height,
                aligned_w, aligned_h, deblock=True):
    """Parallel reconstruction of one parsed frame from dense coefficient
    planes, returning host RGB (no intra-motion blocks; the host checks that
    precondition and falls back otherwise)."""
    new_state, rec_y, rec_u, rec_v = _decode_common(
        table, coef["coef_y"].astype(jnp.int32),
        coef["coef_u"].astype(jnp.int32), coef["coef_v"].astype(jnp.int32),
        state, frame_index, aligned_w, aligned_h, deblock)
    rgb = ops.yuv420_to_rgb(rec_y[:height, :width],
                            rec_u[:(height + 1) // 2, :(width + 1) // 2],
                            rec_v[:(height + 1) // 2, :(width + 1) // 2])
    return new_state, rgb


@functools.partial(jax.jit, static_argnames=("aligned_w", "aligned_h",
                                             "frame_w", "frame_h",
                                             "deblock", "coo_k",
                                             "out_fmt"),
                   donate_argnums=(1,))
def decode_step_coo(in_wire, state, *, aligned_w, aligned_h,
                    frame_w=None, frame_h=None, deblock=True, coo_k=None,
                    out_fmt="yuv8"):
    """Transfer-optimized decode: one packed upload (8-byte header with the
    frame index + residual COO + block table), 8-bit YUV wire out (see
    tpu.wire). Coefficient planes persist in device state; copy blocks keep
    their stale residuals, non-copy blocks are rebuilt from the COO list."""
    n = (aligned_w // MB) * (aligned_h // MB)
    k = coo_k if coo_k is not None else wire_mod.COO_K
    hdr = jax.lax.bitcast_convert_type(in_wire[:8].reshape(2, 4), jnp.int32)
    frame_index = hdr[0]
    body = in_wire[8:]
    coo_pos = jax.lax.bitcast_convert_type(
        body[:4 * k].reshape(k, 4), jnp.int32)
    coo_val = jax.lax.bitcast_convert_type(
        body[4 * k:6 * k].reshape(k, 2), jnp.int16)
    table = wire_mod.unpack_table_wire(body[6 * k:], n)
    is_copy = (table["block_type"].astype(jnp.int32) & COPY_BIT) != 0

    ys = aligned_h * aligned_w
    cs = (aligned_h // 2) * (aligned_w // 2)
    flat = jnp.zeros(ys + 2 * cs, jnp.int32).at[coo_pos].add(
        coo_val.astype(jnp.int32), mode="drop")
    wb, hb = aligned_w // MB, aligned_h // MB
    copy_map = is_copy.reshape(hb, wb)
    ymask = jnp.repeat(jnp.repeat(copy_map, MB, axis=0), MB, axis=1)
    cmask = ymask[::2, ::2]
    coef_y = jnp.where(ymask, state["coef_y"].astype(jnp.int32),
                       flat[:ys].reshape(aligned_h, aligned_w))
    coef_u = jnp.where(cmask, state["coef_u"].astype(jnp.int32),
                       flat[ys:ys + cs].reshape(aligned_h // 2, aligned_w // 2))
    coef_v = jnp.where(cmask, state["coef_v"].astype(jnp.int32),
                       flat[ys + cs:].reshape(aligned_h // 2, aligned_w // 2))

    new_state, rec_y, rec_u, rec_v = _decode_common(
        table, coef_y, coef_u, coef_v, state, frame_index,
        aligned_w, aligned_h, deblock)
    pack = (wire_mod.pack_yuv5d_wire if out_fmt == "yuv5d"
            else wire_mod.pack_yuv_wire)
    yuv = pack(rec_y, rec_u, rec_v,
               frame_w if frame_w is not None else aligned_w,
               frame_h if frame_h is not None else aligned_h)
    return new_state, yuv
