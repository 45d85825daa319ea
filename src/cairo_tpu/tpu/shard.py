"""Multi-chip spatial + GOP sharding (docs/SHARDING.md).

Mesh ("gop", "tile"): independent GOPs across the gop axis; each frame's
macroblock columns split across the tile axis. Every device carries its
tile's ring reconstruction with a HALO-px margin of its neighbors' pixels,
refreshed once per frame via jax.lax.ppermute — motion search and MC
prediction may reach across tile boundaries. Deblocking is tile-local
(the tiled-format contract).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from .. import tables
from ..blocktypes import COPY_BIT, INTRA_BIT, MOTION_BIT
from . import deblock as deblock_mod
from . import motion as motion_mod
from . import ops

MB = tables.MACROBLOCK_SIZE
RING = tables.REFERENCE_FRAME_COUNT
HALO = 32            # Y halo columns (search reach 16 + sub-pel + margin)
CHALO = HALO // 2


def init_tile_state(tile_w: int, aligned_h: int):
    """Per-device codec state; ring planes carry the halo columns."""
    wide = tile_w + 2 * HALO
    cwide = tile_w // 2 + 2 * CHALO
    return dict(
        ring_y=jnp.zeros((RING, aligned_h, wide), jnp.int16),
        ring_u=jnp.zeros((RING, aligned_h // 2, cwide), jnp.int16),
        ring_v=jnp.zeros((RING, aligned_h // 2, cwide), jnp.int16),
        coef_y=jnp.zeros((aligned_h, tile_w), jnp.int16),
        coef_u=jnp.zeros((aligned_h // 2, tile_w // 2), jnp.int16),
        coef_v=jnp.zeros((aligned_h // 2, tile_w // 2), jnp.int16),
    )


def _halo_exchange(core, halo, axis_name):
    """Builds (H, w + 2*halo) from each device's (H, w) core: left/right
    strips travel to the neighboring tiles; frame edges stay zero."""
    n = jax.lax.psum(1, axis_name)
    right_strip = core[:, -halo:]
    left_strip = core[:, :halo]
    # from left neighbor (i-1 -> i): its right strip becomes our left margin
    from_left = jax.lax.ppermute(right_strip, axis_name,
                                 [(i, i + 1) for i in range(n - 1)])
    from_right = jax.lax.ppermute(left_strip, axis_name,
                                  [(i + 1, i) for i in range(n - 1)])
    return jnp.concatenate([from_left, core, from_right], axis=1)


def _classify_tile(src, src_planes, ring, px, py, quality, frame_index,
                   x0, full_width):
    n = px.shape[0]
    best = dict(
        sad=jnp.abs(src[0]).sum(axis=(1, 2), dtype=jnp.int32),
        is_copy=jnp.zeros(n, bool), is_motion=jnp.zeros(n, bool),
        is_intra=jnp.ones(n, bool), target=jnp.zeros(n, jnp.int32),
        motion_x=jnp.zeros(n, jnp.int32), motion_y=jnp.zeros(n, jnp.int32),
        sp_pred=jnp.zeros(n, bool), sp_amount=jnp.zeros(n, bool),
        sp_index=jnp.zeros(n, jnp.int32))
    ry, ru, rv = ring

    def body(best, offset):
        slot = (frame_index + RING - offset) % RING
        ref = tuple(jax.lax.dynamic_index_in_dim(p, slot, keepdims=False)
                    .astype(jnp.int32) for p in (ry, ru, rv))
        wins = motion_mod.pred_windows(ref, halo=HALO)
        cand = motion_mod.inter_search(src, src_planes, ref, wins, px, py,
                                       quality, x0=x0, full_width=full_width,
                                       halo=HALO)
        take_on_copy = cand["is_copy"] != best["is_copy"]
        take = jnp.where(take_on_copy, cand["is_copy"],
                         cand["sad"] < best["sad"])
        new = dict(best)
        for key in ("sad", "is_copy", "is_motion", "motion_x", "motion_y",
                    "sp_pred", "sp_amount", "sp_index"):
            new[key] = jnp.where(take, cand[key], best[key])
        new["is_intra"] = jnp.where(take, False, best["is_intra"])
        new["target"] = jnp.where(take, offset, best["target"])
        return new, None

    best, _ = jax.lax.scan(body, best, jnp.arange(1, RING, dtype=jnp.int32))
    return best


def _pred_for_tile(ring, frame_index, best):
    n = best["motion_x"].shape[0]
    init = (jnp.zeros((n, MB, MB), jnp.int32),
            jnp.zeros((n, MB // 2, MB // 2), jnp.int32),
            jnp.zeros((n, MB // 2, MB // 2), jnp.int32))

    def body(preds, offset):
        slot = (frame_index + RING - offset) % RING
        planes = tuple(
            jax.lax.dynamic_index_in_dim(p, slot, keepdims=False)
            .astype(jnp.int32) for p in ring)
        wins = motion_mod.pred_windows(planes, halo=HALO)
        blocks = motion_mod.pred_block_from_windows(
            wins, best["motion_x"], best["motion_y"], best["sp_pred"],
            best["sp_amount"], best["sp_index"].astype(jnp.int32))
        pick = (best["target"] == offset)[:, None, None]
        return tuple(jnp.where(pick, b, p)
                     for b, p in zip(blocks, preds)), None

    preds, _ = jax.lax.scan(body, init,
                            jnp.arange(RING, dtype=jnp.int32))
    return preds


def tile_encode_step(rgb_tile, state, frame_index, quality, *, tile_w,
                     aligned_h, full_width, is_inter, frame_w=None,
                     frame_h=None, axis_name="tile"):
    """One frame for one tile (runs inside shard_map). Returns
    (new_state, outputs) with tile-local block table and coeff planes.

    frame_w/frame_h are the real frame dims; pixels beyond them (the MB
    alignment pad) are zeroed post-conversion exactly like the single-chip
    engine.encode_step, so a 1-tile stream is byte-identical with it."""
    height = aligned_h
    wb, hb = tile_w // MB, height // MB
    n = wb * hb
    idx = np.arange(n)
    px = jnp.asarray((idx % wb) * MB, jnp.int32)
    py = jnp.asarray((idx // wb) * MB, jnp.int32)
    x0 = jax.lax.axis_index(axis_name) * tile_w

    y_in, u_in, v_in = ops.rgb_to_yuv420(rgb_tile)
    if frame_w is not None or frame_h is not None:
        fw = full_width if frame_w is None else frame_w
        fh = aligned_h if frame_h is None else frame_h
        gcols = x0 + jnp.arange(tile_w)
        ymask = (jnp.arange(aligned_h)[:, None] < fh) & (gcols[None, :] < fw)
        cmask = ymask[::2, ::2]
        y_in = jnp.where(ymask, y_in, 0)
        u_in = jnp.where(cmask, u_in, 0)
        v_in = jnp.where(cmask, v_in, 0)
    src = (ops.plane_to_blocks(y_in, MB),
           ops.plane_to_blocks(u_in, MB // 2),
           ops.plane_to_blocks(v_in, MB // 2))

    ring = (state["ring_y"], state["ring_u"], state["ring_v"])
    if is_inter:
        best = _classify_tile(src, (y_in, u_in, v_in), ring, px, py, quality,
                              frame_index, x0, full_width)
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

    pred = _pred_for_tile(ring, frame_index, best)
    intra_mask = best["is_intra"][:, None, None]
    pred = tuple(jnp.where(intra_mask, 0, p) for p in pred)

    res = tuple(ops.wrap16(s.astype(jnp.int32) - p) for s, p in zip(src, pred))
    ty = ops.quads_to_mb(ops.fdct8(ops.mb_quads(res[0])))
    tu = ops.fdct8(res[1])
    tv = ops.fdct8(res[2])

    variance = ops.block_variance2(ty)  # XLA CSEs with adaptive_qp's copy
    qp = ops.adaptive_qp(quality, ty)
    qp4 = jnp.repeat(qp, 4)
    quads = ops.mb_quads(ty).reshape(-1, 8, 8)
    intra_qm = best["is_intra"] & ~best["is_motion"]
    qm4 = jnp.repeat(intra_qm, 4)[:, None, None]
    qy = jnp.where(qm4, ops.quantize_8x8(quads, qp4, True, True),
                   ops.quantize_8x8(quads, qp4, False, True))
    qu = jnp.where(intra_qm[:, None, None],
                   ops.quantize_8x8(tu, qp, True, False),
                   ops.quantize_8x8(tu, qp, False, False))
    qv = jnp.where(intra_qm[:, None, None],
                   ops.quantize_8x8(tv, qp, True, False),
                   ops.quantize_8x8(tv, qp, False, False))

    copy_mb = best["is_copy"]
    def persist(qblocks, old_plane, size):
        old = ops.plane_to_blocks(old_plane.astype(jnp.int32), size)
        kept = jnp.where(copy_mb[:, None, None], old, qblocks)
        return ops.blocks_to_plane(kept, old_plane.shape[0],
                                   old_plane.shape[1]).astype(jnp.int16)
    coef_y = persist(ops.quads_to_mb(qy.reshape(-1, 4, 8, 8)), state["coef_y"], MB)
    coef_u = persist(qu, state["coef_u"], MB // 2)
    coef_v = persist(qv, state["coef_v"], MB // 2)

    dq_y = jnp.where(qm4, ops.dequantize_8x8(qy, qp4, True, True),
                     ops.dequantize_8x8(qy, qp4, False, True))
    dq_u = jnp.where(intra_qm[:, None, None],
                     ops.dequantize_8x8(qu, qp, True, False),
                     ops.dequantize_8x8(qu, qp, False, False))
    dq_v = jnp.where(intra_qm[:, None, None],
                     ops.dequantize_8x8(qv, qp, True, False),
                     ops.dequantize_8x8(qv, qp, False, False))
    ry_b = ops.quads_to_mb(ops.idct8(dq_y.reshape(-1, 4, 8, 8)))
    ru_b = ops.idct8(dq_u)
    rv_b = ops.idct8(dq_v)
    copy3 = copy_mb[:, None, None]
    rec = tuple(jnp.where(copy3, p, ops.wrap16(r + p))
                for r, p in zip((ry_b, ru_b, rv_b), pred))
    rec_y = ops.blocks_to_plane(rec[0], height, tile_w)
    rec_u = ops.blocks_to_plane(rec[1], height // 2, tile_w // 2)
    rec_v = ops.blocks_to_plane(rec[2], height // 2, tile_w // 2)

    copy_map = copy_mb.reshape(hb, wb)
    q_map = jnp.where(copy_map, 0, qp.reshape(hb, wb))
    rec_y, rec_u, rec_v = deblock_mod.deblock_frame(rec_y, rec_u, rec_v,
                                                    copy_map, q_map)

    # halo exchange of the deblocked recon -> halo'd ring slot
    wide_y = _halo_exchange(rec_y, HALO, axis_name)
    wide_u = _halo_exchange(rec_u, CHALO, axis_name)
    wide_v = _halo_exchange(rec_v, CHALO, axis_name)

    slot = frame_index % RING
    new_state = dict(
        ring_y=jax.lax.dynamic_update_index_in_dim(
            state["ring_y"], wide_y.astype(jnp.int16), slot, 0),
        ring_u=jax.lax.dynamic_update_index_in_dim(
            state["ring_u"], wide_u.astype(jnp.int16), slot, 0),
        ring_v=jax.lax.dynamic_update_index_in_dim(
            state["ring_v"], wide_v.astype(jnp.int16), slot, 0),
        coef_y=coef_y, coef_u=coef_u, coef_v=coef_v,
    )
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
        recon_y=rec_y.astype(jnp.int16),
    )
    return new_state, outputs


def tile_decode_step(table, coef, state, frame_index, *, tile_w, aligned_h,
                     axis_name="tile"):
    """Parallel tiled reconstruction (fast streams: no intra-motion)."""
    height = aligned_h
    wb, hb = tile_w // MB, height // MB
    n = wb * hb

    block_type = table["block_type"].astype(jnp.int32)
    is_intra = (block_type & INTRA_BIT) != 0
    is_motion = (block_type & MOTION_BIT) != 0
    is_copy = (block_type & COPY_BIT) != 0
    target = jnp.where(is_intra, 0, table["prediction_target"].astype(jnp.int32))
    mx = jnp.where(is_motion, table["motion_x"].astype(jnp.int32), 0)
    my = jnp.where(is_motion, table["motion_y"].astype(jnp.int32), 0)
    sp_pred = is_motion & table["sp_pred"]
    qp = table["q_index"].astype(jnp.int32)

    ring = (state["ring_y"], state["ring_u"], state["ring_v"])
    best = dict(target=target, motion_x=mx, motion_y=my, sp_pred=sp_pred,
                sp_amount=table["sp_amount"], sp_index=table["sp_index"].astype(jnp.int32))
    pred = _pred_for_tile(ring, frame_index, best)
    intra_default = is_intra & ~is_motion
    pred = tuple(jnp.where(intra_default[:, None, None], 0, p) for p in pred)

    cy = ops.plane_to_blocks(coef["coef_y"].astype(jnp.int32), MB)
    cu = ops.plane_to_blocks(coef["coef_u"].astype(jnp.int32), MB // 2)
    cv = ops.plane_to_blocks(coef["coef_v"].astype(jnp.int32), MB // 2)
    qp4 = jnp.repeat(qp, 4)
    qm4 = jnp.repeat(intra_default, 4)[:, None, None]
    quads = ops.mb_quads(cy).reshape(-1, 8, 8)
    dq_y = jnp.where(qm4, ops.dequantize_8x8(quads, qp4, True, True),
                     ops.dequantize_8x8(quads, qp4, False, True))
    dq_u = jnp.where(intra_default[:, None, None],
                     ops.dequantize_8x8(cu, qp, True, False),
                     ops.dequantize_8x8(cu, qp, False, False))
    dq_v = jnp.where(intra_default[:, None, None],
                     ops.dequantize_8x8(cv, qp, True, False),
                     ops.dequantize_8x8(cv, qp, False, False))
    ry_b = ops.quads_to_mb(ops.idct8(dq_y.reshape(-1, 4, 8, 8)))
    ru_b = ops.idct8(dq_u)
    rv_b = ops.idct8(dq_v)
    copy3 = is_copy[:, None, None]
    rec = tuple(jnp.where(copy3, p, ops.wrap16(r + p))
                for r, p in zip((ry_b, ru_b, rv_b), pred))
    rec_y = ops.blocks_to_plane(rec[0], height, tile_w)
    rec_u = ops.blocks_to_plane(rec[1], height // 2, tile_w // 2)
    rec_v = ops.blocks_to_plane(rec[2], height // 2, tile_w // 2)

    copy_map = is_copy.reshape(hb, wb)
    q_map = jnp.where(copy_map, 0, qp.reshape(hb, wb))
    rec_y, rec_u, rec_v = deblock_mod.deblock_frame(rec_y, rec_u, rec_v,
                                                    copy_map, q_map)

    wide_y = _halo_exchange(rec_y, HALO, axis_name)
    wide_u = _halo_exchange(rec_u, CHALO, axis_name)
    wide_v = _halo_exchange(rec_v, CHALO, axis_name)
    slot = frame_index % RING
    new_state = dict(
        ring_y=jax.lax.dynamic_update_index_in_dim(
            state["ring_y"], wide_y.astype(jnp.int16), slot, 0),
        ring_u=jax.lax.dynamic_update_index_in_dim(
            state["ring_u"], wide_u.astype(jnp.int16), slot, 0),
        ring_v=jax.lax.dynamic_update_index_in_dim(
            state["ring_v"], wide_v.astype(jnp.int16), slot, 0),
        coef_y=state["coef_y"], coef_u=state["coef_u"], coef_v=state["coef_v"],
    )
    rgb = ops.yuv420_to_rgb(rec_y, rec_u, rec_v)
    return new_state, rgb


def make_mesh(n_gop: int, n_tile: int, devices=None):
    devices = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devices[:n_gop * n_tile].reshape(n_gop, n_tile),
                axis_names=("gop", "tile"))


_STEP_CACHE = {}


def sharded_encode_step(mesh, *, tile_w, aligned_h, full_width, is_inter,
                        frame_w=None, frame_h=None):
    """Builds the jitted shard_map'd encode step over (gop, tile).
    Memoized: a fresh closure per call would defeat the jit cache and
    recompile for every encoder instance."""
    key = ("enc", tuple(d.id for d in mesh.devices.flat),
           mesh.devices.shape, tile_w, aligned_h, full_width, is_inter,
           frame_w, frame_h)
    if key in _STEP_CACHE:
        return _STEP_CACHE[key]
    from jax import shard_map

    def per_device(rgb, state, frame_index, quality):
        # blocks arrive with the sharded (gop, tile) axes of size 1
        local_state = jax.tree.map(lambda x: x[0, 0], state)
        new_state, out = tile_encode_step(
            rgb[0], local_state, frame_index, quality, tile_w=tile_w,
            aligned_h=aligned_h, full_width=full_width, is_inter=is_inter,
            frame_w=frame_w, frame_h=frame_h)
        new_state = jax.tree.map(lambda x: x[None, None], new_state)
        out = {k: v[None, None] for k, v in out.items()}
        return new_state, out

    fn = shard_map(
        per_device, mesh=mesh,
        in_specs=(P("gop", None, "tile", None), P("gop", "tile"), None, None),
        out_specs=(P("gop", "tile"), P("gop", "tile")),
        check_vma=False)
    _STEP_CACHE[key] = jax.jit(fn)
    return _STEP_CACHE[key]


def sharded_decode_step(mesh, *, tile_w, aligned_h):
    """Builds the jitted shard_map'd decode step over (gop, tile);
    memoized like sharded_encode_step."""
    key = ("dec", tuple(d.id for d in mesh.devices.flat),
           mesh.devices.shape, tile_w, aligned_h)
    if key in _STEP_CACHE:
        return _STEP_CACHE[key]
    from jax import shard_map

    def per_device(table, coef, state, frame_index):
        local_state = jax.tree.map(lambda x: x[0, 0], state)
        local_table = {k: v[0, 0] for k, v in table.items()}
        local_coef = {k: v[0, 0] for k, v in coef.items()}
        new_state, rgb = tile_decode_step(
            local_table, local_coef, local_state, frame_index,
            tile_w=tile_w, aligned_h=aligned_h)
        new_state = jax.tree.map(lambda x: x[None, None], new_state)
        return new_state, rgb[None]

    fn = shard_map(
        per_device, mesh=mesh,
        in_specs=(P("gop", "tile"), P("gop", "tile"), P("gop", "tile"), None),
        out_specs=(P("gop", "tile"), P("gop", None, "tile", None)),
        check_vma=False)
    _STEP_CACHE[key] = jax.jit(fn)
    return _STEP_CACHE[key]
