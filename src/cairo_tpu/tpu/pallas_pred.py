"""Pallas TPU kernels for per-macroblock prediction gathering.

Replaces the cached per-slot window state (win_* of the XLA anchor path):
the kernels read the recon ring planes directly from HBM and resolve each
macroblock's dynamic (slot, mv, sub-pel) addressing on-chip, so nothing
window-shaped is ever materialized in HBM (the anchor keeps 4x(N, 50, 50)
int16 per plane — ~230 MB at 1080p — and re-reads all four slots per
frame through a masked select).

Addressing model (shared by both kernels):
  * a grid step processes one MB row: the (rows, Wp) strip of the padded
    plane(s) is DMA'd to VMEM;
  * per-MB *column* shifts become banded one-hot matmuls on the MXU:
    output lanes are walked in 128-lane groups, each group reading a
    256-lane source band through a (256, 128) one-hot built by comparing
    a broadcasted iota against the per-lane shift map. Pixel values are
    split into hi/lo bytes so bf16 products and f32 accumulation stay
    exact for any int16 input (recon pixels overshoot +/-255 on ringing);
  * per-MB *row* shifts become a select tree over the 2*pad+1 possible
    offsets (the strip is VMEM-resident, so slices are register reads);
  * per-MB slot / sub-pel decisions are lane-broadcast masks.

pred_planes fuses the entire prediction assembly (the anchor's
motion.pred_block_from_windows + the 4-slot pick in engine._gather_pred):
beta block + sub-pel neighbor + exact half/quarter lerp
(macroblock.h:203-241 rounding via ops.lerp_half/quarter semantics) +
intra zeroing, emitting prediction *planes* (no (N, 16, 16) layout waste).

gather_windows emits the (N, B, B) per-MB windows consumed by the
sub-pel refinement scan in motion.inter_search (B=18 luma, 10 chroma),
from one reference slot's planes (slot is a traced scalar).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import tables

MB = tables.MACROBLOCK_SIZE            # 16
RING = tables.REFERENCE_FRAME_COUNT    # 4
R = tables.MOTION_SEARCH_RADIUS        # 16
Y_PAD = R + 1                          # pred window pad (mv +/-16, subpel 1)
C_PAD = R // 2 + 1

_DIRS = np.asarray(
    [(-1, -1), (0, -1), (1, -1), (-1, 0), (1, 0), (-1, 1), (0, 1), (1, 1)],
    np.int32)


def _round_up(v, m):
    return -(-v // m) * m


def _lerp_half(a, b):
    t = a + b
    t = t + jnp.where(t < 0, -1, 1)
    q = jnp.abs(t) // 2
    return jnp.where(t < 0, -q, q)  # |t| <= 65535: result fits int16


def _lerp_quarter(a, b):
    t = 3 * a + b
    t = t + jnp.where(t < 0, -2, 2)
    q = jnp.abs(t) // 4
    w = jnp.where(t < 0, -q, q)
    return ((w + 0x8000) & 0xFFFF) - 0x8000  # wrap16 (3a+b can exceed int16)


def _recombine(mat, rows):
    """(2*rows, 128) f32 matmul result -> int16-valued int32 (lo + hi<<8)."""
    m = mat.astype(jnp.int32)
    w = m[0:rows] + (m[rows:2 * rows] << 8)
    return ((w + 0x8000) & 0xFFFF) - 0x8000


def _hi_lo_bf16(v):
    """int32-valued (rows, lanes) -> (2*rows, lanes) bf16 [lo; hi] bytes."""
    lo = (v & 255).astype(jnp.bfloat16)
    hi = ((v >> 8) & 255).astype(jnp.bfloat16)
    return jnp.concatenate([lo, hi], axis=0)


def _onehot(src0_row, shift_row, src_start, band):
    """(band, 128) bf16: M[s, t] = (s + src_start == src0[t] + shift[t]).
    Every output lane reads exactly one source lane, so the f32-accumulated
    matmul result is a plain (exact) byte select."""
    iota_s = jax.lax.broadcasted_iota(jnp.int32, (band, 128), 0)
    return (iota_s + src_start == src0_row + shift_row).astype(jnp.bfloat16)


# -------------------------------------------------------------------- pred

def _pred_kernel(maps_ref, src0_ref, planes_hbm, out_ref, slab, sem, *,
                 strip_rows, bands, nsel):
    """One MB row of the final prediction plane.

    maps rows: 0 bx (beta col shift), 1 nx (neighbor col shift), 2 by
    (beta row offset), 3 ny (neighbor row offset), 4 sp_pred, 5 sp_amount,
    6 zero, 7 slot. src0: per-lane source-lane base (equals the lane index
    here; kept as an input for symmetry with gather_windows).
    """
    r = pl.program_id(0)
    block = out_ref.shape[0]

    dmas = []
    for s in range(RING):
        dma = pltpu.make_async_copy(
            planes_hbm.at[s, pl.ds(r * block, strip_rows)],
            slab.at[s], sem.at[s])
        dma.start()
        dmas.append(dma)

    maps = maps_ref[0]
    bx = maps[0:1, :]
    nx = maps[1:2, :]
    by = maps[2:3, :]
    ny = maps[3:4, :]
    spm = maps[4:5, :] != 0
    amt = maps[5:6, :] != 0
    zer = maps[6:7, :] != 0
    slt = maps[7:8, :]
    src0 = src0_ref[0]

    for dma in dmas:
        dma.wait()

    sts = [_hi_lo_bf16(slab[s][...].astype(jnp.int32)) for s in range(RING)]

    for g in range(bands):
        lo, hi = g * 128, (g + 1) * 128
        s0 = g * 128  # pred src0[t] = t, shifts >= 0: band starts at t
        src0_g = src0[0:1, lo:hi]
        mb_ = _onehot(src0_g, bx[:, lo:hi], s0, 256)
        ms_ = _onehot(src0_g, nx[:, lo:hi], s0, 256)
        cb = jnp.zeros((strip_rows, 128), jnp.int32)
        cs = jnp.zeros((strip_rows, 128), jnp.int32)
        for s in range(RING):
            st_g = sts[s][:, s0:s0 + 256]
            rb = jax.lax.dot_general(
                st_g, mb_, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            rs = jax.lax.dot_general(
                st_g, ms_, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            selm = slt[:, lo:hi] == s
            cb = jnp.where(selm, _recombine(rb, strip_rows), cb)
            cs = jnp.where(selm, _recombine(rs, strip_rows), cs)
        accb = jnp.zeros((block, 128), jnp.int32)
        accs = jnp.zeros((block, 128), jnp.int32)
        by_g = by[:, lo:hi]
        ny_g = ny[:, lo:hi]
        for v in range(nsel):
            accb = jnp.where(by_g == v, cb[v:v + block], accb)
            accs = jnp.where(ny_g == v, cs[v:v + block], accs)
        half = _lerp_half(accb, accs)
        quarter = _lerp_quarter(accb, accs)
        p = jnp.where(spm[:, lo:hi],
                      jnp.where(amt[:, lo:hi], quarter, half), accb)
        out_ref[:, lo:hi] = jnp.where(zer[:, lo:hi], 0, p)


def _pred_call(planes, maps, src0, block, pad, height, width):
    """planes: (RING, Hp, Wp) int16 pre-padded; maps: (hb, 8, width);
    src0: (hb, 1, width). Returns the (height, width) int32 pred plane."""
    hb = height // block
    strip_rows = _round_up(block + 2 * pad, 8)
    kern = functools.partial(_pred_kernel, strip_rows=strip_rows,
                             bands=width // 128, nsel=2 * pad + 1)
    return pl.pallas_call(
        kern,
        grid=(hb,),
        in_specs=[
            pl.BlockSpec((1, 8, width), lambda r: (r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, width), lambda r: (r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((block, width), lambda r: (r, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((height, width), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((RING, strip_rows, planes.shape[2]), jnp.int16),
            pltpu.SemaphoreType.DMA((RING,)),
        ],
    )(maps, src0, planes)


def _pad_planes(stack, pad, block, height, width):
    """(RING-or-1, height, width) int16 -> padded so that strip DMAs of
    `strip_rows` rows from row r*block fit, and every 256-lane band read
    (last band starts at width-128) stays in range. Border cells are zero
    (mb_windows zero-pad semantics)."""
    hb = height // block
    strip_rows = _round_up(block + 2 * pad, 8)
    hp = (hb - 1) * block + strip_rows
    wp = max(_round_up(width + 2 * pad, 128), width + 128)
    return jnp.pad(stack.astype(jnp.int16),
                   ((0, 0), (pad, hp - height - pad),
                    (pad, wp - width - pad)))


def _lane_maps(block, wb, cols):
    """Per-MB (hb*wb,) arrays -> (hb, len(cols), wb*block) lane maps."""
    hb = cols[0].shape[0] // wb
    out = []
    for c in cols:
        m = c.astype(jnp.int32).reshape(hb, wb, 1)
        out.append(jnp.broadcast_to(m, (hb, wb, block))
                   .reshape(hb, 1, wb * block))
    return jnp.concatenate(out, axis=1)


def pred_planes(ring_y, ring_u, ring_v, slot, mx, my, sp_pred, sp_amount,
                sp_index, zero, ypad=Y_PAD, cpad=C_PAD):
    """Final prediction planes for every MB (see module docstring).

    ring_*: (RING, H, W) int16 recon ring; slot/mx/my/sp_index: (N,) int;
    sp_pred/sp_amount/zero: (N,) bool. Returns (pred_y, pred_u, pred_v)
    int32 planes of the ring plane shapes. Identical to the XLA anchor
    (engine._gather_pred + intra zeroing) for any int16 mv.

    ypad/cpad: motion reach (window clamp). The fast-mode default covers
    |mv| <= 16 + sub-pel; the wavefront decoder passes 33/17 for the
    reference encoder's +-31 (+ sub-pel) inter reach."""
    height, width = ring_y.shape[1], ring_y.shape[2]
    hb, wb = height // MB, width // MB
    mx = mx.astype(jnp.int32)
    my = my.astype(jnp.int32)
    d = jnp.asarray(_DIRS)[sp_index.astype(jnp.int32)]
    di, dj = d[:, 0], d[:, 1]
    slot = slot.astype(jnp.int32)
    spm = sp_pred.astype(jnp.int32)
    amt = sp_amount.astype(jnp.int32)
    zer = zero.astype(jnp.int32)

    # lanes are padded up to a 128 multiple (the pad lanes carry zero maps
    # and are sliced away from the result)
    def one_plane(stack, bx, nx, by, ny, blk, pad, pheight, pwidth):
        pwp = _round_up(pwidth, 128)
        maps = _lane_maps(blk, wb, (bx, nx, by, ny, spm, amt, zer, slot))
        if pwp != pwidth:
            maps = jnp.pad(maps, ((0, 0), (0, 0), (0, pwp - pwidth)))
            stack = jnp.pad(stack.astype(jnp.int16),
                            ((0, 0), (0, 0), (0, pwp - pwidth)))
        src0 = jnp.broadcast_to(
            jnp.arange(pwp, dtype=jnp.int32)[None, None, :], (hb, 1, pwp))
        out = _pred_call(_pad_planes(stack, pad, blk, pheight, pwp),
                         maps, src0, blk, pad, pheight, pwp)
        return out[:, :pwidth]

    # luma (clamps mirror extract.extract_blocks' clip to the window)
    bx = jnp.clip(mx + ypad, 0, 2 * ypad)
    nx = jnp.clip(mx + di + ypad, 0, 2 * ypad)
    by = jnp.clip(my + ypad, 0, 2 * ypad)
    ny = jnp.clip(my + dj + ypad, 0, 2 * ypad)
    py = one_plane(ring_y, bx, nx, by, ny, MB, ypad, height, width)

    cb_sz = MB // 2
    ch, cw = height // 2, width // 2
    cbx = jnp.clip((mx >> 1) + cpad, 0, 2 * cpad)
    cnx = jnp.clip(((mx + di) >> 1) + cpad, 0, 2 * cpad)
    cby = jnp.clip((my >> 1) + cpad, 0, 2 * cpad)
    cny = jnp.clip(((my + dj) >> 1) + cpad, 0, 2 * cpad)
    pu = one_plane(ring_u, cbx, cnx, cby, cny, cb_sz, cpad, ch, cw)
    pv = one_plane(ring_v, cbx, cnx, cby, cny, cb_sz, cpad, ch, cw)
    return py, pu, pv


# ----------------------------------------------------------------- windows

def _win_kernel(slot_ref, maps_ref, src0_ref, plane_hbm, out_ref, slab,
                sem, *, strip_rows, band_src, band, nsel, mb_size):
    """One MB row of (B, wb*B) sub-pel windows from ring slot slot_ref[0].
    maps rows: 0 col shift, 1 row offset."""
    r = pl.program_id(0)
    block = out_ref.shape[1]
    width = out_ref.shape[2]

    dma = pltpu.make_async_copy(
        plane_hbm.at[pl.ds(slot_ref[0], 1), pl.ds(r * mb_size, strip_rows)],
        slab, sem)
    dma.start()
    maps = maps_ref[0]
    ox = maps[0:1, :]
    oy = maps[1:2, :]
    src0 = src0_ref[0]
    dma.wait()

    st = _hi_lo_bf16(slab[0][...].astype(jnp.int32))
    for g in range(len(band_src)):
        lo, hi = g * 128, (g + 1) * 128
        s0 = band_src[g]
        m = _onehot(src0[0:1, lo:hi], ox[:, lo:hi], s0, band)
        rb = jax.lax.dot_general(
            st[:, s0:s0 + band], m, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        cols = _recombine(rb, strip_rows)
        acc = jnp.zeros((block, 128), jnp.int32)
        oy_g = oy[:, lo:hi]
        for v in range(nsel):
            acc = jnp.where(oy_g == v, cols[v:v + block], acc)
        out_ref[0, :, lo:hi] = acc


def gather_windows(planes, slot, mx, my, block, pad):
    """(N, block, block) int32 per-MB windows at offset (mx - 1, my - 1)
    from ring slot `slot` (traced scalar).

    planes: (RING, H, W) int16; block = mb_size + 2 (sub-pel window);
    pad = the search pad (Y_PAD / C_PAD). Equals the XLA anchor
    extract_blocks(mb_windows(plane, mb, pad), mx + pad - 1,
    my + pad - 1, block) including its offset clamping."""
    height, width = planes.shape[1], planes.shape[2]
    mb_size = block - 2
    hb, wb = height // mb_size, width // mb_size
    n = hb * wb
    max_shift = 2 * pad + mb_size - block
    ox = jnp.clip(mx.astype(jnp.int32) + pad - 1, 0, max_shift)
    oy = jnp.clip(my.astype(jnp.int32) + pad - 1, 0, max_shift)
    maps = _lane_maps(block, wb, (ox, oy))

    wl = wb * block
    wlp = _round_up(wl, 128)
    if wlp != wl:
        maps = jnp.pad(maps, ((0, 0), (0, 0), (0, wlp - wl)))
    # static source base per output lane: c * mb_size + b
    src0_np = np.zeros(wlp, np.int32)
    t = np.arange(wl)
    src0_np[:wl] = (t // block) * mb_size + (t % block)
    src0 = jnp.broadcast_to(jnp.asarray(src0_np)[None, None, :],
                            (hb, 1, wlp))

    # aligned source band per output group; the band width is the max
    # group span (block != 16 makes src0 drift off the 128 grid)
    band_src = []
    band = 256
    wp_need = 0
    for g in range(wlp // 128):
        tlo, thi = g * 128, min((g + 1) * 128, wl) - 1
        if tlo >= wl:
            band_src.append(0)
            continue
        smin = int(src0_np[tlo])
        smax = int(src0_np[thi]) + max_shift
        start = smin // 128 * 128
        band = max(band, _round_up(smax - start + 1, 128))
        band_src.append(start)
    wp_need = max((s + band for s in band_src), default=0)

    strip_rows = _round_up(mb_size + 2 * pad, 8)
    hp = (hb - 1) * mb_size + strip_rows
    wp = max(_round_up(width + 2 * pad, 128), wp_need)
    padded = jnp.pad(planes.astype(jnp.int16),
                     ((0, 0), (pad, hp - height - pad),
                      (pad, wp - width - pad)))

    kern = functools.partial(_win_kernel, strip_rows=strip_rows,
                             band_src=tuple(band_src), band=band,
                             nsel=max_shift + 1, mb_size=mb_size)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(hb,),
        in_specs=[
            pl.BlockSpec((1, 2, wlp), lambda r, *_: (r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, wlp), lambda r, *_: (r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, block, wlp), lambda r, *_: (r, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((1, strip_rows, wp), jnp.int16),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((hb, block, wlp), jnp.int32),
    )(jnp.asarray(slot, jnp.int32).reshape(1), maps, src0, padded)
    return (out[:, :, :wl].reshape(hb, block, wb, block)
            .transpose(0, 2, 1, 3).reshape(n, block, block))
