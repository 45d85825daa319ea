"""Pallas TPU kernels for the dense fast-mode motion search.

Same selection semantics as motion._dense_select / motion._chroma_max_maps
(the validated XLA path, kept as the CPU/test fallback), but each macroblock
row keeps its search window resident in VMEM and sweeps all (2R+1)^2
full-pel offsets on the VPU+MXU, so HBM traffic is one reference slab read
per row offset instead of two full-plane reads per candidate offset.

Mosaic-shaped design notes:
  * per-offset 16x16 block metrics are built in two stages: a native
    sublane reduction (jnp.sum/max over axis 0, int32) to per-column rows,
    then a per-dy BATCHED lane-group reduction - block sums ride a
    block-diagonal ones matmul on the MXU, block maxima a 32-bit roll-max
    tree followed by a one-hot extraction matmul;
  * MXU matmuls run in bf16: every operand is split/bounded to <= 255
    (SAD rows are split into hi/lo bytes), so products and f32 accumulation
    are exact;
  * the candidate selection scan is vectorized per dy as a lexicographic
    argmin over the 33 dx rows (first-wins tie-breaks preserved by
    minimizing (key, dx)), then folded into the running dy-scan state;
  * reference slabs are DMA'd from HBM at dynamic row offsets (legal for
    DMAs, unlike VMEM sublane slices), double-buffered across dy.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import tables

MB = tables.MACROBLOCK_SIZE
R = tables.MOTION_SEARCH_RADIUS          # 16
SPAN = 2 * R + 1                         # 33
NROW = 40                                # SPAN padded to sublane multiple
CR = R // 2                              # 8
CSPAN = 2 * CR + 1                       # 17
CNROW = 24                               # CSPAN padded
CROWS = 24                               # cmax sublane stride per cdy row
                                         # (8-aligned so dynamic loads of the
                                         # 17 cdx rows stay legal)
INT32_MAX = np.int32(0x7FFFFFFF)


def _roll_tree(m, group, op):
    """Lane-group reduction: lane i accumulates lanes [i, i+group); only
    lanes at multiples of `group` are consumed. 32-bit dtypes only."""
    n = m.shape[-1]
    shift = 1
    while shift < group:
        # jnp.roll semantics: out[i] = in[(i - s) % n]; s = n - shift gives
        # out[i] = in[i + shift].
        m = op(m, pltpu.roll(m, n - shift, 1))
        shift *= 2
    return m


def _extract_e(w, group):
    """(w, 2*wb) bf16: block-diagonal ones columns (group sums) followed by
    one-hot columns (lane-group leader pick)."""
    wb = w // group
    e = np.zeros((w, 2 * wb), np.float32)
    for k in range(wb):
        e[k * group:(k + 1) * group, k] = 1.0
    e[np.arange(0, w, group), wb + np.arange(wb)] = 1.0
    return jnp.asarray(e, jnp.bfloat16)


def _lex_argmin(key1, key2, iota0, big, valid):
    """Vectorized first-wins lexicographic argmin over axis 0 (dx rows):
    minimizes (key1, key2, dx). Returns (k1, k2, dx) per column."""
    k1 = jnp.where(valid, key1, big)
    b1 = jnp.min(k1, axis=0, keepdims=True)
    on1 = k1 == b1
    k2 = jnp.where(on1 & valid, key2, big)
    b2 = jnp.min(k2, axis=0, keepdims=True)
    on2 = on1 & (k2 == b2)
    dx = jnp.min(jnp.where(on2, iota0, big), axis=0, keepdims=True)
    return b1, b2, dx


def _pick_row(mat, dx_sel, iota0):
    """Extract mat[dx_sel[col], col] per column via a one-hot sum."""
    return jnp.sum(jnp.where(iota0 == dx_sel, mat, 0), axis=0, keepdims=True)


def _dense_kernel(x0_ref, dims_ref, src_ref, cmax_ref, e_ref, ref_hbm,
                  mx_ref, my_ref, sad_ref, mad_ref, frz_ref,
                  slab, stage, mstage, res, sem):
    """One MB row: sweep all SPAN^2 offsets from VMEM."""
    r = pl.program_id(0)
    w = src_ref.shape[1]
    wb = w // MB
    x0 = x0_ref[0]
    width = dims_ref[0]
    height = dims_ref[1]
    mad_thr = dims_ref[2]

    # one 48-row slab per strip; row offset r*MB is 8-aligned (MB=16).
    # The slab scratch carries 8 junk pad rows at the bottom so the dy loop
    # can always load an 8-aligned 24-row window (rolled into place below).
    dma = pltpu.make_async_copy(
        ref_hbm.at[pl.ds(pl.multiple_of(r * MB, 8), MB + 2 * R)],
        slab.at[pl.ds(0, MB + 2 * R)], sem)
    dma.start()

    src = src_ref[...].astype(jnp.int32)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, wb), 1)
    gx0 = x0 + col * MB
    gy0 = r * MB
    iota0 = jax.lax.broadcasted_iota(jnp.int32, (NROW, wb), 0)
    ox_m = iota0 - R
    dxcol = jax.lax.broadcasted_iota(jnp.int32, (NROW, wb), 1)
    gx_m = x0 + dxcol * MB + ox_m
    x_ok = (iota0 < SPAN) & (gx_m >= 0) & (gx_m <= width - MB)
    big = jnp.full((NROW, wb), INT32_MAX, jnp.int32)
    big1 = jnp.full((1, wb), INT32_MAX, jnp.int32)
    zero1 = jnp.zeros((1, wb), jnp.int32)

    dma.wait()

    def dy_body(dy, carry):
        (p_sad, p_ssd, p_mad, p_ox, p_oy,
         c_mad, c_ssd, c_sad, c_ox, c_oy,
         has_copy, co_sad, co_mad) = carry
        oy = dy - R
        # dynamic sublane loads must be 8-aligned: load the aligned 24-row
        # window around dy and rotate the residue (dy & 7) away.
        win = slab[pl.ds(pl.multiple_of((dy >> 3) * 8, 8), MB + 8)]
        # dynamic rotate is 32-bit only; the diffs need int32 anyway
        rows = pltpu.roll(win.astype(jnp.int32),
                          (MB + 8) - (dy & 7), 0)[0:MB]
        # --- stage per-dx column reductions (dx stays unrolled: lane slices
        # must be static)
        for dx in range(SPAN):
            d = jnp.abs(src - rows[:, dx:dx + w].astype(jnp.int32))
            s = jnp.sum(d, axis=0)                       # (W,) <= 4080
            m = jnp.max(d, axis=0)
            stage[dx, :] = (s & 255).astype(jnp.bfloat16)
            stage[NROW + dx, :] = (s >> 8).astype(jnp.bfloat16)
            mstage[dx, :] = m.astype(jnp.float32)
        # --- batched lane-group max + extraction
        mm = _roll_tree(mstage[...], MB, jnp.maximum)
        stage[2 * NROW:3 * NROW, :] = mm.astype(jnp.bfloat16)
        res[...] = jax.lax.dot_general(
            stage[...], e_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.int32)
        sad_m = res[0:NROW, 0:wb] + (res[NROW:2 * NROW, 0:wb] << 8)
        lmad_m = res[2 * NROW:3 * NROW, wb:2 * wb]
        cdy = (oy >> 1) + CR
        cmax_m = cmax_ref[0, pl.ds(pl.multiple_of(cdy * CROWS, 8), CROWS), :]
        # rows dx: cdx index = ((dx - R) >> 1) + CR = (dx >> 1) for dx>=0
        cm_exp = jnp.concatenate(
            [cmax_m[dx >> 1:(dx >> 1) + 1, :] for dx in range(SPAN)]
            + [cmax_m[0:1, :]] * (NROW - SPAN), axis=0)
        mad_m = jnp.maximum(lmad_m, cm_exp.astype(jnp.int32))
        ssd_m = ox_m * ox_m + oy * oy
        gy = gy0 + oy
        valid = x_ok & (gy >= 0) & (gy <= height - MB)

        # --- plain branch: lex (sad, ssd, dx) among valid
        b_sad, b_ssd, b_dx = _lex_argmin(sad_m, ssd_m, iota0, big, valid)
        any_v = jnp.max(valid.astype(jnp.int32), axis=0, keepdims=True) > 0
        b_mad = _pick_row(mad_m, b_dx, iota0)
        better = any_v & ((b_sad < p_sad) | ((b_sad == p_sad) & (b_ssd < p_ssd)))
        p_sad = jnp.where(better, b_sad, p_sad)
        p_ssd = jnp.where(better, b_ssd, p_ssd)
        p_mad = jnp.where(better, b_mad, p_mad)
        p_ox = jnp.where(better, b_dx - R, p_ox)
        p_oy = jnp.where(better, oy, p_oy)

        # --- copy branch: lex (mad, ssd, dx) among valid & mad < thr
        is_copy = valid & (mad_m < mad_thr)
        any_c = jnp.max(is_copy.astype(jnp.int32), axis=0, keepdims=True) > 0
        q_mad, q_ssd, q_dx = _lex_argmin(mad_m, ssd_m, iota0, big, is_copy)
        q_sad = _pick_row(sad_m, q_dx, iota0)
        better_c = any_c & ((q_mad < c_mad) | ((q_mad == c_mad) & (q_ssd < c_ssd)))
        c_mad = jnp.where(better_c, q_mad, c_mad)
        c_ssd = jnp.where(better_c, q_ssd, c_ssd)
        c_sad = jnp.where(better_c, q_sad, c_sad)
        c_ox = jnp.where(better_c, q_dx - R, c_ox)
        c_oy = jnp.where(better_c, oy, c_oy)
        has_copy = has_copy | any_c.astype(jnp.int32)  # i1 carries fail to
        # legalize in scf.for, so the flag rides as int32

        at_center = oy == 0
        co_sad = jnp.where(at_center, sad_m[R:R + 1, :], co_sad)
        co_mad = jnp.where(at_center, mad_m[R:R + 1, :], co_mad)
        return (p_sad, p_ssd, p_mad, p_ox, p_oy,
                c_mad, c_ssd, c_sad, c_ox, c_oy, has_copy, co_sad, co_mad)

    # running dy-scan state (first-wins preserved: strict improvements only)
    init = (big1, big1, big1, zero1, zero1,
            big1, big1, big1, zero1, zero1,
            zero1, zero1, zero1)
    (p_sad, p_ssd, p_mad, p_ox, p_oy,
     c_mad, c_ssd, c_sad, c_ox, c_oy,
     has_copy, co_sad, co_mad) = jax.lax.fori_loop(0, SPAN, dy_body, init)

    frozen = co_mad < mad_thr
    use_copy = (has_copy != 0) & ~frozen
    mx_ref[0] = jnp.where(frozen, 0, jnp.where(use_copy, c_ox, p_ox))
    my_ref[0] = jnp.where(frozen, 0, jnp.where(use_copy, c_oy, p_oy))
    sad_ref[0] = jnp.where(frozen, co_sad, jnp.where(use_copy, c_sad, p_sad))
    mad_ref[0] = jnp.where(frozen, co_mad, jnp.where(use_copy, c_mad, p_mad))
    frz_ref[0] = frozen.astype(jnp.int32)


def dense_select(src_y, ref_y_wide, cmax, x0, width, height, mad_thr):
    """Pallas drop-in for motion._dense_select.

    src_y: (H, W) int luma; ref_y_wide: (H, W+2R) reference carrying an
    R-column margin each side; cmax: (hb, CSPAN*CROWS, wb) int32 chroma
    abs-max maps (from chroma_max_maps). Returns per-MB
    (mx, my, sad, mad, frozen), each flattened (hb*wb,)."""
    h, w = src_y.shape
    hb, wb = h // MB, w // MB
    wpad = -(-(w + 2 * R) // 128) * 128  # DMA slices need 128-lane widths
    ref_pad = jnp.pad(ref_y_wide.astype(jnp.int16),
                      ((R, R), (0, wpad - (w + 2 * R))))
    x0_arr = jnp.asarray(x0, jnp.int32).reshape(1)
    dims = jnp.stack([jnp.asarray(width, jnp.int32),
                      jnp.asarray(height, jnp.int32),
                      jnp.asarray(mad_thr, jnp.int32)])

    out_shape = [jax.ShapeDtypeStruct((hb, 1, wb), jnp.int32)] * 5
    out_specs = [pl.BlockSpec((1, 1, wb), lambda r, *_: (r, 0, 0),
                              memory_space=pltpu.VMEM)] * 5
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(hb,),
        in_specs=[
            pl.BlockSpec((MB, w), lambda r, *_: (r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CSPAN * CROWS, wb), lambda r, *_: (r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w, 2 * wb), lambda r, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((MB + 2 * R + 8, wpad), jnp.int16),
            pltpu.VMEM((3 * NROW, w), jnp.bfloat16),
            pltpu.VMEM((NROW, w), jnp.float32),
            pltpu.VMEM((3 * NROW, 2 * wb), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    mx, my, sad, mad, frz = pl.pallas_call(
        _dense_kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
    )(x0_arr, dims, src_y.astype(jnp.int16), cmax, _extract_e(w, MB),
      ref_pad)
    return (mx.reshape(-1), my.reshape(-1), sad.reshape(-1),
            mad.reshape(-1), (frz != 0).reshape(-1))


# ------------------------------------------------------------------ chroma

def _chroma_kernel(su_ref, sv_ref, e_ref, refu_hbm, refv_hbm, out_ref,
                   slab_u, slab_v, stage, res, sems):
    """One chroma block row (8 px): all CSPAN^2 offsets."""
    r = pl.program_id(0)
    bs = MB // 2
    w = su_ref.shape[1]
    wb = w // bs

    # one 24-row slab per strip (+8 junk pad rows for aligned dy loads);
    # row offset r*bs is 8-aligned (bs=8)
    dma_u = pltpu.make_async_copy(
        refu_hbm.at[pl.ds(pl.multiple_of(r * bs, 8), bs + 2 * CR)],
        slab_u.at[pl.ds(0, bs + 2 * CR)], sems.at[0])
    dma_v = pltpu.make_async_copy(
        refv_hbm.at[pl.ds(pl.multiple_of(r * bs, 8), bs + 2 * CR)],
        slab_v.at[pl.ds(0, bs + 2 * CR)], sems.at[1])
    dma_u.start()
    dma_v.start()
    su = su_ref[...].astype(jnp.int32)
    sv = sv_ref[...].astype(jnp.int32)
    dma_u.wait()
    dma_v.wait()

    def dy_body(dy, _):
        aligned = pl.multiple_of((dy >> 3) * 8, 8)
        win_u = slab_u[pl.ds(aligned, bs + 8)]
        win_v = slab_v[pl.ds(aligned, bs + 8)]
        # dynamic rotate is 32-bit only; the diffs need int32 anyway
        rows_u = pltpu.roll(win_u.astype(jnp.int32),
                            (bs + 8) - (dy & 7), 0)[0:bs]
        rows_v = pltpu.roll(win_v.astype(jnp.int32),
                            (bs + 8) - (dy & 7), 0)[0:bs]
        for dx in range(CSPAN):
            d = jnp.maximum(
                jnp.abs(su - rows_u[:, dx:dx + w].astype(jnp.int32)),
                jnp.abs(sv - rows_v[:, dx:dx + w].astype(jnp.int32)))
            stage[dx, :] = jnp.max(d, axis=0).astype(jnp.float32)
        mm = _roll_tree(stage[...], bs, jnp.maximum)
        res[...] = jax.lax.dot_general(
            mm.astype(jnp.bfloat16), e_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.int32)
        # rows CSPAN..CROWS-1 of each group are junk padding (never read)
        out_ref[0, pl.ds(pl.multiple_of(dy * CROWS, 8), CROWS), :] = \
            res[0:CROWS, wb:2 * wb]
        return 0

    jax.lax.fori_loop(0, CSPAN, dy_body, 0)


def chroma_max_maps(src_u, src_v, ref_u_wide, ref_v_wide):
    """Pallas chroma abs-max maps: (hb, CSPAN*CSPAN, wb) int32, indexed
    [mb_row, (cdy+CR)*CSPAN + (cdx+CR), mb_col]; ref planes carry a
    CR-column margin each side."""
    h, w = src_u.shape
    bs = MB // 2
    hb, wb = h // bs, w // bs
    wpad = -(-(w + 2 * CR) // 128) * 128  # DMA slices need 128-lane widths
    pu = jnp.pad(ref_u_wide.astype(jnp.int16),
                 ((CR, CR), (0, wpad - (w + 2 * CR))))
    pv = jnp.pad(ref_v_wide.astype(jnp.int16),
                 ((CR, CR), (0, wpad - (w + 2 * CR))))

    return pl.pallas_call(
        _chroma_kernel,
        grid=(hb,),
        in_specs=[
            pl.BlockSpec((bs, w), lambda r: (r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bs, w), lambda r: (r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((w, 2 * wb), lambda r: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, CSPAN * CROWS, wb), lambda r: (r, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hb, CSPAN * CROWS, wb), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((bs + 2 * CR + 8, wpad), jnp.int16),
            pltpu.VMEM((bs + 2 * CR + 8, wpad), jnp.int16),
            pltpu.VMEM((CNROW, w), jnp.float32),
            pltpu.VMEM((CNROW, 2 * wb), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(src_u.astype(jnp.int16), src_v.astype(jnp.int16), _extract_e(w, bs),
      pu, pv)
