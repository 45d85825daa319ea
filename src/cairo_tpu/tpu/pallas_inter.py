"""Mosaic kernel for the conformance encoder's exact inter search.

Replays calculate_inter_prediction (motion.cpp:421-494) for every MB
against the 3 reference ring slots and folds the per-ref winners with the
classify merge (encode.cpp:29-54), entirely on-chip:

  * co-located SAD/MAD with the copy-grade early-out (motion.cpp:445-453);
  * square scan at radii 16,8,4,2,1 from the frozen ring-entry best; the
    center re-evaluation only matters in the FIRST ring (it resets SSD to
    0 on a sub-threshold tie) and is folded there from the already-known
    co-located metrics — later centers are provable no-ops;
  * sub-pel refinement (8 directions x half/quarter, motion.cpp:277-352);
  * the candidate metric machinery (member-stacked strips, packed
    candidate groups, exact hi/lo-bf16 SAD matmuls, MAD roll-trees,
    chroma parity variants) is shared with the wavefront kernel
    (pallas_wave) — here the grid is simply one MB row per step with
    P = wb members, no causal constraint and no writes.

Bit-exactness: identical selection to motion.inter_search_exact folded by
wavefront._merge_descs; pinned differentially in
tests/test_pallas_wave_tpu.py (inter frames go through this kernel).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import tables
from .pallas_wave import (
    INT32_MAX, SAD_THRESHOLD, _SP_DIRS, _accept, _coff_table, _lerp_half,
    _lerp_quarter, _lane_iota, _seg_matmul, _sp_index, _tree,
)

MB = tables.MACROBLOCK_SIZE
RING = tables.REFERENCE_FRAME_COUNT
REACH = 32       # hill-climb reach: 16+8+4+2+1 = 31, +1 sub-pel
XTRA = 128
Y_L0 = REACH + XTRA          # ref-pad lane of luma x=0
C_L0 = REACH // 2 + XTRA     # ref-pad lane of chroma x=0

_RINGS = {s: [(i, j) for j in (-s, 0, s) for i in (-s, 0, s)
              if (i, j) != (0, 0)] for s in (16, 8, 4, 2, 1)}


def ref_pads(aligned_w: int, aligned_h: int):
    """((RY, LY), (RC, LC)) padded ref-plane shapes."""
    ry = aligned_h + 2 * REACH + 24
    ly = ((aligned_w - MB + 31 + Y_L0) // 128) * 128 + 256
    rc = aligned_h // 2 + 2 * (REACH // 2) + 16
    lc = ((aligned_w // 2 - 8 + 15 + C_L0) // 128) * 128 + 256
    r8 = lambda v: -(-v // 8) * 8
    return (r8(ry), ly), (r8(rc), lc)


def geometry(aligned_w: int, aligned_h: int):
    wb, hb = aligned_w // MB, aligned_h // MB
    return wb, hb, max(16, -(-wb // 8) * 8)


def vmem_estimate(aligned_w: int, aligned_h: int, n_refs: int) -> int:
    (ry, ly), (rc, lc) = ref_pads(aligned_w, aligned_h)
    _, _, p = geometry(aligned_w, aligned_h)
    pads = 2 * n_refs * (ry * ly + 2 * rc * lc)
    strips = 4 * (3 * p * 16 * 128 + 2 * 3 * p * 8 * 128)
    return pads + strips + (4 << 20)


def supported(aligned_w: int, aligned_h: int, n_refs=RING - 1,
              budget=52 * 1024 * 1024):
    _, _, p = geometry(aligned_w, aligned_h)
    return p <= 128 and \
        vmem_estimate(aligned_w, aligned_h, n_refs) <= budget


def _consts(p):
    return dict(
        ones16=jnp.asarray((np.arange(p * 16)[None, :] // 16
                            == np.arange(p)[:, None])
                           .astype(np.float32)).astype(jnp.bfloat16),
        sel16=jnp.asarray((np.arange(p * 16)[None, :]
                           == 16 * np.arange(p)[:, None])
                          .astype(np.float32)).astype(jnp.bfloat16),
        sel8=jnp.asarray((np.arange(p * 8)[None, :]
                          == 8 * np.arange(p)[:, None])
                         .astype(np.float32)).astype(jnp.bfloat16),
        mi=jnp.asarray(np.broadcast_to(
            np.arange(p, dtype=np.int32)[:, None], (p, 128)).copy()),
    )


def _build_kernel(aligned_w, aligned_h, p, wb, hb, n_refs):
    (ry, ly), (rc, lc) = ref_pads(aligned_w, aligned_h)
    py16, pc8 = p * 16, p * 8

    def kernel(params, srcy_ref, srcc_ref,
               ones16_ref, sel16_ref, sel8_ref, mi_ref,
               refy_in, refu_in, refv_in,
               desc_o,
               pady, padu, padv, ystr, ustr, vstr, sm_state, sems):
        r = pl.program_id(0)

        @pl.when(r == 0)
        def _():
            c0 = pltpu.make_async_copy(refy_in, pady, sems.at[0])
            c1 = pltpu.make_async_copy(refu_in, padu, sems.at[1])
            c2 = pltpu.make_async_copy(refv_in, padv, sems.at[2])
            c0.start(); c1.start(); c2.start()
            c0.wait(); c1.wait(); c2.wait()

        quality = params[0]
        mad_thr = params[1]
        py_s = r * MB

        mi = mi_ref[...]
        valid_v = mi < wb
        px_v = jnp.minimum(mi, wb - 1) * MB
        py_v = jnp.zeros((p, 128), jnp.int32) + py_s

        ws_src_y = srcy_ref[0].astype(jnp.int32)
        csrc = srcc_ref[0].astype(jnp.int32)
        src_rep = jnp.concatenate([ws_src_y] * 8, axis=1)
        u_rep = jnp.concatenate([csrc[:, 0:8]] * 16, axis=1)
        v_rep = jnp.concatenate([csrc[:, 8:16]] * 16, axis=1)

        ones16 = ones16_ref[...]
        sel16 = sel16_ref[...]
        sel8 = sel8_ref[...]

        def _shift_rows(sl, resid):
            n = sl.shape[0]
            rv = jnp.zeros(sl.shape, jnp.int32) + resid
            for k in (1, 2, 4):
                sl = jnp.where((rv & k) != 0,
                               pltpu.roll(sl, n - k, 0), sl)
            return sl

        def load_y16(o, row, lane0):
            al = pl.multiple_of((row >> 3) << 3, 8)
            tile = pl.multiple_of((lane0 >> 7) << 7, 128)
            sl = pady[o, pl.ds(al, 24), pl.ds(tile, 256)].astype(jnp.int32)
            sl = _shift_rows(sl, row - al)
            sl = pltpu.roll(sl, (256 - (lane0 - tile)) % 256, 1)
            return sl[0:16, 0:128]

        def load_c8(pad, o, row, lane0):
            al = pl.multiple_of((row >> 3) << 3, 8)
            tile = pl.multiple_of((lane0 >> 7) << 7, 128)
            sl = pad[o, pl.ds(al, 16), pl.ds(tile, 256)].astype(jnp.int32)
            sl = _shift_rows(sl, row - al)
            sl = pltpu.roll(sl, (256 - (lane0 - tile)) % 256, 1)
            return sl[0:8, 0:128]

        def state_to_smem(mx, my):
            for m in range(p):
                sm_state[0, m] = mx[m, 0]
                sm_state[1, m] = my[m, 0]

        def build_strips(o, offs_y, mx, my):
            state_to_smem(mx, my)

            def body(m, _):
                px_s = jnp.minimum(m, wb - 1) * MB
                mx_s = sm_state[0, m]
                my_s = sm_state[1, m]
                lane0 = px_s + mx_s + (Y_L0 - 32)
                cl0 = (px_s >> 1) + (mx_s >> 1) + (C_L0 - 16)
                for ojx, oj in enumerate(offs_y):
                    row = py_s + my_s + oj + REACH
                    ystr[pl.ds(ojx * py16 + 16 * m, 16)] = \
                        load_y16(o, row, lane0)
                    crow = (py_s >> 1) + ((my_s + oj) >> 1) + REACH // 2
                    ustr[pl.ds(ojx * pc8 + 8 * m, 8)] = \
                        load_c8(padu, o, crow, cl0)
                    vstr[pl.ds(ojx * pc8 + 8 * m, 8)] = \
                        load_c8(padv, o, crow, cl0)
                return 0

            jax.lax.fori_loop(0, p, body, 0)

        def pack(entries, nl, rows):
            li = _lane_iota((rows, 128))
            pk = jnp.zeros((rows, 128), jnp.int32)
            for g, (strip, lane) in enumerate(entries):
                amt = (nl * g - lane) % 128
                pk = jnp.where((li >= nl * g) & (li < nl * g + nl),
                               pltpu.roll(strip, amt, 1), pk)
            return pk

        def y_metrics(d):
            rs = _seg_matmul(ones16, d)
            sadw = _tree(rs, 16, 1, jnp.add)
            md = _tree(_tree(d, 16, 1, jnp.maximum), 16, 0, jnp.maximum)
            madw = _seg_matmul(sel16, md)
            return sadw, madw

        def c_metrics(dc):
            md = _tree(_tree(dc, 8, 1, jnp.maximum), 8, 0, jnp.maximum)
            return _seg_matmul(sel8, md)

        def col(a, c):
            return jnp.broadcast_to(a[:, c:c + 1], (p, 128))

        def dyncol(a, c):
            li = _lane_iota((p, 128))
            return jnp.broadcast_to(
                jnp.sum(jnp.where(li == c, a, 0), axis=1, keepdims=True),
                (p, 128))

        def in_bounds(dx, dy):
            cx = px_v + dx
            cy = py_v + dy
            return (cx >= 0) & (cx <= aligned_w - MB) & \
                   (cy >= 0) & (cy <= aligned_h - MB) & valid_v

        zero_p = jnp.zeros((p, 128), jnp.int32)
        best = None
        for o in range(n_refs):
            # ---- co-located metrics (motion.cpp:445-453)
            build_strips(o, (0,), zero_p, zero_p)
            ystrip0 = ystr[0:py16]
            dpk0 = jnp.abs(pack([(ystrip0, 32)] * 8, 16, py16) - src_rep)
            us0 = ustr[0:pc8]
            vs0 = vstr[0:pc8]
            dc0 = jnp.maximum(
                jnp.abs(pack([(us0, 16)] * 16, 8, pc8) - u_rep),
                jnp.abs(pack([(vs0, 16)] * 16, 8, pc8) - v_rep))
            sadw0, madw0 = y_metrics(dpk0)
            madc0 = c_metrics(dc0)
            co_sad = col(sadw0, 0)
            co_mad = jnp.maximum(col(madw0, 0), col(madc0, 0))
            frozen = co_mad < mad_thr

            mx = zero_p
            my = zero_p
            sad = co_sad
            mad = co_mad
            ssd = jnp.full((p, 128), INT32_MAX)

            for ring_i, s in enumerate((16, 8, 4, 2, 1)):
                offs = _RINGS[s]
                offs_y = sorted({oj for _, oj in offs})
                build_strips(o, offs_y, mx, my)
                ojx_of = {oj: i for i, oj in enumerate(offs_y)}
                parity = s == 1

                ent_y = [(ystr[ojx_of[oj] * py16:(ojx_of[oj] + 1) * py16],
                          32 + oi) for oi, oj in offs]
                dpk = jnp.abs(pack(ent_y, 16, py16) - src_rep)
                variants = (0, 1) if parity else (0,)
                ent_u, ent_v = [], []
                for oi, oj in offs:
                    us = ustr[ojx_of[oj] * pc8:(ojx_of[oj] + 1) * pc8]
                    vs = vstr[ojx_of[oj] * pc8:(ojx_of[oj] + 1) * pc8]
                    for v in variants:
                        c_off = _coff_table(oi, v) if parity else oi >> 1
                        ent_u.append((us, 16 + c_off))
                        ent_v.append((vs, 16 + c_off))
                dc = jnp.maximum(
                    jnp.abs(pack(ent_u, 8, pc8) - u_rep),
                    jnp.abs(pack(ent_v, 8, pc8) - v_rep))
                sadw, madw = y_metrics(dpk)
                madc = c_metrics(dc)

                emx, emy = mx, my        # frozen ring-entry base
                cands = list(enumerate(offs))
                # the first ring's center: the co-located re-evaluation
                # with SSD 0 (motion.cpp square scan includes (0,0); on
                # later rings the base re-eval is a no-op)
                seq = cands[:4] + ([None] if ring_i == 0 else []) + cands[4:]
                for item in seq:
                    if item is None:
                        c_sad, c_mad = co_sad, co_mad
                        dx = emx
                        dy = emy
                        ok = in_bounds(dx, dy) & ~frozen
                    else:
                        k, (oi, oj) = item
                        c_sad = col(sadw, 16 * k)
                        my_k = col(madw, 16 * k)
                        if parity:
                            mc_k = dyncol(madc, 8 * (2 * k + (emx & 1)))
                        else:
                            mc_k = col(madc, 8 * k)
                        c_mad = jnp.maximum(my_k, mc_k)
                        dx = emx + oi
                        dy = emy + oj
                        ok = in_bounds(dx, dy) & ~frozen
                    c_ssd = dx * dx + dy * dy
                    acc = _accept(sad, mad, ssd, c_sad, c_mad, c_ssd, ok,
                                  mad_thr)
                    mx = jnp.where(acc, dx, mx)
                    my = jnp.where(acc, dy, my)
                    sad = jnp.where(acc, c_sad, sad)
                    mad = jnp.where(acc, c_mad, mad)
                    ssd = jnp.where(acc, c_ssd, ssd)

            # ---- sub-pel (motion.cpp:277-352)
            build_strips(o, (-1, 0, 1), mx, my)
            str_mid_y = ystr[py16:2 * py16]
            pb = pack([(str_mid_y, 32)] * 8, 16, py16)
            ent_t = []
            for di, dj in _SP_DIRS:
                ojx = dj + 1
                ent_t.append((ystr[ojx * py16:(ojx + 1) * py16], 32 + di))
            pt = pack(ent_t, 16, py16)
            sad_h, mad_h = y_metrics(jnp.abs(_lerp_half(pb, pt) - src_rep))
            sad_q, mad_q = y_metrics(
                jnp.abs(_lerp_quarter(pb, pt) - src_rep))

            ent_bu, ent_bv, ent_tu, ent_tv = [], [], [], []
            for di, dj in _SP_DIRS:
                ojx = dj + 1
                us = ustr[ojx * pc8:(ojx + 1) * pc8]
                vs = vstr[ojx * pc8:(ojx + 1) * pc8]
                for v in (0, 1):
                    c_off = _coff_table(di, v)
                    ent_tu.append((us, 16 + c_off))
                    ent_tv.append((vs, 16 + c_off))
                    ent_bu.append((ustr[pc8:2 * pc8], 16))
                    ent_bv.append((vstr[pc8:2 * pc8], 16))
            pbu = pack(ent_bu, 8, pc8)
            pbv = pack(ent_bv, 8, pc8)
            ptu = pack(ent_tu, 8, pc8)
            ptv = pack(ent_tv, 8, pc8)
            madc_h = c_metrics(jnp.maximum(
                jnp.abs(_lerp_half(pbu, ptu) - u_rep),
                jnp.abs(_lerp_half(pbv, ptv) - v_rep)))
            madc_q = c_metrics(jnp.maximum(
                jnp.abs(_lerp_quarter(pbu, ptu) - u_rep),
                jnp.abs(_lerp_quarter(pbv, ptv) - v_rep)))

            sp_en = zero_p
            sp_am = zero_p
            sp_ix = zero_p
            for k, (di, dj) in enumerate(_SP_DIRS):
                ok = in_bounds(mx + di, my + dj) & ~frozen
                cidx = 8 * (2 * k + (mx & 1))
                for amount, sadw_, madw_, madc_ in (
                        (0, sad_h, mad_h, madc_h),
                        (1, sad_q, mad_q, madc_q)):
                    c_sad = col(sadw_, 16 * k)
                    c_mad = jnp.maximum(col(madw_, 16 * k),
                                        dyncol(madc_, cidx))
                    copy_branch = mad < mad_thr
                    acc = ok & (jnp.where(
                        copy_branch, (c_mad < mad).astype(jnp.int32),
                        (((c_sad < sad) & (c_sad < SAD_THRESHOLD))
                         | (c_mad < mad_thr)).astype(jnp.int32)) != 0)
                    sp_en = jnp.where(acc, 1, sp_en)
                    sp_am = jnp.where(acc, amount, sp_am)
                    sp_ix = jnp.where(acc, _sp_index(di, dj), sp_ix)
                    sad = jnp.where(acc, c_sad, sad)
                    mad = jnp.where(acc, c_mad, mad)

            cand = dict(
                sad=sad, mad=mad,
                is_copy=(mad < mad_thr).astype(jnp.int32),
                is_motion=((mx != 0) | (my != 0)
                           | (sp_en != 0)).astype(jnp.int32),
                target=zero_p + (o + 1), mx=mx, my=my,
                sp_en=sp_en, sp_am=sp_am, sp_ix=sp_ix)
            if best is None:
                best = cand
            else:
                # classify merge (encode.cpp:36-54): copy status dominates,
                # then strictly-lower SAD; ties keep the earlier offset
                differ = (cand["is_copy"] - best["is_copy"]) & 1
                take = (differ * cand["is_copy"]
                        + (1 - differ)
                        * (cand["sad"] < best["sad"]).astype(jnp.int32)) != 0
                best = {k2: jnp.where(take, cand[k2], best[k2])
                        for k2 in best}

        desc_o[0, :, 0:1] = best["sad"][:, 0:1]
        desc_o[0, :, 1:2] = best["is_copy"][:, 0:1]
        desc_o[0, :, 2:3] = best["is_motion"][:, 0:1]
        desc_o[0, :, 3:4] = best["target"][:, 0:1]
        desc_o[0, :, 4:5] = best["mx"][:, 0:1]
        desc_o[0, :, 5:6] = best["my"][:, 0:1]
        desc_o[0, :, 6:7] = best["sp_en"][:, 0:1]
        desc_o[0, :, 7:8] = best["sp_am"][:, 0:1]
        desc_o[0, :, 8:9] = best["sp_ix"][:, 0:1]
        desc_o[0, :, 9:10] = best["mad"][:, 0:1]
        desc_o[0, :, 10:16] = jnp.zeros((p, 6), jnp.int32)

    return kernel


def inter_search(src_blocks, refs, quality, *, aligned_w, aligned_h):
    """Folded exact inter candidates for all MBs on device.

    src_blocks: (Y (n,16,16), U (n,8,8), V (n,8,8)) int32;
    refs: list of (y, u, v) int32 plane tuples in OFFSET order (1..3).
    Returns the inter_best dict of (n,) fields matching
    wavefront._dense_inter's fold."""
    wb, hb, p = geometry(aligned_w, aligned_h)
    n_refs = len(refs)
    (ry, ly), (rc, lc) = ref_pads(aligned_w, aligned_h)
    n = wb * hb
    py16, pc8 = p * 16, p * 8

    ybl = src_blocks[0].reshape(hb, wb, 16, 16)
    if p != wb:
        ybl = jnp.pad(ybl, ((0, 0), (0, p - wb), (0, 0), (0, 0)))
    srcy = ybl.reshape(hb, py16, 16).astype(jnp.int16)
    ubl = src_blocks[1].reshape(hb, wb, 8, 8)
    vbl = src_blocks[2].reshape(hb, wb, 8, 8)
    if p != wb:
        ubl = jnp.pad(ubl, ((0, 0), (0, p - wb), (0, 0), (0, 0)))
        vbl = jnp.pad(vbl, ((0, 0), (0, p - wb), (0, 0), (0, 0)))
    srcc = jnp.concatenate([ubl, vbl], axis=3) \
        .reshape(hb, pc8, 16).astype(jnp.int16)

    refy = jnp.stack([jnp.pad(rp[0].astype(jnp.int16),
                              ((REACH, ry - aligned_h - REACH),
                               (Y_L0, ly - aligned_w - Y_L0)))
                      for rp in refs])
    refu = jnp.stack([jnp.pad(rp[1].astype(jnp.int16),
                              ((REACH // 2, rc - aligned_h // 2 - REACH // 2),
                               (C_L0, lc - aligned_w // 2 - C_L0)))
                      for rp in refs])
    refv = jnp.stack([jnp.pad(rp[2].astype(jnp.int16),
                              ((REACH // 2, rc - aligned_h // 2 - REACH // 2),
                               (C_L0, lc - aligned_w // 2 - C_L0)))
                      for rp in refs])

    mad_thr = (jnp.asarray(quality, jnp.int32) >> 2) + 1
    params = jnp.stack([jnp.asarray(quality, jnp.int32), mad_thr,
                        jnp.int32(0), jnp.int32(0)])
    consts = _consts(p)
    kern = _build_kernel(aligned_w, aligned_h, p, wb, hb, n_refs)

    def _rix(r, *_):
        return (r, 0, 0)

    def _cix(r, *_):
        return (0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(hb,),
        in_specs=[
            pl.BlockSpec((1, py16, 16), _rix, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, pc8, 16), _rix, memory_space=pltpu.VMEM),
            pl.BlockSpec((p, py16), _cix, memory_space=pltpu.VMEM),
            pl.BlockSpec((p, py16), _cix, memory_space=pltpu.VMEM),
            pl.BlockSpec((p, pc8), _cix, memory_space=pltpu.VMEM),
            pl.BlockSpec((p, 128), _cix, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, p, 16), _rix, memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((n_refs, ry, ly), jnp.int16),
            pltpu.VMEM((n_refs, rc, lc), jnp.int16),
            pltpu.VMEM((n_refs, rc, lc), jnp.int16),
            pltpu.VMEM((3 * py16, 128), jnp.int32),
            pltpu.VMEM((3 * pc8, 128), jnp.int32),
            pltpu.VMEM((3 * pc8, 128), jnp.int32),
            pltpu.SMEM((2, p), jnp.int32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )
    (desc_o,) = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((hb, p, 16), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("arbitrary",)),
    )(params, srcy, srcc, consts["ones16"], consts["sel16"],
      consts["sel8"], consts["mi"], refy, refu, refv)

    dd = desc_o[:, :wb, :].reshape(n, 16)
    return dict(
        sad=dd[:, 0], is_copy=dd[:, 1] != 0, is_motion=dd[:, 2] != 0,
        target=dd[:, 3], motion_x=dd[:, 4], motion_y=dd[:, 5],
        sp_pred=dd[:, 6] != 0, sp_amount=dd[:, 7] != 0, sp_index=dd[:, 8],
        is_intra=jnp.zeros(n, bool))
