"""Mosaic wave kernel: the conformance encoder's sequential wave pass as ONE
Pallas kernel with grid=(n_waves + 1,).

Replaces the XLA fori_loop wave body of wavefront.conformance_encode_step
(~600 ms/frame device time at 1080p: tiny batched one-hot extraction
matmuls, per-member dynamic-update-slices, while-loop bookkeeping) with a
single kernel invocation whose grid steps ARE the waves:

  * the current frame's reconstruction planes live in VMEM scratch for the
    whole frame (DMA'd in at wave 0, out at the extra last step) — wave
    w+1 reads wave w's writes with no HBM round trip;
  * recon writes are DEFERRED: wave w stashes its reconstructed blocks in
    scratch and grid step w+1 flushes them into the planes (via staged
    DMA copies with semaphore waits) BEFORE any of its reads — cross-step
    vector-store -> dynamic-load pairs proved unreliable on chip, while
    same-step DMA-fenced ordering holds (bench/probe_wave_prims.py);
  * per-ring candidate strips are member-stacked (P*16, 128) arrays built
    by aligned dynamic-sublane loads + dynamic pltpu.roll re-basing;
  * the 8 ring candidates (the (0,0) base re-evaluation is a provable
    no-op: every acceptance test compares the base against its own
    metrics, so it either fails or rewrites identical values) pack into
    the 8 16-lane groups of one (P*16, 128) diff array: SAD rides ONE
    exact hi/lo-bf16 ones-segment matmul on the MXU, MAD one pair of
    roll-tree reductions per ring; chroma MAD handles the (bx+oi)>>1
    parity cases with per-variant groups + dynamic column selection;
  * the acceptance recurrence (motion.cpp:111-149 incl. the C precedence
    quirk) folds on lane-replicated (P, 128) state vectors (Mosaic cannot
    select i1 vectors, so boolean selects are int32-cast);
  * the final prediction is assembled from the sub-pel candidate packs by
    masked group-folds — pure vector ops, no per-member re-loads;
  * the encode path (sub_transform -> adaptive QP -> quantize ->
    dequantize -> inverse transform, encode.cpp:69-163 / decode.cpp:15-144)
    runs in member-stacked (P*16, 16) luma and (P*8, 16) chroma
    workspaces; the 8x8 integer DCTs are roll-accumulate contractions
    (15 shifted diagonal terms) which keep the reference's PER-TERM
    truncating divisions (transform.cpp:330-349) exact in int32.

Bit-exactness contract: identical outputs (block table fields, quantized
coefficients, reconstruction planes) to the XLA wave loop, hence to the
compiled reference encoder. bench/wave_twin.py is the numpy twin of the
search dataflow (validated against the cpuref raster encoder);
tests/test_pallas_wave_tpu.py pins the kernel differentially on hardware.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import tables

MB = tables.MACROBLOCK_SIZE            # 16
SKEW = 3
INT32_MAX = np.int32(0x7FFFFFFF)
SAD_THRESHOLD = int(tables.MOTION_SAD_THRESHOLD)
QSCALE = int(tables.QUANTIZER_SCALE_FACTOR)   # 16

YP = 48          # luma causal-window pad (wavefront.YPAD)
CP = 24          # chroma pad (wavefront.CPAD)
XTRA = 128       # extra leading lane tile so slab origins stay >= 0
Y_L0 = YP + XTRA       # pad-plane lane of luma x=0   (176)
C_L0 = CP + XTRA       # pad-plane lane of chroma x=0 (152)

# ring candidate offsets in the reference's evaluation order
# (motion.cpp:381-385 initial triangle, then halving refinement), without
# the (0,0) base re-evaluation (see module docstring).
_RING0 = [(i, j) for j in (-32, -16, 0) for i in (-16, 0, 16)
          if (i, j) != (0, 0)]
_RINGS = {s: [(i, j) for j in (-s, 0, s) for i in (-s, 0, s)
              if (i, j) != (0, 0)] for s in (8, 4, 2, 1)}
_SP_DIRS = [(-1, -1), (0, -1), (1, -1), (-1, 0),
            (1, 0), (-1, 1), (0, 1), (1, 1)]   # motion.cpp:61-109 order


def _sp_index(di, dj):
    from ..blocktypes import sp_dir_to_index
    return sp_dir_to_index(di, dj)


def geometry(aligned_w: int, aligned_h: int):
    """Static wave geometry: (wb, hb, n_waves, P)."""
    wb, hb = aligned_w // MB, aligned_h // MB
    n_waves = wb + SKEW * (hb - 1)
    p = 0
    for w in range(n_waves):
        lo = max(0, -(-(w - wb + 1) // SKEW))
        hi = min(hb - 1, w // SKEW)
        p = max(p, hi - lo + 1)
    return wb, hb, n_waves, max(16, -(-p // 8) * 8)  # sublane-pad members


def plane_pads(aligned_w: int, aligned_h: int):
    """Padded-plane shapes: ((RY, LY), (RC, LC)) rows/lanes, luma/chroma."""
    ry = aligned_h + 2 * YP + 16
    ly = ((aligned_w - MB + 47 + Y_L0) // 128) * 128 + 256
    rc = aligned_h // 2 + 2 * CP + 8
    lc = ((aligned_w // 2 - 8 + 23 + C_L0) // 128) * 128 + 256
    r8 = lambda v: -(-v // 8) * 8
    return (r8(ry), ly), (r8(rc), lc)


def vmem_estimate(aligned_w: int, aligned_h: int) -> int:
    (ry, ly), (rc, lc) = plane_pads(aligned_w, aligned_h)
    _, _, _, p = geometry(aligned_w, aligned_h)
    pads = 4 * (ry * ly + 2 * rc * lc)
    strips = 4 * (3 * p * 16 * 128 + 2 * 3 * p * 8 * 128
                  + p * 16 * 128 + 2 * p * 8 * 128)
    return pads + strips + (2 << 20)


def supported(aligned_w: int, aligned_h: int, budget=48 * 1024 * 1024):
    _, _, _, p = geometry(aligned_w, aligned_h)
    return p <= 128 and vmem_estimate(aligned_w, aligned_h) <= budget


# ------------------------------------------------------------------ consts

def _dct_row_patterns():
    """(16, 48) int32 diagonal patterns for row-contracting DCT passes
    (tiled to the member row stride by the caller):
    cols [0:15]  d+7 -> fdct  B[j, j+d]                (j = row % 8)
    cols [16:31] d+7 -> idct value B[j+d, j], k=j+d >= 1
    cols [32:47] d+7 -> idct sign-odd: -sign*odd of the same entry
    """
    b = np.asarray(tables.DCT_BASIS_8, np.int64)
    out = np.zeros((16, 48), np.int32)
    for r in range(16):
        j = r % 8
        for d in range(-7, 8):
            k = j + d
            if 0 <= k < 8:
                out[r, d + 7] = b[j, k]
                if k >= 1:
                    v = b[k, j]
                    out[r, 16 + d + 7] = v
                    out[r, 32 + d + 7] = -int(np.sign(v)) * (abs(v) & 1)
    return out


def _dct_lane_patterns():
    """(48, 16) int32: the same three families along lanes (c = lane%8)."""
    b = np.asarray(tables.DCT_BASIS_8, np.int64)
    out = np.zeros((48, 16), np.int32)
    for c in range(16):
        j = c % 8
        for d in range(-7, 8):
            k = j + d
            if 0 <= k < 8:
                out[d + 7, c] = b[j, k]
                if k >= 1:
                    v = b[k, j]
                    out[16 + d + 7, c] = v
                    out[32 + d + 7, c] = -int(np.sign(v)) * (abs(v) & 1)
    return out


def _qm_tile(block_rows):
    """(block_rows, 32) int64 [intra(16) | inter(16)] QM pattern."""
    qi = np.asarray(tables.INTRA_QM_8x8, np.int64)
    qe = np.asarray(tables.INTER_QM_8x8, np.int64)
    t = np.zeros((block_rows, 32), np.int64)
    for r in range(block_rows):
        for c in range(16):
            t[r, c] = qi[r % 8, c % 8]
            t[r, 16 + c] = qe[r % 8, c % 8]
    return t


def _consts(p):
    qy = np.tile(_qm_tile(16), (p, 1))
    qc = np.tile(_qm_tile(8), (p, 1))
    return dict(
        wrow=jnp.asarray(np.tile(_dct_row_patterns(), (p, 1))),
        wrowc=jnp.asarray(np.tile(_dct_row_patterns()[:8], (p, 1))),
        wlane=jnp.asarray(_dct_lane_patterns()),
        qm_y=jnp.asarray(qy.astype(np.int32)),
        qmr_y=jnp.asarray((1.0 / qy).astype(np.float32)),
        qm_c=jnp.asarray(qc.astype(np.int32)),
        qmr_c=jnp.asarray((1.0 / qc).astype(np.float32)),
        dclut=jnp.asarray(
            np.concatenate([tables.luma_dc_scale(np.arange(32)),
                            tables.chroma_dc_scale(np.arange(32))])
            .astype(np.int32)),
        mi=jnp.asarray(np.broadcast_to(np.arange(p, dtype=np.int32)
                                       [:, None], (p, 128)).copy()),
        ones16=jnp.asarray((np.arange(p * 16)[None, :] // 16
                            == np.arange(p)[:, None])
                           .astype(np.float32)).astype(jnp.bfloat16),
        sel16=jnp.asarray((np.arange(p * 16)[None, :]
                           == 16 * np.arange(p)[:, None])
                          .astype(np.float32)).astype(jnp.bfloat16),
        sel8=jnp.asarray((np.arange(p * 8)[None, :]
                          == 8 * np.arange(p)[:, None])
                         .astype(np.float32)).astype(jnp.bfloat16),
    )


# ----------------------------------------------------------- kernel helpers

def _tree(m, group, axis, op):
    """Roll-tree: position i holds reduce over [i, i+group)."""
    n = m.shape[axis]
    shift = 1
    while shift < group:
        m = op(m, pltpu.roll(m, n - shift, axis))
        shift *= 2
    return m


def _hl(v):
    return (v & 255).astype(jnp.bfloat16), \
        ((v >> 8) & 255).astype(jnp.bfloat16)


def _mm(a, b):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _seg_matmul(sel, d):
    """Exact int32 (sel @ d) for d in [0, 65535]: hi/lo bf16 split."""
    lo, hi = _hl(d)
    return _mm(sel, lo).astype(jnp.int32) + \
        (_mm(sel, hi).astype(jnp.int32) << 8)


def _trunc_shift(v, k):
    return jnp.where(v < 0, -((-v) >> k), v >> k)


def _rdiv_shift(v, k):
    h = 1 << (k - 1)
    a = jnp.abs(v) + h
    return jnp.where(v < 0, -(a >> k), a >> k)


def _udiv(a, d, rec):
    """Exact floor(a / d) for a >= 0 int32, d >= 1 int32, rec ~ 1/d f32."""
    q = (a.astype(jnp.float32) * rec).astype(jnp.int32)
    r = a - q * d
    q = q + (r.astype(jnp.float32) * rec).astype(jnp.int32)
    r = a - q * d
    q = jnp.where(r < 0, q - 1, q)
    r = a - q * d
    q = jnp.where(r < 0, q - 1, q)
    r = a - q * d
    q = jnp.where(r >= d, q + 1, q)
    r = a - q * d
    return jnp.where(r >= d, q + 1, q)


def _rdiv_dyn(v, d, rec):
    """rounded_div_pos(v, d) with runtime positive divisor (math.h:228)."""
    a = jnp.abs(v) + (d >> 1)
    q = _udiv(a, d, rec)
    return jnp.where(v < 0, -q, q)


def _wrap16(v):
    return ((v + 0x8000) & 0xFFFF) - 0x8000


def _lerp_half(a, b):
    t = a + b
    return _trunc_shift(jnp.where(t < 0, t - 1, t + 1), 1)


def _lerp_quarter(a, b):
    t = 3 * a + b
    return _wrap16(_trunc_shift(jnp.where(t < 0, t - 2, t + 2), 2))


def _row_iota(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, 0)


def _lane_iota(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, 1)


def _expand_rows(s, reps):
    """(P, 1) int32 -> (P*reps, 1), ELEMENT-wise repetition
    [s0,s0,...,s1,s1,...] via an exact one-hot matmul (values must be
    < 256 so plain bf16 operands stay exact — all callers pass flags,
    qp (<= 31), dc scales (<= 46) or pack indices).

    NOTE pltpu.repeat(s, reps, 0) TILES the array ([s0,s1,...,s0,s1,...]),
    which silently assigns every member the wrong mask rows — the root
    cause of a long-hunted corruption (member r%P's flags landing on
    member r//reps's rows)."""
    p = s.shape[0]
    e = (jax.lax.broadcasted_iota(jnp.int32, (p * reps, p), 1) ==
         (jax.lax.broadcasted_iota(jnp.int32, (p * reps, p), 0) // reps)
         ).astype(jnp.bfloat16)
    return jax.lax.dot_general(
        e, s.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(jnp.int32)


def _accept(sad, mad, ssd, c_sad, c_mad, c_ssd, ok, mad_thr):
    """evaluate_motion_candidate (motion.cpp:111-149) on lane-replicated
    (P,128) vectors, incl. the C-precedence quirk on the SAD-tie branch."""
    copy_branch = mad < mad_thr
    acc_copy = ((c_mad < mad)
                | ((c_mad == mad) & (c_ssd < ssd))).astype(jnp.int32)
    acc_plain = ((c_sad < sad)
                 | ((c_sad == sad) & (c_ssd < ssd)
                    & (c_sad < SAD_THRESHOLD))
                 | (c_mad < mad_thr)).astype(jnp.int32)
    return ok & (jnp.where(copy_branch, acc_copy, acc_plain) != 0)


def _coff_table(oi, v):
    """((bx+oi)>>1) - (bx>>1) for bx parity v (0 even, 1 odd), |oi| <= 1."""
    if v == 0:
        return -1 if oi < 0 else 0
    return 1 if oi > 0 else 0


# ----------------------------------------------------------------- kernel

def _build_wave_kernel(aligned_w, aligned_h, p, wb, hb, n_waves, is_inter):
    mb = MB
    (ry, ly), (rc, lc) = plane_pads(aligned_w, aligned_h)
    py16 = p * 16
    pc8 = p * 8

    def kernel(params, srcy_ref, srcc_ref, predy_ref, predc_ref, desc_ref,
               wrow_ref, wrowc_ref, wlane_ref, qmy_ref, qmry_ref,
               qmc_ref, qmrc_ref, dclut_ref, mi_ref, ones16_ref,
               sel16_ref, sel8_ref,
               pyin, puin, pvin,
               desc_o, coefy_o, coefc_o, pyout, puout, pvout,
               pady, padu, padv, ystr, ustr, vstr,
               stash_y, stash_c, stgy, stgu, stgv, sm_state, sems,
               fsem, ssem):
        w = pl.program_id(0)

        # hard step-to-step serialization: grid iterations must not
        # overlap (wave w+1 reads wave w's flush)
        @pl.when(w > 0)
        def _():
            pltpu.semaphore_wait(ssem, 1)

        @pl.when(w == 0)
        def _():
            c0 = pltpu.make_async_copy(pyin, pady, sems.at[0])
            c1 = pltpu.make_async_copy(puin, padu, sems.at[1])
            c2 = pltpu.make_async_copy(pvin, padv, sems.at[2])
            c0.start(); c1.start(); c2.start()
            c0.wait(); c1.wait(); c2.wait()

        quality = params[0]
        mad_thr = params[1]
        li16f = _lane_iota((16, 128))
        li8f = _lane_iota((8, 128))

        # ---- deferred recon flush: wave w-1's stashed blocks land in the
        # pads HERE, before any of this step's reads (staged + DMA-fenced).
        @pl.when(w > 0)
        def _flush():
            wp = w - 1
            bj0p = jnp.maximum(0, (wp - wb + SKEW) // SKEW)

            def fbody(m, _):
                bj_sp = jnp.clip(bj0p + m, 0, hb - 1)
                bi_sp = jnp.clip(wp - SKEW * bj_sp, 0, wb - 1)
                px_sp = bi_sp * mb
                py_sp = bj_sp * mb
                valid_sp = ((bj0p + m) < hb) & (((bj0p + m) * SKEW) <= wp)
                row = py_sp + YP
                lane = px_sp + Y_L0
                tile = pl.multiple_of((lane >> 7) << 7, 128)
                off = lane - tile
                crow = (py_sp >> 1) + CP
                clane = (px_sp >> 1) + C_L0
                ctile = pl.multiple_of((clane >> 7) << 7, 128)
                coff = clane - ctile

                yblk = jnp.concatenate(
                    [stash_y[pl.ds(16 * m, 16), :],
                     jnp.zeros((16, 112), jnp.int32)], axis=1)
                cur = pady[pl.ds(pl.multiple_of(row, 8), 16),
                           pl.ds(tile, 128)]
                stgy[0:16, :] = jnp.where(
                    (li16f >= off) & (li16f < off + 16),
                    pltpu.roll(yblk, off, 1), cur)
                cblk = stash_c[pl.ds(8 * m, 8), :]
                ublk = jnp.concatenate(
                    [cblk[:, 0:8], jnp.zeros((8, 120), jnp.int32)], axis=1)
                vblk = jnp.concatenate(
                    [cblk[:, 8:16], jnp.zeros((8, 120), jnp.int32)],
                    axis=1)
                curu = padu[pl.ds(pl.multiple_of(crow, 8), 8),
                            pl.ds(ctile, 128)]
                curv = padv[pl.ds(pl.multiple_of(crow, 8), 8),
                            pl.ds(ctile, 128)]
                cm = (li8f >= coff) & (li8f < coff + 8)
                stgu[0:8, :] = jnp.where(cm, pltpu.roll(ublk, coff, 1),
                                         curu)
                stgv[0:8, :] = jnp.where(cm, pltpu.roll(vblk, coff, 1),
                                         curv)

                @pl.when(valid_sp)
                def _():
                    cy_ = pltpu.make_async_copy(
                        stgy.at[pl.ds(0, 16)],
                        pady.at[pl.ds(pl.multiple_of(row, 8), 16),
                                pl.ds(tile, 128)], fsem.at[0, 0])
                    cu_ = pltpu.make_async_copy(
                        stgu.at[pl.ds(0, 8)],
                        padu.at[pl.ds(pl.multiple_of(crow, 8), 8),
                                pl.ds(ctile, 128)], fsem.at[1, 0])
                    cv_ = pltpu.make_async_copy(
                        stgv.at[pl.ds(0, 8)],
                        padv.at[pl.ds(pl.multiple_of(crow, 8), 8),
                                pl.ds(ctile, 128)], fsem.at[2, 0])
                    cy_.start(); cu_.start(); cv_.start()
                    cy_.wait(); cu_.wait(); cv_.wait()
                return 0

            jax.lax.fori_loop(0, p, fbody, 0)

        # ---- member geometry
        bj0 = jnp.maximum(0, (w - wb + SKEW) // SKEW)
        mi = mi_ref[...]   # host constant: dim-0 iota on (P, 128) shapes
        # materializes as zeros at some program positions (observed on
        # chip); never trust in-kernel row iotas for member indexing
        bj_v0 = bj0 + mi
        valid_v = (bj_v0 < hb) & (bj_v0 * SKEW <= w)
        bj_v = jnp.clip(bj_v0, 0, hb - 1)
        bi_v = jnp.clip(w - SKEW * bj_v, 0, wb - 1)
        px_v = bi_v * mb
        py_v = bj_v * mb

        def member_scalars(m):
            bj_s = jnp.clip(bj0 + m, 0, hb - 1)
            bi_s = jnp.clip(w - SKEW * bj_s, 0, wb - 1)
            return bi_s * mb, bj_s * mb

        ws_src_y = srcy_ref[0].astype(jnp.int32)        # (P*16, 16)
        csrc = srcc_ref[0].astype(jnp.int32)            # (P*8, 16)
        src_rep = jnp.concatenate([ws_src_y] * 8, axis=1)
        u_rep = jnp.concatenate([csrc[:, 0:8]] * 16, axis=1)
        v_rep = jnp.concatenate([csrc[:, 8:16]] * 16, axis=1)

        ones16 = ones16_ref[...]
        sel16 = sel16_ref[...]
        sel8 = sel8_ref[...]

        # Sublane residues are applied as a log-decomposed chain of
        # STATIC rolls selected by the residue bits: dynamic axis-0 rolls
        # whose amounts come from vector-extracted scalars miscompile in
        # large kernels (only tile-leader rows survive), while static-
        # amount rolls under scalar-bool selects are reliable.
        def _shift_rows(sl, resid):
            n = sl.shape[0]
            rv = jnp.zeros(sl.shape, jnp.int32) + resid   # vector-domain
            for k in (1, 2, 4):
                sl = jnp.where((rv & k) != 0,
                               pltpu.roll(sl, n - k, 0), sl)
            return sl

        def load_y16(row, lane0):
            al = pl.multiple_of((row >> 3) << 3, 8)
            tile = pl.multiple_of((lane0 >> 7) << 7, 128)
            sl = pady[pl.ds(al, 24), pl.ds(tile, 256)]
            sl = _shift_rows(sl, row - al)
            sl = pltpu.roll(sl, (256 - (lane0 - tile)) % 256, 1)
            return sl[0:16, 0:128]

        def load_c8(pad, row, lane0):
            al = pl.multiple_of((row >> 3) << 3, 8)
            tile = pl.multiple_of((lane0 >> 7) << 7, 128)
            sl = pad[pl.ds(al, 16), pl.ds(tile, 256)]
            sl = _shift_rows(sl, row - al)
            sl = pltpu.roll(sl, (256 - (lane0 - tile)) % 256, 1)
            return sl[0:8, 0:128]

        def state_to_smem(bx, by):
            for m in range(p):
                sm_state[0, m] = bx[m, 0]
                sm_state[1, m] = by[m, 0]

        def build_strips(offs_y, bx, by):
            state_to_smem(bx, by)

            def body(m, _):
                bj_s = jnp.clip(bj0 + m, 0, hb - 1)
                bi_s = jnp.clip(w - SKEW * bj_s, 0, wb - 1)
                px_s = bi_s * mb
                py_s = bj_s * mb
                bx_s = sm_state[0, m]
                by_s = sm_state[1, m]
                lane0 = px_s + bx_s + (Y_L0 - 32)
                cl0 = (px_s >> 1) + (bx_s >> 1) + (C_L0 - 16)
                for ojx, oj in enumerate(offs_y):
                    row = py_s + by_s + oj + YP
                    ystr[pl.ds(ojx * py16 + 16 * m, 16)] = \
                        load_y16(row, lane0)
                    crow = (py_s >> 1) + ((by_s + oj) >> 1) + CP
                    ustr[pl.ds(ojx * pc8 + 8 * m, 8)] = \
                        load_c8(padu, crow, cl0)
                    vstr[pl.ds(ojx * pc8 + 8 * m, 8)] = \
                        load_c8(padv, crow, cl0)
                return 0

            jax.lax.fori_loop(0, p, body, 0)

        def pack(entries, nl, rows):
            """entries: (strip, src_lane) per nl-lane group -> packed."""
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

        def causal_ok_parts(dx, dy):
            cx = px_v + dx
            cy = py_v + dy
            causal = (cy <= py_v - mb) | (cx <= px_v - mb)
            bounds = (cx >= 0) & (cx <= aligned_w - mb) & \
                     (cy >= 0) & (cy <= aligned_h - mb)
            return causal, bounds, cy

        def causal_ok(dx, dy):
            causal, bounds, _ = causal_ok_parts(dx, dy)
            return causal & bounds & valid_v

        # ---------------- intra search: ring 0 + 4 refinement rings
        zero_p = jnp.zeros((p, 128), jnp.int32)
        bx = zero_p
        by = zero_p
        sad = jnp.broadcast_to(desc_ref[0, :, 0:1], (p, 128))
        mad = jnp.full((p, 128), INT32_MAX)
        ssd = jnp.full((p, 128), INT32_MAX)

        for ring_i, offs in enumerate([_RING0] + [_RINGS[s]
                                                  for s in (8, 4, 2, 1)]):
            s = [None, 8, 4, 2, 1][ring_i]
            offs_y = sorted({oj for _, oj in offs})
            build_strips(offs_y, bx, by)
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

            ebx, eby = bx, by     # FROZEN ring-entry base: candidate
            # positions never track mid-ring acceptances
            # (motion.cpp:354-418 captures best_x/best_y before the scan)
            for k, (oi, oj) in enumerate(offs):
                c_sad = col(sadw, 16 * k)
                my_k = col(madw, 16 * k)
                if parity:
                    mc_k = dyncol(madc, 8 * (2 * k + (ebx & 1)))
                else:
                    mc_k = col(madc, 8 * k)
                c_mad = jnp.maximum(my_k, mc_k)
                dx = ebx + oi
                dy = eby + oj
                c_ssd = dx * dx + dy * dy
                ok = causal_ok(dx, dy)
                acc = _accept(sad, mad, ssd, c_sad, c_mad, c_ssd, ok,
                              mad_thr)
                if (ring_i == 0 and
                        k == int(os.environ.get("CAIRO_WAVE_CANDDUMP",
                                                -1))):
                    _ca, _bo, _cy = causal_ok_parts(dx, dy)
                    rdump = (_ca.astype(jnp.int32), _bo.astype(jnp.int32),
                             _cy, ok.astype(jnp.int32))
                bx = jnp.where(acc, dx, bx)
                by = jnp.where(acc, dy, by)
                sad = jnp.where(acc, c_sad, sad)
                mad = jnp.where(acc, c_mad, mad)
                ssd = jnp.where(acc, c_ssd, ssd)
            if ring_i == int(os.environ.get("CAIRO_WAVE_RINGDUMP", -1)):
                rdump = (bx, by, sad, mad)

        # ---------------- sub-pel refinement (motion.cpp:277-352)
        build_strips((-1, 0, 1), bx, by)
        str_mid_y = ystr[py16:2 * py16]
        pb = pack([(str_mid_y, 32)] * 8, 16, py16)
        ent_t = []
        for di, dj in _SP_DIRS:
            ojx = dj + 1
            ent_t.append((ystr[ojx * py16:(ojx + 1) * py16], 32 + di))
        pt = pack(ent_t, 16, py16)
        half_y = _lerp_half(pb, pt)
        quart_y = _lerp_quarter(pb, pt)
        sad_h, mad_h = y_metrics(jnp.abs(half_y - src_rep))
        sad_q, mad_q = y_metrics(jnp.abs(quart_y - src_rep))

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
        half_u = _lerp_half(pbu, ptu)
        half_v = _lerp_half(pbv, ptv)
        quart_u = _lerp_quarter(pbu, ptu)
        quart_v = _lerp_quarter(pbv, ptv)
        madc_h = c_metrics(jnp.maximum(jnp.abs(half_u - u_rep),
                                       jnp.abs(half_v - v_rep)))
        madc_q = c_metrics(jnp.maximum(jnp.abs(quart_u - u_rep),
                                       jnp.abs(quart_v - v_rep)))

        sp_en = zero_p
        sp_am = zero_p
        sp_ix = zero_p
        for k, (di, dj) in enumerate(_SP_DIRS):
            ok = causal_ok(bx + di, by + dj)
            cidx = 8 * (2 * k + (bx & 1))
            for amount, sadw_, madw_, madc_ in (
                    (0, sad_h, mad_h, madc_h), (1, sad_q, mad_q, madc_q)):
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

        is_motion = ((bx != 0) | (by != 0) | (sp_en != 0)).astype(jnp.int32)
        is_copy = (mad < mad_thr).astype(jnp.int32)

        # ---------------- merge with dense inter (encode.cpp:36-54)
        if is_inter:
            dref = lambda k: jnp.broadcast_to(
                desc_ref[0, :, k:k + 1], (p, 128))
            i_sad = dref(1)
            i_copy = dref(2)
            i_motion = dref(3)
            i_target = dref(4)
            i_mx = dref(5)
            i_my = dref(6)
            i_sp = dref(7)
            take_on_copy = is_copy != i_copy
            take = jnp.where(take_on_copy != 0,
                             (i_copy != 0).astype(jnp.int32),
                             (i_sad < sad).astype(jnp.int32)) != 0
            is_intra = jnp.where(take, 0, 1)
            is_copy = jnp.where(take, i_copy, is_copy)
            is_motion = jnp.where(take, i_motion, is_motion)
            target = jnp.where(take, i_target, 0)
            mx = jnp.where(take, i_mx, bx)
            my = jnp.where(take, i_my, by)
            o_sp_en = jnp.where(take, i_sp & 1, sp_en)
            o_sp_am = jnp.where(take, (i_sp >> 1) & 1, sp_am)
            o_sp_ix = jnp.where(take, (i_sp >> 2) & 7, sp_ix)
        else:
            take = jnp.zeros((p, 128), bool)
            is_intra = jnp.ones((p, 128), jnp.int32)
            target = zero_p
            mx, my = bx, by
            o_sp_en, o_sp_am, o_sp_ix = sp_en, sp_am, sp_ix

        # ---------------- intra prediction from the sub-pel packs
        # (masked group-fold: no per-member re-loads)
        k_m = zero_p
        for k, (di, dj) in enumerate(_SP_DIRS):
            k_m = jnp.where(sp_ix == _sp_index(di, dj), k, k_m)
        k_rows = _expand_rows(k_m[:, 0:1], 16)          # (P*16, 1)
        li_y = _lane_iota((py16, 128))
        gmask_y = (li_y // 16) == k_rows

        def gfold(pk, mask, shifts):
            x = jnp.where(mask, pk, 0)
            for sh in shifts:
                x = x + pltpu.roll(x, 128 - sh, 1)
            return x

        h_y = gfold(half_y, gmask_y, (16, 32, 64))
        q_y = gfold(quart_y, gmask_y, (16, 32, 64))
        en_rows_y = _expand_rows(sp_en[:, 0:1], 16) != 0
        am_rows_y = _expand_rows(sp_am[:, 0:1], 16) != 0
        pred_y_i = jnp.where(en_rows_y,
                             jnp.where(am_rows_y, q_y, h_y), pb)[:, 0:16]

        g_m = 2 * k_m + (bx & 1)
        g_rows = _expand_rows(g_m[:, 0:1], 8)           # (P*8, 1)
        li_c = _lane_iota((pc8, 128))
        gmask_c = (li_c // 8) == g_rows
        h_u = gfold(half_u, gmask_c, (8, 16, 32, 64))
        q_u = gfold(quart_u, gmask_c, (8, 16, 32, 64))
        h_v = gfold(half_v, gmask_c, (8, 16, 32, 64))
        q_v = gfold(quart_v, gmask_c, (8, 16, 32, 64))
        en_rows_c = _expand_rows(sp_en[:, 0:1], 8) != 0
        am_rows_c = _expand_rows(sp_am[:, 0:1], 8) != 0
        pu_i = jnp.where(en_rows_c, jnp.where(am_rows_c, q_u, h_u),
                         pbu)[:, 0:8]
        pv_i = jnp.where(en_rows_c, jnp.where(am_rows_c, q_v, h_v),
                         pbv)[:, 0:8]
        pred_c_i = jnp.concatenate([pu_i, pv_i], axis=1)   # (P*8, 16)

        # ---------------- prediction select + encode + reconstruct
        intra_default = (is_intra != 0) & (is_motion == 0)
        take_y = _expand_rows(take.astype(jnp.int32)[:, 0:1], 16) != 0
        take_c = _expand_rows(take.astype(jnp.int32)[:, 0:1], 8) != 0
        id_y = _expand_rows(intra_default.astype(jnp.int32)[:, 0:1],
                            16) != 0
        id_c = _expand_rows(intra_default.astype(jnp.int32)[:, 0:1],
                            8) != 0
        pred_y = jnp.where(take_y, predy_ref[0].astype(jnp.int32),
                           pred_y_i)
        pred_y = jnp.where(id_y, 0, pred_y)
        pred_c = jnp.where(take_c, predc_ref[0].astype(jnp.int32),
                           pred_c_i)
        pred_c = jnp.where(id_c, 0, pred_c)
        res_y = _wrap16(ws_src_y - pred_y)
        res_c = _wrap16(csrc - pred_c)

        riy = _row_iota((py16, 16))
        liy = _lane_iota((py16, 16))
        ric = _row_iota((pc8, 16))
        lic = _lane_iota((pc8, 16))

        def fdct_lane(x):
            nl = x.shape[1]
            s_ = jnp.zeros_like(x)
            for d in range(-7, 8):
                pat = wlane_ref[d + 7:d + 8, :]
                s_ = s_ + pltpu.roll(x, (nl - d) % nl, 1) * pat
            dc = (_lane_iota(x.shape) % 8) == 0
            t = jnp.where(dc, _trunc_shift(s_ * 45, 7),
                          _trunc_shift(s_, 1))
            return _wrap16(_rdiv_shift(t, 7))

        def fdct_row(x, wr):
            nr = x.shape[0]
            s_ = jnp.zeros_like(x)
            for d in range(-7, 8):
                pat = wr[:, d + 7:d + 8]
                s_ = s_ + pltpu.roll(x, (nr - d) % nr, 0) * pat
            dc = (_row_iota(x.shape) % 8) == 0
            t = jnp.where(dc, _trunc_shift(s_ * 45, 7),
                          _trunc_shift(s_, 1))
            return _wrap16(_rdiv_shift(t, 7))

        def _seg_bcast(x, iota, group, axis):
            shift = 1
            out = x
            while shift < group:
                out = out + jnp.where((iota % group) >= shift,
                                      pltpu.roll(out, shift, axis), 0)
                shift *= 2
            return out

        def idct_row(x, wr):
            nr = x.shape[0]
            sov = jnp.where(x < 0, -(x & 1), x & 1)
            s_ = jnp.zeros_like(x)
            c_ = jnp.zeros_like(x)
            for d in range(-7, 8):
                vpat = wr[:, 16 + d + 7:16 + d + 8]
                spat = wr[:, 32 + d + 7:32 + d + 8]
                s_ = s_ + pltpu.roll(x, (nr - d) % nr, 0) * vpat
                c_ = c_ + pltpu.roll(sov, (nr - d) % nr, 0) * spat
            ri = _row_iota(x.shape)
            dcb = _seg_bcast(jnp.where((ri % 8) == 0, x, 0), ri, 8, 0)
            return _wrap16(_rdiv_shift(dcb * 45 + ((s_ + c_) >> 1), 7))

        def idct_lane(x):
            nl = x.shape[1]
            sov = jnp.where(x < 0, -(x & 1), x & 1)
            s_ = jnp.zeros_like(x)
            c_ = jnp.zeros_like(x)
            for d in range(-7, 8):
                vpat = wlane_ref[16 + d + 7:16 + d + 8, :]
                spat = wlane_ref[32 + d + 7:32 + d + 8, :]
                s_ = s_ + pltpu.roll(x, (nl - d) % nl, 1) * vpat
                c_ = c_ + pltpu.roll(sov, (nl - d) % nl, 1) * spat
            li = _lane_iota(x.shape)
            dcb = _seg_bcast(jnp.where((li % 8) == 0, x, 0), li, 8, 1)
            return _wrap16(_rdiv_shift(dcb * 45 + ((s_ + c_) >> 1), 7))

        ty = fdct_row(fdct_lane(res_y), wrow_ref)
        tc = fdct_row(fdct_lane(res_c), wrowc_ref)

        # ---- adaptive QP (quantize.cpp:60-77) over the transformed MB
        excl = ((riy % 16) == 0) & (liy == 0)
        vmask = (~excl) & (ty != 0)
        cnt = _tree(_tree(vmask.astype(jnp.int32), 16, 0, jnp.add),
                    16, 1, jnp.add)
        sm = _tree(_tree(jnp.where(vmask, ty, 0), 16, 0, jnp.add),
                   16, 1, jnp.add)
        ssq = _tree(_tree(jnp.where(vmask, ty * ty, 0), 16, 0, jnp.add),
                    16, 1, jnp.add)
        def leader_vals(x):
            lo = _seg_matmul(sel16, x & 0xFFFF)
            hi = _seg_matmul(sel16, (x >> 16) & 0xFFFF)
            v = lo + (hi << 16)
            return jnp.broadcast_to(v[:, 0:1], (p, 128))

        cnt_p = leader_vals(cnt)
        sm_p = leader_vals(sm)
        ssq_p = leader_vals(ssq)
        prod = sm_p * sm_p
        cnt1 = jnp.maximum(cnt_p, 1)
        div_in = prod + (cnt1 >> 1)
        q_ = _udiv(jnp.abs(div_in), cnt1, 1.0 / cnt1.astype(jnp.float32))
        tq = jnp.where(div_in < 0, -q_, q_)
        var_raw = jnp.where(cnt_p > 0, ssq_p - tq, 0)
        var = _wrap16(var_raw)

        hit16 = (var_raw < 0) | (var_raw >= 65536)
        u = jnp.where(hit16, (var_raw >> 16) & 0xFFFF, var_raw & 0xFFFF)
        lg = jnp.where(hit16, 16, 0)
        for sh in (8, 4, 2, 1):
            hit = u >= (1 << sh)
            lg = lg + jnp.where(hit, sh, 0)
            u = jnp.where(hit, u >> sh, u)
        index = jnp.clip(lg >> 1, 1, tables.MAX_QUANT_LEVELS - 1)
        qv = quality
        up = jnp.clip(qv + ((index - qv) >> 1), 1,
                      tables.MAX_QUANT_LEVELS - 1)
        dn = jnp.clip(qv - ((qv - index) >> 1), 1,
                      tables.MAX_QUANT_LEVELS - 1)
        qp = jnp.where(index > qv, up, jnp.where(index < qv, dn, qv))

        dcl = jnp.full((p, 128), 8)
        dcc = jnp.full((p, 128), 8)
        for k in range(1, 32):
            dcl = jnp.where(qp == k, dclut_ref[k], dcl)
            dcc = jnp.where(qp == k, dclut_ref[32 + k], dcc)

        # ---- quantize + dequantize + inverse transform
        def quant(t, qm_i, qmr_i, qm_e, qmr_e, qp_rows, dc_rows, dcpos,
                  id_rows):
            t16 = t * QSCALE
            qp2 = qp_rows << 1
            qp2_rec = 1.0 / qp2.astype(jnp.float32)
            dc_rec = 1.0 / dc_rows.astype(jnp.float32)
            qi_ = _wrap16(_rdiv_dyn(_rdiv_dyn(t16, qm_i, qmr_i), qp2,
                                    qp2_rec))
            dci = _wrap16(_rdiv_dyn(t, dc_rows, dc_rec))
            quant_i = jnp.where(dcpos, dci, qi_)
            qf = _wrap16(_rdiv_dyn(t16, qm_e, qmr_e))
            quant_e = _wrap16(_rdiv_dyn(qf - jnp.sign(qf) * qp_rows, qp2,
                                        qp2_rec))
            return jnp.where(id_rows, quant_i, quant_e)

        def dequant(qc_, qm_i, qm_e, qp_rows, dc_rows, dcpos, id_rows):
            deq_i = _wrap16(_trunc_shift(2 * qc_ * qm_i * qp_rows, 4))
            deq_i = jnp.where(dcpos, _wrap16(qc_ * dc_rows), deq_i)
            deq_e = _wrap16(_trunc_shift(2 * qc_ * qm_e * qp_rows, 4))
            return jnp.where(id_rows, deq_i, deq_e)

        qp_y = _expand_rows(qp[:, 0:1], 16)
        qp_c = _expand_rows(qp[:, 0:1], 8)
        dcl_y = _expand_rows(dcl[:, 0:1], 16)
        dcc_c = _expand_rows(dcc[:, 0:1], 8)
        dcpos_y = ((riy % 8) == 0) & ((liy % 8) == 0)
        dcpos_c = ((ric % 8) == 0) & ((lic % 8) == 0)

        qy = quant(ty, qmy_ref[:, 0:16], qmry_ref[:, 0:16],
                   qmy_ref[:, 16:32], qmry_ref[:, 16:32],
                   qp_y, dcl_y, dcpos_y, id_y)
        qc = quant(tc, qmc_ref[:, 0:16], qmrc_ref[:, 0:16],
                   qmc_ref[:, 16:32], qmrc_ref[:, 16:32],
                   qp_c, dcc_c, dcpos_c, id_c)
        deq_y = dequant(qy, qmy_ref[:, 0:16], qmy_ref[:, 16:32],
                        qp_y, dcl_y, dcpos_y, id_y)
        deq_c = dequant(qc, qmc_ref[:, 0:16], qmc_ref[:, 16:32],
                        qp_c, dcc_c, dcpos_c, id_c)
        rr_y = idct_lane(idct_row(deq_y, wrow_ref))
        rr_c = idct_lane(idct_row(deq_c, wrowc_ref))
        copy_y = _expand_rows(is_copy[:, 0:1], 16) != 0
        copy_c = _expand_rows(is_copy[:, 0:1], 8) != 0
        rec_y = jnp.where(copy_y, pred_y, _wrap16(rr_y + pred_y))
        rec_c = jnp.where(copy_c, pred_c, _wrap16(rr_c + pred_c))

        # ---- outputs + stash for the next step's flush
        @pl.when(w < n_waves)
        def _():
            desc_o[0, :, 0:1] = is_intra[:, 0:1]
            desc_o[0, :, 1:2] = is_motion[:, 0:1]
            desc_o[0, :, 2:3] = is_copy[:, 0:1]
            desc_o[0, :, 3:4] = target[:, 0:1]
            desc_o[0, :, 4:5] = mx[:, 0:1]
            desc_o[0, :, 5:6] = my[:, 0:1]
            desc_o[0, :, 6:7] = o_sp_en[:, 0:1]
            desc_o[0, :, 7:8] = o_sp_am[:, 0:1]
            desc_o[0, :, 8:9] = o_sp_ix[:, 0:1]
            desc_o[0, :, 9:10] = qp[:, 0:1]
            desc_o[0, :, 10:11] = var[:, 0:1]
            desc_o[0, :, 11:12] = valid_v.astype(jnp.int32)[:, 0:1]
            if os.environ.get("CAIRO_WAVE_DUMP") == "geom":
                desc_o[0, :, 12:13] = px_v[:, 0:1]
                desc_o[0, :, 13:14] = py_v[:, 0:1]
                desc_o[0, :, 14:15] = valid_v.astype(jnp.int32)[:, 0:1]
                desc_o[0, :, 15:16] = causal_ok(
                    zero_p + 16, zero_p - 16).astype(jnp.int32)[:, 0:1]
            elif os.environ.get("CAIRO_WAVE_CANDDUMP"):
                desc_o[0, :, 12:13] = rdump[0][:, 0:1]
                desc_o[0, :, 13:14] = rdump[1][:, 0:1]
                desc_o[0, :, 14:15] = rdump[2][:, 0:1]
                desc_o[0, :, 15:16] = rdump[3][:, 0:1]
            elif os.environ.get("CAIRO_WAVE_RINGDUMP"):
                desc_o[0, :, 12:13] = rdump[0][:, 0:1]
                desc_o[0, :, 13:14] = rdump[1][:, 0:1]
                desc_o[0, :, 14:15] = rdump[2][:, 0:1]
                desc_o[0, :, 15:16] = rdump[3][:, 0:1]
            else:
                desc_o[0, :, 12:16] = jnp.zeros((p, 4), jnp.int32)
            if os.environ.get("CAIRO_WAVE_DUMP") == "strip":
                coefy_o[0] = _wrap16(
                    pltpu.roll(ystr[py16:2 * py16], 96, 1)[:, 0:16]
                ).astype(jnp.int16)
                coefc_o[0] = qc.astype(jnp.int16)
            elif os.environ.get("CAIRO_WAVE_DUMP") == "slab":
                # re-load the subpel mid slab for each member from SMEM
                # state and dump its first 16 rows at the strip alignment
                for m in range(p):
                    bj_s = jnp.clip(bj0 + m, 0, hb - 1)
                    bi_s = jnp.clip(w - SKEW * bj_s, 0, wb - 1)
                    px_s = bi_s * mb
                    py_s = bj_s * mb
                    row = py_s + sm_state[1, m] + YP
                    lane0 = px_s + sm_state[0, m] + (Y_L0 - 32)
                    al = pl.multiple_of((row >> 3) << 3, 8)
                    tile = pl.multiple_of((lane0 >> 7) << 7, 128)
                    sl = pady[pl.ds(al, 24), pl.ds(tile, 256)]
                    sl = pltpu.roll(sl,
                                    (256 - (lane0 + 32 - tile)) % 256, 1)
                    coefy_o[0, 16 * m:16 * m + 16, :] =                         _wrap16(sl[0:16, 0:16]).astype(jnp.int16)
                coefc_o[0] = qc.astype(jnp.int16)
            elif os.environ.get("CAIRO_WAVE_DUMP") == "pb":
                coefy_o[0] = _wrap16(pb[:, 0:16]).astype(jnp.int16)
                coefc_o[0] = qc.astype(jnp.int16)
            elif os.environ.get("CAIRO_WAVE_DUMP") == "predyi":
                coefy_o[0] = _wrap16(pred_y_i).astype(jnp.int16)
                coefc_o[0] = qc.astype(jnp.int16)
            elif os.environ.get("CAIRO_WAVE_DUMP") == "pred":
                coefy_o[0] = _wrap16(pred_y).astype(jnp.int16)
                coefc_o[0] = _wrap16(pred_c).astype(jnp.int16)
            elif os.environ.get("CAIRO_WAVE_DUMP") == "ty":
                coefy_o[0] = ty.astype(jnp.int16)
                coefc_o[0] = tc.astype(jnp.int16)
            else:
                coefy_o[0] = qy.astype(jnp.int16)
                coefc_o[0] = qc.astype(jnp.int16)
            stash_y[...] = rec_y
            stash_c[...] = rec_c

        @pl.when(w < n_waves)
        def _():
            pltpu.semaphore_signal(ssem, 1)

        @pl.when(w == n_waves)
        def _():
            c0 = pltpu.make_async_copy(pady, pyout, sems.at[3])
            c1 = pltpu.make_async_copy(padu, puout, sems.at[4])
            c2 = pltpu.make_async_copy(padv, pvout, sems.at[5])
            c0.start(); c1.start(); c2.start()
            c0.wait(); c1.wait(); c2.wait()

    return kernel


# ------------------------------------------------------------ host wrapper

@functools.lru_cache(maxsize=None)
def _schedule_np(aligned_w: int, aligned_h: int):
    """Static wave-major member tables: (m_t, valid_t) each (n_waves, P)."""
    wb, hb, n_waves, p = geometry(aligned_w, aligned_h)
    m_t = np.zeros((n_waves, p), np.int32)
    valid_t = np.zeros((n_waves, p), bool)
    for w in range(n_waves):
        bj0 = max(0, -(-(w - wb + 1) // SKEW))
        for k in range(p):
            bj = bj0 + k
            bi = w - SKEW * bj
            if bj < hb and 0 <= bi < wb:
                m_t[w, k] = bj * wb + bi
                valid_t[w, k] = True
    return m_t, valid_t


def _to_wave_major(blocks, m_t):
    n_waves, p = m_t.shape
    return jnp.take(blocks, jnp.asarray(m_t).reshape(-1), axis=0) \
        .reshape(n_waves, p, blocks.shape[1], blocks.shape[2])


def wave_pass(src_blocks, self_sad_all, inter_best, inter_pred,
              cur_y, cur_u, cur_v, quality, *,
              aligned_w, aligned_h, is_inter):
    """Runs the full wave pass (search + encode + reconstruct) on device.

    Returns (rec_y, rec_u, rec_v, desc dict of (n,) int32 fields,
    (coef_y_blocks, coef_u_blocks, coef_v_blocks))."""
    wb, hb, n_waves, p = geometry(aligned_w, aligned_h)
    (ry, ly), (rc, lc) = plane_pads(aligned_w, aligned_h)
    m_t, valid_t = _schedule_np(aligned_w, aligned_h)
    n = wb * hb
    py16, pc8 = p * 16, p * 8

    # ---- prologue: wave-major packing
    y_wm = _to_wave_major(src_blocks[0], m_t)
    u_wm = _to_wave_major(src_blocks[1], m_t)
    v_wm = _to_wave_major(src_blocks[2], m_t)
    srcy = y_wm.reshape(n_waves, py16, 16).astype(jnp.int16)
    srcc = jnp.concatenate([u_wm, v_wm], axis=3) \
        .reshape(n_waves, pc8, 16).astype(jnp.int16)

    sehf = jnp.take(self_sad_all, jnp.asarray(m_t).reshape(-1)) \
        .reshape(n_waves, p)
    if is_inter:
        gi = lambda a: jnp.take(a, jnp.asarray(m_t).reshape(-1)) \
            .reshape(n_waves, p)
        sp_pack = (inter_best["sp_pred"].astype(jnp.int32)
                   | (inter_best["sp_amount"].astype(jnp.int32) << 1)
                   | (inter_best["sp_index"].astype(jnp.int32) << 2))
        desc_in = jnp.stack([
            sehf, gi(inter_best["sad"]),
            gi(inter_best["is_copy"].astype(jnp.int32)),
            gi(inter_best["is_motion"].astype(jnp.int32)),
            gi(inter_best["target"]), gi(inter_best["motion_x"]),
            gi(inter_best["motion_y"]), gi(sp_pack)], axis=2)
        predy = _to_wave_major(inter_pred[0], m_t) \
            .reshape(n_waves, py16, 16).astype(jnp.int16)
        predc = jnp.concatenate(
            [_to_wave_major(inter_pred[1], m_t),
             _to_wave_major(inter_pred[2], m_t)], axis=3) \
            .reshape(n_waves, pc8, 16).astype(jnp.int16)
    else:
        desc_in = jnp.stack([sehf] + [jnp.zeros_like(sehf)] * 7, axis=2)
        predy = srcy      # never selected on intra frames (take == 0)
        predc = srcc

    pady_in = jnp.pad(cur_y.astype(jnp.int32),
                      ((YP, ry - aligned_h - YP),
                       (Y_L0, ly - aligned_w - Y_L0)))
    padu_in = jnp.pad(cur_u.astype(jnp.int32),
                      ((CP, rc - aligned_h // 2 - CP),
                       (C_L0, lc - aligned_w // 2 - C_L0)))
    padv_in = jnp.pad(cur_v.astype(jnp.int32),
                      ((CP, rc - aligned_h // 2 - CP),
                       (C_L0, lc - aligned_w // 2 - C_L0)))

    mad_thr = (jnp.asarray(quality, jnp.int32) >> 2) + 1
    params = jnp.stack([jnp.asarray(quality, jnp.int32), mad_thr,
                        jnp.int32(0), jnp.int32(0)])

    consts = _consts(p)
    kern = _build_wave_kernel(aligned_w, aligned_h, p, wb, hb, n_waves,
                              is_inter)

    def _wix(w, *_):
        return (jnp.minimum(w, n_waves - 1), 0, 0)

    def _cix(w, *_):
        return (0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_waves + 1,),
        in_specs=[
            pl.BlockSpec((1, py16, 16), _wix, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, pc8, 16), _wix, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, py16, 16), _wix, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, pc8, 16), _wix, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p, 8), _wix, memory_space=pltpu.VMEM),
            pl.BlockSpec((py16, 48), _cix, memory_space=pltpu.VMEM),
            pl.BlockSpec((pc8, 48), _cix, memory_space=pltpu.VMEM),
            pl.BlockSpec((48, 16), _cix, memory_space=pltpu.VMEM),
            pl.BlockSpec((py16, 32), _cix, memory_space=pltpu.VMEM),
            pl.BlockSpec((py16, 32), _cix, memory_space=pltpu.VMEM),
            pl.BlockSpec((pc8, 32), _cix, memory_space=pltpu.VMEM),
            pl.BlockSpec((pc8, 32), _cix, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((p, 128), _cix, memory_space=pltpu.VMEM),
            pl.BlockSpec((p, py16), _cix, memory_space=pltpu.VMEM),
            pl.BlockSpec((p, py16), _cix, memory_space=pltpu.VMEM),
            pl.BlockSpec((p, pc8), _cix, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, p, 16), _wix, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, py16, 16), _wix, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, pc8, 16), _wix, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((ry, ly), jnp.int32),
            pltpu.VMEM((rc, lc), jnp.int32),
            pltpu.VMEM((rc, lc), jnp.int32),
            pltpu.VMEM((3 * py16, 128), jnp.int32),
            pltpu.VMEM((3 * pc8, 128), jnp.int32),
            pltpu.VMEM((3 * pc8, 128), jnp.int32),
            pltpu.VMEM((py16, 16), jnp.int32),
            pltpu.VMEM((pc8, 16), jnp.int32),
            pltpu.VMEM((py16, 128), jnp.int32),
            pltpu.VMEM((pc8, 128), jnp.int32),
            pltpu.VMEM((pc8, 128), jnp.int32),
            pltpu.SMEM((2, p), jnp.int32),
            pltpu.SemaphoreType.DMA((6,)),
            pltpu.SemaphoreType.DMA((3, p)),
            pltpu.SemaphoreType.REGULAR,
        ],
    )
    interp = os.environ.get("CAIRO_WAVE_INTERPRET") == "1"
    desc_o, coefy_o, coefc_o, pady_o, padu_o, padv_o = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        interpret=interp,
        out_shape=[
            jax.ShapeDtypeStruct((n_waves, p, 16), jnp.int32),
            jax.ShapeDtypeStruct((n_waves, py16, 16), jnp.int16),
            jax.ShapeDtypeStruct((n_waves, pc8, 16), jnp.int16),
            jax.ShapeDtypeStruct((ry, ly), jnp.int32),
            jax.ShapeDtypeStruct((rc, lc), jnp.int32),
            jax.ShapeDtypeStruct((rc, lc), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("arbitrary",)),
    )(params, srcy, srcc, predy, predc, desc_in,
      consts["wrow"], consts["wrowc"], consts["wlane"],
      consts["qm_y"], consts["qmr_y"], consts["qm_c"], consts["qmr_c"],
      consts["dclut"], consts["mi"], consts["ones16"], consts["sel16"],
      consts["sel8"], pady_in, padu_in, padv_in)

    # ---- epilogue: scatter wave-major outputs back to raster block order
    m_flat = jnp.asarray(m_t).reshape(-1)
    valid_flat = jnp.asarray(valid_t).reshape(-1)
    idx = jnp.where(valid_flat, m_flat, n)
    dv = desc_o.reshape(-1, 16)

    def scat(c):
        return jnp.zeros(n, jnp.int32).at[idx].set(dv[:, c], mode="drop")

    desc = dict(is_intra=scat(0), is_motion=scat(1), is_copy=scat(2),
                target=scat(3), motion_x=scat(4), motion_y=scat(5),
                sp_pred=scat(6), sp_amount=scat(7), sp_index=scat(8),
                q_index=scat(9), variance=scat(10),
                dbg_a=scat(12), dbg_b=scat(13), dbg_c=scat(14),
                dbg_d=scat(15))

    cfy = coefy_o.reshape(n_waves * p, 16, 16)
    cfc = coefc_o.reshape(n_waves * p, 8, 16)
    cy = jnp.zeros((n, 16, 16), jnp.int16).at[idx].set(cfy, mode="drop")
    cu = jnp.zeros((n, 8, 8), jnp.int16).at[idx].set(
        cfc[:, :, 0:8], mode="drop")
    cv = jnp.zeros((n, 8, 8), jnp.int16).at[idx].set(
        cfc[:, :, 8:16], mode="drop")

    rec_y = pady_o[YP:YP + aligned_h, Y_L0:Y_L0 + aligned_w]
    rec_u = padu_o[CP:CP + aligned_h // 2, C_L0:C_L0 + aligned_w // 2]
    rec_v = padv_o[CP:CP + aligned_h // 2, C_L0:C_L0 + aligned_w // 2]
    return rec_y, rec_u, rec_v, desc, (cy, cu, cv)
