"""Numpy twin of the Mosaic wave kernel's search/pred algorithm.

Replays the kernel's exact dataflow (strips, candidate packs, tree
reductions, (P,)-vector folds, pred extraction) in numpy against the
cpuref raster encoder, reporting the first divergence per block and ring.
Run on CPU; no TPU needed.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "src"))
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np

INT32_MAX = np.int32(0x7FFFFFFF)
SAD_THRESHOLD = 8192
MB = 16
YP, CP = 48, 24

RING0 = [(i, j) for j in (-32, -16, 0) for i in (-16, 0, 16)
         if (i, j) != (0, 0)]
RINGS = {s: [(i, j) for j in (-s, 0, s) for i in (-s, 0, s)
             if (i, j) != (0, 0)] for s in (8, 4, 2, 1)}
SP_DIRS = [(-1, -1), (0, -1), (1, -1), (-1, 0),
           (1, 0), (-1, 1), (0, 1), (1, 1)]


def lerp_half(a, b):
    t = a + b
    t = t + np.where(t < 0, -1, 1)
    q = np.abs(t) // 2
    return np.where(t < 0, -q, q)


def lerp_quarter(a, b):
    t = 3 * a + b
    t = t + np.where(t < 0, -2, 2)
    q = np.abs(t) // 4
    w = np.where(t < 0, -q, q)
    return ((w + 0x8000) & 0xFFFF) - 0x8000


class Twin:
    """One block's intra search, replayed with the KERNEL's index math:
    strip rows/lanes, chroma parity tables, (skip-center) candidate packs,
    and the sequential fold."""

    def __init__(self, pady, padu, padv, src_y, src_u, src_v, px, py,
                 quality, aligned_w, aligned_h, log=None):
        # pads carry YP/CP margins like the kernel's VMEM planes
        self.pady, self.padu, self.padv = pady, padu, padv
        self.sy, self.su, self.sv = src_y, src_u, src_v
        self.px, self.py = px, py
        self.aw, self.ah = aligned_w, aligned_h
        self.mad_thr = (quality >> 2) + 1
        self.log = log if log is not None else []

    def y_strip(self, bx, by, oj):
        """Kernel strip: 16 rows at window y = by+oj, lanes x in
        [bx-32, bx+96) member-relative (we keep 128 lanes)."""
        r = self.py + by + oj + YP
        l0 = self.px + bx + (YP + 128 - 32) - 128   # lane math sans XTRA
        # pads here carry 64-margins; l0 relative: x = px+bx-32 -> index
        return self.pady[r:r + 16, self.px + bx - 32 + 64:
                         self.px + bx - 32 + 64 + 128]

    def c_strip(self, plane, bx, by, oj):
        cr = (self.py >> 1) + ((by + oj) >> 1) + CP
        c0 = (self.px >> 1) + (bx >> 1) - 16 + 32
        return plane[cr:cr + 8, c0:c0 + 128]

    def coff(self, bx, oi, s):
        if s == 1:
            v = bx & 1
            if v == 0:
                return -1 if oi < 0 else 0
            return 1 if oi > 0 else 0
        return oi >> 1 if oi >= 0 else -((-oi) >> 1)

    def causal(self, dx, dy):
        cx, cy = self.px + dx, self.py + dy
        c = (cy <= self.py - MB) or (cx <= self.px - MB)
        b = 0 <= cx <= self.aw - MB and 0 <= cy <= self.ah - MB
        return c and b

    def metrics(self, bx, by, oi, oj, s):
        ys = self.y_strip(bx, by, oj)
        cand = ys[:, 32 + oi:48 + oi].astype(np.int64)
        sad = int(np.abs(self.sy - cand).sum())
        mad = int(np.abs(self.sy - cand).max())
        co = self.coff(bx, oi, s)
        us = self.c_strip(self.padu, bx, by, oj)
        vs = self.c_strip(self.padv, bx, by, oj)
        cu = us[:, 16 + co:24 + co].astype(np.int64)
        cv = vs[:, 16 + co:24 + co].astype(np.int64)
        mad = max(mad, int(np.abs(self.su - cu).max()),
                  int(np.abs(self.sv - cv).max()))
        return sad, mad

    def search(self):
        bx = by = 0
        sad = int(np.abs(self.sy).sum())
        mad = ssd = int(INT32_MAX)
        for ring_i, offs in enumerate([RING0] + [RINGS[s]
                                                 for s in (8, 4, 2, 1)]):
            s = [None, 8, 4, 2, 1][ring_i]
            ebx, eby = bx, by
            for (oi, oj) in offs:
                dx, dy = ebx + oi, eby + oj
                ok = self.causal(dx, dy)
                if not ok:
                    continue
                c_sad, c_mad = self.metrics(ebx, eby, oi, oj,
                                            s if s else 16)
                c_ssd = dx * dx + dy * dy
                if mad < self.mad_thr:
                    acc = (c_mad < mad) or (c_mad == mad and c_ssd < ssd)
                else:
                    acc = (c_sad < sad
                           or ((c_sad == sad and c_ssd < ssd)
                               and c_sad < SAD_THRESHOLD)
                           or c_mad < self.mad_thr)
                if acc:
                    bx, by, sad, mad, ssd = dx, dy, c_sad, c_mad, c_ssd
            self.log.append(("ring", ring_i, bx, by, sad, mad, ssd))

        # sub-pel: strips at final base, dirs from SP_DIRS
        sp_en = sp_am = 0
        sp_ix = 0
        ys0 = self.y_strip(bx, by, 0)
        b_y = ys0[:, 32:48].astype(np.int64)
        us0 = self.c_strip(self.padu, bx, by, 0)
        vs0 = self.c_strip(self.padv, bx, by, 0)
        b_u = us0[:, 16:24].astype(np.int64)
        b_v = vs0[:, 16:24].astype(np.int64)
        for k, (di, dj) in enumerate(SP_DIRS):
            ok = self.causal(bx + di, by + dj)
            ysd = self.y_strip(bx, by, dj)
            t_y = ysd[:, 32 + di:48 + di].astype(np.int64)
            co = self.coff(bx, di, 1)
            usd = self.c_strip(self.padu, bx, by, dj)
            vsd = self.c_strip(self.padv, bx, by, dj)
            t_u = usd[:, 16 + co:24 + co].astype(np.int64)
            t_v = vsd[:, 16 + co:24 + co].astype(np.int64)
            for amount, fn in ((0, lerp_half), (1, lerp_quarter)):
                cy_ = fn(b_y, t_y)
                c_sad = int(np.abs(self.sy - cy_).sum())
                c_mad = max(int(np.abs(self.sy - cy_).max()),
                            int(np.abs(self.su - fn(b_u, t_u)).max()),
                            int(np.abs(self.sv - fn(b_v, t_v)).max()))
                if mad < self.mad_thr:
                    acc = c_mad < mad
                else:
                    acc = ((c_sad < sad and c_sad < SAD_THRESHOLD)
                           or c_mad < self.mad_thr)
                if ok and acc:
                    sp_en, sp_am = 1, amount
                    from cairo_tpu.blocktypes import sp_dir_to_index
                    sp_ix = sp_dir_to_index(di, dj)
                    sad, mad = c_sad, c_mad
        self.log.append(("subpel", sp_en, sp_am, sp_ix, sad, mad))
        return dict(bx=bx, by=by, sad=sad, mad=mad, ssd=ssd,
                    sp_en=sp_en, sp_am=sp_am, sp_ix=sp_ix)


def main():
    import jax
    from cairo_tpu.cpuref import engine as cpe
    from cairo_tpu.cpuref import motion as cmot
    from cairo_tpu.tpu import wire

    aw, ah = 128, 96
    quality = 16
    rng = np.random.default_rng(7)
    buf = rng.integers(0, 255, 8 + wire.yuv8_nbytes(ah, aw),
                       np.uint8).astype(np.uint8)
    buf[:8] = np.array([0, quality], np.int32).view(np.uint8)
    y, u, v = [np.asarray(t) for t in jax.device_get(
        wire.unpack_yuv8(buf[8:], ah, aw, aw, ah))]

    ctx = cpe.CodecContext(aw, ah)
    ctx.input.y[:] = y.astype(np.int16)
    ctx.input.u[:] = u.astype(np.int16)
    ctx.input.v[:] = v.astype(np.int16)

    wb = aw // MB
    nbad = 0
    # raster replay: per block, compare twin search vs cpuref selection,
    # on the CURRENT cpuref recon (authoritative mid-frame state)
    for j in range(0, ah, MB):
        for i in range(0, aw, MB):
            slot = ctx.ring_slot(0, 0)
            rp = ctx.recon[slot]
            pady = np.zeros((ah + 2 * YP + 16, aw + 2 * 64), np.int64)
            pady[YP:YP + ah, 64:64 + aw] = np.asarray(rp.y, np.int64)
            padu = np.zeros((ah // 2 + 2 * CP + 8, aw // 2 + 2 * 32),
                            np.int64)
            padu[CP:CP + ah // 2, 32:32 + aw // 2] = \
                np.asarray(rp.u, np.int64)
            padv = np.zeros_like(padu)
            padv[CP:CP + ah // 2, 32:32 + aw // 2] = \
                np.asarray(rp.v, np.int64)
            sy, su, sv = [np.asarray(t, np.int64)
                          for t in ctx.input.block(i, j)]
            tw = Twin(pady, padu, padv, sy, su, sv, i, j, quality, aw, ah)
            got = tw.search()

            sad_ref, desc = cpe.classify_block(ctx, 0, 0, quality, i, j)
            want = dict(bx=int(desc["motion_x"]), by=int(desc["motion_y"]),
                        sp_en=int(bool(desc["sp_pred"])),
                        sp_am=int(bool(desc["sp_amount"])),
                        sp_ix=int(desc["sp_index"]))
            bad = {k: (got[k], want[k]) for k in want if got[k] != want[k]}
            if bad:
                nbad += 1
                print(f"block ({i//16},{j//16}): {bad}")
                print("  twin log:", tw.log[-3:])
                if nbad > 6:
                    return
            cpe.encode_block(ctx, 0, 0, quality, desc, i, j)
            cpe.decode_block(ctx, ctx.output, 0, desc, i, j)
    print("twin search vs cpuref: all blocks match" if nbad == 0
          else f"{nbad} mismatches")


if __name__ == "__main__":
    main()
