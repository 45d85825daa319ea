"""Compare the Mosaic wave kernel's per-block predictions (stage-8 dump)
and desc against the cpuref raster encoder on the same frame."""

import functools
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   "..", ".jax_cache"))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "src"))

import jax
import numpy as np


def main():
    from cairo_tpu.cpuref import engine as cpe
    from cairo_tpu.tpu import backend as backend_mod
    from cairo_tpu.tpu import wavefront, wire
    backend_mod.use_pallas = lambda: True
    aw, ah = 128, 96
    quality = 16
    rng = np.random.default_rng(7)
    buf = rng.integers(0, 255, 8 + wire.yuv8_nbytes(ah, aw),
                       np.uint8).astype(np.uint8)
    buf[:8] = np.array([0, quality], np.int32).view(np.uint8)
    y, u, v = [np.asarray(t) for t in jax.device_get(
        wire.unpack_yuv8(buf[8:], ah, aw, aw, ah))]

    # --- cpuref raster encode with per-block pred recording
    ctx = cpe.CodecContext(aw, ah)
    ctx.input.y[:] = y.astype(np.int16)
    ctx.input.u[:] = u.astype(np.int16)
    ctx.input.v[:] = v.astype(np.int16)
    preds = {}
    descs = {}
    orig_encode = cpe.encode_block

    def rec_encode(ctx2, ft, fi, q, desc, i, j):
        idx = (j // 16) * (aw // 16) + (i // 16)
        descs[idx] = dict(desc)
        bt = desc["block_type"]
        from cairo_tpu.blocktypes import INTRA_DEFAULT, is_copy
        if bt == INTRA_DEFAULT:
            preds[idx] = None
        else:
            preds[idx] = cpe._prediction_block(ctx2, fi, desc, i, j)
        return orig_encode(ctx2, ft, fi, q, desc, i, j)

    cpe.encode_block = rec_encode
    try:
        cpe.encode_slice(ctx, 0, 0, quality)
    finally:
        cpe.encode_block = orig_encode

    # --- pallas stage-8 pred dump
    os.environ["CAIRO_WAVE_DUMP"] = "pred"
    raw = wavefront.conformance_encode_step.__wrapped__
    state = wavefront.init_state(aw, ah)
    f = jax.jit(functools.partial(
        raw, aligned_w=aw, aligned_h=ah, frame_w=aw, frame_h=ah,
        is_inter=False))
    state, out = f(buf, state)
    out = jax.device_get(out)
    # stage 8: coef planes carry pred blocks
    cy = np.asarray(out["coef_y"])
    cu = np.asarray(out["coef_u"])
    cv = np.asarray(out["coef_v"])

    wb = aw // 16
    nbad = 0
    for idx in sorted(descs):
        i, j = (idx % wb) * 16, (idx // wb) * 16
        d = descs[idx]
        # desc comparison
        for fk, ok in (("block_type", "block_type"), ("motion_x", "motion_x"),
                       ("motion_y", "motion_y"), ("sp_index", "sp_index"),
                       ("q_index", "q_index")):
            got = int(np.asarray(out[ok])[idx]) if ok in out else None
            want = int(d.get(fk, -999))
            if fk in ("q_index",) and "q_index" not in d:
                continue
            if got != want:
                print(f"blk {idx} ({i//16},{j//16}) desc {fk}: "
                      f"cpuref {want} pallas {got}")
                nbad += 1
        p = preds[idx]
        if p is None:
            continue
        gy = cy[j:j+16, i:i+16]
        gu = cu[j//2:j//2+8, i//2:i//2+8]
        gv = cv[j//2:j//2+8, i//2:i//2+8]
        for nm, a, b in (("Y", p[0], gy), ("U", p[1], gu), ("V", p[2], gv)):
            if not np.array_equal(np.asarray(a, np.int32), b.astype(np.int32)):
                dd = np.nonzero(np.asarray(a, np.int32) != b.astype(np.int32))
                print(f"blk {idx} ({i//16},{j//16}) pred {nm}: "
                      f"{dd[0].size} diffs, first at {dd[0][0]},{dd[1][0]}: "
                      f"cpuref {np.asarray(a)[dd[0][0], dd[1][0]]} "
                      f"pallas {b[dd[0][0], dd[1][0]]}  "
                      f"(mv {d['motion_x']},{d['motion_y']} sp "
                      f"{d['sp_pred']}/{d['sp_amount']}/{d['sp_index']} "
                      f"bt {d['block_type']})")
                nbad += 1
        if nbad > 12:
            break
    print("done, nbad =", nbad)


if __name__ == "__main__":
    main()
