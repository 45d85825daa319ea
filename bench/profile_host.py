"""Breaks TpuEncoder.encode / TpuDecoder.decode into host-visible stages."""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "src"))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax
import numpy as np


def synth(width, height, n, seed=7):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:height, 0:width]
    bg = (128 + 80 * np.sin(xx * 0.05) * np.cos(yy * 0.07)).astype(np.int16)
    frames = []
    for t in range(n):
        f = np.roll(bg, t * 3, axis=1).copy()
        for s in range(6):
            sx = int((s * 137 + t * (5 + s)) % (width - 40))
            sy = int((s * 83 + t * (3 + s)) % (height - 40))
            f[sy:sy + 40, sx:sx + 40] = 30 + 30 * s
        f = f + rng.integers(-4, 5, f.shape)
        luma = np.clip(f, 0, 255).astype(np.uint8)
        frames.append(np.ascontiguousarray(
            np.stack([luma, np.roll(luma, 1, axis=0), 255 - luma], axis=-1)))
    return frames


def main():
    from cairo_tpu import native
    from cairo_tpu.blocktypes import BlockTable, INTRA_BIT, MOTION_BIT
    from cairo_tpu.cpuref.api import FRAME_DESC_SIZE, HEADER_SIZE, _FRAME_FMT
    from cairo_tpu.tpu.api import TpuDecoder, TpuEncoder
    import struct

    frames = synth(1920, 1080, 8)
    enc = TpuEncoder()
    enc.set_quality(16)
    chunks = [enc.encode(f) for f in frames]
    for c, st in zip(chunks, [enc.last_stats]):
        pass
    print("encode stats (last frame):", enc.last_stats["stage_ms"])
    print("chunk sizes:", [len(c) for c in chunks])

    # decode, timed per stage
    dec = TpuDecoder()
    dec.decode(chunks[0])  # init + compile
    dec2 = TpuDecoder()
    t_parse = t_step = t_get = t_other = 0.0
    n = 0
    for c in chunks:
        offset = 0
        t0 = time.perf_counter()
        if dec2._state is None:
            from cairo_tpu.cpuref.api import parse_header
            w, h = parse_header(c[:HEADER_SIZE])
            dec2._init(w, h)
            offset = HEADER_SIZE
        ftype, index, quality = struct.unpack(
            _FRAME_FMT, c[offset:offset + FRAME_DESC_SIZE])
        offset += FRAME_DESC_SIZE
        t1 = time.perf_counter()
        native.decode_slice(c, offset * 8, dec2._bt, dec2._coef_y,
                            dec2._coef_u, dec2._coef_v)
        t2 = time.perf_counter()
        table = dict(
            block_type=dec2._bt.block_type,
            prediction_target=dec2._bt.prediction_target,
            motion_x=dec2._bt.motion_x, motion_y=dec2._bt.motion_y,
            sp_pred=dec2._bt.sp_pred, sp_amount=dec2._bt.sp_amount,
            sp_index=dec2._bt.sp_index, q_index=dec2._bt.q_index)
        coef = dict(coef_y=dec2._coef_y, coef_u=dec2._coef_u,
                    coef_v=dec2._coef_v)
        from cairo_tpu.tpu import engine
        t3 = time.perf_counter()
        dec2._state, rgb = engine.decode_step(
            table, coef, dec2._state, index, width=dec2.width,
            height=dec2.height, aligned_w=dec2._aw, aligned_h=dec2._ah)
        rgb = np.asarray(jax.device_get(rgb))
        t4 = time.perf_counter()
        dec2.frame_index += 1
        t_other += (t1 - t0) + (t3 - t2)
        t_parse += t2 - t1
        t_step += 0
        t_get += t4 - t3
        n += 1
    print(f"decode per frame: entropy={t_parse/n*1e3:.1f}ms "
          f"device+get={t_get/n*1e3:.1f}ms other={t_other/n*1e3:.1f}ms")


if __name__ == "__main__":
    main()
