"""Per-stage timing of the TPU pipeline on the real chip at 1080p.

Usage: python bench/profile_stages.py [stage ...]
Stages: encode decode motion pallas deblock windows gather entropy
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "src"))

import jax
import jax.numpy as jnp
import numpy as np

from cairo_tpu import tables
from cairo_tpu.tpu import engine, motion, ops

MB = tables.MACROBLOCK_SIZE


def timeit(fn, *args, n=5, warmup=2):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = jax.block_until_ready(fn(*args))
    return (time.perf_counter() - t0) / n * 1e3, out


def main():
    which = set(sys.argv[1:]) or {"encode", "decode", "motion", "pallas",
                                  "deblock", "windows", "gather"}
    W, H = 1920, 1088
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.integers(16, 236, (H, W)), jnp.int16)
    u = jnp.asarray(rng.integers(16, 240, (H // 2, W // 2)), jnp.int16)
    v = jnp.asarray(rng.integers(16, 240, (H // 2, W // 2)), jnp.int16)
    rgb = np.asarray(rng.integers(0, 255, (1080, 1920, 3)), np.uint8)
    hb, wb = H // MB, W // MB
    n = hb * wb
    px = jnp.asarray((np.arange(n) % wb) * MB, jnp.int32)
    py = jnp.asarray((np.arange(n) // wb) * MB, jnp.int32)

    if "windows" in which:
        f = jax.jit(lambda p: motion.pred_windows(p))
        ms, _ = timeit(f, (y.astype(jnp.int32), u.astype(jnp.int32),
                           v.astype(jnp.int32)))
        print(f"pred_windows:      {ms:8.2f} ms")

    if "motion" in which:
        src_planes = (y.astype(jnp.int32), u.astype(jnp.int32),
                      v.astype(jnp.int32))
        src = (ops.plane_to_blocks(src_planes[0], MB),
               ops.plane_to_blocks(src_planes[1], MB // 2),
               ops.plane_to_blocks(src_planes[2], MB // 2))
        wins = motion.pred_windows(src_planes)
        ref = tuple(jnp.roll(p, 3, axis=1) for p in src_planes)

        f = jax.jit(lambda s, sp, r, w: motion.inter_search(
            s, sp, r, w, px, py, 16))
        ms, _ = timeit(f, src, src_planes, ref, wins)
        print(f"inter_search(XLA): {ms:8.2f} ms  (x3 refs per frame)")

    if "pallas" in which:
        from cairo_tpu.tpu import pallas_motion
        ref = tuple(jnp.roll(p, 3, axis=1) for p in
                    (y.astype(jnp.int32), u.astype(jnp.int32),
                     v.astype(jnp.int32)))
        fc = jax.jit(lambda su, sv, ru, rv:
                     pallas_motion.chroma_max_maps(su, sv, ru, rv))
        try:
            ms, cmax = timeit(fc, u.astype(jnp.int32), v.astype(jnp.int32),
                              ref[1], ref[2])
            print(f"pallas chroma:     {ms:8.2f} ms")
        except Exception as e:
            print(f"pallas chroma FAILED: {type(e).__name__}: {e}")
            cmax = None
        if cmax is not None:
            fd = jax.jit(lambda sy, ry, cm: pallas_motion.dense_select(
                sy, jnp.pad(ry, ((0, 0), (16, 16))), cm, 0, W, H, 5))
            try:
                ms, _ = timeit(fd, y.astype(jnp.int32), ref[0], cmax)
                print(f"pallas dense:      {ms:8.2f} ms  (x3 refs per frame)")
            except Exception as e:
                print(f"pallas dense FAILED: {type(e).__name__}: {e}")

    if "deblock" in which:
        from cairo_tpu.tpu import deblock as deblock_mod
        cm = jnp.zeros((hb, wb), bool)
        qm = jnp.full((hb, wb), 16, jnp.int32)
        f = jax.jit(lambda a, b, c: deblock_mod.deblock_frame(
            a.astype(jnp.int32), b.astype(jnp.int32), c.astype(jnp.int32),
            cm, qm))
        ms, _ = timeit(f, y, u, v)
        print(f"deblock_frame:     {ms:8.2f} ms")

    if "gather" in which:
        state = engine.init_state(W, H)
        tgt = jnp.ones(n, jnp.int32)
        mx = jnp.asarray(rng.integers(-16, 17, n), jnp.int32)
        my = jnp.asarray(rng.integers(-16, 17, n), jnp.int32)
        spp = jnp.zeros(n, bool)
        f = jax.jit(lambda s, t, a, b: engine._gather_pred(
            s, 5, t, a, b, spp, spp, jnp.zeros(n, jnp.int32)))
        ms, _ = timeit(f, state, tgt, mx, my)
        print(f"_gather_pred:      {ms:8.2f} ms")

    if "encode" in which:
        state = engine.init_state(1920, H)
        f = lambda r, s, i: engine.encode_step(
            r, s, i, 16, width=1920, height=1080, aligned_w=1920,
            aligned_h=H, is_inter=True)
        ms, _ = timeit(f, rgb, state, 5)
        print(f"encode_step:       {ms:8.2f} ms")

    if "decode" in which:
        state = engine.init_state(1920, H)
        n2 = (1920 // MB) * (H // MB)
        table = dict(
            block_type=jnp.full(n2, 2, jnp.uint8),
            prediction_target=jnp.ones(n2, jnp.uint8),
            motion_x=jnp.asarray(rng.integers(-16, 17, n2), jnp.int16),
            motion_y=jnp.asarray(rng.integers(-16, 17, n2), jnp.int16),
            sp_pred=jnp.zeros(n2, bool), sp_amount=jnp.zeros(n2, bool),
            sp_index=jnp.zeros(n2, jnp.uint8),
            q_index=jnp.full(n2, 16, jnp.uint8))
        coef = dict(coef_y=jnp.asarray(rng.integers(-5, 6, (H, 1920)), jnp.int16),
                    coef_u=jnp.asarray(rng.integers(-5, 6, (H // 2, 960)), jnp.int16),
                    coef_v=jnp.asarray(rng.integers(-5, 6, (H // 2, 960)), jnp.int16))
        f = lambda t, c, s, i: engine.decode_step(
            t, c, s, i, width=1920, height=1080, aligned_w=1920, aligned_h=H)
        ms, _ = timeit(f, table, coef, state, 5)
        print(f"decode_step:       {ms:8.2f} ms")


if __name__ == "__main__":
    main()
