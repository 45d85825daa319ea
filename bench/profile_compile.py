"""Times XLA compilation of pipeline pieces (default: local CPU backend,
no tunnel) to find graph-size hotspots. Usage:
  JAX_PLATFORMS=cpu python bench/profile_compile.py [piece ...]
pieces: encode decode search subpel deblock windows
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "src"))

import jax

if os.environ.get("JAX_PLATFORMS", "") == "cpu":
    jax.config.update("jax_platforms", "cpu")  # the axon plugin ignores env
import jax.numpy as jnp
import numpy as np


def t(name, build):
    t0 = time.perf_counter()
    lowered = build()
    t1 = time.perf_counter()
    compiled = lowered.compile()
    t2 = time.perf_counter()
    print(f"{name:12s}: trace+lower {t1-t0:6.1f}s  compile {t2-t1:6.1f}s")
    return compiled


def main():
    from cairo_tpu.tpu import deblock as deblock_mod
    from cairo_tpu.tpu import engine, motion, ops

    width, height = 1920, 1080
    aw, ah = 1920, 1088
    n = (aw // 16) * (ah // 16)
    pieces = sys.argv[1:] or ["search", "subpel", "deblock", "decode",
                              "encode"]

    from cairo_tpu.tpu import wire as wire_mod

    state = jax.eval_shape(lambda: engine.init_state(aw, ah))
    src = jax.ShapeDtypeStruct((8 + wire_mod.yuv8_nbytes(ah, aw),),
                               jnp.uint8)

    if "encode" in pieces:
        t("encode", lambda: jax.jit(
            engine.encode_step.__wrapped__,
            static_argnames=("aligned_w", "aligned_h", "frame_w", "frame_h",
                             "is_inter")).lower(
            src, state, aligned_w=aw, aligned_h=ah, frame_w=width,
            frame_h=height, is_inter=True))

    if "decode" in pieces:
        table = dict(
            block_type=jax.ShapeDtypeStruct((n,), jnp.uint8),
            prediction_target=jax.ShapeDtypeStruct((n,), jnp.uint8),
            motion_x=jax.ShapeDtypeStruct((n,), jnp.int16),
            motion_y=jax.ShapeDtypeStruct((n,), jnp.int16),
            sp_pred=jax.ShapeDtypeStruct((n,), jnp.bool_),
            sp_amount=jax.ShapeDtypeStruct((n,), jnp.bool_),
            sp_index=jax.ShapeDtypeStruct((n,), jnp.uint8),
            q_index=jax.ShapeDtypeStruct((n,), jnp.uint8))
        coef = dict(coef_y=jax.ShapeDtypeStruct((ah, aw), jnp.int16),
                    coef_u=jax.ShapeDtypeStruct((ah // 2, aw // 2), jnp.int16),
                    coef_v=jax.ShapeDtypeStruct((ah // 2, aw // 2), jnp.int16))
        t("decode", lambda: jax.jit(
            engine.decode_step.__wrapped__,
            static_argnames=("width", "height", "aligned_w", "aligned_h"))
          .lower(table, coef, state, 1, width=width, height=height,
                 aligned_w=aw, aligned_h=ah))

    yb = jax.ShapeDtypeStruct((n, 16, 16), jnp.int32)
    cb = jax.ShapeDtypeStruct((n, 8, 8), jnp.int32)
    yp = jax.ShapeDtypeStruct((ah, aw), jnp.int32)
    cp = jax.ShapeDtypeStruct((ah // 2, aw // 2), jnp.int32)
    y16 = jax.ShapeDtypeStruct((ah, aw), jnp.int16)
    c16 = jax.ShapeDtypeStruct((ah // 2, aw // 2), jnp.int16)
    px = jax.ShapeDtypeStruct((n,), jnp.int32)
    ysz = 16 + 2 * motion.Y_WPAD
    csz = 8 + 2 * motion.C_WPAD
    wy = jax.ShapeDtypeStruct((n, ysz, ysz), jnp.int16)
    wu = jax.ShapeDtypeStruct((n, csz, csz), jnp.int16)

    if "search" in pieces:
        t("search", lambda: jax.jit(
            lambda s, sp, r, w, px_, py_: motion.inter_search(
                s, sp, r, w, px_, py_, 16)).lower(
            (yb, cb, cb), (yp, cp, cp), (yp, cp, cp), (wy, wu, wu), px, px))

    if "deblock" in pieces:
        cm = jax.ShapeDtypeStruct((ah // 16, aw // 16), jnp.bool_)
        qm = jax.ShapeDtypeStruct((ah // 16, aw // 16), jnp.int32)
        t("deblock", lambda: jax.jit(deblock_mod.deblock_frame).lower(
            yp, cp, cp, cm, qm))

    if "windows" in pieces:
        t("windows", lambda: jax.jit(
            lambda a, b, c: motion.pred_windows((a, b, c))).lower(
            yp, cp, cp))


if __name__ == "__main__":
    main()
