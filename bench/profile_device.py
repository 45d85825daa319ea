"""Pure device-compute timing of encode_step / decode_step at 1080p
(inputs pre-placed on device; no host transfer in the timed region)."""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "src"))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from cairo_tpu.tpu import engine

    width, height = 1920, 1080
    aw, ah = 1920, 1088
    n = (aw // 16) * (ah // 16)
    rng = np.random.default_rng(0)

    from cairo_tpu.tpu import wire
    buf = rng.integers(0, 255, 8 + wire.yuv8_nbytes(ah, aw),
                       np.uint8).astype(np.uint8)
    buf[:8] = np.array([1, 16], np.int32).view(np.uint8)
    src = jax.device_put(buf)
    state = engine.init_state(aw, ah)
    state = jax.tree.map(lambda x: x + 0, state)  # materialize
    jax.block_until_ready(state)

    for is_inter in (False, True):
        t0 = time.perf_counter()
        new_state, out = engine.encode_step(
            src, state, aligned_w=aw, aligned_h=ah, frame_w=width,
            frame_h=height, is_inter=is_inter)
        jax.block_until_ready(out)
        t1 = time.perf_counter()
        reps = 5
        t0 = time.perf_counter()
        for i in range(reps):
            new_state, out = engine.encode_step(
                src, new_state, aligned_w=aw, aligned_h=ah, frame_w=width,
                frame_h=height, is_inter=is_inter)
        jax.block_until_ready(out)
        t1 = time.perf_counter()
        print(f"encode_step is_inter={is_inter}: {(t1-t0)/reps*1e3:.1f} ms")

    table = dict(
        block_type=jnp.zeros(n, jnp.uint8),
        prediction_target=jnp.ones(n, jnp.uint8),
        motion_x=jnp.zeros(n, jnp.int16), motion_y=jnp.zeros(n, jnp.int16),
        sp_pred=jnp.zeros(n, bool), sp_amount=jnp.zeros(n, bool),
        sp_index=jnp.zeros(n, jnp.uint8), q_index=jnp.full(n, 16, jnp.uint8))
    coef = dict(coef_y=jnp.zeros((ah, aw), jnp.int16),
                coef_u=jnp.zeros((ah // 2, aw // 2), jnp.int16),
                coef_v=jnp.zeros((ah // 2, aw // 2), jnp.int16))
    table = jax.tree.map(jnp.asarray, table)
    jax.block_until_ready((table, coef))

    st, rgb_out = engine.decode_step(table, coef, state, 1, width=width,
                                     height=height, aligned_w=aw, aligned_h=ah)
    jax.block_until_ready(rgb_out)
    reps = 5
    t0 = time.perf_counter()
    for i in range(reps):
        st, rgb_out = engine.decode_step(table, coef, st, 1 + i, width=width,
                                         height=height, aligned_w=aw,
                                         aligned_h=ah)
    jax.block_until_ready(rgb_out)
    t1 = time.perf_counter()
    print(f"decode_step: {(t1-t0)/reps*1e3:.1f} ms")


if __name__ == "__main__":
    main()
