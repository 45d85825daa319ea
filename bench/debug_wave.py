"""Stage-bisect driver for the Mosaic wave kernel.

CAIRO_WAVE_STAGE=N python bench/debug_wave.py  — compile+run one frame at
128x96 and print a digest; used to localize Mosaic compiler crashes.
"""

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
    from cairo_tpu.tpu import backend as backend_mod
    from cairo_tpu.tpu import wavefront, wire
    backend_mod.use_pallas = lambda: True

    aw = ah = None
    W, H = 128, 96
    aw, ah = W, H
    rng = np.random.default_rng(7)
    buf = rng.integers(0, 255, 8 + wire.yuv8_nbytes(ah, aw),
                       np.uint8).astype(np.uint8)
    buf[:8] = np.array([0, 16], np.int32).view(np.uint8)
    state = wavefront.init_state(aw, ah)
    raw = wavefront.conformance_encode_step.__wrapped__
    is_inter = os.environ.get("CAIRO_WAVE_INTER", "0") == "1"
    f = jax.jit(functools.partial(
        raw, aligned_w=aw, aligned_h=ah, frame_w=W, frame_h=H,
        is_inter=is_inter))
    state, out = f(buf, state)
    out = jax.device_get(out)
    print("stage", os.environ.get("CAIRO_WAVE_STAGE", "99"), "OK;",
          "bt sum", int(np.sum(out["block_type"].astype(np.int64))),
          "coef sum", int(np.sum(np.abs(out["coef_y"].astype(np.int64)))))


if __name__ == "__main__":
    main()
