"""Field-by-field diff of the Mosaic wave kernel vs the XLA wave loop on a
small frame; prints mismatch counts and sample locations per field."""

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


def run(use_pallas, frames, quality, aw, ah, seed=7):
    from cairo_tpu.tpu import backend as backend_mod
    from cairo_tpu.tpu import wavefront, wire
    orig = backend_mod.use_pallas
    backend_mod.use_pallas = lambda: use_pallas
    try:
        raw = wavefront.conformance_encode_step.__wrapped__
        outs = []
        state = wavefront.init_state(aw, ah)
        rng = np.random.default_rng(seed)
        for i in range(frames):
            f = jax.jit(functools.partial(
                raw, aligned_w=aw, aligned_h=ah, frame_w=aw, frame_h=ah,
                is_inter=i > 0))
            buf = rng.integers(0, 255, 8 + wire.yuv8_nbytes(ah, aw),
                               np.uint8).astype(np.uint8)
            buf[:8] = np.array([i, quality], np.int32).view(np.uint8)
            state, out = f(buf, state)
            outs.append(jax.device_get(out))
        return outs, jax.device_get(state)
    finally:
        backend_mod.use_pallas = orig


def main():
    aw, ah = 128, 96
    frames = int(os.environ.get("FRAMES", "1"))
    quality = int(os.environ.get("QUALITY", "16"))
    r_outs, r_state = run(False, frames, quality, aw, ah)
    g_outs, g_state = run(True, frames, quality, aw, ah)
    wb = aw // 16
    for i, (r, g) in enumerate(zip(r_outs, g_outs)):
        for k in r:
            a, b = np.asarray(r[k]), np.asarray(g[k])
            if np.array_equal(a, b):
                continue
            bad = np.nonzero(a != b)
            n = bad[0].size
            print(f"frame {i} {k}: {n} diffs; first idx "
                  f"{[int(x[0]) for x in bad][:3]}")
            if a.ndim == 1:
                ii = bad[0][0]
                print(f"   block {ii} = (bi {ii % wb}, bj {ii // wb}): "
                      f"ref {a[ii]} got {b[ii]}")
                uniq = np.unique(bad[0])
                print(f"   {uniq.size} blocks affected; first 10: "
                      f"{[(int(u) % wb, int(u) // wb) for u in uniq[:10]]}")
            else:
                ys, xs = bad[0], bad[1]
                print(f"   first few: "
                      f"{[(int(y), int(x)) for y, x in zip(ys[:5], xs[:5])]}"
                      f" ref {a[ys[0], xs[0]]} got {b[ys[0], xs[0]]}")
                blocks = sorted({(int(x) // 8, int(y) // 8)
                                 for y, x in zip(ys, xs)})
                print(f"   8x8 blocks (bx, by): {blocks[:12]}"
                      f" ({len(blocks)} total)")
    for k in r_state:
        a, b = np.asarray(r_state[k]), np.asarray(g_state[k])
        if not np.array_equal(a, b):
            bad = np.nonzero(a != b)
            print(f"state {k}: {bad[0].size} diffs")


if __name__ == "__main__":
    main()
