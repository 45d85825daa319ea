"""Device-time breakdown of the conformance (wavefront) encode step at
1080p, plus wall-clock. Same xprof machinery as profile_kernels.py.

Run: JAX_PLATFORMS=axon python bench/profile_wavefront.py
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   "..", ".jax_cache"))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "src"))

import jax
import numpy as np

from profile_kernels import capture, summarize  # noqa: E402


def main():
    from cairo_tpu.tpu import wavefront, wire

    width, height = 1920, 1080
    aw, ah = 1920, 1088
    rng = np.random.default_rng(0)

    buf = rng.integers(0, 200, 8 + wire.yuv8_nbytes(ah, aw),
                       np.uint8).astype(np.uint8)
    buf[:8] = np.array([1, 16], np.int32).view(np.uint8)
    src = jax.device_put(buf)
    state0 = wavefront.init_state(aw, ah)
    state0 = jax.tree.map(lambda x: x + 0, state0)
    jax.block_until_ready(state0)

    holder = {"state": state0}

    is_inter = "--intra" not in sys.argv

    def enc():
        holder["state"], out = wavefront.conformance_encode_step(
            src, holder["state"], aligned_w=aw, aligned_h=ah,
            frame_w=width, frame_h=height, is_inter=is_inter)
        return out["coef_y"]

    reps = 5
    t0 = time.perf_counter()
    w0 = enc(); jax.block_until_ready(w0)
    print(f"first call: {time.perf_counter() - t0:.1f}s")
    t0 = time.perf_counter()
    for _ in range(reps):
        w0 = enc()
    jax.block_until_ready(w0)
    wall = (time.perf_counter() - t0) / reps * 1e3
    print(f"conformance_encode_step wall ({'inter' if is_inter else 'intra'}):"
          f" {wall:.1f} ms")

    rows = summarize(capture(enc, reps, "/tmp/xprof_wf"), reps)
    if not rows:
        print("(no op table)")
        return
    by_cat, by_op = {}, {}
    for r in rows:
        try:
            t = float(r.get("total_self_time") or 0)
        except (TypeError, ValueError):
            continue
        cat = r.get("category") or "?"
        op = r.get("tf_op_name") or r.get("hlo_op_name") or "?"
        by_cat[cat] = by_cat.get(cat, 0.0) + t
        by_op[(cat, op)] = by_op.get((cat, op), 0.0) + t
    tot = sum(by_cat.values())
    print(f"total device self-time: {tot/1e3/reps:.2f} ms/step")
    print("-- by HLO category --")
    for cat, t in sorted(by_cat.items(), key=lambda kv: -kv[1])[:20]:
        print(f"  {t/1e3/reps:8.3f} ms  {cat}")
    print("-- top ops --")
    for (cat, op), t in sorted(by_op.items(), key=lambda kv: -kv[1])[:40]:
        print(f"  {t/1e3/reps:8.3f} ms  [{cat}] {op[:110]}")


if __name__ == "__main__":
    main()
