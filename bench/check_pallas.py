"""Differential check: Pallas dense search vs the XLA anchor on real content.

Runs both paths of motion.inter_search's full-pel stage on the same inputs
and asserts identical (mx, my, sad, mad, frozen) selections per macroblock.
Run on the real TPU chip: python bench/check_pallas.py [W H]
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
from cairo_tpu.tpu import motion, ops, pallas_motion

MB = tables.MACROBLOCK_SIZE
R = motion.DENSE_R
CR = R // 2


def run_case(name, w, h, src_p, ref_p, quality):
    mad_thr = (quality >> 2) + 1
    hb, wb = h // MB, w // MB
    idx = np.arange(hb * wb)
    px = jnp.asarray((idx % wb) * MB, jnp.int32)
    py = jnp.asarray((idx // wb) * MB, jnp.int32)
    sy, su, sv = (jnp.asarray(p, jnp.int32) for p in src_p)
    ry, ru, rv = (jnp.asarray(p, jnp.int32) for p in ref_p)

    ry_w = jnp.pad(ry, ((0, 0), (R, R)))
    ru_w = jnp.pad(ru, ((0, 0), (CR, CR)))
    rv_w = jnp.pad(rv, ((0, 0), (CR, CR)))

    @jax.jit
    def xla_path():
        cmax = motion._chroma_max_maps(su, sv, ru_w, rv_w, CR)
        return motion._dense_select(sy, ry_w, cmax, px, py, 0, w, h,
                                    mad_thr, hb, wb)

    @jax.jit
    def pallas_path():
        cmax = pallas_motion.chroma_max_maps(su, sv, ru_w, rv_w)
        return pallas_motion.dense_select(sy, ry_w, cmax, 0, w, h, mad_thr)

    a = [np.asarray(x) for x in jax.block_until_ready(xla_path())]
    t0 = time.perf_counter()
    b = [np.asarray(x) for x in jax.block_until_ready(pallas_path())]
    t_compile = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(5):
        jax.block_until_ready(pallas_path())
    t_pallas = (time.perf_counter() - t0) / 5 * 1e3
    t0 = time.perf_counter()
    for _ in range(5):
        jax.block_until_ready(xla_path())
    t_xla = (time.perf_counter() - t0) / 5 * 1e3

    names = ["mx", "my", "sad", "mad", "frozen"]
    ok = True
    for k, (va, vb) in zip(names, zip(a, b)):
        if not np.array_equal(va, vb):
            bad = np.nonzero(va != vb)[0]
            print(f"  MISMATCH {k}: {bad.size} blocks, first {bad[:8]}")
            for n in bad[:4]:
                print(f"    mb {n}: xla {[int(x[n]) for x in a]} "
                      f"pallas {[int(x[n]) for x in b]}")
            ok = False
    print(f"{name}: {'OK' if ok else 'FAIL'}  pallas {t_pallas:.2f} ms  "
          f"xla {t_xla:.2f} ms  (compile {t_compile:.1f}s)")
    return ok


def main():
    w = int(sys.argv[1]) if len(sys.argv) > 1 else 1920
    h = int(sys.argv[2]) if len(sys.argv) > 2 else 1088
    rng = np.random.default_rng(3)
    ok = True

    # case 1: shifted noise+structure (every MB finds a real motion match)
    yy, xx = np.mgrid[0:h, 0:w]
    y = (128 + 90 * np.sin(xx * 0.11) * np.cos(yy * 0.07)).astype(np.int16)
    y += rng.integers(-6, 7, (h, w)).astype(np.int16)
    u = rng.integers(90, 170, (h // 2, w // 2)).astype(np.int16)
    v = rng.integers(90, 170, (h // 2, w // 2)).astype(np.int16)
    ref = (np.roll(y, 5, axis=1), np.roll(u, 2, axis=1), np.roll(v, 2, axis=1))
    ok &= run_case("shifted", w, h, (y, u, v), ref, 16)

    # case 2: static content (co-located early-out everywhere)
    ok &= run_case("static", w, h, (y, u, v), (y, u, v), 16)

    # case 3: pure noise (no matches; plain-branch lexicographic ties)
    y2 = rng.integers(0, 256, (h, w)).astype(np.int16)
    u2 = rng.integers(0, 256, (h // 2, w // 2)).astype(np.int16)
    v2 = rng.integers(0, 256, (h // 2, w // 2)).astype(np.int16)
    r2 = (rng.integers(0, 256, (h, w)).astype(np.int16),
          rng.integers(0, 256, (h // 2, w // 2)).astype(np.int16),
          rng.integers(0, 256, (h // 2, w // 2)).astype(np.int16))
    ok &= run_case("noise", w, h, (y2, u2, v2), r2, 8)

    # case 4: flat planes (maximal ties everywhere; scan-order tiebreaks)
    f = np.full((h, w), 100, np.int16)
    fc = np.full((h // 2, w // 2), 128, np.int16)
    ok &= run_case("flat", w, h, (f, fc, fc), (f + 1, fc, fc), 31)

    print("ALL OK" if ok else "FAILURES")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
