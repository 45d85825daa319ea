"""Per-kernel device-time breakdown of the 1080p encode/decode steps.

Captures a jax.profiler trace on the real chip and summarizes XLA-op device
time from the xplane proto (via xprof's raw_to_tool_data converter), so the
bench notes can carry an honest "where do the milliseconds go" table.

Run: JAX_PLATFORMS=axon python bench/profile_kernels.py [--out out.json]
"""

import glob
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   "..", ".jax_cache"))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "src"))

import jax
import jax.numpy as jnp
import numpy as np


def capture(fn, reps, logdir):
    """Runs fn() reps times under a profiler trace; returns op table."""
    fn()  # warm
    jax.effects_barrier()
    with jax.profiler.trace(logdir):
        for _ in range(reps):
            out = fn()
        jax.block_until_ready(out)
    # locate the xplane file
    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        return None
    path = max(paths, key=os.path.getmtime)
    from xprof.convert import raw_to_tool_data as rtd
    data, _ = rtd.xspace_to_tool_data([path], "hlo_stats", {})
    return data


def summarize(gviz, reps):
    """hlo_stats gviz table -> list of row dicts keyed by column id."""
    if isinstance(gviz, bytes):
        gviz = gviz.decode("utf-8", "replace")
    obj = json.loads(gviz)
    tables = obj if isinstance(obj, list) else [obj]
    rows = []
    for table in tables:
        if not isinstance(table, dict) or "cols" not in table:
            continue
        cols = [c.get("id") or c.get("label") for c in table["cols"]]
        for r in table.get("rows", []):
            rows.append({k: (cell or {}).get("v")
                         for k, cell in zip(cols, r["c"])})
    return rows


def main():
    from cairo_tpu.tpu import engine, wire

    out_path = None
    if "--out" in sys.argv:
        out_path = sys.argv[sys.argv.index("--out") + 1]

    width, height = 1920, 1080
    aw, ah = 1920, 1088
    n = (aw // 16) * (ah // 16)
    rng = np.random.default_rng(0)

    buf = rng.integers(0, 200, 8 + wire.yuv8_nbytes(ah, aw),
                       np.uint8).astype(np.uint8)
    buf[:8] = np.array([1, 16], np.int32).view(np.uint8)
    src = jax.device_put(buf)
    state0 = engine.init_state(aw, ah)
    state0 = jax.tree.map(lambda x: x + 0, state0)
    jax.block_until_ready(state0)

    results = {}
    reps = 10

    # -- encode (inter) ----------------------------------------------------
    holder = {"state": state0}

    def enc():
        holder["state"], out = engine.encode_step(
            src, holder["state"], aligned_w=aw, aligned_h=ah,
            frame_w=width, frame_h=height, is_inter=True)
        return out["wire"]

    t0 = time.perf_counter()
    w0 = enc(); jax.block_until_ready(w0)
    t_compile = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(reps):
        w0 = enc()
    jax.block_until_ready(w0)
    results["encode_wall_ms"] = (time.perf_counter() - t0) / reps * 1e3
    print(f"encode_step wall: {results['encode_wall_ms']:.1f} ms "
          f"(first call {t_compile:.1f}s)")

    rows = summarize(capture(enc, reps, "/tmp/xprof_enc"), reps)
    results["encode_ops"] = rows

    # -- decode (COO wire) -------------------------------------------------
    k = wire.COO_K
    in_wire = np.zeros(8 + 6 * k + 10 * n, np.uint8)
    in_wire[:8] = np.array([1, 0], np.int32).view(np.uint8)
    # a quarter of blocks motion, rest delta: plausible mix
    bt = np.where(np.arange(n) % 4 == 0, 2, 0).astype(np.uint8)
    from cairo_tpu.blocktypes import BlockTable
    tbl = BlockTable.zeros(n)
    tbl.block_type[:] = bt
    tbl.prediction_target[:] = 1
    in_wire[8 + 6 * k:] = wire.pack_table_np(tbl)
    dwire = jax.device_put(in_wire)
    state1 = engine.init_state(aw, ah)  # encode donated state0's buffers
    dstate = {"state": jax.tree.map(lambda x: x + 0, state1)}
    jax.block_until_ready(dstate["state"])

    def dec():
        dstate["state"], yuv = engine.decode_step_coo(
            dwire, dstate["state"], aligned_w=aw, aligned_h=ah)
        return yuv

    t0 = time.perf_counter()
    y0 = dec(); jax.block_until_ready(y0)
    t0 = time.perf_counter()
    for _ in range(reps):
        y0 = dec()
    jax.block_until_ready(y0)
    results["decode_wall_ms"] = (time.perf_counter() - t0) / reps * 1e3
    print(f"decode_step_coo wall: {results['decode_wall_ms']:.1f} ms")

    rows = summarize(capture(dec, reps, "/tmp/xprof_dec"), reps)
    results["decode_ops"] = rows

    for name in ("encode_ops", "decode_ops"):
        rows = results[name]
        print(f"\n== {name} ==")
        if not rows:
            print("  (no op table)")
            continue
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
        print(f"  total device self-time: {tot/1e3/reps:.2f} ms/step")
        print("  -- by HLO category --")
        for cat, t in sorted(by_cat.items(), key=lambda kv: -kv[1])[:15]:
            print(f"  {t/1e3/reps:8.3f} ms  {cat}")
        print("  -- top ops --")
        top = sorted(by_op.items(), key=lambda kv: -kv[1])[:30]
        for (cat, op), t in top:
            print(f"  {t/1e3/reps:8.3f} ms  [{cat}] {op[:100]}")
        results[name] = dict(
            total_ms=tot / 1e3 / reps,
            by_category={c: t / 1e3 / reps for c, t in sorted(
                by_cat.items(), key=lambda kv: -kv[1])},
            top_ops=[{"category": c, "op": op, "ms": t / 1e3 / reps}
                     for (c, op), t in top])

    if out_path:
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
