"""Tiled-pipeline tiling-overhead measurement on the virtual CPU mesh.

Prints ONE JSON line:
  {"tiles": T, "t_1tile_ms": ..., "t_Ntile_ms": ..., "t1_over_tN": R}

Methodology: the same frame width is encoded untiled (T=1) and tiled over
T virtual devices (fixed work). The virtual devices time-share this
host's cores, so this is NOT a scaling efficiency: wall time cannot drop
with T here, and the t1/tN ratio is contaminated by whatever real core
parallelism the host has. What it bounds is the *tiling overhead* -- halo
exchange, per-tile rebuilds, duplicated edge work. A ratio >= ~1 means
tiling adds little overhead, which is the necessary single-host
precondition for multi-chip scaling (where each tile owns a chip and the
~400 KB/frame of ICI halo traffic is negligible, docs/SHARDING.md). The
executed multi-process measurement lives in tests/test_multihost.py."""

import json
import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "src"))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import jax.numpy as jnp
import numpy as np


def step_time(n_tiles, width, height, reps=4):
    from cairo_tpu.tpu import shard

    tile_w = width // n_tiles
    mesh = shard.make_mesh(1, n_tiles)
    step = shard.sharded_encode_step(mesh, tile_w=tile_w, aligned_h=height,
                                     full_width=width, is_inter=True)
    state = jax.tree.map(
        lambda x: jnp.broadcast_to(x[None, None], (1, n_tiles) + x.shape),
        shard.init_tile_state(tile_w, height))
    rng = np.random.default_rng(0)
    rgb = jnp.asarray(rng.integers(0, 255, (1, height, width, 3))
                      .astype(np.uint8))
    with mesh:
        state, out = step(rgb, state, 1, 16)
        jax.block_until_ready(out)       # compile + warmup
        t0 = time.perf_counter()
        for i in range(reps):
            state, out = step(rgb, state, 2 + i, 16)
        jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    tiles = int(os.environ.get("SCALING_TILES", "8"))
    width, height = 1024, 256
    t1 = step_time(1, width, height)
    tn = step_time(tiles, width, height)
    print(json.dumps({
        "tiles": tiles,
        "t_1tile_ms": round(t1, 1),
        "t_Ntile_ms": round(tn, 1),
        "t1_over_tN": round(t1 / tn, 3),
    }))


if __name__ == "__main__":
    main()
