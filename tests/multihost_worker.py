"""Worker for tests/test_multihost.py: one process of a 2-process
jax.distributed CPU cluster (4 virtual devices each -> 8 global).

Usage: python multihost_worker.py <coordinator> <num_procs> <rank> <outdir>
Builds the ("gop", "tile") mesh via cluster.initialize, runs TiledEncoder
over 2 GOPs x 4 tiles, and writes this process's own GOP stream."""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "src"))

import numpy as np


def frames_for_gop(g, n_frames, width, height):
    rng = np.random.default_rng(100 + g)
    base = rng.integers(0, 255, (height, width, 3)).astype(np.uint8)
    out = []
    for t in range(n_frames):
        f = np.roll(base, 5 * t, axis=1).copy()
        f[10:26, 10:26] = (20 * t) % 255
        out.append(f)
    return out


def main():
    coordinator, num_procs, rank, outdir = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])
    mode = sys.argv[5] if len(sys.argv) > 5 else "gops"

    import jax
    # the ambient axon PJRT plugin ignores the env var; force the platform
    # through the config like tests/conftest.py does
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 4)
    # cluster imports only jax; tiled's import chain touches jnp constants
    # which would initialize the XLA backend before jax.distributed
    from cairo_tpu.tpu import cluster

    if mode == "tiles":
        # one GOP whose 8-tile axis SPANS both processes: the per-frame
        # halo ppermute crosses the host boundary, and the per-tile slice
        # payloads ride the DCN allgather
        spec = cluster.initialize(coordinator=coordinator,
                                  num_processes=num_procs, process_id=rank,
                                  tiles_per_gop=8,
                                  allow_cross_host_tiles=True)
        from cairo_tpu.tpu import tiled

        assert jax.device_count() == 8 and jax.local_device_count() == 4
        assert spec.n_gops == 1 and spec.tiles_per_gop == 8, spec
        enc = tiled.TiledEncoder(n_tiles=8, n_gops=1)
        enc.set_quality(14)
        frames = frames_for_gop(0, 3, 256, 64)
        own = []
        for t in range(3):
            chunks = enc.encode_batch([frames[t]])
            assert chunks[0] is not None  # gather: every process has it
            own.append(chunks[0])
        with open(os.path.join(outdir, f"tiles_rank{rank}.bin"), "wb") as f:
            for c in own:
                f.write(len(c).to_bytes(4, "little") + c)
        print("worker", rank, "ok", sum(len(c) for c in own))
        return

    spec = cluster.initialize(coordinator=coordinator,
                              num_processes=num_procs, process_id=rank)
    from cairo_tpu.tpu import tiled
    assert jax.device_count() == 8, jax.device_count()
    assert jax.local_device_count() == 4
    assert spec.n_gops == 2 and spec.tiles_per_gop == 4, spec

    enc = tiled.TiledEncoder(n_tiles=spec.tiles_per_gop, n_gops=spec.n_gops)
    enc.set_quality(14)
    width, height = 128, 64
    gop_frames = [frames_for_gop(g, 3, width, height)
                  for g in range(spec.n_gops)]

    own = []
    for t in range(3):
        chunks = enc.encode_batch([gop_frames[g][t]
                                   for g in range(spec.n_gops)])
        # this process owns exactly its own GOP row (one row per host)
        mine = [g for g, c in enumerate(chunks) if c is not None]
        assert mine == [rank], (mine, rank)
        own.append(chunks[rank])

    with open(os.path.join(outdir, f"gop{rank}.bin"), "wb") as f:
        for c in own:
            f.write(len(c).to_bytes(4, "little") + c)
    print("worker", rank, "ok", sum(len(c) for c in own))


if __name__ == "__main__":
    main()
