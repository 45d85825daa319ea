"""Multi-host bring-up for the ("gop", "tile") mesh.

One process per host (jax.distributed); each host contributes its local
chips to the global mesh. The codec needs no parameter synchronization:
the only cross-device traffic is the per-frame ppermute halo exchange
along the tile axis (ICI) and the host-side gather of per-tile slice
payloads (DCN), so GOP rows place naturally one-per-host.

This module cannot be exercised in the single-host dev environment; the
same mesh code runs on the 8-device virtual CPU mesh in tests
(tests/test_tiled.py) and the topology logic below is pure bookkeeping.

Typical v5e-16 (2 hosts x 8 chips) run, one GOP row per host:

    from cairo_tpu.tpu import cluster, tiled
    mesh_spec = cluster.initialize(coordinator="host0:1234",
                                   num_processes=2, process_id=RANK)
    enc = tiled.TiledEncoder(n_tiles=mesh_spec.tiles_per_gop,
                             n_gops=mesh_spec.n_gops)
    # host k feeds frames for GOP k and keeps the streams it stitches
"""

from __future__ import annotations

import dataclasses

import jax


@dataclasses.dataclass(frozen=True)
class MeshSpec:
    n_gops: int
    tiles_per_gop: int
    process_id: int


def initialize(coordinator: str | None = None, num_processes: int = 1,
               process_id: int = 0, tiles_per_gop: int | None = None,
               allow_cross_host_tiles: bool = False) -> MeshSpec:
    """Initializes jax.distributed (no-op for a single process) and
    returns the ("gop", "tile") mesh shape: GOP rows = processes (each
    host encodes independent GOPs; zero DCN traffic during a GOP), tile
    columns = local chips (halo exchange stays on ICI).

    allow_cross_host_tiles=True lets one GOP's tile axis span hosts: the
    per-frame halo exchange (ppermute along "tile") then crosses the
    host boundary on DCN and the per-tile slice payloads are gathered
    across processes (tiled.encode_batch). The exchange is ~400 KB/frame
    at 4K (docs/SHARDING.md) so this is viable, just not the default —
    it spends DCN on something ICI does for free."""
    if num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
    local = jax.local_device_count()
    if tiles_per_gop is None:
        tiles_per_gop = local
    if tiles_per_gop > local and not allow_cross_host_tiles:
        raise ValueError("a GOP's tiles must stay on one host's chips "
                         "(halo exchange rides ICI, not DCN); pass "
                         "allow_cross_host_tiles=True to override")
    n_gops = (jax.device_count() // tiles_per_gop)
    return MeshSpec(n_gops=n_gops, tiles_per_gop=tiles_per_gop,
                    process_id=process_id)
