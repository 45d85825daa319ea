"""Executed multi-host path (cluster.py): a real 2-process
jax.distributed run on this host (CPU backend, 4 virtual devices per
process -> the 8-device ("gop", "tile") mesh of cluster.initialize),
asserting the per-GOP tiled streams are byte-identical to the
single-process encode of the same content.

This is the strongest multi-host evidence available without a multi-host
TPU pod: the mesh really spans two OS processes, the gop axis is split
one-row-per-process exactly as on a v5e-16 (one GOP row per host), and
every collective (tile-axis ppermute halo exchange) executes through the
cross-process CPU backend."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from multihost_worker import frames_for_gop

_DIR = os.path.dirname(os.path.abspath(__file__))


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _read_chunks(path):
    chunks = []
    with open(path, "rb") as f:
        while True:
            head = f.read(4)
            if not head:
                return chunks
            chunks.append(f.read(int.from_bytes(head, "little")))


@pytest.mark.slow
def test_two_process_gop_mesh_matches_single_process(tmp_path):
    port = _free_port()
    coord = f"localhost:{port}"
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(_DIR, "multihost_worker.py"),
             coord, "2", str(rank), str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for rank in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {rank} failed:\n{out[-4000:]}"

    # single-process encode of the same 2 GOPs on the local 8-device mesh
    from cairo_tpu.tpu import tiled

    enc = tiled.TiledEncoder(n_tiles=4, n_gops=2)
    enc.set_quality(14)
    gop_frames = [frames_for_gop(g, 3, 128, 64) for g in range(2)]
    want = [[], []]
    for t in range(3):
        chunks = enc.encode_batch([gop_frames[0][t], gop_frames[1][t]])
        assert all(c is not None for c in chunks)
        for g in range(2):
            want[g].append(chunks[g])

    for g in range(2):
        got = _read_chunks(tmp_path / f"gop{g}.bin")
        assert len(got) == 3
        for t in range(3):
            assert got[t] == want[g][t], \
                f"gop {g} frame {t}: multi-process stream differs"

    # the streams decode (pixel path) — same decoder as single-process
    dec = tiled.TiledDecoder()
    for t, chunk in enumerate(_read_chunks(tmp_path / "gop0.bin")):
        rgb = dec.decode(chunk)
        assert rgb.shape == (64, 128, 3)


@pytest.mark.slow
def test_cross_host_tile_axis_matches_single_process(tmp_path):
    """The tile axis spanning BOTH processes (8 tiles over 2x4 devices):
    the per-frame halo ppermute executes across the host boundary and the
    per-tile payloads ride the DCN allgather — both processes must
    assemble the identical stream, byte-equal to a single-process 8-tile
    encode of the same frames."""
    port = _free_port()
    coord = f"localhost:{port}"
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(_DIR, "multihost_worker.py"),
             coord, "2", str(rank), str(tmp_path), "tiles"],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for rank in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {rank} failed:\n{out[-4000:]}"

    from cairo_tpu.tpu import tiled

    enc = tiled.TiledEncoder(n_tiles=8, n_gops=1)
    enc.set_quality(14)
    frames = frames_for_gop(0, 3, 256, 64)
    want = [enc.encode_batch([f])[0] for f in frames]

    for rank in range(2):
        got = _read_chunks(tmp_path / f"tiles_rank{rank}.bin")
        assert len(got) == 3
        for t in range(3):
            assert got[t] == want[t], \
                f"rank {rank} frame {t}: cross-host tile stream differs"
