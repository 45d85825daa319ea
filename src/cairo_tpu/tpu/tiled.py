"""Multi-chip tiled bitstream: container + host orchestration.

Implements the `tiled_stream` extension of docs/SHARDING.md:

    tiled_stream := tiled_header u16 tile_count (u16 tile_width_mbs)* frame*
    frame        := frame_desc (u32 tile_bytes tile_slice)*

All tile_width_mbs entries MUST be equal: the mesh-sharded pipeline tiles
uniformly, and both ends enforce it (pack_tiled_header validates at
encode, TiledDecoder rejects at decode). The per-tile width fields stay
in the wire for forward compatibility with non-uniform tilings.

The tiled_header is the 14-byte evx1 header layout (common.h:53-62) with
magic "EVXT" so plain-stream decoders reject it cleanly. Each tile_slice is
a standard evx1 slice (its own ABAC coder, block table, MV/QP/DC-delta
chains) over one column of macroblocks; motion vectors are tile-relative
and may reach up to search-radius+1 px into the neighbor tile (the halo
protocol, tpu/shard.py). Deblocking is tile-local, so decoded pixels are
defined per tiling; encoder and decoder agree exactly for a given tiling.

TiledEncoder/TiledDecoder run the shard_map'd per-tile device pipeline over
a ("gop", "tile") mesh and stitch/split the per-tile slices on the host
with the native entropy codec. The gop axis carries independent GOPs
(data parallelism): encode_batch() encodes one frame for each GOP per call
and emits one independent tiled stream per GOP.
"""

from __future__ import annotations

import struct

import jax
import jax.numpy as jnp
import numpy as np

from .. import native, tables
from ..blocktypes import (BlockTable, COPY_BIT, FRAME_INTER, FRAME_INTRA,
                          INTRA_BIT, MOTION_BIT)
from ..cpuref import imaging as cpu_imaging
from ..cpuref.api import FRAME_DESC_SIZE, HEADER_SIZE, _FRAME_FMT
from ..xmath import clip_range
from . import shard

MB = tables.MACROBLOCK_SIZE
_TILED_HEADER_FMT = "<4sHBxHHH"  # magic, size, ref_count, version, w, h


def pack_tiled_header(width: int, height: int, tile_widths_mbs) -> bytes:
    if len(set(tile_widths_mbs)) != 1:
        raise ValueError("tiled streams require uniform tile widths "
                         "(docs/SHARDING.md)")
    head = struct.pack(_TILED_HEADER_FMT, b"EVXT", HEADER_SIZE,
                       tables.REFERENCE_FRAME_COUNT, tables.VERSION_WORD,
                       width, height)
    body = struct.pack("<H", len(tile_widths_mbs))
    body += b"".join(struct.pack("<H", t) for t in tile_widths_mbs)
    return head + body


def parse_tiled_header(data: bytes):
    magic, size, ref_count, version, width, height = struct.unpack(
        _TILED_HEADER_FMT, data[:HEADER_SIZE])
    if magic != b"EVXT" or size != HEADER_SIZE or \
            ref_count != tables.REFERENCE_FRAME_COUNT or \
            version != tables.VERSION_WORD:
        raise ValueError("invalid tiled evx1 header")
    (tile_count,) = struct.unpack_from("<H", data, HEADER_SIZE)
    tiles = [struct.unpack_from("<H", data, HEADER_SIZE + 2 + 2 * i)[0]
             for i in range(tile_count)]
    return width, height, tiles, HEADER_SIZE + 2 + 2 * tile_count


def _align_to(v: int, mult: int) -> int:
    return (v + mult - 1) // mult * mult


def _fetch_local_shards(tree):
    """device_get for (gop, tile)-sharded outputs that works across
    processes: fetches exactly the (gop, tile) shards living on this
    process. Returns (keys, dict of {field: {key: np array}}). With the
    default placement (one GOP row per host) a process holds whole rows;
    with cross-host tiles (cluster.initialize allow_cross_host_tiles) a
    row's shards are split between processes."""
    first = jax.tree_util.tree_leaves(tree)[0]
    keys = sorted({(s.index[0].start or 0, s.index[1].start or 0)
                   for s in first.addressable_shards})

    def fetch(arr):
        return {(s.index[0].start or 0, s.index[1].start or 0):
                np.asarray(s.data)[0, 0]
                for s in arr.addressable_shards}

    return keys, jax.tree_util.tree_map(fetch, tree)


def _allgather_payloads(payloads, n_gops, n_tiles):
    """DCN bitstream gather: every process contributes its local tiles'
    slice payloads; all processes return the full {(g, t): bytes} map.
    Two collective rounds (lengths, then max-padded byte buffers) over
    jax.experimental.multihost_utils.process_allgather."""
    from jax.experimental import multihost_utils

    lens = np.full((n_gops, n_tiles), -1, np.int32)
    for (g, t), b in payloads.items():
        lens[g, t] = len(b)
    all_lens = np.asarray(multihost_utils.process_allgather(lens))
    if all_lens.ndim == 2:  # single process
        return payloads
    local_total = sum(len(b) for b in payloads.values())
    totals = np.maximum(all_lens, 0).sum(axis=(1, 2))
    max_total = int(totals.max())
    buf = np.zeros(max_total, np.uint8)
    o = 0
    for key in sorted(payloads):
        b = payloads[key]
        buf[o:o + len(b)] = np.frombuffer(b, np.uint8)
        o += len(b)
    assert o == local_total
    all_bufs = np.asarray(multihost_utils.process_allgather(buf))
    full = {}
    for p in range(all_lens.shape[0]):
        o = 0
        for g in range(n_gops):
            for t in range(n_tiles):
                ln = int(all_lens[p, g, t])
                if ln >= 0:
                    full[(g, t)] = all_bufs[p, o:o + ln].tobytes()
                    o += ln
    return full


class TiledEncoder:
    """Spatially-tiled encoder over a ("gop", "tile") device mesh."""

    def __init__(self, n_tiles: int, n_gops: int = 1, devices=None):
        if n_tiles < 1 or n_gops < 1:
            raise ValueError("n_tiles and n_gops must be >= 1")
        self.n_tiles = n_tiles
        self.n_gops = n_gops
        self._devices = devices
        self._state = None
        self._steps = {}
        self._stale = {}  # per-(gop, tile) stale q/variance carries
        self.frame_type = FRAME_INTRA
        self.frame_index = 0
        self.quality = tables.DEFAULT_QUALITY
        self.width = self.height = 0

    def set_quality(self, quality: int):
        self.quality = int(clip_range(quality, 1, 31))

    def insert_intra(self):
        self.frame_type = FRAME_INTRA

    def _init(self, width: int, height: int):
        self.width, self.height = width, height
        self._aw = _align_to(width, self.n_tiles * MB)
        self._ah = _align_to(height, MB)
        self.tile_w = self._aw // self.n_tiles
        self._mesh = shard.make_mesh(self.n_gops, self.n_tiles,
                                     self._devices)
        tile_state = shard.init_tile_state(self.tile_w, self._ah)
        self._state = jax.tree.map(
            lambda x: jnp.broadcast_to(
                x[None, None], (self.n_gops, self.n_tiles) + x.shape),
            tile_state)
        n_tile_mbs = (self.tile_w // MB) * (self._ah // MB)
        self._ntm = n_tile_mbs

    def _step(self, is_inter: bool):
        if is_inter not in self._steps:
            self._steps[is_inter] = shard.sharded_encode_step(
                self._mesh, tile_w=self.tile_w, aligned_h=self._ah,
                full_width=self._aw, is_inter=is_inter,
                frame_w=self.width, frame_h=self.height)
        return self._steps[is_inter]

    def encode(self, rgb: np.ndarray) -> bytes:
        if self.n_gops != 1:
            raise ValueError("use encode_batch with n_gops > 1")
        return self.encode_batch([rgb])[0]

    def encode_batch(self, rgbs) -> list[bytes | None]:
        """Encodes one frame per GOP (len(rgbs) == n_gops); returns one
        tiled-stream byte chunk per GOP.

        Multi-host (cluster.py): every process calls this with the full
        frame list (the device compute is SPMD over the global mesh) and
        each process entropy-codes the tiles whose shards it owns. With
        the default one-GOP-row-per-host placement, each process returns
        bytes for its own GOPs and None for the others. When a GOP's tile
        axis spans hosts (cluster.initialize allow_cross_host_tiles), the
        per-tile payloads are allgathered across processes (the DCN
        bitstream-gather leg) and every process returns every chunk."""
        if len(rgbs) != self.n_gops:
            raise ValueError("need one frame per GOP")
        height, width = rgbs[0].shape[:2]
        first = self._state is None
        if first:
            self._init(width, height)
        if (width, height) != (self.width, self.height):
            raise ValueError("frame dimensions changed mid-stream")

        batch = np.zeros((self.n_gops, self._ah, self._aw, 3), np.uint8)
        for g, rgb in enumerate(rgbs):
            batch[g, :height, :width] = rgb

        step = self._step(self.frame_type == FRAME_INTER)
        with self._mesh:
            self._state, out = step(batch, self._state, self.frame_index,
                                    self.quality)
        keys, shards = _fetch_local_shards(out)

        payloads = {}
        for key in keys:
            fields = {f: shards[f][key] for f in shards}
            # stale q_index/variance persistence per (gop, tile) — peek
            # parity with the reference's clear_block_desc quirk
            # (common.cpp:67-73)
            copy = (fields["block_type"].astype(np.int32) & COPY_BIT) != 0
            if key in self._stale:
                sq, sv = self._stale[key]
                fields["q_index"] = np.where(copy, sq, fields["q_index"])
                fields["variance"] = np.where(copy, sv,
                                              fields["variance"])
            self._stale[key] = (fields["q_index"], fields["variance"])
            bt = BlockTable(
                block_type=fields["block_type"],
                prediction_target=fields["prediction_target"],
                motion_x=fields["motion_x"], motion_y=fields["motion_y"],
                sp_pred=fields["sp_pred"], sp_amount=fields["sp_amount"],
                sp_index=fields["sp_index"], q_index=fields["q_index"],
                variance=fields["variance"])
            payload, _ = native.encode_slice(
                bt, fields["coef_y"], fields["coef_u"], fields["coef_v"])
            payloads[key] = payload

        # cross-host tiles: rows are split between processes exactly when
        # a GOP row needs more devices than this host has (a global,
        # static condition, so every process enters the collective)
        if jax.process_count() > 1 and \
                self.n_tiles > jax.local_device_count():
            payloads = _allgather_payloads(payloads, self.n_gops,
                                           self.n_tiles)

        frame_desc = struct.pack(_FRAME_FMT, self.frame_type,
                                 self.frame_index, self.quality)
        tile_mbs = [self.tile_w // MB] * self.n_tiles
        chunks: list[bytes | None] = [None] * self.n_gops
        for g in range(self.n_gops):
            if not all((g, t) in payloads for t in range(self.n_tiles)):
                continue
            parts = []
            if first:
                parts.append(pack_tiled_header(width, height, tile_mbs))
            parts.append(frame_desc)
            for t in range(self.n_tiles):
                payload = payloads[(g, t)]
                parts.append(struct.pack("<I", len(payload)))
                parts.append(payload)
            chunks[g] = b"".join(parts)

        self.frame_type = FRAME_INTER
        if tables.PERIODIC_INTRA_RATE and \
                (self.frame_index + 1) % tables.PERIODIC_INTRA_RATE == 0:
            self.insert_intra()
        self.frame_index += 1
        return chunks

    def recon_rgb(self, gop: int = 0) -> np.ndarray:
        """Stitched reconstruction of the last encoded frame (debug/tests:
        a conforming decoder must reproduce this exactly)."""
        slot = (self.frame_index - 1) % tables.REFERENCE_FRAME_COUNT
        planes = []
        for key, halo in (("ring_y", shard.HALO), ("ring_u", shard.CHALO),
                          ("ring_v", shard.CHALO)):
            arr = np.asarray(jax.device_get(self._state[key]))[gop, :, slot]
            core = arr[:, :, halo:arr.shape[2] - halo]
            planes.append(np.concatenate(list(core), axis=1))
        return cpu_imaging.yuv420_to_rgb(planes[0], planes[1], planes[2],
                                         self.width, self.height)


class TiledDecoder:
    """Decoder for tiled_stream chunks (one GOP per decoder instance)."""

    def __init__(self, devices=None):
        self._devices = devices
        self._state = None
        self.frame_index = 0
        self.width = self.height = 0

    def _init(self, width, height, tile_mbs):
        self.width, self.height = width, height
        self.tile_widths = [t * MB for t in tile_mbs]
        if len(set(self.tile_widths)) != 1:
            raise ValueError("tiled streams require uniform tile widths "
                             "(docs/SHARDING.md)")
        self.n_tiles = len(tile_mbs)
        self.tile_w = self.tile_widths[0]
        self._aw = self.tile_w * self.n_tiles
        self._ah = _align_to(height, MB)
        self._mesh = shard.make_mesh(1, self.n_tiles, self._devices)
        tile_state = shard.init_tile_state(self.tile_w, self._ah)
        self._state = jax.tree.map(
            lambda x: jnp.broadcast_to(x[None, None],
                                       (1, self.n_tiles) + x.shape),
            tile_state)
        self._step = shard.sharded_decode_step(
            self._mesh, tile_w=self.tile_w, aligned_h=self._ah)
        n = (self.tile_w // MB) * (self._ah // MB)
        self._bt = [BlockTable.zeros(n) for _ in range(self.n_tiles)]
        self._coef = [
            (np.zeros((self._ah, self.tile_w), np.int16),
             np.zeros((self._ah // 2, self.tile_w // 2), np.int16),
             np.zeros((self._ah // 2, self.tile_w // 2), np.int16))
            for _ in range(self.n_tiles)]

    def decode(self, chunk: bytes) -> np.ndarray:
        offset = 0
        if self._state is None:
            width, height, tile_mbs, offset = parse_tiled_header(chunk)
            self._init(width, height, tile_mbs)
        ftype, index, quality = struct.unpack_from(_FRAME_FMT, chunk, offset)
        if ftype not in (FRAME_INTRA, FRAME_INTER):
            raise ValueError(f"invalid frame type {ftype}")
        if not 1 <= quality <= 31:
            raise ValueError(f"invalid frame quality {quality}")
        if index != self.frame_index:
            raise ValueError("out-of-order frame")
        offset += FRAME_DESC_SIZE

        # decode every tile slice into scratch state and validate BEFORE
        # committing: raising mid-frame must not desynchronize the
        # persistent per-tile tables/planes from the device ring
        scratch = []
        for t in range(self.n_tiles):
            if offset + 4 > len(chunk):
                raise ValueError("truncated tiled frame (missing length)")
            (nbytes,) = struct.unpack_from("<I", chunk, offset)
            offset += 4
            if nbytes == 0 or offset + nbytes > len(chunk):
                raise ValueError("tile slice length out of bounds")
            payload = chunk[offset:offset + nbytes]
            offset += nbytes
            bt = self._bt[t].copy()
            y, u, v = (p.copy() for p in self._coef[t])
            native.decode_slice(payload, 0, bt, y, u, v)
            if np.any((bt.block_type & INTRA_BIT).astype(bool)
                      & (bt.block_type & MOTION_BIT).astype(bool)):
                raise ValueError("tiled streams are fast-mode only "
                                 "(no intra-motion blocks)")
            scratch.append((bt, y, u, v))
        for t, (bt, y, u, v) in enumerate(scratch):
            self._bt[t] = bt
            self._coef[t] = (y, u, v)

        table = {
            k: np.stack([getattr(self._bt[t], k)
                         for t in range(self.n_tiles)])[None]
            for k in ("block_type", "prediction_target", "motion_x",
                      "motion_y", "sp_pred", "sp_amount", "sp_index",
                      "q_index")}
        coef = dict(
            coef_y=np.stack([self._coef[t][0]
                             for t in range(self.n_tiles)])[None],
            coef_u=np.stack([self._coef[t][1]
                             for t in range(self.n_tiles)])[None],
            coef_v=np.stack([self._coef[t][2]
                             for t in range(self.n_tiles)])[None])
        with self._mesh:
            self._state, rgb = self._step(table, coef, self._state, index)
        rgb = np.asarray(jax.device_get(rgb))[0]
        self.frame_index += 1
        return rgb[:self.height, :self.width]
