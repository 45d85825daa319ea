"""Tiled multi-chip bitstream tests (docs/SHARDING.md) on the virtual
8-device CPU mesh provisioned by conftest."""

import numpy as np
import pytest

from cairo_tpu.tpu.api import TpuDecoder, TpuEncoder
from cairo_tpu.tpu import tiled
from cairo_tpu.blocktypes import COPY_BIT, MOTION_BIT


def moving_frames(width, height, n, seed=3, shift=5):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 255, (height, width, 3), np.uint8)
    yy, xx = np.mgrid[0:height, 0:width]
    base[..., 0] = (128 + 90 * np.sin(xx * 0.11) * np.cos(yy * 0.07)
                    ).astype(np.uint8)
    frames = []
    for t in range(n):
        f = np.roll(base, t * shift, axis=1).copy()
        f[10:30, 10:40] = (20 * t) % 200
        frames.append(np.ascontiguousarray(f))
    return frames


def test_tiled_roundtrip_matches_encoder_recon():
    frames = moving_frames(128, 64, 4)
    enc = tiled.TiledEncoder(n_tiles=2)
    enc.set_quality(12)
    dec = tiled.TiledDecoder()
    for f in frames:
        chunk = enc.encode(f)
        out = dec.decode(chunk)
        assert np.array_equal(out, enc.recon_rgb())


@pytest.mark.slow
def test_tiled_stream_is_deterministic():
    frames = moving_frames(128, 64, 3)
    streams = []
    for _ in range(2):
        enc = tiled.TiledEncoder(n_tiles=2)
        enc.set_quality(10)
        streams.append(b"".join(enc.encode(f) for f in frames))
    assert streams[0] == streams[1]


def test_tile_count_1_matches_single_chip_stream():
    """A 1-tile tiled stream carries exactly the single-chip slices."""
    frames = moving_frames(80, 64, 3)
    enc_t = tiled.TiledEncoder(n_tiles=1)
    enc_s = TpuEncoder()
    enc_t.set_quality(16)
    enc_s.set_quality(16)
    dec_t = tiled.TiledDecoder()
    dec_s = TpuDecoder()
    for i, f in enumerate(frames):
        chunk_t = enc_t.encode(f)
        chunk_s = enc_s.encode(f)
        # strip containers: tiled = [hdr] desc u32 slice; single = [hdr] desc slice
        if i == 0:
            _, _, tiles, off_t = tiled.parse_tiled_header(chunk_t)
            assert tiles == [80 // 16]
            off_s = 14
        else:
            off_t = off_s = 0
        slice_t = chunk_t[off_t + 10 + 4:]
        slice_s = chunk_s[off_s + 10:]
        assert slice_t == slice_s
        assert np.array_equal(dec_t.decode(chunk_t), dec_s.decode(chunk_s))


def test_halo_reach_motion_across_tile_boundary():
    """A textured sprite crossing the tile boundary must be motion-matched
    into the neighbor tile's halo (tpu/shard.py ppermute exchange)."""
    width, height, shift = 128, 64, 12
    rng = np.random.default_rng(0)
    sprite = rng.integers(0, 255, (32, 32, 3), np.uint8)
    frames = []
    for t in range(2):
        f = np.full((height, width, 3), 90, np.uint8)
        x0 = 40 + t * shift  # sprite straddles the x=64 boundary
        f[16:48, x0:x0 + 32] = sprite
        frames.append(f)

    enc = tiled.TiledEncoder(n_tiles=2)
    enc.set_quality(16)
    dec = tiled.TiledDecoder()
    for f in frames:
        chunk = enc.encode(f)
        out = dec.decode(chunk)
        assert np.array_equal(out, enc.recon_rgb())

    # frame 1, tile 1 (right), leftmost MB column: the sprite content moved
    # +12 px, so its match lies 12 px to the left — partly inside tile 0.
    bt = dec._bt[1]
    wb = dec.tile_w // 16
    col0 = np.arange(len(bt)) % wb == 0
    moved = (bt.block_type & MOTION_BIT).astype(bool) & (bt.motion_x == -shift)
    assert np.any(moved & col0), (bt.motion_x[col0], bt.block_type[col0])


@pytest.mark.slow
def test_gop_axis_independence():
    """GOPs encoded side by side on the gop mesh axis must produce byte-
    identical streams to encoding each alone."""
    seq_a = moving_frames(64, 48, 3, seed=1)
    seq_b = moving_frames(64, 48, 3, seed=2, shift=7)

    enc2 = tiled.TiledEncoder(n_tiles=2, n_gops=2)
    enc2.set_quality(14)
    batched = [enc2.encode_batch([a, b]) for a, b in zip(seq_a, seq_b)]
    stream_a2 = b"".join(c[0] for c in batched)
    stream_b2 = b"".join(c[1] for c in batched)

    for seq, want in ((seq_a, stream_a2), (seq_b, stream_b2)):
        enc1 = tiled.TiledEncoder(n_tiles=2, n_gops=1)
        enc1.set_quality(14)
        got = b"".join(enc1.encode(f) for f in seq)
        assert got == want


@pytest.mark.slow
def test_4k_tiled_roundtrip():
    """Driver config 5's resolution: 3840x2160 over 8 tiles on the virtual
    mesh. Two frames (intra + inter with real motion) through the full
    sharded pipeline; the decoder must reproduce the encoder's recon
    exactly. The single-chip 4K numbers live in bench.py (4k_fps)."""
    frames = moving_frames(3840, 2160, 2, shift=9)
    enc = tiled.TiledEncoder(n_tiles=8)
    enc.set_quality(16)
    dec = tiled.TiledDecoder()
    for f in frames:
        chunk = enc.encode(f)
        out = dec.decode(chunk)
        assert np.array_equal(out, enc.recon_rgb())


def test_tiled_decoder_rejects_corrupt_streams():
    """Container-level hostile input: bad magic, truncated tile payloads,
    bit-flipped slices — raise cleanly, never desynchronize state."""
    frames = moving_frames(128, 64, 2)
    enc = tiled.TiledEncoder(n_tiles=2)
    enc.set_quality(12)
    chunks = [enc.encode(f) for f in frames]

    import pytest as _pytest

    # bad magic
    dec = tiled.TiledDecoder()
    with _pytest.raises(ValueError):
        dec.decode(b"EVXQ" + chunks[0][4:])

    # bit-flipped payload: either decodes (ABAC may absorb it) or raises;
    # afterwards the pristine stream must still decode from a fresh state
    for flip in (40, 80, len(chunks[0]) - 3):
        dec2 = tiled.TiledDecoder()
        bad = bytearray(chunks[0])
        bad[flip] ^= 0x40
        try:
            dec2.decode(bytes(bad))
        except ValueError:
            pass
    dec3 = tiled.TiledDecoder()
    for c in chunks:
        dec3.decode(c)


def test_tiled_framing_bounds_and_width_uniformity():
    """Frame-framing hostile input (u32 tile_bytes far beyond the chunk,
    zero-length slices) raises instead of crashing or hanging, and the
    uniform-tile-width mandate (docs/SHARDING.md) is enforced at BOTH
    ends of the wire."""
    import struct

    import pytest as _pytest

    frames = moving_frames(128, 64, 1)
    enc = tiled.TiledEncoder(n_tiles=2)
    enc.set_quality(12)
    chunk = enc.encode(frames[0])

    # encoder-side: non-uniform widths may never be packed
    with _pytest.raises(ValueError):
        tiled.pack_tiled_header(128, 64, [2, 6])

    # decoder-side: a forged non-uniform header is rejected
    _, _, tile_mbs, off = tiled.parse_tiled_header(chunk)
    forged = bytearray(chunk)
    struct.pack_into("<H", forged, tiled.HEADER_SIZE + 2, tile_mbs[0] + 1)
    with _pytest.raises(ValueError):
        tiled.TiledDecoder().decode(bytes(forged))

    # tile_bytes bounds: blow the first slice's length field up/down —
    # the parser must raise (truncated/garbage slice), never hang
    for evil in (0xFFFFFFFF, len(chunk) + 1, 0):
        bad = bytearray(chunk)
        struct.pack_into("<I", bad, off + tiled.FRAME_DESC_SIZE, evil)
        with _pytest.raises(ValueError):
            tiled.TiledDecoder().decode(bytes(bad))

    # pristine stream still decodes after all the hostile attempts
    tiled.TiledDecoder().decode(chunk)
