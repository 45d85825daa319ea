"""Adversarial-input hardening of the native parsers (entropy.cpp,
decoder.cpp): random bytes, truncated valid streams, and bit-flipped valid
streams must either decode or raise — never hang and never write outside
the caller's buffers. The reference has no such guards outside debug
builds (base.h:181-192), so this is a capability the TPU build adds."""

import numpy as np
import pytest

from cairo_tpu import native
from cairo_tpu.blocktypes import BlockTable
from cairo_tpu.cpuref.api import Evx1Encoder, FRAME_DESC_SIZE, HEADER_SIZE


W, H = 64, 48
WB, HB = W // 16, H // 16
N = WB * HB


def _planes():
    return (np.zeros((H, W), np.int16), np.zeros((H // 2, W // 2), np.int16),
            np.zeros((H // 2, W // 2), np.int16))


def _valid_slice():
    rng = np.random.default_rng(5)
    enc = Evx1Encoder()
    enc.set_quality(12)
    frame = rng.integers(0, 255, (H, W, 3)).astype(np.uint8)
    chunk = enc.encode(frame)
    return chunk[HEADER_SIZE + FRAME_DESC_SIZE:]


GUARD_ROWS = 8


def _try_decode(data: bytes):
    bt = BlockTable.zeros(N)
    # guard rows AFTER each plane (the parser gets the contiguous leading
    # view): an out-of-bounds write past a plane's end lands in the
    # sentinel region and fails the check below
    bufs = [np.full((H + GUARD_ROWS, W), 0x5A5A, np.uint16).view(np.int16),
            np.full((H // 2 + GUARD_ROWS, W // 2), 0x5A5A,
                    np.uint16).view(np.int16),
            np.full((H // 2 + GUARD_ROWS, W // 2), 0x5A5A,
                    np.uint16).view(np.int16)]
    y, u, v = bufs[0][:H], bufs[1][:H // 2], bufs[2][:H // 2]
    y[:], u[:], v[:] = 0, 0, 0
    try:
        native.decode_slice(data, 0, bt, y, u, v)
    except ValueError:
        pass
    for b, h in zip(bufs, (H, H // 2, H // 2)):
        assert np.all(b[h:].view(np.uint16) == 0x5A5A), \
            "parser wrote past the end of a plane"


def test_random_bytes_never_hang():
    rng = np.random.default_rng(0)
    for size in (0, 1, 7, 64, 400, 5000):
        for _ in range(8):
            _try_decode(rng.integers(0, 256, size).astype(np.uint8).tobytes())


def test_truncated_valid_slices():
    data = _valid_slice()
    for cut in range(0, len(data), max(1, len(data) // 40)):
        _try_decode(data[:cut])


def test_bitflipped_valid_slices():
    data = bytearray(_valid_slice())
    rng = np.random.default_rng(1)
    for _ in range(64):
        pos = int(rng.integers(0, len(data) * 8))
        flipped = bytearray(data)
        flipped[pos // 8] ^= 1 << (pos % 8)
        _try_decode(bytes(flipped))


def test_native_decoder_rejects_hostile_tables():
    dec = native.NativeDecoder(W, H)
    y, u, v = _planes()

    bt = BlockTable.zeros(N)
    bt.block_type[:] = 1  # INTRA_DEFAULT
    bt.q_index[:] = 16
    bt.q_index[3] = 200  # out of the 32-entry dc/alpha/beta tables
    with pytest.raises(ValueError):
        dec.decode_frame(bt, y, u, v, 0, W, H)

    bt = BlockTable.zeros(N)
    bt.block_type[:] = 2  # INTER_MOTION-ish: motion bit set
    bt.q_index[:] = 16
    bt.motion_x[:] = 0
    bt.motion_x[1] = 30000  # way outside the frame
    with pytest.raises(ValueError):
        dec.decode_frame(bt, y, u, v, 0, W, H)

    bt = BlockTable.zeros(N)
    bt.block_type[:] = 2
    bt.q_index[:] = 16
    bt.motion_y[0] = -17  # one block reaching just above the frame
    with pytest.raises(ValueError):
        dec.decode_frame(bt, y, u, v, 0, W, H)

    # sp neighbor reaching outside via the sub-pel direction
    bt = BlockTable.zeros(N)
    bt.block_type[:] = 2
    bt.q_index[:] = 16
    bt.sp_pred[0] = True
    bt.sp_index[0] = 0  # direction (-1, -1) at block (0, 0)
    with pytest.raises(ValueError):
        dec.decode_frame(bt, y, u, v, 0, W, H)

    # a clean table still decodes after the rejections (state untouched)
    bt = BlockTable.zeros(N)
    bt.block_type[:] = 1
    bt.q_index[:] = 16
    rgb = dec.decode_frame(bt, y, u, v, 0, W, H)
    assert rgb.shape == (H, W, 3)


def test_valid_slice_still_roundtrips():
    """The hardening must not reject legal streams."""
    data = _valid_slice()
    bt = BlockTable.zeros(N)
    y, u, v = _planes()
    bits = native.decode_slice(data, 0, bt, y, u, v)
    assert bits > 0
