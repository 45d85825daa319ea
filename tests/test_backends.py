"""Differential tests: the four lossless backends vs the reference oracle.

Each backend must produce byte-identical streams to stream.cpp and decode
the oracle's streams exactly (and vice versa).
"""

import numpy as np
import oracle_units as OU
import pytest

from cairo_tpu.entropy import backends as B
from cairo_tpu.entropy.abac import EntropyCoder
from cairo_tpu.entropy.bitio import BitReader, BitWriter

RNG = np.random.default_rng(42)


def test_huffman_roundtrip_vs_oracle():
    values = RNG.integers(0, 8, 500).astype(np.uint8)
    ref_bytes, ref_bits = OU.huffman_encode(values)

    out = BitWriter()
    B.huffman_encode_values(values, out)
    assert out.bit_count == ref_bits
    assert out.getvalue() == ref_bytes

    got = B.huffman_decode_values(BitReader(ref_bytes, ref_bits), len(values))
    np.testing.assert_array_equal(got, values)
    np.testing.assert_array_equal(
        OU.huffman_decode(out.getvalue(), out.bit_count, len(values)), values)


@pytest.mark.parametrize("signed", [False, True])
def test_golomb_stream_vs_oracle(signed):
    if signed:
        values = np.concatenate([
            RNG.integers(-300, 300, 400),
            [-32767, -128, -1, 0, 1, 127, 128, 255, 256, 32767],
        ]).astype(np.int16)
    else:
        # 65535 is outside the defined domain: its 33-bit code overflows the
        # reference's uint32 staging (golomb.cpp:40-52).
        values = np.concatenate([
            RNG.integers(0, 600, 400), [0, 1, 255, 256, 257, 32768, 65534],
        ]).astype(np.uint16).view(np.int16)
    ref_bytes, ref_bits = OU.golomb_encode(values, signed=signed)

    out = BitWriter()
    vals = values if signed else values.view(np.uint16)
    B.golomb_encode_values(vals, out, signed=signed)
    assert (out.getvalue(), out.bit_count) == (ref_bytes, ref_bits)

    got = B.golomb_decode_values(BitReader(ref_bytes, ref_bits), len(values),
                                 signed=signed)
    np.testing.assert_array_equal(got.view(np.uint16),
                                  values.view(np.uint16))
    # No oracle-decode cross-check: the reference's plain-stream decoders
    # are broken (unused by its own pipeline) — signed seeks 3*zc+1 bits per
    # value (golomb.cpp:150-158), unsigned mis-decodes values >= 256, spins
    # forever >= 32768, and its min(32, byte-occupancy) peek (stream.cpp:177)
    # corrupts values near the stream tail. The encoder defines the wire
    # format and is matched byte-exactly above; our decoder round-trips the
    # full domain.


@pytest.mark.parametrize("mode,signed", [(0, True), (1, False)])
def test_entropy_values_vs_oracle(mode, signed):
    if signed:
        values = np.concatenate([
            RNG.integers(-40, 40, 300), [-32767, 0, 1, -1, 255, -255],
        ]).astype(np.int16)
    else:
        values = np.concatenate([
            RNG.integers(0, 80, 300), [0, 1, 255, 256, 4095],
        ]).astype(np.int16)
    ref_bytes, ref_bits = OU.entropy_encode(values, mode)

    coder = EntropyCoder()
    out = BitWriter()
    for v in values:
        B.entropy_encode_value(int(v) if signed else int(v) & 0xFFFF,
                               coder, out, signed=signed)
    coder.finish_encode(out)
    assert (out.getvalue(), out.bit_count) == (ref_bytes, ref_bits)

    coder = EntropyCoder()
    src = BitReader(ref_bytes, ref_bits)
    coder.start_decode(src)
    got = np.asarray([
        B.entropy_decode_value(coder, src, signed=signed) for _ in values
    ], np.int32)
    want = values if signed else values.view(np.uint16)
    np.testing.assert_array_equal(got & 0xFFFF,
                                  np.asarray(want).astype(np.int32) & 0xFFFF)

    np.testing.assert_array_equal(
        OU.entropy_decode(out.getvalue(), out.bit_count, len(values), mode),
        values)


@pytest.mark.parametrize("size,mode", [(4, 2), (8, 3), (16, 4)])
def test_zigzag_block_coders_vs_oracle(size, mode):
    blocks = RNG.integers(-50, 50, (6, size, size)).astype(np.int16)
    blocks[1] = 0
    blocks[2, 0, 0] = -32767
    ref_bytes, ref_bits = OU.entropy_encode(blocks.reshape(len(blocks), -1),
                                            mode)

    coder = EntropyCoder()
    out = BitWriter()
    for b in blocks:
        B.entropy_encode_block(b, coder, out)
    coder.finish_encode(out)
    assert (out.getvalue(), out.bit_count) == (ref_bytes, ref_bits)

    coder = EntropyCoder()
    src = BitReader(ref_bytes, ref_bits)
    coder.start_decode(src)
    got = np.stack([B.entropy_decode_block(size, coder, src) for _ in blocks])
    np.testing.assert_array_equal(got, blocks)

    np.testing.assert_array_equal(
        OU.entropy_decode(out.getvalue(), out.bit_count, len(blocks),
                          mode).reshape(blocks.shape), blocks)


def test_rle_8x8_vs_oracle():
    blocks = RNG.integers(-30, 30, (8, 8, 8)).astype(np.int16)
    blocks[0] = 0
    blocks[1, 7, 7] = 5          # full run
    blocks[2] *= RNG.integers(0, 2, (8, 8)).astype(np.int16)  # sparse
    ref_bytes, ref_bits = OU.entropy_encode(blocks.reshape(len(blocks), -1), 5)

    coder = EntropyCoder()
    out = BitWriter()
    for b in blocks:
        B.entropy_rle_encode_8x8(b, coder, out)
    coder.finish_encode(out)
    assert (out.getvalue(), out.bit_count) == (ref_bytes, ref_bits)

    coder = EntropyCoder()
    src = BitReader(ref_bytes, ref_bits)
    coder.start_decode(src)
    got = np.stack([B.entropy_rle_decode_8x8(coder, src) for _ in blocks])
    np.testing.assert_array_equal(got, blocks)
