"""Differential tests: cairo_tpu.analysis (the analysis.h:40-221 metric
surface, incl. the as-built variance quirks) and entropy.bitio.BitStream
(bit_stream seek/peek/assign parity, bitstream.h:43-92) vs the compiled
reference oracle."""

import numpy as np
import pytest

import oracle_units as ou
from cairo_tpu import analysis
from cairo_tpu.entropy.bitio import BitStream


def _blocks(seed, n=24, extremes=True):
    rng = np.random.default_rng(seed)
    b = rng.integers(-512, 512, (n, 16, 16)).astype(np.int16)
    if extremes:
        b[0] = 0
        b[1] = -32768
        b[2] = 32767
        b[3, ::2] = 0
    return b


@pytest.mark.parametrize("seed", [0, 1])
def test_metrics_match_reference(seed):
    left = _blocks(seed)
    right = _blocks(seed + 100)
    lu = _blocks(seed + 7)[:, :8, :8]
    lv = _blocks(seed + 8)[:, :8, :8]
    ru = _blocks(seed + 9)[:, :8, :8]
    rv = _blocks(seed + 10)[:, :8, :8]

    got = dict(
        sad2=analysis.block_sad(left, right),
        sad1=analysis.block_sad(left),
        mse=analysis.block_mse(left, right),
        ssd=analysis.block_ssd(left, right),
        mad=analysis.block_mad(left, lu, lv, right, ru, rv),
        mean=analysis.block_mean(left),
        nzmean=analysis.nonzero_block_mean(left),
        var=analysis.block_variance(left),
        var2=analysis.block_variance2(left),
        var3=analysis.block_variance3(left),
    )
    for k in range(len(left)):
        want = dict(
            sad2=ou.block_sad(left[k], right[k]),
            sad1=ou.block_sad(left[k]),
            mse=ou.block_mse(left[k], right[k]),
            ssd=ou.block_ssd(left[k], right[k]),
            mad=ou.block_mad(left[k], lu[k], lv[k],
                             right[k], ru[k], rv[k]),
            mean=ou.block_mean(left[k]),
            nzmean=ou.nonzero_block_mean(left[k]),
            var=ou.block_variance(left[k]),
            var2=ou.block_variance2(left[k]),
            var3=ou.block_variance3(left[k]),
        )
        for name, w in want.items():
            assert int(got[name][k]) == int(w), (name, k)


def test_bitstream_roundtrip_and_quirks():
    bs = BitStream(256)
    assert bs.query_capacity() == 256
    assert bs.is_empty() and not bs.is_full()
    assert bs.write_byte(0xC5)
    assert bs.write_bit(1)
    assert bs.write_bits(bytes([0b1011]), 4)
    assert bs.query_occupancy() == 13
    assert bs.query_byte_occupancy() == 2

    assert bs.peek_byte() == 0xC5
    assert bs.read_byte() == 0xC5
    assert bs.peek_bit() == 1 == bs.read_bit()
    assert bs.read_bits(4) == bytes([0b1011])
    assert bs.is_empty()
    assert bs.read_bit() is None  # reads past write fail like the C

    # capacity-checked writes
    small = BitStream(8)
    assert small.write_byte(1)
    assert small.is_full()
    assert not small.write_bit(0)

    # assign copies an external buffer and marks it fully written
    bs2 = BitStream(data=b"\x21\x43")
    assert bs2.query_occupancy() == 16
    assert bs2.read_byte() == 0x21

    # the documented seek quirk: a seek at/past the write index lands the
    # read index at write_index + offset (bitstream.cpp:87-95)
    bs3 = BitStream(data=b"\xff\xff")
    bs3.seek(4)
    assert bs3.read_index == 4
    bs3.seek(20)
    assert bs3.read_index == 36

    # unaligned write/read path
    bs4 = BitStream(64)
    bs4.write_bit(1)
    bs4.write_byte(0xA7)
    assert bs4.read_bit() == 1
    assert bs4.read_byte() == 0xA7


def test_format_macroblock():
    y = np.arange(256).reshape(16, 16) - 100
    s = analysis.format_macroblock(y, y[:8, :8], y[:8, :8])
    assert "Y (16x16):" in s and "U (8x8):" in s and "-100" in s
