"""Wavefront conformance encoder (tpu.wavefront): byte-exactness vs the
cpuref encoder (itself byte-exact vs the compiled reference oracle)."""

import numpy as np
import pytest

from cairo_tpu.cpuref.api import Evx1Encoder
from cairo_tpu.tpu.api import ConformanceTpuEncoder
from util_video import synth_frames


def assert_streams_equal(frames, quality=16, insert_intra_at=(),
                         quality_at=None):
    ce = Evx1Encoder()
    we = ConformanceTpuEncoder()
    ce.set_quality(quality)
    we.set_quality(quality)
    for t, f in enumerate(frames):
        if t in insert_intra_at:
            ce.insert_intra()
            we.insert_intra()
        if quality_at and t in quality_at:
            ce.set_quality(quality_at[t])
            we.set_quality(quality_at[t])
        a = ce.encode(f)
        b = we.encode(f)
        assert a == b, f"frame {t}: stream bytes diverge"


def test_ip_gop():
    assert_streams_equal(synth_frames(64, 48, 4))


@pytest.mark.slow
def test_multi_reference():
    assert_streams_equal(synth_frames(96, 64, 6))


def test_quality_extremes_and_changes():
    assert_streams_equal(synth_frames(64, 48, 5), quality=1,
                         quality_at={2: 31, 3: 8})


def test_insert_intra():
    assert_streams_equal(synth_frames(64, 48, 5), insert_intra_at={3})


def test_noiseless_copy_blocks_and_stale_fields():
    assert_streams_equal(synth_frames(64, 48, 5, noise=0))


@pytest.mark.slow
def test_nonaligned_dims():
    assert_streams_equal(synth_frames(72, 40, 3))


@pytest.mark.slow
def test_cif():
    assert_streams_equal(synth_frames(176, 144, 3))


@pytest.mark.slow
def test_720p_vs_oracle_direct():
    """Pins the flagship claim at scale: one 720p intra + one inter frame
    from ConformanceTpuEncoder, byte-exact vs the COMPILED reference
    encoder (masking only its documented uninitialized bits — header pad
    byte 7 and unused tail-bit garbage, BASELINE.md). The CIF-and-below
    tests compare against cpuref; this one goes straight to the oracle at
    a driver-relevant resolution (VERDICT r3 item 8)."""
    from oracle import OracleEncoder
    from util_video import assert_streams_equal as assert_oracle_equal

    frames = synth_frames(1280, 720, 2)
    oe = OracleEncoder()
    oe.set_quality(16)
    enc = ConformanceTpuEncoder()
    enc.set_quality(16)
    for t, f in enumerate(frames):
        ours = enc.encode(f)
        ref, ref_bits = oe.encode(f)
        assert_oracle_equal(ours, ref, ref_bits, t, t == 0)
