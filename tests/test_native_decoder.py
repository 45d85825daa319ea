"""Differential tests for the native C++ sequential decoder (decoder.cpp)
against the cpuref numpy anchor and the reference oracle."""

import numpy as np

from oracle import OracleDecoder, OracleEncoder
from cairo_tpu.cpuref.api import Evx1Decoder
from cairo_tpu.tpu.api import TpuDecoder
from util_video import synth_frames


def test_native_decoder_matches_oracle_on_reference_streams():
    """Reference-encoder streams (intra-motion blocks everywhere) through
    TpuDecoder with the device path disabled take the native sequential
    path and must reproduce the oracle's RGB output exactly."""
    w, h = 96, 64
    frames = synth_frames(w, h, 5)
    oe = OracleEncoder()
    oe.set_quality(12)
    od = OracleDecoder()
    dec = TpuDecoder()
    dec.use_wavefront_decode = False
    for t, frame in enumerate(frames):
        chunk, _ = oe.encode(frame)
        ref_rgb = od.decode(chunk, w, h)
        got = dec.decode(chunk)
        np.testing.assert_array_equal(got, ref_rgb, err_msg=f"frame {t}")
    assert dec._native is not None  # the native path actually ran


def test_native_decoder_matches_cpuref_mixed_stream():
    """A stream that starts fast-mode (device path) and then needs the
    fallback mid-stream: the device->native ring handoff must be exact."""
    from cairo_tpu.tpu.api import TpuEncoder

    w, h = 64, 48
    frames = synth_frames(w, h, 6)
    enc = TpuEncoder()
    enc.set_quality(16)
    oe = OracleEncoder()
    oe.set_quality(16)

    # fast-mode frames 0-2 from our encoder, then reference frames 3-5
    # (fresh intra at 3 via the oracle's first frame)
    chunks = [enc.encode(f) for f in frames[:3]]
    ref_chunks = [oe.encode(f)[0] for f in frames[3:]]
    # renumber the oracle frames to continue the stream
    import struct
    from cairo_tpu.cpuref.api import _FRAME_FMT, FRAME_DESC_SIZE, HEADER_SIZE
    fixed = []
    for k, c in enumerate(ref_chunks):
        off = HEADER_SIZE if k == 0 else 0
        ftype, _, q = struct.unpack(_FRAME_FMT, c[off:off + FRAME_DESC_SIZE])
        fixed.append(struct.pack(_FRAME_FMT, ftype, 3 + k, q)
                     + c[off + FRAME_DESC_SIZE:])
    chunks += fixed

    cpu = Evx1Decoder()
    tpu = TpuDecoder()
    tpu.use_wavefront_decode = False
    for t, c in enumerate(chunks):
        a = cpu.decode(c)
        b = tpu.decode(c)
        np.testing.assert_array_equal(b, a, err_msg=f"frame {t}")
    assert tpu._native is not None
