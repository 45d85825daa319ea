"""Wavefront device decode of reference-origin (intra-motion) streams:
TpuDecoder must reproduce the oracle decoder's RGB exactly WITHOUT ever
engaging the native sequential fallback (VERDICT r3 item 2 — conformance
decode on the TPU instead of host C++). Matches
/root/reference/decode.cpp:15-144,146-170 behavior through the compacted
anti-diagonal schedule (tpu/wavefront.py conformance_decode_step)."""

import numpy as np
import pytest

from oracle import OracleDecoder, OracleEncoder
from cairo_tpu.blocktypes import INTRA_BIT, MOTION_BIT
from cairo_tpu.tpu.api import TpuDecoder, TpuEncoder
from util_video import synth_frames


def test_wavefront_decode_matches_oracle():
    """Pure reference streams: every frame decodes on the device path."""
    w, h = 96, 64
    frames = synth_frames(w, h, 5)
    oe = OracleEncoder()
    oe.set_quality(12)
    od = OracleDecoder()
    dec = TpuDecoder()
    saw_intra_motion = False
    for t, frame in enumerate(frames):
        chunk, _ = oe.encode(frame)
        ref_rgb = od.decode(chunk, w, h)
        got = dec.decode(chunk)
        np.testing.assert_array_equal(got, ref_rgb, err_msg=f"frame {t}")
        bt = dec._bt.block_type
        saw_intra_motion |= bool(np.any(
            (bt & INTRA_BIT).astype(bool) & (bt & MOTION_BIT).astype(bool)))
    assert dec._native is None  # never fell back to host
    assert saw_intra_motion     # the wave loop actually had work


def test_wavefront_decode_quality_sweep():
    w, h = 64, 48
    frames = synth_frames(w, h, 2, seed=9)
    for q in (1, 8, 21, 31):
        oe = OracleEncoder()
        oe.set_quality(q)
        od = OracleDecoder()
        dec = TpuDecoder()
        for t, frame in enumerate(frames):
            chunk, _ = oe.encode(frame)
            np.testing.assert_array_equal(
                dec.decode(chunk), od.decode(chunk, w, h),
                err_msg=f"q {q} frame {t}")
        assert dec._native is None


def test_wavefront_decode_mixed_stream_state_continuity():
    """Fast-mode frames (decode_step_coo) followed by reference frames
    (conformance_decode_step) share one device ring: the handoff between
    the two jitted paths must be exact."""
    import struct

    from cairo_tpu.cpuref.api import (_FRAME_FMT, FRAME_DESC_SIZE,
                                      HEADER_SIZE)
    from cairo_tpu.cpuref.api import Evx1Decoder

    w, h = 64, 48
    frames = synth_frames(w, h, 6)
    enc = TpuEncoder()
    enc.set_quality(16)
    oe = OracleEncoder()
    oe.set_quality(16)
    chunks = [enc.encode(f) for f in frames[:3]]
    ref_chunks = [oe.encode(f)[0] for f in frames[3:]]
    fixed = []
    for k, c in enumerate(ref_chunks):
        off = HEADER_SIZE if k == 0 else 0
        ftype, _, q = struct.unpack(_FRAME_FMT, c[off:off + FRAME_DESC_SIZE])
        fixed.append(struct.pack(_FRAME_FMT, ftype, 3 + k, q)
                     + c[off + FRAME_DESC_SIZE:])
    chunks += fixed

    cpu = Evx1Decoder()
    tpu = TpuDecoder()
    for t, c in enumerate(chunks):
        a = cpu.decode(c)
        b = tpu.decode(c)
        np.testing.assert_array_equal(b, a, err_msg=f"frame {t}")
    assert tpu._native is None


@pytest.mark.slow
def test_wavefront_decode_larger_frame():
    """256x160 busy content, quality 8: broad differential vs the oracle
    on the device wavefront path."""
    w, h = 256, 160
    frames = synth_frames(w, h, 6, seed=17)
    oe = OracleEncoder()
    oe.set_quality(8)
    od = OracleDecoder()
    dec = TpuDecoder()
    for t, frame in enumerate(frames):
        chunk, _ = oe.encode(frame)
        np.testing.assert_array_equal(
            dec.decode(chunk), od.decode(chunk, w, h), err_msg=f"frame {t}")
    assert dec._native is None


def test_below_left_stale_intra_motion_read():
    """A crafted stream whose intra-motion block points below-left
    (cx <= px-16 with cy > py-16, legal per motion.cpp:238-241): the
    candidate pixels are raster SUCCESSORS, so decode must read the ring
    slot's pre-frame (stale) content there — not the pixels the dense
    phase already reconstructed. Pinned after a 1080p-only round-4 bug
    where the wavefront decoder composed its read windows wrongly."""
    import struct

    from cairo_tpu import native
    from cairo_tpu.blocktypes import BlockTable
    from cairo_tpu.cpuref.api import _FRAME_FMT, pack_header
    from cairo_tpu.cpuref.api import Evx1Decoder

    w, h = 96, 64
    wb, hb = w // 16, h // 16
    n = wb * hb
    rng = np.random.default_rng(3)

    def slice_bytes(bt, cy, cu, cv):
        payload, _ = native.encode_slice(bt, cy, cu, cv)
        return payload

    # frame 0: all INTRA_DEFAULT with random small coefficients
    bt0 = BlockTable.zeros(n)
    bt0.block_type[:] = 1
    bt0.q_index[:] = 16
    cy = rng.integers(-9, 10, (h, w)).astype(np.int16)
    cu = rng.integers(-9, 10, (h // 2, w // 2)).astype(np.int16)
    cv = rng.integers(-9, 10, (h // 2, w // 2)).astype(np.int16)
    chunk0 = pack_header(w, h) + struct.pack(_FRAME_FMT, 0, 0, 16) + \
        slice_bytes(bt0, cy, cu, cv)

    # frame 1: everything INTRA_DEFAULT (dense, nonzero) except one
    # intra-motion block whose vector reaches below-left
    bt1 = BlockTable.zeros(n)
    bt1.block_type[:] = 1
    bt1.q_index[:] = 16
    b = 2  # block (bi=2, bj=0)
    bt1.block_type[b] = 1 | 2  # INTRA | MOTION
    bt1.motion_x[b] = -32
    bt1.motion_y[b] = 8       # below-left: cy = py+8 > py-16, cx = px-32
    cy1 = rng.integers(-9, 10, (h, w)).astype(np.int16)
    cu1 = rng.integers(-9, 10, (h // 2, w // 2)).astype(np.int16)
    cv1 = rng.integers(-9, 10, (h // 2, w // 2)).astype(np.int16)
    chunk1 = struct.pack(_FRAME_FMT, 1, 1, 16) + \
        slice_bytes(bt1, cy1, cu1, cv1)

    cpu = Evx1Decoder()
    tpu = TpuDecoder()
    for t, c in enumerate((chunk0, chunk1)):
        a = cpu.decode(c)
        g = tpu.decode(c)
        np.testing.assert_array_equal(g, a, err_msg=f"frame {t}")
    assert tpu._native is None


def test_wavefront_decode_dense_on_coo_overflow(monkeypatch):
    """Streams whose residual volume exceeds the COO head must STILL decode
    on the device wave path via the dense-coefficient upload
    (conformance_decode_step_dense) — the reference decoder handles every
    conformant stream at full speed (decode.cpp:146-170), so no legal
    quality may drop to the sequential native fallback. The COO capacity is
    shrunk to force the overflow branch on a small stream."""
    from cairo_tpu.tpu import wire as wire_mod

    monkeypatch.setattr(wire_mod, "COO_K", 64)
    monkeypatch.setattr(wire_mod, "COO_SMALL", 64)
    w, h = 64, 48
    frames = synth_frames(w, h, 3, seed=3)
    oe = OracleEncoder()
    oe.set_quality(2)          # heavy residuals
    od = OracleDecoder()
    dec = TpuDecoder()
    for t, frame in enumerate(frames):
        chunk, _ = oe.encode(frame)
        np.testing.assert_array_equal(
            dec.decode(chunk), od.decode(chunk, w, h),
            err_msg=f"frame {t}")
    assert dec._native is None  # the dense wave path handled the overflow
