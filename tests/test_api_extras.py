"""Checkpoint/resume, peek views, metrics, and pipelined encode.

Checkpoint contract: a session restored from a mid-stream checkpoint must
continue emitting the byte-identical stream the uninterrupted session would
have produced (the ring + carried planes + block table are the complete
codec state, common.h:104-131 / FORMAT.md §4).
"""

import numpy as np
import pytest

from cairo_tpu import checkpoint, metrics
from cairo_tpu.cpuref.api import Evx1Decoder, Evx1Encoder
from util_video import synth_frames

W, H = 64, 48


def _frames(n=7):
    return synth_frames(W, H, n, seed=11)


def test_cpuref_encoder_checkpoint_resume():
    frames = _frames()
    enc = Evx1Encoder()
    enc.set_quality(12)
    chunks = [enc.encode(f) for f in frames[:4]]
    blob = checkpoint.dump_state(enc)
    rest = [enc.encode(f) for f in frames[4:]]

    enc2 = checkpoint.load_state(Evx1Encoder(), blob)
    rest2 = [enc2.encode(f) for f in frames[4:]]
    assert [r.hex() for r in rest2] == [r.hex() for r in rest]

    # and the full resumed stream decodes
    dec = Evx1Decoder()
    for c in chunks + rest2:
        out = dec.decode(c)
    assert out.shape == (H, W, 3)


def test_cpuref_decoder_checkpoint_resume():
    frames = _frames()
    enc = Evx1Encoder()
    chunks = [enc.encode(f) for f in frames]

    dec = Evx1Decoder()
    for c in chunks[:4]:
        dec.decode(c)
    blob = checkpoint.dump_state(dec)
    want = [dec.decode(c) for c in chunks[4:]]

    dec2 = checkpoint.load_state(Evx1Decoder(), blob)
    got = [dec2.decode(c) for c in chunks[4:]]
    for a, b in zip(got, want):
        np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_tpu_encoder_checkpoint_resume():
    from cairo_tpu.tpu.api import TpuDecoder, TpuEncoder

    frames = _frames()
    enc = TpuEncoder()
    enc.set_quality(10)
    chunks = [enc.encode(f) for f in frames[:4]]
    blob = checkpoint.dump_state(enc)
    rest = [enc.encode(f) for f in frames[4:]]

    enc2 = checkpoint.load_state(TpuEncoder(), blob)
    rest2 = [enc2.encode(f) for f in frames[4:]]
    assert [r.hex() for r in rest2] == [r.hex() for r in rest]

    # decoder checkpoint: restore mid-stream, outputs must match
    dec = TpuDecoder()
    for c in chunks:
        dec.decode(c)
    dblob = checkpoint.dump_state(dec)
    want = [dec.decode(c) for c in rest]
    dec2 = checkpoint.load_state(TpuDecoder(), dblob)
    got = [dec2.decode(c) for c in rest]
    for a, b in zip(got, want):
        np.testing.assert_array_equal(a, b)


def test_tpu_encode_many_pipelined_matches_serial():
    from cairo_tpu.tpu.api import TpuEncoder

    frames = _frames(6)
    enc_a = TpuEncoder()
    serial = [enc_a.encode(f) for f in frames]
    enc_b = TpuEncoder()
    piped = list(enc_b.encode_many(frames))
    assert [c.hex() for c in piped] == [c.hex() for c in serial]


def test_peek_views_and_stats():
    from cairo_tpu.tpu.api import TpuEncoder

    frames = _frames(3)
    cpu = Evx1Encoder()
    tpu = TpuEncoder()
    for f in frames:
        cpu.encode(f)
        tpu.encode(f)

    # NOTE: the two backends' peek images are NOT pixel-identical in general:
    # the fast-mode encoder (FORMAT.md §7) may legally classify a block
    # INTER_COPY where the exact engine picks INTRA_MOTION_COPY (etc.), so
    # only per-backend invariants are asserted below.
    for enc in (cpu, tpu):
        if hasattr(enc, "peek_source"):
            assert enc.peek_source().shape == (H, W, 3)
        assert enc.peek_destination().shape == (H, W, 3)
        bt_img = enc.peek_block_table()
        qt_img = enc.peek_quant_table()
        var_img = enc.peek_block_variance()
        sp_img = enc.peek_spmp_table()
        assert bt_img.shape == qt_img.shape == (H, W, 3)
        assert var_img.shape == sp_img.shape == (H, W, 3)
        # block maps are 16x16-constant
        assert np.all(bt_img[:16, :16] == bt_img[0, 0])
        # variance map: copy blocks red, others grayscale (evx1enc.cpp:248)
        red = np.all(var_img == (255, 0, 0), axis=-1)
        gray = (var_img[..., 0] == var_img[..., 1]) & \
               (var_img[..., 1] == var_img[..., 2])
        assert np.all(red | gray)
        # sub-pel map colors are only black/blue/green (evx1enc.cpp:274)
        palette = {(0, 0, 0), (0, 0, 255), (0, 255, 0)}
        assert {tuple(c) for c in sp_img.reshape(-1, 3)} <= palette

        stats = enc.last_stats
        assert stats["frame_index"] == 2 and stats["frame_type"] == "P"
        assert stats["bytes"] > 0 and stats["blocks"] == (W // 16) * (H // 16)
        assert sum(stats["block_types"].values()) == stats["blocks"]
        assert 0.0 <= stats["copy_ratio"] <= 1.0

    # peek_destination equals the decoder's view of the same stream
    # (encoder reconstruction == decoder reconstruction by construction)
    dec = Evx1Decoder()
    enc2 = Evx1Encoder()
    for f in frames:
        out = dec.decode(enc2.encode(f))
    np.testing.assert_array_equal(enc2.peek_destination(), out)


def test_copy_blocks_keep_stale_table_fields():
    """Copy blocks must carry the table's previous q_index/variance (the
    reference's clear_block_desc quirk, common.cpp:67-73) in both backends."""
    from cairo_tpu.blocktypes import COPY_BIT
    from cairo_tpu.tpu.api import TpuEncoder

    base = np.full((H, W, 3), 90, np.uint8)  # flat -> copy-grade matches
    base[16:32, 16:48] = 170
    frames = [base, base.copy(), base.copy()]
    for enc in (Evx1Encoder(), TpuEncoder()):
        tables_seen = []
        for f in frames:
            enc.encode(f)
            if hasattr(enc, "_last_out"):
                out = enc._last_out
                bt_type = out["block_type"].astype(np.int32)
                q = out["q_index"].copy()
                var = out["variance"].copy()
            else:
                bt = enc._ctx.block_table
                bt_type = bt.block_type.astype(np.int32)
                q = bt.q_index.copy()
                var = bt.variance.copy()
            tables_seen.append((bt_type, q, var))
        bt_type, q, var = tables_seen[-1]
        copy = (bt_type & COPY_BIT) != 0
        assert copy.any(), "static frames should produce copy blocks"
        _, prev_q, prev_var = tables_seen[-2]
        np.testing.assert_array_equal(q[copy], prev_q[copy])
        np.testing.assert_array_equal(var[copy], prev_var[copy])


def test_psnr_helper():
    a = np.zeros((8, 8), np.uint8)
    assert metrics.psnr(a, a) == float("inf")
    b = a.copy()
    b[0, 0] = 255
    assert 0 < metrics.psnr(a, b) < 40


def test_encoder_determinism_same_input_twice():
    """SURVEY §4.5: same input twice -> identical bytes (single-chip
    device pipeline; the tiled variant is test_tiled_stream_is_deterministic)."""
    from cairo_tpu.tpu.api import TpuEncoder
    from util_video import synth_frames

    frames = synth_frames(64, 48, 3)
    streams = []
    for _ in range(2):
        enc = TpuEncoder()
        enc.set_quality(16)
        streams.append(b"".join(enc.encode(f) for f in frames))
    assert streams[0] == streams[1]


def test_cluster_mesh_spec():
    from cairo_tpu.tpu import cluster

    spec = cluster.initialize(tiles_per_gop=4)  # single-process no-op
    assert spec.tiles_per_gop == 4 and spec.n_gops >= 1
    import pytest
    with pytest.raises(ValueError):
        cluster.initialize(tiles_per_gop=1024)


def test_conformance_encoder_checkpoint_resume():
    """Resuming the wavefront conformance encoder mid-stream must continue
    the exact byte stream the uninterrupted cpuref encoder produces."""
    from cairo_tpu import checkpoint
    from cairo_tpu.cpuref.api import Evx1Encoder
    from cairo_tpu.tpu.api import ConformanceTpuEncoder
    from util_video import synth_frames

    frames = synth_frames(64, 48, 5)
    ref = Evx1Encoder()
    ref.set_quality(16)
    want = [ref.encode(f) for f in frames]

    enc = ConformanceTpuEncoder()
    enc.set_quality(16)
    got = [enc.encode(f) for f in frames[:2]]
    blob = checkpoint.dump_state(enc)

    enc2 = ConformanceTpuEncoder()
    checkpoint.load_state(enc2, blob)
    got += [enc2.encode(f) for f in frames[2:]]
    assert got == want
