"""End-to-end conformance: numpy engine vs the reference oracle.

Covers driver configs 1-4 at small resolutions (the numpy engine is the
correctness anchor; speed comes from the TPU and native engines).
"""

import numpy as np
import pytest

from oracle import OracleDecoder, OracleEncoder
from cairo_tpu.cpuref.api import Evx1Decoder, Evx1Encoder
from util_video import assert_streams_equal, synth_frames


def run_conformance(width, height, n_frames, quality, seed=7, noise=4,
                    insert_intra_at=None):
    frames = synth_frames(width, height, n_frames, seed=seed, noise=noise)
    oracle_enc = OracleEncoder()
    oracle_enc.set_quality(quality)
    oracle_dec = OracleDecoder()
    ours_enc = Evx1Encoder()
    ours_enc.set_quality(quality)
    ours_dec = Evx1Decoder()

    for t, frame in enumerate(frames):
        if insert_intra_at is not None and t in insert_intra_at:
            oracle_enc.insert_intra()
            ours_enc.insert_intra()
        ref_chunk, ref_bits = oracle_enc.encode(frame)
        our_chunk = ours_enc.encode(frame)
        assert_streams_equal(our_chunk, ref_chunk, ref_bits, t, t == 0)

        ref_rgb = oracle_dec.decode(ref_chunk, width, height)
        our_rgb = ours_dec.decode(our_chunk)
        np.testing.assert_array_equal(our_rgb, ref_rgb,
                                      err_msg=f"decode mismatch frame {t}")


def test_intra_only_small():
    # config 1 (shrunk): first frame is always intra
    run_conformance(64, 48, 1, 16)


def test_ip_gop_small():
    # config 2 (shrunk): I then P frames with motion search
    run_conformance(64, 48, 4, 16)


def test_multi_reference_sequence():
    # config 3 (shrunk): enough P-frames that offsets 2,3 reference real data
    run_conformance(96, 64, 6, 16)


# includes both DC-scale breakpoints (qp<5, qp<9/<25 edges,
# quantize.cpp:37-55) and both MAD-threshold steps
@pytest.mark.parametrize("quality", [1, 2, 4, 5, 8, 9, 16, 24, 25, 31])
def test_quality_sweep(quality):
    run_conformance(64, 48, 3, quality)


@pytest.mark.parametrize("quality", [q for q in range(1, 32)
                                     if q not in (1, 2, 4, 5, 8, 9, 16, 24,
                                                  25, 31)])
def test_quality_sweep_full(quality):
    """Target 3: bit-exactness at every quality 1-31 (the remaining
    values; the default suite covers the breakpoint qualities)."""
    run_conformance(64, 48, 3, quality)


def test_insert_intra_recovery():
    run_conformance(64, 48, 5, 16, insert_intra_at={3})


def test_nonaligned_dimensions():
    # 72x40: width/height not multiples of 16 -> padded context
    run_conformance(72, 40, 3, 16)


def test_noiseless_content_many_copy_blocks():
    run_conformance(64, 48, 4, 16, noise=0)


def test_cif_intra_and_p():
    # closer to driver config 1/2 scale (kept short: numpy engine is slow)
    run_conformance(352, 288, 2, 16)
