"""TPU engine conformance.

The fast-mode encoder emits different (parallel-decision) streams than the
reference encoder, but they must be 100% format-conformant: the ORACLE
decoder, the cpuref decoder and the TPU decoder must all reconstruct them to
identical RGB. TPU decode of reference-encoder streams goes through the
sequential fallback and must match the oracle decoder.
"""

import numpy as np
import pytest

from oracle import OracleDecoder, OracleEncoder
from cairo_tpu.cpuref.api import Evx1Decoder
from cairo_tpu.tpu.api import TpuDecoder, TpuEncoder
from util_video import synth_frames


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 10 * np.log10(255 ** 2 / max(mse, 1e-12))


@pytest.mark.parametrize("quality", [8, 16, 31])
def test_fast_stream_is_conformant(quality):
    w, h = 96, 64
    frames = synth_frames(w, h, 5)
    enc = TpuEncoder(); enc.set_quality(quality)
    oracle_dec = OracleDecoder()
    cpu_dec = Evx1Decoder()
    tpu_dec = TpuDecoder()
    for t, frame in enumerate(frames):
        chunk = enc.encode(frame)
        ref_rgb = oracle_dec.decode(chunk, w, h)
        cpu_rgb = cpu_dec.decode(chunk)
        tpu_rgb = tpu_dec.decode(chunk)
        np.testing.assert_array_equal(cpu_rgb, ref_rgb,
                                      err_msg=f"cpuref decode frame {t}")
        np.testing.assert_array_equal(tpu_rgb, ref_rgb,
                                      err_msg=f"tpu decode frame {t}")
        # the oracle encoder itself scores 25.1-26.9 dB at q16 on this content
        assert _psnr(ref_rgb, frame) > 24 - (quality - 16) / 4, \
            f"quality too low frame {t}"


@pytest.mark.slow
def test_fast_stream_nonaligned_dims():
    w, h = 72, 40
    frames = synth_frames(w, h, 3)
    enc = TpuEncoder(); enc.set_quality(16)
    oracle_dec = OracleDecoder()
    tpu_dec = TpuDecoder()
    for t, frame in enumerate(frames):
        chunk = enc.encode(frame)
        ref_rgb = oracle_dec.decode(chunk, w, h)
        tpu_rgb = tpu_dec.decode(chunk)
        np.testing.assert_array_equal(tpu_rgb, ref_rgb, err_msg=f"frame {t}")


def test_tpu_decodes_reference_streams():
    # reference streams contain intra-motion blocks -> sequential fallback
    w, h = 64, 48
    frames = synth_frames(w, h, 4)
    oe = OracleEncoder(); oe.set_quality(16)
    od = OracleDecoder()
    tpu_dec = TpuDecoder()
    for t, frame in enumerate(frames):
        chunk, _ = oe.encode(frame)
        ref_rgb = od.decode(chunk, w, h)
        tpu_rgb = tpu_dec.decode(chunk)
        np.testing.assert_array_equal(tpu_rgb, ref_rgb, err_msg=f"frame {t}")


def test_insert_intra_and_quality_change():
    w, h = 64, 48
    frames = synth_frames(w, h, 5)
    enc = TpuEncoder(); enc.set_quality(16)
    oracle_dec = OracleDecoder()
    tpu_dec = TpuDecoder()
    for t, frame in enumerate(frames):
        if t == 2:
            enc.insert_intra()
            enc.set_quality(24)
        chunk = enc.encode(frame)
        ref_rgb = oracle_dec.decode(chunk, w, h)
        tpu_rgb = tpu_dec.decode(chunk)
        np.testing.assert_array_equal(tpu_rgb, ref_rgb, err_msg=f"frame {t}")
