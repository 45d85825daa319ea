"""Runtime CodecConfig (config.h:36-54 feature matrix as runtime options).

Every combination must produce a self-consistent codec: the decoder (built
with the same config, as in the reference where both ends share config.h)
reproduces the encoder's reconstruction exactly.
"""

import numpy as np
import pytest

from cairo_tpu.config import CodecConfig, CONFORMANCE
from cairo_tpu.cpuref import engine as cpu_engine
from cairo_tpu.cpuref.api import Evx1Decoder, Evx1Encoder
from util_video import synth_frames

VARIANTS = {
    "no_deblock": CodecConfig(enable_deblocking=False),
    "fixed_qp": CodecConfig(adaptive_quantization=False),
    "linear_quant": CodecConfig(linear_quantization=True),
    "unrounded": CodecConfig(rounded_quantization=False),
    "no_quant": CodecConfig(quantization_enabled=False),
    "grayscale": CodecConfig(enable_chroma=False),
    "two_refs": CodecConfig(reference_frame_count=2),
    "intra_only": CodecConfig(enable_inter_frames=False),
    "periodic_2": CodecConfig(periodic_intra_rate=2),
}


@pytest.mark.parametrize("name", sorted(VARIANTS))
def test_cpuref_roundtrip_per_config(name):
    cfg = VARIANTS[name]
    w, h = 64, 48
    frames = synth_frames(w, h, 3)
    enc = Evx1Encoder(cfg)
    dec = Evx1Decoder(cfg)
    for t, f in enumerate(frames):
        chunk = enc.encode(f)
        got = dec.decode(chunk)
        want = cpu_engine.recon_to_rgb(enc._ctx, t, w, h)
        np.testing.assert_array_equal(got, want, err_msg=f"{name} frame {t}")
    if name == "intra_only":
        assert enc.frame_type == 0  # never flipped to inter
    if name == "no_quant":
        # all q_index fields ride as 0 and the residuals pass through
        assert enc._ctx.block_table.q_index.max() == 0


def test_conformance_config_is_default():
    assert CodecConfig() == CONFORMANCE
    assert CONFORMANCE.is_conformance and CONFORMANCE.tpu_supported


def test_config_validation():
    with pytest.raises(ValueError):
        CodecConfig(reference_frame_count=5)
    with pytest.raises(ValueError):
        CodecConfig(default_quality=0)


def test_header_carries_ref_count():
    cfg = CodecConfig(reference_frame_count=2)
    enc = Evx1Encoder(cfg)
    chunk = enc.encode(synth_frames(32, 32, 1)[0])
    with pytest.raises(ValueError):
        Evx1Decoder(CONFORMANCE).decode(chunk)  # ref_count mismatch
    assert Evx1Decoder(cfg).decode(chunk) is not None


def test_tpu_engine_config_subset():
    from cairo_tpu.tpu.api import TpuDecoder, TpuEncoder

    cfg = CodecConfig(enable_deblocking=False, adaptive_quantization=False,
                      reference_frame_count=2, periodic_intra_rate=0)
    w, h = 64, 48
    frames = synth_frames(w, h, 4)
    enc = TpuEncoder(cfg)
    cdec = Evx1Decoder(cfg)
    tdec = TpuDecoder(cfg)
    for t, f in enumerate(frames):
        chunk = enc.encode(f)
        a = cdec.decode(chunk)
        b = tdec.decode(chunk)
        np.testing.assert_array_equal(b, a, err_msg=f"frame {t}")
    # streams must actually use at most 2 reference offsets
    assert enc._last_out["prediction_target"].max() <= 1


def test_tpu_rejects_unsupported_config():
    from cairo_tpu.tpu.api import TpuEncoder

    with pytest.raises(NotImplementedError):
        TpuEncoder(CodecConfig(linear_quantization=True))
