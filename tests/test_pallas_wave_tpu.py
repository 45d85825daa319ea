"""Differential pin: the Mosaic wave kernel (tpu.pallas_wave) vs the XLA
wavefront fori-loop — byte-identical block tables, coefficient planes and
reconstruction state, on the real chip (tpu tier).

The XLA path is itself pinned byte-exact against the compiled reference
encoder (test_wavefront.py / test_conformance_cpuref.py), so equality here
extends the conformance chain to the kernel.
"""

import functools

import jax
import numpy as np
import pytest

from cairo_tpu.tpu import backend as backend_mod
from cairo_tpu.tpu import wavefront, wire

pytestmark = pytest.mark.tpu

W, H = 128, 96


def _src_wire(rng, frame_index, quality, aw, ah):
    buf = rng.integers(0, 255, 8 + wire.yuv8_nbytes(ah, aw),
                       np.uint8).astype(np.uint8)
    buf[:8] = np.array([frame_index, quality], np.int32).view(np.uint8)
    return buf


def _run(use_pallas, frames, quality=16, aw=W, ah=H):
    orig = backend_mod.use_pallas
    backend_mod.use_pallas = lambda: use_pallas
    try:
        raw = wavefront.conformance_encode_step.__wrapped__
        outs = []
        state = wavefront.init_state(aw, ah)
        rng = np.random.default_rng(7)
        for i in range(frames):
            f = jax.jit(functools.partial(
                raw, aligned_w=aw, aligned_h=ah, frame_w=aw, frame_h=ah,
                is_inter=i > 0))
            src = _src_wire(rng, i, quality, aw, ah)
            state, out = f(src, state)
            outs.append(jax.device_get(out))
        return outs, jax.device_get(state)
    finally:
        backend_mod.use_pallas = orig


@pytest.mark.parametrize("quality", [16, 4, 29])
def test_wave_kernel_matches_xla(quality):
    frames = 3
    ref_outs, ref_state = _run(False, frames, quality)
    got_outs, got_state = _run(True, frames, quality)
    for i, (r, g) in enumerate(zip(ref_outs, got_outs)):
        for k in r:
            assert np.array_equal(r[k], g[k]), \
                f"frame {i} field {k}: mismatch " \
                f"({np.sum(np.asarray(r[k]) != np.asarray(g[k]))} cells)"
    for k in ref_state:
        assert np.array_equal(ref_state[k], got_state[k]), f"state {k}"


def test_wave_kernel_supported_geometry():
    from cairo_tpu.tpu import pallas_wave
    assert pallas_wave.supported(1920, 1088)
    assert pallas_wave.supported(1280, 720)
    assert not pallas_wave.supported(3840, 2160)  # XLA fallback at 4K


@pytest.mark.slow
def test_wave_kernel_matches_xla_720p():
    """Production-scale geometry (P=27->32 padded members, wb=80): the
    Mosaic wave + inter kernels vs the XLA wavefront at 1280x720, byte
    exact across an intra + inter frame pair."""
    ref_outs, ref_state = _run(False, 2, 16, aw=1280, ah=720)
    got_outs, got_state = _run(True, 2, 16, aw=1280, ah=720)
    for i, (r, g) in enumerate(zip(ref_outs, got_outs)):
        for k in r:
            assert np.array_equal(r[k], g[k]), f"frame {i} field {k}"
    for k in ref_state:
        assert np.array_equal(ref_state[k], got_state[k]), f"state {k}"
