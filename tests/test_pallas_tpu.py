"""Pallas vs XLA differential regression, run on real TPU hardware.

These tests guard the production Mosaic kernels (tpu/pallas_motion.py)
against compiler regressions: per-macroblock identity with the XLA anchor
on four content classes. They are skipped in the default (CPU-forced)
suite; run them in the bench environment with

    CAIRO_TPU_TESTS=1 python -m pytest -m tpu tests/test_pallas_tpu.py
"""

import numpy as np
import pytest

import jax

pytestmark = pytest.mark.tpu

if jax.default_backend() == "cpu":
    pytest.skip("needs a real TPU device (set CAIRO_TPU_TESTS=1)",
                allow_module_level=True)

import jax.numpy as jnp

from cairo_tpu import tables
from cairo_tpu.tpu import motion, pallas_motion

MB = tables.MACROBLOCK_SIZE
R = motion.DENSE_R
CR = R // 2


def _run_both(w, h, src_p, ref_p, quality):
    mad_thr = (quality >> 2) + 1
    hb, wb = h // MB, w // MB
    idx = np.arange(hb * wb)
    px = jnp.asarray((idx % wb) * MB, jnp.int32)
    py = jnp.asarray((idx // wb) * MB, jnp.int32)
    sy, su, sv = (jnp.asarray(p, jnp.int32) for p in src_p)
    ry, ru, rv = (jnp.asarray(p, jnp.int32) for p in ref_p)
    ry_w = jnp.pad(ry, ((0, 0), (R, R)))
    ru_w = jnp.pad(ru, ((0, 0), (CR, CR)))
    rv_w = jnp.pad(rv, ((0, 0), (CR, CR)))

    @jax.jit
    def xla_path():
        cmax = motion._chroma_max_maps(su, sv, ru_w, rv_w, CR)
        return motion._dense_select(sy, ry_w, cmax, px, py, 0, w, h,
                                    mad_thr, hb, wb)

    @jax.jit
    def pallas_path():
        cmax = pallas_motion.chroma_max_maps(su, sv, ru_w, rv_w)
        return pallas_motion.dense_select(sy, ry_w, cmax, 0, w, h, mad_thr)

    a = [np.asarray(x) for x in jax.block_until_ready(xla_path())]
    b = [np.asarray(x) for x in jax.block_until_ready(pallas_path())]
    for name, va, vb in zip(["mx", "my", "sad", "mad", "frozen"], a, b):
        np.testing.assert_array_equal(vb, va, err_msg=name)


W, H = 640, 384  # big enough for full search reach, small enough to be fast


def _content(seed=3):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:H, 0:W]
    y = (128 + 90 * np.sin(xx * 0.11) * np.cos(yy * 0.07)).astype(np.int16)
    y += rng.integers(-6, 7, (H, W)).astype(np.int16)
    u = rng.integers(90, 170, (H // 2, W // 2)).astype(np.int16)
    v = rng.integers(90, 170, (H // 2, W // 2)).astype(np.int16)
    return y, u, v, rng


def test_pallas_shifted_content():
    y, u, v, _ = _content()
    ref = (np.roll(y, 5, axis=1), np.roll(u, 2, axis=1),
           np.roll(v, 2, axis=1))
    _run_both(W, H, (y, u, v), ref, 16)


def test_pallas_static_content():
    y, u, v, _ = _content()
    _run_both(W, H, (y, u, v), (y, u, v), 16)


def test_pallas_noise():
    _, _, _, rng = _content()
    s = (rng.integers(0, 256, (H, W)).astype(np.int16),
         rng.integers(0, 256, (H // 2, W // 2)).astype(np.int16),
         rng.integers(0, 256, (H // 2, W // 2)).astype(np.int16))
    r = (rng.integers(0, 256, (H, W)).astype(np.int16),
         rng.integers(0, 256, (H // 2, W // 2)).astype(np.int16),
         rng.integers(0, 256, (H // 2, W // 2)).astype(np.int16))
    _run_both(W, H, s, r, 8)


def test_pallas_flat_ties():
    f = np.full((H, W), 100, np.int16)
    fc = np.full((H // 2, W // 2), 128, np.int16)
    _run_both(W, H, (f, fc, fc), (f + 1, fc, fc), 31)
