"""Pallas prediction-gather kernels vs the XLA anchor, on real TPU.

Guards tpu/pallas_pred.py (pred_planes fusing beta + sub-pel neighbor +
lerp + intra zeroing from the recon ring; gather_windows feeding the
sub-pel refinement scan) against Mosaic/compiler regressions. Run with

    CAIRO_TPU_TESTS=1 python -m pytest -m tpu tests/test_pallas_pred_tpu.py
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
from cairo_tpu.tpu import extract, motion as motion_mod, ops, pallas_pred

MB = tables.MACROBLOCK_SIZE
RING = tables.REFERENCE_FRAME_COUNT


def _anchor_pred(ring, slot, mx, my, sp_pred, sp_amount, sp_index, zero):
    wys, wus, wvs = [], [], []
    for s in range(RING):
        wy, wu, wv = motion_mod.pred_windows(
            (ring[0][s].astype(jnp.int32), ring[1][s].astype(jnp.int32),
             ring[2][s].astype(jnp.int32)))
        wys.append(wy)
        wus.append(wu)
        wvs.append(wv)

    def pick(stack):
        sel = None
        for s_ in range(RING):
            m = (slot == s_)[:, None, None]
            sel = jnp.where(m, stack[s_], 0 if sel is None else sel)
        return sel

    wins = (pick(wys), pick(wus), pick(wvs))
    pred = motion_mod.pred_block_from_windows(
        wins, mx, my, sp_pred, sp_amount, sp_index.astype(jnp.int32))
    zm = zero[:, None, None]
    return tuple(jnp.where(zm, 0, p) for p in pred)


@pytest.mark.parametrize("dims", [(96, 160), (64, 256)])
def test_pred_planes_matches_anchor(dims):
    H, W = dims
    rng = np.random.default_rng(11)
    n = (H // MB) * (W // MB)
    ring_y = rng.integers(-1200, 1200, (RING, H, W)).astype(np.int16)
    ring_y[0, 0, :6] = [-32768, 32767, -256, 255, 256, -257]
    ring_u = rng.integers(-900, 900, (RING, H // 2, W // 2)).astype(np.int16)
    ring_v = rng.integers(-900, 900, (RING, H // 2, W // 2)).astype(np.int16)
    slot = jnp.asarray(rng.integers(0, 4, n), jnp.int32)
    mx = jnp.asarray(rng.integers(-16, 17, n), jnp.int32)
    my = jnp.asarray(rng.integers(-16, 17, n), jnp.int32)
    spp = jnp.asarray(rng.random(n) < 0.5)
    spa = jnp.asarray(rng.random(n) < 0.5)
    spi = jnp.asarray(rng.integers(0, 8, n), jnp.int32)
    zero = jnp.asarray(rng.random(n) < 0.25)
    ring = tuple(map(jnp.asarray, (ring_y, ring_u, ring_v)))

    ay, au, av = jax.jit(_anchor_pred)(ring, slot, mx, my, spp, spa, spi,
                                       zero)
    py, pu, pv = jax.jit(pallas_pred.pred_planes)(
        ring[0], ring[1], ring[2], slot, mx, my, spp, spa, spi, zero)
    np.testing.assert_array_equal(np.asarray(ops.blocks_to_plane(ay, H, W)),
                                  np.asarray(py))
    np.testing.assert_array_equal(
        np.asarray(ops.blocks_to_plane(au, H // 2, W // 2)), np.asarray(pu))
    np.testing.assert_array_equal(
        np.asarray(ops.blocks_to_plane(av, H // 2, W // 2)), np.asarray(pv))


def test_gather_windows_matches_anchor():
    H, W = 96, 160
    rng = np.random.default_rng(12)
    n = (H // MB) * (W // MB)
    ring_y = rng.integers(-1200, 1200, (RING, H, W)).astype(np.int16)
    ring_u = rng.integers(-900, 900, (RING, H // 2, W // 2)).astype(np.int16)
    mx = jnp.asarray(rng.integers(-16, 17, n), jnp.int32)
    my = jnp.asarray(rng.integers(-16, 17, n), jnp.int32)
    for planes, blk, pad, ox, oy in (
            (ring_y, MB + 2, motion_mod.Y_WPAD, mx, my),
            (ring_u, MB // 2 + 2, motion_mod.C_WPAD, mx >> 1, my >> 1)):
        pl_ = jnp.asarray(planes)
        for s in (0, 3):
            anchor = extract.extract_blocks(
                extract.mb_windows(pl_[s].astype(jnp.int32), blk - 2, pad),
                ox + pad - 1, oy + pad - 1, blk)
            kern = pallas_pred.gather_windows(pl_, jnp.int32(s), ox, oy,
                                              blk, pad)
            np.testing.assert_array_equal(np.asarray(anchor),
                                          np.asarray(kern))


def test_wide_pred_planes_matches_anchor():
    """The ypad=33 variant used by the wavefront decoder (+-31 + sub-pel
    reference inter reach)."""
    from cairo_tpu.tpu import wavefront
    H, W = 96, 160
    rng = np.random.default_rng(21)
    n = (H // MB) * (W // MB)
    ring = tuple(jnp.asarray(rng.integers(-900, 900, shp).astype(np.int16))
                 for shp in ((RING, H, W), (RING, H // 2, W // 2),
                             (RING, H // 2, W // 2)))
    slot = jnp.asarray(rng.integers(0, 4, n), jnp.int32)
    mx = jnp.asarray(rng.integers(-32, 33, n), jnp.int32)
    my = jnp.asarray(rng.integers(-32, 33, n), jnp.int32)
    spp = jnp.asarray(rng.random(n) < 0.5)
    spa = jnp.asarray(rng.random(n) < 0.5)
    spi = jnp.asarray(rng.integers(0, 8, n), jnp.int32)
    zero = jnp.asarray(rng.random(n) < 0.2)

    state = dict(ring_y=ring[0], ring_u=ring[1], ring_v=ring[2])
    target = (jnp.int32(0) + RING - slot) % RING  # slot_per_mb == slot
    got = wavefront._wide_gather_pred(state, jnp.int32(0), target, mx, my,
                                      spp, spa, spi, zero)
    # XLA anchor with CAIRO_TPU_PALLAS forced off via direct window path
    import cairo_tpu.tpu.backend as backend
    backend.use_pallas.cache_clear()
    import os
    os.environ["CAIRO_TPU_PALLAS"] = "0"
    try:
        want = wavefront._wide_gather_pred(state, jnp.int32(0), target, mx,
                                           my, spp, spa, spi, zero)
    finally:
        del os.environ["CAIRO_TPU_PALLAS"]
        backend.use_pallas.cache_clear()
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
