"""TPU batched inter search must replay cpuref (reference-exact) semantics."""

import numpy as np
import jax.numpy as jnp

from cairo_tpu.cpuref import motion as cpu_motion
from cairo_tpu.tpu import motion as tpu_motion
from cairo_tpu.tpu import ops

rng = np.random.default_rng(5)


def _planes(w, h, amplitude=200):
    yy, xx = np.mgrid[0:h, 0:w]
    y = (128 + amplitude / 2 * np.sin(xx * 0.13) * np.cos(yy * 0.08)).astype(np.int16)
    y = y + rng.integers(-5, 6, (h, w)).astype(np.int16)
    u = rng.integers(100, 160, (h // 2, w // 2)).astype(np.int16)
    v = rng.integers(100, 160, (h // 2, w // 2)).astype(np.int16)
    return y, u, v


import pytest


@pytest.mark.slow
def test_tpu_inter_search_matches_cpuref():
    w, h = 96, 64
    src_p = _planes(w, h)
    for shift, quality in ((2, 16), (-7, 8), (0, 31)):
        ref_p = tuple(np.roll(p, shift, axis=1) for p in src_p)

        src = (ops.plane_to_blocks(jnp.asarray(src_p[0], jnp.int32), 16),
               ops.plane_to_blocks(jnp.asarray(src_p[1], jnp.int32), 8),
               ops.plane_to_blocks(jnp.asarray(src_p[2], jnp.int32), 8))
        wb, hb = w // 16, h // 16
        idx = np.arange(wb * hb)
        px = jnp.asarray((idx % wb) * 16, jnp.int32)
        py = jnp.asarray((idx // wb) * 16, jnp.int32)
        ref = tuple(jnp.asarray(p, jnp.int32) for p in ref_p)
        got = tpu_motion.inter_search_exact(src, ref, px, py, quality)
        got = {k: np.asarray(val) for k, val in got.items()}

        pred = cpu_motion.Planes(*ref_p)
        for n in range(wb * hb):
            x, y = int(px[n]), int(py[n])
            sblk = cpu_motion.Planes(*src_p).block(x, y)
            sad, desc = cpu_motion.inter_prediction(quality, sblk, x, y, pred, 1)
            ctx = f"mb {n} q{quality} shift {shift}"
            assert got["sad"][n] == sad, ctx
            assert got["motion_x"][n] == desc["motion_x"], ctx
            assert got["motion_y"][n] == desc["motion_y"], ctx
            assert bool(got["sp_pred"][n]) == bool(desc["sp_pred"]), ctx
            assert bool(got["sp_amount"][n]) == bool(desc["sp_amount"]), ctx
            assert got["sp_index"][n] == desc["sp_index"], ctx
            assert bool(got["is_copy"][n]) == bool(desc["block_type"] & 4), ctx
            assert bool(got["is_motion"][n]) == bool(desc["block_type"] & 2), ctx
