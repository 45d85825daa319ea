"""Differential tests: numpy DSP layers vs the reference unit oracle."""

import numpy as np
import pytest

import oracle_units as ou
from cairo_tpu.cpuref import imaging, quantize, transform
from cairo_tpu.blocktypes import INTRA_DEFAULT, INTER_DELTA

rng = np.random.default_rng(42)


def _rand_blocks(n, lo=-512, hi=512, shape=(8, 8)):
    return rng.integers(lo, hi, size=(n, *shape)).astype(np.int16)


class TestTransform:
    def test_fdct_matches_reference(self):
        blocks = np.concatenate([
            _rand_blocks(64, -255, 256),
            _rand_blocks(16, -32768 // 16, 32767 // 16),  # large-amplitude
            np.zeros((1, 8, 8), np.int16),
            np.full((1, 8, 8), 255, np.int16),
        ])
        ours = transform.fdct8(blocks)
        for i, b in enumerate(blocks):
            ref = ou.transform_8x8(b)
            np.testing.assert_array_equal(ours[i], ref, err_msg=f"block {i}")

    def test_idct_matches_reference(self):
        blocks = _rand_blocks(64, -2048, 2048)
        ours = transform.idct8(blocks)
        for i, b in enumerate(blocks):
            np.testing.assert_array_equal(ours[i], ou.inverse_transform_8x8(b))

    def test_fused_sub_and_add_equal_composition(self):
        # The reference's fused variants are sub-then-dct / idct-then-add.
        src = _rand_blocks(8, 0, 256)
        pred = _rand_blocks(8, 0, 256)
        for s, p in zip(src, pred):
            fused = ou.sub_transform_8x8(s, p)
            composed = transform.fdct8((s.astype(np.int32) - p).astype(np.int16)[None])[0]
            np.testing.assert_array_equal(fused, composed)
        coef = _rand_blocks(8, -1024, 1024)
        for c, p in zip(coef, pred):
            fused = ou.inverse_transform_add_8x8(c, p)
            composed = (transform.idct8(c[None])[0].astype(np.int32) + p).astype(np.int16)
            np.testing.assert_array_equal(fused, composed)


class TestQuantize:
    @pytest.mark.parametrize("qp", [1, 2, 5, 8, 16, 24, 31])
    def test_intra_roundtrip_matches(self, qp):
        y = _rand_blocks(1, -1024, 1024, (16, 16))[0]
        u = _rand_blocks(1, -1024, 1024)[0]
        v = _rand_blocks(1, -1024, 1024)[0]
        ref_y, ref_u, ref_v = ou.quantize_macroblock(qp, INTRA_DEFAULT, y, u, v)
        quads = y.reshape(2, 8, 2, 8).transpose(0, 2, 1, 3).reshape(4, 8, 8)
        ours_q = quantize.quantize_intra_8x8(quads, [qp] * 4, is_luma=True)
        ref_quads = ref_y.reshape(2, 8, 2, 8).transpose(0, 2, 1, 3).reshape(4, 8, 8)
        np.testing.assert_array_equal(ours_q, ref_quads)
        np.testing.assert_array_equal(
            quantize.quantize_intra_8x8(u[None], [qp], is_luma=False)[0], ref_u)

        iref_y, iref_u, iref_v = ou.inverse_quantize_macroblock(qp, INTRA_DEFAULT, ref_y, ref_u, ref_v)
        iq = quantize.inverse_quantize_intra_8x8(ref_quads, [qp] * 4, is_luma=True)
        iref_quads = iref_y.reshape(2, 8, 2, 8).transpose(0, 2, 1, 3).reshape(4, 8, 8)
        np.testing.assert_array_equal(iq, iref_quads)
        np.testing.assert_array_equal(
            quantize.inverse_quantize_intra_8x8(ref_u[None], [qp], is_luma=False)[0], iref_u)

    @pytest.mark.parametrize("qp", [1, 3, 16, 31])
    def test_inter_matches(self, qp):
        y = _rand_blocks(1, -1024, 1024, (16, 16))[0]
        u = _rand_blocks(1, -1024, 1024)[0]
        v = _rand_blocks(1, -1024, 1024)[0]
        ref_y, ref_u, ref_v = ou.quantize_macroblock(qp, INTER_DELTA, y, u, v)
        quads = y.reshape(2, 8, 2, 8).transpose(0, 2, 1, 3).reshape(4, 8, 8)
        ours = quantize.quantize_inter_8x8(quads, [qp] * 4)
        ref_quads = ref_y.reshape(2, 8, 2, 8).transpose(0, 2, 1, 3).reshape(4, 8, 8)
        np.testing.assert_array_equal(ours, ref_quads)
        iref_y, _, _ = ou.inverse_quantize_macroblock(qp, INTER_DELTA, ref_y, ref_u, ref_v)
        iq = quantize.inverse_quantize_inter_8x8(ref_quads, [qp] * 4)
        iref_quads = iref_y.reshape(2, 8, 2, 8).transpose(0, 2, 1, 3).reshape(4, 8, 8)
        np.testing.assert_array_equal(iq, iref_quads)

    def test_variance_and_adaptive_qp(self):
        for amplitude in (4, 64, 1024, 8000):
            mbs = _rand_blocks(32, -amplitude, amplitude, (16, 16))
            mbs[5] = 0
            mbs[6, 0, 0] = 1000  # only DC nonzero -> variance 0
            ours_var = quantize.block_variance2(mbs)
            ours_qp = quantize.adaptive_qp(16, mbs)
            for i, mb in enumerate(mbs):
                assert ours_var[i] == ou.block_variance2(mb), i
                assert ours_qp[i] == ou.query_qp(16, mb), i


class TestImaging:
    def test_rgb_to_yuv_matches(self):
        rgb = rng.integers(0, 256, (48, 64, 3)).astype(np.uint8)
        ref_y, ref_u, ref_v = ou.convert_rgb_to_yuv(rgb, 64, 48)
        y, u, v = imaging.rgb_to_yuv420(rgb)
        np.testing.assert_array_equal(y, ref_y)
        np.testing.assert_array_equal(u, ref_u)
        np.testing.assert_array_equal(v, ref_v)

    def test_rgb_to_yuv_padded_cache(self):
        # encoder pads planes to MB multiples; pad region must stay zero
        rgb = rng.integers(0, 256, (40, 56, 3)).astype(np.uint8)
        ref_y, ref_u, ref_v = ou.convert_rgb_to_yuv(rgb, 64, 48)
        y = np.zeros((48, 64), np.int16)
        u = np.zeros((24, 32), np.int16)
        v = np.zeros((24, 32), np.int16)
        yy, uu, vv = imaging.rgb_to_yuv420(rgb)
        y[:40, :56], u[:20, :28], v[:20, :28] = yy, uu, vv
        np.testing.assert_array_equal(y, ref_y)
        np.testing.assert_array_equal(u, ref_u)
        np.testing.assert_array_equal(v, ref_v)

    def test_yuv_to_rgb_matches(self):
        y = rng.integers(-50, 320, (48, 64)).astype(np.int16)
        u = rng.integers(-50, 320, (24, 32)).astype(np.int16)
        v = rng.integers(-50, 320, (24, 32)).astype(np.int16)
        ref = ou.convert_yuv_to_rgb(y, u, v, 64, 48)
        ours = imaging.yuv420_to_rgb(y, u, v, 64, 48)
        np.testing.assert_array_equal(ours, ref)

    def test_lerp_half_quarter(self):
        a = [_rand_blocks(1, -300, 300, s)[0] for s in ((16, 16), (8, 8), (8, 8))]
        b = [_rand_blocks(1, -300, 300, s)[0] for s in ((16, 16), (8, 8), (8, 8))]
        from cairo_tpu.cpuref.motion import lerp_half, lerp_quarter
        for kind, fn in (("half", lerp_half), ("quarter", lerp_quarter)):
            ref = ou.lerp(kind, *a, *b)
            ours = [fn(x, y_) for x, y_ in zip(a, b)]
            for r, o in zip(ref, ours):
                np.testing.assert_array_equal(o, r)


class TestTransform4x4And16x16Line:
    """Library-parity transforms (transform.cpp:36-175, 455-521): the
    pipeline never runs these, but they are part of the reference surface."""

    def test_fdct4_matches_reference(self):
        blocks = np.concatenate([
            _rand_blocks(64, -255, 256, shape=(4, 4)),
            _rand_blocks(16, -2048, 2048, shape=(4, 4)),
            np.zeros((1, 4, 4), np.int16),
            np.full((1, 4, 4), 255, np.int16)])
        ours = transform.fdct4(blocks)
        for i, b in enumerate(blocks):
            np.testing.assert_array_equal(ours[i], ou.transform_4x4(b),
                                          err_msg=f"block {i}")

    def test_idct4_matches_reference(self):
        blocks = _rand_blocks(64, -2048, 2048, shape=(4, 4))
        ours = transform.idct4(blocks)
        for i, b in enumerate(blocks):
            np.testing.assert_array_equal(ours[i],
                                          ou.inverse_transform_4x4(b),
                                          err_msg=f"block {i}")

    def test_fdct16_line_matches_reference(self):
        lines = np.concatenate([
            _rand_blocks(64, -255, 256, shape=(16,)),
            _rand_blocks(16, -2048, 2048, shape=(16,))])
        ours = transform.fdct16_line(lines)
        for i, ln in enumerate(lines):
            np.testing.assert_array_equal(ours[i],
                                          ou.transform_16x16_line(ln),
                                          err_msg=f"line {i}")

    def test_idct16_line_matches_reference(self):
        lines = _rand_blocks(64, -2048, 2048, shape=(16,))
        ours = transform.idct16_line(lines)
        for i, ln in enumerate(lines):
            np.testing.assert_array_equal(
                ours[i], ou.inverse_transform_16x16_line(ln),
                err_msg=f"line {i}")

    def test_tpu_ops_match_cpuref(self):
        import jax.numpy as jnp
        from cairo_tpu.tpu import ops

        b4 = _rand_blocks(32, -2048, 2048, shape=(4, 4))
        np.testing.assert_array_equal(
            np.asarray(ops.fdct4(jnp.asarray(b4, jnp.int32))),
            transform.fdct4(b4).astype(np.int32))
        np.testing.assert_array_equal(
            np.asarray(ops.idct4(jnp.asarray(b4, jnp.int32))),
            transform.idct4(b4).astype(np.int32))
        l16 = _rand_blocks(32, -2048, 2048, shape=(16,))
        np.testing.assert_array_equal(
            np.asarray(ops.fdct16_line(jnp.asarray(l16, jnp.int32))),
            transform.fdct16_line(l16).astype(np.int32))
        np.testing.assert_array_equal(
            np.asarray(ops.idct16_line(jnp.asarray(l16, jnp.int32))),
            transform.idct16_line(l16).astype(np.int32))

    def test_true_16x16_roundtrip_quality(self):
        # no composed 16x16 exists in the reference; sanity: the composed
        # transform built from its line functions roundtrips accurately
        b = _rand_blocks(4, 0, 256, shape=(16, 16))
        rec = transform.idct16(transform.fdct16(b))
        err = np.abs(rec.astype(np.int32) - b.astype(np.int32))
        assert err.max() <= 8, err.max()
