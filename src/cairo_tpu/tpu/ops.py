"""Exact-integer device primitives (jax.numpy), mirrors cpuref semantics.

All kernels keep the C arithmetic contract from docs/FORMAT.md §5: truncating
division, rounded_div half-away-from-zero, int16 intermediate wraps. Compute
dtype is int32 throughout (TPU-native); int16 wrap points are explicit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .. import tables

MB = tables.MACROBLOCK_SIZE

_B = jnp.asarray(tables.DCT_BASIS_8, dtype=jnp.int32)
_INTRA_QM = jnp.asarray(tables.INTRA_QM_8x8, dtype=jnp.int32)
_INTER_QM = jnp.asarray(tables.INTER_QM_8x8, dtype=jnp.int32)
_LUMA_DC = jnp.asarray(tables.luma_dc_scale(np.arange(256)), dtype=jnp.int32)
_CHROMA_DC = jnp.asarray(tables.chroma_dc_scale(np.arange(256)), dtype=jnp.int32)


def trunc_div(numer, denom):
    """C integer division (truncation toward zero)."""
    q = jnp.abs(numer) // jnp.abs(denom)
    return jnp.where((numer < 0) != (denom < 0), -q, q)


def trunc_div_pos(numer, denom_pos):
    """Truncating division for a positive divisor (cheaper)."""
    q = jnp.abs(numer) // denom_pos
    return jnp.where(numer < 0, -q, q)


def rounded_div_pos(numer, denom_pos):
    """math.h:228-236 for positive divisors."""
    half = denom_pos // 2
    return trunc_div_pos(numer + jnp.where(numer < 0, -half, half), denom_pos)


def wrap16(v):
    """Wrap int32 -> int16 two's complement, kept as int32."""
    return ((v + 0x8000) & 0xFFFF) - 0x8000


def round_out(v, amount):
    return jnp.where(v < 0, v - amount, v + amount)


def sign(v):
    return jnp.sign(v).astype(v.dtype)


def ilog2_u32(v):
    """Integer log2 of a uint32-interpreted value; log2(0)=0."""
    v = v.astype(jnp.uint32)
    out = jnp.zeros_like(v, dtype=jnp.int32)
    for shift in (16, 8, 4, 2, 1):
        hit = v >= jnp.uint32(1 << shift)
        out = out + jnp.where(hit, shift, 0)
        v = jnp.where(hit, v >> shift, v)
    return out


# --------------------------------------------------------------- transform

def fdct8(blocks):
    """Forward 8x8 integer DCT over (..., 8, 8) int32 blocks (MXU matmuls)."""
    def pass1d(x):
        t = jax.lax.dot_general(
            x, _B.T, (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        dc = trunc_div_pos(t[..., :1] * 45, 128)
        ac = trunc_div_pos(t[..., 1:], 2)
        return wrap16(rounded_div_pos(jnp.concatenate([dc, ac], -1), 128))

    t = pass1d(blocks.astype(jnp.int32))
    return pass1d(t.swapaxes(-1, -2)).swapaxes(-1, -2)


def idct8(blocks):
    """Inverse 8x8 integer DCT over (..., 8, 8) int32 coefficient blocks."""
    def pass1d(v):
        # per-term scaling before accumulation (transform.cpp:330-349)
        terms = v[..., :, None] * _B[None, :, :]
        total = trunc_div_pos(terms[..., 0, :] * 45, 128) \
            + trunc_div_pos(terms[..., 1:, :], 2).sum(axis=-2)
        return wrap16(rounded_div_pos(total, 128))

    x = blocks.astype(jnp.int32)
    t = pass1d(x.swapaxes(-1, -2)).swapaxes(-1, -2)
    return pass1d(t)


# ---------------------------------------------------------------- quantize

def quantize_8x8(blocks, qp, intra: bool, is_luma: bool):
    """(N, 8, 8) int32 blocks, (N,) qp -> quantized int32(int16-wrapped)."""
    v = blocks.astype(jnp.int32)
    qp = qp.astype(jnp.int32)[:, None, None]
    if intra:
        out = wrap16(rounded_div_pos(
            rounded_div_pos(v * tables.QUANTIZER_SCALE_FACTOR, _INTRA_QM),
            qp << 1))
        dc_scale = (_LUMA_DC if is_luma else _CHROMA_DC)[qp[:, 0, 0]]
        dc = wrap16(rounded_div_pos(v[:, 0, 0], dc_scale))
        return out.at[:, 0, 0].set(dc)
    qf = wrap16(rounded_div_pos(v * tables.QUANTIZER_SCALE_FACTOR, _INTER_QM))
    return wrap16(rounded_div_pos(qf - sign(qf) * qp, qp << 1))


def dequantize_8x8(blocks, qp, intra: bool, is_luma: bool):
    v = blocks.astype(jnp.int32)
    qp = qp.astype(jnp.int32)[:, None, None]
    if intra:
        out = wrap16(trunc_div_pos(2 * v * _INTRA_QM * qp,
                                   tables.QUANTIZER_SCALE_FACTOR))
        dc_scale = (_LUMA_DC if is_luma else _CHROMA_DC)[qp[:, 0, 0]]
        dc = wrap16(v[:, 0, 0] * dc_scale)
        return out.at[:, 0, 0].set(dc)
    return wrap16(trunc_div_pos(2 * v * _INTER_QM * qp,
                                tables.QUANTIZER_SCALE_FACTOR))


def block_variance2(mb_y):
    """(N, 16, 16) transformed MBs -> int32 variance (FORMAT.md §5 UB rule)."""
    v = mb_y.astype(jnp.int32)
    mask = v != 0
    mask = mask.at[:, 0, 0].set(False)
    count = mask.sum(axis=(1, 2), dtype=jnp.int32)
    s = jnp.where(mask, v, 0).sum(axis=(1, 2), dtype=jnp.int32)
    ss = jnp.where(mask, v * v, 0).sum(axis=(1, 2), dtype=jnp.int32)
    prod = s * s  # int32 wrap, like the as-built reference
    cnt = jnp.maximum(count, 1)
    var = ss - trunc_div_pos(prod + cnt // 2, cnt)
    return jnp.where(count > 0, var, 0)


def adaptive_qp(quality, mb_y):
    """query_block_quantization_parameter over (N,16,16) transformed MBs."""
    variance = block_variance2(mb_y)
    index = jnp.clip(ilog2_u32(variance) >> 1, 1, tables.MAX_QUANT_LEVELS - 1)
    q = jnp.int32(quality)
    up = jnp.clip(q + ((index - q) >> 1), 1, tables.MAX_QUANT_LEVELS - 1)
    down = jnp.clip(q - ((q - index) >> 1), 1, tables.MAX_QUANT_LEVELS - 1)
    return jnp.where(index > q, up, jnp.where(index < q, down, q))


# ----------------------------------------------------------------- imaging

# -- 4x4 family + true 16x16 line transforms (library parity;
#    transform.cpp:36-175, 455-521 — the wire's 16x16 is quadrant 8x8s).
#    jnp int32 arithmetic wraps like the as-built C.

_B4 = jnp.asarray(tables.DCT_BASIS_4, dtype=jnp.int32)
_B16 = jnp.asarray(tables.DCT_BASIS_16, dtype=jnp.int32)


def _fwd4_1d(x):
    t = x @ _B4.T
    dc = t[..., :1] >> 1
    ac = (t[..., 1:] * 2896) >> 12
    return rounded_div_pos(jnp.concatenate([dc, ac], axis=-1), 128)


def _inv4_1d(v):
    terms = v[..., :, None] * _B4[None, :, :]
    t0 = terms[..., 0, :] >> 1
    tk = ((terms[..., 1:, :] * 2896) >> 12).sum(axis=-2)
    return rounded_div_pos(t0 + tk, 128)


def fdct4(blocks):
    """Forward 4x4 DCT over (..., 4, 4) int blocks (transform_4x4)."""
    t = wrap16(_fwd4_1d(blocks.astype(jnp.int32)))
    return wrap16(_fwd4_1d(t.swapaxes(-1, -2)).swapaxes(-1, -2))


def idct4(blocks):
    """Inverse 4x4 DCT (vertical pass then horizontal)."""
    x = blocks.astype(jnp.int32)
    t = wrap16(_inv4_1d(x.swapaxes(-1, -2)).swapaxes(-1, -2))
    return wrap16(_inv4_1d(t))


def _cdiv128(t):
    q = jnp.abs(t) // 128
    return jnp.where(t < 0, -q, q)


def fdct16_line(lines):
    """transform_16x16_line over (..., 16) int sample vectors."""
    t = lines.astype(jnp.int32) @ _B16.T
    dc = _cdiv128(t[..., :1] * 32)
    ac = _cdiv128(t[..., 1:] * 45)
    return wrap16(rounded_div_pos(jnp.concatenate([dc, ac], axis=-1), 128))


def idct16_line(lines):
    """inverse_transform_16x16_line over (..., 16) coefficient vectors."""
    terms = lines[..., :, None].astype(jnp.int32) * _B16[None, :, :]
    t0 = _cdiv128(terms[..., 0, :] * 32)
    tk = _cdiv128(terms[..., 1:, :] * 45).sum(axis=-2)
    return wrap16(rounded_div_pos(t0 + tk, 128))


def fdct16(blocks):
    """True 16x16 DCT composed from the line transform."""
    t = fdct16_line(blocks)
    return fdct16_line(t.swapaxes(-1, -2)).swapaxes(-1, -2)


def idct16(blocks):
    """True 16x16 inverse DCT (columns then rows)."""
    t = idct16_line(blocks.swapaxes(-1, -2)).swapaxes(-1, -2)
    return idct16_line(t)


def rgb_to_yuv420(rgb):
    """(H, W, 3) uint8 -> (Y, U, V) int32 planes (convert.cpp semantics)."""
    r = rgb[..., 0].astype(jnp.int32)
    g = rgb[..., 1].astype(jnp.int32)
    b = rgb[..., 2].astype(jnp.int32)
    y = ((77 * r + 150 * g + 29 * b + 128) >> 8) + tables.LUMINANCE_SHIFT
    cu = trunc_div_pos(-43 * r - 85 * g + 128 * b + 128, 256) + 128
    cv = trunc_div_pos(128 * r - 107 * g - 21 * b + 128, 256) + 128
    height, width = r.shape
    u = (cu.reshape(height // 2, 2, width // 2, 2).sum(axis=(1, 3)) + 2) >> 2
    v = (cv.reshape(height // 2, 2, width // 2, 2).sum(axis=(1, 3)) + 2) >> 2
    return y, u, v


def yuv420_to_rgb(y, u, v):
    """int32 planes -> (H, W, 3) uint8."""
    yy = y.astype(jnp.int32) - tables.LUMINANCE_SHIFT
    uu = (u.astype(jnp.int32) - 128).repeat(2, axis=0).repeat(2, axis=1)
    vv = (v.astype(jnp.int32) - 128).repeat(2, axis=0).repeat(2, axis=1)
    uu = uu[:yy.shape[0], :yy.shape[1]]
    vv = vv[:yy.shape[0], :yy.shape[1]]
    r = (256 * yy + 358 * vv + 128) >> 8
    g = (256 * yy - 88 * uu - 182 * vv + 128) >> 8
    b = (256 * yy + 452 * uu + 128) >> 8
    rgb = jnp.stack([r, g, b], axis=-1)
    return jnp.clip(rgb, 0, 255).astype(jnp.uint8)


def lerp_half(a, b):
    t = a.astype(jnp.int32) + b.astype(jnp.int32)
    return wrap16(trunc_div_pos(round_out(t, 1), 2))


def lerp_quarter(a, b):
    t = 3 * a.astype(jnp.int32) + b.astype(jnp.int32)
    return wrap16(trunc_div_pos(round_out(t, 2), 4))


# ------------------------------------------------------------ block layout

def plane_to_blocks(plane, size):
    """(H, W) -> (H//size * W//size, size, size), raster block order."""
    height, width = plane.shape
    return plane.reshape(height // size, size, width // size, size) \
        .swapaxes(1, 2).reshape(-1, size, size)


def blocks_to_plane(blocks, height, width):
    size = blocks.shape[-1]
    return blocks.reshape(height // size, width // size, size, size) \
        .swapaxes(1, 2).reshape(height, width)


def mb_quads(y_mbs):
    """(N, 16, 16) -> (N, 4, 8, 8) quadrants TL,TR,BL,BR."""
    n = y_mbs.shape[0]
    return y_mbs.reshape(n, 2, 8, 2, 8).transpose(0, 1, 3, 2, 4).reshape(n, 4, 8, 8)


def quads_to_mb(quads):
    n = quads.shape[0]
    return quads.reshape(n, 2, 2, 8, 8).transpose(0, 1, 3, 2, 4).reshape(n, 16, 16)
