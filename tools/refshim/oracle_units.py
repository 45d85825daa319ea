"""ctypes wrapper for unit-level reference exports (oracle_units.cpp)."""

from __future__ import annotations

import ctypes

import numpy as np

from oracle import lib as _lib


def _i16p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_short))


def _setup():
    L = _lib()
    i16 = ctypes.POINTER(ctypes.c_short)
    u8 = ctypes.POINTER(ctypes.c_ubyte)
    i32 = ctypes.POINTER(ctypes.c_int)
    u = ctypes.c_uint
    L.evxu_transform_8x8.argtypes = [i16, u, i16]
    L.evxu_inverse_transform_8x8.argtypes = [i16, u, i16]
    L.evxu_transform_4x4.argtypes = [i16, u, i16]
    L.evxu_inverse_transform_4x4.argtypes = [i16, u, i16]
    L.evxu_transform_16x16_line.argtypes = [i16, u, i16, u]
    L.evxu_inverse_transform_16x16_line.argtypes = [i16, u, i16, u]
    L.evxu_inverse_transform_add_8x8.argtypes = [i16, i16, u, i16]
    L.evxu_sub_transform_8x8.argtypes = [i16, i16, u, i16]
    L.evxu_quantize_macroblock.argtypes = [ctypes.c_ubyte, ctypes.c_int] + [i16] * 6 + [u, u, u]
    L.evxu_inverse_quantize_macroblock.argtypes = L.evxu_quantize_macroblock.argtypes
    L.evxu_query_qp.argtypes = [ctypes.c_ubyte, i16, i16, i16, u, ctypes.c_int]
    L.evxu_block_variance2.argtypes = [i16, u]
    L.evxu_lerp_half.argtypes = [i16] * 9 + [u]
    L.evxu_lerp_quarter.argtypes = [i16] * 9 + [u]
    L.evxu_convert_rgb_to_yuv.argtypes = [u8, u, u, i16, i16, i16, u, u]
    L.evxu_convert_yuv_to_rgb.argtypes = [i16, i16, i16, u, u, u8, u, u]
    L.evxu_intra_prediction.argtypes = [ctypes.c_ushort, u] + [i16] * 6 + [u, u, u, u, i32]
    L.evxu_inter_prediction.argtypes = [ctypes.c_ushort, u, ctypes.c_ubyte] + [i16] * 6 + [u, u, u, u, i32]
    L.evxu_deblock.argtypes = [i16, i16, i16, u, u, i32, u]
    ll = ctypes.c_longlong
    u64 = ctypes.c_ulonglong
    L.evxu_huffman_encode.restype = ll
    L.evxu_huffman_encode.argtypes = [u8, u, u8, u64]
    L.evxu_huffman_decode.restype = ll
    L.evxu_huffman_decode.argtypes = [u8, u64, u, u8]
    L.evxu_golomb_encode.restype = ll
    L.evxu_golomb_encode.argtypes = [i16, u, ctypes.c_int, u8, u64]
    L.evxu_golomb_decode.restype = ll
    L.evxu_golomb_decode.argtypes = [u8, u64, u, ctypes.c_int, i16]
    L.evxu_entropy_encode.restype = ll
    L.evxu_entropy_encode.argtypes = [i16, u, ctypes.c_int, u8, u64]
    L.evxu_entropy_decode.restype = ll
    L.evxu_entropy_decode.argtypes = [u8, u64, u, ctypes.c_int, i16]
    ii = ctypes.c_int
    for nm in ("evxu_block_sad1", "evxu_block_mean",
               "evxu_nonzero_block_mean", "evxu_block_variance",
               "evxu_block_variance3"):
        fn = getattr(L, nm)
        fn.restype = ii
        fn.argtypes = [i16, u]
    for nm in ("evxu_block_sad2", "evxu_block_mse", "evxu_block_ssd"):
        fn = getattr(L, nm)
        fn.restype = ii
        fn.argtypes = [i16, i16, u]
    L.evxu_block_mad.restype = ii
    L.evxu_block_mad.argtypes = [i16] * 6 + [u]
    return L


_L = None


def L():
    global _L
    if _L is None:
        _L = _setup()
    return _L


def transform_8x8(block):
    src = np.ascontiguousarray(block, dtype=np.int16)
    dst = np.zeros_like(src)
    L().evxu_transform_8x8(_i16p(src), 8, _i16p(dst))
    return dst


def inverse_transform_8x8(block):
    src = np.ascontiguousarray(block, dtype=np.int16)
    dst = np.zeros_like(src)
    L().evxu_inverse_transform_8x8(_i16p(src), 8, _i16p(dst))
    return dst


def transform_4x4(block):
    src = np.ascontiguousarray(block, dtype=np.int16)
    dst = np.zeros_like(src)
    L().evxu_transform_4x4(_i16p(src), 4, _i16p(dst))
    return dst


def inverse_transform_4x4(block):
    src = np.ascontiguousarray(block, dtype=np.int16)
    dst = np.zeros_like(src)
    L().evxu_inverse_transform_4x4(_i16p(src), 4, _i16p(dst))
    return dst


def transform_16x16_line(line):
    """One 16-sample forward line (the true-16x16 building block)."""
    src = np.ascontiguousarray(line, dtype=np.int16)
    dst = np.zeros_like(src)
    L().evxu_transform_16x16_line(_i16p(src), 1, _i16p(dst), 1)
    return dst


def inverse_transform_16x16_line(line):
    src = np.ascontiguousarray(line, dtype=np.int16)
    dst = np.zeros_like(src)
    L().evxu_inverse_transform_16x16_line(_i16p(src), 1, _i16p(dst), 1)
    return dst


def inverse_transform_add_8x8(block, add):
    src = np.ascontiguousarray(block, dtype=np.int16)
    addv = np.ascontiguousarray(add, dtype=np.int16)
    dst = np.zeros_like(src)
    L().evxu_inverse_transform_add_8x8(_i16p(src), _i16p(addv), 8, _i16p(dst))
    return dst


def sub_transform_8x8(block, sub):
    src = np.ascontiguousarray(block, dtype=np.int16)
    subv = np.ascontiguousarray(sub, dtype=np.int16)
    dst = np.zeros_like(src)
    L().evxu_sub_transform_8x8(_i16p(src), _i16p(subv), 8, _i16p(dst))
    return dst


def quantize_macroblock(qp, block_type, y, u, v):
    """y: (16,16), u/v: (8,8) int16; returns quantized (y, u, v)."""
    y = np.ascontiguousarray(y, dtype=np.int16)
    u = np.ascontiguousarray(u, dtype=np.int16)
    v = np.ascontiguousarray(v, dtype=np.int16)
    oy, ou, ov = np.zeros_like(y), np.zeros_like(u), np.zeros_like(v)
    L().evxu_quantize_macroblock(qp, block_type, _i16p(y), _i16p(u), _i16p(v),
                                 _i16p(oy), _i16p(ou), _i16p(ov), 16, 0, 0)
    return oy, ou, ov


def inverse_quantize_macroblock(qp, block_type, y, u, v):
    y = np.ascontiguousarray(y, dtype=np.int16)
    u = np.ascontiguousarray(u, dtype=np.int16)
    v = np.ascontiguousarray(v, dtype=np.int16)
    oy, ou, ov = np.zeros_like(y), np.zeros_like(u), np.zeros_like(v)
    L().evxu_inverse_quantize_macroblock(qp, block_type, _i16p(y), _i16p(u), _i16p(v),
                                         _i16p(oy), _i16p(ou), _i16p(ov), 16, 0, 0)
    return oy, ou, ov


def query_qp(quality, y, block_type=1):
    y = np.ascontiguousarray(y, dtype=np.int16)
    return L().evxu_query_qp(quality, _i16p(y), _i16p(y), _i16p(y), 16, block_type)


def block_variance2(y):
    y = np.ascontiguousarray(y, dtype=np.int16)
    return L().evxu_block_variance2(_i16p(y), 16)


def lerp(kind, ay, au, av, by, bu, bv):
    ins = [np.ascontiguousarray(a, dtype=np.int16) for a in (ay, au, av, by, bu, bv)]
    outs = [np.zeros(s, dtype=np.int16) for s in ((16, 16), (8, 8), (8, 8))]
    fn = L().evxu_lerp_half if kind == "half" else L().evxu_lerp_quarter
    fn(*[_i16p(a) for a in ins + outs], 16)
    return outs


def convert_rgb_to_yuv(rgb, yw, yh):
    rgb = np.ascontiguousarray(rgb, dtype=np.uint8)
    h, w = rgb.shape[:2]
    y = np.zeros((yh, yw), dtype=np.int16)
    u = np.zeros((yh // 2, yw // 2), dtype=np.int16)
    v = np.zeros((yh // 2, yw // 2), dtype=np.int16)
    L().evxu_convert_rgb_to_yuv(rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
                                w, h, _i16p(y), _i16p(u), _i16p(v), yw, yh)
    return y, u, v


def convert_yuv_to_rgb(y, u, v, width, height):
    y = np.ascontiguousarray(y, dtype=np.int16)
    u = np.ascontiguousarray(u, dtype=np.int16)
    v = np.ascontiguousarray(v, dtype=np.int16)
    rgb = np.zeros((height, width, 3), dtype=np.uint8)
    L().evxu_convert_yuv_to_rgb(_i16p(y), _i16p(u), _i16p(v), y.shape[1], y.shape[0],
                                rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
                                width, height)
    return rgb


def prediction(is_intra, quality, frame_index, src_yuv, pred_yuv, px, py,
               pred_offset=0):
    """Runs the reference motion search; returns (sad, desc dict)."""
    sy, su, sv = [np.ascontiguousarray(p, dtype=np.int16) for p in src_yuv]
    py_, pu, pv = [np.ascontiguousarray(p, dtype=np.int16) for p in pred_yuv]
    h, w = sy.shape
    desc = np.zeros(7, dtype=np.int32)
    dp = desc.ctypes.data_as(ctypes.POINTER(ctypes.c_int))
    if is_intra:
        sad = L().evxu_intra_prediction(quality, frame_index, _i16p(sy), _i16p(su),
                                        _i16p(sv), _i16p(py_), _i16p(pu), _i16p(pv),
                                        w, h, px, py, dp)
    else:
        sad = L().evxu_inter_prediction(quality, frame_index, pred_offset,
                                        _i16p(sy), _i16p(su), _i16p(sv),
                                        _i16p(py_), _i16p(pu), _i16p(pv),
                                        w, h, px, py, dp)
    keys = ["block_type", "prediction_target", "motion_x", "motion_y",
            "sp_pred", "sp_amount", "sp_index"]
    return sad, dict(zip(keys, desc.tolist()))


def deblock(y, u, v, table):
    """table: (n, 8) int32 [type, target, mx, my, sp_pred, sp_amount, sp_index, q]."""
    y = np.ascontiguousarray(y, dtype=np.int16).copy()
    u = np.ascontiguousarray(u, dtype=np.int16).copy()
    v = np.ascontiguousarray(v, dtype=np.int16).copy()
    t = np.ascontiguousarray(table, dtype=np.int32)
    L().evxu_deblock(_i16p(y), _i16p(u), _i16p(v), y.shape[1], y.shape[0],
                     t.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), len(t))
    return y, u, v


def _u8p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte))


def huffman_encode(values):
    values = np.ascontiguousarray(values, np.uint8)
    out = np.zeros(len(values) * 2 + 16, np.uint8)
    bits = L().evxu_huffman_encode(_u8p(values), len(values), _u8p(out),
                                   len(out))
    assert bits >= 0
    return out[:(bits + 7) // 8].tobytes(), int(bits)


def huffman_decode(data, nbits, count):
    buf = np.frombuffer(data, np.uint8).copy()
    out = np.zeros(count, np.uint8)
    L().evxu_huffman_decode(_u8p(buf), nbits, count, _u8p(out))
    return out


def golomb_encode(values, signed=True):
    values = np.ascontiguousarray(values, np.int16)
    out = np.zeros(len(values) * 6 + 16, np.uint8)
    bits = L().evxu_golomb_encode(_i16p(values), len(values), int(signed),
                                  _u8p(out), len(out))
    assert bits >= 0
    return out[:(bits + 7) // 8].tobytes(), int(bits)


def golomb_decode(data, nbits, count, signed=True):
    # pad: the reference peeks min(32, *byte* occupancy) bits and spins
    # forever if the final code sits in a sub-byte tail (stream.cpp:177,
    # golomb.cpp:100); trailing zero bytes keep its peek window fed without
    # changing any decoded value.
    buf = np.concatenate([np.frombuffer(data, np.uint8),
                          np.zeros(8, np.uint8)])
    out = np.zeros(count, np.int16)
    r = L().evxu_golomb_decode(_u8p(buf), nbits + 64, count, int(signed),
                               _i16p(out))
    assert r >= 0
    return out


def entropy_encode(values, mode):
    """mode: 0=i16 values, 1=u16 values, 2/3/4=zigzag 4x4/8x8/16x16 blocks,
    5=RLE 8x8 blocks. For block modes `values` is (count, n*n) row-major."""
    flat = np.ascontiguousarray(values, np.int16).reshape(-1)
    per = {0: 1, 1: 1, 2: 16, 3: 64, 4: 256, 5: 64}[mode]
    count = len(flat) // per
    out = np.zeros(len(flat) * 8 + 4096, np.uint8)
    bits = L().evxu_entropy_encode(_i16p(flat), count, mode, _u8p(out),
                                   len(out))
    assert bits >= 0
    return out[:(bits + 7) // 8].tobytes(), int(bits)


def entropy_decode(data, nbits, count, mode):
    per = {0: 1, 1: 1, 2: 16, 3: 64, 4: 256, 5: 64}[mode]
    buf = np.frombuffer(data, np.uint8).copy()
    out = np.zeros(count * per, np.int16)
    r = L().evxu_entropy_decode(_u8p(buf), nbits, count, mode, _i16p(out))
    assert r >= 0
    return out


# ----- analysis.h metric helpers -----

def _c16(a):
    return np.ascontiguousarray(a, dtype=np.int16)


def block_sad(left, right=None):
    if right is None:
        return L().evxu_block_sad1(_i16p(_c16(left)), 16)
    return L().evxu_block_sad2(_i16p(_c16(left)), _i16p(_c16(right)), 16)


def block_mse(left, right):
    return L().evxu_block_mse(_i16p(_c16(left)), _i16p(_c16(right)), 16)


def block_ssd(left, right):
    return L().evxu_block_ssd(_i16p(_c16(left)), _i16p(_c16(right)), 16)


def block_mad(ly, lu, lv, ry, ru, rv):
    return L().evxu_block_mad(
        _i16p(_c16(ly)), _i16p(_c16(lu)), _i16p(_c16(lv)),
        _i16p(_c16(ry)), _i16p(_c16(ru)), _i16p(_c16(rv)), 16)


def block_mean(y):
    return L().evxu_block_mean(_i16p(_c16(y)), 16)


def nonzero_block_mean(y):
    return L().evxu_nonzero_block_mean(_i16p(_c16(y)), 16)


def block_variance(y):
    return L().evxu_block_variance(_i16p(_c16(y)), 16)


def block_variance3(y):
    return L().evxu_block_variance3(_i16p(_c16(y)), 16)
