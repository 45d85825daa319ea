"""Native C++ slice codec vs Python slicecodec (and round-trip)."""

import numpy as np

from cairo_tpu import native
from cairo_tpu.blocktypes import BlockTable
from cairo_tpu.entropy.bitio import BitReader, BitWriter
from cairo_tpu.entropy.slicecodec import decode_slice as py_decode
from cairo_tpu.entropy.slicecodec import encode_slice as py_encode

rng = np.random.default_rng(11)


def _random_state(wb, hb, frame_no=0):
    n = wb * hb
    bt = BlockTable.zeros(n)
    bt.block_type = rng.choice([0, 1, 2, 3, 4, 6, 7], size=n).astype(np.uint8)
    if frame_no == 0:
        bt.block_type = np.full(n, 1, dtype=np.uint8)
    motion = (bt.block_type & 2) != 0
    bt.prediction_target = np.where((bt.block_type & 1) == 0,
                                    rng.integers(1, 4, n), 0).astype(np.uint8)
    bt.motion_x = np.where(motion, rng.integers(-40, 41, n), 0).astype(np.int16)
    bt.motion_y = np.where(motion, rng.integers(-40, 41, n), 0).astype(np.int16)
    bt.sp_pred = motion & (rng.random(n) < 0.5)
    bt.sp_amount = bt.sp_pred & (rng.random(n) < 0.5)
    bt.sp_index = np.where(bt.sp_pred, rng.integers(0, 8, n), 0).astype(np.uint8)
    bt.q_index = np.where((bt.block_type & 4) == 0,
                          rng.integers(1, 32, n), 0).astype(np.uint8)
    w, h = wb * 16, hb * 16
    # sparse-ish residuals like real DCT output
    y = (rng.integers(-60, 61, (h, w)) * (rng.random((h, w)) < 0.2)).astype(np.int16)
    u = (rng.integers(-60, 61, (h // 2, w // 2)) * (rng.random((h // 2, w // 2)) < 0.2)).astype(np.int16)
    v = (rng.integers(-60, 61, (h // 2, w // 2)) * (rng.random((h // 2, w // 2)) < 0.2)).astype(np.int16)
    return bt, y, u, v


def test_native_encode_matches_python():
    for trial in range(4):
        bt, y, u, v = _random_state(5, 4, frame_no=trial % 2)
        out = BitWriter()
        py_encode(bt, y, u, v, out)
        py_bytes = out.getvalue()
        nat_bytes, nat_bits = native.encode_slice(bt, y, u, v)
        assert nat_bits == out.bit_count
        assert nat_bytes == py_bytes, f"trial {trial}"


def test_native_decode_matches_python():
    for trial in range(4):
        bt, y, u, v = _random_state(4, 3, frame_no=trial % 2)
        chunk, bits = native.encode_slice(bt, y, u, v)

        bt_py = BlockTable.zeros(len(bt))
        y_py = np.zeros_like(y); u_py = np.zeros_like(u); v_py = np.zeros_like(v)
        py_decode(BitReader(chunk), len(bt), y_py, u_py, v_py, bt_py)

        bt_nat = BlockTable.zeros(len(bt))
        y_n = np.zeros_like(y); u_n = np.zeros_like(u); v_n = np.zeros_like(v)
        native.decode_slice(chunk, 0, bt_nat, y_n, u_n, v_n)

        for field in ("block_type", "prediction_target", "motion_x", "motion_y",
                      "sp_pred", "sp_amount", "sp_index", "q_index"):
            np.testing.assert_array_equal(getattr(bt_nat, field),
                                          getattr(bt_py, field), err_msg=field)
        np.testing.assert_array_equal(y_n, y_py)
        np.testing.assert_array_equal(u_n, u_py)
        np.testing.assert_array_equal(v_n, v_py)
        # round-trip: decoded table matches input where transmitted
        np.testing.assert_array_equal(bt_nat.block_type, bt.block_type)
        np.testing.assert_array_equal(bt_nat.q_index * ((bt.block_type & 4) == 0),
                                      bt.q_index * ((bt.block_type & 4) == 0))


def test_extreme_values():
    bt, y, u, v = _random_state(3, 2, frame_no=1)
    y[0, 0] = -32768
    y[0, 8] = 32767
    y[8, 0] = -32767
    chunk, _ = native.encode_slice(bt, y, u, v)
    out = BitWriter()
    py_encode(bt, y, u, v, out)
    assert chunk == out.getvalue()
    bt2 = BlockTable.zeros(len(bt))
    y2 = np.zeros_like(y); u2 = np.zeros_like(u); v2 = np.zeros_like(v)
    native.decode_slice(chunk, 0, bt2, y2, u2, v2)
    noncopy = (bt.block_type.reshape(2, 3)[0, 0] & 4) == 0
    if noncopy:
        assert y2[0, 0] == -32768
