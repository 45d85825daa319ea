"""Differential tests: motion search vs the reference (order-exact)."""

import numpy as np

import oracle_units as ou
from cairo_tpu.cpuref import motion

rng = np.random.default_rng(3)


def _planes(w, h, amplitude=255, smooth=True):
    if smooth:
        yy, xx = np.mgrid[0:h, 0:w]
        y = (128 + amplitude / 2 * np.sin(xx * 0.11) * np.cos(yy * 0.07)).astype(np.int16)
        y += rng.integers(-6, 7, (h, w)).astype(np.int16)
    else:
        y = rng.integers(0, amplitude, (h, w)).astype(np.int16)
    u = rng.integers(100, 160, (h // 2, w // 2)).astype(np.int16)
    v = rng.integers(100, 160, (h // 2, w // 2)).astype(np.int16)
    return y, u, v


def _check(is_intra, quality, frame_index, src_planes, pred_planes, px, py,
           offset=0):
    ref_sad, ref_desc = ou.prediction(is_intra, quality, frame_index,
                                      src_planes, pred_planes, px, py, offset)
    src = motion.Planes(*src_planes).block(px, py)
    pred = motion.Planes(*pred_planes)
    if is_intra:
        sad, desc = motion.intra_prediction(quality, src, px, py, pred)
    else:
        sad, desc = motion.inter_prediction(quality, src, px, py, pred, offset)
    ctx = f"intra={is_intra} q={quality} px={px} py={py}"
    assert sad == ref_sad, ctx
    for key, val in ref_desc.items():
        assert int(desc[key]) == val, f"{ctx} {key}: {desc[key]} != {val}"


def test_intra_search_matches():
    w, h = 128, 96
    src = _planes(w, h)
    # prediction: shifted copy (so matches exist) + noise
    pred = tuple(np.roll(p, 3, axis=1) for p in src)
    for quality in (1, 8, 16, 31):
        for px in range(0, w, 16):
            for py in range(0, h, 16):
                _check(True, quality, 0, src, pred, px, py)


def test_intra_search_identical_planes():
    # src == pred: exact matches abound -> copy blocks, tie-breaking stressed
    w, h = 96, 64
    src = _planes(w, h)
    for quality in (8, 16):
        for px in range(0, w, 16):
            for py in range(0, h, 16):
                _check(True, quality, 0, src, src, px, py)


def test_inter_search_matches():
    w, h = 128, 96
    src = _planes(w, h)
    for offset, shift in ((1, 2), (2, -5), (3, 9)):
        pred = tuple(np.roll(p, shift, axis=1) for p in src)
        for quality in (1, 16, 31):
            for px in range(0, w, 16):
                for py in range(0, h, 16):
                    _check(False, quality, 7, src, pred, px, py, offset)


def test_inter_search_noise():
    # pure noise: SAD threshold path, no copy blocks
    w, h = 64, 64
    src = _planes(w, h, amplitude=1024, smooth=False)
    pred = _planes(w, h, amplitude=1024, smooth=False)
    for px in range(0, w, 16):
        for py in range(0, h, 16):
            _check(False, 16, 3, src, pred, px, py, 1)
