"""Validates generated constant tables against the reference headers.

These tests *parse* the reference headers (read-only) and compare them to our
algorithmically generated tables — guarding against transcription drift.
"""

import re

import numpy as np

from cairo_tpu import tables


def _parse_array(path, name):
    text = open(path).read()
    match = re.search(name + r"\[\w*\]\s*=\s*\{(.*?)\};", text, re.S)
    assert match, name
    return np.array([int(tok, 0) for tok in re.findall(r"-?\w+", match.group(1))])


def test_zigzag_tables():
    ref = "/root/reference/scan.h"
    assert (tables.ZIGZAG_4x4 == _parse_array(ref, "EVX_MACROBLOCK_4x4_ZIGZAG")).all()
    assert (tables.ZIGZAG_8x8 == _parse_array(ref, "EVX_MACROBLOCK_8x8_ZIGZAG")).all()
    assert (tables.ZIGZAG_16x16 == _parse_array(ref, "EVX_MACROBLOCK_16x16_ZIGZAG")).all()


def test_dct_basis():
    ref = "/root/reference/xftables.h"
    assert (tables.DCT_BASIS_4.ravel() == _parse_array(ref, "EVX_TRANSFORM_4x4_TRIG_128_LUT")).all()
    assert (tables.DCT_BASIS_8.ravel() == _parse_array(ref, "EVX_TRANSFORM_8x8_TRIG_128_LUT")).all()
    assert (tables.DCT_BASIS_16.ravel() == _parse_array(ref, "EVX_TRANSFORM_16x16_TRIG_128_LUT")).all()


def test_quant_matrices():
    ref = "/root/reference/quantize.cpp"
    assert (tables.INTRA_QM_8x8.ravel() == _parse_array(ref, "default_intra_8x8_qm")).all()
    assert (tables.INTER_QM_8x8.ravel() == _parse_array(ref, "default_inter_8x8_qm")).all()


def test_deblock_tables():
    ref = "/root/reference/deblock.cpp"
    assert (tables.DEBLOCK_ALPHA == _parse_array(ref, "alpha_table")).all()
    assert (tables.DEBLOCK_BETA == _parse_array(ref, "beta_table")).all()


def test_golomb_luts_match_reference():
    ref = "/root/reference/egtables.h"
    usize = _parse_array(ref, "EVX_UEXP_GOLOMB_SIZE_LUT")
    ucode = _parse_array(ref, "EVX_UEXP_GOLOMB_CODES")
    ssize = _parse_array(ref, "EVX_SEXP_GOLOMB_SIZE_LUT")
    scode = _parse_array(ref, "EVX_SEXP_GOLOMB_CODES")
    assert (tables.UGOLOMB_SIZES == usize).all()
    assert (tables.UGOLOMB_CODES == ucode).all()
    # Signed LUT in the reference is indexed by uint8 cast of int8 (-128..127)
    idx = np.arange(256)
    signed_vals = np.where(idx >= 128, idx - 256, idx).astype(np.int64) & 0xFFFF
    assert (tables.SGOLOMB_SIZES[signed_vals] == ssize).all()
    assert (tables.SGOLOMB_CODES[signed_vals] == scode).all()


def test_dc_scales():
    qp = np.arange(1, 32)
    # quantize.cpp:37-55 piecewise definitions, re-evaluated directly
    luma = np.array([8 if q < 5 else 2 * q if q < 9 else q + 8 if q < 25 else 2 * q - 16
                     for q in qp])
    chroma = np.array([8 if q < 5 else (q + 13) >> 1 if q < 25 else q - 6 for q in qp])
    assert (tables.luma_dc_scale(qp) == luma).all()
    assert (tables.chroma_dc_scale(qp) == chroma).all()
