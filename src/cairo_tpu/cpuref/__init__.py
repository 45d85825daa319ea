"""Numpy correctness engine: a bit-exact, readable executable spec of evx1.

This engine is the semantic anchor for the TPU (cairo_tpu.tpu) and native
(cairo_tpu.native) implementations: every stage here mirrors the reference
C++ control flow exactly and is differentially tested against the oracle.
"""
