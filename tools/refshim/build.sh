#!/bin/sh
# Builds the reference conformance oracle as a shared library.
# The reference sources are mounted read-only at /root/reference; we compile
# them out-of-tree with the Linux shim in this directory (see
# TargetConditionals.h for why -D__APPLE__ is used).
set -e
cd "$(dirname "$0")"
OUT=${1:-liboracle.so}
g++ -O2 -fPIC -shared -w \
    -D__APPLE__ \
    -I. -I/root/reference \
    oracle.cpp \
    oracle_units.cpp \
    /root/reference/abac.cpp \
    /root/reference/bitstream.cpp \
    /root/reference/common.cpp \
    /root/reference/convert.cpp \
    /root/reference/deblock.cpp \
    /root/reference/decode.cpp \
    /root/reference/encode.cpp \
    /root/reference/evx1.cpp \
    /root/reference/evx1dec.cpp \
    /root/reference/evx1enc.cpp \
    /root/reference/golomb.cpp \
    /root/reference/image.cpp \
    /root/reference/imageset.cpp \
    /root/reference/memory.cpp \
    /root/reference/motion.cpp \
    /root/reference/quantize.cpp \
    /root/reference/serialize.cpp \
    /root/reference/stream.cpp \
    /root/reference/transform.cpp \
    /root/reference/unserialize.cpp \
    -o "$OUT"
echo "built $OUT"
