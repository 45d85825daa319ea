"""ctypes wrapper for the reference conformance oracle (liboracle.so).

Used by the test-suite as the ground truth for bit-exactness: every stream our
encoder produces must be decodable by this oracle to identical RGB, and our
decoder must reproduce the oracle decoder on oracle streams.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "liboracle.so")


def _load():
    stale = not os.path.exists(_LIB_PATH)
    if not stale:  # rebuild when any shim source is newer than the .so
        mtime = os.path.getmtime(_LIB_PATH)
        for f in os.listdir(_DIR):
            if f.endswith((".cpp", ".h", ".sh")) and \
                    os.path.getmtime(os.path.join(_DIR, f)) > mtime:
                stale = True
                break
    if stale:
        subprocess.run(["sh", os.path.join(_DIR, "build.sh")], check=True)
    lib = ctypes.CDLL(_LIB_PATH)
    u8p = ctypes.POINTER(ctypes.c_ubyte)
    u32p = ctypes.POINTER(ctypes.c_uint)
    lib.evxo_encoder_create.restype = ctypes.c_void_p
    lib.evxo_encoder_create.argtypes = [ctypes.c_uint]
    lib.evxo_encoder_destroy.argtypes = [ctypes.c_void_p]
    lib.evxo_encoder_set_quality.argtypes = [ctypes.c_void_p, ctypes.c_ubyte]
    lib.evxo_encoder_insert_intra.argtypes = [ctypes.c_void_p]
    lib.evxo_encode.argtypes = [ctypes.c_void_p, u8p, ctypes.c_uint,
                                ctypes.c_uint, u8p, ctypes.c_uint, u32p, u32p]
    lib.evxo_encoder_peek.argtypes = [ctypes.c_void_p, ctypes.c_int, u8p]
    lib.evxo_decoder_create.restype = ctypes.c_void_p
    lib.evxo_decoder_destroy.argtypes = [ctypes.c_void_p]
    lib.evxo_decode.argtypes = [ctypes.c_void_p, u8p, ctypes.c_uint, u8p]
    return lib


_lib = None


def lib():
    global _lib
    if _lib is None:
        _lib = _load()
    return _lib


def _u8p(arr):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte))


class OracleEncoder:
    PEEK_SOURCE = 0
    PEEK_PREDICTION = 1
    PEEK_BLOCK_TABLE = 2
    PEEK_QUANT_TABLE = 3
    PEEK_SPMP_TABLE = 4
    PEEK_BLOCK_VARIANCE = 5
    PEEK_DESTINATION = 6

    def __init__(self, capacity_bytes: int = 64 << 20):
        self._lib = lib()
        self._h = self._lib.evxo_encoder_create(capacity_bytes)
        self._cap = capacity_bytes
        self._out = np.empty(capacity_bytes, dtype=np.uint8)
        self.width = None
        self.height = None

    def close(self):
        if self._h:
            self._lib.evxo_encoder_destroy(self._h)
            self._h = None

    def __del__(self):
        self.close()

    def set_quality(self, quality: int):
        status = self._lib.evxo_encoder_set_quality(self._h, quality)
        assert status == 0, status

    def insert_intra(self):
        status = self._lib.evxo_encoder_insert_intra(self._h)
        assert status == 0, status

    def encode(self, rgb: np.ndarray) -> tuple[bytes, int]:
        """Encodes an (H, W, 3) uint8 frame; returns (chunk_bytes, bit_count)."""
        assert rgb.dtype == np.uint8 and rgb.ndim == 3 and rgb.shape[2] == 3
        rgb = np.ascontiguousarray(rgb)
        height, width = rgb.shape[:2]
        self.width, self.height = width, height
        nbytes = ctypes.c_uint(0)
        nbits = ctypes.c_uint(0)
        status = self._lib.evxo_encode(
            self._h, _u8p(rgb), width, height, _u8p(self._out), self._cap,
            ctypes.byref(nbytes), ctypes.byref(nbits))
        assert status == 0, f"oracle encode failed: {status}"
        return self._out[:nbytes.value].tobytes(), nbits.value

    def peek(self, state: int) -> np.ndarray:
        out = np.zeros((self.height, self.width, 3), dtype=np.uint8)
        status = self._lib.evxo_encoder_peek(self._h, state, _u8p(out))
        assert status == 0, status
        return out


class OracleDecoder:
    def __init__(self):
        self._lib = lib()
        self._h = self._lib.evxo_decoder_create()

    def close(self):
        if self._h:
            self._lib.evxo_decoder_destroy(self._h)
            self._h = None

    def __del__(self):
        self.close()

    def decode(self, chunk: bytes, width: int, height: int) -> np.ndarray:
        out = np.zeros((height, width, 3), dtype=np.uint8)
        buf = np.frombuffer(bytearray(chunk), dtype=np.uint8)
        status = self._lib.evxo_decode(self._h, _u8p(buf), len(chunk), _u8p(out))
        assert status == 0, f"oracle decode failed: {status}"
        return out
