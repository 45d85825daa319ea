"""LSB-first bit I/O.

The evx1 wire format packs bits LSB-first within each byte
(bitstream.cpp:181-200): bit k of the stream lives at byte k>>3, bit k&7.
"""

from __future__ import annotations


class BitWriter:
    __slots__ = ("_bytes", "bit_count", "_cur", "_curbits")

    def __init__(self):
        self._bytes = bytearray()
        self.bit_count = 0
        self._cur = 0
        self._curbits = 0

    def write_bit(self, bit: int):
        self._cur |= (bit & 1) << self._curbits
        self._curbits += 1
        self.bit_count += 1
        if self._curbits == 8:
            self._bytes.append(self._cur)
            self._cur = 0
            self._curbits = 0

    def write_bits(self, value: int, count: int):
        """Writes `count` bits of `value`, LSB first."""
        for _ in range(count):
            self.write_bit(value & 1)
            value >>= 1

    def write_bytes(self, data: bytes):
        if self._curbits == 0:
            self._bytes.extend(data)
            self.bit_count += 8 * len(data)
        else:
            for b in data:
                self.write_bits(b, 8)

    def getvalue(self) -> bytes:
        """Byte image; unused high bits of a partial tail byte are zero."""
        out = bytes(self._bytes)
        if self._curbits:
            out += bytes([self._cur])
        return out


class BitReader:
    __slots__ = ("_data", "bit_pos", "bit_limit")

    def __init__(self, data: bytes, bit_limit: int | None = None):
        self._data = data
        self.bit_pos = 0
        self.bit_limit = bit_limit if bit_limit is not None else 8 * len(data)

    def is_empty(self) -> bool:
        return self.bit_pos >= self.bit_limit

    def read_bit(self) -> int:
        """Reads one bit; raises past the limit (callers gate on is_empty)."""
        if self.bit_pos >= self.bit_limit:
            raise EOFError("bit stream exhausted")
        byte = self._data[self.bit_pos >> 3]
        bit = (byte >> (self.bit_pos & 7)) & 1
        self.bit_pos += 1
        return bit

    def read_bits(self, count: int) -> int:
        """Reads `count` bits LSB-first into an int."""
        value = 0
        for k in range(count):
            value |= self.read_bit() << k
        return value

    def read_bytes(self, count: int) -> bytes:
        if (self.bit_pos & 7) == 0:
            start = self.bit_pos >> 3
            self.bit_pos += 8 * count
            if self.bit_pos > self.bit_limit:
                raise EOFError("bit stream exhausted")
            return bytes(self._data[start:start + count])
        return bytes(self.read_bits(8) for _ in range(count))
