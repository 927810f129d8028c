"""Integer range coder (carry-propagating, byte-oriented, LZMA-style).

This is the bit-exact specification implementation; ``native/cabac.cpp``
implements the identical algorithm in C++ and must produce byte-identical
streams (tested cross-wise).  The reference repo's arithmetic coder pair is
internally inconsistent — its encoder emits one bit per byte while its decoder
reads eight (SURVEY §2.3 E2) — so this coder is a re-specification, not a
translation:

- state: ``low`` (64-bit with carry), ``range`` (32-bit), byte-wise
  renormalisation when ``range < 2^24``;
- probabilities: integer cumulative frequencies with ``total < 2^16`` so
  ``range // total`` never underflows;
- decoder mirrors the encoder exactly; no floating point anywhere.
"""

from __future__ import annotations

from typing import List

_TOP = 1 << 24
_MASK32 = (1 << 32) - 1


class RangeEncoder:
    def __init__(self):
        self.low = 0          # u64 (carry accumulates in bit 32)
        self.range = _MASK32  # u32
        self.cache = 0
        self.cache_size = 1
        self.out = bytearray()

    def _shift_low(self) -> None:
        if (self.low & _MASK32) < 0xFF000000 or (self.low >> 32) != 0:
            carry = self.low >> 32
            c = self.cache
            while True:
                self.out.append((c + carry) & 0xFF)
                c = 0xFF
                self.cache_size -= 1
                if self.cache_size == 0:
                    break
            self.cache = (self.low >> 24) & 0xFF
        self.cache_size += 1
        self.low = (self.low << 8) & _MASK32

    def encode(self, cum_lo: int, cum_hi: int, total: int) -> None:
        """Encode a symbol spanning [cum_lo, cum_hi) of ``total``."""
        r = self.range // total
        self.low += r * cum_lo
        self.range = r * (cum_hi - cum_lo)
        while self.range < _TOP:
            self.range = (self.range << 8) & _MASK32
            self._shift_low()

    def finish(self) -> bytes:
        for _ in range(5):
            self._shift_low()
        return bytes(self.out)


class RangeDecoder:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 1  # first byte is the encoder's initial cache (always 0)
        self.range = _MASK32
        self.code = 0
        for _ in range(4):
            self.code = ((self.code << 8) | self._byte()) & _MASK32

    def _byte(self) -> int:
        b = self.data[self.pos] if self.pos < len(self.data) else 0
        self.pos += 1
        return b

    def decode_target(self, total: int) -> int:
        """Return a value in [0, total) locating the symbol; caller finds the
        symbol s with cum_lo(s) <= target < cum_hi(s) then calls advance."""
        self._r = self.range // total
        t = self.code // self._r
        return total - 1 if t >= total else t

    def advance(self, cum_lo: int, cum_hi: int) -> None:
        self.code -= self._r * cum_lo
        self.range = self._r * (cum_hi - cum_lo)
        while self.range < _TOP:
            self.code = ((self.code << 8) | self._byte()) & _MASK32
            self.range = (self.range << 8) & _MASK32
