"""Gorilla-style time-series block compression (public algorithm:
Pelkonen et al., "Gorilla: A Fast, Scalable, In-Memory Time Series
Database", VLDB 2015; see also Chimp VLDB 2022 / Camel SIGMOD 2024 in
PAPERS.md for the family).

- **Timestamps** (int64 microseconds): header + delta-of-delta with the
  Gorilla range buckets ('0' for dod=0, then 7/9/12-bit ranges, 64-bit
  escape — widened from the paper's 32-bit seconds escape because
  microsecond transcripts can jump hours between turns).
- **Values** (float64): XOR with predecessor; '0' if identical, '10'
  + meaningful bits when the XOR fits the previous leading/trailing
  window, '11' + 5-bit leading-zero count + 6-bit length + bits.

Encoders/decoders are plain NumPy/bytes and run *inside* grouped Arrow
UDFs (one block per (conv_id, kind, bucket)) — the engine analog of the
reference's float32 at-rest downcast (tsraster/prep.py:132), upgraded to
bit-exact lossless blocks. Round-trip bit-exactness is the test contract
(FIXTURES.md F5).
"""

from __future__ import annotations

import numpy as np


class _BitWriter:
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, bits: int) -> None:
        self.acc = (self.acc << bits) | (value & ((1 << bits) - 1))
        self.nbits += bits
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def bytes(self) -> bytes:
        if self.nbits:
            return bytes(self.buf) + bytes([(self.acc << (8 - self.nbits)) & 0xFF])
        return bytes(self.buf)


class _BitReader:
    """O(1) per read: slice only the ≤10 bytes covering the requested
    bit span (a whole-buffer big int would make each shift O(block) and
    decode O(block²))."""

    __slots__ = ("data", "pos")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def read(self, bits: int) -> int:
        start = self.pos >> 3
        end = (self.pos + bits + 7) >> 3
        chunk = int.from_bytes(self.data[start:end], "big")
        shift = (end - start) * 8 - (self.pos - start * 8) - bits
        self.pos += bits
        return (chunk >> shift) & ((1 << bits) - 1)


_U64 = (1 << 64) - 1


def encode_timestamps(ts: np.ndarray) -> bytes:
    """int64 µs timestamps → delta-of-delta block."""
    ts = np.asarray(ts, dtype=np.int64)
    w = _BitWriter()
    n = len(ts)
    w.write(n, 32)
    if n == 0:
        return w.bytes()
    w.write(int(ts[0]) & _U64, 64)
    if n == 1:
        return w.bytes()
    deltas = np.diff(ts)
    w.write(int(deltas[0]) & _U64, 64)
    dods = np.diff(deltas)
    for dod in dods:
        d = int(dod)
        if d == 0:
            w.write(0, 1)
        elif -63 <= d <= 64:
            w.write(0b10, 2)
            w.write(d + 63, 7)
        elif -255 <= d <= 256:
            w.write(0b110, 3)
            w.write(d + 255, 9)
        elif -2047 <= d <= 2048:
            w.write(0b1110, 4)
            w.write(d + 2047, 12)
        else:
            w.write(0b1111, 4)
            w.write(d & _U64, 64)
    return w.bytes()


def decode_timestamps(block: bytes) -> np.ndarray:
    r = _BitReader(block)
    n = r.read(32)
    out = np.empty(n, dtype=np.int64)
    if n == 0:
        return out
    t0 = r.read(64)
    out[0] = np.int64(np.uint64(t0))
    if n == 1:
        return out
    d = r.read(64)
    delta = int(np.int64(np.uint64(d)))
    out[1] = out[0] + delta
    for i in range(2, n):
        if r.read(1) == 0:
            dod = 0
        else:
            if r.read(1) == 0:
                dod = r.read(7) - 63
            elif r.read(1) == 0:
                dod = r.read(9) - 255
            elif r.read(1) == 0:
                dod = r.read(12) - 2047
            else:
                dod = int(np.int64(np.uint64(r.read(64))))
        delta += dod
        out[i] = out[i - 1] + delta
    return out


def encode_values(vals: np.ndarray) -> bytes:
    """float64 values → Gorilla XOR block (NaNs allowed; bit-exact)."""
    bits = np.asarray(vals, dtype=np.float64).view(np.uint64)
    w = _BitWriter()
    n = len(bits)
    w.write(n, 32)
    if n == 0:
        return w.bytes()
    w.write(int(bits[0]), 64)
    prev = int(bits[0])
    lead, tlen = 65, 0  # previous meaningful-bit window (invalid sentinel)
    for i in range(1, n):
        cur = int(bits[i])
        x = prev ^ cur
        if x == 0:
            w.write(0, 1)
        else:
            l = 64 - x.bit_length()
            if l > 31:
                l = 31  # Gorilla caps leading zeros at 5 bits
            t = (x & -x).bit_length() - 1  # trailing zeros
            w.write(1, 1)
            if lead <= 64 and l >= lead and t >= (64 - lead - tlen):
                # fits inside previous window -> control bit '0'
                w.write(0, 1)
                w.write(x >> (64 - lead - tlen), tlen)
            else:
                w.write(1, 1)
                mlen = 64 - l - t
                w.write(l, 5)
                w.write(mlen - 1, 6)  # 1..64 stored in 6 bits
                w.write(x >> t, mlen)
                lead, tlen = l, mlen
        prev = cur
    return w.bytes()


def decode_values(block: bytes) -> np.ndarray:
    r = _BitReader(block)
    n = r.read(32)
    out = np.empty(n, dtype=np.uint64)
    if n == 0:
        return out.view(np.float64)
    prev = r.read(64)
    out[0] = prev
    lead, tlen = 0, 0
    for i in range(1, n):
        if r.read(1) == 0:
            out[i] = prev
            continue
        if r.read(1) == 0:
            mbits = r.read(tlen)
            x = mbits << (64 - lead - tlen)
        else:
            lead = r.read(5)
            tlen = r.read(6) + 1
            mbits = r.read(tlen)
            x = mbits << (64 - lead - tlen)
        prev ^= x
        out[i] = prev
    return out.view(np.float64)
