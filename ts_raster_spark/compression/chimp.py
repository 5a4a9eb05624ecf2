"""Chimp-style float compression (after Liakos et al., "Chimp:
Efficient Lossless Floating Point Compression for Time Series
Databases", VLDB 2022 — listed in PAPERS.md).

Differences from Gorilla that the paper identifies as wins on real
data: leading-zero counts are rounded down to a small table (3-bit
code instead of 5 raw bits), and the trailing-zero check (> 6) decides
between center-bits mode and full-suffix mode, with a 2-bit flag:

    00  xor == 0
    01  trailing > 6: 3-bit LZ code + 6-bit significant count + center bits
    10  trailing ≤ 6, LZ code equal to previous: suffix bits only
    11  trailing ≤ 6, new LZ code: 3-bit LZ code + suffix bits

The codec is self-consistent (round-trip property-tested); byte-level
parity with the reference implementation is not claimed — the at-rest
contract remains Gorilla (compression/gorilla.py), with Chimp offered
as the drop-in alternative where it measures smaller.
"""

from __future__ import annotations

import numpy as np

from ts_raster_spark.compression.gorilla import _BitReader, _BitWriter

# leading-zero rounding table (paper's): values round DOWN to these
_LZ_LEVELS = (0, 8, 12, 16, 18, 20, 22, 24)


def _lz_code(lz: int) -> int:
    code = 0
    for i, lvl in enumerate(_LZ_LEVELS):
        if lz >= lvl:
            code = i
    return code


def encode_values_chimp(vals: np.ndarray) -> bytes:
    bits = np.asarray(vals, dtype=np.float64).view(np.uint64)
    w = _BitWriter()
    n = len(bits)
    w.write(n, 32)
    if n == 0:
        return w.bytes()
    w.write(int(bits[0]), 64)
    prev = int(bits[0])
    prev_code = -1
    for i in range(1, n):
        cur = int(bits[i])
        x = prev ^ cur
        if x == 0:
            w.write(0b00, 2)
            prev_code = -1
        else:
            lz = 64 - x.bit_length()
            tz = (x & -x).bit_length() - 1
            code = _lz_code(lz)
            lzr = _LZ_LEVELS[code]
            if tz > 6:
                sig = 64 - lzr - tz
                w.write(0b01, 2)
                w.write(code, 3)
                w.write(sig, 6)
                w.write(x >> tz, sig)
                prev_code = -1
            elif code == prev_code:
                w.write(0b10, 2)
                w.write(x, 64 - lzr)
            else:
                w.write(0b11, 2)
                w.write(code, 3)
                w.write(x, 64 - lzr)
                prev_code = code
        prev = cur
    return w.bytes()


def decode_values_chimp(block: bytes) -> np.ndarray:
    r = _BitReader(block)
    n = r.read(32)
    out = np.empty(n, dtype=np.uint64)
    if n == 0:
        return out.view(np.float64)
    prev = r.read(64)
    out[0] = prev
    prev_code = -1
    for i in range(1, n):
        flag = r.read(2)
        if flag == 0b00:
            out[i] = prev
            prev_code = -1
            continue
        if flag == 0b01:
            code = r.read(3)
            sig = r.read(6)
            lzr = _LZ_LEVELS[code]
            tz = 64 - lzr - sig
            x = r.read(sig) << tz
            prev_code = -1
        elif flag == 0b10:
            lzr = _LZ_LEVELS[prev_code]
            x = r.read(64 - lzr)
        else:
            code = r.read(3)
            lzr = _LZ_LEVELS[code]
            x = r.read(64 - lzr)
            prev_code = code
        prev ^= x
        out[i] = prev
    return out.view(np.float64)
