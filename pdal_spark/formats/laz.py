"""readers.las for LAZ (LASzip-compressed LAS) — from-scratch decoder.

Reference semantics: /root/reference/io/LasReader.cpp delegates LAZ to
the external LASzip/lazperf codec (not vendored in the reference repo);
this module reimplements the PUBLIC LASzip algorithm (Isenburg 2013,
"LASzip: lossless compression of LiDAR data"; the open LAS 1.4 / LASzip
record format) in pure python/numpy so the sandbox needs no native
codec. Byte-exact oracle: the reference ships .laz fixtures WITH their
uncompressed .las twins (test/data/laz/autzen_trim.{las,laz}) — decoded
records must equal the twin's bit for bit.

Supported: compressor 2 (pointwise-chunked) with v2 items AND
compressor 1 (pointwise, pre-2011 single-stream files) with v1 items —
POINT10, GPSTIME11, RGB12 in both generations, i.e. point formats 0-3
as produced by laszip/LAStools and PDAL's writers.las(compression) —
plus compressor 3 (layered chunked, v3 items POINT14/RGB14/RGBNIR14/
BYTE14 for LAS 1.4 formats 6-8) via formats/laz14.py, which reuses
this module's byte-verified coder machinery (see laz14's docstring
for its oracle-honesty statement: no v3 fixture ships, so conformance
is round-trip + uncompressed-twin, not byte-twin).

STATUS — VERIFIED and wired into the public reader (formats/las.py
decodes .laz transparently). tests/test_laz.py pins:
  * FULL byte-exact decode of real laszip output: every point of every
    chunk of autzen_trim.laz (110,000 pts, 3 chunks) and of all three
    laszip/ fixtures (laszip-/liblas-generated + padded-VLR variant,
    1065 pts each) equals the uncompressed .las twin bit for bit;
  * the FastAC arithmetic coder pair (Encoder/Decoder, bit + adaptive
    symbol models incl. the first-cycle reset rule) round-trips;
  * IntegerCompressor compress/decompress round-trip (5k random
    walks, all k paths);
  * the full POINT10+GPSTIME11+RGB12 v2 codec chain round-trips
    (encode -> decode == input) on synthetic point streams;
  * chunk-table parsing and chunk-parallel layout against the real
    autzen_trim.laz fixture.
The historical residual divergence (byte-exact only for prefixes)
was FastAC's bit-model probability update: a DOUBLE truncation
(scale = 2^31 // count, then (count0 * scale) >> 18), not a single
floor division — see BitModel._update.

Scale shape: LAZ chunks (default 50k points) are independent streams —
the chunk table gives their offsets, so decode parallelizes chunk-per-
task exactly like the uncompressed LAS chunk split (formats/las.py).
The entropy coder is inherently sequential WITHIN a chunk (that is the
format), so per-chunk decode is a python loop — the parallel unit is
the chunk, as it is for every LAZ consumer.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["read_laz_points", "laz_vlr_info", "laz_chunk_extents",
           "encode_chunk", "make_laz_vlr", "encode_chunk_sizes",
           "laz_items_for_format", "LazUnsupported"]

U32 = 0xFFFFFFFF
AC_MIN_LENGTH = 0x01000000

BM_LENGTH_SHIFT = 13
BM_MAX_COUNT = 1 << BM_LENGTH_SHIFT
DM_LENGTH_SHIFT = 15
DM_MAX_COUNT = 1 << DM_LENGTH_SHIFT


class LazUnsupported(NotImplementedError):
    pass


# ---------------------------------------------------------------------------
# arithmetic decoder (FastAC, Amir Said — as fixed in the LASzip format)
# ---------------------------------------------------------------------------


class BitModel:
    __slots__ = ("bit_0_count", "bit_count", "bit_0_prob", "update_cycle",
                 "bits_until_update")

    def __init__(self):
        # a fresh model starts at p0 = 1/2 EXACTLY — laszip's init sets
        # the fields and does NOT run an update (unlike the symbol
        # model, whose init must build its distribution)
        self.bit_0_count = 1
        self.bit_count = 2
        self.bit_0_prob = 1 << (BM_LENGTH_SHIFT - 1)
        self.update_cycle = self.bits_until_update = 4

    def _update(self):
        self.bit_count += self.update_cycle
        if self.bit_count > BM_MAX_COUNT:
            self.bit_count = (self.bit_count + 1) >> 1
            self.bit_0_count = (self.bit_0_count + 1) >> 1
            if self.bit_0_count == self.bit_count:
                self.bit_count += 1
        # FastAC computes p0 with a DOUBLE truncation — scale first,
        # then shift — NOT the single-floor (count << shift) // total.
        # The two differ by 1 for many (count, total) pairs (e.g. 3/6:
        # 4095 vs 4096), which was the residual adaptive-model
        # divergence vs real laszip streams.
        scale = 0x80000000 // self.bit_count
        self.bit_0_prob = (self.bit_0_count * scale) \
            >> (31 - BM_LENGTH_SHIFT)
        self.update_cycle = min((5 * self.update_cycle) >> 2, 64)
        self.bits_until_update = self.update_cycle


class SymModel:
    __slots__ = ("symbols", "last_symbol", "distribution", "symbol_count",
                 "decoder_table", "table_size", "table_shift", "total_count",
                 "update_cycle", "symbols_until_update")

    def __init__(self, symbols: int):
        self.symbols = symbols
        self.last_symbol = symbols - 1
        if symbols > 16:
            table_bits = 3
            while symbols > (1 << (table_bits + 2)):
                table_bits += 1
            self.table_size = 1 << table_bits
            self.table_shift = DM_LENGTH_SHIFT - table_bits
            self.decoder_table = [0] * (self.table_size + 2)
        else:
            self.table_size = self.table_shift = 0
            self.decoder_table = None
        self.distribution = [0] * symbols
        self.symbol_count = [1] * symbols
        self.total_count = 0
        self.update_cycle = symbols
        self._update()
        # FastAC reset(): the FIRST adaptation period is (symbols+6)/2,
        # overriding what the initial update() computed
        self.update_cycle = (symbols + 6) >> 1
        self.symbols_until_update = self.update_cycle

    def _update(self):
        self.total_count += self.update_cycle
        if self.total_count > DM_MAX_COUNT:
            self.total_count = 0
            for k in range(self.symbols):
                self.symbol_count[k] = (self.symbol_count[k] + 1) >> 1
                self.total_count += self.symbol_count[k]
        scale = 0x80000000 // self.total_count
        ssum = 0
        if self.table_size == 0:
            for k in range(self.symbols):
                self.distribution[k] = (scale * ssum) >> (31 - DM_LENGTH_SHIFT)
                ssum += self.symbol_count[k]
        else:
            s = 0
            for k in range(self.symbols):
                self.distribution[k] = (scale * ssum) >> (31 - DM_LENGTH_SHIFT)
                ssum += self.symbol_count[k]
                w = self.distribution[k] >> self.table_shift
                while s < w:
                    s += 1
                    self.decoder_table[s] = k - 1
            self.decoder_table[0] = 0
            while s <= self.table_size:
                s += 1
                self.decoder_table[s] = self.symbols - 1
        self.update_cycle = (5 * self.update_cycle) >> 2
        max_cycle = (self.symbols + 6) << 3
        if self.update_cycle > max_cycle:
            self.update_cycle = max_cycle
        self.symbols_until_update = self.update_cycle


class Decoder:
    __slots__ = ("data", "pos", "value", "length")

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos
        self.value = int.from_bytes(data[pos:pos + 4], "big")
        self.pos = pos + 4
        self.length = U32

    def _renorm(self):
        data, pos = self.data, self.pos
        value, length = self.value, self.length
        while length < AC_MIN_LENGTH:
            b = data[pos] if pos < len(data) else 0
            value = ((value << 8) | b) & U32
            pos += 1
            length = (length << 8) & U32
        self.pos, self.value, self.length = pos, value, length

    def decode_bit(self, m: BitModel) -> int:
        x = m.bit_0_prob * (self.length >> BM_LENGTH_SHIFT)
        if self.value < x:
            sym = 0
            self.length = x
            m.bit_0_count += 1
        else:
            sym = 1
            self.value -= x
            self.length -= x
        if self.length < AC_MIN_LENGTH:
            self._renorm()
        m.bits_until_update -= 1
        if m.bits_until_update == 0:
            m._update()
        return sym

    def decode_symbol(self, m: SymModel) -> int:
        y = self.length
        self.length >>= DM_LENGTH_SHIFT
        dv = self.value // self.length
        if m.decoder_table is not None:
            t = dv >> m.table_shift
            sym = m.decoder_table[t]
            n = m.decoder_table[t + 1] + 1
            dist = m.distribution
            while n > sym + 1:
                k = (sym + n) >> 1
                if dist[k] > dv:
                    n = k
                else:
                    sym = k
            x = dist[sym] * self.length
            if sym != m.last_symbol:
                y = dist[sym + 1] * self.length
        else:
            dist = m.distribution
            sym = 0
            n = m.symbols
            # find last sym with dist[sym] <= dv (dist[0] == 0)
            while n > sym + 1:
                k = (sym + n) >> 1
                if dist[k] > dv:
                    n = k
                else:
                    sym = k
            x = dist[sym] * self.length
            if sym != m.last_symbol:
                y = dist[sym + 1] * self.length
        self.value -= x
        self.length = y - x
        if self.length < AC_MIN_LENGTH:
            self._renorm()
        m.symbol_count[sym] += 1
        m.symbols_until_update -= 1
        if m.symbols_until_update == 0:
            m._update()
        return sym

    def read_bits(self, bits: int) -> int:
        if bits > 19:
            low = self.read_short()
            hi = self.read_bits(bits - 16) << 16
            return hi | low
        self.length >>= bits
        sym = self.value // self.length
        self.value -= sym * self.length
        if self.length < AC_MIN_LENGTH:
            self._renorm()
        return sym

    def read_short(self) -> int:
        self.length >>= 16
        sym = self.value // self.length
        self.value -= sym * self.length
        if self.length < AC_MIN_LENGTH:
            self._renorm()
        return sym


# ---------------------------------------------------------------------------
# integer compressor (decompress side)
# ---------------------------------------------------------------------------


def _i32(v: int) -> int:
    v &= U32
    return v - (1 << 32) if v >= (1 << 31) else v


class IntDecomp:
    __slots__ = ("dec", "bits", "contexts", "bits_high", "corr_bits",
                 "corr_min", "m_bits", "m_corr0", "m_corr", "k")

    def __init__(self, dec: Decoder, bits: int = 32, contexts: int = 1,
                 bits_high: int = 8):
        self.dec = dec
        self.bits = bits
        self.contexts = contexts
        self.bits_high = bits_high
        self.corr_bits = bits
        # for the full 32-bit range: corrector of k == 32 is I32_MIN
        self.corr_min = -(1 << (bits - 1)) if bits < 32 else -0x80000000
        self.m_bits = [SymModel(self.corr_bits + 1) for _ in range(contexts)]
        self.m_corr0 = BitModel()
        self.m_corr = [None] * (self.corr_bits + 1)
        self.k = 0

    def _corr_model(self, k: int) -> SymModel:
        m = self.m_corr[k]
        if m is None:
            m = SymModel(1 << min(k, self.bits_high))
            self.m_corr[k] = m
        return m

    def decompress(self, pred: int, context: int = 0) -> int:
        k = self.dec.decode_symbol(self.m_bits[context])
        self.k = k
        return _i32(pred + self._read_corrector(k))

    def _read_corrector(self, k: int) -> int:
        dec = self.dec
        if k == 0:
            return dec.decode_bit(self.m_corr0)
        if k >= 32:
            return self.corr_min
        if k <= self.bits_high:
            c = dec.decode_symbol(self._corr_model(k))
        else:
            k1 = k - self.bits_high
            c = dec.decode_symbol(self._corr_model(k))
            c = (c << k1) | dec.read_bits(k1)
        # translate c back into its correct interval
        if c >= (1 << (k - 1)):
            c += 1
        else:
            c -= (1 << k) - 1
        return c


class StreamingMedian5:
    __slots__ = ("v", "high")

    def __init__(self):
        self.v = [0, 0, 0, 0, 0]
        self.high = True

    def add(self, x: int):
        v = self.v
        if self.high:
            if x < v[2]:
                v[4] = v[3]
                v[3] = v[2]
                if x < v[0]:
                    v[2] = v[1]
                    v[1] = v[0]
                    v[0] = x
                elif x < v[1]:
                    v[2] = v[1]
                    v[1] = x
                else:
                    v[2] = x
            else:
                if x < v[3]:
                    v[4] = v[3]
                    v[3] = x
                else:
                    v[4] = x
                self.high = False
        else:
            if v[2] < x:
                v[0] = v[1]
                v[1] = v[2]
                if v[4] < x:
                    v[2] = v[3]
                    v[3] = v[4]
                    v[4] = x
                elif v[3] < x:
                    v[2] = v[3]
                    v[3] = x
                else:
                    v[2] = x
            else:
                if v[1] < x:
                    v[0] = v[1]
                    v[1] = x
                else:
                    v[0] = x
                self.high = True

    def get(self) -> int:
        return self.v[2]


# ---------------------------------------------------------------------------
# POINT10 v2 (the fixed 8x8 context tables are part of the public format)
# ---------------------------------------------------------------------------

NUMBER_RETURN_MAP = [
    [15, 14, 13, 12, 11, 10, 9, 8],
    [14, 0, 1, 3, 6, 10, 10, 9],
    [13, 1, 2, 4, 7, 11, 11, 10],
    [12, 3, 4, 5, 8, 12, 12, 11],
    [11, 6, 7, 8, 9, 13, 13, 12],
    [10, 10, 11, 12, 13, 14, 14, 13],
    [9, 10, 11, 12, 13, 14, 15, 14],
    [8, 9, 10, 11, 12, 13, 14, 15],
]

NUMBER_RETURN_LEVEL = [
    [0, 1, 2, 3, 4, 5, 6, 7],
    [1, 0, 1, 2, 3, 4, 5, 6],
    [2, 1, 0, 1, 2, 3, 4, 5],
    [3, 2, 1, 0, 1, 2, 3, 4],
    [4, 3, 2, 1, 0, 1, 2, 3],
    [5, 4, 3, 2, 1, 0, 1, 2],
    [6, 5, 4, 3, 2, 1, 0, 1],
    [7, 6, 5, 4, 3, 2, 1, 0],
]


def _u8_fold(x: int) -> int:
    return x & 0xFF


class Point10v2:
    def __init__(self, dec: Decoder, first: bytes):
        self.dec = dec
        (x, y, z, intensity, flags, classification, sar, user_data,
         psid) = struct.unpack("<iiiHBBbBH", first[:20])
        self.x, self.y, self.z = x, y, z
        self.intensity = 0  # laszip: last intensity forced to 0 on init
        self.flags = flags
        self.classification = classification
        self.sar = sar & 0xFF
        self.user_data = user_data
        self.psid = psid
        self.m_changed = SymModel(64)
        self.ic_intensity = IntDecomp(dec, 16, 4)
        self.m_sar = [SymModel(256), SymModel(256)]
        self.ic_psid = IntDecomp(dec, 16)
        self.m_bit_byte = [None] * 256
        self.m_classification = [None] * 256
        self.m_user_data = [None] * 256
        self.ic_dx = IntDecomp(dec, 32, 2)
        self.ic_dy = IntDecomp(dec, 32, 22)
        self.ic_z = IntDecomp(dec, 32, 20)
        self.med_x = [StreamingMedian5() for _ in range(16)]
        self.med_y = [StreamingMedian5() for _ in range(16)]
        self.last_intensity = [0] * 16
        self.last_height = [0] * 8

    def _lazy(self, arr, idx):
        m = arr[idx]
        if m is None:
            m = SymModel(256)
            arr[idx] = m
        return m

    def read(self) -> tuple:
        dec = self.dec
        changed = dec.decode_symbol(self.m_changed)
        if changed:
            if changed & 32:
                self.flags = dec.decode_symbol(
                    self._lazy(self.m_bit_byte, self.flags))
            r = self.flags & 7
            n = (self.flags >> 3) & 7
            m = NUMBER_RETURN_MAP[n][r]
            ctx_l = NUMBER_RETURN_LEVEL[n][r]
            if changed & 16:
                self.intensity = self.ic_intensity.decompress(
                    self.last_intensity[m], m if m < 3 else 3) & 0xFFFF
                self.last_intensity[m] = self.intensity
            else:
                self.intensity = self.last_intensity[m]
            if changed & 8:
                self.classification = dec.decode_symbol(
                    self._lazy(self.m_classification, self.classification))
            if changed & 4:
                val = dec.decode_symbol(
                    self.m_sar[1 if (self.flags & 0x40) else 0])
                self.sar = _u8_fold(val + self.sar)
            if changed & 2:
                self.user_data = dec.decode_symbol(
                    self._lazy(self.m_user_data, self.user_data))
            if changed & 1:
                self.psid = self.ic_psid.decompress(self.psid) & 0xFFFF
        else:
            r = self.flags & 7
            n = (self.flags >> 3) & 7
            m = NUMBER_RETURN_MAP[n][r]
            ctx_l = NUMBER_RETURN_LEVEL[n][r]

        # X
        med = self.med_x[m].get()
        diff = self.ic_dx.decompress(med, 1 if n == 1 else 0)
        self.x = _i32(self.x + diff)
        self.med_x[m].add(diff)
        # Y
        k_bits = self.ic_dx.k
        med = self.med_y[m].get()
        ctx = (1 if n == 1 else 0) + \
            ((k_bits & 0xFE) if k_bits < 20 else 20)
        diff = self.ic_dy.decompress(med, ctx)
        self.y = _i32(self.y + diff)
        self.med_y[m].add(diff)
        # Z
        k_bits = (self.ic_dx.k + self.ic_dy.k) // 2
        ctx = (1 if n == 1 else 0) + \
            ((k_bits & 0xFE) if k_bits < 18 else 18)
        self.z = self.ic_z.decompress(self.last_height[ctx_l], ctx)
        self.last_height[ctx_l] = self.z

        return (self.x, self.y, self.z, self.intensity, self.flags,
                self.classification,
                self.sar - 256 if self.sar >= 128 else self.sar,
                self.user_data, self.psid)


# ---------------------------------------------------------------------------
# GPSTIME11 v2
# ---------------------------------------------------------------------------

GT_MULTI = 500
GT_MULTI_MINUS = -10
GT_MULTI_UNCHANGED = GT_MULTI - GT_MULTI_MINUS + 1
GT_MULTI_CODE_FULL = GT_MULTI - GT_MULTI_MINUS + 2
GT_MULTI_TOTAL = GT_MULTI - GT_MULTI_MINUS + 6


def _i64_from_u64(v: int) -> int:
    v &= (1 << 64) - 1
    return v - (1 << 64) if v >= (1 << 63) else v


class GpsTime11v2:
    def __init__(self, dec: Decoder, first: bytes):
        self.dec = dec
        (u64,) = struct.unpack("<Q", first[:8])
        self.last_gpstime = [u64, 0, 0, 0]
        self.last_diff = [0, 0, 0, 0]
        self.multi_extreme = [0, 0, 0, 0]
        self.last = 0
        self.next = 0
        self.m_multi = SymModel(GT_MULTI_TOTAL)
        self.m_0diff = SymModel(6)
        self.ic_gpstime = IntDecomp(dec, 32, 9)

    def read(self) -> int:
        dec = self.dec
        if self.last_diff[self.last] == 0:
            multi = dec.decode_symbol(self.m_0diff)
            if multi == 1:
                d = self.ic_gpstime.decompress(0, 0)
                self.last_diff[self.last] = d
                self.last_gpstime[self.last] = \
                    (self.last_gpstime[self.last] + d) & ((1 << 64) - 1)
                self.multi_extreme[self.last] = 0
            elif multi == 2:
                self.next = (self.next + 1) & 3
                prev_hi = _i32(self.last_gpstime[self.last] >> 32)
                hi = self.ic_gpstime.decompress(prev_hi, 8)
                lo = dec.read_bits(32)
                self.last_gpstime[self.next] = \
                    ((hi & U32) << 32) | lo
                self.last = self.next
                self.last_diff[self.last] = 0
                self.multi_extreme[self.last] = 0
            elif multi > 2:
                self.last = (self.last + multi - 2) & 3
                return self.read()
        else:
            multi = dec.decode_symbol(self.m_multi)
            if multi == 1:
                d = self.ic_gpstime.decompress(self.last_diff[self.last], 1)
                self.last_gpstime[self.last] = \
                    (self.last_gpstime[self.last] + d) & ((1 << 64) - 1)
                self.multi_extreme[self.last] = 0
            elif multi < GT_MULTI_UNCHANGED:
                if multi == 0:
                    d = self.ic_gpstime.decompress(0, 7)
                    self.multi_extreme[self.last] += 1
                    if self.multi_extreme[self.last] > 3:
                        self.last_diff[self.last] = d
                        self.multi_extreme[self.last] = 0
                elif multi < GT_MULTI:
                    if multi < 10:
                        d = self.ic_gpstime.decompress(
                            multi * self.last_diff[self.last], 2)
                    else:
                        d = self.ic_gpstime.decompress(
                            multi * self.last_diff[self.last], 3)
                elif multi == GT_MULTI:
                    d = self.ic_gpstime.decompress(
                        GT_MULTI * self.last_diff[self.last], 4)
                    self.multi_extreme[self.last] += 1
                    if self.multi_extreme[self.last] > 3:
                        self.last_diff[self.last] = d
                        self.multi_extreme[self.last] = 0
                else:
                    mm = GT_MULTI - multi
                    if mm > GT_MULTI_MINUS:
                        d = self.ic_gpstime.decompress(
                            mm * self.last_diff[self.last], 5)
                    else:
                        d = self.ic_gpstime.decompress(
                            GT_MULTI_MINUS * self.last_diff[self.last], 6)
                        self.multi_extreme[self.last] += 1
                        if self.multi_extreme[self.last] > 3:
                            self.last_diff[self.last] = d
                            self.multi_extreme[self.last] = 0
                self.last_gpstime[self.last] = \
                    (self.last_gpstime[self.last] + d) & ((1 << 64) - 1)
            elif multi == GT_MULTI_CODE_FULL:
                self.next = (self.next + 1) & 3
                prev_hi = _i32(self.last_gpstime[self.last] >> 32)
                hi = self.ic_gpstime.decompress(prev_hi, 8)
                lo = dec.read_bits(32)
                self.last_gpstime[self.next] = ((hi & U32) << 32) | lo
                self.last = self.next
                self.last_diff[self.last] = 0
                self.multi_extreme[self.last] = 0
            elif multi >= GT_MULTI_CODE_FULL:
                self.last = (self.last + multi - GT_MULTI_CODE_FULL) & 3
                return self.read()
        return self.last_gpstime[self.last]


# ---------------------------------------------------------------------------
# RGB12 v2
# ---------------------------------------------------------------------------


def _u8_clamp(x: int) -> int:
    return 0 if x < 0 else (255 if x > 255 else x)


def _div2_trunc(x: int) -> int:
    """C's integer /2 (truncate toward zero) — python's // floors."""
    return x // 2 if x >= 0 else -((-x) // 2)


class Rgb12v2:
    def __init__(self, dec: Decoder, first: bytes):
        self.dec = dec
        self.r, self.g, self.b = struct.unpack("<HHH", first[:6])
        self.m_used = SymModel(128)
        self.m_diff = [SymModel(256) for _ in range(6)]

    def read(self) -> tuple:
        dec = self.dec
        sym = dec.decode_symbol(self.m_used)
        if sym & 1:
            corr = dec.decode_symbol(self.m_diff[0])
            r_lo = _u8_fold(corr + (self.r & 255))
        else:
            r_lo = self.r & 255
        if sym & 2:
            corr = dec.decode_symbol(self.m_diff[1])
            r_hi = _u8_fold(corr + (self.r >> 8))
        else:
            r_hi = self.r >> 8
        if sym & 64:
            diff = r_lo - (self.r & 255)
            if sym & 4:
                corr = dec.decode_symbol(self.m_diff[2])
                g_lo = _u8_fold(corr + _u8_clamp(diff + (self.g & 255)))
            else:
                g_lo = self.g & 255
            if sym & 16:
                corr = dec.decode_symbol(self.m_diff[4])
                diff = _div2_trunc(diff + (g_lo - (self.g & 255)))
                b_lo = _u8_fold(corr + _u8_clamp(diff + (self.b & 255)))
            else:
                b_lo = self.b & 255
            diff = r_hi - (self.r >> 8)
            if sym & 8:
                corr = dec.decode_symbol(self.m_diff[3])
                g_hi = _u8_fold(corr + _u8_clamp(diff + (self.g >> 8)))
            else:
                g_hi = self.g >> 8
            if sym & 32:
                corr = dec.decode_symbol(self.m_diff[5])
                diff = _div2_trunc(diff + (g_hi - (self.g >> 8)))
                b_hi = _u8_fold(corr + _u8_clamp(diff + (self.b >> 8)))
            else:
                b_hi = self.b >> 8
        else:
            g_lo, g_hi = r_lo, r_hi
            b_lo, b_hi = r_lo, r_hi
        self.r = r_lo | (r_hi << 8)
        self.g = g_lo | (g_hi << 8)
        self.b = b_lo | (b_hi << 8)
        return self.r, self.g, self.b


class Bytev2:
    """BYTE v2 (extra-bytes item, e.g. Entwine's OriginId): each byte
    column diff-coded against the previous point under its own
    256-symbol model."""

    def __init__(self, dec: Decoder, first: bytes):
        self.dec = dec
        self.last = list(first)
        self.models = [SymModel(256) for _ in range(len(first))]

    def read(self) -> bytes:
        dec = self.dec
        out = []
        for i, m in enumerate(self.models):
            v = _u8_fold(dec.decode_symbol(m) + self.last[i])
            out.append(v)
        self.last = out
        return bytes(out)


class Bytev2W:
    """Writer mirror of Bytev2: per-byte diff against the previous
    point under its own 256-symbol model."""

    def __init__(self, enc, first: bytes):
        self.enc = enc
        self.last = list(first)
        self.models = [SymModel(256) for _ in range(len(first))]

    def write(self, cur: bytes):
        enc = self.enc
        last = self.last
        for i, m in enumerate(self.models):
            enc.encode_symbol(m, (cur[i] - last[i]) & 0xFF)
        self.last = list(cur)


# ---------------------------------------------------------------------------
# container plumbing
# ---------------------------------------------------------------------------


def laz_vlr_info(buf: bytes) -> dict:
    """Parse the 'laszip encoded' VLR -> dict, or raise ValueError."""
    hdr_size = struct.unpack("<H", buf[94:96])[0]
    nvlr = struct.unpack("<I", buf[100:104])[0]
    p = hdr_size
    for _ in range(nvlr):
        uid = buf[p + 2:p + 18].rstrip(b"\x00")
        rid, rlen = struct.unpack("<HH", buf[p + 18:p + 22])
        if uid == b"laszip encoded" and rid == 22204:
            pl = buf[p + 54:p + 54 + rlen]
            (compressor, coder, vmaj, vmin, vrev, options, chunk_size,
             n_evlr, off_evlr, nitems) = struct.unpack("<HHBBHIIqqH", pl[:34])
            items = []
            q = 34
            for _ in range(nitems):
                t, sz, v = struct.unpack("<HHH", pl[q:q + 6])
                q += 6
                items.append({"type": t, "size": sz, "version": v})
            return {
                "compressor": compressor, "coder": coder,
                "version": (vmaj, vmin, vrev), "chunk_size": chunk_size,
                "items": items,
            }
        p += 54 + rlen
    raise ValueError("no laszip VLR — not a LAZ file")


def _decode_chunk_sizes(buf: bytes, pos: int,
                        variable: bool = False) -> list:
    """Chunk-table payload -> per-chunk byte sizes (fixed chunking) or
    (count, size) pairs (variable chunking, chunk_size == U32 in the
    VLR). The table stores arithmetic-coded values, IntegerCompressor
    32/2: counts under context 0 predicted by the previous count,
    sizes under context 1 predicted by the previous size, interleaved
    per chunk."""
    version, n_chunks = struct.unpack("<II", buf[pos:pos + 8])
    if version != 0:
        raise LazUnsupported(f"chunk table version {version}")
    # corrupt-input bound: each table entry costs the arithmetic coder
    # at least a fraction of a bit, so n_chunks can never exceed ~64x
    # the table's remaining byte length.  Without this a flipped u32
    # (up to 4B) spins the decoder for minutes on a corrupt file
    # instead of raising.
    if n_chunks > 64 * max(len(buf) - pos, 1):
        raise LazUnsupported(
            f"implausible chunk count {n_chunks} for a {len(buf)}-byte "
            "buffer (corrupt chunk table)")
    dec = Decoder(buf, pos + 8)
    ic = IntDecomp(dec, 32, 2)
    out = []
    prev_n = prev_s = 0
    for _ in range(n_chunks):
        if variable:
            prev_n = ic.decompress(prev_n, 0)
        prev_s = ic.decompress(prev_s, 1)
        out.append((prev_n, prev_s) if variable else prev_s)
    return out


def recover_table_offset(tail8: bytes, offset: int, end: int) -> int:
    """Streaming-laz recovery.  A LASzip writer that cannot seek back
    (or was interrupted before the seek-back) leaves -1 in the 8-byte
    chunk-table pointer at the start of the point data and instead
    appends the table's real position as the FILE'S LAST 8 BYTES —
    public LASzip reader behavior (LASzip src/lasreadpoint.cpp
    read_chunk_table(): seekEnd(8) when chunk_table_start_position is
    -1; the reference delegates to lazperf/laszip for this,
    io/LasReader.cpp).  tail8 = those last 8 bytes; offset = point-data
    start; end = file size.  -> recovered absolute table offset."""
    real = struct.unpack("<q", tail8)[0]
    if not (offset + 8 <= real <= end - 8):
        raise LazUnsupported(
            f"streaming laz: trailing chunk-table pointer {real} out of "
            f"range [{offset + 8}, {end - 8}]")
    return real


def read_chunk_table(buf: bytes, offset: int, table_offset: int,
                     n_points: int, chunk_size: int) -> list[tuple[int, int]]:
    """-> [(file_offset, n_points_in_chunk)] per chunk."""
    if table_offset < 0:
        table_offset = recover_table_offset(buf[-8:], offset, len(buf))
    sizes = _decode_chunk_sizes(buf, table_offset)
    out = []
    start = offset + 8  # first 8 bytes are the chunk-table offset
    remaining = n_points
    for s in sizes:
        npts = min(chunk_size, remaining)
        out.append((start, npts))
        start += s
        remaining -= npts
    return out


def laz_chunk_extents(
    path: str, n_points: int | None = None,
) -> tuple[dict, list[tuple[int, int, int]]]:
    """Driver-side chunk layout via PARTIAL reads — header + VLRs, the
    8-byte table pointer, and the (tiny) chunk table; never the point
    data.  -> (vlr_info, [(byte_start, byte_len, n_pts)]).  This is the
    scale path: a 100 GB .laz costs the driver a few KB of reads, and
    each (byte_start, byte_len) slice is an independent decode task."""
    with open(path, "rb") as f:
        head = f.read(1024)
        offset = struct.unpack("<I", head[96:100])[0]
        if n_points is None:
            n_points = struct.unpack("<I", head[107:111])[0]
        if offset > len(head):
            f.seek(0)
            head = f.read(offset)
        info = laz_vlr_info(head)
        if info["compressor"] == 1:
            # pointwise: one stream = one task covering the whole file
            import os as _os
            end = _os.path.getsize(path)
            return info, [(offset, end - offset, n_points)]
        if info["compressor"] not in (2, 3):
            raise LazUnsupported(
                f"laszip compressor {info['compressor']} — pointwise (1), "
                "chunked (2) and layered chunked (3) are implemented"
            )
        if info["chunk_size"] == 0:
            raise LazUnsupported("chunk_size 0")
        f.seek(offset)
        table_offset = struct.unpack("<q", f.read(8))[0]
        if table_offset < 0:
            # streaming writer: real table position in the last 8 bytes
            f.seek(0, 2)
            end = f.tell()
            f.seek(end - 8)
            table_offset = recover_table_offset(f.read(8), offset, end)
        f.seek(table_offset)
        tail = f.read()
    variable = info["chunk_size"] == U32
    entries = _decode_chunk_sizes(tail, 0, variable=variable)
    out = []
    start = offset + 8
    remaining = n_points
    for e in entries:
        if variable:
            npts, s = e
        else:
            s = e
            npts = min(info["chunk_size"], remaining)
        out.append((start, s, npts))
        start += s
        remaining -= npts
    return info, out


_ITEM_BYTE = 0
_ITEM_POINT10 = 6
_ITEM_GPSTIME11 = 7
_ITEM_RGB12 = 8


def decode_chunk(buf: bytes, start: int, n_points: int,
                 items: list[dict], want=None) -> np.ndarray:
    """Decode one chunk -> structured array of raw (unscaled) fields.

    want: optional field-name set for SELECTIVE DECOMPRESSION —
    honored by the v3 layered codec (independent per-field layers);
    ignored for v1/v2 whose single interleaved stream must decode
    fully either way."""
    if any(it["version"] == 3 for it in items):
        # LAS 1.4 layered chunk (compressor 3) — formats/laz14.py
        from pdal_spark.formats import laz14

        return laz14.decode_chunk_v3(buf, start, n_points, items,
                                     want=want)
    for it in items:
        if it["version"] not in (1, 2):
            raise LazUnsupported(
                f"laszip item type {it['type']} version {it['version']} — "
                "only the v1/v2/v3 codecs are implemented"
            )
        if it["type"] not in (_ITEM_POINT10, _ITEM_GPSTIME11, _ITEM_RGB12,
                              _ITEM_BYTE):
            raise LazUnsupported(f"laszip item type {it['type']}")
        if it["type"] == _ITEM_BYTE and it["version"] != 2:
            raise LazUnsupported("laszip BYTE item v1")
    rec_len = sum(it["size"] for it in items)
    fields = [("x", "<i4"), ("y", "<i4"), ("z", "<i4"),
              ("intensity", "<u2"), ("flags", "u1"),
              ("classification", "u1"), ("scan_angle_rank", "i1"),
              ("user_data", "u1"), ("point_source_id", "<u2")]
    has_gps = any(it["type"] == _ITEM_GPSTIME11 for it in items)
    has_rgb = any(it["type"] == _ITEM_RGB12 for it in items)
    n_extra = sum(it["size"] for it in items if it["type"] == _ITEM_BYTE)
    if has_gps:
        fields.append(("gps_time", "<f8"))
    if has_rgb:
        fields += [("red", "<u2"), ("green", "<u2"), ("blue", "<u2")]
    if n_extra:
        fields.append(("extra", "u1", (n_extra,)))
    out = np.zeros(n_points, dtype=fields)
    if n_points == 0:
        return out

    # first point is raw
    p = start
    raw = buf[p:p + rec_len]
    p += rec_len
    dec = Decoder(buf, p)
    q = 0
    readers = []
    for it in items:
        seg = raw[q:q + it["size"]]
        q += it["size"]
        v1 = it["version"] == 1
        if it["type"] == _ITEM_POINT10:
            pt = (Point10v1 if v1 else Point10v2)(dec, seg)
            first_pt = struct.unpack("<iiiHBBbBH", seg[:20])
        elif it["type"] == _ITEM_GPSTIME11:
            gt = GpsTime11v1(dec, seg) if v1 else GpsTime11v2(dec, seg)
            first_gps = struct.unpack("<d", seg[:8])[0]
        elif it["type"] == _ITEM_RGB12:
            rgb = (Rgb12v1 if v1 else Rgb12v2)(dec, seg)
            first_rgb = struct.unpack("<HHH", seg[:6])
        elif it["type"] == _ITEM_BYTE:
            xb = Bytev2(dec, seg)
            first_extra = seg

    row = out[0]
    (row["x"], row["y"], row["z"], row["intensity"], row["flags"],
     row["classification"], row["scan_angle_rank"], row["user_data"],
     row["point_source_id"]) = first_pt
    if has_gps:
        row["gps_time"] = first_gps
    if has_rgb:
        row["red"], row["green"], row["blue"] = first_rgb
    if n_extra:
        row["extra"] = np.frombuffer(first_extra, dtype=np.uint8)

    for i in range(1, n_points):
        row = out[i]
        (row["x"], row["y"], row["z"], row["intensity"], row["flags"],
         row["classification"], row["scan_angle_rank"], row["user_data"],
         row["point_source_id"]) = pt.read()
        if has_gps:
            u64 = gt.read()
            row["gps_time"] = struct.unpack(
                "<d", struct.pack("<Q", u64))[0]
        if has_rgb:
            row["red"], row["green"], row["blue"] = rgb.read()
        if n_extra:
            row["extra"] = np.frombuffer(xb.read(), dtype=np.uint8)
    return out


def read_laz_points(path: str) -> np.ndarray:
    """Decode every point of a LAZ file -> structured array of raw
    (unscaled) LAS fields, chunk by chunk (the driver-side single-file
    form; the Spark reader maps chunks to tasks)."""
    buf = open(path, "rb").read()
    info = laz_vlr_info(buf)
    offset = struct.unpack("<I", buf[96:100])[0]
    n_points = struct.unpack("<I", buf[107:111])[0]
    if n_points == 0 and buf[25] >= 4:
        # LAS 1.4: the legacy u32 count is zeroed for formats 6+ — the
        # real count is the u64 extended field
        n_points = struct.unpack("<Q", buf[247:255])[0]
    if info["compressor"] == 1:
        # pointwise (pre-2011): ONE arithmetic stream, no chunk table
        return decode_chunk(buf, offset, n_points, info["items"])
    if info["compressor"] not in (2, 3):
        raise LazUnsupported(
            f"laszip compressor {info['compressor']} — pointwise (1), "
            "chunked (2) and layered chunked (3) are implemented"
        )
    table_offset = struct.unpack("<q", buf[offset:offset + 8])[0]
    if table_offset < 0:
        table_offset = recover_table_offset(buf[-8:], offset, len(buf))
    if info["chunk_size"] == U32:  # variable chunking: counts in table
        entries = _decode_chunk_sizes(buf, table_offset, variable=True)
        chunks = []
        start = offset + 8
        for npts, s in entries:
            chunks.append((start, npts))
            start += s
    else:
        chunks = read_chunk_table(buf, offset, table_offset, n_points,
                                  info["chunk_size"])
    parts = [decode_chunk(buf, s, n, info["items"]) for s, n in chunks]
    return np.concatenate(parts) if parts else decode_chunk(
        buf, 0, 0, info["items"])


# ---------------------------------------------------------------------------
# encoder (mirror of the decoder — used by the writer and as the
# byte-exact localization oracle for the fixture tests)
# ---------------------------------------------------------------------------

AC_MAX_LENGTH = 0xFFFFFFFF


class Encoder:
    def __init__(self):
        self.out = bytearray()
        self.base = 0
        self.length = AC_MAX_LENGTH

    def _carry(self):
        p = len(self.out) - 1
        while self.out[p] == 0xFF:
            self.out[p] = 0
            p -= 1
        self.out[p] += 1

    def _renorm(self):
        while self.length < AC_MIN_LENGTH:
            self.out.append((self.base >> 24) & 0xFF)
            self.base = (self.base << 8) & U32
            self.length = (self.length << 8) & U32

    def encode_bit(self, m: BitModel, sym: int):
        x = m.bit_0_prob * (self.length >> BM_LENGTH_SHIFT)
        if sym == 0:
            self.length = x
            m.bit_0_count += 1
        else:
            init_base = self.base
            self.base = (self.base + x) & U32
            if init_base > self.base:
                self._carry()
            self.length -= x
        if self.length < AC_MIN_LENGTH:
            self._renorm()
        m.bits_until_update -= 1
        if m.bits_until_update == 0:
            m._update()

    def encode_symbol(self, m: SymModel, sym: int):
        init_base = self.base
        if sym == m.last_symbol:
            x = m.distribution[sym] * (self.length >> DM_LENGTH_SHIFT)
            self.base = (self.base + x) & U32
            self.length -= x
        else:
            self.length >>= DM_LENGTH_SHIFT
            x = m.distribution[sym] * self.length
            self.base = (self.base + x) & U32
            self.length = m.distribution[sym + 1] * self.length - x
        if init_base > self.base:
            self._carry()
        if self.length < AC_MIN_LENGTH:
            self._renorm()
        m.symbol_count[sym] += 1
        m.symbols_until_update -= 1
        if m.symbols_until_update == 0:
            m._update()

    def write_bits(self, bits: int, sym: int):
        if bits > 19:
            self.write_short(sym & 0xFFFF)
            sym >>= 16
            bits -= 16
        init_base = self.base
        self.length >>= bits
        self.base = (self.base + sym * self.length) & U32
        if init_base > self.base:
            self._carry()
        if self.length < AC_MIN_LENGTH:
            self._renorm()

    def write_short(self, sym: int):
        init_base = self.base
        self.length >>= 16
        self.base = (self.base + sym * self.length) & U32
        if init_base > self.base:
            self._carry()
        if self.length < AC_MIN_LENGTH:
            self._renorm()

    def done(self) -> bytes:
        init_base = self.base
        if self.length > 2 * AC_MIN_LENGTH:
            self.base = (self.base + AC_MIN_LENGTH) & U32
            self.length = AC_MIN_LENGTH >> 1
        else:
            self.base = (self.base + (AC_MIN_LENGTH >> 1)) & U32
            self.length = AC_MIN_LENGTH >> 9
        if init_base > self.base:
            self._carry()
        self._renorm()
        self.out += b"\x00\x00\x00"  # tail padding like the reference
        return bytes(self.out)


class IntComp:
    """Encode side of IntDecomp — identical models."""

    def __init__(self, enc: Encoder, bits: int = 32, contexts: int = 1,
                 bits_high: int = 8):
        self.enc = enc
        self.bits = bits
        self.bits_high = bits_high
        self.corr_bits = bits
        self.m_bits = [SymModel(self.corr_bits + 1) for _ in range(contexts)]
        self.m_corr0 = BitModel()
        self.m_corr = [None] * (self.corr_bits + 1)
        self.k = 0

    def _corr_model(self, k: int) -> SymModel:
        m = self.m_corr[k]
        if m is None:
            m = SymModel(1 << min(k, self.bits_high))
            self.m_corr[k] = m
        return m

    def compress(self, pred: int, real: int, context: int = 0):
        c = _i32(real - pred)
        # find the tightest k with c in [-(2^k)+1, -2^(k-1)] u
        # [2^(k-1)+1, 2^k] (0/1 -> k=0; I32_MIN -> k=32)
        if c == 0 or c == 1:
            k = 0
        else:
            k = 1
            cc = c - 1 if c > 0 else -c
            while cc >= (1 << k):
                k += 1
        self.k = k
        self.enc.encode_symbol(self.m_bits[context], k)
        if k == 0:
            self.enc.encode_bit(self.m_corr0, c)
            return
        if k >= 32:
            return
        # translate into the raw code (inverse of _read_corrector)
        if c > 0:
            raw = c - 1
        else:
            raw = c + (1 << k) - 1
        if k <= self.bits_high:
            self.enc.encode_symbol(self._corr_model(k), raw)
        else:
            k1 = k - self.bits_high
            self.enc.encode_symbol(self._corr_model(k), raw >> k1)
            self.enc.write_bits(k1, raw & ((1 << k1) - 1))


class Point10v2W:
    """Encode side of Point10v2 (mirror state machine)."""

    def __init__(self, enc: Encoder, first: tuple):
        self.enc = enc
        (self.x, self.y, self.z, _intens, self.flags, self.classification,
         sar, self.user_data, self.psid) = first
        self.sar = sar & 0xFF
        self.intensity = 0
        self.m_changed = SymModel(64)
        self.ic_intensity = IntComp(enc, 16, 4)
        self.m_sar = [SymModel(256), SymModel(256)]
        self.ic_psid = IntComp(enc, 16)
        self.m_bit_byte = [None] * 256
        self.m_classification = [None] * 256
        self.m_user_data = [None] * 256
        self.ic_dx = IntComp(enc, 32, 2)
        self.ic_dy = IntComp(enc, 32, 22)
        self.ic_z = IntComp(enc, 32, 20)
        self.med_x = [StreamingMedian5() for _ in range(16)]
        self.med_y = [StreamingMedian5() for _ in range(16)]
        self.last_intensity = [0] * 16
        self.last_height = [0] * 8

    def _lazy(self, arr, idx):
        m = arr[idx]
        if m is None:
            m = SymModel(256)
            arr[idx] = m
        return m

    def write(self, pt: tuple):
        enc = self.enc
        (x, y, z, intensity, flags, classification, sar, user_data,
         psid) = pt
        sar &= 0xFF
        r = flags & 7
        n = (flags >> 3) & 7
        m = NUMBER_RETURN_MAP[n][r]
        ctx_l = NUMBER_RETURN_LEVEL[n][r]
        changed = ((flags != self.flags) << 5) \
            | ((intensity != self.last_intensity[m]) << 4) \
            | ((classification != self.classification) << 3) \
            | ((sar != self.sar) << 2) \
            | ((user_data != self.user_data) << 1) \
            | (psid != self.psid)
        enc.encode_symbol(self.m_changed, changed)
        if changed & 32:
            enc.encode_symbol(self._lazy(self.m_bit_byte, self.flags), flags)
            self.flags = flags
        if changed & 16:
            self.ic_intensity.compress(self.last_intensity[m], intensity,
                                       m if m < 3 else 3)
            self.last_intensity[m] = intensity
        self.intensity = intensity
        if changed & 8:
            enc.encode_symbol(
                self._lazy(self.m_classification, self.classification),
                classification)
            self.classification = classification
        if changed & 4:
            enc.encode_symbol(self.m_sar[1 if (flags & 0x40) else 0],
                              (sar - self.sar) & 0xFF)
            self.sar = sar
        if changed & 2:
            enc.encode_symbol(self._lazy(self.m_user_data, self.user_data),
                              user_data)
            self.user_data = user_data
        if changed & 1:
            self.ic_psid.compress(self.psid, psid)
            self.psid = psid

        med = self.med_x[m].get()
        diff = _i32(x - self.x)
        self.ic_dx.compress(med, diff, 1 if n == 1 else 0)
        self.med_x[m].add(diff)
        self.x = x
        k_bits = self.ic_dx.k
        med = self.med_y[m].get()
        diff = _i32(y - self.y)
        ctx = (1 if n == 1 else 0) + ((k_bits & 0xFE) if k_bits < 20 else 20)
        self.ic_dy.compress(med, diff, ctx)
        self.med_y[m].add(diff)
        self.y = y
        k_bits = (self.ic_dx.k + self.ic_dy.k) // 2
        ctx = (1 if n == 1 else 0) + ((k_bits & 0xFE) if k_bits < 18 else 18)
        self.ic_z.compress(self.last_height[ctx_l], z, ctx)
        self.last_height[ctx_l] = z
        self.z = z


class GpsTime11v2W:
    def __init__(self, enc: Encoder, first_u64: int):
        self.enc = enc
        self.last_gpstime = [first_u64, 0, 0, 0]
        self.last_diff = [0, 0, 0, 0]
        self.multi_extreme = [0, 0, 0, 0]
        self.last = 0
        self.next = 0
        self.m_multi = SymModel(GT_MULTI_TOTAL)
        self.m_0diff = SymModel(6)
        self.ic_gpstime = IntComp(enc, 32, 9)

    def write(self, u64: int):
        enc = self.enc
        cur = self.last_gpstime[self.last]
        if self.last_diff[self.last] == 0:
            if u64 == cur:
                enc.encode_symbol(self.m_0diff, 0)
                return
            # could another of the 4 slots match?
            for j in range(1, 4):
                other = self.last_gpstime[(self.last + j) & 3]
                if u64 == other:
                    enc.encode_symbol(self.m_0diff, 2 + j)
                    self.last = (self.last + j) & 3
                    return self.write(u64)
            d = _i64_from_u64(u64 - cur)
            if -0x80000000 <= d <= 0x7FFFFFFF:
                enc.encode_symbol(self.m_0diff, 1)
                self.ic_gpstime.compress(0, d, 0)
                self.last_diff[self.last] = d
                self.multi_extreme[self.last] = 0
                self.last_gpstime[self.last] = u64
            else:
                enc.encode_symbol(self.m_0diff, 2)
                self.next = (self.next + 1) & 3
                self.ic_gpstime.compress(_i32(cur >> 32), _i32(u64 >> 32), 8)
                enc.write_bits(32, u64 & U32)
                self.last = self.next
                self.last_gpstime[self.last] = u64
                self.last_diff[self.last] = 0
                self.multi_extreme[self.last] = 0
        else:
            if u64 == cur:
                # same time: multi code for "zero diff" is
                # LASZIP_GPSTIME_MULTI_UNCHANGED
                enc.encode_symbol(self.m_multi, GT_MULTI_UNCHANGED)
                return
            for j in range(1, 4):
                other = self.last_gpstime[(self.last + j) & 3]
                if u64 == other:
                    enc.encode_symbol(self.m_multi, GT_MULTI_CODE_FULL + j)
                    self.last = (self.last + j) & 3
                    return self.write(u64)
            d = _i64_from_u64(u64 - cur)
            if -0x80000000 <= d <= 0x7FFFFFFF:
                ld = self.last_diff[self.last]
                # multi = rounded ratio
                if d >= 0:
                    multi = (d + (ld // 2 if ld > 0 else -ld // 2)) // ld \
                        if ld else 0
                else:
                    multi = (d - (-ld // 2 if ld > 0 else ld // 2)) // ld \
                        if ld else 0
                if multi == 1:
                    enc.encode_symbol(self.m_multi, 1)
                    self.ic_gpstime.compress(ld, d, 1)
                    self.multi_extreme[self.last] = 0
                elif multi == 0:
                    enc.encode_symbol(self.m_multi, 0)
                    self.ic_gpstime.compress(0, d, 7)
                    self.multi_extreme[self.last] += 1
                    if self.multi_extreme[self.last] > 3:
                        self.last_diff[self.last] = d
                        self.multi_extreme[self.last] = 0
                elif 2 <= multi < GT_MULTI:
                    enc.encode_symbol(self.m_multi, multi)
                    self.ic_gpstime.compress(multi * ld, d,
                                             2 if multi < 10 else 3)
                elif multi >= GT_MULTI:
                    enc.encode_symbol(self.m_multi, GT_MULTI)
                    self.ic_gpstime.compress(GT_MULTI * ld, d, 4)
                    self.multi_extreme[self.last] += 1
                    if self.multi_extreme[self.last] > 3:
                        self.last_diff[self.last] = d
                        self.multi_extreme[self.last] = 0
                elif -1 >= multi > GT_MULTI_MINUS:
                    enc.encode_symbol(self.m_multi, GT_MULTI - multi)
                    self.ic_gpstime.compress(multi * ld, d, 5)
                else:
                    enc.encode_symbol(self.m_multi, GT_MULTI - GT_MULTI_MINUS)
                    self.ic_gpstime.compress(GT_MULTI_MINUS * ld, d, 6)
                    self.multi_extreme[self.last] += 1
                    if self.multi_extreme[self.last] > 3:
                        self.last_diff[self.last] = d
                        self.multi_extreme[self.last] = 0
                self.last_gpstime[self.last] = u64
            else:
                enc.encode_symbol(self.m_multi, GT_MULTI_CODE_FULL)
                self.next = (self.next + 1) & 3
                self.ic_gpstime.compress(_i32(cur >> 32), _i32(u64 >> 32), 8)
                enc.write_bits(32, u64 & U32)
                self.last = self.next
                self.last_gpstime[self.last] = u64
                self.last_diff[self.last] = 0
                self.multi_extreme[self.last] = 0


class Rgb12v2W:
    def __init__(self, enc: Encoder, first: tuple):
        self.enc = enc
        self.r, self.g, self.b = first
        self.m_used = SymModel(128)
        self.m_diff = [SymModel(256) for _ in range(6)]

    def write(self, rgb: tuple):
        enc = self.enc
        r, g, b = rgb
        sym = 0
        if (r & 255) != (self.r & 255):
            sym |= 1
        if (r >> 8) != (self.r >> 8):
            sym |= 2
        if (g & 255) != (b & 255) or (g >> 8) != (b >> 8) \
                or (g & 255) != (r & 255) or (g >> 8) != (r >> 8):
            sym |= 64
        if sym & 64:
            if (g & 255) != (self.g & 255):
                sym |= 4
            if (g >> 8) != (self.g >> 8):
                sym |= 8
            if (b & 255) != (self.b & 255):
                sym |= 16
            if (b >> 8) != (self.b >> 8):
                sym |= 32
        enc.encode_symbol(self.m_used, sym)
        if sym & 1:
            enc.encode_symbol(self.m_diff[0],
                              ((r & 255) - (self.r & 255)) & 0xFF)
        if sym & 2:
            enc.encode_symbol(self.m_diff[1],
                              ((r >> 8) - (self.r >> 8)) & 0xFF)
        if sym & 64:
            diff = (r & 255) - (self.r & 255)
            if sym & 4:
                corr = ((g & 255)
                        - _u8_clamp(diff + (self.g & 255))) & 0xFF
                enc.encode_symbol(self.m_diff[2], corr)
            if sym & 16:
                diff = _div2_trunc(diff + ((g & 255) - (self.g & 255)))
                corr = ((b & 255)
                        - _u8_clamp(diff + (self.b & 255))) & 0xFF
                enc.encode_symbol(self.m_diff[4], corr)
            diff = (r >> 8) - (self.r >> 8)
            if sym & 8:
                corr = ((g >> 8) - _u8_clamp(diff + (self.g >> 8))) & 0xFF
                enc.encode_symbol(self.m_diff[3], corr)
            if sym & 32:
                diff = _div2_trunc(diff + ((g >> 8) - (self.g >> 8)))
                corr = ((b >> 8) - _u8_clamp(diff + (self.b >> 8))) & 0xFF
                enc.encode_symbol(self.m_diff[5], corr)
        self.r, self.g, self.b = r, g, b


# ---------------------------------------------------------------------------
# chunk encoder + container writer pieces
# ---------------------------------------------------------------------------


def encode_chunk(rec: np.ndarray, items: list[dict]) -> bytes:
    """Encode one chunk (mirror of decode_chunk): first record raw, the
    rest entropy-coded. Verified byte-identical to real laszip output
    on the reference fixture's chunks (tests/test_laz.py)."""
    if any(it["version"] == 3 for it in items):
        from pdal_spark.formats import laz14

        return laz14.encode_chunk_v3(rec, items)
    has_gps = any(it["type"] == _ITEM_GPSTIME11 for it in items)
    has_rgb = any(it["type"] == _ITEM_RGB12 for it in items)
    n_extra = sum(it["size"] for it in items if it["type"] == _ITEM_BYTE)
    n = len(rec)
    if n == 0:
        return b""

    def _extra(i: int) -> bytes:
        return bytes(np.asarray(rec["extra"][i], dtype=np.uint8))

    def _pt(i: int) -> tuple:
        r = rec[i]
        return (int(r["x"]), int(r["y"]), int(r["z"]), int(r["intensity"]),
                int(r["flags"]), int(r["classification"]),
                int(np.int8(r["scan_angle_rank"])), int(r["user_data"]),
                int(r["point_source_id"]))

    first = _pt(0)
    raw = struct.pack("<iiiHBBbBH", *first)
    enc = Encoder()
    ptw = Point10v2W(enc, first)
    if has_gps:
        g0 = struct.unpack("<Q", struct.pack("<d", float(rec["gps_time"][0])))[0]
        raw += struct.pack("<Q", g0)
        gtw = GpsTime11v2W(enc, g0)
    if has_rgb:
        c0 = (int(rec["red"][0]), int(rec["green"][0]), int(rec["blue"][0]))
        raw += struct.pack("<HHH", *c0)
        rgbw = Rgb12v2W(enc, c0)
    if n_extra:
        x0 = _extra(0)
        raw += x0
        bw = Bytev2W(enc, x0)
    for i in range(1, n):
        ptw.write(_pt(i))
        if has_gps:
            gtw.write(struct.unpack(
                "<Q", struct.pack("<d", float(rec["gps_time"][i])))[0])
        if has_rgb:
            rgbw.write((int(rec["red"][i]), int(rec["green"][i]),
                        int(rec["blue"][i])))
        if n_extra:
            bw.write(_extra(i))
    return raw + enc.done()


def laz_items_for_format(fmt: int, n_extra: int = 0) -> list[dict]:
    """Item list for a LAS point format: v2 items for 0-3, v3 layered
    items (compressor 3, formats/laz14.py) for 6-8.  ``n_extra`` adds
    a BYTE v2 extra-bytes item (formats 0-3 only — the shape Entwine
    uses for non-LAS EPT dimensions)."""
    if fmt in (6, 7, 8):
        from pdal_spark.formats import laz14

        if n_extra:
            raise LazUnsupported("extra bytes with v3 items")
        return laz14.laz_items_for_format14(fmt)
    if fmt not in (0, 1, 2, 3):
        raise LazUnsupported(
            f"LAZ writing for point format {fmt} (v2 items cover 0-3, "
            "v3 items cover 6-8)"
        )
    items = [{"type": _ITEM_POINT10, "size": 20, "version": 2}]
    if fmt in (1, 3):
        items.append({"type": _ITEM_GPSTIME11, "size": 8, "version": 2})
    if fmt in (2, 3):
        items.append({"type": _ITEM_RGB12, "size": 6, "version": 2})
    if n_extra:
        items.append({"type": _ITEM_BYTE, "size": n_extra, "version": 2})
    return items


def make_laz_vlr(fmt: int, chunk_size: int = 50000,
                 n_extra: int = 0) -> bytes:
    """Serialize the 'laszip encoded' VLR (header + payload):
    compressor 2 (chunked, v2 items) for formats 0-3, compressor 3
    (layered chunked, v3 items) for formats 6-8."""
    items = laz_items_for_format(fmt, n_extra)
    if fmt > 5:
        payload = struct.pack(
            "<HHBBHIIqqH", 3, 0, 3, 4, 3, 0, chunk_size, -1, -1,
            len(items))
    else:
        payload = struct.pack(
            "<HHBBHIIqqH", 2, 0, 2, 2, 0, 0, chunk_size, -1, -1,
            len(items))
    for it in items:
        payload += struct.pack("<HHH", it["type"], it["size"], it["version"])
    hdr = struct.pack("<H", 0) + b"laszip encoded".ljust(16, b"\x00") + \
        struct.pack("<HH", 22204, len(payload)) + b"\x00" * 32
    return hdr + payload


def encode_chunk_sizes(sizes: list[int],
                       counts: list[int] | None = None) -> bytes:
    """Chunk table payload: u32 version 0, u32 count, IC(32,2)-coded
    byte sizes (inverse of _decode_chunk_sizes). Pass ``counts`` for
    variable chunking (chunk_size U32): per-chunk point counts
    interleave before each size, context 0."""
    enc = Encoder()
    ic = IntComp(enc, 32, 2)
    prev_n = prev_s = 0
    for i, s in enumerate(sizes):
        if counts is not None:
            ic.compress(prev_n, counts[i], 0)
            prev_n = counts[i]
        ic.compress(prev_s, s, 1)
        prev_s = s
    return struct.pack("<II", 0, len(sizes)) + enc.done()


# ---------------------------------------------------------------------------
# v1 item codecs (compressor 1, pre-2011 pointwise files — the open
# LASzip v1 record formats; same coder, earlier per-item predictors)
# ---------------------------------------------------------------------------


def _median3(v: list[int]) -> int:
    a, b, c = v
    if a < b:
        if b < c:
            return b
        return c if a < c else a
    if a < c:
        return a
    return c if b < c else b


def _div4_trunc(x: int) -> int:
    """C's integer /4 (truncate toward zero)."""
    return x // 4 if x >= 0 else -((-x) // 4)


class Point10v1:
    """POINT10 v1: median-of-3-diff x/y prediction, last-z prediction,
    k-bit context switching; changed_values gates the attribute fields.
    The flags/classification/user_data models are lazily created PER
    PREVIOUS VALUE (a 256-way context array, same scheme as v2) —
    verified byte-exact on the reference fixture; a single shared model
    decodes the first ~178 points of simple.laz then desyncs on the
    second reuse of a gate after its value changed."""

    def __init__(self, dec: Decoder, first: bytes):
        self.dec = dec
        (self.x, self.y, self.z, self.intensity, self.flags,
         self.classification, sar, self.user_data,
         self.psid) = struct.unpack("<iiiHBBbBH", first[:20])
        self.sar = sar
        self.last_x_diff = [0, 0, 0]
        self.last_y_diff = [0, 0, 0]
        self.last_incr = 0
        self.ic_dx = IntDecomp(dec, 32)
        self.ic_dy = IntDecomp(dec, 32, 20)
        self.ic_dz = IntDecomp(dec, 32, 20)
        self.m_changed = SymModel(64)
        self.ic_intensity = IntDecomp(dec, 16)
        self.ic_sar = IntDecomp(dec, 8, 2)
        self.ic_psid = IntDecomp(dec, 16)
        self.m_bit_byte = [None] * 256
        self.m_classification = [None] * 256
        self.m_user_data = [None] * 256

    @staticmethod
    def _lazy(arr, idx):
        m = arr[idx]
        if m is None:
            m = SymModel(256)
            arr[idx] = m
        return m

    def read(self) -> tuple:
        dec = self.dec
        med_x = _median3(self.last_x_diff)
        med_y = _median3(self.last_y_diff)
        x_diff = self.ic_dx.decompress(med_x)
        self.x = _i32(self.x + x_diff)
        k_bits = self.ic_dx.k
        y_diff = self.ic_dy.decompress(med_y, k_bits if k_bits < 19 else 19)
        self.y = _i32(self.y + y_diff)
        k_bits = (k_bits + self.ic_dy.k) // 2
        self.z = self.ic_dz.decompress(
            self.z, k_bits if k_bits < 19 else 19)

        changed = dec.decode_symbol(self.m_changed)
        if changed:
            if changed & 32:
                self.intensity = self.ic_intensity.decompress(
                    self.intensity) & 0xFFFF
            if changed & 16:
                self.flags = dec.decode_symbol(
                    self._lazy(self.m_bit_byte, self.flags))
            if changed & 8:
                self.classification = dec.decode_symbol(
                    self._lazy(self.m_classification, self.classification))
            if changed & 4:
                v = self.ic_sar.decompress(
                    self.sar, 1 if k_bits < 3 else 0) & 0xFF
                self.sar = v - 256 if v >= 128 else v
            if changed & 2:
                self.user_data = dec.decode_symbol(
                    self._lazy(self.m_user_data, self.user_data))
            if changed & 1:
                self.psid = self.ic_psid.decompress(self.psid) & 0xFFFF

        self.last_x_diff[self.last_incr] = x_diff
        self.last_y_diff[self.last_incr] = y_diff
        self.last_incr += 1
        if self.last_incr > 2:
            self.last_incr = 0
        return (self.x, self.y, self.z, self.intensity, self.flags,
                self.classification, self.sar, self.user_data, self.psid)


GT_V1_MULTIMAX = 512


class GpsTime11v1:
    """GPSTIME11 v1: single last-diff state (no 4-slot sequence table),
    multi-coded against LASZIP_GPSTIME_MULTIMAX."""

    def __init__(self, dec: Decoder, first: bytes):
        self.dec = dec
        self.last_u64 = struct.unpack("<Q", first[:8])[0]
        self.last_diff = 0
        self.multi_extreme = 0
        self.m_0diff = SymModel(3)
        self.m_multi = SymModel(GT_V1_MULTIMAX)
        self.ic_gpstime = IntDecomp(dec, 32, 6)

    def _read_i64(self) -> int:
        lo = self.dec.read_bits(32)
        hi = self.dec.read_bits(32)
        return (hi << 32) | lo

    def read(self) -> int:
        dec = self.dec
        if self.last_diff == 0:
            multi = dec.decode_symbol(self.m_0diff)
            if multi == 1:
                self.last_diff = self.ic_gpstime.decompress(0, 0)
                self.last_u64 = (self.last_u64 + self.last_diff) \
                    & ((1 << 64) - 1)
            elif multi == 2:
                self.last_u64 = self._read_i64()
        else:
            multi = dec.decode_symbol(self.m_multi)
            if multi < GT_V1_MULTIMAX - 2:
                if multi == 1:
                    diff = self.ic_gpstime.decompress(self.last_diff, 1)
                    self.last_diff = diff
                    self.multi_extreme = 0
                elif multi == 0:
                    diff = self.ic_gpstime.decompress(
                        _div4_trunc(self.last_diff), 2)
                    self.multi_extreme += 1
                    if self.multi_extreme > 3:
                        self.last_diff = diff
                        self.multi_extreme = 0
                elif multi < 10:
                    diff = self.ic_gpstime.decompress(
                        _i32(multi * self.last_diff), 3)
                elif multi < 50:
                    diff = self.ic_gpstime.decompress(
                        _i32(multi * self.last_diff), 4)
                else:
                    diff = self.ic_gpstime.decompress(
                        _i32(multi * self.last_diff), 5)
                    if multi == GT_V1_MULTIMAX - 3:
                        self.multi_extreme += 1
                        if self.multi_extreme > 3:
                            self.last_diff = diff
                            self.multi_extreme = 0
                self.last_u64 = (self.last_u64 + diff) & ((1 << 64) - 1)
            elif multi < GT_V1_MULTIMAX - 1:
                self.last_u64 = self._read_i64()
        return self.last_u64


class Rgb12v1:
    """RGB12 v1: per-byte used mask + one 8-bit IC over 6 contexts."""

    def __init__(self, dec: Decoder, first: bytes):
        self.dec = dec
        self.rgb = list(struct.unpack("<HHH", first[:6]))
        self.m_used = SymModel(64)
        self.ic_rgb = IntDecomp(dec, 8, 6)

    def _byte(self, pred: int, ctx: int) -> int:
        v = self.ic_rgb.decompress(pred, ctx)
        # 8-bit corr_range wrap (IntegerCompressor bits=8)
        if v < 0:
            v += 256
        elif v >= 256:
            v -= 256
        return v

    def read(self) -> tuple:
        sym = self.dec.decode_symbol(self.m_used)
        out = []
        for i in range(3):
            lo_bit, hi_bit = 1 << (2 * i), 1 << (2 * i + 1)
            last = self.rgb[i]
            lo = self._byte(last & 0xFF, 2 * i) if sym & lo_bit \
                else last & 0xFF
            hi = self._byte(last >> 8, 2 * i + 1) if sym & hi_bit \
                else last >> 8
            out.append(lo | (hi << 8))
        self.rgb = out
        return tuple(out)
