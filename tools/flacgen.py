"""Minimal FLAC *encoder* — a test-vector generator for the from-scratch
decoders (`whisper_tpu/audio/flac.py`, `native/wtpu_flac.cpp`).

The reference ships no FLAC encoder either; it only decodes (dr_flac inside
examples/miniaudio.h).  This encoder exists so the test suite can fabricate
spec-covering streams offline — every subframe type (CONSTANT / VERBATIM /
FIXED 0-4 / LPC), every stereo decorrelation mode, Rice escapes, partition
orders, wasted bits, and both blocking strategies — and round-trip them
losslessly, plus feed the SAME bytes to the reference's vendored dr_flac
for bit-exact goldens (tests/test_flac_golden.py).

Not a production encoder: no rate-distortion search, just correct streams.
"""

from __future__ import annotations

import hashlib

import numpy as np

from whisper_tpu.audio.flac import crc8, crc16, _FIXED_COEF

_SR_CODES = {88200: 1, 176400: 2, 192000: 3, 8000: 4, 16000: 5, 22050: 6,
             24000: 7, 32000: 8, 44100: 9, 48000: 10, 96000: 11}
_BPS_CODES = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, v: int, n: int) -> None:
        assert 0 <= v < (1 << n), (v, n)
        self.acc = (self.acc << n) | v
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_signed(self, v: int, n: int) -> None:
        self.write(v & ((1 << n) - 1), n)

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.buf)


def _utf8_number(w: _BitWriter, v: int) -> None:
    if v < 0x80:
        w.write(v, 8)
        return
    payload = []
    n_extra = 1
    while v >> (6 * n_extra) >= (1 << (6 - n_extra)) and n_extra < 6:
        n_extra += 1
    lead_bits = 6 - n_extra
    w.write((0xFF << (lead_bits + 1)) & 0xFF | (v >> (6 * n_extra)), 8)
    for i in range(n_extra - 1, -1, -1):
        w.write(0x80 | ((v >> (6 * i)) & 0x3F), 8)
    del payload


def _rice_param_for(resid, plen: int) -> int:
    """Pick a near-optimal Rice parameter (mean-based estimate)."""
    if not len(resid):
        return 0
    mean = float(np.mean(np.abs(np.asarray(resid, dtype=np.float64)))) + 1e-9
    k = max(0, int(np.ceil(np.log2(mean + 1.0))))
    return min(k, (1 << plen) - 2)


def _write_residual(w: _BitWriter, resid: list[int], block_size: int,
                    pred_order: int, part_order: int = 0,
                    method: int = 0, escape_raw_bits: int | None = None):
    """method 0 = 4-bit Rice params, 1 = 5-bit.  escape_raw_bits forces
    every partition to the escape (raw) encoding at that width."""
    plen = 5 if method else 4
    escape = (1 << plen) - 1
    w.write(method, 2)
    w.write(part_order, 4)
    n_parts = 1 << part_order
    assert block_size % n_parts == 0
    idx = 0
    for p in range(n_parts):
        n = (block_size >> part_order) - (pred_order if p == 0 else 0)
        part = resid[idx:idx + n]
        idx += n
        if escape_raw_bits is not None:
            w.write(escape, plen)
            w.write(escape_raw_bits, 5)
            if escape_raw_bits:
                for r in part:
                    w.write_signed(r, escape_raw_bits)
            else:
                assert all(r == 0 for r in part)
            continue
        k = _rice_param_for(part, plen)
        w.write(k, plen)
        for r in part:
            v = (r << 1) ^ (r >> 63) if r < 0 else (r << 1)
            v = (abs(r) << 1) - (1 if r < 0 else 0)
            w.write_unary(v >> k)
            if k:
                w.write(v & ((1 << k) - 1), k)
    assert idx == len(resid)


def _encode_subframe(w: _BitWriter, samples: list[int], bps: int,
                     kind: str = "auto", lpc_coef=None, lpc_shift: int = 0,
                     lpc_precision: int = 12, part_order: int = 0,
                     rice_method: int = 0, escape_raw_bits=None,
                     use_wasted: bool = False):
    n = len(samples)
    wasted = 0
    if use_wasted:
        acc = 0
        for s in samples:
            acc |= s
        if acc:
            while acc & 1 == 0 and wasted < bps - 1:
                wasted += 1
                acc >>= 1
        if wasted:
            samples = [s >> wasted for s in samples]
            bps -= wasted

    def _header(ftype: int):
        w.write(0, 1)          # padding
        w.write(ftype, 6)      # type
        if wasted:
            w.write(1, 1)
            w.write_unary(wasted - 1)
        else:
            w.write(0, 1)

    if kind == "auto":
        if all(s == samples[0] for s in samples):
            kind = "constant"
        else:
            kind = "fixed"

    if kind == "constant":
        assert all(s == samples[0] for s in samples)
        _header(0)
        w.write_signed(samples[0], bps)
        return
    if kind == "verbatim":
        _header(1)
        for s in samples:
            w.write_signed(s, bps)
        return
    if kind == "fixed":
        best, best_cost = 0, None
        for order in range(min(5, n)):
            coef = _FIXED_COEF[order]
            cost = 0
            for i in range(order, n):
                r = samples[i] - sum(c * samples[i - 1 - j]
                                     for j, c in enumerate(coef))
                cost += abs(r)
            if best_cost is None or cost < best_cost:
                best, best_cost = order, cost
        order = best
        coef = _FIXED_COEF[order]
        resid = [samples[i] - sum(c * samples[i - 1 - j]
                                  for j, c in enumerate(coef))
                 for i in range(order, n)]
        _header(8 + order)
        for i in range(order):
            w.write_signed(samples[i], bps)
        _write_residual(w, resid, n, order, part_order, rice_method,
                        escape_raw_bits)
        return
    if kind == "fixed0":   # order-0 fixed (residual == samples), for escapes
        _header(8)
        _write_residual(w, list(samples), n, 0, part_order, rice_method,
                        escape_raw_bits)
        return
    if kind == "lpc":
        coef = list(lpc_coef)
        order = len(coef)
        assert 1 <= order <= 32 and n > order
        assert all(-(1 << (lpc_precision - 1)) <= c < (1 << (lpc_precision - 1))
                   for c in coef)
        resid = []
        for i in range(order, n):
            pred = sum(coef[j] * samples[i - 1 - j] for j in range(order))
            resid.append(samples[i] - (pred >> lpc_shift))
        _header(32 + order - 1)
        for i in range(order):
            w.write_signed(samples[i], bps)
        w.write(lpc_precision - 1, 4)
        w.write_signed(lpc_shift, 5)
        for c in coef:
            w.write_signed(c, lpc_precision)
        _write_residual(w, resid, n, order, part_order, rice_method,
                        escape_raw_bits)
        return
    raise ValueError(kind)


def _stereo_channels(block: np.ndarray, mode: str):
    """-> (ch_code, [per-subframe sample lists], [per-subframe bps deltas])"""
    l = block[:, 0].tolist()
    r = block[:, 1].tolist()
    if mode == "independent":
        return 2 - 1, [l, r], [0, 0]
    if mode == "left_side":
        return 8, [l, [a - b for a, b in zip(l, r)]], [0, 1]
    if mode == "right_side":
        return 9, [[a - b for a, b in zip(l, r)], r], [1, 0]
    if mode == "mid_side":
        mid = [(a + b) >> 1 for a, b in zip(l, r)]
        side = [a - b for a, b in zip(l, r)]
        return 10, [mid, side], [0, 1]
    raise ValueError(mode)


def encode_flac(samples: np.ndarray, sample_rate: int, bits: int = 16,
                block_size: int = 4096, stereo_mode: str = "independent",
                subframe_kind: str = "auto", lpc_coef=None,
                lpc_shift: int = 0, lpc_precision: int = 12,
                part_order: int = 0, rice_method: int = 0,
                escape_raw_bits=None, use_wasted: bool = False,
                variable_blocking: bool = False,
                sr_code_mode: str = "streaminfo",
                bps_from_streaminfo: bool = False) -> bytes:
    """Encode (n,) or (n, ch) integer samples into a FLAC stream."""
    samples = np.asarray(samples)
    if samples.ndim == 1:
        samples = samples[:, None]
    n_total, n_ch = samples.shape
    assert 1 <= n_ch <= 8
    assert bits in (8, 16, 24)
    lim = 1 << (bits - 1)
    assert samples.min() >= -lim and samples.max() < lim

    # --- STREAMINFO ------------------------------------------------------
    w = _BitWriter()
    w.write(block_size, 16)
    w.write(block_size, 16)
    w.write(0, 24)
    w.write(0, 24)
    w.write(sample_rate, 20)
    w.write(n_ch - 1, 3)
    w.write(bits - 1, 5)
    w.write(n_total, 36)
    md5 = hashlib.md5()
    width = bits // 8
    for frame in samples:
        for c in range(n_ch):
            v = int(frame[c]) & ((1 << bits) - 1)
            md5.update(v.to_bytes(width, "little"))
    streaminfo = w.bytes() + md5.digest()
    out = bytearray(b"fLaC")
    out.append(0x80 | 0)  # last block, STREAMINFO
    out += len(streaminfo).to_bytes(3, "big")
    out += streaminfo

    # --- frames ----------------------------------------------------------
    frame_no = 0
    pos = 0
    while pos < n_total:
        bs = min(block_size, n_total - pos)
        block = samples[pos:pos + bs]
        w = _BitWriter()
        w.write(0x3FFE, 14)
        w.write(0, 1)
        w.write(1 if variable_blocking else 0, 1)
        # block size code: prefer exact table, else 16-bit explicit
        if bs == 192:
            bs_code, bs_extra = 1, None
        elif bs in (576, 1152, 2304, 4608):
            bs_code, bs_extra = 2 + (576, 1152, 2304, 4608).index(bs), None
        elif bs in (256, 512, 1024, 2048, 4096, 8192, 16384, 32768):
            bs_code = 8 + (256, 512, 1024, 2048, 4096, 8192, 16384,
                           32768).index(bs)
            bs_extra = None
        elif bs <= 256:
            bs_code, bs_extra = 6, bs - 1
        else:
            bs_code, bs_extra = 7, bs - 1
        w.write(bs_code, 4)
        if sr_code_mode == "streaminfo":
            sr_code, sr_extra, sr_extra_bits = 0, None, 0
        elif sr_code_mode == "coded" and sample_rate in _SR_CODES:
            sr_code, sr_extra, sr_extra_bits = _SR_CODES[sample_rate], None, 0
        elif sr_code_mode == "khz8" and sample_rate % 1000 == 0 \
                and sample_rate // 1000 < 256:
            sr_code, sr_extra, sr_extra_bits = 12, sample_rate // 1000, 8
        elif sr_code_mode == "hz16" and sample_rate < 65536:
            sr_code, sr_extra, sr_extra_bits = 13, sample_rate, 16
        elif sr_code_mode == "dhz16" and sample_rate % 10 == 0 \
                and sample_rate // 10 < 65536:
            sr_code, sr_extra, sr_extra_bits = 14, sample_rate // 10, 16
        else:
            raise ValueError(f"sr_code_mode {sr_code_mode} incompatible "
                             f"with rate {sample_rate}")
        w.write(sr_code, 4)
        if n_ch == 2 and stereo_mode != "independent":
            ch_code, chans, bps_delta = _stereo_channels(block, stereo_mode)
        else:
            ch_code = n_ch - 1
            chans = [block[:, c].tolist() for c in range(n_ch)]
            bps_delta = [0] * n_ch
        w.write(ch_code, 4)
        w.write(0 if bps_from_streaminfo else _BPS_CODES[bits], 3)
        w.write(0, 1)
        _utf8_number(w, (pos if variable_blocking else frame_no))
        if bs_code in (6, 7):
            w.write(bs_extra, 8 if bs_code == 6 else 16)
        if sr_extra is not None:
            w.write(sr_extra, sr_extra_bits)
        hdr = w  # CRC-8 over everything written so far
        w.align()
        hdr_bytes = bytes(w.buf)
        w.write(crc8(hdr_bytes), 8)
        del hdr

        for ch, d in zip(chans, bps_delta):
            _encode_subframe(w, ch, bits + d, kind=subframe_kind,
                             lpc_coef=lpc_coef, lpc_shift=lpc_shift,
                             lpc_precision=lpc_precision,
                             part_order=part_order, rice_method=rice_method,
                             escape_raw_bits=escape_raw_bits,
                             use_wasted=use_wasted)
        w.align()
        body = bytes(w.buf)
        w.write(crc16(body), 16)
        out += w.bytes()
        pos += bs
        frame_no += 1

    return bytes(out)
