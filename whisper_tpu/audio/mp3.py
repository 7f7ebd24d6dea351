"""From-scratch MPEG audio (MP3/MP2/MP1) decoder.

The reference decodes mp3 through its vendored miniaudio/dr_mp3
(reference: examples/common-whisper.cpp:46 — the decode path every
reference example and the server use).  This is an independent textbook
implementation of the ISO/IEC 11172-3 (MPEG-1) and 13818-3 (MPEG-2 LSF,
incl. the 2.5 extension) decode pipeline:

  frame sync / free-format detection → side info → bit reservoir →
  scalefactors (MPEG-1 scfsi + LSF partitions) → huffman + requantization →
  MS/intensity stereo → short-block reordering → alias reduction →
  IMDCT (36/12, block-type windows, overlap-add) → frequency inversion →
  polyphase synthesis filterbank (matrixing + ISO Table 3-B.3 window),

plus the Layer I/II path (bit allocation, grouped quantization, the shared
synthesis filterbank).

Canonical constant tables (huffman codebooks, scalefactor-band widths, the
synthesis window) live in `_mp3_tables.py` (see tools/mp3_tables.py for
provenance).  DSP runs vectorized in float64; the final PCM is quantized to
s16 with the reference decoder's exact rounding rule, so output is
bit-comparable against the reference binary (tests/test_mp3_golden.py pins
that on real and generated bitstreams).
"""

from __future__ import annotations

import numpy as np

from . import _mp3_tables as T


class Mp3Error(Exception):
    pass


# ---------------------------------------------------------------------------
# header parsing (ISO 11172-3 §2.4.1.3)

_HZ = (44100, 48000, 32000)
_HALFRATE = (
    # MPEG-2/2.5: layer III, II, I  (kbps/2)
    ((0, 4, 8, 12, 16, 20, 24, 28, 32, 40, 48, 56, 64, 72, 80),
     (0, 4, 8, 12, 16, 20, 24, 28, 32, 40, 48, 56, 64, 72, 80),
     (0, 16, 24, 28, 32, 40, 48, 56, 64, 72, 80, 88, 96, 112, 128)),
    # MPEG-1
    ((0, 16, 20, 24, 28, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160),
     (0, 16, 24, 28, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192),
     (0, 16, 32, 48, 64, 80, 96, 112, 128, 144, 160, 176, 192, 208, 224)),
)

MODE_STEREO, MODE_JOINT, MODE_DUAL, MODE_MONO = 0, 1, 2, 3
SHORT_BLOCK, STOP_BLOCK = 2, 3
MAX_RESERVOIR = 511
MAX_FREE_FORMAT_FRAME = 2304
FRAME_SYNC_MATCHES = 10


def _hdr_valid(h) -> bool:
    return (len(h) >= 4 and h[0] == 0xFF
            and ((h[1] & 0xF0) == 0xF0 or (h[1] & 0xFE) == 0xE2)
            and ((h[1] >> 1) & 3) != 0          # layer
            and (h[2] >> 4) != 15               # bitrate
            and ((h[2] >> 2) & 3) != 3)         # samplerate


def _hdr_is_free_format(h) -> bool:
    return (h[2] & 0xF0) == 0


def _hdr_compare(h1, h2) -> bool:
    return (_hdr_valid(h2)
            and ((h1[1] ^ h2[1]) & 0xFE) == 0
            and ((h1[2] ^ h2[2]) & 0x0C) == 0
            and _hdr_is_free_format(h1) == _hdr_is_free_format(h2))


def _hdr_mpeg1(h) -> bool:
    return bool(h[1] & 0x8)


def _hdr_layer(h) -> int:
    """1, 2 or 3."""
    return 4 - ((h[1] >> 1) & 3)


def _hdr_bitrate_kbps(h) -> int:
    return 2 * _HALFRATE[int(_hdr_mpeg1(h))][((h[1] >> 1) & 3) - 1][h[2] >> 4]


def _hdr_sample_rate(h) -> int:
    hz = _HZ[(h[2] >> 2) & 3]
    if not _hdr_mpeg1(h):
        hz >>= 1
    if not (h[1] & 0x10):   # MPEG-2.5
        hz >>= 1
    return hz


def _hdr_frame_samples(h) -> int:
    if _hdr_layer(h) == 1:
        return 384
    return 576 if (h[1] & 14) == 2 else 1152   # MPEG-2/2.5 L3: one granule


def _hdr_frame_bytes(h, free_format_size: int) -> int:
    n = _hdr_frame_samples(h) * _hdr_bitrate_kbps(h) * 125 // _hdr_sample_rate(h)
    if _hdr_layer(h) == 1:
        n &= ~3
    return n if n else free_format_size


def _hdr_padding(h) -> int:
    return (4 if _hdr_layer(h) == 1 else 1) if (h[2] & 0x2) else 0


def _my_sr_index(h) -> int:
    """0..8: MPEG2.5 rates 0-2, MPEG2 3-5, MPEG1 6-8."""
    return ((h[2] >> 2) & 3) + (((h[1] >> 3) & 1) + ((h[1] >> 4) & 1)) * 3


# ---------------------------------------------------------------------------
# bit reader (MSB first)

class _Bits:
    __slots__ = ("data", "pos", "limit")

    def __init__(self, data, limit_bits=None):
        self.data = data
        self.pos = 0
        self.limit = len(data) * 8 if limit_bits is None else limit_bits

    def get(self, n: int) -> int:
        pos = self.pos
        self.pos = pos + n
        if self.pos > self.limit:
            return 0
        end = (self.pos + 7) >> 3
        word = int.from_bytes(self.data[pos >> 3:end], "big")
        return (word >> ((end << 3) - self.pos)) & ((1 << n) - 1)

    def get1(self) -> int:
        p = self.pos
        self.pos = p + 1
        if self.pos > self.limit:
            return 0
        return (self.data[p >> 3] >> (7 - (p & 7))) & 1


# ---------------------------------------------------------------------------
# precomputed DSP constants

_i = np.arange(64)[:, None]
_k = np.arange(32)[None, :]
_N64 = np.cos((16 + _i) * (2 * _k + 1) * np.pi / 64.0)              # (64, 32)
_D = np.asarray(T.SYNTH_WINDOW_D65536, dtype=np.float64) / 65536.0

_n36 = np.arange(36)[:, None]
_k18 = np.arange(18)[None, :]
_M36 = np.cos(np.pi / 72.0 * (2 * _n36 + 1 + 18) * (2 * _k18 + 1))  # (36, 18)
_n12 = np.arange(12)[:, None]
_k6 = np.arange(6)[None, :]
_M12 = np.cos(np.pi / 24.0 * (2 * _n12 + 1 + 6) * (2 * _k6 + 1))    # (12, 6)

_WIN_NORMAL = np.sin(np.pi / 36.0 * (np.arange(36) + 0.5))
_WIN_START = _WIN_NORMAL.copy()
_WIN_START[18:24] = 1.0
_WIN_START[24:30] = np.sin(np.pi / 12.0 * (np.arange(6) + 6.5))
_WIN_START[30:] = 0.0
_WIN_STOP = _WIN_NORMAL.copy()
_WIN_STOP[:6] = 0.0
_WIN_STOP[6:12] = np.sin(np.pi / 12.0 * (np.arange(6) + 0.5))
_WIN_STOP[12:18] = 1.0
_WIN12 = np.sin(np.pi / 12.0 * (np.arange(12) + 0.5))
# window by block type (short handled separately)
_WINDOWS = {0: _WIN_NORMAL, 1: _WIN_START, 3: _WIN_STOP}

_AA_CI = np.array([-0.6, -0.535, -0.33, -0.185, -0.095, -0.041, -0.0142, -0.0037])
_AA_CS = 1.0 / np.sqrt(1.0 + _AA_CI * _AA_CI)
_AA_CA = np.abs(_AA_CI) * _AA_CS

# intensity-stereo pan pairs (MPEG-1): r = tan(pos*pi/12); (r, 1)/(1+r)
_PAN = np.zeros((7, 2))
for _p in range(7):
    if _p == 6:
        _PAN[_p] = (1.0, 0.0)
    else:
        _r = np.tan(_p * np.pi / 12.0)
        _PAN[_p] = (_r / (1.0 + _r), 1.0 / (1.0 + _r))

_POW43 = np.arange(8208, dtype=np.float64) ** (4.0 / 3.0)   # 15 + 2^13 max


def _build_huff():
    tables = {}
    for t, entries in T.HUFF_TABLES.items():
        tables[t] = {(length, code): (x, y) for code, length, x, y in entries}
    c1 = [{(length, code): flags for code, length, flags in entries}
          for entries in T.COUNT1_TABLES]
    return tables, c1


_HUFF, _COUNT1 = _build_huff()


# ---------------------------------------------------------------------------
# Layer III: side info

class _GrInfo:
    __slots__ = ("sfbtab", "part_23_length", "big_values", "global_gain",
                 "scalefac_compress", "block_type", "mixed_block_flag",
                 "n_long_sfb", "n_short_sfb", "table_select", "region_count",
                 "subblock_gain", "preflag", "scalefac_scale", "count1_table",
                 "scfsi")


def _read_side_info(bits: _Bits, h):
    sr_idx = _my_sr_index(h)
    sr_idx -= (sr_idx != 0)
    mono = (h[3] & 0xC0) == 0xC0
    mpeg1 = _hdr_mpeg1(h)
    gr_count = (1 if mono else 2) * (2 if mpeg1 else 1)
    if mpeg1:
        main_data_begin = bits.get(9)
        scfsi = bits.get(7 + (2 if mono else 4))
    else:
        nch = 1 if mono else 2
        main_data_begin = bits.get(8 + nch) >> nch
        scfsi = 0
    grs = []
    part_23_sum = 0
    for _ in range(gr_count):
        if mono:
            scfsi = (scfsi << 4) & 0xFFFF
        gr = _GrInfo()
        gr.part_23_length = bits.get(12)
        part_23_sum += gr.part_23_length
        gr.big_values = bits.get(9)
        if gr.big_values > 288:
            raise Mp3Error("big_values > 288")
        gr.global_gain = bits.get(8)
        gr.scalefac_compress = bits.get(4 if mpeg1 else 9)
        gr.sfbtab = T.SFB_LONG[sr_idx]
        gr.n_long_sfb = 22
        gr.n_short_sfb = 0
        if bits.get(1):
            gr.block_type = bits.get(2)
            if gr.block_type == 0:
                raise Mp3Error("block_type 0 with window switching")
            gr.mixed_block_flag = bits.get(1)
            gr.region_count = [7, 255, 255]
            if gr.block_type == SHORT_BLOCK:
                scfsi &= 0x0F0F
                if not gr.mixed_block_flag:
                    gr.region_count[0] = 8
                    gr.sfbtab = T.SFB_SHORT[sr_idx]
                    gr.n_long_sfb = 0
                    gr.n_short_sfb = 39
                else:
                    gr.sfbtab = T.SFB_MIXED[sr_idx]
                    gr.n_long_sfb = 8 if mpeg1 else 6
                    gr.n_short_sfb = 30
            tables = bits.get(10) << 5
            gr.subblock_gain = [bits.get(3), bits.get(3), bits.get(3)]
        else:
            gr.block_type = 0
            gr.mixed_block_flag = 0
            tables = bits.get(15)
            gr.region_count = [bits.get(4), bits.get(3), 255]
            gr.subblock_gain = [0, 0, 0]
        gr.table_select = [(tables >> 10) & 31, (tables >> 5) & 31, tables & 31]
        gr.preflag = bits.get(1) if mpeg1 else int(gr.scalefac_compress >= 500)
        gr.scalefac_scale = bits.get(1)
        gr.count1_table = bits.get(1)
        gr.scfsi = (scfsi >> 12) & 15
        scfsi = (scfsi << 4) & 0xFFFF
        grs.append(gr)
    if part_23_sum + bits.pos > bits.limit + main_data_begin * 8:
        raise Mp3Error("part_23 overflow")
    return grs, main_data_begin


# ---------------------------------------------------------------------------
# Layer III: scalefactors

def _read_scalefactors(bits: _Bits, scf_size, scf_count, ist_pos, scfsi):
    """-> iscf ints (40,); updates ist_pos in place (it doubles as the scfsi
    copy source and the intensity-position store, ISO 11172-3 §2.4.2.7)."""
    iscf = np.zeros(40, dtype=np.int64)
    k = 0
    for i in range(4):
        cnt = scf_count[i]
        if cnt == 0:
            break
        if scfsi >= 0 and (scfsi & 8):
            iscf[k:k + cnt] = ist_pos[k:k + cnt]
        else:
            b = scf_size[i]
            if b == 0:
                ist_pos[k:k + cnt] = 0
            else:
                max_scf = (1 << b) - 1 if scfsi < 0 else -1
                for j in range(cnt):
                    s = bits.get(b)
                    ist_pos[k + j] = 255 if s == max_scf else s
                    iscf[k + j] = s
        k += cnt
        scfsi *= 2
    return iscf


def _decode_scalefactors(h, ist_pos, bits, gr: _GrInfo, ch: int):
    part_row = T.SCF_PARTITIONS[
        (1 if gr.n_short_sfb else 0) + (1 if not gr.n_long_sfb else 0)]
    scf_shift = gr.scalefac_scale + 1
    scfsi = gr.scfsi
    if _hdr_mpeg1(h):
        part = T.SCFC_DECODE[gr.scalefac_compress]
        scf_size = [part >> 2, part >> 2, part & 3, part & 3]
        scf_count = part_row[0:4]
    else:
        ist = 1 if (h[3] & 0x10) and ch else 0
        sfc = gr.scalefac_compress >> ist
        k = ist * 3 * 4
        scf_size = [0, 0, 0, 0]
        while sfc >= 0:
            modprod = 1
            for i in range(3, -1, -1):
                scf_size[i] = (sfc // modprod) % T.LSF_MOD[k + i]
                modprod *= T.LSF_MOD[k + i]
            sfc -= modprod
            k += 4
        scf_count = part_row[k:k + 4]
        scfsi = -16
    iscf = _read_scalefactors(bits, scf_size, scf_count, ist_pos, scfsi)
    if gr.n_short_sfb:
        sh = 3 - scf_shift
        for i in range(0, gr.n_short_sfb, 3):
            iscf[gr.n_long_sfb + i + 0] += gr.subblock_gain[0] << sh
            iscf[gr.n_long_sfb + i + 1] += gr.subblock_gain[1] << sh
            iscf[gr.n_long_sfb + i + 2] += gr.subblock_gain[2] << sh
    elif gr.preflag:
        iscf[11:21] += np.asarray(T.PREAMP, dtype=np.int64)
    return iscf


# ---------------------------------------------------------------------------
# Layer III: huffman + requantization

def _huffman_decode(bits: _Bits, gr: _GrInfo, limit: int):
    """Decode raw quantized magnitudes + signs; requantization is
    vectorized afterwards.  (ISO 11172-3 §2.4.3.4.)"""
    vals = np.zeros(576, dtype=np.int64)
    neg = np.zeros(576, dtype=bool)
    widths = gr.sfbtab
    pos = 0
    sfb_i = 0
    big_pairs = gr.big_values

    for ireg in range(3):
        if big_pairs <= 0:
            break
        tab_num = gr.table_select[ireg]
        sfb_cnt = gr.region_count[ireg]
        table = _HUFF.get(tab_num)
        linbits = T.LINBITS[tab_num]
        while True:
            np_pairs = widths[sfb_i] // 2
            sfb_i += 1
            decode = min(big_pairs, np_pairs)
            for _ in range(decode):
                if table is None:
                    x = y = 0
                else:
                    code = 0
                    length = 0
                    while True:
                        code = (code << 1) | bits.get1()
                        length += 1
                        hit = table.get((length, code))
                        if hit is not None:
                            x, y = hit
                            break
                        if length > 24:
                            raise Mp3Error("bad huffman code")
                for v in (x, y):
                    if v == 15 and linbits:
                        v += bits.get(linbits)
                    if v and bits.get1():
                        neg[pos] = True
                    vals[pos] = v
                    pos += 1
            big_pairs -= np_pairs
            sfb_cnt -= 1
            if not (big_pairs > 0 and sfb_cnt >= 0):
                break

    # count1 region: quads until the part_23 limit (a quad decoded across
    # the boundary is discarded, like the reference)
    c1 = _COUNT1[gr.count1_table]
    while pos <= 572:
        code = 0
        length = 0
        while True:
            code = (code << 1) | bits.get1()
            length += 1
            flags = c1.get((length, code))
            if flags is not None:
                break
            if length > 8:
                flags = 0
                break
        if bits.pos > limit:
            break
        for s in range(4):
            if flags & (8 >> s):
                vals[pos + s] = 1
                if bits.get1():
                    neg[pos + s] = True
        pos += 4
    bits.pos = limit
    return vals, neg


def _requantize(gr: _GrInfo, iscf, vals, neg, ms_stereo: bool):
    """xr = sign * |v|^(4/3) * 2^((gg-210)/4 - (iscf<<shift)/4)  (-2 q-steps
    more under MS stereo: the (a±b)/sqrt(2) normalization)."""
    scf_shift = gr.scalefac_scale + 1
    gain_q = gr.global_gain - 210 - (2 if ms_stereo else 0)
    n_bands = gr.n_long_sfb + gr.n_short_sfb
    widths = np.asarray(gr.sfbtab[:n_bands], dtype=np.int64)
    band_exp = gain_q - (iscf[:n_bands] << scf_shift)
    exps = np.full(576, float(gain_q))
    flat = np.repeat(band_exp.astype(np.float64), widths)
    exps[:flat.shape[0]] = flat
    mag = _POW43[np.minimum(vals, len(_POW43) - 1)]
    xr = mag * np.exp2(exps * 0.25)
    xr[neg] = -xr[neg]
    return xr


# ---------------------------------------------------------------------------
# Layer III: stereo

def _stereo_top_band(right, sfbtab, n_bands):
    """Last band (per short sub-block) where the right channel is nonzero."""
    max_band = [-1, -1, -1]
    k = 0
    for i in range(n_bands):
        w = sfbtab[i]
        if np.any(right[k:k + w] != 0):
            max_band[i % 3] = i
        k += w
    return max_band


def _stereo_process(left, right, ist_pos, sfbtab, h, max_band, mpeg2_sh):
    max_pos = 7 if _hdr_mpeg1(h) else 64
    ms = (h[3] & 0xE0) == 0x60
    k = 0
    i = 0
    while sfbtab[i]:
        w = sfbtab[i]
        ipos = int(ist_pos[i])
        if i > max_band[i % 3] and ipos < max_pos:
            s = np.sqrt(2.0) if ms else 1.0
            if _hdr_mpeg1(h):
                kl, kr = _PAN[ipos]
            else:
                kl = 1.0
                kr = np.exp2(-0.25 * (((ipos + 1) >> 1) << mpeg2_sh))
                if ipos & 1:
                    kl, kr = kr, 1.0
            seg = left[k:k + w].copy()
            left[k:k + w] = seg * (kl * s)
            right[k:k + w] = seg * (kr * s)
        elif ms:
            a = left[k:k + w].copy()
            left[k:k + w] = a + right[k:k + w]
            right[k:k + w] = a - right[k:k + w]
        k += w
        i += 1


def _intensity_stereo(left, right, ist_pos, gr_pair, h):
    gr = gr_pair[0]
    n_sfb = gr.n_long_sfb + gr.n_short_sfb
    max_blocks = 3 if gr.n_short_sfb else 1
    max_band = _stereo_top_band(right, gr.sfbtab, n_sfb)
    if gr.n_long_sfb:
        m = max(max_band)
        max_band = [m, m, m]
    for i in range(max_blocks):
        default_pos = 3 if _hdr_mpeg1(h) else 0
        itop = n_sfb - max_blocks + i
        prev = itop - max_blocks
        ist_pos[itop] = default_pos if max_band[i] >= prev else ist_pos[prev]
    _stereo_process(left, right, ist_pos, gr.sfbtab, h, max_band,
                    gr_pair[-1].scalefac_compress & 1)


def _midside(left, right):
    a = left.copy()
    left += right
    right[:] = a - right


# ---------------------------------------------------------------------------
# Layer III: reorder / antialias / IMDCT / inversion

def _reorder(grbuf, start, sfb_widths):
    """Short-block reordering: per-window runs -> per-coefficient triples."""
    src = grbuf[start:]
    out = []
    k = 0
    i = 0
    while sfb_widths[i]:
        w = sfb_widths[i]
        block = src[k:k + 3 * w].reshape(3, w)
        out.append(block.T.reshape(-1))
        k += 3 * w
        i += 3
    flat = np.concatenate(out)
    grbuf[start:start + flat.shape[0]] = flat


def _antialias(grbuf, nbands):
    """Butterflies across each long-block subband boundary (ISO §2.4.3.4.10.1)."""
    for b in range(nbands):
        base = 18 * (b + 1)
        u = grbuf[base:base + 8].copy()
        d = grbuf[base - 8:base][::-1].copy()
        grbuf[base:base + 8] = u * _AA_CS - d * _AA_CA
        grbuf[base - 8:base] = (u * _AA_CA + d * _AA_CS)[::-1]


_W2_LONG = _WIN_NORMAL[18:]     # consumption window, long-type consumer
_W2_SHORT = _WIN_START[18:]     # consumption window, short/stop consumer
_W2_SHORT_INV = np.where(_W2_SHORT > 0, 1.0 / np.where(_W2_SHORT > 0, _W2_SHORT, 1.0), 0.0)


def _imdct_bands(grbuf, overlap, block_type, n_long_bands):
    """IMDCT + window + overlap-add, in place over the (32, 18) grid.

    Overlap convention (mirrors the reference decoder's): the stored tail is
    UNWINDOWED; the consuming granule applies the previous block's tail
    window by assumption — the normal tail when the consuming band is
    long-windowed (block types 0/1, and the long bands of a mixed block),
    the start-block tail when it is short-windowed or a stop block.  For
    spec-valid window sequences this equals the textbook
    `out[n] = ovl[n] + z[n]*w[n]` overlap-add exactly; on invalid
    transitions it reproduces the reference's behavior bit-for-bit instead
    of the textbook's.  Short blocks store their (windowed, overlap-added)
    tail pre-divided by the start tail so the same consumption rule holds."""
    X = grbuf.reshape(32, 18)

    def imdct36(rows, win, w2):
        z = _M36 @ X[rows].T                        # (36, n), unwindowed
        buf = overlap[rows] * w2[None, :] + (z[:18] * win[:18, None]).T
        overlap[rows] = z[18:].T
        X[rows] = buf

    if block_type == SHORT_BLOCK:
        if n_long_bands:
            imdct36(slice(0, n_long_bands), _WIN_NORMAL, _W2_LONG)
        rest = slice(n_long_bands, 32)
        nb = 32 - n_long_bands
        Xs = X[rest].reshape(nb, 6, 3)              # (band, coeff, window)
        z = np.einsum("nk,bkw->bwn", _M12, Xs) * _WIN12[None, None, :]
        out = np.zeros((nb, 36))
        out[:, 6:18] += z[:, 0]
        out[:, 12:24] += z[:, 1]
        out[:, 18:30] += z[:, 2]
        buf = overlap[rest] * _W2_SHORT[None, :] + out[:, :18]
        overlap[rest] = out[:, 18:] * _W2_SHORT_INV[None, :]
        X[rest] = buf
    else:
        win = _WINDOWS[block_type]
        w2 = _W2_LONG if block_type in (0, 1) else _W2_SHORT
        if n_long_bands:
            imdct36(slice(0, n_long_bands), _WIN_NORMAL, _W2_LONG)
            imdct36(slice(n_long_bands, 32), win, w2)
        else:
            imdct36(slice(0, 32), win, w2)


def _freq_inversion(grbuf):
    X = grbuf.reshape(32, 18)
    X[1::2, 1::2] = -X[1::2, 1::2]


# ---------------------------------------------------------------------------
# polyphase synthesis (shared by all layers)

def _scale_pcm_s16(x: np.ndarray) -> np.ndarray:
    """The reference decoder's exact f32->s16 rounding."""
    x32 = x.astype(np.float32).astype(np.float64)
    s = np.trunc(x32 + 0.5)
    s = s - (s < 0)
    s = np.where(x32 >= 32766.5, 32767.0, s)
    s = np.where(x32 <= -32767.5, -32768.0, s)
    return np.clip(s, -32768, 32767).astype(np.int16)


class _Synth:
    """V-FIFO state + the textbook windowed matrixing:

    PCM_t[j] = sum_{a=0}^{15} D[j+32a] * V_{t-a}[j if a even else 32+j]."""

    def __init__(self):
        self.hist = np.zeros((2, 15, 64))   # per channel

    def run(self, S, ch: int) -> np.ndarray:
        """S: (T, 32) subband slots -> (T*32,) PCM in +-32768 scale."""
        Tn = S.shape[0]
        V = S @ _N64.T                                      # (T, 64)
        Vall = np.concatenate([self.hist[ch], V], axis=0)   # (15+T, 64)
        self.hist[ch] = Vall[-15:]
        pcm = np.zeros((Tn, 32))
        for a in range(16):
            cols = slice(0, 32) if a % 2 == 0 else slice(32, 64)
            pcm += Vall[15 - a:15 - a + Tn, cols] * _D[32 * a:32 * a + 32][None, :]
        return pcm.reshape(-1) * 32768.0    # s16 scale for _scale_pcm_s16


# ---------------------------------------------------------------------------
# Layer I/II

_L12_DEQ_BASE = (2.0 ** -20, 2.0 ** -20 * 2.0 ** (-1.0 / 3.0),
                 2.0 ** -20 * 2.0 ** (-2.0 / 3.0))


def _l12_subband_alloc(h):
    mode = (h[3] >> 6) & 3
    mode_ext = (h[3] >> 4) & 3
    stereo_bands = 0 if mode == MODE_MONO else (
        (mode_ext << 2) + 4 if mode == MODE_JOINT else 32)
    if _hdr_layer(h) == 1:
        alloc, nbands = T.L12_ALLOC_L1, 32
    elif not _hdr_mpeg1(h):
        alloc, nbands = T.L12_ALLOC_L2M2, 30
    else:
        sr = (h[2] >> 2) & 3
        kbps = _hdr_bitrate_kbps(h) >> int(mode != MODE_MONO)
        if not kbps:
            kbps = 192
        alloc, nbands = T.L12_ALLOC_L2M1, 27
        if kbps < 56:
            alloc, nbands = T.L12_ALLOC_L2M1_LOW, (12 if sr == 2 else 8)
        elif kbps >= 96 and sr != 1:
            nbands = 30
    return alloc, nbands, min(stereo_bands, nbands)


def _l12_read_scale_info(h, bits: _Bits):
    alloc, total_bands, stereo_bands = _l12_subband_alloc(h)
    bitalloc = np.zeros(64, dtype=np.int64)
    k = 0
    seg = 0
    ba_bits = 0
    tab_off = 0
    for i in range(total_bands):
        if i == k:
            tab_off, ba_bits, cnt = alloc[seg]
            k += cnt
            seg += 1
        ba = T.L12_BITALLOC_CODES[tab_off + bits.get(ba_bits)]
        bitalloc[2 * i] = ba
        if i < stereo_bands:
            ba = T.L12_BITALLOC_CODES[tab_off + bits.get(ba_bits)]
        bitalloc[2 * i + 1] = ba if stereo_bands else 0
    scfcod = np.zeros(64, dtype=np.int64)
    for i in range(2 * total_bands):
        scfcod[i] = (2 if _hdr_layer(h) == 1 else bits.get(2)) if bitalloc[i] else 6
    scf = np.zeros(3 * 64)
    for i in range(2 * total_bands):
        ba = int(bitalloc[i])
        mask = (4 + ((19 >> scfcod[i]) & 3)) if ba else 0
        s = 0.0
        m = 4
        for j in range(3):
            if mask & m:
                b = bits.get(6)
                levels = ((1 << ba) - 1) if ba < 17 else (3, 5, 9)[ba - 17]
                # x2: this decoder's synthesis stage carries the plain ISO-D
                # gain, half the reference's window-folded gain; Layer III
                # compensates in _requantize (gg-210 vs the reference's
                # gg-214), Layer I/II compensate here.
                s = 2.0 * _L12_DEQ_BASE[b % 3] / levels * float(1 << 21 >> (b // 3))
            scf[3 * i + j] = s
            m >>= 1
    bitalloc[2 * np.arange(stereo_bands, total_bands) + 1] = 0
    return bitalloc, scf, total_bands, stereo_bands


def _l12_dequantize_granule(grbuf, slot_off, bits: _Bits, bitalloc,
                            total_bands, group_size):
    for j in range(4):
        for i in range(2 * total_bands):
            ba = int(bitalloc[i])
            ch, band = i & 1, i >> 1
            base = band * 18 + slot_off + group_size * j
            if ba:
                if ba < 17:
                    half = (1 << (ba - 1)) - 1
                    for k in range(group_size):
                        grbuf[ch, base + k] = float(bits.get(ba) - half)
                else:
                    mod = (2 << (ba - 17)) + 1
                    code = bits.get(mod + 2 - (mod >> 3))
                    for k in range(group_size):
                        grbuf[ch, base + k] = float(code % mod - mod // 2)
                        code //= mod
    return group_size * 4


def _l12_apply_scf(grbuf, scf, igr, total_bands, stereo_bands):
    # bands >= stereo_bands carry shared samples but separate scalefactors
    for b in range(stereo_bands, total_bands):
        grbuf[1, b * 18:b * 18 + 12] = grbuf[0, b * 18:b * 18 + 12]
    for b in range(total_bands):
        sl = slice(b * 18, b * 18 + 12)
        grbuf[0, sl] *= scf[6 * b + igr]
        grbuf[1, sl] *= scf[6 * b + 3 + igr]


# ---------------------------------------------------------------------------
# frame walking + decoder state

def _match_frame(data, off, frame_bytes) -> bool:
    i = 0
    for _ in range(FRAME_SYNC_MATCHES):
        h = data[off + i:off + i + 4]
        i += _hdr_frame_bytes(h, frame_bytes) + _hdr_padding(h)
        if off + i + 4 > len(data):
            return True
        if not _hdr_compare(data[off:off + 4], data[off + i:off + i + 4]):
            return False
    return True


def _find_frame(data, free_format_bytes: int):
    """-> (offset, frame_bytes_incl_padding, free_format_bytes)."""
    n = len(data)
    for i in range(max(0, n - 4)):
        h = data[i:i + 4]
        if not _hdr_valid(h):
            continue
        frame_bytes = _hdr_frame_bytes(h, free_format_bytes)
        frame_and_padding = frame_bytes + _hdr_padding(h)
        k = 4
        while not frame_bytes and k < MAX_FREE_FORMAT_FRAME and i + 2 * k < n - 4:
            if _hdr_compare(h, data[i + k:i + k + 4]):
                fb = k - _hdr_padding(h)
                nextfb = fb + _hdr_padding(data[i + k:i + k + 4])
                if (i + k + nextfb + 4 <= n
                        and _hdr_compare(h, data[i + k + nextfb:i + k + nextfb + 4])):
                    frame_and_padding = k
                    frame_bytes = fb
                    free_format_bytes = fb
            k += 1
        if ((frame_bytes and i + frame_and_padding <= n
             and _match_frame(data, i, frame_bytes))
                or (i == 0 and frame_and_padding == n)):
            return i, frame_and_padding, free_format_bytes
        free_format_bytes = 0
    return n, 0, free_format_bytes


class Mp3Decoder:
    """Stateful frame decoder (bit reservoir, IMDCT overlap, synthesis FIFO)."""

    def __init__(self):
        self.header = b"\x00\x00\x00\x00"
        self.free_format_bytes = 0
        self.reservoir = b""
        self.overlap = np.zeros((2, 32, 18))
        self.synth = _Synth()

    def _reset(self):
        self.__init__()

    def decode_frame(self, data):
        """-> (s16 ndarray (n, ch) or None, consumed_bytes, hz, nch)."""
        frame_size = 0
        i = 0
        if (len(data) > 4 and self.header[0] == 0xFF
                and _hdr_compare(self.header, data)):
            frame_size = (_hdr_frame_bytes(data, self.free_format_bytes)
                          + _hdr_padding(data))
            if frame_size != len(data) and (
                    frame_size + 4 > len(data)
                    or not _hdr_compare(data, data[frame_size:frame_size + 4])):
                frame_size = 0
        if not frame_size:
            self._reset()
            i, frame_size, self.free_format_bytes = _find_frame(
                data, self.free_format_bytes)
            if not frame_size or i + frame_size > len(data):
                return None, i, 0, 0
        h = bytes(data[i:i + 4])
        self.header = h
        consumed = i + frame_size
        nch = 1 if (h[3] & 0xC0) == 0xC0 else 2
        hz = _hdr_sample_rate(h)
        layer = _hdr_layer(h)
        bits = _Bits(data[i + 4:i + frame_size])
        if not (h[1] & 1):     # CRC present: skipped, unverified (as the reference)
            bits.get(16)
        if layer == 3:
            try:
                grs, main_data_begin = _read_side_info(bits, h)
            except Mp3Error:
                self._reset()
                return None, consumed, hz, nch
            pcm = self._decode_l3(h, bits, grs, main_data_begin, nch)
        else:
            try:
                pcm = self._decode_l12(h, bits, layer, nch)
            except Mp3Error:
                self._reset()
                pcm = None
        return pcm, consumed, hz, nch

    # -- layer III ----------------------------------------------------------

    def _decode_l3(self, h, bits: _Bits, grs, main_data_begin, nch):
        # bit reservoir splice
        frame_rest = bytes(bits.data[bits.pos // 8:])
        have = min(len(self.reservoir), main_data_begin)
        maindata = self.reservoir[len(self.reservoir) - have:] + frame_rest
        ok = len(self.reservoir) >= main_data_begin
        out = None
        end_bits = 0
        if ok:
            md = _Bits(maindata)
            n_gran = 2 if _hdr_mpeg1(h) else 1
            out = np.zeros((n_gran * 576, nch), dtype=np.int16)
            ist_pos = np.zeros((2, 40), dtype=np.int64)
            ms = (h[3] & 0xE0) == 0x60
            for igr in range(n_gran):
                grbuf = np.zeros((2, 576))
                gr_pair = grs[igr * nch:igr * nch + nch]
                for ch in range(nch):
                    gr = gr_pair[ch]
                    limit = md.pos + gr.part_23_length
                    iscf = _decode_scalefactors(h, ist_pos[ch], md, gr, ch)
                    vals, neg = _huffman_decode(md, gr, limit)
                    grbuf[ch] = _requantize(gr, iscf, vals, neg, ms)
                if h[3] & 0x10:          # intensity (possibly combined with MS)
                    _intensity_stereo(grbuf[0], grbuf[1], ist_pos[1], gr_pair, h)
                elif ms:
                    _midside(grbuf[0], grbuf[1])
                for ch in range(nch):
                    gr = gr_pair[ch]
                    n_long_bands = ((2 if gr.mixed_block_flag else 0)
                                    << (1 if _my_sr_index(h) == 2 else 0))
                    if gr.n_short_sfb:
                        aa_bands = n_long_bands - 1
                        _reorder(grbuf[ch], n_long_bands * 18,
                                 gr.sfbtab[gr.n_long_sfb:])
                    else:
                        aa_bands = 31
                    _antialias(grbuf[ch], aa_bands)
                    _imdct_bands(grbuf[ch], self.overlap[ch], gr.block_type,
                                 n_long_bands)
                    _freq_inversion(grbuf[ch])
                    S = grbuf[ch].reshape(32, 18).T      # (slots, bands)
                    out[igr * 576:(igr + 1) * 576, ch] = _scale_pcm_s16(
                        self.synth.run(S, ch))
            end_bits = md.pos
        keep = maindata[(end_bits + 7) // 8:]
        if len(keep) > MAX_RESERVOIR:
            keep = keep[len(keep) - MAX_RESERVOIR:]
        self.reservoir = bytes(keep)
        return out

    # -- layer I/II ---------------------------------------------------------

    def _decode_l12(self, h, bits: _Bits, layer, nch):
        bitalloc, scf, total_bands, stereo_bands = _l12_read_scale_info(h, bits)
        group_size = 1 if layer == 1 else 3
        grbuf = np.zeros((2, 576))
        out = np.zeros((_hdr_frame_samples(h), nch), dtype=np.int16)
        slot_off = 0
        pcm_off = 0
        for igr in range(3):
            slot_off += _l12_dequantize_granule(
                grbuf, slot_off, bits, bitalloc, total_bands, group_size)
            if slot_off == 12:
                _l12_apply_scf(grbuf, scf, igr, total_bands, stereo_bands)
                for ch in range(nch):
                    S = grbuf[ch].reshape(32, 18).T[:12]
                    out[pcm_off:pcm_off + 384, ch] = _scale_pcm_s16(
                        self.synth.run(S, ch))
                grbuf[:] = 0.0
                pcm_off += 384
                slot_off = 0
            if bits.pos > bits.limit:
                raise Mp3Error("layer 1/2 frame overrun")
        return out[:pcm_off] if pcm_off else None


def is_mpeg_audio(data) -> bool:
    """Cheap sniff: ID3v2 tag, or a verified frame-sync chain near the start."""
    if bytes(data[:3]) == b"ID3":
        return True
    off, size, _ = _find_frame(bytes(data[:64 * 1024]), 0)
    return size > 0


def decode_mp3(data):
    """Decode a whole MP3/MP2/MP1 stream.

    Returns (pcm float32 (n, ch), sample_rate).  f32 = s16/32768, matching
    the reference's dr_mp3 (s16 output mode) bit-for-bit at the s16 level."""
    dec = Mp3Decoder()
    data = bytes(data)
    chunks = []
    hz = 0
    nch = 0
    pos = 0
    while pos < len(data):
        pcm, consumed, fhz, fch = dec.decode_frame(data[pos:])
        if consumed == 0:
            break
        pos += consumed
        if pcm is not None and pcm.shape[0]:
            if hz == 0:
                hz, nch = fhz, fch
            if fhz == hz and fch == nch:
                chunks.append(pcm)
    if not chunks:
        raise Mp3Error("no decodable MPEG audio frames")
    pcm = np.concatenate(chunks, axis=0).astype(np.float32) / 32768.0
    return pcm, hz
