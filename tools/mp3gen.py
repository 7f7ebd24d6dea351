#!/usr/bin/env python3
"""MPEG audio test-bitstream builder (the mp3 analog of tools/flacgen.py).

Not an encoder: there is no analysis filterbank or psychoacoustics.  It
emits spec-VALID Layer I/II/III bitstreams whose quantized values, table
selections, block types, stereo modes and reservoir layout are chosen
directly — which is exactly what a decoder-conformance corpus needs.  The
decoded PCM is arbitrary band-limited noise; correctness is established by
decoding each stream with BOTH the framework decoder and the reference's
vendored dr_mp3 and comparing (tests/test_mp3_golden.py).

Covers: MPEG-1/2/2.5 Layer III (long/start/short/mixed/stop blocks, all
31 huffman tables incl. linbits escapes, count1 A/B, scfsi, preflag,
scalefac_scale, subblock gain, MS/intensity/dual/mono modes, LSF
scalefactor partitions incl. the intensity variant, bit reservoir, CRC
frames, padding) and Layer II / Layer I (all allocation tables, grouped
quantization, joint-stereo bound).
"""

from __future__ import annotations

import numpy as np

from whisper_tpu.audio import _mp3_tables as T
from whisper_tpu.audio.mp3 import (MODE_JOINT, MODE_MONO, _hdr_frame_bytes,
                                   _my_sr_index)


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, value: int, n: int):
        assert 0 <= value < (1 << n), (value, n)
        self.acc = (self.acc << n) | value
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def bitlen(self):
        return len(self.buf) * 8 + self.nbits

    def pad_to_byte(self):
        if self.nbits:
            self.put(0, 8 - self.nbits)

    def bytes(self):
        assert self.nbits == 0
        return bytes(self.buf)


# encode-side huffman: (x, y) -> (code, len) per table; escape max per table
_ENC = {}
for _t, _entries in T.HUFF_TABLES.items():
    _ENC[_t] = {(x, y): (code, length) for code, length, x, y in _entries}
_ENC_C1 = [
    {flags: (code, length) for code, length, flags in entries}
    for entries in T.COUNT1_TABLES
]
# largest non-escape symbol per table (15 means escape when linbits > 0)
_TAB_MAX = {t: max(max(x, y) for (x, y) in d) for t, d in _ENC.items()}


def _header(mpeg: int, layer: int, bitrate_idx: int, sr_idx: int, mode: int,
            mode_ext: int = 0, padding: int = 0, crc: bool = False) -> bytes:
    """mpeg: 1, 2 or 25."""
    ver = {1: 3, 2: 2, 25: 0}[mpeg]
    layer_bits = 4 - layer
    h1 = 0xE0 | (ver << 3) | (layer_bits << 1) | (0 if crc else 1)
    h2 = (bitrate_idx << 4) | (sr_idx << 2) | (padding << 1)
    h3 = (mode << 6) | (mode_ext << 4)
    return bytes((0xFF, h1, h2, h3))


# ---------------------------------------------------------------------------
# Layer III granule synthesis

class _Granule:
    """One granule/channel's chosen parameters + its written main-data bits."""

    def __init__(self, rng, h, ch, block_type=0, mixed=False, want_escape=False,
                 density=0.25, max_sfb_vals=6, intensity_ch1=False,
                 scalefac_scale=None, preflag=None, gg=None):
        mpeg1 = bool(h[1] & 0x8)
        sr_idx = _my_sr_index(h)
        sr_idx -= (sr_idx != 0)
        self.block_type = block_type
        self.mixed = mixed and block_type == 2
        if block_type == 2 and not self.mixed:
            self.sfbtab = T.SFB_SHORT[sr_idx]
            self.n_long_sfb, self.n_short_sfb = 0, 39
        elif self.mixed:
            self.sfbtab = T.SFB_MIXED[sr_idx]
            self.n_long_sfb = 8 if mpeg1 else 6
            self.n_short_sfb = 30
        else:
            self.sfbtab = T.SFB_LONG[sr_idx]
            self.n_long_sfb, self.n_short_sfb = 22, 0
        self.global_gain = int(rng.integers(120, 180)) if gg is None else gg
        self.scalefac_scale = (int(rng.integers(0, 2))
                               if scalefac_scale is None else scalefac_scale)
        self.preflag = ((int(rng.integers(0, 2)) if preflag is None else preflag)
                        if (mpeg1 and block_type != 2) else 0)
        self.count1_table = int(rng.integers(0, 2))
        self.subblock_gain = ([int(rng.integers(0, 3)) for _ in range(3)]
                              if block_type else [0, 0, 0])
        self.intensity_ch1 = intensity_ch1

        # scalefactor setup
        if mpeg1:
            self.scalefac_compress = int(rng.integers(0, 16))
            part = T.SCFC_DECODE[self.scalefac_compress]
            self.scf_size = [part >> 2, part >> 2, part & 3, part & 3]
            row = T.SCF_PARTITIONS[
                (1 if self.n_short_sfb else 0) + (1 if not self.n_long_sfb else 0)]
            self.scf_count = row[0:4]
        else:
            # pick a compress value; derive sizes/counts with the LSF walk
            self.scalefac_compress = int(rng.integers(0, 400))
            if self.preflag:
                self.scalefac_compress = 500 + int(rng.integers(0, 12))
            row = T.SCF_PARTITIONS[
                (1 if self.n_short_sfb else 0) + (1 if not self.n_long_sfb else 0)]
            ist = 1 if intensity_ch1 else 0
            sfc = self.scalefac_compress >> ist
            k = ist * 12
            self.scf_size = [0, 0, 0, 0]
            while sfc >= 0:
                modprod = 1
                for i in range(3, -1, -1):
                    self.scf_size[i] = (sfc // modprod) % T.LSF_MOD[k + i]
                    modprod *= T.LSF_MOD[k + i]
                sfc -= modprod
                k += 4
            self.scf_count = row[k:k + 4]
        self.scf_vals = [
            int(rng.integers(0, max(1, (1 << b))))
            for b, c in zip(self.scf_size, self.scf_count) for _ in range(c)]
        # intensity positions: keep below the "illegal" all-ones marker
        for i, b in enumerate(
                [b for b, c in zip(self.scf_size, self.scf_count)
                 for _ in range(c)]):
            if b and self.scf_vals[i] == (1 << b) - 1:
                self.scf_vals[i] -= 1

        # spectrum: pick big_values region sizes + tables, then values
        n_entries = self.n_long_sfb + self.n_short_sfb
        widths = list(self.sfbtab[:n_entries])
        total_pairs = sum(widths) // 2
        self.big_values = int(rng.integers(8, min(200, total_pairs)))
        if block_type:
            self.region_count = [7 if self.mixed else 8, 255, 255]
            n_tables = 2
        else:
            self.region_count = [int(rng.integers(2, 9)),
                                 int(rng.integers(2, 8)), 255]
            n_tables = 3
        lin_tables = [16, 17, 18, 19, 20, 21, 24, 25, 26, 27]
        plain = [1, 2, 3, 5, 6, 7, 8, 9, 10, 11, 12, 13, 15]
        self.table_select = []
        for r in range(3):
            if r >= n_tables:
                self.table_select.append(0)
            elif want_escape and r == (n_tables - 1) % 3:
                self.table_select.append(int(rng.choice(lin_tables)))
            else:
                # 0 (all zero) occasionally
                pool = plain + [0] if r else plain
                self.table_select.append(int(rng.choice(pool)))
        self.density = density
        self.max_sfb_vals = max_sfb_vals
        self.rng = rng

    def write(self, bw: _BitWriter, skip_scf_groups: int = 0) -> dict:
        """Write part2 (scalefactors) + part3 (huffman).  Returns side-info
        fields dict incl. the exact part_23_length."""
        start = bw.bitlen()
        # scalefactors
        vi = 0
        for gi in range(4):
            cnt = self.scf_count[gi]
            if cnt == 0:
                break
            b = self.scf_size[gi]
            skip = bool(skip_scf_groups & (8 >> gi))
            for _ in range(cnt):
                if b and not skip:
                    bw.put(self.scf_vals[vi], b)
                vi += 1

        # huffman big values
        rng = self.rng
        widths = list(self.sfbtab[:self.n_long_sfb + self.n_short_sfb])
        pairs_left = self.big_values
        sfb_i = 0
        for ireg in range(3):
            if pairs_left <= 0:
                break
            tab = self.table_select[ireg]
            sfb_cnt = self.region_count[ireg]
            linbits = T.LINBITS[tab]
            enc = _ENC.get(tab)
            vmax = _TAB_MAX.get(tab, 0)
            while True:
                np_pairs = widths[sfb_i] // 2 if sfb_i < len(widths) else 1
                sfb_i += 1
                for _ in range(min(pairs_left, np_pairs)):
                    if enc is None:
                        continue            # table 0: zero pairs, no bits
                    if rng.random() < self.density:
                        hi = min(vmax, self.max_sfb_vals)
                        x = int(rng.integers(0, hi + 1))
                        y = int(rng.integers(0, hi + 1))
                    else:
                        x = y = 0
                    ext_x = ext_y = 0
                    if linbits and vmax == 15:
                        if x == 15 or (rng.random() < 0.08):
                            x = 15
                            ext_x = int(rng.integers(0, 1 << min(linbits, 10)))
                        if y == 15 or (rng.random() < 0.08):
                            y = 15
                            ext_y = int(rng.integers(0, 1 << min(linbits, 10)))
                    code, ln = enc[(x, y)]
                    bw.put(code, ln)
                    if x == 15 and linbits:
                        bw.put(ext_x, linbits)
                    if x:
                        bw.put(int(rng.integers(0, 2)), 1)
                    if y == 15 and linbits:
                        bw.put(ext_y, linbits)
                    if y:
                        bw.put(int(rng.integers(0, 2)), 1)
                pairs_left -= np_pairs
                sfb_cnt -= 1
                if not (pairs_left > 0 and sfb_cnt >= 0):
                    break

        # count1 quads
        pos = 2 * self.big_values
        enc1 = _ENC_C1[self.count1_table]
        n_quads = int(self.rng.integers(0, max(1, (576 - pos) // 4 // 3)))
        for _ in range(n_quads):
            flags = int(rng.integers(0, 16)) if rng.random() < 0.7 else 0
            code, ln = enc1[flags]
            bw.put(code, ln)
            for s in range(4):
                if flags & (8 >> s):
                    bw.put(int(rng.integers(0, 2)), 1)
        return {
            "part_23_length": bw.bitlen() - start,
            "big_values": self.big_values,
            "global_gain": self.global_gain,
            "scalefac_compress": self.scalefac_compress,
            "block_type": self.block_type,
            "mixed": self.mixed,
            "table_select": self.table_select,
            "region_count": self.region_count,
            "subblock_gain": self.subblock_gain,
            "preflag": self.preflag,
            "scalefac_scale": self.scalefac_scale,
            "count1_table": self.count1_table,
        }


def _write_side_info(bw: _BitWriter, h, fields, mdb, scfsi_bits):
    mpeg1 = bool(h[1] & 0x8)
    mono = (h[3] & 0xC0) == 0xC0
    nch = 1 if mono else 2
    if mpeg1:
        bw.put(mdb, 9)
        bw.put(0, 5 if mono else 3)                 # private bits
        for ch in range(nch):
            bw.put(scfsi_bits[ch], 4)
    else:
        bw.put(mdb, 8)
        bw.put(0, 1 if mono else 2)
    for f in fields:
        bw.put(f["part_23_length"], 12)
        bw.put(f["big_values"], 9)
        bw.put(f["global_gain"], 8)
        bw.put(f["scalefac_compress"], 4 if mpeg1 else 9)
        if f["block_type"]:
            bw.put(1, 1)                            # window switching
            bw.put(f["block_type"], 2)
            bw.put(1 if f["mixed"] else 0, 1)
            bw.put(f["table_select"][0], 5)
            bw.put(f["table_select"][1], 5)
            for g in f["subblock_gain"]:
                bw.put(g, 3)
        else:
            bw.put(0, 1)
            for t in f["table_select"]:
                bw.put(t, 5)
            bw.put(f["region_count"][0], 4)
            bw.put(f["region_count"][1], 3)
        if mpeg1:
            bw.put(f["preflag"], 1)
        bw.put(f["scalefac_scale"], 1)
        bw.put(f["count1_table"], 1)


def gen_l3(seed=0, n_frames=12, mpeg=1, sr_idx=0, bitrate_idx=9, mode=MODE_MONO,
           mode_ext=0, block_plan=None, use_reservoir=False, use_scfsi=False,
           want_escape=False, crc=False, id3=False, padding_frames=(),
           density=0.3) -> bytes:
    """Build a valid Layer III stream.  block_plan: list over frames of block
    types (0 normal / 1 start / 2 short / 2.5 mixed-short / 3 stop)."""
    rng = np.random.default_rng(seed)
    h0 = _header(mpeg, 3, bitrate_idx, sr_idx, mode, mode_ext, 0, crc)
    mono = mode == MODE_MONO
    nch = 1 if mono else 2
    n_gran = 2 if mpeg == 1 else 1
    if block_plan is None:
        block_plan = [0] * n_frames
    out = bytearray()
    if id3:
        body = b"\x00" * 37
        out += b"ID3\x04\x00\x00" + bytes(
            [0, 0, (len(body) >> 7) & 0x7F, len(body) & 0x7F]) + body

    stream = bytearray()          # continuous maindata stream
    stream_emitted = 0            # bytes of stream already placed in payloads
    pending_payload = []          # (header+side bytes, payload_capacity)

    for fi in range(n_frames):
        pad = 1 if fi in padding_frames else 0
        h = _header(mpeg, 3, bitrate_idx, sr_idx, mode, mode_ext, pad, crc)
        frame_bytes = _hdr_frame_bytes(h, 0) + (1 if pad else 0)
        side_bytes = (17 if mono else 32) if mpeg == 1 else (9 if mono else 17)
        capacity = frame_bytes - 4 - side_bytes - (2 if crc else 0)
        assert capacity > 0

        # this frame's maindata chunk starts mdb bytes before its payload;
        # the lookback field is 9 bits (MPEG-1) / 8 bits (LSF)
        max_mdb = min(MAXRES, 511 if mpeg == 1 else 255)
        if use_reservoir and stream_emitted - len(stream) > max_mdb - 60:
            # bound the lookback: stuff the stream (ancillary bytes)
            stream += bytes((stream_emitted - len(stream)) - max_mdb // 2)
        mdb = stream_emitted - len(stream)
        assert 0 <= mdb <= max_mdb, mdb
        # block_plan is per GRANULE (MPEG-1 frames hold two granules); only
        # spec-valid window sequences (normal|stop -> start -> short -> stop)
        # are generated — the reference's overlap factorization is only
        # equivalent to the textbook overlap-add on valid sequences.
        gr_types = [block_plan[(fi * n_gran + g) % len(block_plan)]
                    for g in range(n_gran)]
        for attempt in range(6):
            d = density / (2 ** attempt)
            bw = _BitWriter()
            fields = []
            scfsi_bits = [0, 0]
            grans = []
            for igr in range(n_gran):
                bt = gr_types[igr]
                mixed = bt == 2.5
                ibt = 2 if mixed else int(bt)
                for ch in range(nch):
                    intensity = (mode == MODE_JOINT and (mode_ext & 1)
                                 and ch == 1 and mpeg != 1)
                    g = _Granule(rng, h, ch, block_type=ibt, mixed=mixed,
                                 want_escape=want_escape and attempt < 3,
                                 density=d, intensity_ch1=intensity)
                    g.big_values = max(8, g.big_values >> attempt)
                    grans.append(g)
            if use_scfsi and n_gran == 2 and gr_types == [0, 0]:
                for ch in range(nch):
                    scfsi_bits[ch] = int(rng.integers(0, 16))
                    # granule 1 reuses granule 0's layout for copied groups
                    g0, g1 = grans[ch], grans[nch + ch]
                    g1.scalefac_compress = g0.scalefac_compress
                    g1.scf_size = g0.scf_size
                    g1.scf_count = g0.scf_count
                    g1.scf_vals = list(g0.scf_vals)
            for igr in range(n_gran):
                for ch in range(nch):
                    g = grans[igr * nch + ch]
                    skip = scfsi_bits[ch] if igr == 1 else 0
                    fields.append(g.write(bw, skip_scf_groups=skip))
            bw.pad_to_byte()
            chunk = bw.bytes()
            if len(chunk) <= capacity + mdb:
                break
        else:
            raise ValueError("maindata overflow; lower density/bitrate mismatch")
        stream += chunk

        sb = _BitWriter()
        _write_side_info(sb, h, fields, mdb, scfsi_bits)
        sb.pad_to_byte()
        side = sb.bytes()
        assert len(side) == side_bytes, (len(side), side_bytes)
        pending_payload.append((h, side, capacity, crc))
        if not use_reservoir:
            # flush stream to exactly fill this payload
            deficit = (stream_emitted + capacity) - len(stream)
            assert deficit >= 0
            stream += bytes(deficit)
        stream_emitted += capacity

    # final flush: stuff the stream to cover all payloads
    if len(stream) < stream_emitted:
        stream += bytes(stream_emitted - len(stream))
    pos = 0
    for h, side, capacity, has_crc in pending_payload:
        out += h
        if has_crc:
            out += b"\x00\x00"
        out += side
        out += stream[pos:pos + capacity]
        pos += capacity
    return bytes(out)


MAXRES = 511


# ---------------------------------------------------------------------------
# Layer I / II

def gen_l12(seed=0, n_frames=10, layer=2, mpeg=1, sr_idx=0, bitrate_idx=12,
            mode=MODE_MONO, mode_ext=0) -> bytes:
    rng = np.random.default_rng(seed)
    out = bytearray()
    from whisper_tpu.audio.mp3 import _l12_subband_alloc
    for fi in range(n_frames):
        h = _header(mpeg, layer, bitrate_idx, sr_idx, mode, mode_ext)
        frame_bytes = _hdr_frame_bytes(h, 0)
        alloc, total_bands, stereo_bands = _l12_subband_alloc(h)
        for attempt in range(8):
            bw = _BitWriter()
            p_alloc = 0.7 / (1.6 ** attempt)
            code_cap = max(2, 16 >> attempt)
            # bit allocation codes
            ba = np.zeros(64, dtype=int)
            k = 0
            seg = 0
            ba_bits = 0
            tab_off = 0
            for i in range(total_bands):
                if i == k:
                    tab_off, ba_bits, cnt = alloc[seg]
                    k += cnt
                    seg += 1
                ncodes = min(1 << ba_bits, code_cap)
                c0 = int(rng.integers(0, ncodes)) if rng.random() < p_alloc else 0
                bw.put(c0, ba_bits)
                ba[2 * i] = T.L12_BITALLOC_CODES[tab_off + c0]
                if i < stereo_bands:
                    c1 = int(rng.integers(0, ncodes)) if rng.random() < p_alloc else 0
                    bw.put(c1, ba_bits)
                    ba[2 * i + 1] = T.L12_BITALLOC_CODES[tab_off + c1]
                else:
                    ba[2 * i + 1] = ba[2 * i] if stereo_bands else 0
            # scfcod + scalefactors
            scfcod = np.zeros(64, dtype=int)
            for i in range(2 * total_bands):
                if ba[i]:
                    scfcod[i] = 2 if layer == 1 else int(rng.integers(0, 3))
                    if layer != 1:
                        bw.put(scfcod[i], 2)
                else:
                    scfcod[i] = 6
            for i in range(2 * total_bands):
                if ba[i]:
                    mask = 4 + ((19 >> scfcod[i]) & 3)
                    for m in (4, 2, 1):
                        if mask & m:
                            bw.put(int(rng.integers(0, 63)), 6)
            # samples
            group_size = 1 if layer == 1 else 3
            for _g in range(3):
                for j in range(4):
                    for i in range(2 * total_bands):
                        b = int(ba[i])
                        if not b:
                            continue
                        if b < 17:
                            for _ in range(group_size):
                                bw.put(int(rng.integers(0, 1 << b)), b)
                        else:
                            mod = (2 << (b - 17)) + 1
                            nb = mod + 2 - (mod >> 3)
                            code = 0
                            for g_i in range(3):
                                code += int(rng.integers(0, mod)) * mod ** g_i
                            bw.put(code, nb)
            bw.pad_to_byte()
            payload = bw.bytes()
            room = frame_bytes - 4
            if len(payload) <= room:
                break
        else:
            raise ValueError("L12 payload overflow")
        out += h + payload + bytes(room - len(payload))
    return bytes(out)


# corpus used by tests/test_mp3_golden.py and the differential fuzzer
def corpus():
    """-> list of (name, bytes)."""
    cases = [
        ("m1_mono_long", gen_l3(seed=1, mpeg=1, sr_idx=0, bitrate_idx=9,
                                mode=MODE_MONO)),
        ("m1_stereo_long", gen_l3(seed=2, mpeg=1, sr_idx=1, bitrate_idx=11,
                                  mode=0)),
        ("m1_ms_stereo", gen_l3(seed=3, mpeg=1, sr_idx=2, bitrate_idx=11,
                                mode=MODE_JOINT, mode_ext=2)),
        ("m1_blocks", gen_l3(seed=4, mpeg=1, sr_idx=0, bitrate_idx=11,
                             mode=MODE_MONO,
                             block_plan=[0, 1, 2, 3, 0, 1, 2.5, 3, 0, 1, 2, 3,
                                         2, 2, 3, 0, 1, 2.5, 2.5, 3, 0, 0, 1, 2])),
        ("m1_stereo_blocks", gen_l3(seed=5, mpeg=1, sr_idx=0, bitrate_idx=13,
                                    mode=0,
                                    block_plan=[0, 1, 2, 3, 0, 1, 2.5, 3, 0, 0, 1, 2,
                                                2, 3, 0, 1, 2, 2, 3, 0, 1, 2.5, 3, 0])),
        ("m1_escapes", gen_l3(seed=6, mpeg=1, sr_idx=0, bitrate_idx=12,
                              mode=MODE_MONO, want_escape=True, density=0.5)),
        ("m1_reservoir", gen_l3(seed=7, mpeg=1, sr_idx=0, bitrate_idx=11,
                                mode=MODE_MONO, use_reservoir=True)),
        ("m1_scfsi", gen_l3(seed=8, mpeg=1, sr_idx=0, bitrate_idx=10,
                            mode=MODE_MONO, use_scfsi=True)),
        ("m1_crc_padding", gen_l3(seed=9, mpeg=1, sr_idx=0, bitrate_idx=10,
                                  mode=MODE_MONO, crc=True,
                                  padding_frames=(1, 3, 5))),
        ("m1_dual", gen_l3(seed=10, mpeg=1, sr_idx=1, bitrate_idx=12, mode=2)),
        ("m2_mono", gen_l3(seed=11, mpeg=2, sr_idx=2, bitrate_idx=8,
                           mode=MODE_MONO)),
        ("m2_stereo_ms", gen_l3(seed=12, mpeg=2, sr_idx=0, bitrate_idx=8,
                                mode=MODE_JOINT, mode_ext=2)),
        ("m2_intensity", gen_l3(seed=13, mpeg=2, sr_idx=1, bitrate_idx=8,
                                mode=MODE_JOINT, mode_ext=1)),
        ("m2_blocks", gen_l3(seed=14, mpeg=2, sr_idx=2, bitrate_idx=8,
                             mode=MODE_MONO,
                             block_plan=[0, 1, 2, 3, 0, 1, 2.5, 3, 0, 0, 1, 2])),
        ("m25_mono", gen_l3(seed=15, mpeg=25, sr_idx=2, bitrate_idx=5,
                            mode=MODE_MONO)),
        ("m1_id3", gen_l3(seed=16, mpeg=1, sr_idx=0, bitrate_idx=9,
                          mode=MODE_MONO, id3=True, n_frames=6)),
        ("l2_mono", gen_l12(seed=17, layer=2, mpeg=1, sr_idx=0, bitrate_idx=12,
                            mode=MODE_MONO)),
        ("l2_stereo", gen_l12(seed=18, layer=2, mpeg=1, sr_idx=1,
                              bitrate_idx=13, mode=0)),
        ("l2_joint", gen_l12(seed=19, layer=2, mpeg=1, sr_idx=0, bitrate_idx=13,
                             mode=MODE_JOINT, mode_ext=1)),
        ("l2_m2", gen_l12(seed=20, layer=2, mpeg=2, sr_idx=1, bitrate_idx=7,
                          mode=MODE_MONO)),
        ("l2_lowrate", gen_l12(seed=21, layer=2, mpeg=1, sr_idx=2,
                               bitrate_idx=3, mode=MODE_MONO)),
        ("l1_mono", gen_l12(seed=22, layer=1, mpeg=1, sr_idx=0, bitrate_idx=12,
                            mode=MODE_MONO)),
        ("l1_stereo", gen_l12(seed=23, layer=1, mpeg=1, sr_idx=1,
                              bitrate_idx=13, mode=0)),
    ]
    return cases


if __name__ == "__main__":
    import sys
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/mp3gen"
    import os
    os.makedirs(outdir, exist_ok=True)
    for name, data in corpus():
        with open(os.path.join(outdir, name + ".mp3"), "wb") as f:
            f.write(data)
        print(name, len(data))
