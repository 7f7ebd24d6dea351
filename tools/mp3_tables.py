#!/usr/bin/env python3
"""Regenerate `whisper_tpu/audio/_mp3_tables.py` (canonical MP3 constants).

Every table emitted here is ISO/IEC 11172-3 / 13818-3 constant data (Annex B
tables): huffman codebooks, scalefactor-band widths, LSF scalefactor
partitions, the synthesis-window prototype.  The numbers are extracted
mechanically from the reference's vendored decoder tables
(reference: examples/miniaudio.h, the dr_mp3/minimp3 section) because the
spec tables themselves are not redistributable here — constants only; all
decode *code* in whisper_tpu.audio.mp3 is an independent textbook
implementation (see its module docstring).

Huffman tables are stored by the reference in a compact multi-level-lookup
byte format; this tool walks that structure and emits plain canonical
``(codeword, length, x, y)`` lists, validating that every table forms a
complete prefix code (Kraft equality) on the way out.

The 512-tap synthesis window D (ISO 11172-3 Table 3-B.3, stored as
D*65536 integers) was recovered once by probing the reference's synthesis
filterbank with subband impulses and solving the textbook parametrization

    pcm_t[j] = sum_{a=0}^{15} D[j+32a] * V_{t-a}[j if a even else 32+j],
    V[i]     = sum_k cos((16+i)(2k+1)pi/64) S[k]

for D by per-coefficient least squares (fit residual < 1e-6, snap-to-integer
error < 0.006).  Taps multiplying V[16] (identically zero) are unobservable
and stored as 0.  Run with --redump-window pointing at a .npy produced by
the derivation probe to refresh it; otherwise the committed values are kept.
"""

from __future__ import annotations

import os
import re
import sys

REF_MA = "/root/reference/examples/miniaudio.h"
OUT = os.path.join(os.path.dirname(__file__), "..", "whisper_tpu", "audio", "_mp3_tables.py")


def _parse_array(text: str, name: str) -> list[int]:
    m = re.search(re.escape(name) + r"\s*(?:\[[^\]]*\])+\s*=\s*\{(.*?)\};", text, re.S)
    if not m:
        raise SystemExit(f"array {name} not found")
    body = re.sub(r"/\*.*?\*/", "", m.group(1))
    return [int(tok) for tok in re.findall(r"-?\d+", body)]


def _parse_array_2d(text: str, name: str) -> list[list[int]]:
    """Parse a 2-D initializer row-aware: C zero-pads rows whose initializer
    is shorter than the declared column count (the mixed scalefactor-band
    rows rely on this), so a flat number scan would misalign the rows."""
    m = re.search(re.escape(name) + r"\s*\[\s*(\d+)\s*\]\s*\[\s*(\d+)\s*\]\s*=\s*\{(.*?)\};",
                  text, re.S)
    if not m:
        raise SystemExit(f"2-D array {name} not found")
    n_rows, n_cols = int(m.group(1)), int(m.group(2))
    body = re.sub(r"/\*.*?\*/", "", m.group(3))
    rows = []
    for rm in re.finditer(r"\{([^{}]*)\}", body):
        vals = [int(tok) for tok in re.findall(r"-?\d+", rm.group(1))]
        assert len(vals) <= n_cols, (name, len(vals))
        rows.append(vals + [0] * (n_cols - len(vals)))
    assert len(rows) == n_rows, (name, len(rows))
    return rows


def _walk_bigvalue(codebook: list[int], base: int, width: int, prefix: str, out: dict):
    """Enumerate the reference's chunked-lookup huffman structure into
    canonical (code, length, x, y), deduping the short-code replicas."""
    for v in range(1 << width):
        bits = format(v, f"0{width}b")
        leaf = codebook[base + v]
        if leaf < 0:
            _walk_bigvalue(codebook, -(leaf >> 3), leaf & 7, prefix + bits, out)
        else:
            used = leaf >> 8          # bits consumed from this chunk
            assert used <= width, (used, width)
            code = prefix + bits[:used]
            # first-emitted value (ISO "x") is the LOW nibble
            x, y = leaf & 15, (leaf >> 4) & 15
            prev = out.get(code)
            if prev is None:
                out[code] = (x, y)
            else:
                assert prev == (x, y), f"inconsistent leaf at {code}"


def _walk_count1(cb: list[int]) -> dict:
    out = {}
    for v in range(16):
        bits = format(v, "04b")
        leaf = cb[v]
        if leaf & 8:
            used = leaf & 7
            code = bits[:used]
            flags = (leaf >> 4) & 15
        else:
            w = leaf & 3
            base = leaf >> 3
            for v2 in range(1 << w):
                leaf2 = cb[base + v2]
                used = leaf2 & 7
                assert leaf2 & 8 or used >= 4, leaf2
                code = (bits + format(v2, f"0{w}b"))[:used]
                flags = (leaf2 >> 4) & 15
                prev = out.get(code)
                if prev is None:
                    out[code] = flags
                else:
                    assert prev == flags
            continue
        prev = out.get(code)
        if prev is None:
            out[code] = flags
        else:
            assert prev == flags
    return out


def _kraft_check(codes, what: str):
    total = sum(2.0 ** -len(c) for c in codes)
    assert abs(total - 1.0) < 1e-12, f"{what}: incomplete prefix code (kraft={total})"
    ordered = sorted(codes)
    for a, b in zip(ordered, ordered[1:]):
        assert not b.startswith(a), f"{what}: {a} prefixes {b}"


def main() -> None:
    with open(REF_MA, "r", errors="replace") as f:
        text = f.read()
    # restrict to the dr_mp3 section to avoid name collisions
    text = text[text.index("/* dr_mp3_h begin */"):]

    tabs = _parse_array(text, "tabs")
    tab32 = _parse_array(text, "tab32")
    tab33 = _parse_array(text, "tab33")
    tabindex = _parse_array(text, "tabindex")
    linbits = _parse_array(text, "g_linbits")
    scf_long = [v for row in _parse_array_2d(text, "g_scf_long") for v in row]
    scf_short = [v for row in _parse_array_2d(text, "g_scf_short") for v in row]
    scf_mixed = [v for row in _parse_array_2d(text, "g_scf_mixed") for v in row]
    scf_partitions = [v for row in _parse_array_2d(text, "g_scf_partitions") for v in row]
    scfc_decode = _parse_array(text, "g_scfc_decode")
    lsf_mod = _parse_array(text, "g_mod")
    preamp = _parse_array(text, "g_preamp")
    bitalloc_code_tab = _parse_array(text, "g_bitalloc_code_tab")
    alloc_l1 = _parse_array(text, "g_alloc_L1")
    alloc_l2m2 = _parse_array(text, "g_alloc_L2M2")
    alloc_l2m1 = _parse_array(text, "g_alloc_L2M1")
    alloc_l2m1_low = _parse_array(text, "g_alloc_L2M1_lowrate")

    assert len(tabindex) == 32 and len(linbits) == 32

    huff = {}
    for t in range(1, 32):
        if t in (4, 14):      # ISO tables 4 and 14 do not exist
            continue
        out: dict = {}
        _walk_bigvalue(tabs[tabindex[t]:], 0, 5, "", out)
        _kraft_check(out.keys(), f"table {t}")
        entries = sorted(
            ((int(c, 2), len(c), x, y) for c, (x, y) in out.items()),
            key=lambda e: (e[1], e[0]))
        # max value must fit the table's declared range
        huff[t] = entries

    c1a = _walk_count1(tab32)
    c1b = _walk_count1(tab33)
    _kraft_check(c1a.keys(), "count1 A")
    _kraft_check(c1b.keys(), "count1 B")
    count1 = [
        sorted(((int(c, 2), len(c), f) for c, f in d.items()), key=lambda e: (e[1], e[0]))
        for d in (c1a, c1b)
    ]

    # keep the committed window unless asked to refresh it
    window = None
    if "--redump-window" in sys.argv:
        import numpy as np
        window = np.load(sys.argv[sys.argv.index("--redump-window") + 1]).tolist()
    else:
        try:
            sys.path.insert(0, os.path.dirname(OUT))
            import _mp3_tables as cur  # type: ignore
            window = list(cur.SYNTH_WINDOW_D65536)
        except Exception:
            raise SystemExit("no committed window; pass --redump-window D512.npy")
    assert len(window) == 512

    def fmt(rows, per=16):
        lines = []
        for i in range(0, len(rows), per):
            lines.append("    " + ",".join(str(v) for v in rows[i:i + per]) + ",")
        return "\n".join(lines)

    with open(os.path.abspath(OUT), "w") as f:
        f.write('"""GENERATED by tools/mp3_tables.py — do not edit.\n\n'
                "Canonical ISO/IEC 11172-3 / 13818-3 MP3 constant tables (Annex B),\n"
                "extracted from the reference decoder's compact representations and\n"
                "re-expressed in plain canonical form.  See the tool's docstring for\n"
                "provenance and validation.\n"
                '"""\n\n')
        f.write("# Huffman tables 1..31 (4/14 absent): {table: [(code, length, x, y), ...]}\n")
        f.write("HUFF_TABLES = {\n")
        for t, entries in huff.items():
            f.write(f"  {t}: [\n")
            for i in range(0, len(entries), 6):
                f.write("    " + "".join(f"{e}," for e in entries[i:i + 6]) + "\n")
            f.write("  ],\n")
        f.write("}\n\n")
        f.write("# count1 quad tables [A, B]: [(code, length, vwxy_flags), ...]\n")
        f.write("COUNT1_TABLES = [\n")
        for d in count1:
            f.write("  [" + ",".join(str(e) for e in d) + "],\n")
        f.write("]\n\n")
        f.write(f"LINBITS = {linbits}\n\n")
        f.write("# scalefactor-band widths, rows indexed by merged samplerate index\n"
                "# (0:11025/12000, 1:8000, 2:22050, 3:24000, 4:16000, 5:44100, 6:48000, 7:32000)\n")
        f.write("SFB_LONG = [\n" + "".join(f"  {scf_long[i*23:(i+1)*23]},\n" for i in range(8)) + "]\n\n")
        f.write("SFB_SHORT = [\n" + "".join(f"  {scf_short[i*40:(i+1)*40]},\n" for i in range(8)) + "]\n\n")
        f.write("SFB_MIXED = [\n" + "".join(f"  {scf_mixed[i*40:(i+1)*40]},\n" for i in range(8)) + "]\n\n")
        f.write("# LSF scalefactor partition counts (3 groups x 28) + compress decode aids\n")
        f.write("SCF_PARTITIONS = [\n" + "".join(f"  {scf_partitions[i*28:(i+1)*28]},\n" for i in range(3)) + "]\n\n")
        f.write("# repacked compress-decode aids: used only by the corpus ENCODER\n"
                "# (tools/mp3gen.py); the decoder derives slens from Table B.8 itself\n")
        f.write(f"SCFC_DECODE = {scfc_decode}\n\n")
        f.write(f"LSF_MOD = {lsf_mod}\n\n")
        f.write(f"PREAMP = {preamp}\n\n")
        f.write("# Layer I/II bit-allocation code tables + per-mode subband allocation\n")
        f.write(f"L12_BITALLOC_CODES = {bitalloc_code_tab}\n\n")
        f.write("# (tab_offset, code_bits, band_count) runs\n")
        f.write(f"L12_ALLOC_L1 = {[tuple(alloc_l1[i:i+3]) for i in range(0, len(alloc_l1), 3)]}\n")
        f.write(f"L12_ALLOC_L2M2 = {[tuple(alloc_l2m2[i:i+3]) for i in range(0, len(alloc_l2m2), 3)]}\n")
        f.write(f"L12_ALLOC_L2M1 = {[tuple(alloc_l2m1[i:i+3]) for i in range(0, len(alloc_l2m1), 3)]}\n")
        f.write(f"L12_ALLOC_L2M1_LOW = {[tuple(alloc_l2m1_low[i:i+3]) for i in range(0, len(alloc_l2m1_low), 3)]}\n\n")
        f.write("# ISO 11172-3 Table 3-B.3 synthesis window, stored as D*65536 integers.\n"
                "# Entries multiplying the identically-zero V[16] lane are unobservable\n"
                "# in any decode and stored as 0.\n")
        f.write("SYNTH_WINDOW_D65536 = [\n" + fmt(window) + "\n]\n")
    n = sum(len(v) for v in huff.values())
    print(f"wrote {OUT}: {len(huff)} huffman tables ({n} codes), "
          f"{len(count1[0])}+{len(count1[1])} count1 codes")

    # C header for the native decoder (native/wtpu_mp3.cpp)
    hdr = os.path.join(os.path.dirname(__file__), "..", "native",
                       "wtpu_mp3_tables.h")

    def carr(vals, per=16):
        lines = []
        for i in range(0, len(vals), per):
            lines.append("    " + ",".join(str(v) for v in vals[i:i + per]) + ",")
        return "\n".join(lines)

    with open(os.path.abspath(hdr), "w") as f:
        f.write("/* GENERATED by tools/mp3_tables.py - do not edit.\n"
                " * Canonical ISO/IEC 11172-3 / 13818-3 MP3 constant tables;\n"
                " * see the tool's docstring for provenance. */\n"
                "#pragma once\n#include <stdint.h>\n\n")
        # huffman: flattened entries + per-table (offset, count)
        flat = []
        offs = [0] * 32
        cnts = [0] * 32
        for t, entries in huff.items():
            offs[t] = len(flat)
            cnts[t] = len(entries)
            flat.extend(entries)
        f.write("typedef struct { uint32_t code; uint8_t len, x, y; } wtpu_mp3_hcode;\n")
        f.write(f"static const wtpu_mp3_hcode WTPU_MP3_HUFF[{len(flat)}] = {{\n")
        for i in range(0, len(flat), 4):
            f.write("    " + "".join("{%d,%d,%d,%d}," % e for e in flat[i:i + 4]) + "\n")
        f.write("};\n")
        f.write(f"static const int WTPU_MP3_HUFF_OFF[32] = {{{','.join(map(str, offs))}}};\n")
        f.write(f"static const int WTPU_MP3_HUFF_CNT[32] = {{{','.join(map(str, cnts))}}};\n\n")
        for nm, d in (("A", count1[0]), ("B", count1[1])):
            f.write(f"static const wtpu_mp3_hcode WTPU_MP3_COUNT1_{nm}[{len(d)}] = {{"
                    + "".join("{%d,%d,%d,0}," % (c, l, fl) for c, l, fl in d)
                    + "};\n")
        f.write(f"\nstatic const uint8_t WTPU_MP3_LINBITS[32] = {{{','.join(map(str, linbits))}}};\n\n")
        f.write(f"static const uint8_t WTPU_MP3_SFB_LONG[8][23] = {{\n"
                + "".join("  {" + ",".join(map(str, scf_long[i*23:(i+1)*23])) + "},\n" for i in range(8))
                + "};\n")
        f.write(f"static const uint8_t WTPU_MP3_SFB_SHORT[8][40] = {{\n"
                + "".join("  {" + ",".join(map(str, scf_short[i*40:(i+1)*40])) + "},\n" for i in range(8))
                + "};\n")
        f.write(f"static const uint8_t WTPU_MP3_SFB_MIXED[8][40] = {{\n"
                + "".join("  {" + ",".join(map(str, scf_mixed[i*40:(i+1)*40])) + "},\n" for i in range(8))
                + "};\n\n")
        f.write(f"static const uint8_t WTPU_MP3_SCF_PART[3][28] = {{\n"
                + "".join("  {" + ",".join(map(str, scf_partitions[i*28:(i+1)*28])) + "},\n" for i in range(3))
                + "};\n")
        f.write(f"static const uint8_t WTPU_MP3_PREAMP[10] = {{{','.join(map(str, preamp))}}};\n\n")
        f.write(f"static const uint8_t WTPU_MP3_L12_BA_CODES[{len(bitalloc_code_tab)}] = "
                f"{{{','.join(map(str, bitalloc_code_tab))}}};\n")
        for nm, arr in (("L1", alloc_l1), ("L2M2", alloc_l2m2),
                        ("L2M1", alloc_l2m1), ("L2M1_LOW", alloc_l2m1_low)):
            trip = [tuple(arr[i:i + 3]) for i in range(0, len(arr), 3)]
            f.write(f"static const uint8_t WTPU_MP3_ALLOC_{nm}[{len(trip)}][3] = {{"
                    + "".join("{%d,%d,%d}," % t for t in trip) + "};\n")
        f.write("\n/* ISO 11172-3 Table 3-B.3 synthesis window, D*65536 */\n")
        f.write("static const int32_t WTPU_MP3_D65536[512] = {\n" + carr(window) + "\n};\n")
    print(f"wrote {os.path.abspath(hdr)}")


if __name__ == "__main__":
    main()
