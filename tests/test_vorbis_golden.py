"""Ogg Vorbis decoder goldens: the framework's from-scratch decoder vs the
reference's own vendored stb_vorbis.

Pinning layers:
  1. reference golden — a spec-covering generated corpus (tools/vorbisgen.py:
     ordered/unordered/sparse codebooks, VQ lookup types 1/2, floor 1 with
     multiple classes / transparent subclass slots / every multiplier quirk,
     residue types 0/1/2, channel coupling, submap muxing, long/short window
     transitions, continued ogg packets, granule-trimmed final frames)
     decoded by BOTH the framework decoder and the reference's decode stack
     (stb_vorbis enabled inside miniaudio, exactly as
     examples/common-whisper.cpp:11-27 compiles it), built unmodified from
     the reference tree.  Outputs must agree within 2 s16 LSB everywhere and
     be >=95% exactly equal (stb computes its IMDCT in f32; this decoder
     computes it in f64, so rounding-boundary samples may differ by a step).
  2. structural unit pins — IMDCT against the O(n^2) spec definition,
     codeword assignment against the spec's worked example, ogg CRC/paging
     round-trip, granule truncation, pull-mode zero-frame termination.
  3. loader integration (mono downmix + resample contract).
"""

import os
import subprocess
import sys
import tempfile

import numpy as np
import pytest

from whisper_tpu.audio.ogg import (build_page, crc32_ogg, is_ogg,
                                   iter_packets, pack_pages)
from whisper_tpu.audio.vorbis import (VorbisError, assign_codewords,
                                      decode_ogg_vorbis, ilog, imdct,
                                      is_ogg_vorbis)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from tools import vorbisgen  # noqa: E402

_HARNESS_DIR = "/tmp/wtpu_vorbis_harness"
_HARNESS_EXE = os.path.join(_HARNESS_DIR, "harness")

# the reference's exact vorbis decode stack: stb_vorbis enabled inside
# miniaudio the way examples/common-whisper.cpp does it (header-only include
# before, implementation after)
_HARNESS_SRC = r"""
#define STB_VORBIS_HEADER_ONLY
#include "stb_vorbis.c"
#define MA_NO_DEVICE_IO
#define MA_NO_THREADING
#define MA_NO_ENCODING
#define MA_NO_GENERATION
#define MA_NO_RESOURCE_MANAGER
#define MA_NO_NODE_GRAPH
#define MINIAUDIO_IMPLEMENTATION
#include "miniaudio.h"
#undef STB_VORBIS_HEADER_ONLY
#include "stb_vorbis.c"
#include <stdio.h>
int main(int argc, char** argv) {
    ma_decoder_config cfg = ma_decoder_config_init(ma_format_f32, 0, 0);
    ma_decoder dec;
    if (argc < 2 || ma_decoder_init_file(argv[1], &cfg, &dec) != MA_SUCCESS)
        return 1;
    fprintf(stderr, "ch=%u rate=%u\n", dec.outputChannels,
            dec.outputSampleRate);
    float buf[4096];
    for (;;) {
        ma_uint64 got = 0;
        ma_decoder_read_pcm_frames(&dec, buf, 4096 / dec.outputChannels,
                                   &got);
        if (got == 0) break;
        fwrite(buf, sizeof(float), (size_t)(got * dec.outputChannels),
               stdout);
    }
    ma_decoder_uninit(&dec);
    return 0;
}
"""


def _build_harness():
    if os.path.exists(_HARNESS_EXE):
        return _HARNESS_EXE
    ma = "/root/reference/examples/miniaudio.h"
    sv = "/root/reference/examples/stb_vorbis.c"
    if not (os.path.exists(ma) and os.path.exists(sv)):
        return None
    os.makedirs(_HARNESS_DIR, exist_ok=True)
    src = os.path.join(_HARNESS_DIR, "harness.c")
    with open(src, "w") as f:
        f.write(_HARNESS_SRC)
    try:
        subprocess.run(
            ["gcc", "-O2", "-I", os.path.dirname(ma), src, "-o", _HARNESS_EXE,
             "-lm", "-lpthread", "-ldl"],
            check=True, capture_output=True, timeout=300)
    except (subprocess.SubprocessError, OSError):
        return None
    return _HARNESS_EXE if os.path.exists(_HARNESS_EXE) else None


def _ref_decode(blob: bytes):
    exe = _build_harness()
    if exe is None:
        pytest.skip("reference miniaudio/stb_vorbis or C toolchain unavailable")
    with tempfile.NamedTemporaryFile(suffix=".ogg", delete=False) as f:
        f.write(blob)
        path = f.name
    try:
        r = subprocess.run([exe, path], capture_output=True, timeout=120)
    finally:
        os.unlink(path)
    assert r.returncode == 0, "reference stb_vorbis refused the stream"
    meta = dict(kv.split("=") for kv in r.stderr.decode().split())
    ch = int(meta["ch"])
    return (np.frombuffer(r.stdout, np.float32).reshape(-1, ch),
            int(meta["rate"]))


_CORPUS = dict(vorbisgen.corpus())


@pytest.mark.parametrize("name", sorted(_CORPUS))
def test_corpus_matches_reference(name):
    blob = _CORPUS[name]
    ref, ref_rate = _ref_decode(blob)
    mine, rate = decode_ogg_vorbis(blob)
    assert rate == ref_rate
    assert mine.shape == ref.shape, (mine.shape, ref.shape)
    if ref.size == 0:
        return
    m16 = np.round(mine.astype(np.float64) * 32768.0)
    o16 = np.round(ref.astype(np.float64) * 32768.0)
    d = np.abs(m16 - o16)
    assert d.max() <= 2, f"max s16 diff {d.max()}"
    exact = float(np.mean(d == 0))
    assert exact >= 0.95, f"only {exact:.4f} exact"
    # and the raw f32 error stays at f32-rounding scale
    rel = np.abs(mine - ref).max() / max(1.0, np.abs(ref).max())
    assert rel < 1e-5, rel


# a real libvorbis-encoded file that happens to ship in this image —
# real-world codebooks/floor configs/residues, independent of our generator
_REAL_OGG = "/opt/venv/lib/python3.12/site-packages/pygame/examples/data/house_lo.ogg"


def test_real_libvorbis_file_matches_reference():
    if not os.path.exists(_REAL_OGG):
        pytest.skip("no real-world ogg sample in this image")
    blob = open(_REAL_OGG, "rb").read()
    ref, ref_rate = _ref_decode(blob)
    mine, rate = decode_ogg_vorbis(blob)
    assert rate == ref_rate
    assert mine.shape == ref.shape
    d = np.abs(np.round(mine.astype(np.float64) * 32768.0)
               - np.round(ref.astype(np.float64) * 32768.0))
    assert d.max() <= 1
    assert float(np.mean(d == 0)) >= 0.99


# ---------------------------------------------------------------------------
# structural pins


def test_imdct_matches_spec_definition():
    rng = np.random.RandomState(0)
    for n in (64, 256, 2048):
        x = rng.randn(n // 2)
        i = np.arange(n)[:, None]
        k = np.arange(n // 2)[None, :]
        naive = (x[None, :]
                 * np.cos(2 * np.pi / n * (i + 0.5 + n / 4) * (k + 0.5))).sum(1)
        assert np.abs(imdct(x) - naive).max() < 1e-9 * n


def test_codeword_assignment_spec_example():
    """The worked example from Vorbis I spec 3.2.1."""
    codes = assign_codewords([2, 4, 4, 4, 4, 2, 3, 3])
    got = [format(c, f"0{ln}b") for c, ln in codes]
    assert got == ["00", "0100", "0101", "0110", "0111", "10", "110", "111"]


def test_codeword_assignment_overspecified():
    with pytest.raises(VorbisError):
        assign_codewords([1, 1, 1])


def test_ilog():
    assert [ilog(x) for x in (0, 1, 2, 3, 4, 7, 255, 256)] == \
        [0, 1, 2, 2, 3, 3, 8, 9]


def test_ogg_crc_and_paging_roundtrip():
    payloads = [(b"\x01vorbis" + b"x" * 100, 0),
                (b"\x03vorbis" + b"y" * 700, 0),   # forces lacing-255 chain
                (b"\x05vorbis" + b"z" * 40, 0),
                (b"packet", 1234)]
    blob = pack_pages(payloads, max_segs_per_page=2)
    assert is_ogg(blob)
    out = list(iter_packets(blob))
    assert [p for p, _ in out] == [p for p, _ in payloads]
    assert out[-1][1].granule == 1234
    assert out[-1][1].page_is_last
    # CRC detects corruption when verification is requested; the default
    # read path matches stb_vorbis (reads and discards the CRC field)
    bad = bytearray(blob)
    bad[40] ^= 0xFF
    with pytest.raises(Exception):
        list(iter_packets(bytes(bad), verify_crc=True))


def test_orphan_continuation_resync():
    """A continuation whose starting page was lost must be discarded up to
    the next packet boundary (stb's resync), not yielded as a bogus packet."""
    big = bytes(range(256)) * 3          # 768 bytes -> lacing 255,255,255,3
    tail = b"next-packet"
    blob = pack_pages([(big, 0), (tail, 7)], max_segs_per_page=1,
                      flush_after=(), bos_first=False)
    # locate page boundaries and drop the FIRST page (the packet's start)
    offs = []
    off = 0
    while off < len(blob):
        nsegs = blob[off + 26]
        offs.append(off)
        off += 27 + nsegs + sum(blob[off + 27:off + 27 + nsegs])
    dropped = blob[offs[1]:]
    got = [p for p, _ in iter_packets(dropped)]
    assert got == [tail]                 # orphan middle+end pages skipped
    # orphan terminating mid-page with another packet on the SAME page:
    # page0 = start of a 300-byte packet, page1 = its 45-byte tail + `tail`
    p0 = build_page([bytes(255)], granule=(1 << 64) - 1, serial=1, seq=0)
    p1 = build_page([bytes(45), tail], granule=9, serial=1, seq=1,
                    continued=True)
    got3 = [p for p, _ in iter_packets(p1)]   # p0 lost
    assert got3 == [tail]
    assert [p for p, _ in iter_packets(p0 + p1)] == [bytes(300), tail]


def test_crc32_vector():
    # independently computed MSB-first CRC-32/04C11DB7 with zero init/xorout
    assert crc32_ogg(b"123456789") == 0x89A1897F


def test_granule_trim():
    pcm, _ = decode_ogg_vorbis(_CORPUS["trimmed_end"])
    # 9 blocks of 256 -> 8 emitted frames of 128, minus the 57-sample trim
    assert pcm.shape[0] == 8 * 128 - 57


def test_discard_swallows_stream():
    """First-frame discard covering a whole frame = pull-mode end-of-stream
    (mirrors the reference's file decode path; see vorbis.py docstring)."""
    pcm, _ = decode_ogg_vorbis(_CORPUS["discard_swallow"])
    assert pcm.shape[0] == 0


def test_is_ogg_vorbis_detection():
    assert is_ogg_vorbis(_CORPUS["mono_short"])
    assert not is_ogg_vorbis(b"RIFF" + b"\x00" * 64)
    assert not is_ogg_vorbis(b"OggS" + b"\x00" * 64)


def test_rejects_garbage():
    with pytest.raises(VorbisError):
        decode_ogg_vorbis(b"not an ogg stream at all")


# ---------------------------------------------------------------------------
# loader integration


def test_loader_integration(tmp_path):
    from whisper_tpu.audio.io import load_audio

    path = tmp_path / "sample.ogg"
    path.write_bytes(_CORPUS["stereo_coupled"])
    mono, st = load_audio(str(path), stereo=True)
    raw, rate = decode_ogg_vorbis(_CORPUS["stereo_coupled"])
    assert mono.ndim == 1 and mono.dtype == np.float32
    assert st.shape[1] == 2
    # 44.1k -> 16k resample shrinks by rate ratio
    assert abs(mono.shape[0] - raw.shape[0] * 16000 / rate) <= 2


def test_loader_mislabeled_extension(tmp_path):
    from whisper_tpu.audio.io import load_audio

    path = tmp_path / "actually_vorbis.wav"
    path.write_bytes(_CORPUS["mono_short"])
    mono, _ = load_audio(str(path))
    assert mono.shape[0] > 0


def test_loader_vorbis_named_mp3(tmp_path):
    """Container magic must win over the extension: a vorbis file named .mp3
    (common in scraped datasets) reaches the vorbis decoder, not load_mpeg."""
    from whisper_tpu.audio.io import load_audio

    path = tmp_path / "scraped.mp3"
    path.write_bytes(_CORPUS["mono_short"])
    mono, _ = load_audio(str(path))
    assert mono.shape[0] > 0


def test_loader_tolerates_stale_page_crc(tmp_path):
    """stb_vorbis reads and discards page CRCs (stb_vorbis.c:1465); files
    with stale CRCs (re-muxed streams, stream rips) must still decode."""
    from whisper_tpu.audio.io import load_audio

    blob = bytearray(_CORPUS["mono_short"])
    # corrupt the CRC field of the LAST page (payload untouched)
    offs, off = [], 0
    while off < len(blob) and blob[off:off + 4] == b"OggS":
        nsegs = blob[off + 26]
        offs.append(off)
        off += 27 + nsegs + sum(blob[off + 27:off + 27 + nsegs])
    blob[offs[-1] + 22] ^= 0xFF
    path = tmp_path / "stale_crc.ogg"
    path.write_bytes(bytes(blob))
    mono, _ = load_audio(str(path))
    clean, rate = decode_ogg_vorbis(_CORPUS["mono_short"])
    assert mono.shape[0] > 0
    np.testing.assert_array_equal(
        mono, load_audio(str(tmp_path / "stale_crc.ogg"))[0])
    # and byte-identical to the clean file's load
    path2 = tmp_path / "clean.ogg"
    path2.write_bytes(_CORPUS["mono_short"])
    np.testing.assert_array_equal(mono, load_audio(str(path2))[0])
