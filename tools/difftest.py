#!/usr/bin/env python3
"""Differential fuzzer: random audio x random flag combos, reference
whisper-cli vs our CLI, segment-exact comparison.

Requires a built reference binary (cmake -DGGML_NATIVE=OFF
-DGGML_OPENMP=OFF from /root/reference) — this is a development tool,
not a CI test; the stable cross-implementation behaviors it explores are
pinned as static goldens in tests/golden/ once found interesting.

Usage:
    python tools/difftest.py /path/to/whisper-cli [n_cases] [seed]

Every case prints PASS/DIFF; DIFFs dump both segment lists.  Flags are
drawn only from the deterministic subset (greedy t=0, -nf): beam and
the fallback ladder sample multinomially, which is implementation-
defined (libstdc++ discrete_distribution vs JAX PRNG) and can never
match across implementations.

Known benign DIFF classes:
- greedy near-ties: random weights produce an almost-flat distribution
  over 51k tokens, so two candidates can sit within ~1e-7 probability of
  each other and the argmax flips on f32 GEMM rounding (ggml vs XLA).
  Signature: a single token id differs at one position with BOTH sides'
  top-p within ~2% of each other, identical timestamps, and the suffix
  re-converges.  Tagged "(near-tie?)".
- lossy-rounding: mp3/ogg cases decode through two independent codec
  implementations that agree only within 1-2 s16 LSB (their f32
  pow/IMDCT vs our f64) — on random weights' near-flat logits those
  sub-LSB PCM deltas can flip a token and reshape segmentation.  When a
  lossy-container case diverges, the PCM itself is re-checked against
  the reference's compiled decode stack; within the documented LSB
  envelope the case is tagged "(lossy-rounding)" and is not actionable
  (real weights have logit margins orders of magnitude wider).  PCM
  disagreement beyond the envelope stays a structural failure.

Only structural divergence (timestamps, segmentation, non-reconverging
tokens, PCM past the envelope) is actionable.
"""

import json
import os
import pathlib
import random
import subprocess
import sys
import tempfile
import wave

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "tests"))


def write_wav(path, pcm_f32, rate=16000):
    pcm16 = (np.clip(pcm_f32, -1, 1) * 32767).astype("<i2")
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(pcm16.tobytes())


def write_flac(path, pcm_f32):
    """Same s16 samples as write_wav, FLAC container: the reference decodes
    it with vendored dr_flac, we decode with the from-scratch decoder —
    lossless on both sides, so segments must match the wav-container run."""
    from tools.flacgen import encode_flac
    pcm16 = (np.clip(pcm_f32, -1, 1) * 32767).astype(np.int64)
    path.write_bytes(encode_flac(pcm16, 16000, bits=16))


def run_ref(cli, model, wav, out, flags):
    subprocess.run([cli, "-m", str(model), "-f", str(wav), "-nf",
                    "-bs", "1", "-bo", "1", "-ojf", "-of", str(out),
                    *flags],
                   check=True, capture_output=True, timeout=600)
    return json.load(open(f"{out}.json"))["transcription"]


def run_ours(model, wav, out, flags):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    # each case is a fresh CLI process: persist jit compiles across cases
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/wtpu_difftest_jaxcache")
    subprocess.run([sys.executable, "-m", "whisper_tpu.cli",
                    "-m", str(model), "-f", str(wav), "-nf",
                    "-bs", "1", "-bo", "1", "-ojf", "-of", str(out),
                    *flags],
                   check=True, capture_output=True, timeout=1200, env=env,
                   cwd=str(ROOT))
    return json.load(open(f"{out}.json"))["transcription"]


FLAG_POOL = [
    lambda r: ["-ml", str(r.choice([1, 8, 16, 30]))],
    lambda r: ["-sow", "-ml", str(r.choice([5, 12]))],
    lambda r: ["-mc", str(r.choice([0, 4, 16]))],
    lambda r: ["-ot", str(r.choice([500, 3000]))],
    lambda r: ["-d", str(r.choice([4000, 12000]))],
    lambda r: ["-sns"],
    lambda r: ["--suppress-regex", r.choice([" the", " a.*", "[A-Z].*"])],
    lambda r: ["-nt"],
    lambda r: ["-tr", "-l", "de"],            # multilingual model only
    lambda r: ["--prompt", r.choice(["hello world", "Zürich 42nd naïve"])],
]


def _near_tie_only(ref, ours):
    """True when the two runs differ only by token ids at matching
    positions whose top probabilities sit within 2% of each other, with
    identical segment timestamps — the benign f32 argmax-flip class."""
    if len(ref) != len(ours):
        return False
    saw_flip = False
    for sa, sb in zip(ref, ours):
        if sa["offsets"] != sb["offsets"]:
            return False
        ta, tb = sa.get("tokens", []), sb.get("tokens", [])
        if len(ta) != len(tb):
            return False
        for x, y in zip(ta, tb):
            if x["id"] == y["id"]:
                continue
            pa, pb = x.get("p", 0.0), y.get("p", 0.0)
            if pa <= 0 or pb <= 0 or abs(pa - pb) / max(pa, pb) > 0.02:
                return False
            saw_flip = True
    return saw_flip


def _lossy_pcm_parity(path: pathlib.Path) -> bool:
    """Decode a lossy-container file with our codec and the reference's own
    compiled decode stack (miniaudio + dr_mp3/stb_vorbis); True when they
    agree within 2 s16 LSB — the documented rounding envelope
    (tests/test_mp3_golden.py, tests/test_vorbis_golden.py)."""
    import test_vorbis_golden as tvg  # its harness decodes mp3+ogg+flac

    exe = tvg._build_harness()
    if exe is None:
        return False
    try:
        r = subprocess.run([str(exe), str(path)], capture_output=True,
                           timeout=300)
    except subprocess.SubprocessError:
        return False
    if r.returncode != 0:
        return False
    meta = dict(kv.split("=") for kv in r.stderr.decode().split())
    ref = np.frombuffer(r.stdout, np.float32).reshape(-1, int(meta["ch"]))
    blob = path.read_bytes()
    if path.suffix == ".ogg":
        from whisper_tpu.audio.vorbis import decode_ogg_vorbis
        mine, rate = decode_ogg_vorbis(blob)
    else:
        from whisper_tpu.audio.mp3 import decode_mp3
        mine, rate = decode_mp3(blob)
    if rate != int(meta["rate"]) or mine.shape != ref.shape:
        return False
    d = np.abs(np.round(mine.astype(np.float64) * 32768.0)
               - np.round(ref.astype(np.float64) * 32768.0))
    return bool(d.max() <= 2)


def segments_equal(a, b):
    if len(a) != len(b):
        return False
    for sa, sb in zip(a, b):
        if (sa["text"] != sb["text"]
                or sa["offsets"] != sb["offsets"]):
            return False
        ta = [t["id"] for t in sa.get("tokens", [])]
        tb = [t["id"] for t in sb.get("tokens", [])]
        if ta != tb:
            return False
    return True


def run_difftest(cli, n_cases: int = 20, seed: int = 0) -> dict:
    """Importable entry (tests/test_difftest.py wraps this as a seeded
    -m slow suite member).  Returns counters, separating the benign
    near-tie argmax-flip class from actionable structural divergence."""
    rng = random.Random(seed)

    from conftest import make_random_model

    tmp = pathlib.Path(tempfile.mkdtemp(prefix="wtpu_difftest_"))
    model_en = make_random_model(tmp, seed=7, ftype=1)
    ml_dir = tmp / "ml"
    ml_dir.mkdir()
    model_ml = make_random_model(ml_dir, seed=7, ftype=1, n_vocab=51865)

    n_diff = n_near_tie = n_lossy = n_error = 0
    for case in range(n_cases):
        arng = np.random.RandomState(seed * 1000 + case)
        secs = rng.choice([2, 8, 15, 35])
        amp = rng.choice([0.02, 0.1, 0.3])
        pcm = arng.randn(16000 * secs) * amp
        if rng.random() < 0.3:   # silent tail
            pcm[-16000:] = 0.0
        container = rng.random()
        if container < 0.18:     # FLAC container: dr_flac vs our decoder
            wav = tmp / f"case{case}.flac"
            write_flac(wav, pcm)
        elif container < 0.32:   # OGG container: stb_vorbis vs our decoder.
            # vorbisgen streams are spec-valid random spectra — both CLIs
            # decode the SAME file (within 2 s16 LSB of each other), so the
            # audio content comes from the stream, not pcm.
            from tools.vorbisgen import gen_stream
            wav = tmp / f"case{case}.ogg"
            wav.write_bytes(gen_stream(seed * 1000 + case, secs))
        elif container < 0.5:    # MP3 container: dr_mp3 vs our decoder.
            # mp3gen streams are spec-valid random spectra at 16 kHz — both
            # CLIs decode the SAME lossy file (within 1 s16 LSB of each
            # other), so the audio content comes from the stream, not pcm.
            from tools.mp3gen import gen_l3
            wav = tmp / f"case{case}.mp3"
            plan = None
            if rng.random() < 0.5:
                # valid window-sequence random walk
                nxt = {0: (0, 0, 1), 1: (2, 2.5), 2: (2, 3), 2.5: (2, 3),
                       3: (0, 0, 1)}
                plan = [0]
                for _ in range(31):
                    plan.append(rng.choice(nxt[plan[-1]]))
            wav.write_bytes(gen_l3(
                seed=seed * 1000 + case, n_frames=int(secs * 1000 / 36),
                mpeg=2, sr_idx=2, bitrate_idx=rng.choice([6, 8, 10]),
                mode=3, use_reservoir=rng.random() < 0.5, block_plan=plan))
        elif container < 0.62:
            # non-16k wav: exercises the miniaudio-equivalent resampler
            # (audio/resample.py) against the reference's resample path
            rate = rng.choice([44100, 48000, 22050, 8000])
            n = int(rate * secs)
            pcm_r = arng.randn(n) * amp
            wav = tmp / f"case{case}.wav"
            write_wav(wav, pcm_r, rate=rate)
        else:
            wav = tmp / f"case{case}.wav"
            write_wav(wav, pcm)

        n_flags = rng.choice([0, 1, 1, 2])
        flags = []
        for f in rng.sample(FLAG_POOL, n_flags):
            flags += f(rng)
        model = model_ml if "-tr" in flags else model_en

        try:
            ref = run_ref(cli, model, wav, tmp / f"r{case}", flags)
            ours = run_ours(model, wav, tmp / f"o{case}", flags)
        except subprocess.CalledProcessError as e:
            print(f"case {case:3d} ERROR flags={flags}: "
                  f"{e.stderr.decode()[-200:]}")
            n_error += 1
            continue
        if segments_equal(ref, ours):
            print(f"case {case:3d} PASS  ({secs}s amp={amp} "
                  f"{wav.suffix} flags={flags})")
        else:
            benign = _near_tie_only(ref, ours)
            lossy = (not benign and wav.suffix in (".mp3", ".ogg")
                     and _lossy_pcm_parity(wav))
            if benign:
                n_near_tie += 1
                tag = " (near-tie?)"
            elif lossy:
                n_lossy += 1
                tag = " (lossy-rounding)"
            else:
                n_diff += 1
                tag = ""
            print(f"case {case:3d} DIFF{tag}  "
                  f"({secs}s amp={amp} {wav.suffix} flags={flags})")
            print("  ref :", [(s['offsets']['from'], s['offsets']['to'],
                               s['text']) for s in ref])
            print("  ours:", [(s['offsets']['from'], s['offsets']['to'],
                               s['text']) for s in ours])
    print(f"{n_cases - n_diff - n_near_tie - n_lossy - n_error}/{n_cases} "
          f"identical, {n_near_tie} benign near-ties, "
          f"{n_lossy} lossy-rounding, {n_diff} structural diffs, "
          f"{n_error} errors")
    return {"n_cases": n_cases, "n_diff": n_diff, "n_near_tie": n_near_tie,
            "n_lossy": n_lossy, "n_error": n_error}


def main():
    r = run_difftest(sys.argv[1],
                     int(sys.argv[2]) if len(sys.argv) > 2 else 20,
                     int(sys.argv[3]) if len(sys.argv) > 3 else 0)
    return 1 if (r["n_diff"] or r["n_error"]) else 0


if __name__ == "__main__":
    sys.exit(main())
