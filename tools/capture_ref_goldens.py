#!/usr/bin/env python3
"""Capture full-pipeline goldens from the reference whisper-cli binary.

Regenerates tests/golden/ref_*.json: runs the reference binary (built
CPU-only from /root/reference: cmake -DGGML_NATIVE=OFF -DGGML_OPENMP=OFF)
over the shared seed-7 random-weight model and stores the -ojf output.
See tests/test_pipeline_golden.py for what each golden pins.

Usage: python tools/capture_ref_goldens.py /path/to/whisper-cli
"""

import json
import os
import pathlib
import shutil
import subprocess
import sys
import wave

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "tests"))

GOLDEN = ROOT / "tests" / "golden"


def write_wav(path, pcm_f32):
    pcm16 = (np.clip(pcm_f32, -1, 1) * 32767).astype("<i2")
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(pcm16.tobytes())


def run(cli, model, wav, out, extra=()):
    cmd = [cli, "-m", str(model), "-f", str(wav), "-nf", "-bs", "1",
           "-bo", "1", "-ojf", "-of", str(out), *extra]
    print("+", " ".join(cmd))
    subprocess.run(cmd, check=True, capture_output=True)
    data = json.load(open(f"{out}.json"))
    return data


def main():
    cli = sys.argv[1]
    tmp = pathlib.Path("/tmp/wtpu_goldens")
    tmp.mkdir(exist_ok=True)

    from conftest import make_random_model

    model_dir = tmp / "m"
    model_dir.mkdir(exist_ok=True)
    model = make_random_model(model_dir, seed=7, ftype=1)
    # multilingual variant (seed 7, padded vocab): pins lang/task prompt
    ml_dir = tmp / "ml"
    ml_dir.mkdir(exist_ok=True)
    model_ml = make_random_model(ml_dir, seed=7, ftype=1, n_vocab=51865)

    jfk = "/root/reference/samples/jfk.wav"

    noise40 = tmp / "noise40.wav"
    write_wav(noise40, np.random.RandomState(3).randn(16000 * 40) * 0.1)

    silence = tmp / "silence10.wav"
    write_wav(silence, np.zeros(16000 * 10))

    # DTW golden needs dims compatible with a reference -dtw preset:
    # tiny.en's alignment heads index layers<=3 / heads<=5, so 4 text
    # layers x 6 heads (d=96 keeps it small; the preset only cares about
    # indices).  n_audio_ctx=256 because the reference DTW asserts
    # n_frames <= 2*n_audio_ctx per segment span — with 3 s audio every
    # span fits (whisper.cpp:7368).
    dtw_dir = tmp / "dtw"
    dtw_dir.mkdir(exist_ok=True)
    model_dtw = make_random_model(dtw_dir, seed=7, ftype=1, d=96, heads=6,
                                  enc_layers=2, dec_layers=4,
                                  n_audio_ctx=256)
    noise3 = tmp / "noise3.wav"
    write_wav(noise3, np.random.RandomState(5).randn(16000 * 3) * 0.1)

    # offset + engine-level no_timestamps: pins the -nt decode (all ts
    # tokens suppressed in the logit chain) AND the reference's accidental
    # tid=0 emission arithmetic (whisper_sample_token inits tid to 0 and
    # with -nt no ts prob ever exceeds 0, so t0 = seek + 2*(0 - token_beg)
    # goes hugely negative — a faithful drop-in reproduces it bit-exactly)
    noise8 = tmp / "noise8.wav"
    write_wav(noise8, np.random.RandomState(3003).randn(16000 * 8) * 0.3)

    # exercises initial_prompt tokenization (unicode + contraction +
    # digits) through the real-vocab tokenizer on both sides
    prompt = "The naïve café doesn't exist on 42nd street in Zürich."

    captures = [
        ("ref_jfk_greedy", model, jfk, ()),
        ("ref_jfk_prompt", model, jfk, ("--prompt", prompt)),
        ("ref_noise40_greedy", model, noise40, ()),
        ("ref_silence_greedy", model, silence, ()),
        ("ref_jfk_maxlen", model, jfk, ("-ml", "16")),
        ("ref_noise8_offset_nt", model, noise8, ("-ot", "3000", "-nt")),
        ("ref_jfk_de_translate", model_ml, jfk, ("-l", "de", "-tr")),
        ("ref_noise3_dtw", model_dtw, noise3, ("-dtw", "tiny.en")),
    ]
    for name, m, wav, extra in captures:
        data = run(cli, m, wav, tmp / name, extra)
        with open(GOLDEN / f"{name}.json", "w") as f:
            json.dump(data, f, indent=1)
        print(f"  -> {GOLDEN / name}.json "
              f"({len(data['transcription'])} segments)")

    # writer-format goldens (tests/test_output_golden.py): byte-exact
    # txt/vtt/srt/csv/lrc files from the reference writers on jfk
    writer_caps = [
        ("ref_jfk_fmt", ["-otxt", "-ovtt", "-osrt", "-ocsv", "-olrc"],
         ("txt", "vtt", "srt", "csv", "lrc")),
        ("ref_jfk_fmt_ml", ["-ml", "16", "-ovtt", "-osrt"],
         ("vtt", "srt")),
    ]
    for name, flags, exts in writer_caps:
        cmd = [cli, "-m", str(model), "-f", jfk, "-nf", "-bs", "1",
               "-bo", "1", "-of", str(tmp / name), *flags]
        print("+", " ".join(cmd))
        subprocess.run(cmd, check=True, capture_output=True)
        for ext in exts:
            shutil.copy(f"{tmp / name}.{ext}", GOLDEN / f"{name}.{ext}")
            print(f"  -> {GOLDEN / name}.{ext}")


if __name__ == "__main__":
    main()
