"""Application-layer tests: CLI, output writers, server, stream,
full_parallel, token timestamps."""

import json
import os
import threading
import time
import urllib.request

import numpy as np
import pytest

import whisper_tpu as wt
from conftest import make_random_model


@pytest.fixture(scope="module")
def model_path(tmp_path_factory):
    return make_random_model(tmp_path_factory.mktemp("apps"))


@pytest.fixture(scope="module")
def ctx(model_path):
    return wt.WhisperContext.from_file(model_path)


def _noise(seconds, seed=0):
    return (np.random.RandomState(seed)
            .randn(16000 * seconds).astype(np.float32) * 0.1)


def _run_full(ctx):
    p = wt.full_default_params()
    p.print_progress = False
    p.temperature_inc = 0.0
    p.single_segment = True
    p.max_tokens = 5
    ctx.full(p, _noise(2))
    return ctx


def test_output_writers(ctx, tmp_path):
    from whisper_tpu import outputs
    _run_full(ctx)
    base = str(tmp_path / "out")
    assert outputs.output_txt(ctx, base + ".txt")
    assert outputs.output_vtt(ctx, base + ".vtt")
    assert outputs.output_srt(ctx, base + ".srt")
    assert outputs.output_csv(ctx, base + ".csv")
    assert outputs.output_lrc(ctx, base + ".lrc")
    assert outputs.output_json(ctx, base + ".json", full=True)
    assert outputs.output_score(ctx, base + ".score")

    assert open(base + ".vtt").read().startswith("WEBVTT")
    assert open(base + ".csv").readline() == "start,end,text\n"
    doc = json.load(open(base + ".json"))
    assert doc["model"]["vocab"] == 51864
    assert len(doc["transcription"]) == ctx.full_n_segments()
    srt = open(base + ".srt").read()
    if ctx.full_n_segments():
        assert srt.startswith("1\n")
        assert " --> " in srt


def test_cli_main(model_path, jfk_wav_path, tmp_path, capsys):
    from whisper_tpu.cli import main
    out = str(tmp_path / "cli_out")
    rc = main(["-m", model_path, "-f", jfk_wav_path, "-d", "2000",
               "-nf", "-otxt", "-ocsv", "-of", out, "-np"])
    assert rc == 0
    assert os.path.exists(out + ".txt")
    assert os.path.exists(out + ".csv")


def test_cli_unknown_language(model_path):
    from whisper_tpu.cli import main
    assert main(["-m", model_path, "-f", "x.wav", "-l", "klingon"]) == 1


def test_full_parallel(ctx):
    p = wt.full_default_params()
    p.print_progress = False
    p.temperature_inc = 0.0
    rc = ctx.full_parallel(p, _noise(6), n_processors=2)
    assert rc == 0
    # segments non-overlapping and ordered
    segs = ctx.result_all
    for a, b in zip(segs, segs[1:]):
        assert b.t0 >= a.t1 or b.t0 >= a.t0


def test_token_timestamps_energy(ctx):
    p = wt.full_default_params()
    p.print_progress = False
    p.temperature_inc = 0.0
    p.token_timestamps = True
    ctx.full(p, _noise(3))
    for seg in ctx.result_all:
        for t in seg.tokens:
            assert t.t0 >= 0 and t.t1 >= t.t0


def test_wrap_segment(ctx):
    p = wt.full_default_params()
    p.print_progress = False
    p.temperature_inc = 0.0
    p.token_timestamps = True
    p.max_len = 4
    ctx.full(p, _noise(3))
    for seg in ctx.result_all:
        # each wrapped segment's visible text respects ~max_len
        assert len(seg.text.encode()) <= 4 + 24  # one token may overflow


def test_wrap_segment_preserves_tokens(ctx):
    """A forced multi-way wrap keeps EVERY token and the full text
    (regression: the new segment aliased the truncated source segment and
    came out with zero tokens / empty text / collapsed t1)."""
    from whisper_tpu.api import Segment, TokenData
    from whisper_tpu.timestamps import wrap_segment

    # six real word tokens with strictly increasing times
    words = [" the", " quick", " brown", " fox", " jumps", " over"]
    toks = []
    for k, w in enumerate(words):
        tid = ctx.tokenize(w)[0]
        toks.append(TokenData(id=tid, tid=0, p=1.0, plog=0.0, pt=0.0,
                              ptsum=0.0, t0=100 * k, t1=100 * k + 90))
    full_text = "".join(ctx.vocab.token_str(t.id) for t in toks)
    seg = Segment(t0=0, t1=600, text=full_text, tokens=list(toks),
                  speaker_turn_next=True, no_speech_prob=0.25)
    from whisper_tpu.api import WhisperState
    st = WhisperState()
    with ctx.use_state(st):
        ctx.result_all.append(seg)
        n = wrap_segment(ctx, max_len=10, split_on_word=True)
        segs = list(ctx.result_all)
    assert n == len(segs) and n >= 3          # actually split multi-way
    assert sum(len(s.tokens) for s in segs) == len(toks)
    assert "".join(s.text for s in segs) == full_text
    for s in segs:
        assert s.t1 >= s.t0
    # the trailing-segment metadata survives on the LAST piece
    assert segs[-1].speaker_turn_next is True
    assert all(not s.speaker_turn_next for s in segs[:-1])


def test_stream_fixed_step(ctx):
    from whisper_tpu.stream import StreamTranscriber
    st = StreamTranscriber(ctx, step_ms=1000, length_ms=3000, keep_ms=200,
                           max_tokens=4)
    pcm = _noise(4)
    n_events = 0
    for i in range(0, len(pcm), st.n_samples_step):
        for final, segs in st.feed_fixed(pcm[i:i + st.n_samples_step]):
            n_events += 1
    assert n_events >= 2


def test_vad():
    from whisper_tpu.audio.vad import similarity, vad_simple
    loud = np.sin(np.linspace(0, 3000, 32000)).astype(np.float32)
    quiet_tail = np.concatenate([loud, np.zeros(16000, np.float32)])
    assert vad_simple(quiet_tail, 16000, 1000, 0.6, 100.0)
    assert not vad_simple(np.concatenate([loud, loud]), 16000, 1000, 0.6, 0.0)
    assert similarity("red", "red") == 1.0
    assert similarity("red", "blue") < 0.5


def test_server_roundtrip(model_path, jfk_wav_path):
    import socket
    from whisper_tpu import server as srv_mod
    from http.server import ThreadingHTTPServer

    srv_mod.STATE.ctx = wt.WhisperContext.from_file(model_path)
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    httpd = ThreadingHTTPServer(("127.0.0.1", port), srv_mod.Handler)
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/health", timeout=10) as r:
            assert json.load(r)["status"] == "ok"

        boundary = "testboundary"
        wav = open(jfk_wav_path, "rb").read()[:16000 * 2 * 2 + 44]
        body = (f"--{boundary}\r\nContent-Disposition: form-data; "
                f'name="file"; filename="a.wav"\r\n\r\n').encode() + wav + \
            (f"\r\n--{boundary}\r\nContent-Disposition: form-data; "
             f'name="temperature_inc"\r\n\r\n0.0'
             f"\r\n--{boundary}--\r\n").encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/inference", data=body,
            headers={"Content-Type":
                     f'multipart/form-data; boundary="{boundary}"'})
        with urllib.request.urlopen(req, timeout=120) as r:
            doc = json.load(r)
            assert "text" in doc
    finally:
        httpd.shutdown()


def test_server_verbose_json(model_path, jfk_wav_path):
    """verbose_json carries the reference server's full field set
    (server.cpp:927-980): per-segment token ids, a words array with
    per-token timing + probability, temperature, avg_logprob; start/end
    are omitted when no_timestamps is requested."""
    import socket
    from http.server import ThreadingHTTPServer

    from whisper_tpu import server as srv_mod

    srv_mod.STATE.ctx = wt.WhisperContext.from_file(model_path)
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    httpd = ThreadingHTTPServer(("127.0.0.1", port), srv_mod.Handler)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        wav = open(jfk_wav_path, "rb").read()[:16000 * 2 * 2 + 44]
        boundary = "vb"

        def post(extra_fields):
            fields = {"temperature_inc": "0.0",
                      "response_format": "verbose_json", **extra_fields}
            body = (f"--{boundary}\r\nContent-Disposition: form-data; "
                    f'name="file"; filename="a.wav"\r\n\r\n').encode() + wav
            for k, v in fields.items():
                body += (f"\r\n--{boundary}\r\nContent-Disposition: "
                         f'form-data; name="{k}"\r\n\r\n{v}').encode()
            body += f"\r\n--{boundary}--\r\n".encode()
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/inference", data=body,
                headers={"Content-Type":
                         f'multipart/form-data; boundary="{boundary}"'})
            with urllib.request.urlopen(req, timeout=300) as r:
                return json.load(r)

        doc = post({})
        assert set(doc) == {"task", "language", "duration", "text",
                            "segments"}
        assert doc["task"] == "transcribe" and doc["duration"] > 0
        seg = doc["segments"][0]
        for key in ("id", "text", "start", "end", "tokens", "words",
                    "temperature", "avg_logprob", "no_speech_prob"):
            assert key in seg, key
        word = seg["words"][0]
        assert {"word", "start", "end", "t_dtw", "probability"} <= set(word)
        assert len(seg["tokens"]) == len(seg["words"])

        doc_nt = post({"no_timestamps": "true"})
        seg_nt = doc_nt["segments"][0]
        assert "start" not in seg_nt and "end" not in seg_nt
        if seg_nt.get("words"):
            assert "start" not in seg_nt["words"][0]
    finally:
        httpd.shutdown()


def test_command_match():
    from whisper_tpu.command import match_command
    idx, sim = match_command("turn on the lights",
                             ["turn off the lights", "turn on the lights",
                              "play music"])
    assert idx == 1 and sim == 1.0


def test_command_transcribe_utterance(ctx):
    """transcribe_utterance uses the reference decode config
    (command.cpp:149-186): beam-5 @ t=0.4 with a single-rung ladder by
    default, greedy t=0 when deterministic=True."""
    from whisper_tpu.command import transcribe_utterance

    pcm = _noise(2, seed=3)
    text = transcribe_utterance(ctx, pcm, max_tokens=8)
    assert isinstance(text, str)

    det1 = transcribe_utterance(ctx, pcm, max_tokens=8, deterministic=True)
    det2 = transcribe_utterance(ctx, pcm, max_tokens=8, deterministic=True)
    assert det1 == det2  # greedy t=0 is reproducible

    # suppress_regex reaches the decode: suppressing the exact text of
    # the first decoded token removes it (command.cpp:173 parity;
    # suppress_regex full-matches token strings, whisper.cpp:5098-5105)
    import re as _re
    tok_texts = [ctx.full_get_token_text(0, j)
                 for j in range(ctx.full_n_tokens(0))]
    text_toks = [t for t in tok_texts if not t.startswith("[_")]
    if text_toks:
        target = text_toks[0]
        sup = transcribe_utterance(ctx, pcm, max_tokens=8,
                                   deterministic=True,
                                   suppress_regex=_re.escape(target))
        sup_toks = [ctx.full_get_token_text(0, j)
                    for j in range(ctx.full_n_tokens(0))]
        assert target not in sup_toks
        assert isinstance(sup, str)


def test_server_batched_mode(model_path, jfk_wav_path):
    """Concurrent requests ride one device batch (_BatchWorker)."""
    import socket
    from concurrent.futures import ThreadPoolExecutor
    from http.server import ThreadingHTTPServer

    from whisper_tpu import server as srv_mod

    srv_mod.STATE.ctx = wt.WhisperContext.from_file(model_path)
    srv_mod.STATE.batcher = srv_mod._BatchWorker(
        srv_mod.STATE.ctx, batch_size=4, window_ms=200)
    try:
        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            port = s.getsockname()[1]
        httpd = ThreadingHTTPServer(("127.0.0.1", port), srv_mod.Handler)
        thread = threading.Thread(target=httpd.serve_forever, daemon=True)
        thread.start()

        wav = open(jfk_wav_path, "rb").read()[:16000 * 2 * 2 + 44]
        boundary = "bb"
        body = (f"--{boundary}\r\nContent-Disposition: form-data; "
                f'name="file"; filename="a.wav"\r\n\r\n').encode() + wav + \
            (f"\r\n--{boundary}\r\nContent-Disposition: form-data; "
             f'name="temperature_inc"\r\n\r\n0.0'
             f"\r\n--{boundary}\r\nContent-Disposition: form-data; "
             f'name="max_len"\r\n\r\n0'
             f"\r\n--{boundary}--\r\n").encode()

        def post(_):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/inference", data=body,
                headers={"Content-Type":
                         f'multipart/form-data; boundary="{boundary}"'})
            with urllib.request.urlopen(req, timeout=300) as r:
                return json.load(r)

        with ThreadPoolExecutor(4) as ex:
            results = list(ex.map(post, range(3)))
        assert all("text" in r for r in results)

        # beam request rides the batch engine too (round 4: the quality
        # surface is batchable — a beam signature spins its own engine)
        beam_body = body.replace(
            f"--{boundary}--".encode(),
            (f"--{boundary}\r\nContent-Disposition: form-data; "
             f'name="beam_size"\r\n\r\n2'
             f"\r\n--{boundary}--").encode())
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/inference", data=beam_body,
            headers={"Content-Type":
                     f'multipart/form-data; boundary="{boundary}"'})
        with urllib.request.urlopen(req, timeout=300) as r:
            assert "text" in json.load(r)
        assert any(sig[8] == wt.SamplingStrategy.BEAM_SEARCH
                   for sig in srv_mod.STATE.batcher.engines), \
            "beam request did not reach a batch engine"

        # auto-language request rides the batch engine too (round 5: a
        # batched [sot] pre-pass detects per-stream languages; the server
        # no longer shunts "auto" to serial) and verbose_json reports the
        # DETECTED language, not a hardcoded default
        auto_body = body.replace(
            f"--{boundary}--".encode(),
            (f"--{boundary}\r\nContent-Disposition: form-data; "
             f'name="language"\r\n\r\nauto'
             f"\r\n--{boundary}\r\nContent-Disposition: form-data; "
             f'name="response_format"\r\n\r\nverbose_json'
             f"\r\n--{boundary}--").encode())
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/inference", data=auto_body,
            headers={"Content-Type":
                     f'multipart/form-data; boundary="{boundary}"'})
        with urllib.request.urlopen(req, timeout=300) as r:
            doc = json.load(r)
        assert "language" in doc and doc["language"]
        assert any(sig[0] in (None, "", "auto")
                   for sig in srv_mod.STATE.batcher.engines), \
            "auto-language request did not reach a batch engine"
        httpd.shutdown()
    finally:
        srv_mod.STATE.batcher = None


def test_full_parallel_batched_matches_serial(ctx):
    """full_parallel routes through the batched pipeline when eligible;
    the fast path must produce exactly the serial path's segments."""
    p = wt.full_default_params()
    p.print_progress = False
    p.temperature_inc = 0.0
    pcm = _noise(6, seed=3)

    # serial fallback forced via a (never-firing) abort callback
    ps = wt.full_default_params()
    ps.print_progress = False
    ps.temperature_inc = 0.0
    ps.abort_callback = lambda c: False
    assert ctx.full_parallel(ps, pcm, n_processors=2) == 0
    serial = [(s.t0, s.t1, s.text) for s in ctx.result_all]

    assert ctx.full_parallel(p, pcm, n_processors=2) == 0
    batched = [(s.t0, s.t1, s.text) for s in ctx.result_all]
    assert batched == serial


def test_full_parallel_auto_language_batched(ctx):
    """language="auto" rides full_parallel's batched fast path: each chunk
    detects its own language (as each reference thread does,
    whisper_full_parallel -> whisper_full_with_state:5504), the context
    lang id is chunk 0's, and params.language is written back resolved."""
    p = wt.full_default_params()
    p.print_progress = False
    p.temperature_inc = 0.0
    p.language = "auto"
    pcm = _noise(6, seed=3)
    assert ctx.full_parallel(p, pcm, n_processors=2) == 0
    assert p.language not in (None, "", "auto")
    assert ctx.full_lang_id() == __import__(
        "whisper_tpu.languages", fromlist=["lang_id"]).lang_id(p.language)


def test_stream_mic_capture_fallback(model_path, tmp_path, monkeypatch):
    """-c/--capture: with no sounddevice, _mic_chunks pipes s16le from an
    arecord subprocess (reference: stream.cpp SDL capture).  A fake arecord
    on PATH feeds 4 s of sine; the stream must transcribe it like the
    stdin path would."""
    import os
    import subprocess
    import sys

    fake = tmp_path / "arecord"
    fake.write_text(
        "#!/usr/bin/env python3\n"
        "import sys, numpy as np\n"
        "pcm = (np.sin(np.arange(16000*4)*0.05)*8000).astype('<i2')\n"
        "sys.stdout.buffer.write(pcm.tobytes())\n")
    fake.chmod(0o755)

    env = dict(os.environ, PATH=f"{tmp_path}:{os.environ['PATH']}",
               JAX_PLATFORMS=os.environ.get("JAX_PLATFORMS", "cpu"))
    out = subprocess.run(
        [sys.executable, "-m", "whisper_tpu.stream", "-m", model_path,
         "-c", "-1", "--step", "2000", "--length", "4000"],
        env=env, capture_output=True, text=True, timeout=900)
    assert out.returncode == 0, out.stderr[-500:]
    assert out.stdout.strip(), "no transcription lines from mic capture"


def test_stream_mic_capture_no_backend(model_path, tmp_path):
    """Without any capture backend the error is actionable."""
    import os
    import subprocess
    import sys

    env = dict(os.environ, PATH=str(tmp_path),   # no arecord/ffmpeg
               JAX_PLATFORMS=os.environ.get("JAX_PLATFORMS", "cpu"))
    env["PATH"] = f"{tmp_path}:{os.path.dirname(sys.executable)}"
    out = subprocess.run(
        [sys.executable, "-m", "whisper_tpu.stream", "-m", model_path,
         "-c", "-1"], env=env, capture_output=True, text=True, timeout=500)
    assert out.returncode != 0
    assert "no capture backend" in out.stderr


def test_bench_tool_full(tmp_path):
    """bench_full exercises decode_step/decode_prompt with the real KV
    layouts (regression: the (L,B,H,Dh,C) lane-tight cache change broke
    the tool's hand-built cache)."""
    import jax.numpy as jnp

    from bench import CONFIGS
    from whisper_tpu.bench_tool import bench_full
    from whisper_tpu.weights.convert import random_params

    cfg = CONFIGS["tiny"]
    params = random_params(cfg, dtype=jnp.bfloat16)
    r = bench_full(params, cfg, fast=True)
    assert set(r) == {"enc_ms", "dec_ms", "bch5_ms", "pp_ms_per_tok"}
    assert all(v > 0 for v in r.values())


def test_server_sse_stream(model_path, tmp_path):
    """POST /stream responds text/event-stream with one data: event per
    segment (produced progressively) and a terminating data: [DONE] —
    segments equal what /inference returns for the same audio.  Covers
    the serial path (no batcher) and the continuous-batching path."""
    import socket
    import wave as _wave
    from http.server import ThreadingHTTPServer

    from whisper_tpu import server as srv_mod

    srv_mod.STATE.ctx = wt.WhisperContext.from_file(model_path)

    # multi-window audio so the stream has >= 2 segments to deliver
    pcm16 = (np.random.RandomState(5).randn(16000 * 35) * 3000).clip(
        -32768, 32767).astype("<i2")
    wav_path = tmp_path / "s.wav"
    with _wave.open(str(wav_path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(pcm16.tobytes())
    wav = wav_path.read_bytes()

    # no_context=true: the server default carries prompt_past across
    # requests on one state (the reference server behaves the same), so
    # back-to-back /stream and /inference on identical audio would
    # legitimately decode differently without it
    boundary = "sse"
    body = (f"--{boundary}\r\nContent-Disposition: form-data; "
            f'name="file"; filename="a.wav"\r\n\r\n').encode() + wav + \
        (f"\r\n--{boundary}\r\nContent-Disposition: form-data; "
         f'name="temperature_inc"\r\n\r\n0.0'
         f"\r\n--{boundary}\r\nContent-Disposition: form-data; "
         f'name="no_context"\r\n\r\ntrue'
         f"\r\n--{boundary}--\r\n").encode()
    headers = {"Content-Type":
               f'multipart/form-data; boundary="{boundary}"'}

    def run_case():
        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            port = s.getsockname()[1]
        httpd = ThreadingHTTPServer(("127.0.0.1", port), srv_mod.Handler)
        threading.Thread(target=httpd.serve_forever, daemon=True).start()
        try:
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/stream", data=body,
                headers=headers)
            with urllib.request.urlopen(req, timeout=600) as r:
                assert r.headers["Content-Type"] == "text/event-stream"
                events = [ln.decode("utf-8")[6:] for ln in r.read().split(
                    b"\n\n") if ln.startswith(b"data: ")]
            assert events and events[-1] == "[DONE]"
            segs = [json.loads(e) for e in events[:-1]]
            assert len(segs) >= 2
            for seg in segs:
                assert set(seg) == {"start", "end", "text"}

            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/inference", data=body,
                headers=headers)
            with urllib.request.urlopen(req, timeout=600) as r:
                full_text = json.load(r)["text"]
            assert "".join(s["text"] + "\n" for s in segs) == full_text
            return segs
        finally:
            httpd.shutdown()

    try:
        serial_segs = run_case()                       # no batcher
        srv_mod.STATE.batcher = srv_mod._BatchWorker(  # continuous engine
            srv_mod.STATE.ctx, batch_size=2, warmup=False)
        batched_segs = run_case()
        assert batched_segs == serial_segs
    finally:
        if srv_mod.STATE.batcher is not None:
            srv_mod.STATE.batcher.close()
            srv_mod.STATE.batcher = None
