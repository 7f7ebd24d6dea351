"""Server byte-goldens vs the REAL reference whisper-server.

Builds the reference's whisper-server (real engine, CPU-only), serves the
shared random-weight model, and asserts our server's /inference response
BODIES are byte-identical for json/text/srt/vtt (verbose_json is compared
structurally — nlohmann prints shortest-round-trip f32, Python prints
double repr, so float text differs by design).

Reference: examples/server/server.cpp:686-1035 (routes + formatting),
:384-399 (output_str's per-segment newlines).
"""

import json
import os
import socket
import subprocess
import threading
import time
import urllib.request

import pytest

import whisper_tpu.server as srv_mod
import whisper_tpu as wt
from conftest import build_reference_binary, make_random_model

pytestmark = pytest.mark.slow

REF_SAMPLES = "/root/reference/samples"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _post_inference(port: int, wav_bytes: bytes, fields: dict) -> tuple:
    boundary = "goldenboundary"
    parts = [(f"--{boundary}\r\nContent-Disposition: form-data; "
              f'name="file"; filename="a.wav"\r\n\r\n').encode() + wav_bytes]
    for k, v in fields.items():
        parts.append((f"--{boundary}\r\nContent-Disposition: form-data; "
                      f'name="{k}"\r\n\r\n{v}').encode())
    body = b"\r\n".join(parts) + f"\r\n--{boundary}--\r\n".encode()
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/inference", data=body,
        headers={"Content-Type":
                 f'multipart/form-data; boundary="{boundary}"'})
    with urllib.request.urlopen(req, timeout=600) as r:
        return r.headers.get("Content-Type"), r.read()


def _wait_health(port: int, timeout=120) -> bool:
    deadline = time.monotonic() + timeout
    while time.monotonic() < deadline:
        try:
            with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/health", timeout=2) as r:
                return r.read() == b'{"status":"ok"}'
        except OSError:
            time.sleep(0.3)
    return False


@pytest.fixture(scope="module")
def model_path(tmp_path_factory):
    # seed=7 ftype=1: the same shared random-weight model the pipeline
    # goldens use, so engine outputs are known token-exact vs the binary
    return make_random_model(tmp_path_factory.mktemp("m"), seed=7, ftype=1)


@pytest.fixture(scope="module")
def ref_server(model_path):
    exe = build_reference_binary("whisper-server")
    if exe is None:
        pytest.skip("reference whisper-server could not be built")
    port = _free_port()
    proc = subprocess.Popen(
        [exe, "-m", model_path, "--host", "127.0.0.1",
         "--port", str(port)],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    try:
        if not _wait_health(port):
            pytest.skip("reference whisper-server did not become healthy")
        yield port
    finally:
        proc.terminate()
        proc.wait(timeout=30)


@pytest.fixture(scope="module")
def our_server(model_path):
    from http.server import ThreadingHTTPServer
    srv_mod.STATE.ctx = wt.WhisperContext.from_file(model_path)
    port = _free_port()
    httpd = ThreadingHTTPServer(("127.0.0.1", port), srv_mod.Handler)
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    yield port
    httpd.shutdown()


@pytest.fixture(scope="module")
def wav_bytes():
    # clean 3 s clip re-encoded with a correct header: naive byte
    # truncation desyncs the two WAV readers (the reference honors the
    # declared chunk size and zero-fills the missing tail)
    import io
    import wave

    import numpy as np

    from whisper_tpu.audio.io import load_wav
    pcm, _ = load_wav(f"{REF_SAMPLES}/jfk.wav")
    pcm16 = (np.clip(pcm[:16000 * 3], -1, 1) * 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(pcm16.tobytes())
    return buf.getvalue()


# deterministic decode: ladder off (retries draw multinomially, which is
# PRNG-implementation-defined and can never match across engines)
DET = {"temperature_inc": "0.0"}


def test_health_byte_identical(ref_server, our_server):
    for port in (ref_server, our_server):
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/health", timeout=10) as r:
            assert r.read() == b'{"status":"ok"}'


@pytest.mark.parametrize("fmt", ["json", "text", "srt", "vtt"])
def test_response_bodies_byte_identical(ref_server, our_server, wav_bytes,
                                        fmt):
    fields = dict(DET, response_format=fmt)
    ref_ct, ref_body = _post_inference(ref_server, wav_bytes, fields)
    our_ct, our_body = _post_inference(our_server, wav_bytes, fields)
    assert ref_body == our_body, (fmt, ref_body[:300], our_body[:300])
    # content type too (the reference serves text as text/html)
    assert (ref_ct or "").split(";")[0] == (our_ct or "").split(";")[0]


def test_srt_offset_n(ref_server, our_server, wav_bytes):
    fields = dict(DET, response_format="srt", offset_n="5")
    _, ref_body = _post_inference(ref_server, wav_bytes, fields)
    _, our_body = _post_inference(our_server, wav_bytes, fields)
    assert ref_body == our_body


def test_verbose_json_structurally_identical(ref_server, our_server,
                                             wav_bytes):
    fields = dict(DET, response_format="verbose_json")
    _, ref_body = _post_inference(ref_server, wav_bytes, fields)
    _, our_body = _post_inference(our_server, wav_bytes, fields)
    ref = json.loads(ref_body)
    ours = json.loads(our_body)

    assert ref.keys() == ours.keys()
    for k in ("task", "language", "text"):
        assert ref[k] == ours[k], k
    assert abs(ref["duration"] - ours["duration"]) < 1e-3
    assert len(ref["segments"]) == len(ours["segments"])
    for rs, os_ in zip(ref["segments"], ours["segments"]):
        assert rs.keys() == os_.keys(), (rs.keys(), os_.keys())
        assert rs["id"] == os_["id"] and rs["text"] == os_["text"]
        assert rs.get("tokens") == os_.get("tokens")
        for rw, ow in zip(rs.get("words", []), os_.get("words", [])):
            assert rw["word"] == ow["word"]
            assert abs(rw["probability"] - ow["probability"]) < 1e-3
        # engines accumulate logprobs in different precisions (ggml f32
        # GEMM vs XLA bf16->f32); ~1e-3 drift per token sum is expected
        assert abs(rs["avg_logprob"] - os_["avg_logprob"]) < 2e-2
