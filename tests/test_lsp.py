"""LSP JSON-RPC surface tests (reference: examples/lsp/lsp.cpp).

Drives whisper_tpu.lsp.serve() over in-memory pipes with a random-weight
model, covering the reference method set (registerCommandset / guided /
unguided / seek / echo), error codes, wire framing, and the
vim-client extension methods.
"""

import io
import json
import wave

import numpy as np
import pytest

import whisper_tpu as wt
from conftest import make_random_model


@pytest.fixture(scope="module")
def model_path(tmp_path_factory):
    return make_random_model(tmp_path_factory.mktemp("lsp"))


@pytest.fixture(scope="module")
def ctx(model_path):
    return wt.WhisperContext.from_file(model_path)


@pytest.fixture(scope="module")
def wav_path(tmp_path_factory):
    path = tmp_path_factory.mktemp("lsp_audio") / "noise.wav"
    pcm = (np.random.RandomState(7).randn(16000 * 2) * 2000).astype("<i2")
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(pcm.tobytes())
    return str(path)


def run_lsp(ctx, requests):
    """Frame requests, run serve(), parse all framed responses."""
    from whisper_tpu.lsp import serve

    buf = io.BytesIO()
    for req in requests:
        data = json.dumps(req).encode()
        buf.write(f"Content-Length: {len(data)}\r\n\r\n".encode())
        buf.write(data)
    buf.seek(0)
    out = io.BytesIO()
    serve(ctx, stdin=buf, stdout=out)
    out.seek(0)

    responses = []
    while True:
        header = out.readline()
        if not header:
            break
        assert header.startswith(b"Content-Length: "), header
        length = int(header.split(b":")[1])
        assert out.readline() == b"\r\n"
        body = out.read(length)
        # reference framing counts a trailing newline in Content-Length
        assert body.endswith(b"\n")
        responses.append(json.loads(body))
    return responses


def _rpc(method, params=None, id=1, version="2.0"):
    msg = {"jsonrpc": version, "id": id, "method": method}
    if params is not None:
        msg["params"] = params
    return msg


def test_echo_seek_unknown_and_version(ctx):
    rs = run_lsp(ctx, [
        _rpc("echo", {"a": 1}, id=10),
        _rpc("seek", {"t": 0}, id=11),
        _rpc("noSuchMethod", {}, id=12),
        _rpc("echo", {}, id=13, version="1.0"),
    ])
    assert rs[0]["result"] == {"a": 1} and rs[0]["id"] == 10
    # seek: reference error -32601 (lsp.cpp:333-339)
    assert rs[1]["error"]["code"] == -32601
    # unknown method: reference dispatcher returns a null result
    assert rs[2] == {"jsonrpc": "2.0", "id": 12, "result": None}
    # bad version: -3260 (lsp.cpp:345-351)
    assert rs[3]["error"]["code"] == -3260


def test_register_commandset_and_guided(ctx, wav_path):
    rs = run_lsp(ctx, [
        _rpc("registerCommandset", ["yes", "no", "stop"], id=1),
        _rpc("registerCommandset", ["up", "down"], id=2),
        _rpc("guided", {"file": wav_path}, id=3),
        _rpc("guided", {"file": wav_path, "commandset_index": 0}, id=4),
        # duplicate first token -> -31000 (lsp.cpp:303-310)
        _rpc("registerCommandset", ["left", "left"], id=5),
    ])
    assert rs[0]["result"] == {"index": 0}
    assert rs[1]["result"] == {"index": 1}
    # default commandset is the most recent (lsp.cpp:204)
    r3 = rs[2]["result"]
    assert r3["command_text"] in ("up", "down")
    assert r3["command_index"] in (0, 1) and "timestamp" in r3
    r4 = rs[3]["result"]
    assert r4["command_text"] in ("yes", "no", "stop")
    assert rs[4]["error"]["code"] == -31000
    assert "left" in rs[4]["error"]["message"]


def test_guided_deterministic(ctx, wav_path):
    """Same audio + commandset -> same argmax (raw-logits softmax path)."""
    out1 = run_lsp(ctx, [_rpc("registerCommandset", ["alpha", "beta"], id=1),
                         _rpc("guided", {"file": wav_path}, id=2)])
    out2 = run_lsp(ctx, [_rpc("registerCommandset", ["alpha", "beta"], id=1),
                         _rpc("guided", {"file": wav_path}, id=2)])
    assert (out1[1]["result"]["command_index"]
            == out2[1]["result"]["command_index"])


def test_unguided(ctx, wav_path):
    rs = run_lsp(ctx, [
        _rpc("unguided", {"file": wav_path}, id=1),
        _rpc("unguided", {"file": wav_path, "prompt": "Hello world"}, id=2),
    ])
    for r in rs:
        assert "transcription" in r["result"]
        assert isinstance(r["result"]["transcription"], str)
        assert "timestamp" in r["result"]


def test_extension_methods(ctx, wav_path):
    rs = run_lsp(ctx, [
        _rpc("initialize", {}, id=1),
        _rpc("transcribe", {"file": wav_path, "max_tokens": 4}, id=2),
        _rpc("guided", {"file": wav_path,
                        "commands": ["yes", "no"], "max_tokens": 4}, id=3),
        _rpc("shutdown", {}, id=4),
        _rpc("exit", {}, id=5),
        _rpc("echo", {"after": "exit"}, id=6),   # must not be answered
    ])
    assert rs[0]["result"]["n_vocab"] > 0
    assert "text" in rs[1]["result"]
    assert rs[2]["result"]["command_index"] in (-1, 0, 1)
    assert rs[3]["result"] is None
    assert len(rs) == 4   # exit stops the loop before the trailing echo


def test_pcm_base64_and_maxlength(ctx):
    """pcm_base64 input; guided clamps to the last 2 s (lsp.cpp:205-207)."""
    import base64

    pcm = (np.random.RandomState(3).randn(16000 * 5) * 2000).astype("<i2")
    b64 = base64.b64encode(pcm.tobytes()).decode()
    rs = run_lsp(ctx, [
        _rpc("registerCommandset", ["go"], id=1),
        _rpc("guided", {"pcm_base64": b64}, id=2),
        _rpc("unguided", {"pcm_base64": b64}, id=3),
    ])
    assert rs[1]["result"]["command_text"] == "go"
    assert "transcription" in rs[2]["result"]
