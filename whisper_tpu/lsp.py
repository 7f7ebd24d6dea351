"""JSON-RPC transcription interface over stdin/stdout (examples/lsp
equivalent, reference: examples/lsp/lsp.cpp).

Requests are Content-Length framed JSON-RPC 2.0 messages (LSP wire
format). Methods:

  "initialize"  -> capabilities + model info
  "transcribe"  -> params: {"file": path} or {"pcm_base64": s16le data},
                   optional whisper params (language, translate,
                   temperature, max_tokens, no_timestamps)
  "guided"      -> params like transcribe plus {"commands": [..]}:
                   returns the best-matching command by similarity
  "shutdown" / "exit"

Usage: python -m whisper_tpu.lsp -m model.bin
"""

from __future__ import annotations

import argparse
import base64
import json
import sys

import numpy as np

from .api import WhisperContext, full_default_params
from .audio.vad import similarity
from .command import match_command, transcribe_utterance


def _read_message(stdin) -> dict | None:
    headers = {}
    while True:
        line = stdin.readline()
        if not line:
            return None
        line = line.decode().strip()
        if not line:
            break
        key, _, value = line.partition(":")
        headers[key.strip().lower()] = value.strip()
    length = int(headers.get("content-length", 0))
    if length <= 0:
        return None
    return json.loads(stdin.read(length))


def _write_message(stdout, msg: dict) -> None:
    data = json.dumps(msg).encode()
    stdout.write(f"Content-Length: {len(data)}\r\n\r\n".encode())
    stdout.write(data)
    stdout.flush()


def _load_pcm(params: dict) -> np.ndarray:
    if "file" in params:
        from .audio.io import load_audio
        return load_audio(params["file"])[0]
    if "pcm_base64" in params:
        raw = base64.b64decode(params["pcm_base64"])
        return np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    raise ValueError("need 'file' or 'pcm_base64'")


def serve(ctx: WhisperContext, stdin=None, stdout=None) -> int:
    stdin = stdin or sys.stdin.buffer
    stdout = stdout or sys.stdout.buffer

    while True:
        msg = _read_message(stdin)
        if msg is None:
            return 0
        mid = msg.get("id")
        method = msg.get("method", "")
        params = msg.get("params", {}) or {}

        def reply(result=None, error=None):
            out = {"jsonrpc": "2.0", "id": mid}
            if error is not None:
                out["error"] = {"code": -32000, "message": str(error)}
            else:
                out["result"] = result
            _write_message(stdout, out)

        try:
            if method == "initialize":
                hp = ctx.hparams
                reply({"model": hp.model_type,
                       "multilingual": ctx.is_multilingual(),
                       "n_vocab": hp.n_vocab})
            elif method == "transcribe":
                pcm = _load_pcm(params)
                p = full_default_params()
                p.print_progress = False
                p.language = params.get("language", "en")
                p.translate = bool(params.get("translate", False))
                p.no_timestamps = bool(params.get("no_timestamps", False))
                p.max_tokens = int(params.get("max_tokens", 0))
                p.temperature = float(params.get("temperature", 0.0))
                if ctx.full(p, pcm) != 0:
                    raise RuntimeError("transcription failed")
                segs = [{"t0": ctx.full_get_segment_t0(i),
                         "t1": ctx.full_get_segment_t1(i),
                         "text": ctx.full_get_segment_text(i)}
                        for i in range(ctx.full_n_segments())]
                reply({"segments": segs,
                       "text": "".join(s["text"] for s in segs)})
            elif method == "guided":
                pcm = _load_pcm(params)
                commands = params.get("commands", [])
                text = transcribe_utterance(
                    ctx, pcm, max_tokens=int(params.get("max_tokens", 32)))
                idx, sim = match_command(text, commands) if commands else (-1, 0.0)
                reply({"heard": text, "command_index": idx,
                       "command": commands[idx] if idx >= 0 else None,
                       "similarity": sim})
            elif method == "shutdown":
                reply(None)
            elif method == "exit":
                return 0
            else:
                reply(error=f"unknown method '{method}'")
        except Exception as e:  # noqa: BLE001 — report over the wire
            reply(error=e)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="whisper-lsp")
    ap.add_argument("-m", "--model", required=True)
    args = ap.parse_args(argv)
    return serve(WhisperContext.from_file(args.model))


if __name__ == "__main__":
    sys.exit(main())
