#!/usr/bin/env python3
"""Minimal client for the server's SSE /stream endpoint.

Prints each segment the moment the engine finalizes it — on a long file
text starts appearing after the first 30 s window instead of after the
whole transcription.  Stdlib only.

Usage:
    python -m whisper_tpu.server -m model.bin --port 8080 [--batch 8] &
    python examples/sse_client.py audio.wav [host:port]
"""

import json
import sys
import urllib.request
import uuid


def stream_transcribe(path: str, addr: str = "127.0.0.1:8080"):
    boundary = uuid.uuid4().hex
    with open(path, "rb") as f:
        audio = f.read()
    body = (f"--{boundary}\r\nContent-Disposition: form-data; "
            f'name="file"; filename="a"\r\n\r\n').encode() + audio + \
        f"\r\n--{boundary}--\r\n".encode()
    req = urllib.request.Request(
        f"http://{addr}/stream", data=body,
        headers={"Content-Type":
                 f'multipart/form-data; boundary="{boundary}"'})
    with urllib.request.urlopen(req) as r:
        buf = b""
        while True:
            chunk = r.read(1)
            if not chunk:
                break
            buf += chunk
            while b"\n\n" in buf:
                event, _, buf = buf.partition(b"\n\n")
                if not event.startswith(b"data: "):
                    continue
                data = event[6:].decode("utf-8")
                if data == "[DONE]":
                    return
                seg = json.loads(data)
                print(f"[{seg['start']:8.2f} --> {seg['end']:8.2f}] "
                      f"{seg['text']}", flush=True)


if __name__ == "__main__":
    stream_transcribe(sys.argv[1],
                      sys.argv[2] if len(sys.argv) > 2 else "127.0.0.1:8080")
