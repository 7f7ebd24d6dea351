"""Quant codecs vs golden bytes produced by ggml itself
(ggml_quantize_chunk + type_traits->to_float on a deterministic input)."""

import struct

import numpy as np
import pytest

from whisper_tpu.weights import quant

GOLDEN = "tests/golden/quant_ref.bin"
N = 1024


def _load():
    raw = open(GOLDEN, "rb").read()
    x = np.frombuffer(raw[:4 * N], dtype="<f4")
    off = 4 * N
    cases = {}
    while off < len(raw):
        t, qn = struct.unpack("<2i", raw[off:off + 8])
        off += 8
        qbytes = raw[off:off + qn]
        off += qn
        y = np.frombuffer(raw[off:off + 4 * N], dtype="<f4")
        off += 4 * N
        cases[t] = (qbytes, y)
    return x, cases


@pytest.mark.parametrize("qtype", [
    quant.GGML_TYPE_Q4_0, quant.GGML_TYPE_Q4_1, quant.GGML_TYPE_Q5_0,
    quant.GGML_TYPE_Q5_1, quant.GGML_TYPE_Q8_0,
])
def test_quantize_bytes_match_ggml(qtype):
    x, cases = _load()
    qref, _ = cases[qtype]
    ours = quant.QUANTIZERS[qtype](x.copy())
    assert ours == qref, f"{quant.TYPE_NAMES[qtype]}: encoded bytes differ"


@pytest.mark.parametrize("qtype", [
    quant.GGML_TYPE_Q4_0, quant.GGML_TYPE_Q4_1, quant.GGML_TYPE_Q5_0,
    quant.GGML_TYPE_Q5_1, quant.GGML_TYPE_Q8_0,
])
def test_dequantize_matches_ggml(qtype):
    _, cases = _load()
    qref, yref = cases[qtype]
    ours = quant.decode_tensor(qref, qtype, (N,))
    np.testing.assert_allclose(ours, yref, atol=1e-6)
