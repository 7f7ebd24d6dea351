"""Quantization codec tests: round-trip reconstruction + layout invariants."""

import numpy as np
import pytest

from whisper_tpu.weights import quant


@pytest.mark.parametrize("qtype,rtol", [
    (quant.GGML_TYPE_Q4_0, 0.20),
    (quant.GGML_TYPE_Q4_1, 0.12),
    (quant.GGML_TYPE_Q5_0, 0.10),
    (quant.GGML_TYPE_Q5_1, 0.06),
    (quant.GGML_TYPE_Q8_0, 0.02),
])
def test_roundtrip_error(qtype, rtol):
    rng = np.random.RandomState(42)
    x = rng.randn(64, 256).astype(np.float32)
    raw = quant.QUANTIZERS[qtype](x)
    bs, blk = quant.TYPE_SIZES[qtype]
    assert len(raw) == (x.size // blk) * bs
    y = quant.decode_tensor(raw, qtype, x.shape)
    scale = np.abs(x).max()
    err = np.abs(x - y).max() / scale
    assert err < rtol, f"{quant.TYPE_NAMES[qtype]}: rel err {err}"


def test_q8_0_block_layout():
    """One block, known values -> exact layout check."""
    x = np.arange(32, dtype=np.float32) - 16.0   # absmax 16 at index 0
    raw = quant.quantize_q8_0(x)
    assert len(raw) == 34
    d = np.frombuffer(raw[:2], dtype=np.float16)[0]
    qs = np.frombuffer(raw[2:], dtype=np.int8)
    recon = qs.astype(np.float32) * np.float32(d)
    np.testing.assert_allclose(recon, x, atol=float(d) / 2 + 1e-3)


def test_q5_0_high_bits():
    """Values needing the 5th bit survive the round trip."""
    rng = np.random.RandomState(0)
    x = (rng.rand(32).astype(np.float32) * 30 - 15)
    raw = quant.quantize_q5_0(x)
    y = quant.decode_tensor(raw, quant.GGML_TYPE_Q5_0, (32,))
    assert np.abs(x - y).max() < np.abs(x).max() / 16 + 1e-3


def test_f16_passthrough():
    x = np.random.RandomState(1).randn(4, 32).astype(np.float16)
    out = quant.decode_tensor(x.tobytes(), quant.GGML_TYPE_F16, (4, 32))
    np.testing.assert_array_equal(out, x.astype(np.float32))


def test_keep_quantized_q4_1_packed(tmp_path):
    """q4_1/q5_1 files stay packed under keep_quantized (codes+scales+mins)
    instead of silently densifying; exactness vs decode_tensor."""
    import os
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from conftest import make_random_model

    import jax.numpy as jnp
    import numpy as np

    from whisper_tpu.ops.quantized import dequantize_weights
    from whisper_tpu.weights.convert import params_from_ggml
    from whisper_tpu.weights.ggml_reader import read_ggml_file
    from whisper_tpu.weights import quant

    path = make_random_model(tmp_path, d=128, heads=4, ftype=3,
                             qtype=quant.GGML_TYPE_Q4_1)
    mf = read_ggml_file(path)
    params, cfg = params_from_ggml(mf, keep_quantized=True)
    qw = params["decoder"]["blocks"]["q_w"]
    assert isinstance(qw, dict) and "m" in qw, "q4_1 must stay packed"

    rt = mf.tensors["decoder.blocks.0.attn.query.weight"]
    dense = quant.decode_tensor(rt.data, rt.ttype, rt.shape)
    redq = np.asarray(dequantize_weights(
        jnp.asarray(qw["q"][0]).T, jnp.asarray(qw["s"][0]).T,
        jnp.asarray(qw["m"][0]).T, dtype=jnp.float32))
    np.testing.assert_allclose(redq, dense, atol=1e-6)
