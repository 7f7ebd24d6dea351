"""Convert parsed ggml model files into the stacked JAX parameter pytree.

The pytree layout is documented in whisper_tpu/models/whisper.py.  Per-layer
tensors from the file ("encoder.blocks.%d.attn.query.weight", names from
reference src/whisper-arch.h:42-141) are stacked along a leading layer axis
so the model can `lax.scan` over depth.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..models.whisper import WhisperConfig
from .ggml_reader import GgmlModelFile

# (our key, reference tensor name suffix, squeeze)
_ENC_BLOCK = [
    ("attn_ln_w", "attn_ln.weight"),
    ("attn_ln_b", "attn_ln.bias"),
    ("q_w", "attn.query.weight"),
    ("q_b", "attn.query.bias"),
    ("k_w", "attn.key.weight"),
    ("v_w", "attn.value.weight"),
    ("v_b", "attn.value.bias"),
    ("o_w", "attn.out.weight"),
    ("o_b", "attn.out.bias"),
    ("mlp_ln_w", "mlp_ln.weight"),
    ("mlp_ln_b", "mlp_ln.bias"),
    ("mlp0_w", "mlp.0.weight"),
    ("mlp0_b", "mlp.0.bias"),
    ("mlp2_w", "mlp.2.weight"),
    ("mlp2_b", "mlp.2.bias"),
]

_DEC_BLOCK = _ENC_BLOCK + [
    ("xattn_ln_w", "cross_attn_ln.weight"),
    ("xattn_ln_b", "cross_attn_ln.bias"),
    ("xq_w", "cross_attn.query.weight"),
    ("xq_b", "cross_attn.query.bias"),
    ("xk_w", "cross_attn.key.weight"),
    ("xv_w", "cross_attn.value.weight"),
    ("xv_b", "cross_attn.value.bias"),
    ("xo_w", "cross_attn.out.weight"),
    ("xo_b", "cross_attn.out.bias"),
]


def _cast(name: str, x: np.ndarray, dtype) -> jnp.ndarray:
    """Big matmul weights go to `dtype`; norms/biases/pos stay float32."""
    if x.ndim >= 2 and not name.endswith(("_b", "pos")):
        return jnp.asarray(x, dtype=dtype)
    return jnp.asarray(x, dtype=jnp.float32)


def params_from_ggml(mf: GgmlModelFile, dtype=jnp.bfloat16,
                     keep_quantized: bool = False):
    """-> (params pytree, WhisperConfig).

    keep_quantized: leave the decoder block weights in their block-quantized
    form ({"q": int8 codes K-major, "s": block scales}) so the decode path
    runs the fused dequant-matmul Pallas kernel instead of loading bf16
    copies — the decoder is HBM-bandwidth bound, the encoder is not, so the
    encoder is always densified.  All five codecs stay packed (q4_0/q4_1/
    q5_0/q5_1/q8_0; the _1 variants carry per-block offsets "m").

    Raises KeyError for missing tensors unless the file has no tensors at
    all (the reference's stub-model test path, src/whisper.cpp:1954-1955),
    in which case zero-filled parameters are synthesized.
    """
    from . import quant as _q

    cfg = WhisperConfig.from_hparams(mf.hparams)
    if len(mf.tensors) == 0:
        return zero_params(cfg, dtype=dtype), cfg

    t = {name: rt.to_numpy() for name, rt in mf.tensors.items()}

    quantizable = {}
    if keep_quantized:
        from ..ops.quantized import unpack_to_codes
        for name, rt in mf.tensors.items():
            # cross_attn key/value projections run ONCE per window at
            # M = B*Ta (~100k rows) where XLA's MXU matmul beats the
            # BW-oriented dequant kernel; keep those dense (they are
            # <2% of decoder bytes), pack everything the token loop reads
            if name.endswith(("cross_attn.key.weight",
                              "cross_attn.value.weight")):
                continue
            if (name.startswith("decoder.blocks.")
                    and rt.ttype in (_q.GGML_TYPE_Q4_0, _q.GGML_TYPE_Q4_1,
                                     _q.GGML_TYPE_Q5_0, _q.GGML_TYPE_Q5_1,
                                     _q.GGML_TYPE_Q8_0)
                    and len(rt.shape) == 2
                    and rt.shape[1] % _q.QK == 0
                    and rt.shape[1] % 128 == 0 and rt.shape[0] % 128 == 0):
                codes, scales, mins = unpack_to_codes(rt.data, rt.ttype, rt.shape)
                quantizable[name] = {
                    "q": np.ascontiguousarray(codes.T),
                    "s": np.ascontiguousarray(scales.T),
                }
                if mins is not None:   # q4_1/q5_1 block offsets
                    quantizable[name]["m"] = np.ascontiguousarray(mins.T)

    def stack(prefix: str, n_layer: int, table) -> dict:
        out = {}
        for key, suffix in table:
            names = [f"{prefix}.blocks.{i}.{suffix}" for i in range(n_layer)]
            if names[0] in quantizable and all(n in quantizable for n in names):
                out[key] = {
                    "q": jnp.asarray(np.stack(
                        [quantizable[n]["q"] for n in names])),
                    "s": jnp.asarray(np.stack(
                        [quantizable[n]["s"] for n in names])),
                }
                if "m" in quantizable[names[0]]:
                    out[key]["m"] = jnp.asarray(np.stack(
                        [quantizable[n]["m"] for n in names]))
                continue
            arrs = [t[n] for n in names]
            out[key] = _cast(key, np.stack(arrs), dtype)
        return out

    enc = {
        "conv1_w": jnp.asarray(t["encoder.conv1.weight"], dtype=jnp.float32),
        "conv1_b": jnp.asarray(t["encoder.conv1.bias"].reshape(-1), dtype=jnp.float32),
        "conv2_w": jnp.asarray(t["encoder.conv2.weight"], dtype=jnp.float32),
        "conv2_b": jnp.asarray(t["encoder.conv2.bias"].reshape(-1), dtype=jnp.float32),
        "pos": jnp.asarray(t["encoder.positional_embedding"], dtype=jnp.float32),
        "ln_post_w": jnp.asarray(t["encoder.ln_post.weight"], dtype=jnp.float32),
        "ln_post_b": jnp.asarray(t["encoder.ln_post.bias"], dtype=jnp.float32),
        "blocks": stack("encoder", cfg.n_audio_layer, _ENC_BLOCK),
    }
    dec = {
        "tok_emb": _cast("tok_emb", t["decoder.token_embedding.weight"], dtype),
        "pos": jnp.asarray(t["decoder.positional_embedding"], dtype=jnp.float32),
        "ln_w": jnp.asarray(t["decoder.ln.weight"], dtype=jnp.float32),
        "ln_b": jnp.asarray(t["decoder.ln.bias"], dtype=jnp.float32),
        "blocks": stack("decoder", cfg.n_text_layer, _DEC_BLOCK),
    }
    return {"encoder": enc, "decoder": dec}, cfg


def random_params(cfg: WhisperConfig, seed: int = 0, dtype=jnp.bfloat16,
                  scale: float = 0.02, quantized_decoder: bool = False):
    """Random-weight parameters generated on device (benchmarks, dry runs).

    Timing-faithful stand-in for real checkpoints when trained weights are
    unavailable; layernorm scales are 1 so activations stay well-behaved.
    quantized_decoder: decoder block matmul weights as block-q8 codes
    ({"q": int8 K-major, "s": scales}) riding the Pallas dequant kernel.
    """
    import jax

    zeros = zero_params(cfg, dtype=dtype)
    leaves, treedef = jax.tree_util.tree_flatten(zeros)
    keys = jax.random.split(jax.random.PRNGKey(seed), len(leaves))

    def rnd(key, z):
        if z.ndim >= 2:
            return (jax.random.normal(key, z.shape, jnp.float32) * scale).astype(z.dtype)
        return z

    leaves = [rnd(k, z) for k, z in zip(keys, leaves)]
    params = jax.tree_util.tree_unflatten(treedef, leaves)
    # unit layernorm scales
    for side, ln_keys in (("encoder", ("ln_post_w",)), ("decoder", ("ln_w",))):
        for k in ln_keys:
            params[side][k] = jnp.ones_like(params[side][k])
        for k in list(params[side]["blocks"]):
            if k.endswith("ln_w"):
                params[side]["blocks"][k] = jnp.ones_like(params[side]["blocks"][k])

    if quantized_decoder:
        from . import quant as _q
        blocks = params["decoder"]["blocks"]
        key = jax.random.PRNGKey(seed + 1)
        for name in list(blocks):
            if name in ("xk_w", "xv_w"):   # per-window M~100k: XLA wins
                continue
            w = blocks[name]
            if not (hasattr(w, "ndim") and w.ndim == 3
                    and w.shape[-1] % _q.QK == 0
                    and w.shape[-1] % 128 == 0 and w.shape[-2] % 128 == 0):
                continue
            L, N, K = w.shape
            key, k1, k2 = jax.random.split(key, 3)
            codes = jax.random.randint(k1, (L, K, N), -127, 128, jnp.int8)
            scales = (jax.random.uniform(k2, (L, K // _q.QK, N),
                                         jnp.float32) * 1e-3 + 1e-4)
            blocks[name] = {"q": codes, "s": scales}
    return params


def zero_params(cfg: WhisperConfig, dtype=jnp.bfloat16):
    """Zero-weight parameters with correct shapes (stub-model test path)."""
    d_a, d_t = cfg.n_audio_state, cfg.n_text_state
    La, Lt = cfg.n_audio_layer, cfg.n_text_layer

    def z(shape, dt=jnp.float32):
        return jnp.zeros(shape, dtype=dt)

    enc_blocks = {
        "attn_ln_w": z((La, d_a)), "attn_ln_b": z((La, d_a)),
        "q_w": z((La, d_a, d_a), dtype), "q_b": z((La, d_a)),
        "k_w": z((La, d_a, d_a), dtype),
        "v_w": z((La, d_a, d_a), dtype), "v_b": z((La, d_a)),
        "o_w": z((La, d_a, d_a), dtype), "o_b": z((La, d_a)),
        "mlp_ln_w": z((La, d_a)), "mlp_ln_b": z((La, d_a)),
        "mlp0_w": z((La, 4 * d_a, d_a), dtype), "mlp0_b": z((La, 4 * d_a)),
        "mlp2_w": z((La, d_a, 4 * d_a), dtype), "mlp2_b": z((La, d_a)),
    }
    dec_blocks = {
        "attn_ln_w": z((Lt, d_t)), "attn_ln_b": z((Lt, d_t)),
        "q_w": z((Lt, d_t, d_t), dtype), "q_b": z((Lt, d_t)),
        "k_w": z((Lt, d_t, d_t), dtype),
        "v_w": z((Lt, d_t, d_t), dtype), "v_b": z((Lt, d_t)),
        "o_w": z((Lt, d_t, d_t), dtype), "o_b": z((Lt, d_t)),
        "mlp_ln_w": z((Lt, d_t)), "mlp_ln_b": z((Lt, d_t)),
        "mlp0_w": z((Lt, 4 * d_t, d_t), dtype), "mlp0_b": z((Lt, 4 * d_t)),
        "mlp2_w": z((Lt, d_t, 4 * d_t), dtype), "mlp2_b": z((Lt, d_t)),
        "xattn_ln_w": z((Lt, d_t)), "xattn_ln_b": z((Lt, d_t)),
        "xq_w": z((Lt, d_t, d_t), dtype), "xq_b": z((Lt, d_t)),
        "xk_w": z((Lt, d_t, d_t), dtype),
        "xv_w": z((Lt, d_t, d_t), dtype), "xv_b": z((Lt, d_t)),
        "xo_w": z((Lt, d_t, d_t), dtype), "xo_b": z((Lt, d_t)),
    }
    enc = {
        "conv1_w": z((d_a, cfg.n_mels, 3)), "conv1_b": z((d_a,)),
        "conv2_w": z((d_a, d_a, 3)), "conv2_b": z((d_a,)),
        "pos": z((cfg.n_audio_ctx, d_a)),
        "ln_post_w": z((d_a,)), "ln_post_b": z((d_a,)),
        "blocks": enc_blocks,
    }
    dec = {
        "tok_emb": z((cfg.n_vocab, d_t), dtype),
        "pos": z((cfg.n_text_ctx, d_t)),
        "ln_w": z((d_t,)), "ln_b": z((d_t,)),
        "blocks": dec_blocks,
    }
    return {"encoder": enc, "decoder": dec}
