"""Whisper model: pure-JAX forward passes, TPU-first layout.

Re-derives the math of the reference ggml graphs
(conv stem: src/whisper.cpp:1989-2049, encoder: :2051-2282,
cross-KV precompute: :2285-2359, decoder: :2469-2847) as functional JAX.

TPU-first design decisions (deliberately NOT a translation of the graphs):
  * per-layer weights are stacked along a leading layer axis and the
    layer loop is a `lax.scan` — one compiled block regardless of depth
  * activations are (batch, time, state); attention uses (B, T, H, Dh)
    with `jnp.einsum` so XLA tiles straight onto the MXU
  * matmuls run in a configurable compute dtype (bfloat16 by default)
    with float32 accumulation; layernorm/softmax always float32
  * the decoder is expressed as a single-step function over a
    preallocated KV cache so the whole token loop can live inside one
    `lax.while_loop` on device (the reference pays a host round-trip per
    token, see SURVEY §3.1)

GELU uses the tanh approximation, matching ggml's GGML_OP_GELU
(the reference additionally routes it through an f16 lookup table, so
bit-exactness there is impossible by construction).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..weights.ggml_reader import Hparams

# canonical dims per released model (reference: README.md model table /
# models/convert-pt-to-ggml.py); order matches WhisperConfig fields
MODEL_DIMS = {
    "tiny": (51865, 1500, 384, 6, 4, 448, 384, 6, 4, 80),
    "tiny.en": (51864, 1500, 384, 6, 4, 448, 384, 6, 4, 80),
    "base": (51865, 1500, 512, 8, 6, 448, 512, 8, 6, 80),
    "base.en": (51864, 1500, 512, 8, 6, 448, 512, 8, 6, 80),
    "small": (51865, 1500, 768, 12, 12, 448, 768, 12, 12, 80),
    "small.en": (51864, 1500, 768, 12, 12, 448, 768, 12, 12, 80),
    "medium": (51865, 1500, 1024, 16, 24, 448, 1024, 16, 24, 80),
    "medium.en": (51864, 1500, 1024, 16, 24, 448, 1024, 16, 24, 80),
    "large-v1": (51865, 1500, 1280, 20, 32, 448, 1280, 20, 32, 80),
    "large-v2": (51865, 1500, 1280, 20, 32, 448, 1280, 20, 32, 80),
    "large-v3": (51866, 1500, 1280, 20, 32, 448, 1280, 20, 32, 128),
    "large-v3-turbo": (51866, 1500, 1280, 20, 32, 448, 1280, 20, 4, 128),
}


@dataclasses.dataclass(frozen=True)
class WhisperConfig:
    n_vocab: int
    n_audio_ctx: int
    n_audio_state: int
    n_audio_head: int
    n_audio_layer: int
    n_text_ctx: int
    n_text_state: int
    n_text_head: int
    n_text_layer: int
    n_mels: int
    model_type: str = "unknown"

    @classmethod
    def from_hparams(cls, hp: Hparams) -> "WhisperConfig":
        return cls(
            n_vocab=hp.n_vocab,
            n_audio_ctx=hp.n_audio_ctx,
            n_audio_state=hp.n_audio_state,
            n_audio_head=hp.n_audio_head,
            n_audio_layer=hp.n_audio_layer,
            n_text_ctx=hp.n_text_ctx,
            n_text_state=hp.n_text_state,
            n_text_head=hp.n_text_head,
            n_text_layer=hp.n_text_layer,
            n_mels=hp.n_mels,
            model_type=hp.model_type,
        )

    @property
    def head_dim_audio(self) -> int:
        return self.n_audio_state // self.n_audio_head

    @property
    def head_dim_text(self) -> int:
        return self.n_text_state // self.n_text_head


# Parameter pytrees are plain nested dicts of jnp arrays:
#
# params = {
#   "encoder": {
#     "conv1_w": (n_state, n_mels, 3), "conv1_b": (n_state,),
#     "conv2_w": (n_state, n_state, 3), "conv2_b": (n_state,),
#     "pos": (n_audio_ctx, n_state),
#     "ln_post_w"/"ln_post_b": (n_state,),
#     "blocks": {  # every leaf has leading dim L
#       "attn_ln_w","attn_ln_b","q_w","q_b","k_w","v_w","v_b","o_w","o_b",
#       "mlp_ln_w","mlp_ln_b","mlp0_w","mlp0_b","mlp2_w","mlp2_b",
#     },
#   },
#   "decoder": {
#     "tok_emb": (n_vocab, n_state), "pos": (n_text_ctx, n_state),
#     "ln_w"/"ln_b": (n_state,),
#     "blocks": { ... same as encoder plus
#       "xattn_ln_w","xattn_ln_b","xq_w","xq_b","xk_w","xv_w","xv_b",
#       "xo_w","xo_b" },
#   },
# }
#
# Linear weights keep the torch (out, in) layout; application is
# x @ w.T + b (ggml's mul_mat(w, x) computes the same contraction).


def _layernorm(x, w, b, eps: float = 1e-5):
    x = x.astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * w + b


def _linear(x, w, b=None, compute_dtype=jnp.bfloat16):
    if isinstance(w, dict):
        # block-quantized weight: {"q": (K, N) int8 codes, "s": (K//32, N),
        # ["m": (K//32, N) offsets for q4_1/q5_1]}
        # -> fused dequant-matmul Pallas kernel (ops/quantized.py)
        from ..ops.quantized import quantized_matmul
        shape = x.shape
        y = quantized_matmul(x.reshape(-1, shape[-1]).astype(compute_dtype),
                             w["q"], w["s"], w.get("m"))
        y = y.reshape(shape[:-1] + (w["q"].shape[-1],))
    else:
        y = jnp.dot(x.astype(compute_dtype), w.astype(compute_dtype).T,
                    preferred_element_type=jnp.float32)
    if b is not None:
        y = y + b
    return y


def _gelu(x):
    return jax.nn.gelu(x, approximate=True)


def _split_heads(x, n_head):
    b, t, d = x.shape
    return x.reshape(b, t, n_head, d // n_head)


def _merge_heads(x):
    b, t, h, dh = x.shape
    return x.reshape(b, t, h * dh)


def _attention(q, k, v, mask=None, compute_dtype=jnp.bfloat16):
    """q,k,v: (B, T, H, Dh). mask: additive, broadcastable to (B, H, Tq, Tk)."""
    dh = q.shape[-1]
    scale = dh ** -0.5
    qk = jnp.einsum("bqhd,bkhd->bhqk", q.astype(compute_dtype),
                    k.astype(compute_dtype),
                    preferred_element_type=jnp.float32) * scale
    if mask is not None:
        qk = qk + mask
    w = jax.nn.softmax(qk.astype(jnp.float32), axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", w.astype(compute_dtype),
                     v.astype(compute_dtype),
                     preferred_element_type=jnp.float32)
    return _merge_heads(out)


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------

def conv_stem(enc_params, mel, compute_dtype=jnp.bfloat16):
    """Mel (B, 2*n_ctx, n_mels) -> (B, n_ctx, n_state).

    conv1d(k=3,s=1,p=1)+GELU, conv1d(k=3,s=2,p=1)+GELU
    (reference: src/whisper.cpp:2033-2046).
    """
    x = mel.astype(compute_dtype)                       # (B, T, C_in)
    # lax.conv with NWC / WIO layouts: kernel (3, in, out)
    w1 = jnp.transpose(enc_params["conv1_w"], (2, 1, 0)).astype(compute_dtype)
    x = jax.lax.conv_general_dilated(
        x, w1, window_strides=(1,), padding=((1, 1),),
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.float32)
    x = _gelu(x + enc_params["conv1_b"])
    w2 = jnp.transpose(enc_params["conv2_w"], (2, 1, 0)).astype(compute_dtype)
    x = jax.lax.conv_general_dilated(
        x.astype(compute_dtype), w2, window_strides=(2,), padding=((1, 1),),
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.float32)
    x = _gelu(x + enc_params["conv2_b"])
    return x


def _flash_self_attention(q, k, v, compute_dtype):
    """Encoder self-attention via the Pallas flash kernel (7x the
    materialized-scores einsum at 1500 frames).  q/k/v: (B, T, H, Dh).
    Sequence is padded to a 128 multiple; pad keys are masked with
    segment ids."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        SegmentIds, flash_attention)

    B, T, H, Dh = q.shape
    Tp = ((T + 127) // 128) * 128
    pad = [(0, 0), (0, 0), (0, Tp - T), (0, 0)]

    def prep(x):
        return jnp.pad(x.transpose(0, 2, 1, 3).astype(compute_dtype),
                       pad[:2] + [pad[2], (0, 0)])

    qp, kp, vp = prep(q), prep(k), prep(v)
    seg = None
    if Tp != T:
        ids = jnp.concatenate([jnp.zeros((B, T), jnp.int32),
                               jnp.ones((B, Tp - T), jnp.int32)], axis=1)
        seg = SegmentIds(q=ids, kv=ids)
    out = flash_attention(qp, kp, vp, segment_ids=seg, causal=False,
                          sm_scale=Dh ** -0.5)
    return _merge_heads(out[:, :, :T].transpose(0, 2, 1, 3).astype(jnp.float32))


def _encoder_block(x, blk, n_head, compute_dtype, attn_impl="einsum"):
    ln = _layernorm(x, blk["attn_ln_w"], blk["attn_ln_b"])
    q = _linear(ln, blk["q_w"], blk["q_b"], compute_dtype)
    k = _linear(ln, blk["k_w"], None, compute_dtype)       # K has no bias
    v = _linear(ln, blk["v_w"], blk["v_b"], compute_dtype)
    if attn_impl in ("pallas", "pallas_interpret"):
        from ..ops.encoder_attention import self_attention
        attn = self_attention(
            _split_heads(q, n_head), _split_heads(k, n_head),
            _split_heads(v, n_head), compute_dtype,
            interpret=(attn_impl == "pallas_interpret"))
    elif attn_impl == "flash":
        attn = _flash_self_attention(
            _split_heads(q, n_head), _split_heads(k, n_head),
            _split_heads(v, n_head), compute_dtype)
    else:
        attn = _attention(_split_heads(q, n_head), _split_heads(k, n_head),
                          _split_heads(v, n_head), compute_dtype=compute_dtype)
    x = x + _linear(attn, blk["o_w"], blk["o_b"], compute_dtype)

    ln = _layernorm(x, blk["mlp_ln_w"], blk["mlp_ln_b"])
    h = _gelu(_linear(ln, blk["mlp0_w"], blk["mlp0_b"], compute_dtype))
    x = x + _linear(h, blk["mlp2_w"], blk["mlp2_b"], compute_dtype)
    return x


def _layernorm_dt(x, w, b, eps: float = 1e-5):
    """Layernorm for channels-first (B, D, T) activations: normalize over
    D (axis 1).  Same math as _layernorm on (B, T, D)."""
    x = x.astype(jnp.float32)
    mean = jnp.mean(x, axis=1, keepdims=True)
    var = jnp.var(x, axis=1, keepdims=True)
    return ((x - mean) * jax.lax.rsqrt(var + eps) * w[:, None]
            + b[:, None])


def _linear_dt(x, w, b=None, compute_dtype=jnp.bfloat16):
    """Channels-first linear: x (B, I, T), w torch-(O, I) -> (B, O, T).
    The (out, in) weight layout is used DIRECTLY (no .T), and the output
    keeps T in the lane dim."""
    y = jnp.einsum("oi,bit->bot", w.astype(compute_dtype),
                   x.astype(compute_dtype),
                   preferred_element_type=jnp.float32)
    if b is not None:
        y = y + b[:, None]
    return y


def _encoder_block_dt(x, blk, n_head, compute_dtype, t_valid: int,
                      interpret: bool = False):
    """Encoder layer on (B, D, Tp) channels-first activations.

    The whole layer runs lane-tight: QKV projections emit (B, D, T)
    directly, the head split (B, D, T) -> (B, H, Dh, T) is a pure
    reshape, and the Pallas attention kernel consumes exactly that
    layout — the per-layer (B,T,H,Dh)<->(B,H,Dh,T) transposes of the
    channels-last path vanish.  Pad columns beyond t_valid carry garbage
    but are masked as attention keys and sliced off at the end of
    encode()."""
    from ..ops.encoder_attention import encoder_attention

    B, D, Tp = x.shape
    Dh = D // n_head
    ln = _layernorm_dt(x, blk["attn_ln_w"], blk["attn_ln_b"])
    q = _linear_dt(ln, blk["q_w"], blk["q_b"], compute_dtype)
    k = _linear_dt(ln, blk["k_w"], None, compute_dtype)      # K has no bias
    v = _linear_dt(ln, blk["v_w"], blk["v_b"], compute_dtype)

    def heads(a):
        return a.reshape(B, n_head, Dh, Tp).astype(compute_dtype)

    attn = encoder_attention(heads(q), heads(k), heads(v), t_valid=t_valid,
                             interpret=interpret)
    attn = attn.reshape(B, D, Tp)
    x = x + _linear_dt(attn, blk["o_w"], blk["o_b"], compute_dtype)

    ln = _layernorm_dt(x, blk["mlp_ln_w"], blk["mlp_ln_b"])
    h = _gelu(_linear_dt(ln, blk["mlp0_w"], blk["mlp0_b"], compute_dtype))
    x = x + _linear_dt(h, blk["mlp2_w"], blk["mlp2_b"], compute_dtype)
    return x


def _encoder_block_pf(x, blk, n_head, compute_dtype, t_valid: int,
                      interpret: bool = False):
    """Projection-fused encoder layer: residual stays (B, Tp, D)
    channels-last (the layout the MXU GEMMs like), but the QKV
    projections emit the attention kernel's lane-tight (B, H, Dh, Tp)
    directly via einsum — the per-layer pad/transpose prep of the plain
    pallas path (3 transposes in + 1 out + pads, ~35% of encoder wall)
    becomes part of the projection GEMMs' output layout.

    x is padded to Tp (a BLOCK_Q multiple) ONCE by encode(); pad rows
    carry garbage activations but are masked as attention keys, and
    row-local ops (LN/MLP) never mix rows."""
    from ..ops.encoder_attention import encoder_attention

    B, Tp, D = x.shape
    Dh = D // n_head
    ln = _layernorm(x, blk["attn_ln_w"], blk["attn_ln_b"])
    lnc = ln.astype(compute_dtype)

    def proj_ht(w, b):
        # torch-(O, I) weight, O = H*Dh -> (B, H, Dh, Tp) in one GEMM
        wr = w.reshape(n_head, Dh, D).astype(compute_dtype)
        y = jnp.einsum("btd,hxd->bhxt", lnc, wr,
                       preferred_element_type=jnp.float32)
        if b is not None:
            y = y + b.reshape(n_head, Dh)[None, :, :, None]
        return y.astype(compute_dtype)

    q = proj_ht(blk["q_w"], blk["q_b"])
    k = proj_ht(blk["k_w"], None)                 # K has no bias
    v = proj_ht(blk["v_w"], blk["v_b"])
    attn = encoder_attention(q, k, v, t_valid=t_valid, interpret=interpret)

    # out-projection contracts the (H, Dh) pair straight back to (B,Tp,D)
    wo = blk["o_w"].reshape(D, n_head, Dh).astype(compute_dtype)
    o = jnp.einsum("bhxt,dhx->btd", attn.astype(compute_dtype), wo,
                   preferred_element_type=jnp.float32) + blk["o_b"]
    x = x + o

    ln = _layernorm(x, blk["mlp_ln_w"], blk["mlp_ln_b"])
    h = _gelu(_linear(ln, blk["mlp0_w"], blk["mlp0_b"], compute_dtype))
    x = x + _linear(h, blk["mlp2_w"], blk["mlp2_b"], compute_dtype)
    return x


def _encoder_block_btd(x, blk, n_head, compute_dtype, t_valid: int,
                       interpret: bool = False):
    """Fully transpose-free encoder layer: the attention kernel consumes
    the projections' natural (B, Tp, D) output and heads are lane slices
    inside the kernel (ops/encoder_attention.encoder_attention_btd).
    x is padded to Tp once by encode(); pad rows are masked as keys."""
    from ..ops.encoder_attention import encoder_attention_btd

    ln = _layernorm(x, blk["attn_ln_w"], blk["attn_ln_b"])
    q = _linear(ln, blk["q_w"], blk["q_b"], compute_dtype)
    k = _linear(ln, blk["k_w"], None, compute_dtype)       # K has no bias
    v = _linear(ln, blk["v_w"], blk["v_b"], compute_dtype)
    cd = compute_dtype
    attn = encoder_attention_btd(q.astype(cd), k.astype(cd), v.astype(cd),
                                 n_head=n_head, t_valid=t_valid,
                                 interpret=interpret)
    x = x + _linear(attn, blk["o_w"], blk["o_b"], compute_dtype)

    ln = _layernorm(x, blk["mlp_ln_w"], blk["mlp_ln_b"])
    h = _gelu(_linear(ln, blk["mlp0_w"], blk["mlp0_b"], compute_dtype))
    x = x + _linear(h, blk["mlp2_w"], blk["mlp2_b"], compute_dtype)
    return x


def default_encoder_attn_impl() -> str:
    """pallas on TPU, einsum elsewhere.

    Measured on v5e, large-v3 encoder at B=32: einsum 32.6 ms/window,
    ops/encoder_attention 22.0 ms/window (1.48x) — the win is keeping the
    (B, H, T, T) scores in VMEM instead of round-tripping ~5.8 GB/layer of
    f32 through HBM for softmax.  The stock jax flash kernel measured 2x
    SLOWER than einsum at the same shape (66 ms/window): its per-layer
    pad-to-128 + (B,H,T,Dh) transposes with lane-padded Dh=64 cost more
    than the scores it saves.  einsum stays the fallback (CPU tests, and
    any backend without Mosaic)."""
    # non-cpu == the TPU path (the axon remote platform also reports the
    # chip as TPU v5; same gate as api.py keep_quantized)
    return "pallas" if jax.default_backend() != "cpu" else "einsum"


def encode(params, mel, n_head: int, compute_dtype=jnp.bfloat16,
           attn_impl: str | None = None, out_layout: str = "btd"):
    """Full encoder: mel (B, 2*n_ctx, n_mels) -> (B, n_ctx, n_state).

    The shrunken-context speed hack (reference: whisper.h:504 audio_ctx)
    falls out of shape polymorphism: slice mel to 2*n_audio_ctx frames and
    the positional embedding slice below follows.

    out_layout="bdt" (channels-first output, pallas_dt only): skips the
    final lane transpose so cross_kv*(enc_layout="bdt") can consume the
    activations reshape-only — the whole encode+cross pipeline then runs
    without a single T-lane transpose.
    """
    if attn_impl is None:
        attn_impl = default_encoder_attn_impl()
    enc = params["encoder"]
    x = conv_stem(enc, mel, compute_dtype)
    n_ctx = x.shape[1]
    x = x + enc["pos"][:n_ctx]

    # pre-padded whole-stack variants: pad T to a BLOCK_Q multiple ONCE
    # outside the scan (pad rows are masked as attention keys via t_valid;
    # row-local ops never mix rows), run one scan over the chosen block
    # fn.  "pallas_dt" carries the residual channels-first (B, D, T); the
    # other two stay channels-last (B, T, D).
    _PADDED_BLOCKS = {
        # impl -> (block fn, channels_first)
        "pallas_dt": (_encoder_block_dt, True),    # one lane transpose in/out
        "pallas_pf": (_encoder_block_pf, False),   # lane-tight QKV via einsum
        "pallas_btd": (_encoder_block_btd, False), # heads as kernel lane slices
    }
    base = attn_impl.removesuffix("_interpret")
    if base in _PADDED_BLOCKS:
        from ..ops.encoder_attention import BLOCK_Q
        block_fn, channels_first = _PADDED_BLOCKS[base]
        interp = attn_impl.endswith("_interpret")
        Tp = ((n_ctx + BLOCK_Q - 1) // BLOCK_Q) * BLOCK_Q
        if channels_first:
            x = x.transpose(0, 2, 1)               # (B, D, T)
        if Tp != n_ctx:
            pad_t = ((0, 0), (0, 0), (0, Tp - n_ctx)) if channels_first \
                else ((0, 0), (0, Tp - n_ctx), (0, 0))
            x = jnp.pad(x, pad_t)

        def body_padded(carry, blk):
            return block_fn(carry, blk, n_head, compute_dtype,
                            t_valid=n_ctx, interpret=interp), None

        x, _ = jax.lax.scan(body_padded, x, enc["blocks"])
        if channels_first:
            if out_layout == "bdt":
                return _layernorm_dt(x[..., :n_ctx], enc["ln_post_w"],
                                     enc["ln_post_b"])
            x = x[..., :n_ctx].transpose(0, 2, 1)  # (B, T, D)
            return _layernorm(x, enc["ln_post_w"], enc["ln_post_b"])
        assert out_layout == "btd", \
            "out_layout='bdt' requires attn_impl='pallas_dt'"
        return _layernorm(x[:, :n_ctx], enc["ln_post_w"], enc["ln_post_b"])

    assert out_layout == "btd", \
        "out_layout='bdt' requires attn_impl='pallas_dt'"

    def body(carry, blk):
        return _encoder_block(carry, blk, n_head, compute_dtype,
                              attn_impl), None

    x, _ = jax.lax.scan(body, x, enc["blocks"])
    x = _layernorm(x, enc["ln_post_w"], enc["ln_post_b"])
    return x


# ---------------------------------------------------------------------------
# cross-attention KV precompute (reference: src/whisper.cpp:2285-2359)
# ---------------------------------------------------------------------------

def cross_kv(params, enc_out, n_head: int, compute_dtype=jnp.bfloat16,
             enc_layout: str = "btd"):
    """enc_out (B, Ta, D) -> (k_cross, v_cross): (L, B, H, Dh, Ta) each.

    Layout note: this stacked buffer is the biggest live tensor of a
    window AND is fully re-read on every decode step, so its layout sets
    the decode bandwidth floor.  TPU tiles the trailing two dims to
    (sublane, 128 lanes); any head-split layout with Dh=64 trailing pads
    the lane dim 2x.  (H, Dh, Ta) trailing (Dh, Ta) = (64, ~1500) is
    tight, and serves both contractions: QK^T (k as a (Dh, Ta) rhs) and
    attention@V (v with Ta contracted).
    """
    dec = params["decoder"]
    nh = n_head
    proj = _make_cross_proj(enc_out, nh, compute_dtype, enc_layout)

    def body(_, blk):
        return None, proj(blk)

    _, (ks, vs) = jax.lax.scan(body, None, dec["blocks"])
    return ks, vs


def _make_cross_proj(enc_out, nh, compute_dtype, enc_layout):
    """Per-layer cross K/V projection in the requested input layout.

    enc_layout="btd": (B, Ta, D) input — projection then the
    (B,Ta,H,Dh)->(B,H,Dh,Ta) lane transpose (2 per layer).
    enc_layout="bdt": channels-first (B, D, Ta) input from
    encode(out_layout="bdt") — projection emits (B, D, Ta) and the head
    split is a PURE RESHAPE; no transpose exists in the whole scan.
    Returns blk -> (k, v) with k/v (B, H, Dh, Ta) in compute dtype.
    """
    if enc_layout == "bdt":
        B, D, Ta = enc_out.shape
        Dh = D // nh

        def proj(blk):
            k = _linear_dt(enc_out, blk["xk_w"], None, compute_dtype)
            v = _linear_dt(enc_out, blk["xv_w"], blk["xv_b"], compute_dtype)
            return (k.reshape(B, nh, Dh, Ta).astype(compute_dtype),
                    v.reshape(B, nh, Dh, Ta).astype(compute_dtype))

        return proj

    def proj(blk):
        k = _linear(enc_out, blk["xk_w"], None, compute_dtype)
        v = _linear(enc_out, blk["xv_w"], blk["xv_b"], compute_dtype)
        k = _split_heads(k, nh).transpose(0, 2, 3, 1).astype(compute_dtype)
        v = _split_heads(v, nh).transpose(0, 2, 3, 1).astype(compute_dtype)
        return k, v

    return proj


def cross_kv_q8(params, enc_out, n_head: int, compute_dtype=jnp.bfloat16,
                enc_layout: str = "btd"):
    """cross_kv with int8 quantization fused into the layer scan.

    Returns ((L, B, H, Dh, Ta) int8 codes, (L, B, H, Ta) f32 scales) x2.
    Quantizing per layer inside the scan means the full bf16 (L, B, H, Dh,
    Ta) stack never materializes in HBM — at large-v3 B=64 that transient
    alone is ~7.9 GB and is what OOMs the two-step quantize-after path.
    """
    from ..ops.cross_attention import quantize_kv_bhdt
    dec = params["decoder"]
    proj = _make_cross_proj(enc_out, n_head, compute_dtype, enc_layout)

    def body(_, blk):
        k, v = proj(blk)
        kq, ks = quantize_kv_bhdt(k)
        vq, vs = quantize_kv_bhdt(v)
        return None, (kq, ks, vq, vs)

    _, (kq, ks, vq, vs) = jax.lax.scan(body, None, dec["blocks"])
    return (kq, ks), (vq, vs)


def cross_kv_q4(params, enc_out, n_head: int, compute_dtype=jnp.bfloat16,
                enc_layout: str = "btd"):
    """cross_kv with 4-bit quantization fused into the layer scan.

    Returns ((L, B, H, Dh//2, Ta) uint8 nibble-packed codes,
    (L, B, H, Ta) f32 scales) x2 — half the HBM footprint and decode
    traffic of cross_kv_q8 (the decode loop is ~85% cross-KV
    bandwidth-bound at large batch).  Group size for each 4-bit scale is
    one (head, position) vector of Dh values, like q8.  Accuracy: 4-bit
    KV is an opt-in speed/memory trade (cross_mode="einsum_q4") — unlike
    q8 it is NOT token-exact vs bf16 in general.
    """
    from ..ops.cross_attention import quantize_kv_bhdt_q4
    dec = params["decoder"]
    proj = _make_cross_proj(enc_out, n_head, compute_dtype, enc_layout)

    def body(_, blk):
        k, v = proj(blk)
        kq, ks = quantize_kv_bhdt_q4(k)
        vq, vs = quantize_kv_bhdt_q4(v)
        return None, (kq, ks, vq, vs)

    _, (kq, ks, vq, vs) = jax.lax.scan(body, None, dec["blocks"])
    return (kq, ks), (vq, vs)


def _cross_attention(xq, kc, vc, compute_dtype, mask=None):
    """Attention with keys/values in (B, H, Dh, T) layout;
    xq (B, Tq, H, Dh).  Returns merged (B, Tq, D)."""
    dh = xq.shape[-1]
    qk = jnp.einsum("bqhd,bhdt->bhqt", xq.astype(compute_dtype),
                    kc.astype(compute_dtype),
                    preferred_element_type=jnp.float32) * (dh ** -0.5)
    if mask is not None:
        qk = qk + mask
    w = jax.nn.softmax(qk, axis=-1)
    out = jnp.einsum("bhqt,bhdt->bqhd", w.astype(compute_dtype),
                     vc.astype(compute_dtype),
                     preferred_element_type=jnp.float32)
    return _merge_heads(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

def decode_prompt(params, tokens, positions, k_cross, v_cross, n_head: int,
                  self_mask=None, compute_dtype=jnp.bfloat16):
    """Parallel decode of a token block (prompt processing).

    tokens: (B, T) int32; positions: (T,) or (B, T) int32
    k_cross/v_cross: (L, B, H, Dh, Ta) (cross_kv layout)
    self_mask: additive mask broadcastable to (B, 1, T, T) (float32), or None
    Returns (logits (B, T, n_vocab), k_self (L, B, T, H, Dh), v_self).
    """
    dec = params["decoder"]
    nh = n_head
    # quantized cross-KV: ("q8", codes, scales) from cross_kv_q8 or
    # ("q4", packed, scales) from cross_kv_q4
    tagged = isinstance(k_cross, tuple)
    qtag = k_cross[0] if tagged else None

    x = dec["tok_emb"][tokens] + dec["pos"][positions]
    x = x.astype(jnp.float32)

    def body(carry, scanned):
        blk, kc, vc = scanned
        x = carry
        if tagged:
            # dequantize this layer's K/V (scales are per (head, position))
            kq, ksc = kc
            vq, vsc = vc
            if qtag in ("q4", "q4e"):
                from ..ops.cross_attention import unpack_q4_bhdt
                kq = unpack_q4_bhdt(kq, compute_dtype)
                vq = unpack_q4_bhdt(vq, compute_dtype)
            kc = kq.astype(compute_dtype) * ksc[:, :, None, :].astype(compute_dtype)
            vc = vq.astype(compute_dtype) * vsc[:, :, None, :].astype(compute_dtype)

        ln = _layernorm(x, blk["attn_ln_w"], blk["attn_ln_b"])
        q = _split_heads(_linear(ln, blk["q_w"], blk["q_b"], compute_dtype), nh)
        k = _split_heads(_linear(ln, blk["k_w"], None, compute_dtype), nh)
        v = _split_heads(_linear(ln, blk["v_w"], blk["v_b"], compute_dtype), nh)
        attn = _attention(q, k, v, self_mask, compute_dtype)
        x = x + _linear(attn, blk["o_w"], blk["o_b"], compute_dtype)

        ln = _layernorm(x, blk["xattn_ln_w"], blk["xattn_ln_b"])
        xq = _split_heads(_linear(ln, blk["xq_w"], blk["xq_b"], compute_dtype), nh)
        attn = _cross_attention(xq, kc, vc, compute_dtype)
        x = x + _linear(attn, blk["xo_w"], blk["xo_b"], compute_dtype)

        ln = _layernorm(x, blk["mlp_ln_w"], blk["mlp_ln_b"])
        h = _gelu(_linear(ln, blk["mlp0_w"], blk["mlp0_b"], compute_dtype))
        x = x + _linear(h, blk["mlp2_w"], blk["mlp2_b"], compute_dtype)
        return x, (k, v)

    xs_kc = tuple(k_cross[1:]) if tagged else k_cross
    xs_vc = tuple(v_cross[1:]) if tagged else v_cross
    x, (k_self, v_self) = jax.lax.scan(body, x, (dec["blocks"], xs_kc, xs_vc))

    x = _layernorm(x, dec["ln_w"], dec["ln_b"])
    logits = jnp.dot(x.astype(compute_dtype),
                     dec["tok_emb"].astype(compute_dtype).T,
                     preferred_element_type=jnp.float32)
    return logits, k_self, v_self


def decode_prompt_cross_qk(params, tokens, positions, k_cross, v_cross,
                           n_head: int, head_select,
                           self_mask=None, compute_dtype=jnp.bfloat16):
    """Teacher-forced decode that also returns selected cross-attention
    weights (the DTW alignment signal; reference saves KQ_soft_max of the
    alignment heads, src/whisper.cpp:2730-2747).

    head_select: (L, S, H) float32 one-hot rows selecting <=S heads per
    layer (zero rows = unused slot) — keeps the captured tensor small for
    deep models instead of materializing all L*H attention maps.
    k_cross/v_cross: (L, B, H, Dh, Ta) arrays, or the tagged quantized
    forms ("q8"/"q4", codes, scales) from cross_kv_q8/_q4 — the serving
    path keeps its cross-KV packed, so the DTW re-decode dequantizes per
    layer exactly like decode_prompt.
    Returns (logits (B, T, V), qk_sel (L, B, S, T, Ta) float32).
    """
    dec = params["decoder"]
    nh = n_head
    tagged = isinstance(k_cross, tuple)
    qtag = k_cross[0] if tagged else None

    x = dec["tok_emb"][tokens] + dec["pos"][positions]
    x = x.astype(jnp.float32)

    def body(carry, scanned):
        blk, kc, vc, sel = scanned
        x = carry
        if tagged:
            kq, ksc = kc
            vq, vsc = vc
            if qtag in ("q4", "q4e"):
                from ..ops.cross_attention import unpack_q4_bhdt
                kq = unpack_q4_bhdt(kq, compute_dtype)
                vq = unpack_q4_bhdt(vq, compute_dtype)
            kc = kq.astype(compute_dtype) * ksc[:, :, None, :].astype(compute_dtype)
            vc = vq.astype(compute_dtype) * vsc[:, :, None, :].astype(compute_dtype)

        ln = _layernorm(x, blk["attn_ln_w"], blk["attn_ln_b"])
        q = _split_heads(_linear(ln, blk["q_w"], blk["q_b"], compute_dtype), nh)
        k = _split_heads(_linear(ln, blk["k_w"], None, compute_dtype), nh)
        v = _split_heads(_linear(ln, blk["v_w"], blk["v_b"], compute_dtype), nh)
        attn = _attention(q, k, v, self_mask, compute_dtype)
        x = x + _linear(attn, blk["o_w"], blk["o_b"], compute_dtype)

        ln = _layernorm(x, blk["xattn_ln_w"], blk["xattn_ln_b"])
        xq = _split_heads(_linear(ln, blk["xq_w"], blk["xq_b"], compute_dtype), nh)

        # cross attention with explicit softmax so weights can be captured
        dh = xq.shape[-1]
        qk = jnp.einsum("bqhd,bhdt->bhqt", xq.astype(compute_dtype),
                        kc.astype(compute_dtype),
                        preferred_element_type=jnp.float32) * (dh ** -0.5)
        w = jax.nn.softmax(qk.astype(jnp.float32), axis=-1)   # (B, H, T, Ta)
        qk_sel = jnp.einsum("bhta,sh->bsta", w, sel,
                            preferred_element_type=jnp.float32)
        out = jnp.einsum("bhqt,bhdt->bqhd", w.astype(compute_dtype),
                         vc.astype(compute_dtype),
                         preferred_element_type=jnp.float32)
        x = x + _linear(_merge_heads(out), blk["xo_w"], blk["xo_b"],
                        compute_dtype)

        ln = _layernorm(x, blk["mlp_ln_w"], blk["mlp_ln_b"])
        h = _gelu(_linear(ln, blk["mlp0_w"], blk["mlp0_b"], compute_dtype))
        x = x + _linear(h, blk["mlp2_w"], blk["mlp2_b"], compute_dtype)
        return x, qk_sel

    xs_kc = tuple(k_cross[1:]) if tagged else k_cross
    xs_vc = tuple(v_cross[1:]) if tagged else v_cross
    x, qk_all = jax.lax.scan(
        body, x, (dec["blocks"], xs_kc, xs_vc, head_select))

    x = _layernorm(x, dec["ln_w"], dec["ln_b"])
    logits = jnp.dot(x.astype(compute_dtype),
                     dec["tok_emb"].astype(compute_dtype).T,
                     preferred_element_type=jnp.float32)
    return logits, qk_all


def _cross_attn_step(xq, kc, vc, compute_dtype):
    """Cross attention for one decode step; kc/vc select the path:

      * array (B, H, Dh, Ta)            — XLA einsum (default, cross_kv
                                          layout: no lane padding)
      * ("q8e", int8 (B, H, Dh, Ta), scales (B, H, Ta)) — XLA einsum,
        int8 K/V with exact per-position scale folding (halves the
        dominant decode traffic/memory, enabling 2x batch)
      * ("bhtd", k (B, H, Ta, Dh))      — fused Pallas kernel
      * {"q": int8 (B, H, Ta, Dh), "s"} — fused Pallas kernel, int8 K/V
    """
    if isinstance(kc, tuple) and kc[0] == "q8i":
        # int8 x int8 native MXU dots: q is quantized per (b, head) on the
        # fly, so no bf16 copy of K/V is ever materialized in HBM (the
        # "q8e" einsum path pays an int8->bf16 convert round-trip of the
        # full K/V every step)
        _, kq, ks = kc
        _, vq, vs = vc
        dh = xq.shape[-1]
        amax = jnp.max(jnp.abs(xq), axis=-1, keepdims=True)
        qs = jnp.maximum(amax, 1e-8) / 127.0          # (B, 1, H, 1)
        qi = jnp.clip(jnp.round(xq / qs), -127, 127).astype(jnp.int8)
        qk = jnp.einsum("bqhd,bhdt->bhqt", qi, kq,
                        preferred_element_type=jnp.int32)
        qk = (qk.astype(jnp.float32) * qs.transpose(0, 2, 1, 3)
              * ks[:, :, None, :] * (dh ** -0.5))
        w = jax.nn.softmax(qk, axis=-1)                # (B, H, 1, Ta)
        # fold the per-position V scale into w, then quantize w per (b, h)
        wv = w * vs[:, :, None, :]
        wmax = jnp.max(wv, axis=-1, keepdims=True)
        wsc = jnp.maximum(wmax, 1e-20) / 127.0
        wi = jnp.clip(jnp.round(wv / wsc), 0, 127).astype(jnp.int8)
        out = jnp.einsum("bhqt,bhdt->bqhd", wi, vq,
                         preferred_element_type=jnp.int32)
        out = out.astype(jnp.float32) * wsc.transpose(0, 2, 1, 3)
        return _merge_heads(out)
    if isinstance(kc, tuple) and kc[0] == "q8dt":
        from ..ops.cross_attention import cross_attention_decode_q8dt
        _, kq, ks = kc
        _, vq, vs = vc
        out = cross_attention_decode_q8dt(
            xq.transpose(0, 2, 1, 3).astype(compute_dtype), kq, ks, vq, vs)
        return _merge_heads(out.transpose(0, 2, 1, 3))
    if isinstance(kc, tuple) and kc[0] == "q4e":
        # nibble-packed 4-bit K/V (cross_kv_q4): contract the low- and
        # high-nibble halves as two separate dots so the elementwise
        # unpack fuses into each contraction's operand load — HBM reads
        # stay at 0.5 byte/element, no unpacked copy materializes
        _, kq, ks = kc
        _, vq, vs = vc
        dh = xq.shape[-1]
        xe = xq[..., 0::2].astype(compute_dtype)
        xo = xq[..., 1::2].astype(compute_dtype)
        klo = ((kq & 0xF).astype(jnp.int8) - 8).astype(compute_dtype)
        khi = ((kq >> 4).astype(jnp.int8) - 8).astype(compute_dtype)
        qk = (jnp.einsum("bqhd,bhdt->bhqt", xe, klo,
                         preferred_element_type=jnp.float32)
              + jnp.einsum("bqhd,bhdt->bhqt", xo, khi,
                           preferred_element_type=jnp.float32))
        qk = qk * ks[:, :, None, :] * (dh ** -0.5)
        w = jax.nn.softmax(qk, axis=-1)
        wv = (w * vs[:, :, None, :]).astype(compute_dtype)
        vlo = ((vq & 0xF).astype(jnp.int8) - 8).astype(compute_dtype)
        vhi = ((vq >> 4).astype(jnp.int8) - 8).astype(compute_dtype)
        oe = jnp.einsum("bhqt,bhdt->bqhd", wv, vlo,
                        preferred_element_type=jnp.float32)
        oo = jnp.einsum("bhqt,bhdt->bqhd", wv, vhi,
                        preferred_element_type=jnp.float32)
        out = jnp.stack([oe, oo], axis=-1).reshape(
            oe.shape[:-1] + (2 * oe.shape[-1],))
        return _merge_heads(out)
    if isinstance(kc, tuple) and kc[0] == "q8e":
        _, kq, ks = kc
        _, vq, vs = vc
        dh = xq.shape[-1]
        qk = jnp.einsum("bqhd,bhdt->bhqt", xq.astype(compute_dtype),
                        kq.astype(compute_dtype),
                        preferred_element_type=jnp.float32)
        qk = qk * ks[:, :, None, :] * (dh ** -0.5)     # scales (B, H, Ta)
        w = jax.nn.softmax(qk, axis=-1)
        wv = w * vs[:, :, None, :]
        out = jnp.einsum("bhqt,bhdt->bqhd", wv.astype(compute_dtype),
                         vq.astype(compute_dtype),
                         preferred_element_type=jnp.float32)
        return _merge_heads(out)
    if isinstance(kc, dict):
        from ..ops.cross_attention import cross_attention_decode_q8
        out = cross_attention_decode_q8(
            xq.transpose(0, 2, 1, 3).astype(compute_dtype),
            kc["q"], kc["s"], vc["q"], vc["s"])
        return _merge_heads(out.transpose(0, 2, 1, 3))
    if isinstance(kc, tuple):
        from ..ops.cross_attention import cross_attention_decode
        out = cross_attention_decode(
            xq.transpose(0, 2, 1, 3).astype(compute_dtype), kc[1], vc[1])
        return _merge_heads(out.transpose(0, 2, 1, 3))
    return _cross_attention(xq, kc, vc, compute_dtype)


def decode_step(params, tokens, pos_ids, cache_index, kv_self, k_cross, v_cross,
                kv_len, n_head: int, pad_len=None, compute_dtype=jnp.bfloat16,
                group: int = 1):
    """One autoregressive step over a preallocated KV cache.

    tokens: (B,) int32 — one new token per sequence
    pos_ids: (B,) int32 — positional-embedding index per sequence (they can
        differ when prompts of different lengths were left-padded)
    cache_index: scalar int32 — write index into the cache (same for all B)
    kv_self: dict {"k": (L, B, H, Dh, C), "v": ...} preallocated cache
        (lane-tight trailing layout, same rationale as cross_kv)
    kv_len: scalar int32 — number of valid cache entries AFTER this write
    pad_len: (B,) int32 or None — cache slots [0, pad_len) are left-padding
        from the prompt and must not be attended to
    k_cross/v_cross: (L, ...) stacked per-layer cross KV in any of the
        layouts accepted by _cross_attn_step
    group: rows per cross-KV entry — batched beam search packs
        (S streams x K beams) rows against S encoder outputs (group=K).
        Cross attention has no causal structure, so the K beams of a
        stream simply ride the query-position axis of one einsum against
        their shared cross-KV row: nothing is tiled in HBM.  Requires an
        einsum cross path (default array, q8e/q8i/q4e); the Pallas
        single-query kernels keep group=1.
    Returns (logits (B, n_vocab), updated kv_self).
    """
    dec = params["decoder"]
    nh = n_head
    C = kv_self["k"].shape[-1]

    x = dec["tok_emb"][tokens][:, None, :] + dec["pos"][pos_ids][:, None, :]
    x = x.astype(jnp.float32)                                  # (B, 1, D)

    # attention mask over cache positions: valid iff pad_len <= idx < kv_len
    idx = jnp.arange(C)
    valid = idx[None, :] < kv_len
    if pad_len is not None:
        valid = valid & (idx[None, :] >= pad_len[:, None])
    attn_mask = jnp.where(valid, 0.0, -jnp.inf).astype(jnp.float32)
    attn_mask = attn_mask[:, None, None, :]                     # (B,1,1,C)

    L = kv_self["k"].shape[0]
    B = kv_self["k"].shape[1]
    Dh = kv_self["k"].shape[3]

    def body(carry, scanned):
        """The full (L, B, H, Dh, C) caches ride the scan CARRY and each
        layer writes only its one new (1, B, H, Dh, 1) column in place —
        passing per-layer cache slabs through scan xs/ys instead measures
        ~3.5 ms/step at large-v3 B=32 (full-cache copies for while-carry
        aliasing + 5.6 MB/layer output re-stacking)."""
        blk, kc, vc, l = scanned
        x, kk, vv = carry

        ln = _layernorm(x, blk["attn_ln_w"], blk["attn_ln_b"])
        q = _split_heads(_linear(ln, blk["q_w"], blk["q_b"], compute_dtype), nh)
        k_new = _split_heads(_linear(ln, blk["k_w"], None, compute_dtype), nh)
        v_new = _split_heads(_linear(ln, blk["v_w"], blk["v_b"], compute_dtype), nh)

        # (B, 1, H, Dh) -> (1, B, H, Dh, 1) column write at [l, ..., idx]
        kk = jax.lax.dynamic_update_slice(
            kk, k_new.transpose(0, 2, 3, 1)[None].astype(kk.dtype),
            (l, 0, 0, 0, cache_index))
        vv = jax.lax.dynamic_update_slice(
            vv, v_new.transpose(0, 2, 3, 1)[None].astype(vv.dtype),
            (l, 0, 0, 0, cache_index))
        k_cache = jax.lax.dynamic_slice(
            kk, (l, 0, 0, 0, 0), (1, B, nh, Dh, C))[0]
        v_cache = jax.lax.dynamic_slice(
            vv, (l, 0, 0, 0, 0), (1, B, nh, Dh, C))[0]

        attn = _cross_attention(q, k_cache, v_cache, compute_dtype,
                                mask=attn_mask)
        x = x + _linear(attn, blk["o_w"], blk["o_b"], compute_dtype)

        ln = _layernorm(x, blk["xattn_ln_w"], blk["xattn_ln_b"])
        xq = _split_heads(_linear(ln, blk["xq_w"], blk["xq_b"], compute_dtype), nh)
        if group > 1:
            # (S*K, 1, H, Dh) -> (S, K, H, Dh): the K beams of a stream
            # become query positions against the stream's shared cross-KV
            Sg = xq.shape[0] // group
            xq_g = xq.reshape(Sg, group * xq.shape[1], nh, xq.shape[-1])
            attn = _cross_attn_step(xq_g, kc, vc, compute_dtype)
            attn = attn.reshape(xq.shape[0], xq.shape[1], -1)
        else:
            attn = _cross_attn_step(xq, kc, vc, compute_dtype)
        x = x + _linear(attn, blk["xo_w"], blk["xo_b"], compute_dtype)

        ln = _layernorm(x, blk["mlp_ln_w"], blk["mlp_ln_b"])
        h = _gelu(_linear(ln, blk["mlp0_w"], blk["mlp0_b"], compute_dtype))
        x = x + _linear(h, blk["mlp2_w"], blk["mlp2_b"], compute_dtype)
        return (x, kk, vv), None

    def scan_body(carry, scanned):
        blk, kc_l, vc_l, l = scanned
        if isinstance(k_cross, tuple):
            tag = k_cross[0]
            if tag in ("q8e", "q8dt", "q8i", "q4e"):
                kc_l, vc_l = (tag,) + kc_l, (tag,) + vc_l
            else:
                kc_l, vc_l = (tag, kc_l), (tag, vc_l)
        return body(carry, (blk, kc_l, vc_l, l))

    if isinstance(k_cross, tuple):
        two_part = k_cross[0] in ("q8e", "q8dt", "q8i", "q4e")
        xs_k = tuple(k_cross[1:]) if two_part else k_cross[1]
        xs_v = tuple(v_cross[1:]) if two_part else v_cross[1]
    else:
        xs_k, xs_v = k_cross, v_cross
    (x, k_cache, v_cache), _ = jax.lax.scan(
        scan_body, (x, kv_self["k"], kv_self["v"]),
        (dec["blocks"], xs_k, xs_v, jnp.arange(L)))

    x = _layernorm(x, dec["ln_w"], dec["ln_b"])
    logits = jnp.dot(x[:, 0].astype(compute_dtype),
                     dec["tok_emb"].astype(compute_dtype).T,
                     preferred_element_type=jnp.float32)
    return logits, {"k": k_cache, "v": v_cache}


def make_causal_mask(t: int, offset: int = 0) -> jnp.ndarray:
    """Additive causal mask (1, 1, T, T+offset) float32."""
    q = jnp.arange(t)[:, None] + offset
    k = jnp.arange(t + offset)[None, :]
    return jnp.where(k <= q, 0.0, -jnp.inf).astype(jnp.float32)[None, None]
