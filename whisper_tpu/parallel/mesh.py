"""Device-mesh sharding for multi-chip scale-out.

The reference's only distribution stories are a multi-backend graph
scheduler and a TCP RPC backend (SURVEY §2.4, §2.6).  The TPU-native
equivalent is a `jax.sharding.Mesh` with up to three logical axes:

  * "slice" — optional outer data parallelism ACROSS pod slices: traffic
              on this axis rides DCN, so only the batch dim maps to it
              (pure DP — no per-token collectives cross a slice boundary).
              The analog of the reference's ggml-rpc scale-out.
  * "data"  — batch of 30 s windows / streams within a slice (the analog
              of whisper_full_parallel's chunk data-parallelism,
              reference: src/whisper.cpp:6407-6520)
  * "model" — tensor parallelism over attention heads and MLP hidden dim
              (no analog in the reference; lets large-v3 scale past one
              chip's FLOPs); collectives ride ICI via XLA GSPMD.

We annotate parameters and batch inputs with NamedSharding and let the
XLA partitioner insert all_gather / reduce_scatter — no hand-written
collectives on the hot path.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int = 1, n_model: int = 1, n_slice: int = 1,
              devices=None) -> Mesh:
    """Build a ("data", "model") mesh — or ("slice", "data", "model") when
    n_slice > 1 — over the given (or all) devices.

    On real multi-slice hardware pass `devices=jax.devices()` from a
    jax.distributed-initialized process set; device order groups each
    slice's chips contiguously, so reshaping puts "slice" outermost and
    keeps "data"/"model" collectives on ICI."""
    if devices is None:
        devices = jax.devices()
    n = n_slice * n_data * n_model
    assert len(devices) >= n, f"need {n} devices, have {len(devices)}"
    if n_slice > 1:
        arr = np.asarray(devices[:n]).reshape(n_slice, n_data, n_model)
        return Mesh(arr, axis_names=("slice", "data", "model"))
    arr = np.asarray(devices[:n]).reshape(n_data, n_model)
    return Mesh(arr, axis_names=("data", "model"))


def data_axes(mesh: Mesh):
    """The axis (or axis tuple) batch dims shard over."""
    return (("slice", "data") if "slice" in mesh.axis_names else "data")


# Per-leaf PartitionSpec for the whisper param pytree.
# Head-parallel attention: QKV out-features sharded, out-proj in-features
# sharded (row/col parallel pairing: one psum per block, inserted by XLA).
_ENC_BLOCK_SPECS = {
    "attn_ln_w": P(), "attn_ln_b": P(),
    "q_w": P(None, "model", None), "q_b": P(None, "model"),
    "k_w": P(None, "model", None),
    "v_w": P(None, "model", None), "v_b": P(None, "model"),
    "o_w": P(None, None, "model"), "o_b": P(),
    "mlp_ln_w": P(), "mlp_ln_b": P(),
    "mlp0_w": P(None, "model", None), "mlp0_b": P(None, "model"),
    "mlp2_w": P(None, None, "model"), "mlp2_b": P(),
}
_DEC_BLOCK_SPECS = dict(_ENC_BLOCK_SPECS)
_DEC_BLOCK_SPECS.update({
    "xattn_ln_w": P(), "xattn_ln_b": P(),
    "xq_w": P(None, "model", None), "xq_b": P(None, "model"),
    "xk_w": P(None, "model", None),
    "xv_w": P(None, "model", None), "xv_b": P(None, "model"),
    "xo_w": P(None, None, "model"), "xo_b": P(),
})


def param_specs(params) -> dict:
    """PartitionSpec pytree matching the whisper params pytree."""
    enc = {k: P() for k in params["encoder"] if k != "blocks"}
    enc["blocks"] = {k: _ENC_BLOCK_SPECS[k] for k in params["encoder"]["blocks"]}
    dec = {k: P() for k in params["decoder"] if k != "blocks"}
    # vocab-sharded embedding: the logit matmul becomes column-parallel
    dec["tok_emb"] = P("model", None)
    dec["blocks"] = {k: _DEC_BLOCK_SPECS[k] for k in params["decoder"]["blocks"]}
    return {"encoder": enc, "decoder": dec}


def shard_params(params, mesh: Mesh):
    """Place the param pytree on the mesh with TP sharding."""
    specs = param_specs(params)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params, specs)


def batch_spec(mesh: Mesh) -> P:
    """Activations: batch over the data axes, replicated over "model"."""
    return P(data_axes(mesh))


def shard_batch(x, mesh: Mesh):
    return jax.device_put(x, NamedSharding(mesh, batch_spec(mesh)))


def kv_spec(mesh: Mesh) -> P:
    """KV layout (L, B, H, Dh, T): batch over the data axes, heads over
    "model".

    Applies to both the cross-attention KV stack (T = Ta) and the decoder
    self-attention cache (T = C).  Heads shard over "model" because the
    xk/xv/k/v projection out-features are "model"-sharded, so each model
    shard holds and attends over its own head slice with no collective
    until the out-projection psum."""
    return P(None, data_axes(mesh), "model", None, None)


def decode_window_shardings(mesh: Mesh, params,
                            quant_cross: bool = False) -> tuple:
    """in_shardings for the production `make_decode_window` signature:
    (params, k_cross, v_cross, prompt, pad_len, temperature, seek,
     seek_end, rng_key, row_live).

    quant_cross: k/v_cross are (codes (L,B,H,Dh,Ta), scales (L,B,H,Ta))
    pairs from cross_kv_q8 instead of single bf16 arrays.

    Explicit specs (rather than GSPMD propagation alone) pin the decode
    loop's layout: windows over the data axes, attention heads over
    "model", scalars/rng replicated.  Params carry no "slice"/"data" axis,
    so across slices they are replicated and every per-token collective
    stays within a slice (ICI); only input scatter touches DCN."""
    def ns(s):
        return NamedSharding(mesh, s)

    da = data_axes(mesh)
    p_sh = jax.tree_util.tree_map(
        ns, param_specs(params), is_leaf=lambda x: isinstance(x, P))
    cross = (ns(kv_spec(mesh)),
             ns(P(None, da, "model", None))) if quant_cross \
        else ns(kv_spec(mesh))
    # seek/seek_end are replicated: they are scalars on the serial path and
    # tiny (B,) vectors on the batch path — not worth a collective either way
    return (p_sh, cross, cross,
            ns(P(da, None)), ns(P(da)), ns(P()),
            ns(P()), ns(P()), ns(P()), ns(P(da)))


def decode_window_blob_shardings(mesh: Mesh, params,
                                quant_cross: bool = False) -> tuple:
    """in_shardings for the PACKED decode-window signature
    (params, k_cross, v_cross, blob) — see api._decode_window_fn.

    The (B+1, P+4) int32 blob is replicated: it is a few KB and GSPMD
    re-shards the unpacked per-row fields onto the data axes for free."""
    def ns(s):
        return NamedSharding(mesh, s)

    p_sh = jax.tree_util.tree_map(
        ns, param_specs(params), is_leaf=lambda x: isinstance(x, P))
    cross = (ns(kv_spec(mesh)),
             ns(P(None, data_axes(mesh), "model", None))) if quant_cross \
        else ns(kv_spec(mesh))
    return (p_sh, cross, cross, ns(P()))
