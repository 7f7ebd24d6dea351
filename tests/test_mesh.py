"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import whisper_tpu as wt
from conftest import make_random_model


def _noise(seconds, seed=0):
    return (np.random.RandomState(seed)
            .randn(16000 * seconds).astype(np.float32) * 0.1)


def _mkparams():
    p = wt.full_default_params()
    p.print_progress = False
    p.single_segment = True
    p.max_tokens = 5
    p.temperature_inc = 0.0
    return p


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_mesh_batch_matches_single(tmp_path):
    from whisper_tpu.parallel.batch import BatchTranscriber
    from whisper_tpu.parallel.mesh import make_mesh

    path = make_random_model(tmp_path, d=128, heads=8)
    streams = [_noise(2, seed=d) for d in range(4)]

    ctx = wt.WhisperContext.from_file(path)
    bt0 = BatchTranscriber(ctx, batch_size=4, params=_mkparams())
    ref = [[(s.t0, s.t1, s.text) for s in segs]
           for segs in bt0.transcribe(streams)]

    mesh = make_mesh(n_data=4, n_model=2)
    ctx2 = wt.WhisperContext.from_file(path)
    bt = BatchTranscriber(ctx2, batch_size=4, params=_mkparams(), mesh=mesh)
    out = [[(s.t0, s.t1, s.text) for s in segs]
           for segs in bt.transcribe(streams)]
    assert out == ref

    # a later SERIAL full() on the mesh-attached context must not inherit
    # the batch in_shardings (its B doesn't divide the data axis);
    # regression: pytree/sharding mismatch crash
    p = _mkparams()
    assert ctx2.full(p, streams[0]) == 0
    serial = [(s.t0, s.t1, s.text) for s in ctx2.result_all]
    assert serial == ref[0]


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_forward_matches_replicated(tmp_path):
    from whisper_tpu.models import whisper as wm
    from whisper_tpu.parallel.mesh import make_mesh, shard_params
    from whisper_tpu.weights.convert import params_from_ggml
    from whisper_tpu.weights.ggml_reader import read_ggml_file

    path = make_random_model(tmp_path, d=128, heads=8)
    mf = read_ggml_file(path)
    params, cfg = params_from_ggml(mf, dtype=jnp.float32)
    mel = jnp.asarray(_noise(1, seed=3)[:2 * 64 * 160]
                      .reshape(1, -1)[:, :128 * 100][:, :12800]
                      .reshape(1, 128, 100)[:, :, :80])

    mel = jnp.asarray(np.random.RandomState(0)
                      .randn(2, 128, 80).astype(np.float32))
    ref = np.asarray(wm.encode(params, mel, n_head=8,
                               compute_dtype=jnp.float32))

    mesh = make_mesh(n_data=2, n_model=4)
    sharded = shard_params(params, mesh)
    from jax.sharding import NamedSharding, PartitionSpec as P
    mel_s = jax.device_put(mel, NamedSharding(mesh, P("data")))
    out = np.asarray(jax.jit(
        lambda p, m: wm.encode(p, m, n_head=8, compute_dtype=jnp.float32)
    )(sharded, mel_s))
    np.testing.assert_allclose(out, ref, atol=2e-4)


def test_dryrun_multichip():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "graft_entry", "__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    n = min(8, len(jax.devices()))
    mod.dryrun_multichip(n)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_slice_mesh_batch_matches_single(tmp_path):
    """(slice, data, model) topology — DCN-style pure DP across slices.
    Batched transcription on 2 slices x 2 data x 2 model must equal the
    single-device result (the ggml-rpc scale-out role, SURVEY §2.6)."""
    from whisper_tpu.parallel.batch import BatchTranscriber
    from whisper_tpu.parallel.mesh import make_mesh

    path = make_random_model(tmp_path, d=128, heads=8)
    streams = [_noise(2, seed=d) for d in range(4)]

    ctx = wt.WhisperContext.from_file(path)
    bt0 = BatchTranscriber(ctx, batch_size=4, params=_mkparams())
    ref = [[(s.t0, s.t1, s.text) for s in segs]
           for segs in bt0.transcribe(streams)]

    mesh = make_mesh(n_data=2, n_model=2, n_slice=2)
    assert mesh.axis_names == ("slice", "data", "model")
    ctx2 = wt.WhisperContext.from_file(path)
    bt = BatchTranscriber(ctx2, batch_size=4, params=_mkparams(), mesh=mesh)
    out = [[(s.t0, s.t1, s.text) for s in segs]
           for segs in bt.transcribe(streams)]
    assert out == ref
