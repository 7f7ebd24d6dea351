"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding tests use
xla_force_host_platform_device_count per the multi-chip test strategy.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"  # unit tests run on the virtual CPU mesh
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# the container's sitecustomize force-registers the TPU plugin before this
# file runs; pin the platform explicitly so tests always use the CPU mesh
jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REF_MODELS = "/root/reference/models"
SAMPLES = "/root/reference/samples"


@pytest.fixture(scope="session")
def stub_tiny_en_path():
    return f"{REF_MODELS}/for-tests-ggml-tiny.en.bin"


@pytest.fixture(scope="session")
def stub_tiny_path():
    return f"{REF_MODELS}/for-tests-ggml-tiny.bin"


@pytest.fixture(scope="session")
def jfk_wav_path():
    return f"{SAMPLES}/jfk.wav"


@pytest.fixture(scope="session")
def jfk_pcm(jfk_wav_path):
    from whisper_tpu.audio.io import load_wav
    pcm, _ = load_wav(jfk_wav_path)
    return pcm


def make_random_model(tmp_path, seed=0, n_vocab=None, ftype=0, qtype=None,
                      d=64, heads=4, enc_layers=2, dec_layers=3,
                      n_audio_ctx=64, n_text_ctx=48, n_mels=80):
    """Write a random-weight ggml model file with real-structure vocab.

    Reuses the real vocab/filters from the stub tiny.en model so special
    tokens, language shifts, and mel filters are authentic.
    """
    from whisper_tpu.weights.ggml_reader import read_ggml_file
    from whisper_tpu.weights.ggml_writer import write_ggml

    stub = read_ggml_file(f"{REF_MODELS}/for-tests-ggml-tiny.en.bin")
    rng = np.random.RandomState(seed)
    if n_vocab is None:
        n_vocab = stub.hparams.n_vocab

    hp = dict(n_vocab=n_vocab, n_audio_ctx=n_audio_ctx, n_audio_state=d,
              n_audio_head=heads, n_audio_layer=enc_layers,
              n_text_ctx=n_text_ctx, n_text_state=d, n_text_head=heads,
              n_text_layer=dec_layers, n_mels=n_mels)

    def r(*shape):
        return (rng.randn(*shape) * 0.05).astype(np.float32)

    tensors = {
        "encoder.conv1.weight": r(d, n_mels, 3),
        "encoder.conv1.bias": r(d),
        "encoder.conv2.weight": r(d, d, 3),
        "encoder.conv2.bias": r(d),
        "encoder.positional_embedding": r(n_audio_ctx, d),
        "encoder.ln_post.weight": 1.0 + r(d),
        "encoder.ln_post.bias": r(d),
        "decoder.token_embedding.weight": r(n_vocab, d),
        "decoder.positional_embedding": r(n_text_ctx, d),
        "decoder.ln.weight": 1.0 + r(d),
        "decoder.ln.bias": r(d),
    }
    for i in range(enc_layers):
        pre = f"encoder.blocks.{i}"
        tensors.update({
            f"{pre}.attn_ln.weight": 1.0 + r(d), f"{pre}.attn_ln.bias": r(d),
            f"{pre}.attn.query.weight": r(d, d), f"{pre}.attn.query.bias": r(d),
            f"{pre}.attn.key.weight": r(d, d),
            f"{pre}.attn.value.weight": r(d, d), f"{pre}.attn.value.bias": r(d),
            f"{pre}.attn.out.weight": r(d, d), f"{pre}.attn.out.bias": r(d),
            f"{pre}.mlp_ln.weight": 1.0 + r(d), f"{pre}.mlp_ln.bias": r(d),
            f"{pre}.mlp.0.weight": r(4 * d, d), f"{pre}.mlp.0.bias": r(4 * d),
            f"{pre}.mlp.2.weight": r(d, 4 * d), f"{pre}.mlp.2.bias": r(d),
        })
    for i in range(dec_layers):
        pre = f"decoder.blocks.{i}"
        tensors.update({
            f"{pre}.attn_ln.weight": 1.0 + r(d), f"{pre}.attn_ln.bias": r(d),
            f"{pre}.attn.query.weight": r(d, d), f"{pre}.attn.query.bias": r(d),
            f"{pre}.attn.key.weight": r(d, d),
            f"{pre}.attn.value.weight": r(d, d), f"{pre}.attn.value.bias": r(d),
            f"{pre}.attn.out.weight": r(d, d), f"{pre}.attn.out.bias": r(d),
            f"{pre}.cross_attn_ln.weight": 1.0 + r(d), f"{pre}.cross_attn_ln.bias": r(d),
            f"{pre}.cross_attn.query.weight": r(d, d), f"{pre}.cross_attn.query.bias": r(d),
            f"{pre}.cross_attn.key.weight": r(d, d),
            f"{pre}.cross_attn.value.weight": r(d, d), f"{pre}.cross_attn.value.bias": r(d),
            f"{pre}.cross_attn.out.weight": r(d, d), f"{pre}.cross_attn.out.bias": r(d),
            f"{pre}.mlp_ln.weight": 1.0 + r(d), f"{pre}.mlp_ln.bias": r(d),
            f"{pre}.mlp.0.weight": r(4 * d, d), f"{pre}.mlp.0.bias": r(4 * d),
            f"{pre}.mlp.2.weight": r(d, 4 * d), f"{pre}.mlp.2.bias": r(d),
        })

    tokens = [stub.vocab.id_to_token[i] for i in range(min(n_vocab, 50257))]
    path = str(tmp_path / f"random-{seed}.bin")
    write_ggml(path, hp, stub.filters, tokens, tensors, ftype=ftype, qtype=qtype)
    return path


REF_BUILD = "/tmp/wtpu_refbuild"


def build_reference_binary(target: str):
    """Build (CPU-only, cached in /tmp) a binary from the reference tree —
    the REAL reference engine, used by the differential fuzzer and the
    server byte-goldens.  Returns the executable path, or None when the
    toolchain/source is unavailable (callers skip)."""
    import shutil
    import subprocess

    exe = os.path.join(REF_BUILD, "bin", target)
    if os.path.exists(exe):
        return exe
    if shutil.which("cmake") is None or not os.path.isdir("/root/reference"):
        return None
    try:
        subprocess.run(
            ["cmake", "-S", "/root/reference", "-B", REF_BUILD,
             "-DGGML_NATIVE=OFF", "-DGGML_OPENMP=OFF",
             "-DCMAKE_BUILD_TYPE=Release", "-DWHISPER_BUILD_TESTS=OFF"],
            check=True, capture_output=True, timeout=600)
        subprocess.run(
            ["cmake", "--build", REF_BUILD, "-j", str(os.cpu_count() or 4),
             "--target", target],
            check=True, capture_output=True, timeout=1800)
    except (subprocess.SubprocessError, OSError):
        return None
    return exe if os.path.exists(exe) else None
