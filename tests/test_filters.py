"""Jitted logit-filter chain vs the host (numpy) oracle implementation."""

import numpy as np
import pytest

import jax.numpy as jnp

from whisper_tpu.decode.filters import (
    FilterConsts, FilterOptions, make_process_logits)
from whisper_tpu.decode.host_filters import process_logits_host
from whisper_tpu.weights.ggml_reader import read_ggml_file


@pytest.fixture(scope="module")
def consts():
    mf = read_ggml_file("/root/reference/models/for-tests-ggml-tiny.en.bin")
    return FilterConsts.from_vocab(mf.vocab, mf.hparams.n_audio_ctx)


CASES = [
    # (tokens_cur, has_ts, seek_delta, temperature)
    ([], False, 0, 0.0),                              # initial
    ([100], False, 0, 0.0),                           # one text token
    ([50400], False, 0, 0.0),                         # one ts token (last=ts, penult=ts)
    ([100, 50400], True, 74, 0.0),                    # text then ts
    ([50400, 50420], True, 114, 0.0),                 # ts pair
    ([100, 200], False, 0, 0.8),                      # temperature
]


@pytest.mark.parametrize("case", CASES)
def test_device_chain_matches_host(consts, case):
    tokens_cur, has_ts, seek_delta, temp = case
    opts = FilterOptions()
    rng = np.random.RandomState(hash(str(case)) % 2**31)
    logits = (rng.randn(consts.n_vocab) * 3).astype(np.float32)

    lg_h, lp_h, pr_h = process_logits_host(
        logits, consts, opts, temperature=temp, tokens_cur=tokens_cur,
        has_ts=has_ts, seek_delta=seek_delta if has_ts else 0)

    process = make_process_logits(consts, opts)
    is_initial = len(tokens_cur) == 0
    last_was_ts = len(tokens_cur) > 0 and tokens_cur[-1] >= consts.token_beg
    penult_was_ts = len(tokens_cur) < 2 or tokens_cur[-2] >= consts.token_beg
    lg_d, lp_d, pr_d = process(
        jnp.asarray(logits)[None], jnp.float32(temp),
        jnp.asarray([is_initial]), jnp.asarray([last_was_ts]),
        jnp.asarray([penult_was_ts]), jnp.asarray([has_ts]),
        jnp.asarray([seek_delta if has_ts else 0], jnp.int32))

    lg_d = np.asarray(lg_d[0])
    lp_d = np.asarray(lp_d[0])
    pr_d = np.asarray(pr_d[0])

    # same suppression pattern
    np.testing.assert_array_equal(np.isinf(lg_d), np.isinf(lg_h))
    m = ~np.isinf(lg_h)
    np.testing.assert_allclose(lg_d[m], lg_h[m], atol=1e-4)
    np.testing.assert_allclose(lp_d[m], lp_h[m], atol=1e-4)
    np.testing.assert_allclose(pr_d, pr_h, atol=1e-5)


def test_suppress_nst(consts):
    opts = FilterOptions(suppress_nst=True)
    rng = np.random.RandomState(0)
    logits = (rng.randn(consts.n_vocab)).astype(np.float32)
    lg_h, _, _ = process_logits_host(
        logits, consts, opts, temperature=0.0, tokens_cur=[100],
        has_ts=False, seek_delta=0)
    for tid in consts.nst_ids:
        assert np.isinf(lg_h[tid]) and lg_h[tid] < 0
