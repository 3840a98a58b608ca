"""Streaming lm_head + candidate-selection kernel (ops/pallas_lm_head):
stage-1 statistics parity vs the dense chain, selection parity inside
fused_candidate_topk, and end-to-end beam-search equivalence with
config.use_fused_lm_head on a lane-aligned vocab. All interpret mode (CPU).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from mmdx_tpu.decode.beam_search import (
    beam_expand, beam_search, fused_candidate_topk,
)
from mmdx_tpu.ops.pallas_lm_head import CHUNK, LazyLogits, lm_head_stats


def test_lm_head_stats_match_dense():
    rng = np.random.default_rng(0)
    n, d, v = 16, 32, 384  # 3 chunks; vt auto = vp = 384 (single tile)
    hidden = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    emb = jnp.asarray(rng.standard_normal((v, d)), jnp.float32)
    mask = jnp.asarray(rng.random((n, v)) < 0.2)

    with pltpu.force_tpu_interpret_mode():
        logits_p, m, L, cmax = lm_head_stats(hidden, emb, mask)

    dense = np.asarray(hidden) @ np.asarray(emb).T
    np.testing.assert_allclose(np.asarray(logits_p)[:, :v], dense, rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(m), dense.max(-1), rtol=1e-6)
    ref_l = np.log(np.exp(dense - dense.max(-1, keepdims=True)).sum(-1))
    np.testing.assert_allclose(np.asarray(L), ref_l, rtol=1e-5, atol=1e-6)
    masked = np.where(np.asarray(mask), -np.inf, dense)
    ref_cmax = masked.reshape(n, v // CHUNK, CHUNK).max(-1)
    np.testing.assert_allclose(np.asarray(cmax)[:, : v // CHUNK], ref_cmax,
                               rtol=1e-5, atol=1e-5)


def test_lm_head_stats_ragged_final_tile():
    """V not a multiple of the vocab tile: the grid's ragged final block
    (out-of-bounds lanes masked in-kernel, cropped on output) yields exactly
    the dense statistics — no host-visible padding."""
    rng = np.random.default_rng(1)
    n, d, v = 8, 16, 640
    hidden = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    emb = jnp.asarray(rng.standard_normal((v, d)), jnp.float32)
    mask = jnp.asarray(rng.random((n, v)) < 0.1)

    with pltpu.force_tpu_interpret_mode():
        logits_p, m, L, cmax = lm_head_stats(hidden, emb, mask, vt=256)
    assert logits_p.shape == (n, v)
    assert cmax.shape == (n, v // CHUNK)
    dense = np.asarray(hidden) @ np.asarray(emb).T
    np.testing.assert_allclose(np.asarray(logits_p), dense, rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(m), dense.max(-1), rtol=1e-6)
    ref_l = np.log(np.exp(dense - dense.max(-1, keepdims=True)).sum(-1))
    np.testing.assert_allclose(np.asarray(L), ref_l, rtol=1e-5, atol=1e-6)
    ref_cmax = np.where(np.asarray(mask), -np.inf, dense).reshape(
        n, v // CHUNK, CHUNK).max(-1)
    np.testing.assert_allclose(np.asarray(cmax), ref_cmax, rtol=1e-5,
                               atol=1e-5)


@pytest.mark.parametrize("mask_eos", [False, True])
def test_fused_candidate_topk_lazy_matches_dense(mask_eos):
    rng = np.random.default_rng(2)
    b, nb, d, v = 3, 4, 32, 256
    n = b * nb
    hidden = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    emb = jnp.asarray(rng.standard_normal((v, d)), jnp.float32)
    scores = jnp.asarray(rng.standard_normal((b, nb)), jnp.float32)
    banned = jnp.asarray(rng.random((n, v)) < 0.1)
    lazy = LazyLogits(hidden, emb)
    dense_logits = lazy.materialize()

    kw = dict(banned=banned, mask_eos=jnp.asarray(mask_eos),
              eos_token_id=1, k=2 * nb, b=b, nb=nb)
    ref_vals, ref_idx = fused_candidate_topk(dense_logits, scores, **kw)
    with pltpu.force_tpu_interpret_mode():
        vals, idx = fused_candidate_topk(lazy, scores, **kw)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_idx))
    np.testing.assert_allclose(np.asarray(vals), np.asarray(ref_vals),
                               rtol=1e-5, atol=1e-5)


def test_lm_head_greedy_matches_dense_argmax():
    from mmdx_tpu.ops.pallas_lm_head import lm_head_greedy

    rng = np.random.default_rng(4)
    n, d, v = 8, 16, 640  # ragged final tile at vt=256
    hidden = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    emb = jnp.asarray(rng.standard_normal((v, d)), jnp.float32)
    mask = jnp.asarray(rng.random((n, v)) < 0.3)

    with pltpu.force_tpu_interpret_mode():
        cmax, carg = lm_head_greedy(hidden, emb, mask, vt=256)
    best = np.argmax(np.asarray(cmax), axis=-1)
    tok = best * CHUNK + np.asarray(carg)[np.arange(n), best]
    dense = np.where(np.asarray(mask), -np.inf,
                     np.asarray(hidden) @ np.asarray(emb).T)
    np.testing.assert_array_equal(tok, dense.argmax(-1))


def test_greedy_decode_fused_lm_head_end_to_end():
    """Greedy decode with use_fused_lm_head: identical tokens to the dense
    chain on a 256-vocab T5."""
    from mmdx_tpu.config import ReportDecoderConfig
    from mmdx_tpu.decode.greedy import greedy_decode
    from mmdx_tpu.models.t5 import T5

    cfg = ReportDecoderConfig(
        vocab_size=256, d_model=32, d_kv=8, d_ff=64, num_layers=2,
        num_decoder_layers=2, num_heads=4, relative_attention_num_buckets=8,
        relative_attention_max_distance=20, dropout=0.0,
    )
    rng = np.random.default_rng(5)
    ids = jnp.asarray(rng.integers(0, 256, (2, 5)))
    variables = T5(config=cfg).init(
        jax.random.PRNGKey(0), ids, jnp.ones((2, 5), jnp.int32), ids)

    B, K = 3, 4
    lmax = 1 + 12
    cond = jnp.asarray(
        rng.standard_normal((B, K, cfg.d_model)).astype(np.float32) * 2.0)
    enc_mask = jnp.ones((B, K), jnp.int32)

    outs = {}
    for fused in (False, True):
        c = dataclasses.replace(cfg, use_fused_lm_head=fused)
        model = T5(config=c)
        cache, static_kv = model.apply(variables, B, lmax, cond,
                                       method=T5.init_cache)
        self_bias = model.apply(variables, lmax, method=T5.decode_self_bias)

        def step_fn(tokens, pos, c_, _m=model):
            return _m.apply(variables, tokens, pos, c_, static_kv,
                            self_bias, enc_mask, method=T5.decode_step)

        with pltpu.force_tpu_interpret_mode():
            outs[fused] = np.asarray(greedy_decode(
                step_fn, cache, batch=B, vocab_size=c.vocab_size,
                max_new_tokens=12, min_new_tokens=4, no_repeat_ngram_size=3,
                eos_token_id=1, pad_token_id=0, decoder_start_token_id=0))

    np.testing.assert_array_equal(outs[True], outs[False])


def test_beam_search_fused_lm_head_end_to_end():
    """Full beam search with use_fused_lm_head on a 256-vocab T5: token
    sequences identical to the dense-chain run (random weights, no ties)."""
    from mmdx_tpu.config import ReportDecoderConfig
    from mmdx_tpu.models.t5 import T5

    cfg = ReportDecoderConfig(
        vocab_size=256, d_model=32, d_kv=8, d_ff=64, num_layers=2,
        num_decoder_layers=2, num_heads=4, relative_attention_num_buckets=8,
        relative_attention_max_distance=20, dropout=0.0,
    )
    rng = np.random.default_rng(3)
    ids = jnp.asarray(rng.integers(0, 256, (2, 5)))
    variables = T5(config=cfg).init(
        jax.random.PRNGKey(0), ids, jnp.ones((2, 5), jnp.int32), ids)

    B, K, nb = 2, 4, 4
    gen_kw = dict(num_beams=nb, max_new_tokens=12, min_new_tokens=4,
                  no_repeat_ngram_size=3, length_penalty=1.1,
                  early_stopping=True)
    lmax = 1 + gen_kw["max_new_tokens"]
    cond = jnp.asarray(beam_expand(
        rng.standard_normal((B, K, cfg.d_model)).astype(np.float32) * 2.0, nb))
    enc_mask = jnp.ones((B * nb, K), jnp.int32)

    outs = {}
    for fused in (False, True):
        c = dataclasses.replace(cfg, use_fused_lm_head=fused)
        model = T5(config=c)
        cache, static_kv = model.apply(variables, B * nb, lmax, cond, nb,
                                       method=T5.init_cache)
        self_bias = model.apply(variables, lmax, method=T5.decode_self_bias)

        def step_fn(tokens, pos, c_, anc, _m=model):
            return _m.apply(variables, tokens, pos, c_, anc, static_kv,
                            self_bias, enc_mask, method=T5.decode_step_beam)

        with pltpu.force_tpu_interpret_mode():
            seqs, sc = beam_search(
                step_fn, cache, batch=B, vocab_size=c.vocab_size,
                eos_token_id=1, pad_token_id=0, decoder_start_token_id=0,
                cache_mode="ancestry", **gen_kw)
        outs[fused] = (np.asarray(seqs), np.asarray(sc))

    np.testing.assert_array_equal(outs[True][0], outs[False][0])
    np.testing.assert_allclose(outs[True][1], outs[False][1], rtol=1e-4)


def test_greedy_fused_short_buffer_ngram_regression():
    """max_new_tokens=1 with no_repeat_ngram_size=3: the sequence buffer
    (Lmax=2) is shorter than the ngram, banned_ngram_mask returns None, and
    the streaming path must skip the OR instead of crashing at trace time."""
    from mmdx_tpu.config import ReportDecoderConfig
    from mmdx_tpu.decode.greedy import greedy_decode
    from mmdx_tpu.models.t5 import T5

    cfg = ReportDecoderConfig(
        vocab_size=256, d_model=32, d_kv=8, d_ff=64, num_layers=2,
        num_decoder_layers=2, num_heads=4, relative_attention_num_buckets=8,
        relative_attention_max_distance=20, dropout=0.0,
        use_fused_lm_head=True,
    )
    rng = np.random.default_rng(7)
    ids = jnp.asarray(rng.integers(0, 256, (2, 5)))
    variables = T5(config=cfg).init(
        jax.random.PRNGKey(0), ids, jnp.ones((2, 5), jnp.int32), ids)
    model = T5(config=cfg)
    B, K = 2, 4
    lmax = 1 + 1
    cond = jnp.asarray(
        rng.standard_normal((B, K, cfg.d_model)).astype(np.float32))
    enc_mask = jnp.ones((B, K), jnp.int32)
    cache, static_kv = model.apply(variables, B, lmax, cond,
                                   method=T5.init_cache)
    self_bias = model.apply(variables, lmax, method=T5.decode_self_bias)

    def step_fn(tokens, pos, c_):
        return model.apply(variables, tokens, pos, c_, static_kv,
                           self_bias, enc_mask, method=T5.decode_step)

    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(greedy_decode(
            step_fn, cache, batch=B, vocab_size=cfg.vocab_size,
            max_new_tokens=1, min_new_tokens=1, no_repeat_ngram_size=3,
            eos_token_id=1, pad_token_id=0, decoder_start_token_id=0))
    assert out.shape == (B, 2)
