"""int8 beam KV cache (config.kv_cache_int8): accuracy guardrail + invariants.

The engine's turbo tier quantizes beam-decode K/V rows to int8 at write time
(per-(row, head) scales, T5Attention.step_beam) and dequantizes inside the
attention read — halving the decode loop's dominant HBM stream. This file
bounds the quantization error at the attention level, pins the fused Pallas
kernel (interpret mode) to the XLA int8 fallback, and asserts the segmented
decode machinery stays output-invariant with the extra scale leaf.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmdx_tpu.config import ReportDecoderConfig
from mmdx_tpu.decode.beam_search import beam_expand, beam_search
from mmdx_tpu.models.t5 import T5


def _cfg(**kw):
    return ReportDecoderConfig(
        vocab_size=61, d_model=32, d_kv=8, d_ff=64, num_layers=2,
        num_decoder_layers=2, num_heads=4, relative_attention_num_buckets=8,
        relative_attention_max_distance=20, dropout=0.0, **kw,
    )


@pytest.fixture(scope="module")
def setup():
    cfg = _cfg()
    model = T5(config=cfg)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, 61, (2, 5)))
    mask = jnp.ones((2, 5), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), ids, mask, ids)
    return cfg, variables


def _quantize_rows(x, h):
    """Reference per-(row, head) quantization (mirrors step_beam's writes)."""
    b, kk, hd = x.shape
    d = hd // h
    r = x.reshape(b, kk, h, d).astype(np.float32)
    s = np.maximum(np.abs(r).max(-1), 1e-12) / 127.0  # [b, kk, h]
    q = np.clip(np.round(r / s[..., None]), -127, 127).astype(np.int8)
    return q.reshape(b, kk, hd), s


def test_int8_attention_error_bound():
    """Quantized attention stays within quantization-noise of the exact
    bf16 kernel on random data — the quality guardrail for turbo decode."""
    from mmdx_tpu.ops.pallas_beam_attn import (
        beam_decode_attention, beam_decode_attention_int8,
    )

    rng = np.random.default_rng(1)
    b, nb, h, d = 4, 4, 4, 16
    kk = 24 * nb
    hd = h * d
    q = rng.standard_normal((b, nb, hd)).astype(np.float32) * 0.3
    k = rng.standard_normal((b, kk, hd)).astype(np.float32)
    v = rng.standard_normal((b, kk, hd)).astype(np.float32)
    bias = (rng.standard_normal((h, kk)) * 0.1).astype(np.float32)
    mask = np.zeros((b, nb, kk), np.float32)

    exact = beam_decode_attention(
        jnp.asarray(q, jnp.bfloat16),
        jnp.asarray(np.concatenate([k, v], -1), jnp.bfloat16),
        jnp.asarray(mask), jnp.asarray(bias), interpret=True,
    ).astype(jnp.float32)

    ki, sk = _quantize_rows(k, h)
    vi, sv = _quantize_rows(v, h)
    kv_i8 = jnp.asarray(np.concatenate([ki, vi], -1))
    kvs = jnp.asarray(
        np.concatenate([sk.transpose(0, 2, 1), sv.transpose(0, 2, 1)], 1))
    quant = beam_decode_attention_int8(
        jnp.asarray(q, jnp.bfloat16), kv_i8, kvs,
        jnp.asarray(mask), jnp.asarray(bias), interpret=True,
    ).astype(jnp.float32)

    rel = float(jnp.linalg.norm(quant - exact) / jnp.linalg.norm(exact))
    assert rel < 0.03, rel


def test_int8_kernel_matches_xla_fallback(setup):
    """The fused int8 kernel and the XLA int8 fallback read the SAME
    quantized cache and mirror each other's op order — decode_step_beam
    logits must agree to bf16 rounding."""
    cfg, variables = setup
    rng = np.random.default_rng(2)
    B, K, nb = 2, 4, 4
    lmax = 9
    cond = jnp.asarray(
        beam_expand(rng.standard_normal((B, K, cfg.d_model)).astype(np.float32), nb))
    enc_mask = jnp.ones((B * nb, K), jnp.int32)
    tokens = jnp.asarray(rng.integers(1, 61, (B * nb, 1)))
    anc = jnp.zeros((B, nb, lmax), jnp.int32)

    outs = {}
    for fused in (False, True):
        c = dataclasses.replace(cfg, kv_cache_int8=True,
                                use_fused_beam_attn=fused)
        m = T5(config=c)
        cache, static_kv = m.apply(variables, B * nb, lmax, cond, nb,
                                   method=T5.init_cache)
        self_bias = m.apply(variables, lmax, method=T5.decode_self_bias)
        from jax.experimental.pallas import tpu as pltpu

        with pltpu.force_tpu_interpret_mode():
            logits, _ = m.apply(
                variables, tokens, 0, cache, anc, static_kv, self_bias,
                enc_mask, method=T5.decode_step_beam)
        outs[fused] = np.asarray(logits)
    np.testing.assert_allclose(outs[True], outs[False], rtol=2e-2, atol=2e-3)


def test_int8_beam_search_runs_and_segments_are_invariant(setup):
    """End-to-end int8 beam search: valid output structure, and segmented
    cache growth (now with the [B, 2h, K] scale leaf riding along) is
    bit-invariant vs the unsegmented run."""
    cfg, variables = setup
    c = dataclasses.replace(cfg, kv_cache_int8=True)
    model = T5(config=c)
    rng = np.random.default_rng(3)
    B, K, nb = 3, 4, 4
    gen_kw = dict(num_beams=nb, max_new_tokens=16, min_new_tokens=4,
                  no_repeat_ngram_size=3, length_penalty=1.1,
                  early_stopping=True)
    lmax = 1 + gen_kw["max_new_tokens"]
    cond = jnp.asarray(
        beam_expand(rng.standard_normal((B, K, cfg.d_model)).astype(np.float32) * 2.0, nb))
    cache, static_kv = model.apply(variables, B * nb, lmax, cond, nb,
                                   method=T5.init_cache)
    assert cache[0]["kv"].dtype == jnp.int8
    assert cache[0]["kvs"].shape == (B, 2 * cfg.num_heads, nb * lmax)
    self_bias = model.apply(variables, lmax, method=T5.decode_self_bias)
    enc_mask = jnp.ones((B * nb, K), jnp.int32)

    def step_fn(tokens, pos, c_, anc):
        return model.apply(variables, tokens, pos, c_, anc, static_kv,
                           self_bias, enc_mask, method=T5.decode_step_beam)

    base, base_scores = beam_search(
        step_fn, cache, batch=B, vocab_size=cfg.vocab_size,
        eos_token_id=1, pad_token_id=0, decoder_start_token_id=0,
        cache_mode="ancestry", **gen_kw)
    base = np.asarray(base)
    assert base.shape == (B, lmax)
    assert ((base >= 0) & (base < cfg.vocab_size)).all()

    seg, seg_scores = beam_search(
        step_fn, cache, batch=B, vocab_size=cfg.vocab_size,
        eos_token_id=1, pad_token_id=0, decoder_start_token_id=0,
        cache_mode="ancestry", segment_caps=(5, 11), **gen_kw)
    np.testing.assert_array_equal(np.asarray(seg), base)
    np.testing.assert_allclose(np.asarray(seg_scores),
                               np.asarray(base_scores), rtol=0, atol=0)


def test_int8_flag_leaves_greedy_layout_alone(setup):
    """kv_cache_int8 only affects the beam (ancestry) layout; greedy decode
    keeps the exact bf16/f32 heads-major cache."""
    cfg, variables = setup
    c = dataclasses.replace(cfg, kv_cache_int8=True)
    model = T5(config=c)
    cond = jnp.zeros((4, 3, cfg.d_model), jnp.float32)
    cache, _ = model.apply(variables, 4, 7, cond, None, method=T5.init_cache)
    assert set(cache[0]) == {"k", "v"}
    assert cache[0]["k"].dtype != jnp.int8


def _greedy_setup(cfg, variables, beam_width):
    """(cache, step_fn) for greedy_decode over either cache layout."""
    model = T5(config=cfg)
    rng = np.random.default_rng(7)
    B, K = 3, 4
    lmax = 13
    cond = jnp.asarray(
        rng.standard_normal((B, K, cfg.d_model)).astype(np.float32) * 2.0)
    cache, static_kv = model.apply(variables, B, lmax, cond, beam_width,
                                   method=T5.init_cache)
    self_bias = model.apply(variables, lmax, method=T5.decode_self_bias)
    enc_mask = jnp.ones((B, K), jnp.int32)
    if beam_width == 1:
        anc0 = jnp.zeros((B, 1, lmax), jnp.int32)

        def step_fn(tokens, pos, c_):
            return model.apply(variables, tokens, pos, c_, anc0, static_kv,
                               self_bias, enc_mask, method=T5.decode_step_beam)
    else:
        def step_fn(tokens, pos, c_):
            return model.apply(variables, tokens, pos, c_, static_kv,
                               self_bias, enc_mask, method=T5.decode_step)
    return cache, step_fn, B, lmax


def test_greedy_flat_bf16_matches_heads_layout(setup):
    """Greedy over the FLAT cache (decode_step_beam at nb=1 — the int8-KV
    greedy plumbing, run here in exact f32) must produce the same tokens as
    the standard heads-major greedy."""
    from mmdx_tpu.decode.greedy import greedy_decode

    cfg, variables = setup
    gen = dict(max_new_tokens=12, min_new_tokens=3, no_repeat_ngram_size=3,
               eos_token_id=1, pad_token_id=0, decoder_start_token_id=0)

    cache_h, step_h, B, lmax = _greedy_setup(cfg, variables, None)
    base = np.asarray(greedy_decode(
        step_h, cache_h, batch=B, vocab_size=cfg.vocab_size, **gen))

    cache_f, step_f, _, _ = _greedy_setup(cfg, variables, 1)
    assert set(cache_f[0]) == {"kv"} and cache_f[0]["kv"].shape == (
        B, lmax, 2 * cfg.num_heads * cfg.d_kv)
    flat = np.asarray(greedy_decode(
        step_f, cache_f, batch=B, vocab_size=cfg.vocab_size, **gen))
    np.testing.assert_array_equal(flat, base)


def test_greedy_flat_int8_guardrail_and_segment_invariance(setup):
    """int8-KV greedy: (a) step-0 logits within quantization noise of the
    exact heads-layout step; (b) segmented flat-cache growth (32-aligned,
    scale leaf riding along) is bit-invariant vs the unsegmented run."""
    from mmdx_tpu.decode.greedy import greedy_decode

    cfg, variables = setup
    c8 = dataclasses.replace(cfg, kv_cache_int8=True)
    gen = dict(max_new_tokens=12, min_new_tokens=3, no_repeat_ngram_size=3,
               eos_token_id=1, pad_token_id=0, decoder_start_token_id=0)

    cache_h, step_h, B, lmax = _greedy_setup(cfg, variables, None)
    cache_q, step_q, _, _ = _greedy_setup(c8, variables, 1)
    assert cache_q[0]["kv"].dtype == jnp.int8
    assert cache_q[0]["kvs"].shape == (B, 2 * cfg.num_heads, lmax)

    tok = jnp.zeros((B, 1), jnp.int32)
    exact, _ = step_h(tok, 0, cache_h)
    quant, _ = step_q(tok, 0, cache_q)
    rel = float(jnp.linalg.norm(quant - exact) / jnp.linalg.norm(exact))
    assert rel < 0.03, rel

    base = np.asarray(greedy_decode(
        step_q, cache_q, batch=B, vocab_size=cfg.vocab_size, **gen))
    assert ((base >= 0) & (base < cfg.vocab_size)).all()
    seg = np.asarray(greedy_decode(
        step_q, cache_q, batch=B, vocab_size=cfg.vocab_size,
        segment_caps=(5, 9), **gen))
    np.testing.assert_array_equal(seg, base)


def test_greedy_flat_bf16_segment_invariance(setup):
    """Flat bf16 greedy (8-aligned caps) segments without changing outputs."""
    from mmdx_tpu.decode.greedy import greedy_decode

    cfg, variables = setup
    gen = dict(max_new_tokens=12, min_new_tokens=3, no_repeat_ngram_size=3,
               eos_token_id=1, pad_token_id=0, decoder_start_token_id=0)
    cache_f, step_f, B, _ = _greedy_setup(cfg, variables, 1)
    base = np.asarray(greedy_decode(
        step_f, cache_f, batch=B, vocab_size=cfg.vocab_size, **gen))
    seg = np.asarray(greedy_decode(
        step_f, cache_f, batch=B, vocab_size=cfg.vocab_size,
        segment_caps=(4, 8), **gen))
    np.testing.assert_array_equal(seg, base)


def test_turbo_engine_greedy_routes_flat(monkeypatch):
    """With MMDX_KV_INT8=1 opted in (int8 KV is measured-slower on v5e so no
    longer a turbo default), greedy generation compiles the FLAT int8-KV
    program (engine key flat_greedy=True); MMDX_GREEDY_FLAT=0 reverts to
    heads-major. Runs the whole jitted program on CPU via the XLA int8
    fallback."""
    from mmdx_tpu.checkpoints.bundle import new_random_bundle
    from mmdx_tpu.runtime.engine import InferenceEngine

    bundle = new_random_bundle(seed=0, small=True)
    rng = np.random.default_rng(0)
    imgs = [rng.integers(0, 256, (96, 96, 3), dtype=np.uint8)] * 2

    monkeypatch.setenv("MMDX_KV_INT8", "1")
    eng = InferenceEngine(bundle, mode="turbo")
    assert eng.model_config.report.kv_cache_int8
    _, zi, zt = eng.classify_batch(imgs, ["a cough", "b fever"])
    gen = dataclasses.replace(bundle.config.generation,
                              max_new_tokens=8, min_new_tokens=2)
    reps = eng.generate_reports(zi, zt, gen, greedy=True)
    assert len(reps) == 2 and all(isinstance(r, str) for r in reps)
    keys = [k for k in eng._generate_cache if k[2]]  # greedy entries
    assert keys and all(k[4] for k in keys), keys  # flat_greedy=True

    monkeypatch.setenv("MMDX_GREEDY_FLAT", "0")
    eng2 = InferenceEngine(bundle, mode="turbo")
    _, zi2, zt2 = eng2.classify_batch(imgs, ["a cough", "b fever"])
    eng2.generate_reports(zi2, zt2, gen, greedy=True)
    keys2 = [k for k in eng2._generate_cache if k[2]]
    assert keys2 and not any(k[4] for k in keys2), keys2


def test_greedy_deferred_kv_writes_token_parity(setup):
    """Greedy with deferred KV writes (attend over the old cache + the own
    token as an appended score column — exact full softmax) must produce the
    same tokens as the standard write-then-attend step."""
    from mmdx_tpu.decode.greedy import greedy_decode

    cfg, variables = setup
    gen = dict(max_new_tokens=12, min_new_tokens=3, no_repeat_ngram_size=3,
               eos_token_id=1, pad_token_id=0, decoder_start_token_id=0)

    cache_s, step_s, B, lmax = _greedy_setup(cfg, variables, None)
    base = np.asarray(greedy_decode(
        step_s, cache_s, batch=B, vocab_size=cfg.vocab_size, **gen))

    cfg_d = dataclasses.replace(cfg, deferred_kv_writes=True)
    cache_d, step_d, _, _ = _greedy_setup(cfg_d, variables, None)
    deferred = np.asarray(greedy_decode(
        step_d, cache_d, batch=B, vocab_size=cfg.vocab_size, **gen))
    np.testing.assert_array_equal(deferred, base)

    # cache contents written identically (one decode_step probe)
    model = T5(config=cfg_d)
    tok = jnp.asarray([[3], [9], [4]], jnp.int32)
    cond = jnp.zeros((B, 4, cfg.d_model), jnp.float32)
    c0, static_kv = model.apply(variables, B, lmax, cond, None,
                                method=T5.init_cache)
    bias = model.apply(variables, lmax, method=T5.decode_self_bias)
    enc_mask = jnp.ones((B, 4), jnp.int32)
    _, c_def = model.apply(variables, tok, 0, c0, static_kv, bias, enc_mask,
                           method=T5.decode_step)
    model_s = T5(config=cfg)
    _, c_std = model_s.apply(variables, tok, 0, c0, static_kv, bias, enc_mask,
                             method=T5.decode_step)
    for a, b in zip(__import__("jax").tree.leaves(c_def),
                    __import__("jax").tree.leaves(c_std)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_greedy_chunked_logits_token_parity():
    """Greedy over producer-chunked [N, C, 128] logits (chunked ban + masked
    chunk max/argmax) produces the same tokens as the flat [N, V] chain,
    incl. the no-repeat-ngram ban and min-length eos masking."""
    from mmdx_tpu.decode.greedy import greedy_decode

    from mmdx_tpu.config import ReportDecoderConfig

    cfg = ReportDecoderConfig(  # 128-aligned vocab -> chunked path activates
        vocab_size=512, d_model=32, d_kv=8, d_ff=64, num_layers=2,
        num_decoder_layers=2, num_heads=4, relative_attention_num_buckets=8,
        relative_attention_max_distance=20, dropout=0.0,
    )
    model = T5(config=cfg)
    rng = np.random.default_rng(1)
    ids = jnp.asarray(rng.integers(0, 512, (2, 5)))
    mask = jnp.ones((2, 5), jnp.int32)
    variables = model.init(jax.random.PRNGKey(1), ids, mask, ids)

    gen = dict(max_new_tokens=14, min_new_tokens=4, no_repeat_ngram_size=2,
               eos_token_id=1, pad_token_id=0, decoder_start_token_id=0)

    cache_f, step_f, B, lmax = _greedy_setup(cfg, variables, None)
    flat = np.asarray(greedy_decode(
        step_f, cache_f, batch=B, vocab_size=cfg.vocab_size, **gen))

    cfg_c = dataclasses.replace(cfg, chunked_step_logits=True)
    cache_c, step_c, _, _ = _greedy_setup(cfg_c, variables, None)
    chunked = np.asarray(greedy_decode(
        step_c, cache_c, batch=B, vocab_size=cfg.vocab_size, **gen))
    np.testing.assert_array_equal(chunked, flat)
