"""Token-level parity of our jit beam search / greedy decode vs HF ``generate``
on the same tiny random T5 (the reference's generation settings, scaled down)."""
import numpy as np
import pytest
import torch

from mmdx_tpu.checkpoints.torch_import import import_hf_t5
from mmdx_tpu.config import ReportDecoderConfig
from mmdx_tpu.decode.beam_search import beam_expand, beam_search
from mmdx_tpu.decode.greedy import greedy_decode
from mmdx_tpu.models.t5 import T5


def _cfgs(vocab=61):
    from transformers import T5Config

    hf = T5Config(
        vocab_size=vocab, d_model=32, d_kv=8, d_ff=64, num_layers=2,
        num_decoder_layers=2, num_heads=4, relative_attention_num_buckets=8,
        relative_attention_max_distance=20, dropout_rate=0.0,
        tie_word_embeddings=True, decoder_start_token_id=0, pad_token_id=0,
        eos_token_id=1,
    )
    ours = ReportDecoderConfig(
        vocab_size=vocab, d_model=32, d_kv=8, d_ff=64, num_layers=2,
        num_decoder_layers=2, num_heads=4, relative_attention_num_buckets=8,
        relative_attention_max_distance=20, dropout=0.0,
    )
    return hf, ours


@pytest.fixture(scope="module", params=[4, 5])
def pair(request):
    from transformers import T5ForConditionalGeneration

    torch.manual_seed(request.param)
    hf_cfg, our_cfg = _cfgs()
    oracle = T5ForConditionalGeneration(hf_cfg).eval()
    params = import_hf_t5(oracle.state_dict(), num_layers=2)
    model = T5(config=our_cfg)
    return oracle, model, {"params": params}, our_cfg


def _hf_generate(oracle, cond, **kw):
    from transformers.modeling_outputs import BaseModelOutput

    with torch.no_grad():
        return oracle.generate(
            encoder_outputs=BaseModelOutput(last_hidden_state=torch.from_numpy(cond)),
            eos_token_id=1, pad_token_id=0, **kw,
        ).numpy()


def _our_step_fn(model, variables, static_kv, self_bias, enc_mask,
                 cache_mode="gather"):
    import jax.numpy as jnp

    enc_mask = jnp.asarray(enc_mask)

    if cache_mode == "ancestry":
        def step_fn(tokens, pos, cache, anc):
            return model.apply(variables, tokens, pos, cache, anc, static_kv,
                               self_bias, enc_mask, method=T5.decode_step_beam)
    else:
        def step_fn(tokens, pos, cache):
            return model.apply(variables, tokens, pos, cache, static_kv,
                               self_bias, enc_mask, method=T5.decode_step)

    return step_fn


def _compare(ours, hf, fill=1):
    """HF crops its static output to the longest row; we keep fixed width padded
    with HF's fill value (pad_token_id or eos_token_id -> 1 here)."""
    ours = np.asarray(ours)
    l = hf.shape[1]
    np.testing.assert_array_equal(ours[:, :l], hf)
    assert np.all(ours[:, l:] == fill)


@pytest.mark.parametrize(
    "gen_kw",
    [
        dict(num_beams=4, max_new_tokens=16, min_new_tokens=4,
             no_repeat_ngram_size=3, length_penalty=1.1, early_stopping=True),
        dict(num_beams=4, max_new_tokens=20, min_new_tokens=12,
             no_repeat_ngram_size=3, length_penalty=1.0, early_stopping=False),
        dict(num_beams=3, max_new_tokens=14, min_new_tokens=1,
             no_repeat_ngram_size=2, length_penalty=2.0, early_stopping=True),
    ],
)
@pytest.mark.parametrize("cache_mode", ["gather", "ancestry"])
def test_beam_search_token_parity(pair, rng, gen_kw, cache_mode):
    import jax.numpy as jnp

    oracle, model, variables, cfg = pair
    B, K = 3, 4
    cond = rng.standard_normal((B, K, cfg.d_model)).astype(np.float32) * 2.0

    hf_out = _hf_generate(oracle, cond, **gen_kw)

    nb = gen_kw["num_beams"]
    lmax = 1 + gen_kw["max_new_tokens"]
    cond_j = jnp.asarray(beam_expand(cond, nb))
    cache, static_kv = model.apply(
        variables, B * nb, lmax, cond_j,
        nb if cache_mode == "ancestry" else None, method=T5.init_cache,
    )
    self_bias = model.apply(variables, lmax, method=T5.decode_self_bias)
    enc_mask = np.ones((B * nb, K), np.int32)
    step_fn = _our_step_fn(model, variables, static_kv, self_bias, enc_mask,
                           cache_mode)

    ours, _ = beam_search(
        step_fn, cache, batch=B, vocab_size=cfg.vocab_size,
        eos_token_id=1, pad_token_id=0, decoder_start_token_id=0,
        cache_mode=cache_mode, **gen_kw,
    )
    _compare(ours, hf_out)


def test_segmented_decode_is_output_invariant(pair, rng):
    """Segmented cache growth (segment_caps) must not change a single token,
    beam or greedy — the causal bias masks not-yet-written keys."""
    import jax.numpy as jnp

    oracle, model, variables, cfg = pair
    B, K, nb = 3, 4, 4
    gen_kw = dict(num_beams=nb, max_new_tokens=16, min_new_tokens=4,
                  no_repeat_ngram_size=3, length_penalty=1.1, early_stopping=True)
    cond = rng.standard_normal((B, K, cfg.d_model)).astype(np.float32) * 2.0
    lmax = 1 + gen_kw["max_new_tokens"]
    cond_j = jnp.asarray(beam_expand(cond, nb))
    cache, static_kv = model.apply(variables, B * nb, lmax, cond_j, nb,
                                   method=T5.init_cache)
    self_bias = model.apply(variables, lmax, method=T5.decode_self_bias)
    enc_mask = np.ones((B * nb, K), np.int32)
    step_fn = _our_step_fn(model, variables, static_kv, self_bias, enc_mask,
                           "ancestry")
    base, base_scores = beam_search(
        step_fn, cache, batch=B, vocab_size=cfg.vocab_size,
        cache_mode="ancestry", **gen_kw)
    seg, seg_scores = beam_search(
        step_fn, cache, batch=B, vocab_size=cfg.vocab_size,
        cache_mode="ancestry", segment_caps=(5, 11), **gen_kw)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(seg))
    # token-exact; scores may drift ~1 ULP (the masked not-yet-written keys
    # contribute exp(-inf-ish)=0 terms whose count changes the f32 softmax
    # accumulation order between segment shapes)
    np.testing.assert_allclose(np.asarray(base_scores), np.asarray(seg_scores),
                               rtol=1e-5, atol=1e-6)

    # greedy
    cache_g, static_g = model.apply(variables, B, lmax, jnp.asarray(cond),
                                    method=T5.init_cache)
    step_g = _our_step_fn(model, variables, static_g, self_bias,
                          np.ones((B, K), np.int32))
    g_base = greedy_decode(
        step_g, cache_g, batch=B, vocab_size=cfg.vocab_size, max_new_tokens=16,
        min_new_tokens=4, no_repeat_ngram_size=3, eos_token_id=1, pad_token_id=0)
    g_seg = greedy_decode(
        step_g, cache_g, batch=B, vocab_size=cfg.vocab_size, max_new_tokens=16,
        min_new_tokens=4, no_repeat_ngram_size=3, eos_token_id=1, pad_token_id=0,
        segment_caps=(5, 11))
    np.testing.assert_array_equal(np.asarray(g_base), np.asarray(g_seg))


def test_engine_decode_segments_env(rng, monkeypatch):
    """MMDX_DECODE_SEGMENTS changes only speed, never tokens, and distinct
    settings get distinct compiled programs (cache keyed by caps)."""
    import jax.numpy as jnp

    from mmdx_tpu.checkpoints.bundle import new_random_bundle
    from mmdx_tpu.runtime.engine import InferenceEngine

    bundle = new_random_bundle(seed=0, small=True)
    import dataclasses

    gen = dataclasses.replace(bundle.config.generation,
                              max_new_tokens=12, min_new_tokens=4)
    zi = jnp.asarray(rng.standard_normal((2, bundle.config.fusion.d_img)),
                     jnp.float32)
    zt = jnp.asarray(rng.standard_normal((2, bundle.config.fusion.d_txt)),
                     jnp.float32)
    engine = InferenceEngine(bundle, mode="parity")
    monkeypatch.setenv("MMDX_DECODE_SEGMENTS", "")
    base = engine.generate_reports(zi, zt, gen=gen)
    monkeypatch.setenv("MMDX_DECODE_SEGMENTS", "5,9")
    seg = engine.generate_reports(zi, zt, gen=gen)
    assert base == seg
    assert len(engine._generate_cache) == 2  # distinct programs per caps


def test_greedy_token_parity(pair, rng):
    import jax.numpy as jnp

    oracle, model, variables, cfg = pair
    B, K = 4, 4
    cond = rng.standard_normal((B, K, cfg.d_model)).astype(np.float32) * 2.0
    hf_out = _hf_generate(
        oracle, cond, num_beams=1, do_sample=False, max_new_tokens=18,
        min_new_tokens=3, no_repeat_ngram_size=3,
    )
    lmax = 1 + 18
    cache, static_kv = model.apply(variables, B, lmax, jnp.asarray(cond),
                                   method=T5.init_cache)
    self_bias = model.apply(variables, lmax, method=T5.decode_self_bias)
    enc_mask = np.ones((B, K), np.int32)
    step_fn = _our_step_fn(model, variables, static_kv, self_bias, enc_mask)
    ours = greedy_decode(
        step_fn, cache, batch=B, vocab_size=cfg.vocab_size, max_new_tokens=18,
        min_new_tokens=3, no_repeat_ngram_size=3, eos_token_id=1, pad_token_id=0,
    )
    _compare(ours, hf_out, fill=0)  # greedy (_sample) pads with the real pad id
