"""Golden parity: flax T5 vs HF torch T5ForConditionalGeneration (random init from
config, offline).  Covers encoder, teacher-forced decode over synthetic encoder
outputs (the fusion model's conditioning path), and KV-cached incremental decode
consistency."""
import numpy as np
import pytest
import torch

from mmdx_tpu.checkpoints.torch_import import import_hf_t5
from mmdx_tpu.config import ReportDecoderConfig
from mmdx_tpu.models.t5 import T5, shift_right


def _cfgs():
    from transformers import T5Config

    hf = T5Config(
        vocab_size=99,
        d_model=32,
        d_kv=8,
        d_ff=64,
        num_layers=2,
        num_decoder_layers=2,
        num_heads=4,
        relative_attention_num_buckets=8,
        relative_attention_max_distance=20,
        dropout_rate=0.0,
        tie_word_embeddings=True,
        decoder_start_token_id=0,
        pad_token_id=0,
        eos_token_id=1,
    )
    ours = ReportDecoderConfig(
        vocab_size=99,
        d_model=32,
        d_kv=8,
        d_ff=64,
        num_layers=2,
        num_decoder_layers=2,
        num_heads=8 // 2,
        relative_attention_num_buckets=8,
        relative_attention_max_distance=20,
        dropout=0.0,
    )
    return hf, ours


@pytest.fixture(scope="module")
def pair():
    from transformers import T5ForConditionalGeneration

    torch.manual_seed(2)
    hf_cfg, our_cfg = _cfgs()
    oracle = T5ForConditionalGeneration(hf_cfg).eval()
    params = import_hf_t5(oracle.state_dict(), num_layers=2)
    model = T5(config=our_cfg)
    return oracle, model, {"params": params}, our_cfg


def test_encoder_parity(pair, rng):
    oracle, model, variables, cfg = pair
    ids = rng.integers(1, cfg.vocab_size, size=(2, 26)).astype(np.int32)
    mask = np.ones((2, 26), np.int32)
    mask[1, 15:] = 0
    with torch.no_grad():
        ref = oracle.encoder(
            input_ids=torch.from_numpy(ids).long(),
            attention_mask=torch.from_numpy(mask).long(),
        ).last_hidden_state.numpy()
    got = np.asarray(model.apply(variables, ids, mask, method=T5.encode))
    # compare only unmasked positions (HF computes masked positions too but they
    # are meaningless downstream)
    np.testing.assert_allclose(got[0], ref[0], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(got[1, :15], ref[1, :15], rtol=1e-4, atol=1e-5)


def test_conditional_decode_parity(pair, rng):
    """Decoder over synthetic encoder outputs — the fusion conditioning path
    (reference FusionTransformerModel.forward, training_pipeline.py:596-604)."""
    from transformers.modeling_outputs import BaseModelOutput

    oracle, model, variables, cfg = pair
    B, K, L = 2, 4, 18
    cond = rng.standard_normal((B, K, cfg.d_model)).astype(np.float32)
    labels = rng.integers(1, cfg.vocab_size, size=(B, L)).astype(np.int64)
    labels[1, 12:] = -100

    with torch.no_grad():
        ref = oracle(
            encoder_outputs=BaseModelOutput(last_hidden_state=torch.from_numpy(cond)),
            labels=torch.from_numpy(labels),
            return_dict=True,
        )
    dec_in = shift_right(labels.astype(np.int32), cfg.decoder_start_token_id, cfg.pad_token_id)
    enc_mask = np.ones((B, K), np.int32)
    logits = np.asarray(
        model.apply(variables, np.asarray(dec_in), cond, enc_mask, method=T5.decode)
    )
    np.testing.assert_allclose(logits, ref.logits.numpy(), rtol=2e-4, atol=1e-4)

    # CE loss (mean over non -100 labels) matches HF
    from mmdx_tpu.pipelines.losses import t5_cross_entropy

    loss = float(t5_cross_entropy(logits, labels))
    np.testing.assert_allclose(loss, float(ref.loss), rtol=1e-4)


def test_incremental_decode_matches_full(pair, rng):
    """KV-cached decode_step chain == teacher-forced full decode logits."""
    import jax.numpy as jnp

    oracle, model, variables, cfg = pair
    B, K, L = 2, 4, 10
    cond = rng.standard_normal((B, K, cfg.d_model)).astype(np.float32)
    enc_mask = np.ones((B, K), np.int32)
    tokens = rng.integers(1, cfg.vocab_size, size=(B, L)).astype(np.int32)

    full = np.asarray(model.apply(variables, tokens, cond, enc_mask, method=T5.decode))

    cache, static_kv = model.apply(variables, B, L, jnp.asarray(cond),
                                   method=T5.init_cache)
    self_bias = model.apply(variables, L, method=T5.decode_self_bias)
    step_logits = []
    for pos in range(L):
        logits, cache = model.apply(
            variables,
            tokens[:, pos : pos + 1],
            pos,
            cache,
            static_kv,
            self_bias,
            jnp.asarray(enc_mask),
            method=T5.decode_step,
        )
        step_logits.append(np.asarray(logits))
    step = np.stack(step_logits, axis=1)
    np.testing.assert_allclose(step, full, rtol=2e-4, atol=1e-4)
