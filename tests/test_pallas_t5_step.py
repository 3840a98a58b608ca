"""Fused cross-attention + FFN decoder half-step vs the XLA path (interpret)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from mmdx_tpu.config import ReportDecoderConfig


def _small_cfg(**kw):
    return ReportDecoderConfig(
        vocab_size=64, d_model=32, d_kv=8, d_ff=64, num_layers=2,
        num_decoder_layers=2, num_heads=4, **kw,
    )


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_cross_ffn_block_matches_xla_layer_half(dtype):
    """The kernel must reproduce cross_ln -> cross_step -> ffn_ln -> FFN with
    residuals on identical weights."""
    from mmdx_tpu.models.t5 import T5DecoderLayer

    cfg = _small_cfg()
    layer = T5DecoderLayer(config=cfg, dtype=dtype)
    n, kk, dm = 8, 4, cfg.d_model
    rng = np.random.default_rng(0)
    hidden = jnp.asarray(rng.standard_normal((n, 1, dm)), dtype)
    enc_bias = jnp.zeros((n, 1, 1, kk), jnp.float32).at[:, :, :, -1].set(-1e9)
    ck = jnp.asarray(rng.standard_normal((n, cfg.num_heads, kk, cfg.d_kv)), dtype)
    cv = jnp.asarray(rng.standard_normal((n, cfg.num_heads, kk, cfg.d_kv)), dtype)
    static_kv = {"ck": ck, "cv": cv}

    # init params via the public decode path (bind the layer directly)
    variables = layer.init(
        jax.random.PRNGKey(0), hidden, None, static_kv, enc_bias,
        method=_xla_half,
    )

    ref = layer.apply(variables, hidden, None, static_kv, enc_bias,
                      method=_xla_half)
    with pltpu.force_tpu_interpret_mode():
        got = layer.apply(variables, hidden, static_kv, enc_bias,
                          method=T5DecoderLayer._cross_ffn_fused)
    tol = 2e-5 if dtype == jnp.float32 else 4e-2
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        rtol=tol, atol=tol,
    )


def _xla_half(self, hidden_tok, _unused, static_kv, enc_bias):
    """The XLA-path cross+FFN half of step/step_beam, verbatim."""
    import flax.linen as nn

    y = self.cross_ln(hidden_tok)
    hidden_tok = hidden_tok + self.cross_attn.cross_step(
        y, static_kv["ck"], static_kv["cv"], enc_bias
    )
    y = self.ffn_ln(hidden_tok)
    return hidden_tok + self.ffn_wo(nn.relu(self.ffn_wi(y)))


def test_fused_cross_ffn_token_parity():
    """Full beam search with use_fused_cross_ffn (interpret) produces the
    same tokens as the XLA path on a small model."""
    from mmdx_tpu.checkpoints.bundle import new_random_bundle
    from mmdx_tpu.decode.beam_search import beam_search
    from mmdx_tpu.models.diagnosis import MultiModalDiagnosisModel

    bundle = new_random_bundle(seed=0, small=True)
    gen = dataclasses.replace(bundle.config.generation,
                              max_new_tokens=8, min_new_tokens=3)
    rng = np.random.default_rng(1)
    b = 2
    zi = jnp.asarray(rng.standard_normal((b * gen.num_beams,
                                          bundle.config.fusion.d_img)), jnp.float32)
    zt = jnp.asarray(rng.standard_normal((b * gen.num_beams,
                                          bundle.config.fusion.d_txt)), jnp.float32)

    def run(fused: bool):
        cfg = dataclasses.replace(
            bundle.config,
            report=dataclasses.replace(bundle.config.report,
                                       use_fused_cross_ffn=fused),
        )
        model = MultiModalDiagnosisModel(config=cfg)
        lmax = 1 + gen.max_new_tokens
        prep = model.apply(bundle.variables, zi, zt, lmax, gen.num_beams,
                           method=MultiModalDiagnosisModel.prepare_generation)

        def step_fn(tokens, pos, layers, anc):
            return model.apply(
                bundle.variables, tokens, pos, layers, anc, prep["static_kv"],
                prep["self_bias"], prep["enc_mask"],
                method=MultiModalDiagnosisModel.decode_step_beam,
            )

        seqs, scores = beam_search(
            step_fn, prep["cache"], batch=b,
            vocab_size=bundle.config.report.vocab_size, cache_mode="ancestry",
            num_beams=gen.num_beams, max_new_tokens=gen.max_new_tokens,
            min_new_tokens=gen.min_new_tokens,
            no_repeat_ngram_size=gen.no_repeat_ngram_size,
            length_penalty=gen.length_penalty, early_stopping=gen.early_stopping,
            eos_token_id=gen.eos_token_id, pad_token_id=gen.pad_token_id,
            decoder_start_token_id=gen.decoder_start_token_id,
        )
        return np.asarray(seqs), np.asarray(scores)

    seqs_ref, scores_ref = run(False)
    with pltpu.force_tpu_interpret_mode():
        seqs_fused, scores_fused = run(True)
    assert np.array_equal(seqs_ref, seqs_fused)
    np.testing.assert_allclose(scores_ref, scores_fused, rtol=1e-4, atol=1e-5)
