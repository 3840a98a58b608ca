"""Pallas beam-decode attention kernel vs the XLA einsum path (interpret)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu


def _xla_reference(q, k, v, mask, bias, h):
    b, nb, hd = q.shape
    kk = k.shape[1]
    d = hd // h
    qh = q.reshape(b, nb, h, d)
    kh = k.reshape(b, kk, h, d)
    vh = v.reshape(b, kk, h, d)
    scores = jnp.einsum("bihd,bkhd->bhik", qh, kh,
                        preferred_element_type=jnp.float32)
    scores = scores + bias[None, :, None, :] + mask[:, None, :, :]
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    ctx = jnp.einsum("bhik,bkhd->bihd", probs, vh,
                     preferred_element_type=jnp.float32).astype(q.dtype)
    return ctx.reshape(b, nb, hd)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_beam_attn_kernel_matches_einsum(dtype):
    from mmdx_tpu.ops.pallas_beam_attn import beam_decode_attention

    b, nb, h, d, lmax = 3, 4, 8, 16, 7
    kk = nb * lmax
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, nb, h * d)), dtype)
    k = jnp.asarray(rng.standard_normal((b, kk, h * d)), dtype)
    v = jnp.asarray(rng.standard_normal((b, kk, h * d)), dtype)
    # ancestry-style mask: random -inf pattern with at least one live row
    live = rng.integers(0, 2, (b, nb, kk)).astype(bool)
    live[:, :, 0] = True
    mask = jnp.where(jnp.asarray(live), 0.0, -1e9).astype(jnp.float32)
    bias = jnp.asarray(rng.standard_normal((h, kk)), jnp.float32)

    ref = _xla_reference(q, k, v, mask, bias, h)
    with pltpu.force_tpu_interpret_mode():
        out = beam_decode_attention(q, jnp.concatenate([k, v], -1), mask, bias)
    tol = 1e-5 if dtype == jnp.float32 else 3e-2
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=tol, atol=tol,
    )


def test_beam_decode_fused_flag_token_parity():
    """Full beam search with use_fused_beam_attn (interpret) produces the same
    tokens as the einsum path on a small model."""
    import dataclasses

    from mmdx_tpu.checkpoints.bundle import new_random_bundle
    from mmdx_tpu.decode.beam_search import beam_expand, beam_search
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
                                       use_fused_beam_attn=fused),
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


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_beam_attn_kernel_nb1(dtype):
    """nb=1 (the flat-cache GREEDY path): the kernel must pack 8 samples per
    program (gb=8) and still match the einsum reference."""
    from mmdx_tpu.ops.pallas_beam_attn import _pick_gb, beam_decode_attention

    b, nb, h, d, lmax = 8, 1, 8, 16, 24
    kk = nb * lmax
    assert _pick_gb(b, kk, h * d, nb=1) == 8
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((b, nb, h * d)), dtype)
    k = jnp.asarray(rng.standard_normal((b, kk, h * d)), dtype)
    v = jnp.asarray(rng.standard_normal((b, kk, h * d)), dtype)
    mask = jnp.zeros((b, nb, kk), jnp.float32)  # all live; causal via bias
    bias = jnp.asarray(
        np.where(np.arange(kk) <= lmax // 2,
                 rng.standard_normal((h, kk)), -1e9), jnp.float32)

    ref = _xla_reference(q, k, v, mask, bias, h)
    with pltpu.force_tpu_interpret_mode():
        out = beam_decode_attention(q, jnp.concatenate([k, v], -1), mask, bias)
    tol = 1e-5 if dtype == jnp.float32 else 3e-2
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=tol, atol=tol,
    )


def test_beam_attn_int8_kernel_nb1():
    """nb=1 int8 kernel vs the dequantize-then-attend einsum reference."""
    from mmdx_tpu.ops.pallas_beam_attn import beam_decode_attention_int8

    b, nb, h, d, lmax = 4, 1, 4, 16, 16
    kk = nb * lmax
    hd = h * d
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.standard_normal((b, nb, hd)), jnp.bfloat16)
    k = rng.standard_normal((b, kk, hd)).astype(np.float32)
    v = rng.standard_normal((b, kk, hd)).astype(np.float32)
    kr = k.reshape(b, kk, h, d)
    vr = v.reshape(b, kk, h, d)
    sk = np.maximum(np.abs(kr).max(-1), 1e-12) / 127.0
    sv = np.maximum(np.abs(vr).max(-1), 1e-12) / 127.0
    ki = np.clip(np.round(kr / sk[..., None]), -127, 127)
    vi = np.clip(np.round(vr / sv[..., None]), -127, 127)
    kv = jnp.asarray(np.concatenate(
        [ki.reshape(b, kk, hd), vi.reshape(b, kk, hd)], -1), jnp.int8)
    kvs = jnp.asarray(np.concatenate(
        [sk.transpose(0, 2, 1), sv.transpose(0, 2, 1)], 1), jnp.float32)
    mask = jnp.zeros((b, nb, kk), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((h, kk)) * 0.1, jnp.float32)

    kd = (ki * sk[..., None]).reshape(b, kk, hd)
    vd = (vi * sv[..., None]).reshape(b, kk, hd)
    ref = _xla_reference(q.astype(jnp.float32), jnp.asarray(kd),
                         jnp.asarray(vd), mask, bias, h)
    with pltpu.force_tpu_interpret_mode():
        out = beam_decode_attention_int8(q, kv, kvs, mask, bias)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=3e-2, atol=3e-2,
    )
