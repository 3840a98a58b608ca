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


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_beam_attn_partial_composes_to_full(dtype):
    """Partial-softmax kernel + outside own-token composition == full kernel
    attending over the updated cache (the deferred-KV-write identity)."""
    from mmdx_tpu.ops.pallas_beam_attn import (
        beam_decode_attention,
        beam_decode_attention_partial,
    )

    b, nb, h, d, lmax = 2, 4, 8, 16, 6
    kk = nb * lmax
    hd = h * d
    rng = np.random.default_rng(3)
    pos = 3  # current write position
    q = jnp.asarray(rng.standard_normal((b, nb, hd)), dtype)
    k_new = jnp.asarray(rng.standard_normal((b, nb, hd)), dtype)
    v_new = jnp.asarray(rng.standard_normal((b, nb, hd)), dtype)
    k_old = rng.standard_normal((b, kk, hd))
    v_old = rng.standard_normal((b, kk, hd))
    k_old[:, pos * nb:(pos + 1) * nb] = 999.0  # stale rows; must not leak
    v_old[:, pos * nb:(pos + 1) * nb] = -999.0
    k_old, v_old = jnp.asarray(k_old, dtype), jnp.asarray(v_old, dtype)

    live = rng.integers(0, 2, (b, nb, kk)).astype(bool)
    live[:, :, 0] = True
    live[:, :, pos * nb:(pos + 1) * nb] = False
    col = np.arange(kk)
    own_cols = np.zeros((b, nb, kk), bool)
    for j in range(nb):
        own_cols[:, j, pos * nb + j] = True
    bias = jnp.asarray(rng.standard_normal((h, kk)), jnp.float32)
    # bias at distance 0 must be slot-independent (it is, in the real
    # decode: bias_k repeats the position row nb times)
    bias = bias.at[:, pos * nb:(pos + 1) * nb].set(
        bias[:, pos * nb][:, None])

    # reference: FULL kernel over the UPDATED cache with own column live
    k_full = np.asarray(k_old).copy()
    v_full = np.asarray(v_old).copy()
    for j in range(nb):
        k_full[:, pos * nb + j] = np.asarray(k_new)[:, j]
        v_full[:, pos * nb + j] = np.asarray(v_new)[:, j]
    mask_full = np.where(live | own_cols, 0.0, -1e9).astype(np.float32)
    with pltpu.force_tpu_interpret_mode():
        ref = beam_decode_attention(
            q, jnp.concatenate([jnp.asarray(k_full, dtype),
                                jnp.asarray(v_full, dtype)], -1),
            jnp.asarray(mask_full), bias)

    # deferred: PARTIAL kernel over the OLD cache with own column dead,
    # then compose the own-token contribution outside
    mask_dead = jnp.asarray(np.where(live, 0.0, -1e9).astype(np.float32))
    with pltpu.force_tpu_interpret_mode():
        acc, m, l = beam_decode_attention_partial(
            q, jnp.concatenate([k_old, v_old], -1), mask_dead, bias)
    qh = np.asarray(q, np.float32).reshape(b, nb, h, d)
    kh = np.asarray(k_new, np.float32).reshape(b, nb, h, d)
    vh = np.asarray(v_new, np.float32).reshape(b, nb, h, d)
    s_own = np.einsum("bihd,bihd->bih", qh, kh) + \
        np.asarray(bias)[None, None, :, pos * nb]
    m, l, acc = np.asarray(m), np.asarray(l), np.asarray(acc)
    m2 = np.maximum(m, s_own)
    ea, eb = np.exp(m - m2), np.exp(s_own - m2)
    ctx = ((acc.reshape(b, nb, h, d) * ea[..., None] + eb[..., None] * vh)
           / (l * ea + eb)[..., None]).reshape(b, nb, hd)

    tol = 1e-5 if dtype == jnp.float32 else 3e-2
    np.testing.assert_allclose(ctx, np.asarray(ref, np.float32),
                               rtol=tol, atol=tol)

    # fully-masked history (step 0): composition must reduce to v_new
    mask_none = jnp.full((b, nb, kk), -1e9, jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        acc0, m0, l0 = beam_decode_attention_partial(
            q, jnp.concatenate([k_old, v_old], -1), mask_none, bias)
    m0, l0, acc0 = (np.asarray(x) for x in (m0, l0, acc0))
    m20 = np.maximum(m0, s_own)
    ea0, eb0 = np.exp(m0 - m20), np.exp(s_own - m20)
    ctx0 = ((acc0.reshape(b, nb, h, d) * ea0[..., None]
             + eb0[..., None] * vh) / (l0 * ea0 + eb0)[..., None])
    np.testing.assert_allclose(ctx0.reshape(b, nb, hd), vh.reshape(b, nb, hd),
                               rtol=tol, atol=tol)


def test_beam_decode_deferred_kv_token_parity():
    """Full beam search with deferred KV writes (partial kernel + outside
    own-token composition, interpret) produces the same tokens as the
    standard fused path — and the same cache-write contents."""
    import dataclasses

    from mmdx_tpu.checkpoints.bundle import new_random_bundle
    from mmdx_tpu.decode.beam_search import beam_search
    from mmdx_tpu.models.diagnosis import MultiModalDiagnosisModel

    bundle = new_random_bundle(seed=0, small=True)
    gen = dataclasses.replace(bundle.config.generation,
                              max_new_tokens=8, min_new_tokens=3)
    rng = np.random.default_rng(5)
    b = 2
    zi = jnp.asarray(rng.standard_normal((b * gen.num_beams,
                                          bundle.config.fusion.d_img)), jnp.float32)
    zt = jnp.asarray(rng.standard_normal((b * gen.num_beams,
                                          bundle.config.fusion.d_txt)), jnp.float32)

    def run(deferred: bool):
        cfg = dataclasses.replace(
            bundle.config,
            report=dataclasses.replace(bundle.config.report,
                                       use_fused_beam_attn=True,
                                       deferred_kv_writes=deferred),
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

    with pltpu.force_tpu_interpret_mode():
        seqs_std, scores_std = run(False)
        seqs_def, scores_def = run(True)
    assert np.array_equal(seqs_std, seqs_def)
    np.testing.assert_allclose(scores_std, scores_def, rtol=1e-4, atol=1e-5)
