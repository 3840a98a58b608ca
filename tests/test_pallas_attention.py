"""Flash attention kernel vs plain XLA attention (interpret mode on CPU)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp


def xla_attention(q, k, v, bias, scale=1.0):
    s = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k).astype(jnp.float32) + bias
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(q.dtype), v)


@pytest.mark.parametrize("lq,lk,block_k", [(96, 96, 128), (128, 256, 64), (64, 160, 64)])
def test_flash_matches_xla(rng, lq, lk, block_k):
    from jax.experimental.pallas import tpu as pltpu

    from mmdx_tpu.ops.pallas_attention import flash_attention

    b, h, d = 2, 3, 16
    q = rng.standard_normal((b, h, lq, d)).astype(np.float32)
    k = rng.standard_normal((b, h, lk, d)).astype(np.float32)
    v = rng.standard_normal((b, h, lk, d)).astype(np.float32)
    # padding mask on the last quarter of keys
    mask = np.ones((b, 1, 1, lk), np.float32)
    mask[:, :, :, -lk // 4 :] = 0
    bias = (1.0 - mask) * -1e9
    scale = 1.0 / np.sqrt(d)

    want = np.asarray(xla_attention(q, k, v, bias, scale))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(flash_attention(q, k, v, jnp.asarray(bias),
                                         block_k=block_k, scale=scale))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_flash_causal(rng):
    from jax.experimental.pallas import tpu as pltpu

    from mmdx_tpu.ops.pallas_attention import flash_attention

    b, h, l, d = 1, 2, 64, 8
    q = rng.standard_normal((b, h, l, d)).astype(np.float32)
    k = rng.standard_normal((b, h, l, d)).astype(np.float32)
    v = rng.standard_normal((b, h, l, d)).astype(np.float32)
    causal = np.tril(np.ones((l, l), np.float32))[None, None]
    bias = (1.0 - causal) * -1e9
    want = np.asarray(xla_attention(q, k, v, bias))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(flash_attention(q, k, v, jnp.asarray(bias), block_k=32))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_bert_with_flash_attention_matches(rng):
    from jax.experimental.pallas import tpu as pltpu

    import dataclasses
    import jax

    from mmdx_tpu.config import TextEncoderConfig
    from mmdx_tpu.models.bert import TextEncoder, init_text_encoder

    cfg = TextEncoderConfig(
        vocab_size=128, hidden_size=32, num_layers=2, num_heads=4,
        intermediate_size=64, d_txt=16, max_len=24, max_position_embeddings=32,
    )
    model, variables = init_text_encoder(jax.random.key(0), cfg)
    ids = rng.integers(0, 128, (2, 24)).astype(np.int32)
    mask = np.ones((2, 24), np.int32)
    mask[1, 10:] = 0
    want = np.asarray(model.apply(variables, ids, mask)["embeddings"])

    flash_model = TextEncoder(config=dataclasses.replace(cfg, use_flash_attention=True))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(flash_model.apply(variables, ids, mask)["embeddings"])
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_fused_ffn_kernel_matches(rng):
    from jax.experimental.pallas import tpu as pltpu

    from mmdx_tpu.ops.pallas_ffn import fused_ffn_ln

    m, h, f = 70, 32, 64  # ragged rows exercise padding
    x = rng.standard_normal((m, h)).astype(np.float32)
    wi = rng.standard_normal((h, f)).astype(np.float32) * 0.1
    bi = rng.standard_normal((f,)).astype(np.float32) * 0.1
    wo = rng.standard_normal((f, h)).astype(np.float32) * 0.1
    bo = rng.standard_normal((h,)).astype(np.float32) * 0.1
    s = rng.standard_normal((h,)).astype(np.float32)
    b = rng.standard_normal((h,)).astype(np.float32)

    mid = jax.nn.gelu(x @ wi + bi, approximate=False)
    y = np.asarray(mid @ wo + bo + x)
    mean = y.mean(-1, keepdims=True)
    var = y.var(-1, keepdims=True)
    want = (y - mean) / np.sqrt(var + 1e-12) * s + b

    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(fused_ffn_ln(x, wi, bi, wo, bo, s, b, block_rows=32))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_bert_with_fused_ffn_matches(rng):
    from jax.experimental.pallas import tpu as pltpu

    import dataclasses
    import jax as _jax

    from mmdx_tpu.config import TextEncoderConfig
    from mmdx_tpu.models.bert import TextEncoder, init_text_encoder

    cfg = TextEncoderConfig(
        vocab_size=128, hidden_size=32, num_layers=2, num_heads=4,
        intermediate_size=64, d_txt=16, max_len=24, max_position_embeddings=32,
    )
    model, variables = init_text_encoder(_jax.random.key(0), cfg)
    ids = rng.integers(0, 128, (2, 24)).astype(np.int32)
    mask = np.ones((2, 24), np.int32)
    mask[1, 9:] = 0
    want = np.asarray(model.apply(variables, ids, mask)["embeddings"])

    fused = TextEncoder(config=dataclasses.replace(cfg, use_fused_ffn=True))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(fused.apply(variables, ids, mask)["embeddings"])
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
