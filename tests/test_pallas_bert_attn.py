"""Fused BERT attention-block kernel vs the XLA einsum path (interpret)."""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from mmdx_tpu.config import TextEncoderConfig
from mmdx_tpu.models.bert import TextEncoder


def _cfg(**kw):
    return TextEncoderConfig(
        vocab_size=211, hidden_size=64, num_layers=2, num_heads=4,
        intermediate_size=96, d_txt=32, max_len=16,
        max_position_embeddings=32, **kw,
    )


@pytest.mark.parametrize("seq", [8, 16])
def test_fused_attn_block_matches_einsum_tower(rng, seq):
    cfg = _cfg()
    model = TextEncoder(config=cfg)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (3, seq)), jnp.int32)
    mask = jnp.asarray(
        np.stack([[1] * seq, [1] * (seq // 2) + [0] * (seq - seq // 2), [1] * seq]),
        jnp.int32,
    )
    variables = model.init(jax.random.key(0), ids, mask)

    ref = model.apply(variables, ids, mask)["embeddings"]

    fused_cfg = _cfg(use_fused_attn_block=True)
    fused_model = TextEncoder(config=fused_cfg)
    with pltpu.force_tpu_interpret_mode():
        got = fused_model.apply(variables, ids, mask)["embeddings"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_fused_attn_block_row_padding(rng):
    """Batch*seq not divisible by the packed row-block size pads and crops."""
    from mmdx_tpu.ops.pallas_bert_attn import fused_attention_block

    h, heads, seq = 64, 4, 8
    m = 5 * seq  # 40 rows; block = (512 // 8) * 8 = 512 -> pad path
    x = jnp.asarray(rng.standard_normal((m, h)), jnp.float32)
    kmask = jnp.zeros((m,), jnp.float32).at[seq - 1 :: seq].set(-1e9)
    wqkv = jnp.asarray(rng.standard_normal((h, 3 * h)) * 0.05, jnp.float32)
    bqkv = jnp.asarray(rng.standard_normal((3 * h,)) * 0.01, jnp.float32)
    wo = jnp.asarray(rng.standard_normal((h, h)) * 0.05, jnp.float32)
    bo = jnp.zeros((h,), jnp.float32)
    lns = jnp.ones((h,), jnp.float32)
    lnb = jnp.zeros((h,), jnp.float32)

    def xla_ref():
        qkv = x @ wqkv + bqkv
        q, k, v = jnp.split(qkv, 3, axis=-1)
        d = h // heads
        qh = q.reshape(m // seq, seq, heads, d)
        kh = k.reshape(m // seq, seq, heads, d)
        vh = v.reshape(m // seq, seq, heads, d)
        s = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) / np.sqrt(d)
        s = s + kmask.reshape(m // seq, seq)[:, None, None, :]
        p = jax.nn.softmax(s, axis=-1)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", p, vh).reshape(m, h)
        y = x + ctx @ wo + bo
        mu = y.mean(-1, keepdims=True)
        var = ((y - mu) ** 2).mean(-1, keepdims=True)
        return (y - mu) * jax.lax.rsqrt(var + 1e-12) * lns + lnb

    ref = xla_ref()
    with pltpu.force_tpu_interpret_mode():
        got = fused_attention_block(x, kmask, wqkv, bqkv, wo, bo, lns, lnb,
                                    seq_len=seq, num_heads=heads)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
