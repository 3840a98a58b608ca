"""int8 text-tower kernels (W8A8 fused attention block + FFN): accuracy
guardrails vs the exact bf16/f32 paths, interpret mode (CPU).

The engine's turbo tier runs the BERT tower's matmuls int8 (per-row dynamic
activation scales, per-channel weight scales — ops/pallas_ffn.fused_ffn_ln_int8
and ops/pallas_bert_attn.fused_attention_block(int8_matmuls=True)). These
tests bound the quantization noise and pin the shared quantizer helpers.
"""
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

from mmdx_tpu.ops.pallas_bert_attn import fused_attention_block
from mmdx_tpu.ops.pallas_ffn import (
    fused_ffn_ln, fused_ffn_ln_int8, quant_weight_cols,
)


def _mk(rng, shape, scale=0.5):
    return jnp.asarray(rng.standard_normal(shape) * scale, jnp.float32)


def test_quant_weight_cols_roundtrip():
    rng = np.random.default_rng(0)
    w = _mk(rng, (64, 48))
    wi, ws = quant_weight_cols(w)
    assert wi.dtype == jnp.int8
    assert ws.shape == (1, 48)
    deq = wi.astype(jnp.float32) * ws
    # symmetric per-channel int8: max abs error is half a step per channel
    err = np.abs(np.asarray(deq - w))
    step = np.asarray(ws)[0]
    assert (err <= step * 0.5 + 1e-7).all()


def test_ffn_int8_close_to_exact():
    rng = np.random.default_rng(1)
    m, h, f = 64, 128, 256
    x = _mk(rng, (m, h))
    wi, bi = _mk(rng, (h, f), 0.1), _mk(rng, (f,), 0.05)
    wo, bo = _mk(rng, (f, h), 0.1), _mk(rng, (h,), 0.05)
    lns, lnb = jnp.ones((h,)), jnp.zeros((h,))

    with pltpu.force_tpu_interpret_mode():
        exact = fused_ffn_ln(x, wi, bi, wo, bo, lns, lnb, block_rows=32)
        quant = fused_ffn_ln_int8(x, wi, bi, wo, bo, lns, lnb, block_rows=32)
    rel = float(jnp.linalg.norm(quant - exact) / jnp.linalg.norm(exact))
    assert rel < 0.02, rel


def test_attn_int8_close_to_exact():
    rng = np.random.default_rng(2)
    b, l, h, heads = 16, 8, 128, 4
    m = b * l
    x = _mk(rng, (m, h))
    kmask = jnp.asarray(
        np.where(rng.random((m,)) < 0.15, -1e9, 0.0), jnp.float32)
    wqkv = _mk(rng, (h, 3 * h), 0.1)
    bqkv = _mk(rng, (3 * h,), 0.05)
    wo, bo = _mk(rng, (h, h), 0.1), _mk(rng, (h,), 0.05)
    lns, lnb = jnp.ones((h,)), jnp.zeros((h,))

    kw = dict(seq_len=l, num_heads=heads)
    with pltpu.force_tpu_interpret_mode():
        exact = fused_attention_block(x, kmask, wqkv, bqkv, wo, bo, lns, lnb,
                                      **kw)
        quant = fused_attention_block(x, kmask, wqkv, bqkv, wo, bo, lns, lnb,
                                      int8_matmuls=True, **kw)
    rel = float(jnp.linalg.norm(quant - exact) / jnp.linalg.norm(exact))
    assert rel < 0.02, rel


def test_text_tower_int8_probs_guardrail():
    """Full TextEncoder with int8 matmuls: classifier probabilities stay
    within quantization tolerance of the f32 tower — the accuracy contract
    for turbo serving (mirrors tests/test_resnet_int8.py)."""
    import dataclasses

    from mmdx_tpu.config import TextEncoderConfig
    from mmdx_tpu.models.bert import TextEncoder

    cfg = TextEncoderConfig(
        vocab_size=99, hidden_size=64, num_layers=2, num_heads=4,
        intermediate_size=128, max_len=16, max_position_embeddings=32,
        d_txt=32, use_warmup_classifier=True,
    )
    rng = np.random.default_rng(3)
    ids = jnp.asarray(rng.integers(0, 99, (8, 16)))
    mask = jnp.asarray((np.arange(16)[None, :] < rng.integers(4, 17, (8, 1)))
                       .astype(np.int32))
    model = TextEncoder(config=cfg)
    variables = model.init(jax.random.PRNGKey(0), ids, mask)

    base = model.apply(variables, ids, mask)
    c8 = dataclasses.replace(cfg, use_fused_attn_block=True, use_fused_ffn=True,
                             int8_matmuls=True)
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        quant = TextEncoder(config=c8).apply(variables, ids, mask)

    pa = jax.nn.sigmoid(base["logits"])
    pb = jax.nn.sigmoid(quant["logits"])
    assert float(jnp.max(jnp.abs(pa - pb))) < 0.05
    za, zb = base["embeddings"], quant["embeddings"]
    rel = float(jnp.linalg.norm(za - zb) / jnp.linalg.norm(za))
    assert rel < 0.05, rel
