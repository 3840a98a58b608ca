"""BERT-base text tower in flax (TPU-native attention via einsum/XLA fusion).

Rebuilds the capability of the reference's ``TextEncoderTransformer`` (reference
``backend/ml/pipelines/training_pipeline.py:348-508``): a BERT-base-uncased
backbone, masked mean pooling over the last hidden state, a projection
``Linear(768 -> d_txt)`` and an optional warm-up classifier.

Architecture matches HF ``BertModel``: learned absolute positions, post-LN
blocks, exact (erf) GELU, LayerNorm eps 1e-12.  Sequences are padded to a fixed
``max_len`` (96 in the reference) so everything is static-shape under jit.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from mmdx_tpu.config import TextEncoderConfig
from mmdx_tpu.ops.pooling import masked_mean_pool

NEG_INF = -1e9


class _LinearParams(nn.Module):
    """Declares Dense-compatible params ('kernel','bias') without computing —
    used by the fused-FFN path so the param tree matches the nn.Dense layout."""

    features_in: int
    features_out: int

    @nn.compact
    def __call__(self):
        k = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.features_in, self.features_out),
        )
        b = self.param("bias", nn.initializers.zeros_init(), (self.features_out,))
        return k, b


class _LayerNormParams(nn.Module):
    features: int

    @nn.compact
    def __call__(self):
        s = self.param("scale", nn.initializers.ones_init(), (self.features,))
        b = self.param("bias", nn.initializers.zeros_init(), (self.features,))
        return s, b


class BertLayer(nn.Module):
    config: TextEncoderConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, hidden, attention_bias, deterministic: bool = True):
        cfg = self.config
        h = cfg.hidden_size
        n_heads = cfg.num_heads
        head_dim = h // n_heads
        dense = lambda feats, name: nn.Dense(feats, dtype=self.dtype, name=name)

        b, l, _ = hidden.shape
        if (cfg.use_fused_attn_block and deterministic
                and l <= cfg.fused_attn_max_seq_len):
            # whole attention block (QKV -> blockdiag-packed scores ->
            # softmax -> ctx -> out-proj -> residual -> LN) as ONE Pallas
            # kernel: at the bucketed serving lengths the XLA path's
            # [B,heads,L,L] tensors put L in the lane dim (4x tile padding
            # at L=32) and round-trip HBM repeatedly — 16.5 ms of the 78 ms
            # classify budget at B=512 (round-2 device trace).
            from mmdx_tpu.ops.pallas_bert_attn import fused_attention_block

            wq, bq = _LinearParams(h, h, name="attn_q")()
            wk, bk = _LinearParams(h, h, name="attn_k")()
            wv, bv = _LinearParams(h, h, name="attn_v")()
            wo_a, bo_a = _LinearParams(h, h, name="attn_out")()
            lns_a, lnb_a = _LayerNormParams(h, name="attn_ln")()
            wqkv = jnp.concatenate([wq, wk, wv], axis=1).astype(self.dtype)
            bqkv = jnp.concatenate([bq, bk, bv]).astype(self.dtype)
            # attention_bias is the [B,1,1,L] additive key mask
            kmask = attention_bias.reshape(b * l).astype(jnp.float32)
            hidden = fused_attention_block(
                hidden.reshape(b * l, h), kmask, wqkv, bqkv,
                wo_a.astype(self.dtype), bo_a.astype(self.dtype),
                lns_a.astype(self.dtype), lnb_a.astype(self.dtype),
                seq_len=l, num_heads=n_heads, eps=cfg.layer_norm_eps,
                int8_matmuls=cfg.int8_matmuls,
            ).reshape(b, l, h)
            return self._ffn(hidden, deterministic)

        # heads stay in the minor dims end-to-end ([B,L,heads,hd]): the
        # split/merge head transposes of the classic layout cost ~30% of the
        # attention block at serving shapes (measured on-chip, see
        # scripts/profile_components.py bertmicro) and XLA contracts the
        # "bqhd,bkhd->bhqk" form directly.
        q = dense(h, "attn_q")(hidden).reshape(b, l, n_heads, head_dim)
        k = dense(h, "attn_k")(hidden).reshape(b, l, n_heads, head_dim)
        v = dense(h, "attn_v")(hidden).reshape(b, l, n_heads, head_dim)

        # L is static under jit, so this is a trace-time branch: flash wins
        # only once [L, L] score materialization stops fitting/fusing well
        if cfg.use_flash_attention and hidden.shape[1] >= cfg.flash_min_seq_len:
            from mmdx_tpu.ops.pallas_attention import flash_attention

            tr = lambda x: x.transpose(0, 2, 1, 3)  # [B,heads,L,hd]
            ctx = flash_attention(tr(q), tr(k), tr(v), attention_bias,
                                  scale=1.0 / float(head_dim) ** 0.5)
            ctx = ctx.transpose(0, 2, 1, 3)
        else:
            scores = jnp.einsum(
                "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
            ) / jnp.sqrt(jnp.asarray(head_dim, jnp.float32))
            scores = scores + attention_bias  # [B,1,1,L] additive mask
            probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(self.dtype)
            ctx = jnp.einsum(
                "bhqk,bkhd->bqhd", probs, v, preferred_element_type=jnp.float32
            )
        ctx = ctx.reshape(b, l, h).astype(self.dtype)

        attn_out = dense(h, "attn_out")(ctx)
        attn_out = nn.Dropout(cfg.hidden_dropout)(attn_out, deterministic=deterministic)
        hidden = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="attn_ln")(
            hidden + attn_out
        )
        return self._ffn(hidden, deterministic)

    def _ffn(self, hidden, deterministic):
        cfg = self.config
        h = cfg.hidden_size
        dense = lambda feats, name: nn.Dense(feats, dtype=self.dtype, name=name)

        if cfg.use_fused_ffn and deterministic:
            from mmdx_tpu.ops.pallas_ffn import fused_ffn_ln, fused_ffn_ln_int8

            wi, bi = _LinearParams(h, cfg.intermediate_size, name="ffn_in")()
            wo, bo = _LinearParams(cfg.intermediate_size, h, name="ffn_out")()
            ln_s, ln_b = _LayerNormParams(h, name="ffn_ln")()
            b, l, _ = hidden.shape
            ffn_fn = fused_ffn_ln_int8 if cfg.int8_matmuls else fused_ffn_ln
            out = ffn_fn(
                hidden.reshape(b * l, h),
                wi.astype(self.dtype), bi.astype(self.dtype),
                wo.astype(self.dtype), bo.astype(self.dtype),
                ln_s.astype(self.dtype), ln_b.astype(self.dtype),
                eps=cfg.layer_norm_eps,
            )
            return out.reshape(b, l, h)

        ffn = dense(cfg.intermediate_size, "ffn_in")(hidden)
        ffn = jax.nn.gelu(ffn, approximate=False)
        ffn = dense(h, "ffn_out")(ffn)
        ffn = nn.Dropout(cfg.hidden_dropout)(ffn, deterministic=deterministic)
        return nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="ffn_ln")(
            hidden + ffn
        )


class BertEncoder(nn.Module):
    """HF-BertModel-equivalent encoder returning the last hidden state."""

    config: TextEncoderConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_ids, attention_mask, token_type_ids=None, deterministic=True):
        cfg = self.config
        b, l = input_ids.shape
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        positions = jnp.arange(l)[None, :]

        emb = nn.Embed(cfg.vocab_size, cfg.hidden_size, dtype=self.dtype, name="word_embeddings")(
            input_ids
        )
        emb += nn.Embed(
            cfg.max_position_embeddings, cfg.hidden_size, dtype=self.dtype,
            name="position_embeddings",
        )(positions)
        emb += nn.Embed(
            cfg.type_vocab_size, cfg.hidden_size, dtype=self.dtype,
            name="token_type_embeddings",
        )(token_type_ids)
        emb = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="embeddings_ln")(emb)
        hidden = nn.Dropout(cfg.hidden_dropout)(emb, deterministic=deterministic)

        bias = (1.0 - attention_mask[:, None, None, :].astype(jnp.float32)) * NEG_INF
        for i in range(cfg.num_layers):
            hidden = BertLayer(cfg, dtype=self.dtype, name=f"layer{i}")(
                hidden, bias, deterministic=deterministic
            )
        # HF pooler (tanh over [CLS]) exists in checkpoints; materialize it so
        # state round-trips, though the masked-mean-pool path doesn't use it.
        self.sow(
            "intermediates",
            "pooled_cls",
            jnp.tanh(nn.Dense(cfg.hidden_size, dtype=self.dtype, name="pooler")(hidden[:, 0])),
        )
        return hidden  # [B, L, H]


class TextEncoder(nn.Module):
    """BERT backbone + masked mean pool + projection + warm-up classifier.

    ``__call__`` mirrors reference ``TextEncoderTransformer.forward`` (:503-508):
    returns {"embeddings": [B, d_txt], "logits": [B, n_disease]?}.
    """

    config: TextEncoderConfig = TextEncoderConfig()
    dtype: Any = jnp.float32

    def setup(self):
        self.bert = BertEncoder(self.config, dtype=self.dtype, name="bert")
        self.proj = nn.Dense(self.config.d_txt, dtype=self.dtype, name="proj")
        if self.config.use_warmup_classifier:
            self.classifier = nn.Dense(
                self.config.n_disease, dtype=self.dtype, name="classifier"
            )

    def encode(self, input_ids, attention_mask, token_type_ids=None, deterministic=True):
        hidden = self.bert(input_ids, attention_mask, token_type_ids, deterministic)
        pooled = masked_mean_pool(hidden, attention_mask)
        return self.proj(pooled)

    def backbone_pooled(self, input_ids, attention_mask, token_type_ids=None,
                        deterministic=True):
        """Masked-mean-pooled backbone output — lets phase-1 training run the
        frozen encoder outside the grad (reference encode no_grad branch, :467-470)."""
        hidden = self.bert(input_ids, attention_mask, token_type_ids, deterministic)
        return masked_mean_pool(hidden, attention_mask)

    def heads(self, pooled):
        """Projection + optional classifier over the pooled vector."""
        z = self.proj(pooled)
        out = {"embeddings": z}
        if self.config.use_warmup_classifier:
            out["logits"] = self.classifier(z)
        return out

    def __call__(self, input_ids, attention_mask, token_type_ids=None, deterministic=True):
        z = self.encode(input_ids, attention_mask, token_type_ids, deterministic)
        out = {"embeddings": z}
        if self.config.use_warmup_classifier:
            out["logits"] = self.classifier(z)
        return out


def init_text_encoder(rng: jax.Array, config: TextEncoderConfig | None = None):
    config = config or TextEncoderConfig()
    model = TextEncoder(config=config)
    dummy_ids = jnp.zeros((1, config.max_len), jnp.int32)
    dummy_mask = jnp.ones((1, config.max_len), jnp.int32)
    variables = model.init(rng, dummy_ids, dummy_mask)
    return model, variables
