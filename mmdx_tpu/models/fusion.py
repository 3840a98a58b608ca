"""Late-fusion head: concat -> MLP -> {disease logits, T5 conditioning tokens}.

Rebuilds the reference's ``FusionTransformerModel`` (reference
``backend/ml/pipelines/training_pipeline.py:516-618``):

    z = concat(z_img [B,1024], z_txt [B,512])            (:586)
    z_fuse = LayerNorm(Dropout(GELU(Linear(z))))         (:534-539)
    disease_logits = Linear(z_fuse) -> [B,13]            (:542)
    cond = GELU(Linear(z_fuse)) -> [B, K, H_dec]         (:553-558, :574-578)
    gen  = T5 decoder conditioned on cond                (:600-604)

The fused forward (concat + MLP + heads) is one chain of matmuls XLA fuses into
a single kernel — the "fused forward pass" of BASELINE.json's north star.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from mmdx_tpu.config import FusionConfig, ReportDecoderConfig
from mmdx_tpu.models.t5 import T5, shift_right


class FusionModel(nn.Module):
    """Fusion MLP + disease head + conditioning projection + T5 report head."""

    config: FusionConfig = FusionConfig()
    report_config: ReportDecoderConfig = ReportDecoderConfig()
    dtype: Any = jnp.float32

    def setup(self):
        cfg = self.config
        self.fuse_dense = nn.Dense(cfg.d_fuse_hidden, dtype=self.dtype, name="fuse_dense")
        self.fuse_ln = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="fuse_ln"
        )
        self.disease_head = nn.Dense(cfg.n_disease, dtype=self.dtype, name="disease_head")
        self.fuse_dropout = nn.Dropout(cfg.dropout)
        self.cond_proj = nn.Dense(
            self.report_config.d_model * cfg.n_cond_tokens, dtype=self.dtype, name="cond_proj"
        )
        self.report_model = T5(config=self.report_config, dtype=self.dtype, name="report_model")

    def fuse(self, z_img, z_txt, deterministic: bool = True):
        """[B,d_img],[B,d_txt] -> z_fuse [B,d_fuse_hidden]."""
        z = jnp.concatenate([z_img, z_txt], axis=-1)
        h = self.fuse_dense(z)
        h = jax.nn.gelu(h, approximate=False)  # torch nn.GELU default = exact erf
        h = self.fuse_dropout(h, deterministic=deterministic)
        return self.fuse_ln(h)

    def make_cond_tokens(self, z_fuse):
        """[B,d_fuse_hidden] -> synthetic encoder outputs [B, K, H_dec]
        (reference _make_encoder_outputs, :574-578)."""
        b = z_fuse.shape[0]
        cond = jax.nn.gelu(self.cond_proj(z_fuse), approximate=False)
        return cond.reshape(b, self.config.n_cond_tokens, self.report_config.d_model)

    def __call__(self, z_img, z_txt, report_labels=None, deterministic: bool = True):
        """Mirrors reference forward (:584-610). Returns z_fuse, disease_logits,
        and (if labels given) teacher-forced report logits."""
        z_fuse = self.fuse(z_img, z_txt, deterministic)
        disease_logits = self.disease_head(z_fuse)
        out = {"z_fuse": z_fuse, "disease_logits": disease_logits}
        if report_labels is not None:
            cond = self.make_cond_tokens(z_fuse)
            enc_mask = jnp.ones(cond.shape[:2], jnp.int32)
            dec_in = shift_right(
                report_labels,
                self.report_config.decoder_start_token_id,
                self.report_config.pad_token_id,
            )
            out["report_logits"] = self.report_model.decode(dec_in, cond, enc_mask)
        return out

    # ---- generation support: expose the pieces the decode loop needs ----
    def cond_and_cache(self, z_img, z_txt, max_len: int,
                       beam_width: int | None = None):
        """Prepare conditioning tokens + KV cache for incremental generation.
        ``beam_width`` selects the ancestry-mode beam cache layout."""
        z_fuse = self.fuse(z_img, z_txt, deterministic=True)
        cond = self.make_cond_tokens(z_fuse)
        cache, static_kv = self.report_model.init_cache(
            cond.shape[0], max_len, cond, beam_width=beam_width
        )
        self_bias = self.report_model.decode_self_bias(max_len)
        enc_mask = jnp.ones(cond.shape[:2], jnp.int32)
        return {
            "disease_logits": self.disease_head(z_fuse),
            "cond": cond,
            "cache": cache,
            "static_kv": static_kv,
            "self_bias": self_bias,
            "enc_mask": enc_mask,
        }

    def decode_step(self, token_ids, pos, cache, static_kv, self_bias, enc_mask):
        return self.report_model.decode_step(token_ids, pos, cache, static_kv,
                                             self_bias, enc_mask)

    def decode_step_beam(self, token_ids, pos, cache, anc, static_kv, self_bias,
                         enc_mask):
        return self.report_model.decode_step_beam(
            token_ids, pos, cache, anc, static_kv, self_bias, enc_mask
        )
