"""MultiModalDiagnosisModel — the flagship model: image tower + text tower +
late fusion + report decoder, as one jittable functional unit.

Equivalent capability to the reference's three-module stack wired together in
``inference()`` (reference ``backend/ml/pipelines/inference_pipeline.py:151-206``)
and ``training_tests()`` (``training_pipeline.py:808-1127``), but composed as a
single flax module so the full fused forward compiles to one XLA program
(classification) plus one decode program (generation).
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from mmdx_tpu.config import DiagnosisConfig
from mmdx_tpu.models.bert import TextEncoder
from mmdx_tpu.models.fusion import FusionModel
from mmdx_tpu.models.resnet import ImageEncoder


class MultiModalDiagnosisModel(nn.Module):
    config: DiagnosisConfig = DiagnosisConfig()
    dtype: Any = jnp.float32

    def setup(self):
        self.image_encoder = ImageEncoder(self.config.image, dtype=self.dtype,
                                          name="image_encoder")
        self.text_encoder = TextEncoder(self.config.text, dtype=self.dtype,
                                        name="text_encoder")
        self.fusion = FusionModel(self.config.fusion, self.config.report,
                                  dtype=self.dtype, name="fusion")

    def encode_image(self, images, train: bool = False):
        """Preprocessed NHWC images -> [B, d_img]."""
        return self.image_encoder.encode(images, train=train)

    def encode_text(self, input_ids, attention_mask, token_type_ids=None,
                    deterministic: bool = True):
        return self.text_encoder.encode(input_ids, attention_mask, token_type_ids,
                                        deterministic)

    def classify(self, images, input_ids, attention_mask, token_type_ids=None):
        """The fused classification hot path: both towers + fusion + disease head.

        Returns {"disease_logits": [B,13], "probs": [B,13], "z_img", "z_txt"}.
        """
        z_img = self.encode_image(images)
        z_txt = self.encode_text(input_ids, attention_mask, token_type_ids)
        out = self.fusion(z_img, z_txt)
        probs = jax.nn.sigmoid(out["disease_logits"].astype(jnp.float32))
        return {
            "disease_logits": out["disease_logits"],
            "probs": probs,
            "z_img": z_img,
            "z_txt": z_txt,
            "z_fuse": out["z_fuse"],
        }

    def classify_from_image_feats(self, feats, input_ids, attention_mask,
                                  token_type_ids=None):
        """Classification with precomputed pooled backbone features [B, 2048].

        The int8 "turbo" tower (models/resnet_int8) computes the ResNet
        backbone outside the flax graph; this picks up from the projection
        head so the rest of the program (text tower + fusion + disease head)
        is identical to ``classify``.
        """
        z_img = self.image_encoder.heads(feats)["embeddings"]
        z_txt = self.encode_text(input_ids, attention_mask, token_type_ids)
        out = self.fusion(z_img, z_txt)
        probs = jax.nn.sigmoid(out["disease_logits"].astype(jnp.float32))
        return {
            "disease_logits": out["disease_logits"],
            "probs": probs,
            "z_img": z_img,
            "z_txt": z_txt,
            "z_fuse": out["z_fuse"],
        }

    def prepare_generation(self, z_img, z_txt, max_len: int,
                           beam_width: int | None = None):
        """Fusion + conditioning + fresh KV cache for the decode loop."""
        return self.fusion.cond_and_cache(z_img, z_txt, max_len, beam_width)

    def decode_step(self, token_ids, pos, cache, static_kv, self_bias, enc_mask):
        return self.fusion.decode_step(token_ids, pos, cache, static_kv,
                                       self_bias, enc_mask)

    def decode_step_beam(self, token_ids, pos, cache, anc, static_kv, self_bias,
                         enc_mask):
        return self.fusion.decode_step_beam(token_ids, pos, cache, anc,
                                            static_kv, self_bias, enc_mask)

    def __call__(self, images, input_ids, attention_mask, token_type_ids=None,
                 report_labels=None, train: bool = False):
        """Full forward for training: towers (incl. warm-up classifier heads,
        so their params materialize as in the reference state dicts) + fusion
        (+ teacher-forced report)."""
        img_out = self.image_encoder(images, train=train)
        txt_out = self.text_encoder(input_ids, attention_mask, token_type_ids,
                                    deterministic=not train)
        out = self.fusion(img_out["embeddings"], txt_out["embeddings"],
                          report_labels=report_labels, deterministic=not train)
        out["z_img"] = img_out["embeddings"]
        out["z_txt"] = txt_out["embeddings"]
        if "logits" in img_out:
            out["image_logits"] = img_out["logits"]
        if "logits" in txt_out:
            out["text_logits"] = txt_out["logits"]
        return out


def init_diagnosis_model(rng: jax.Array, config: DiagnosisConfig | None = None,
                         dtype=jnp.float32):
    """Initialize the flagship model's variables with dummy inputs."""
    config = config or DiagnosisConfig()
    model = MultiModalDiagnosisModel(config=config, dtype=dtype)
    images = jnp.zeros((1, config.image.img_size, config.image.img_size, 3), jnp.float32)
    ids = jnp.zeros((1, config.text.max_len), jnp.int32)
    mask = jnp.ones((1, config.text.max_len), jnp.int32)
    labels = jnp.zeros((1, 8), jnp.int32)
    variables = model.init(rng, images, ids, mask, report_labels=labels)
    return model, variables
