"""Model bundle: the single-artifact checkpoint the serving layer loads.

Mirrors the reference's two publish formats (reference
``backend/ml/pipelines/training_pipeline.py:650-803``):
  * a single-file local bundle (``model_bundle.pt`` analog) for low-latency
    serving loads — ours is ``model_bundle.mmdx``: a JSON header (configs,
    version, class names/thresholds, embedded tokenizer vocabs) + the flax
    msgpack of all variables; written atomically with a timestamped copy
    (reference :773-797);
  * a versioned registry directory (see checkpoints/registry.py).

Also imports the reference's torch ``model_bundle.pt`` directly
(``bundle_from_torch``) so reference users bring their weights unchanged.
"""
from __future__ import annotations

import datetime
import io
import json
import struct
from dataclasses import dataclass
from pathlib import Path
from typing import Any

import numpy as np

from flax import serialization

from mmdx_tpu.config import DISEASES, DiagnosisConfig

MAGIC = b"MMDX0001"
BUNDLE_VERSION = 1


@dataclass
class ModelBundle:
    config: DiagnosisConfig
    variables: dict[str, Any]  # {"params": {...}, "batch_stats": {...}}
    bert_vocab: dict[str, int]
    t5_vocab: dict[str, int]
    class_names: list[str]
    thresholds: list[float]
    version: int = 1
    metadata: dict[str, Any] | None = None

    def tokenizers(self):
        from mmdx_tpu.text.t5_tokenizer import T5StyleTokenizer
        from mmdx_tpu.text.wordpiece import WordPieceTokenizer

        return (
            WordPieceTokenizer(vocab=self.bert_vocab),
            T5StyleTokenizer(vocab=self.t5_vocab),
        )


def _vocab_list(vocab: dict[str, int]) -> list[str]:
    return [t for t, _ in sorted(vocab.items(), key=lambda kv: kv[1])]


def save_bundle(bundle: ModelBundle, path: str | Path, timestamped_copy: bool = True) -> Path:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    header = {
        "bundle_version": BUNDLE_VERSION,
        "version": bundle.version,
        "saved_at": datetime.datetime.now(datetime.timezone.utc).isoformat(),
        "config": json.loads(bundle.config.to_json()),
        "reference_config": bundle.config.to_reference_json(),
        "class_names": bundle.class_names,
        "thresholds": bundle.thresholds,
        "bert_vocab": _vocab_list(bundle.bert_vocab),
        "t5_vocab": _vocab_list(bundle.t5_vocab),
        "metadata": bundle.metadata or {},
    }
    header_bytes = json.dumps(header).encode("utf-8")
    blob = serialization.to_bytes(bundle.variables)
    payload = MAGIC + struct.pack("<Q", len(header_bytes)) + header_bytes + blob

    tmp = path.with_suffix(path.suffix + ".tmp")
    tmp.write_bytes(payload)
    tmp.replace(path)  # atomic (reference :792-794)
    if timestamped_copy:
        stamp = datetime.datetime.now(datetime.timezone.utc).strftime("%Y%m%dT%H%M%SZ")
        copy = path.with_name(f"{path.stem}_{stamp}{path.suffix}")
        copy.write_bytes(payload)
    return path


def load_bundle(src: str | Path | bytes) -> ModelBundle:
    if isinstance(src, (bytes, bytearray)):
        payload = bytes(src)
    else:
        payload = Path(src).read_bytes()
    if payload[:8] != MAGIC:
        raise ValueError("not an mmdx bundle (bad magic)")
    (hlen,) = struct.unpack("<Q", payload[8:16])
    header = json.loads(payload[16 : 16 + hlen].decode("utf-8"))
    blob = payload[16 + hlen :]

    config = DiagnosisConfig.from_json(json.dumps(header["config"]))
    import jax

    from mmdx_tpu.models.diagnosis import init_diagnosis_model

    # abstract template: structure + shapes only, no compute/compile
    template = jax.eval_shape(
        lambda: init_diagnosis_model(jax.random.key(0), config)[1]
    )
    variables = serialization.from_bytes(template, blob)
    return ModelBundle(
        config=config,
        variables=variables,
        bert_vocab={t: i for i, t in enumerate(header["bert_vocab"])},
        t5_vocab={t: i for i, t in enumerate(header["t5_vocab"])},
        class_names=header["class_names"],
        thresholds=header["thresholds"],
        version=header["version"],
        metadata=header.get("metadata") or {},
    )


def assemble_variables(image_vars: dict, text_vars: dict, fusion_vars: dict) -> dict:
    """Per-module variable trees -> MultiModalDiagnosisModel variables."""
    return {
        "params": {
            "image_encoder": image_vars["params"],
            "text_encoder": text_vars["params"],
            "fusion": fusion_vars["params"],
        },
        "batch_stats": {"image_encoder": image_vars.get("batch_stats", {})},
    }


def split_variables(variables: dict) -> tuple[dict, dict, dict]:
    """Inverse of assemble_variables."""
    image = {
        "params": variables["params"]["image_encoder"],
        "batch_stats": variables.get("batch_stats", {}).get("image_encoder", {}),
    }
    text = {"params": variables["params"]["text_encoder"]}
    fusion = {"params": variables["params"]["fusion"]}
    return image, text, fusion


def default_vocabs() -> tuple[dict[str, int], dict[str, int]]:
    assets = Path(__file__).resolve().parents[1] / "assets"

    def read(p):
        return {t: i for i, t in enumerate(p.read_text(encoding="utf-8").splitlines())}

    return read(assets / "bert_vocab.txt"), read(assets / "t5_vocab.txt")


def bundle_from_torch(path_or_blob, t5_num_layers: int = 6) -> ModelBundle:
    """Import the reference's torch ``model_bundle.pt`` (reference :783-791).

    Weights convert exactly; tokenizers fall back to the shipped vocabs (the
    hub names recorded in the torch bundle are not fetchable offline — drop the
    real vocab files into assets/ for id-level parity).
    """
    from mmdx_tpu.checkpoints import torch_import as ti

    blob = ti.load_torch_state_dict(path_or_blob)
    required = {"cfg", "fusion_state", "image_state", "text_state"}
    missing = required.difference(blob.keys())
    if missing:
        raise ValueError(f"Bundle missing keys: {missing}")

    config = DiagnosisConfig.from_reference_json(blob["cfg"])
    image_vars = ti.import_image_encoder(blob["image_state"])
    text_vars = ti.import_text_encoder(blob["text_state"])
    fusion_vars = ti.import_fusion(blob["fusion_state"], num_layers=t5_num_layers)
    bert_vocab, t5_vocab = default_vocabs()
    artifacts = (blob["cfg"].get("artifacts") or {})
    return ModelBundle(
        config=config,
        variables=assemble_variables(image_vars, text_vars, fusion_vars),
        bert_vocab=bert_vocab,
        t5_vocab=t5_vocab,
        class_names=artifacts.get("class_names", list(DISEASES)),
        thresholds=artifacts.get("thresholds", [0.5] * 13),
        version=int(blob.get("version", 1)),
        metadata={"imported_from": "torch_model_bundle"},
    )


def new_random_bundle(seed: int = 0, config: DiagnosisConfig | None = None,
                      small: bool = False) -> ModelBundle:
    """Fresh random-init bundle (dev/test). ``small=True`` shrinks every tower
    for fast tests while keeping the full architecture."""
    import jax

    from mmdx_tpu.config import (FusionConfig, ImageEncoderConfig,
                                 ReportDecoderConfig, TextEncoderConfig)
    from mmdx_tpu.models.diagnosis import init_diagnosis_model

    bert_vocab, t5_vocab = default_vocabs()
    if config is None:
        if small:
            config = DiagnosisConfig(
                image=ImageEncoderConfig(d_img=64, img_size=64),
                text=TextEncoderConfig(
                    vocab_size=len(bert_vocab), hidden_size=64, num_layers=2,
                    num_heads=4, intermediate_size=128, d_txt=32, max_len=32,
                    max_position_embeddings=64,
                ),
                fusion=FusionConfig(d_img=64, d_txt=32, d_fuse_hidden=64),
                report=ReportDecoderConfig(
                    vocab_size=len(t5_vocab), d_model=64, d_kv=16, d_ff=128,
                    num_layers=2, num_decoder_layers=2, num_heads=4,
                ),
            )
        else:
            # full reference dims (BERT-base 30522 vocab, T5-small 32128); the
            # shipped tokenizer vocabs map into the low id range
            config = DiagnosisConfig()
    _, variables = init_diagnosis_model(jax.random.key(seed), config)
    return ModelBundle(
        config=config,
        variables=variables,
        bert_vocab=bert_vocab,
        t5_vocab=t5_vocab,
        class_names=list(config.class_names),
        thresholds=list(config.thresholds),
        version=1,
    )
