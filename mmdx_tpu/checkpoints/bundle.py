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
    t5_scores: dict[int, float] | None = None  # unigram-LM piece log-probs

    def tokenizers(self):
        return self._bert_tokenizer(), self._t5_tokenizer()

    def _t5_tokenizer(self):
        """The C++ unigram-Viterbi core when buildable and the vocab is
        scored (output-identical — tests/test_native_unigram.py); pure
        Python otherwise."""
        from mmdx_tpu.text.t5_tokenizer import T5StyleTokenizer

        if self.t5_scores:
            try:
                from mmdx_tpu.text.native_unigram import NativeT5Tokenizer

                lines = [
                    f"{t}\t{self.t5_scores.get(i, 0.0)}"
                    for t, i in sorted(self.t5_vocab.items(), key=lambda kv: kv[1])
                ]
                path = _staged_vocab_file("t5", lines)
                tok = NativeT5Tokenizer(path)
                if tok.native_available:
                    return tok
            except Exception:
                pass
        return T5StyleTokenizer(vocab=self.t5_vocab, scores=self.t5_scores)

    def _bert_tokenizer(self):
        """The C++ WordPiece core when buildable (output-identical to the
        Python tokenizer — parity-asserted in tests/test_native_wordpiece.py);
        pure Python otherwise. The native core needs a vocab file, so the
        in-memory vocab is staged to a content-addressed temp file."""
        from mmdx_tpu.text.wordpiece import WordPieceTokenizer

        try:
            from mmdx_tpu.text.native_wordpiece import NativeWordPieceTokenizer

            path = _staged_vocab_file("bert", _vocab_list(self.bert_vocab))
            tok = NativeWordPieceTokenizer(path)
            if tok.native_available:
                return tok
        except Exception:
            pass
        return WordPieceTokenizer(vocab=self.bert_vocab)


def _vocab_list(vocab: dict[str, int]) -> list[str]:
    return [t for t, _ in sorted(vocab.items(), key=lambda kv: kv[1])]


def _staged_vocab_file(kind: str, lines: list[str]) -> Path:
    """Stage an in-memory vocab to a content-addressed temp file (the native
    tokenizer cores load from a path); atomic, idempotent across processes."""
    import hashlib
    import os
    import tempfile

    blob = ("\n".join(lines) + "\n").encode("utf-8")
    digest = hashlib.sha256(blob).hexdigest()[:16]
    path = Path(tempfile.gettempdir()) / f"mmdx_{kind}_vocab_{digest}.txt"
    if not path.exists():
        tmp = path.with_suffix(f".{os.getpid()}.tmp")
        tmp.write_bytes(blob)
        tmp.replace(path)
    return path


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
        "t5_scores": (
            [bundle.t5_scores.get(i) for i in range(len(bundle.t5_vocab))]
            if bundle.t5_scores else None
        ),
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
    raw_scores = header.get("t5_scores")
    return ModelBundle(
        config=config,
        variables=variables,
        bert_vocab={t: i for i, t in enumerate(header["bert_vocab"])},
        t5_vocab={t: i for i, t in enumerate(header["t5_vocab"])},
        t5_scores=(
            {i: float(s) for i, s in enumerate(raw_scores) if s is not None}
            if raw_scores else None
        ),
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
    bert_vocab, (t5_vocab, _) = _default_bert_vocab(), default_t5_vocab()
    return bert_vocab, t5_vocab


def _assets() -> Path:
    return Path(__file__).resolve().parents[1] / "assets"


def _default_bert_vocab() -> dict[str, int]:
    p = _assets() / "bert_vocab.txt"
    return {t: i for i, t in enumerate(p.read_text(encoding="utf-8").splitlines())}


def default_t5_vocab() -> tuple[dict[str, int], dict[int, float] | None]:
    """The shipped T5 vocab: scored TSV (spm_export_vocab format) -> unigram
    scores; plain piece-per-line -> (vocab, None)."""
    vocab: dict[str, int] = {}
    scores: dict[int, float] = {}
    lines = (_assets() / "t5_vocab.txt").read_text(encoding="utf-8").splitlines()
    for i, line in enumerate(lines):
        if "\t" in line:
            piece, score = line.split("\t", 1)
            vocab[piece] = i
            scores[i] = float(score)
        else:
            vocab[line] = i
    return vocab, (scores or None)


def bundle_from_torch(path_or_blob, t5_num_layers: int | None = None) -> ModelBundle:
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
    bert_vocab = _default_bert_vocab()
    t5_vocab, t5_scores = default_t5_vocab()
    artifacts = (blob["cfg"].get("artifacts") or {})
    return ModelBundle(
        config=config,
        variables=assemble_variables(image_vars, text_vars, fusion_vars),
        bert_vocab=bert_vocab,
        t5_vocab=t5_vocab,
        t5_scores=t5_scores,
        class_names=artifacts.get("class_names", list(DISEASES)),
        thresholds=artifacts.get("thresholds", [0.5] * 13),
        version=int(blob.get("version", 1)),
        metadata={"imported_from": "torch_model_bundle"},
    )


def bundle_from_torch_registry_dir(path: str | Path, version: int | None = None,
                                   t5_num_layers: int | None = None) -> ModelBundle:
    """Import the reference's Hopsworks model-registry directory layout:
    {``fusion_model.pt``, ``image_encoder.pt``, ``text_encoder.pt``,
    ``config.json``, optional ``t5_assets/``} — written by the reference's
    ``save_model_to_hopsworks_model_registry`` (training_pipeline.py:675-729)
    and consumed by ``load_model_from_hopsworks_model_registry``
    (inference_pipeline.py:53-139).

    If ``t5_assets/spiece.model`` exists (saved by ``t5_tokenizer.
    save_pretrained``, :724-729) the real SentencePiece vocab+scores load from
    it for id-level tokenizer parity; otherwise the shipped vocab is used.
    """
    from mmdx_tpu.checkpoints import torch_import as ti

    path = Path(path)
    cfg_dict = json.loads((path / "config.json").read_text(encoding="utf-8"))
    config = DiagnosisConfig.from_reference_json(cfg_dict)

    fusion_sd = ti.load_torch_state_dict(path / "fusion_model.pt")
    fusion_vars = ti.import_fusion(fusion_sd, num_layers=t5_num_layers)
    img_p, txt_p = path / "image_encoder.pt", path / "text_encoder.pt"
    if not img_p.exists() or not txt_p.exists():
        raise ValueError(
            "registry dir must contain image_encoder.pt and text_encoder.pt "
            "(the serving path needs both towers)"
        )
    image_vars = ti.import_image_encoder(ti.load_torch_state_dict(img_p))
    text_vars = ti.import_text_encoder(ti.load_torch_state_dict(txt_p))

    bert_vocab = _default_bert_vocab()
    spiece = path / "t5_assets" / "spiece.model"
    if spiece.exists():
        from mmdx_tpu.text.spm_reader import read_spiece_vocab

        t5_vocab, t5_scores = read_spiece_vocab(spiece)
    else:
        t5_vocab, t5_scores = default_t5_vocab()

    artifacts = cfg_dict.get("artifacts") or {}
    n_disease = (cfg_dict.get("fusion") or {}).get("n_disease") or 13
    return ModelBundle(
        config=config,
        variables=assemble_variables(image_vars, text_vars, fusion_vars),
        bert_vocab=bert_vocab,
        t5_vocab=t5_vocab,
        t5_scores=t5_scores,
        class_names=artifacts.get("class_names", list(DISEASES)),
        thresholds=artifacts.get("thresholds", [0.5] * n_disease),
        version=int(version or 1),
        metadata={"imported_from": "torch_registry_dir", "dir": str(path)},
    )


def new_random_bundle(seed: int = 0, config: DiagnosisConfig | None = None,
                      small: bool = False) -> ModelBundle:
    """Fresh random-init bundle (dev/test). ``small=True`` shrinks every tower
    for fast tests while keeping the full architecture."""
    import jax

    from mmdx_tpu.config import (FusionConfig, ImageEncoderConfig,
                                 ReportDecoderConfig, TextEncoderConfig)
    from mmdx_tpu.models.diagnosis import init_diagnosis_model

    bert_vocab = _default_bert_vocab()
    t5_vocab, t5_scores = default_t5_vocab()
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
        t5_scores=t5_scores,
        class_names=list(config.class_names),
        thresholds=list(config.thresholds),
        version=1,
    )
