"""Reference-identical model_bundle.pt writer (test fixture).

Reproduces the reference's local-bundle publishing flow — the getattr-driven
``configuration`` dict of ``save_model_to_hopsworks_model_registry``
(reference ``backend/ml/pipelines/training_pipeline.py:682-720``) and the
atomic ``model_bundle.pt`` write with timestamped copy (``:773-797``) — so
tests can certify that a bundle produced by the reference's own code shape
(including its cfg quirks: attributes read via getattr with None defaults,
``n_cond_tokens`` sourced from the ``n_cond`` attribute, conditional
``artifacts`` key) flows through ``bundle_from_torch`` / the serving loader.

This is an on-disk interface contract, not framework code: it must match the
reference byte-layout-for-byte-layout for the interop claim to mean anything.
"""
from __future__ import annotations

import os
import shutil
from datetime import datetime
from pathlib import Path

import torch


def build_reference_configuration(
    fusion_model, text_encoder, *, bert_name="bert-base-uncased",
    hf_model_name=None, image_backbone="resnet50", artifacts=None,
) -> dict:
    """The reference's ``configuration`` dict, assembled the way the
    reference assembles it: every field read off the live modules via getattr
    with the reference's exact defaults (training_pipeline.py:682-720)."""
    report_model = getattr(fusion_model, "report_model", None)
    configuration = {
        "saved_at": datetime.utcnow().isoformat() + "Z",
        "fusion": {
            "d_img": getattr(fusion_model, "d_img", None),
            "d_txt": getattr(fusion_model, "d_txt", None),
            "d_fuse_hidden": getattr(fusion_model, "d_fuse_hidden", None),
            "n_disease": getattr(fusion_model, "n_disease", None),
            # the reference reads the *n_cond* attribute for this key
            "n_cond_tokens": getattr(fusion_model, "n_cond", None),
            "decoder_hidden": (report_model.config.d_model
                               if report_model is not None else None),
        },
        "report_head": {
            "hf_model_name": hf_model_name or (
                report_model.config._name_or_path
                if report_model is not None else None),
        },
        "text_encoder": {
            "hf_model_name": bert_name,
            "d_txt": getattr(fusion_model, "d_txt", None),
            "pooling": getattr(text_encoder, "pooling", "masked_mean"),
            "max_len": 96,
        },
        "image_encoder": {
            "backbone": image_backbone,
            "d_img": getattr(fusion_model, "d_img", None),
            "img_size": 224,
            "normalize": {"mean": [0.485, 0.456, 0.406],
                          "std": [0.229, 0.224, 0.225]},
        },
        "notes": "Fusion MLP + disease head (BCEWithLogits) + T5 report head (CE).",
    }
    if artifacts:
        configuration["artifacts"] = artifacts
    return configuration


def save_reference_model_bundle(
    fusion_model, image_encoder, text_encoder, model_dir,
    registry_version: int, *, bert_name="bert-base-uncased",
    hf_model_name=None, artifacts=None, configuration=None,
) -> Path:
    """Write ``model_bundle.pt`` exactly as the reference does
    (training_pipeline.py:773-797): dict of {cfg, three state_dicts, two
    tokenizer names, registry version}, atomic ``.pt.tmp`` + ``os.replace``,
    plus the timestamped ``model_bundle_<UTC>.pt`` copy."""
    model_dir = Path(model_dir)
    model_dir.mkdir(parents=True, exist_ok=True)
    if configuration is None:
        configuration = build_reference_configuration(
            fusion_model, text_encoder, bert_name=bert_name,
            hf_model_name=hf_model_name, artifacts=artifacts)

    latest = model_dir / "model_bundle.pt"
    stamp = datetime.utcnow().strftime("%Y%m%dT%H%M%SZ")
    versioned = model_dir / f"model_bundle_{stamp}.pt"

    bundle = {
        "cfg": configuration,
        "fusion_state": fusion_model.state_dict(),
        "image_state": image_encoder.state_dict(),
        "text_state": text_encoder.state_dict(),
        "t5_tokenizer_name": configuration["report_head"]["hf_model_name"],
        "bert_tokenizer_name": configuration["text_encoder"]["hf_model_name"],
        "version": registry_version,
    }
    tmp = latest.with_suffix(".pt.tmp")
    torch.save(bundle, tmp)
    os.replace(tmp, latest)
    shutil.copyfile(latest, versioned)
    return latest
