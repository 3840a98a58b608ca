"""Torch-format export: our weights hand back to the reference stack.

Round-trip (export -> reference-format file -> re-import) must be exact, and
the exported state dicts must strict-load into torch modules shaped like the
reference's (ImageEncoderCNN / TextEncoderTransformer / FusionTransformerModel,
reference training_pipeline.py:157-618)."""
import numpy as np
import pytest
import torch

from mmdx_tpu.checkpoints.bundle import (
    bundle_from_torch,
    bundle_from_torch_registry_dir,
    new_random_bundle,
    split_variables,
)
from mmdx_tpu.checkpoints.torch_export import (
    bundle_to_torch,
    bundle_to_torch_registry_dir,
    export_fusion,
    export_image_encoder,
    export_text_encoder,
)


@pytest.fixture(scope="module")
def bundle():
    return new_random_bundle(seed=7, small=True)


def _assert_tree_subset(got: dict, want: dict, path=""):
    """Every leaf of ``want`` exists in ``got`` and matches exactly."""
    for k, v in want.items():
        assert k in got, f"missing {path}{k}"
        if isinstance(v, dict):
            _assert_tree_subset(got[k], v, f"{path}{k}.")
        else:
            np.testing.assert_array_equal(
                np.asarray(got[k], np.float32), np.asarray(v, np.float32),
                err_msg=f"{path}{k}",
            )


def test_bundle_pt_roundtrip(bundle, tmp_path):
    p = bundle_to_torch(bundle, tmp_path / "model_bundle.pt")
    back = bundle_from_torch(p, t5_num_layers=bundle.config.report.num_layers)
    # every original weight survives byte-exactly (the reimport may add the
    # tied lm_head alias, which is fine: tied models never read it)
    _assert_tree_subset(back.variables["params"], bundle.variables["params"])
    _assert_tree_subset(back.variables["batch_stats"],
                        bundle.variables["batch_stats"])
    assert back.version == bundle.version
    assert back.class_names == list(bundle.class_names)
    assert np.allclose(back.thresholds, bundle.thresholds)
    assert back.config.fusion.d_img == bundle.config.fusion.d_img
    assert back.config.text.max_len == bundle.config.text.max_len


def test_registry_dir_roundtrip(bundle, tmp_path):
    d = bundle_to_torch_registry_dir(bundle, tmp_path / "registry")
    assert (d / "t5_assets" / "spiece.model").exists()
    back = bundle_from_torch_registry_dir(
        d, version=3, t5_num_layers=bundle.config.report.num_layers
    )
    _assert_tree_subset(back.variables["params"], bundle.variables["params"])
    assert back.version == 3
    # the real vocab + scores rode through t5_assets/spiece.model
    assert back.t5_vocab == bundle.t5_vocab
    assert back.t5_scores is not None
    for i, s in bundle.t5_scores.items():
        assert back.t5_scores[i] == pytest.approx(s, abs=1e-6)


def test_strict_load_into_reference_shaped_modules(bundle):
    """The exported dicts satisfy torch's strict load on modules built the
    way the reference builds them (construction only, no forwards)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent))
    from transformers import BertConfig, BertModel, T5Config, T5ForConditionalGeneration

    cfg = bundle.config
    image_vars, text_vars, fusion_vars = split_variables(bundle.variables)

    from torch_oracles.resnet_torch import TorchImageEncoder

    img = TorchImageEncoder(d_img=cfg.image.d_img, n_disease=cfg.fusion.n_disease)
    img.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v))
         for k, v in export_image_encoder(image_vars).items()},
        strict=True,
    )

    bert_cfg = BertConfig(
        vocab_size=cfg.text.vocab_size, hidden_size=cfg.text.hidden_size,
        num_hidden_layers=cfg.text.num_layers,
        num_attention_heads=cfg.text.num_heads,
        intermediate_size=cfg.text.intermediate_size,
        max_position_embeddings=cfg.text.max_position_embeddings,
    )

    class TorchText(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.encoder = BertModel(bert_cfg)
            self.proj = torch.nn.Linear(cfg.text.hidden_size, cfg.text.d_txt)
            self.classifier = torch.nn.Linear(cfg.text.d_txt, cfg.fusion.n_disease)

    txt = TorchText()
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in export_text_encoder(text_vars).items()}
    missing, unexpected = txt.load_state_dict(sd, strict=False)
    assert not unexpected, unexpected
    # HF BertModel keeps non-persistent buffers out of state dicts; nothing
    # weight-like may be missing
    assert all("position_ids" in m for m in missing), missing

    t5c = T5Config(
        vocab_size=cfg.report.vocab_size, d_model=cfg.report.d_model,
        d_kv=cfg.report.d_kv, d_ff=cfg.report.d_ff,
        num_layers=cfg.report.num_layers, num_heads=cfg.report.num_heads,
        relative_attention_num_buckets=cfg.report.relative_attention_num_buckets,
        decoder_start_token_id=0,
    )

    class TorchFusion(torch.nn.Module):
        def __init__(self):
            super().__init__()
            d_fuse = cfg.fusion.d_img + cfg.fusion.d_txt
            self.fusion_mlp = torch.nn.Sequential(
                torch.nn.Linear(d_fuse, cfg.fusion.d_fuse_hidden),
                torch.nn.GELU(), torch.nn.Dropout(0.1),
                torch.nn.LayerNorm(cfg.fusion.d_fuse_hidden))
            self.disease_head = torch.nn.Linear(
                cfg.fusion.d_fuse_hidden, cfg.fusion.n_disease)
            self.cond_proj = torch.nn.Sequential(
                torch.nn.Linear(cfg.fusion.d_fuse_hidden,
                                cfg.report.d_model * cfg.fusion.n_cond_tokens),
                torch.nn.GELU())
            self.report_model = T5ForConditionalGeneration(t5c)

    fus = TorchFusion()
    fus.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v))
         for k, v in export_fusion(fusion_vars).items()},
        strict=True,
    )
    # tied aliases actually tie
    assert torch.equal(fus.report_model.lm_head.weight,
                       fus.report_model.shared.weight)
