"""Registry-directory interop: import the reference's Hopsworks model-dir
layout {fusion_model.pt, image_encoder.pt, text_encoder.pt, config.json,
t5_assets/} (written by reference training_pipeline.py:675-729) into a
ModelBundle, plus the minimal spiece.model reader round-trip."""
import json

import numpy as np
import pytest
import torch

from mmdx_tpu.text.spm_reader import (
    CONTROL,
    NORMAL,
    read_spiece_pieces,
    read_spiece_vocab,
    write_spiece_model,
)


def test_spiece_model_roundtrip(tmp_path):
    pieces = [("<pad>", 0.0), ("</s>", 0.0), ("<unk>", 0.0),
              ("▁the", -2.5), ("▁lung", -4.125), ("s", -3.0)]
    types = [CONTROL, CONTROL, NORMAL, NORMAL, NORMAL, NORMAL]
    p = write_spiece_model(pieces, tmp_path / "spiece.model", types=types)
    got = read_spiece_pieces(p)
    assert [(g[0], g[1]) for g in got] == [(t, pytest.approx(s)) for t, s in pieces]
    assert [g[2] for g in got] == types
    vocab, scores = read_spiece_vocab(p)
    assert vocab["▁lung"] == 4 and scores[4] == pytest.approx(-4.125)


def test_spiece_drives_unigram_tokenizer(tmp_path):
    from mmdx_tpu.text.t5_tokenizer import T5StyleTokenizer

    pieces = [("<pad>", 0.0), ("</s>", 0.0), ("<unk>", 0.0),
              ("▁ab", -1.0), ("c", -3.0), ("▁a", -1.5), ("bc", -1.0)]
    p = write_spiece_model(pieces, tmp_path / "spiece.model")
    vocab, scores = read_spiece_vocab(p)
    tok = T5StyleTokenizer(vocab=vocab, scores=scores)
    assert tok.algorithm == "unigram"
    assert tok.tokenize("abc") == ["▁a", "bc"]


@pytest.fixture(scope="module")
def registry_dir(tmp_path_factory):
    """Build the reference's registry dir from real torch state dicts at FULL
    reference dims (construction only — no forward passes)."""
    import sys

    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    from transformers import BertConfig, BertModel, T5Config, T5ForConditionalGeneration

    from torch_oracles.resnet_torch import TorchImageEncoder

    torch.manual_seed(1)

    class TorchText(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.encoder = BertModel(BertConfig())
            self.proj = torch.nn.Linear(768, 512)
            self.classifier = torch.nn.Linear(512, 13)

    class TorchFusion(torch.nn.Module):
        def __init__(self):
            super().__init__()
            t5c = T5Config(decoder_start_token_id=0)
            self.fusion_mlp = torch.nn.Sequential(
                torch.nn.Linear(1536, 1024), torch.nn.GELU(),
                torch.nn.Dropout(0.1), torch.nn.LayerNorm(1024))
            self.disease_head = torch.nn.Linear(1024, 13)
            self.cond_proj = torch.nn.Sequential(
                torch.nn.Linear(1024, 512 * 4), torch.nn.GELU())
            self.report_model = T5ForConditionalGeneration(t5c)

    d = tmp_path_factory.mktemp("registry_model")
    img, txt, fus = TorchImageEncoder(), TorchText(), TorchFusion()
    torch.save(fus.state_dict(), d / "fusion_model.pt")
    torch.save(img.state_dict(), d / "image_encoder.pt")
    torch.save(txt.state_dict(), d / "text_encoder.pt")
    cfg = {
        "saved_at": "2026-01-01T00:00:00Z",
        "fusion": {"d_img": 1024, "d_txt": 512, "d_fuse_hidden": 1024,
                   "n_disease": 13, "n_cond_tokens": 4, "decoder_hidden": 512},
        "report_head": {"hf_model_name": "t5-small"},
        "text_encoder": {"hf_model_name": "bert-base-uncased", "d_txt": 512,
                         "pooling": "masked_mean", "max_len": 96},
        "image_encoder": {"backbone": "resnet50", "d_img": 1024, "img_size": 224,
                          "normalize": {"mean": [0.485, 0.456, 0.406],
                                        "std": [0.229, 0.224, 0.225]}},
        "artifacts": {"class_names": ["c%d" % i for i in range(13)],
                      "thresholds": [0.4] * 13},
    }
    (d / "config.json").write_text(json.dumps(cfg))
    return d, img, fus


def test_registry_dir_import(registry_dir):
    from mmdx_tpu.checkpoints.bundle import bundle_from_torch_registry_dir

    d, img, fus = registry_dir
    mb = bundle_from_torch_registry_dir(d, version=5)
    assert mb.version == 5
    assert mb.class_names == ["c%d" % i for i in range(13)]
    assert mb.thresholds == [0.4] * 13
    assert mb.config.fusion.d_img == 1024 and mb.config.fusion.d_txt == 512
    # weight exactness spot checks (pure numpy, no compile)
    got = np.asarray(
        mb.variables["params"]["fusion"]["disease_head"]["kernel"]
    )
    want = fus.disease_head.weight.detach().numpy().T
    np.testing.assert_array_equal(got, want)
    got_conv = np.asarray(
        mb.variables["params"]["image_encoder"]["backbone"]["conv_stem"]["kernel"]
    )
    assert got_conv.shape == (7, 7, 3, 64)
    # running stats came through (BN eval-mode parity depends on them)
    bs = mb.variables["batch_stats"]["image_encoder"]
    assert len(__import__("jax").tree.leaves(bs)) > 0


def test_registry_dir_spiece_assets(registry_dir):
    from mmdx_tpu.checkpoints.bundle import bundle_from_torch_registry_dir

    d, _, _ = registry_dir
    assets = d / "t5_assets"
    write_spiece_model(
        [("<pad>", 0.0), ("</s>", 0.0), ("<unk>", 0.0), ("▁report", -1.0)],
        assets / "spiece.model",
    )
    mb = bundle_from_torch_registry_dir(d)
    assert mb.t5_vocab == {"<pad>": 0, "</s>": 1, "<unk>": 2, "▁report": 3}
    assert mb.t5_scores[3] == pytest.approx(-1.0)
    _, t5_tok = mb.tokenizers()
    assert t5_tok.algorithm == "unigram"


def test_registry_dir_missing_towers(registry_dir, tmp_path):
    from mmdx_tpu.checkpoints.bundle import bundle_from_torch_registry_dir

    d, _, _ = registry_dir
    incomplete = tmp_path / "partial"
    incomplete.mkdir()
    (incomplete / "config.json").write_text((d / "config.json").read_text())
    torch.save({}, incomplete / "fusion_model.pt")
    with pytest.raises(Exception):
        bundle_from_torch_registry_dir(incomplete)


# ---------------------------------------------------------------------------
# model_bundle.pt written by the REFERENCE's own publishing flow
# (torch_oracles/reference_writer.py replicates training_pipeline.py:682-797:
# getattr-driven configuration, atomic .pt.tmp replace, timestamped copy) —
# consumed through bundle_from_torch / the serving loader, covering the cfg
# quirk surface (getattr defaults, n_cond sourcing, missing-key fallbacks).
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def reference_written_bundle(tmp_path_factory):
    import sys

    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    from transformers import BertConfig, BertModel, T5Config, T5ForConditionalGeneration

    from torch_oracles.reference_writer import save_reference_model_bundle
    from torch_oracles.resnet_torch import TorchImageEncoder

    torch.manual_seed(3)

    class TorchText(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.encoder = BertModel(BertConfig())
            self.proj = torch.nn.Linear(768, 512)
            self.classifier = torch.nn.Linear(512, 13)

    class TorchFusion(torch.nn.Module):
        def __init__(self):
            super().__init__()
            # the reference model's attribute surface its writer getattrs
            # (training_pipeline.py:520-551)
            self.d_img, self.d_txt, self.d_fuse_hidden = 1024, 512, 1024
            self.n_disease, self.n_cond_tokens, self.n_cond = 13, 4, 4
            self.fusion_mlp = torch.nn.Sequential(
                torch.nn.Linear(1536, 1024), torch.nn.GELU(),
                torch.nn.Dropout(0.1), torch.nn.LayerNorm(1024))
            self.disease_head = torch.nn.Linear(1024, 13)
            self.cond_proj = torch.nn.Sequential(
                torch.nn.Linear(1024, 512 * 4), torch.nn.GELU())
            self.report_model = T5ForConditionalGeneration(
                T5Config(decoder_start_token_id=0))

    d = tmp_path_factory.mktemp("ref_bundle")
    img, txt, fus = TorchImageEncoder(), TorchText(), TorchFusion()
    path = save_reference_model_bundle(
        fus, img, txt, d, registry_version=12, hf_model_name="t5-small",
        artifacts={"class_names": ["c%d" % i for i in range(13)],
                   "thresholds": [0.45] * 13})
    return d, path, img, txt, fus


def test_reference_written_bundle_roundtrip(reference_written_bundle):
    from mmdx_tpu.checkpoints.bundle import bundle_from_torch

    d, path, img, txt, fus = reference_written_bundle
    # the reference writes atomically + a timestamped history copy
    assert path.name == "model_bundle.pt" and not list(d.glob("*.pt.tmp"))
    assert any(p.name.startswith("model_bundle_") for p in d.glob("*.pt"))

    mb = bundle_from_torch(path)
    # registry version carried through (NOT the serving path's hardcoded 999,
    # views.py:256 — a documented reference bug we fix)
    assert mb.version == 12
    assert mb.class_names == ["c%d" % i for i in range(13)]
    assert mb.thresholds == [0.45] * 13
    cfgj = mb.config
    assert (cfgj.fusion.d_img, cfgj.fusion.d_txt) == (1024, 512)
    assert cfgj.fusion.n_cond_tokens == 4  # sourced from the n_cond attr
    assert cfgj.report.d_model == 512      # decoder_hidden from T5 config
    assert cfgj.text.max_len == 96

    # weights land exactly (spot checks across all three towers)
    p = mb.variables["params"]
    np.testing.assert_array_equal(
        np.asarray(p["fusion"]["disease_head"]["kernel"]),
        fus.disease_head.weight.detach().numpy().T)
    np.testing.assert_array_equal(
        np.asarray(p["text_encoder"]["bert"]["layer7"]["attn_v"]["kernel"]),
        txt.encoder.state_dict()["encoder.layer.7.attention.self.value.weight"]
        .numpy().T)
    np.testing.assert_array_equal(
        np.asarray(p["image_encoder"]["backbone"]["conv_stem"]["kernel"]),
        np.transpose(img.state_dict()["backbone.0.weight"].numpy(),
                     (2, 3, 1, 0)))
    np.testing.assert_array_equal(
        np.asarray(p["fusion"]["report_model"]["shared"]["embedding"]),
        fus.report_model.state_dict()["shared.weight"].numpy())


def test_reference_cfg_quirk_fallbacks(reference_written_bundle, tmp_path):
    """A cfg whose getattrs resolved to None / whose keys are missing loads
    with the serving-path fallbacks (views.py:207-213: d_txt->512 — NOT the
    registry path's buggy 1024, inference_pipeline.py:74)."""
    from mmdx_tpu.checkpoints.bundle import bundle_from_torch
    from mmdx_tpu.config import DiagnosisConfig

    d, path, img, txt, fus = reference_written_bundle
    blob = torch.load(path, map_location="cpu", weights_only=False)

    # simulate the reference writing a cfg off a model missing the attrs:
    # getattr(..., None) everywhere -> drop the keys entirely
    cfg = {k: dict(v) if isinstance(v, dict) else v
           for k, v in blob["cfg"].items()}
    del cfg["fusion"]["d_txt"]
    del cfg["fusion"]["n_cond_tokens"]
    cfg["artifacts"] = {}
    rebuilt = DiagnosisConfig.from_reference_json(cfg)
    assert rebuilt.fusion.d_txt == 512
    assert rebuilt.fusion.n_cond_tokens == 4
    assert list(rebuilt.class_names)[0] == "No Finding"

    # a bundle missing a required key is rejected with the key named
    bad = dict(blob)
    del bad["text_state"]
    p2 = tmp_path / "bad.pt"
    torch.save(bad, p2)
    with pytest.raises(ValueError, match="text_state"):
        bundle_from_torch(p2)
