"""Pretrained bootstrap: graft real-layout trunk checkpoints into a fresh
bundle (checkpoints/pretrained.py) — the reference's production starting
point (ResNet-50 ImageNet-V2 / BERT-base / T5-small,
training_pipeline.py:176-197,360,545).

BERT/T5 state dicts come from REAL transformers modules built from default
configs (BertConfig() == bert-base, T5Config() == t5-small) — the genuine
production key layouts, random weights, zero egress. torchvision is not in
this environment, so the resnet50 state dict is synthesized with the exact
torchvision key schema and shapes.
"""
import numpy as np
import pytest

from mmdx_tpu.checkpoints.pretrained import (
    _detect_prefix,
    bundle_from_pretrained,
    load_checkpoint,
)

torch = pytest.importorskip("torch")


# ---------------------------------------------------------------- fixtures
def synthetic_torchvision_resnet50_sd():
    """State dict with torchvision resnet50's exact keys/shapes.

    Bottleneck widths: stage s uses mid width 64*2**s, out 256*2**s;
    block 0 of each stage carries a downsample pair. fc.* included (the
    importer must ignore it — the reference drops fc, children[:-1]).
    """
    rng = np.random.default_rng(0)
    sd = {}

    def t(*shape):
        return torch.from_numpy(
            rng.standard_normal(shape).astype(np.float32) * 0.02)

    def bn(prefix, c):
        sd[f"{prefix}.weight"] = t(c)
        sd[f"{prefix}.bias"] = t(c)
        sd[f"{prefix}.running_mean"] = t(c)
        sd[f"{prefix}.running_var"] = torch.ones(c)
        sd[f"{prefix}.num_batches_tracked"] = torch.tensor(0)

    sd["conv1.weight"] = t(64, 3, 7, 7)
    bn("bn1", 64)
    in_ch = 64
    for s, n_blocks in enumerate((3, 4, 6, 3)):
        mid, out = 64 * 2 ** s, 256 * 2 ** s
        for b in range(n_blocks):
            p = f"layer{s + 1}.{b}"
            sd[f"{p}.conv1.weight"] = t(mid, in_ch, 1, 1)
            bn(f"{p}.bn1", mid)
            sd[f"{p}.conv2.weight"] = t(mid, mid, 3, 3)
            bn(f"{p}.bn2", mid)
            sd[f"{p}.conv3.weight"] = t(out, mid, 1, 1)
            bn(f"{p}.bn3", out)
            if b == 0:
                sd[f"{p}.downsample.0.weight"] = t(out, in_ch, 1, 1)
                bn(f"{p}.downsample.1", out)
            in_ch = out
    sd["fc.weight"] = t(1000, 2048)
    sd["fc.bias"] = t(1000)
    return sd


@pytest.fixture(scope="module")
def hf_state_dicts():
    """Real HF module layouts from default configs (no downloads)."""
    from transformers import BertConfig, BertModel, T5Config
    from transformers.models.t5.modeling_t5 import T5ForConditionalGeneration

    torch.manual_seed(0)
    bert = BertModel(BertConfig())  # defaults == bert-base-uncased dims
    t5 = T5ForConditionalGeneration(T5Config())  # defaults == t5-small dims
    return bert.state_dict(), t5.state_dict()


# ---------------------------------------------------------------- tests
def test_bootstrap_grafts_all_towers(hf_state_dicts):
    bert_sd, t5_sd = hf_state_dicts
    resnet_sd = synthetic_torchvision_resnet50_sd()

    bundle = bundle_from_pretrained(resnet=resnet_sd, bert=bert_sd, t5=t5_sd)
    p = bundle.variables["params"]
    s = bundle.variables["batch_stats"]

    # resnet trunk: conv_stem == torchvision conv1 transposed OIHW->HWIO
    np.testing.assert_array_equal(
        np.asarray(p["image_encoder"]["backbone"]["conv_stem"]["kernel"]),
        np.transpose(resnet_sd["conv1.weight"].numpy(), (2, 3, 1, 0)))
    # BN running stats land in batch_stats
    np.testing.assert_array_equal(
        np.asarray(s["image_encoder"]["backbone"]["bn_stem"]["mean"]),
        resnet_sd["bn1.running_mean"].numpy())
    np.testing.assert_array_equal(
        np.asarray(
            p["image_encoder"]["backbone"]["layer3_block2"]["conv2"]["kernel"]),
        np.transpose(resnet_sd["layer3.2.conv2.weight"].numpy(), (2, 3, 1, 0)))

    # bert trunk: layer0 query kernel == HF weight transposed [out,in]->[in,out]
    np.testing.assert_array_equal(
        np.asarray(p["text_encoder"]["bert"]["layer0"]["attn_q"]["kernel"]),
        bert_sd["encoder.layer.0.attention.self.query.weight"].numpy().T)
    np.testing.assert_array_equal(
        np.asarray(p["text_encoder"]["bert"]["word_embeddings"]["embedding"]),
        bert_sd["embeddings.word_embeddings.weight"].numpy())

    # t5 trunk: shared embedding + a decoder cross-attn kernel
    np.testing.assert_array_equal(
        np.asarray(p["fusion"]["report_model"]["shared"]["embedding"]),
        t5_sd["shared.weight"].numpy())
    np.testing.assert_array_equal(
        np.asarray(
            p["fusion"]["report_model"]["decoder_layer3"]["cross_attn"]["q"]["kernel"]),
        t5_sd["decoder.block.3.layer.1.EncDecAttention.q.weight"].numpy().T)

    # heads stay fresh (identical to the same-seed random bundle's heads)
    from mmdx_tpu.checkpoints.bundle import new_random_bundle

    fresh = new_random_bundle(seed=0)
    np.testing.assert_array_equal(
        np.asarray(p["fusion"]["disease_head"]["kernel"]),
        np.asarray(fresh.variables["params"]["fusion"]["disease_head"]["kernel"]))
    np.testing.assert_array_equal(
        np.asarray(p["image_encoder"]["proj"]["kernel"]),
        np.asarray(fresh.variables["params"]["image_encoder"]["proj"]["kernel"]))

    # tree structure unchanged -> drop-in for the training pipeline's jit
    import jax

    assert (jax.tree_util.tree_structure(bundle.variables)
            == jax.tree_util.tree_structure(fresh.variables))
    assert bundle.metadata["pretrained"] == {
        "image_backbone": "pretrained", "text_backbone": "pretrained",
        "report_model": "pretrained"}


def test_bootstrap_partial_and_validation(hf_state_dicts):
    bert_sd, _ = hf_state_dicts

    # single tower: others remain random init
    bundle = bundle_from_pretrained(bert=bert_sd)
    assert bundle.metadata["pretrained"] == {"text_backbone": "pretrained"}

    # BertForPreTraining-style "bert." prefix is detected
    prefixed = {f"bert.{k}": v for k, v in bert_sd.items()}
    assert _detect_prefix(prefixed, "embeddings.word_embeddings.weight",
                          ("", "bert.", "encoder.")) == "bert."
    b2 = bundle_from_pretrained(bert=prefixed)
    np.testing.assert_array_equal(
        np.asarray(b2.variables["params"]["text_encoder"]["bert"]["layer5"]
                   ["ffn_in"]["kernel"]),
        bert_sd["encoder.layer.5.intermediate.dense.weight"].numpy().T)

    # wrong-shaped checkpoint is rejected with the offending key named
    bad = dict(bert_sd)
    bad["embeddings.word_embeddings.weight"] = torch.zeros(17, 768)
    with pytest.raises(ValueError, match="word_embeddings"):
        bundle_from_pretrained(bert=bad)


def test_load_checkpoint_formats(tmp_path, hf_state_dicts):
    bert_sd, _ = hf_state_dicts
    # torch pickle file
    pt = tmp_path / "bert.bin"
    torch.save(bert_sd, pt)
    sd = load_checkpoint(pt)
    assert isinstance(sd["embeddings.word_embeddings.weight"], np.ndarray)

    # safetensors file
    from safetensors.numpy import save_file

    st = tmp_path / "bert.safetensors"
    save_file({k: v.numpy() for k, v in bert_sd.items()
               if "position_ids" not in k}, str(st))
    sd2 = load_checkpoint(st)
    np.testing.assert_array_equal(
        sd2["embeddings.word_embeddings.weight"],
        bert_sd["embeddings.word_embeddings.weight"].numpy())

    with pytest.raises(FileNotFoundError):
        load_checkpoint(tmp_path / "missing.pth")
