"""Golden parity: flax FusionModel vs a torch oracle with the reference's module
structure (fusion_mlp / disease_head / cond_proj / report_model T5)."""
import numpy as np
import pytest
import torch

from mmdx_tpu.checkpoints.torch_import import import_fusion
from mmdx_tpu.config import FusionConfig, ReportDecoderConfig
from mmdx_tpu.models.fusion import FusionModel
from mmdx_tpu.pipelines.losses import bce_with_logits, fusion_loss


def _t5_cfgs():
    from transformers import T5Config

    hf = T5Config(
        vocab_size=99, d_model=32, d_kv=8, d_ff=64, num_layers=2,
        num_decoder_layers=2, num_heads=4, relative_attention_num_buckets=8,
        relative_attention_max_distance=20, dropout_rate=0.0,
        tie_word_embeddings=True, decoder_start_token_id=0, pad_token_id=0,
        eos_token_id=1,
    )
    ours = ReportDecoderConfig(
        vocab_size=99, d_model=32, d_kv=8, d_ff=64, num_layers=2,
        num_decoder_layers=2, num_heads=4, relative_attention_num_buckets=8,
        relative_attention_max_distance=20, dropout=0.0,
    )
    return hf, ours


class TorchFusionOracle(torch.nn.Module):
    """Same structure + state_dict key names as reference FusionTransformerModel
    (training_pipeline.py:516-618); T5 from local config (no hub)."""

    def __init__(self, hf_t5_cfg, d_img=48, d_txt=24, d_fuse_hidden=40,
                 n_disease=13, n_cond=4):
        super().__init__()
        from transformers import T5ForConditionalGeneration

        self.n_cond = n_cond
        self.h_dec = hf_t5_cfg.d_model
        self.fusion_mlp = torch.nn.Sequential(
            torch.nn.Linear(d_img + d_txt, d_fuse_hidden),
            torch.nn.GELU(),
            torch.nn.Dropout(0.1),
            torch.nn.LayerNorm(d_fuse_hidden),
        )
        self.disease_head = torch.nn.Linear(d_fuse_hidden, n_disease)
        self.cond_proj = torch.nn.Sequential(
            torch.nn.Linear(d_fuse_hidden, self.h_dec * n_cond),
            torch.nn.GELU(),
        )
        self.report_model = T5ForConditionalGeneration(hf_t5_cfg)

    def forward(self, z_img, z_txt, report_labels=None):
        from transformers.modeling_outputs import BaseModelOutput

        z = torch.cat([z_img, z_txt], dim=-1)
        z_fuse = self.fusion_mlp(z)
        disease_logits = self.disease_head(z_fuse)
        gen = None
        if report_labels is not None:
            cond = self.cond_proj(z_fuse).view(z.shape[0], self.n_cond, self.h_dec)
            gen = self.report_model(
                encoder_outputs=BaseModelOutput(last_hidden_state=cond),
                labels=report_labels,
                return_dict=True,
            )
        return {"z_fuse": z_fuse, "disease_logits": disease_logits, "gen": gen}


@pytest.fixture(scope="module")
def pair():
    torch.manual_seed(3)
    hf_t5, our_t5 = _t5_cfgs()
    oracle = TorchFusionOracle(hf_t5).eval()
    fusion_cfg = FusionConfig(d_img=48, d_txt=24, d_fuse_hidden=40, n_disease=13,
                              n_cond_tokens=4)
    variables = import_fusion(oracle.state_dict(), num_layers=2)
    model = FusionModel(config=fusion_cfg, report_config=our_t5)
    return oracle, model, variables, fusion_cfg


def test_fusion_forward_and_loss_parity(pair, rng):
    oracle, model, variables, cfg = pair
    B, L = 3, 16
    z_img = rng.standard_normal((B, cfg.d_img)).astype(np.float32)
    z_txt = rng.standard_normal((B, cfg.d_txt)).astype(np.float32)
    labels = rng.integers(1, 99, size=(B, L)).astype(np.int64)
    labels[2, 10:] = -100
    y = (rng.random((B, 13)) > 0.5).astype(np.float32)

    with torch.no_grad():
        ref = oracle(torch.from_numpy(z_img), torch.from_numpy(z_txt),
                     torch.from_numpy(labels))
        ref_bce = torch.nn.BCEWithLogitsLoss()(ref["disease_logits"], torch.from_numpy(y))

    out = model.apply(variables, z_img, z_txt, report_labels=labels.astype(np.int32))
    np.testing.assert_allclose(
        np.asarray(out["disease_logits"]), ref["disease_logits"].numpy(),
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out["report_logits"]), ref["gen"].logits.numpy(), rtol=2e-4, atol=1e-4
    )
    np.testing.assert_allclose(float(bce_with_logits(out["disease_logits"], y)),
                               float(ref_bce), rtol=1e-5)
    total, parts = fusion_loss(out["disease_logits"], y, out["report_logits"],
                               labels.astype(np.int32))
    np.testing.assert_allclose(float(total), float(ref_bce) + float(ref["gen"].loss),
                               rtol=1e-4)


def test_classification_only_path(pair, rng):
    """No labels -> no decoder work (reference forward with report_labels=None)."""
    _, model, variables, cfg = pair
    z_img = rng.standard_normal((2, cfg.d_img)).astype(np.float32)
    z_txt = rng.standard_normal((2, cfg.d_txt)).astype(np.float32)
    out = model.apply(variables, z_img, z_txt)
    assert "report_logits" not in out
    assert out["disease_logits"].shape == (2, 13)
