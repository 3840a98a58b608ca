"""Golden parity: flax BERT text tower vs HF torch BertModel on identical weights.

HF models are constructed locally from config (random init) — no hub access.
"""
import numpy as np
import pytest
import torch

from mmdx_tpu.checkpoints.torch_import import import_text_encoder
from mmdx_tpu.config import TextEncoderConfig
from mmdx_tpu.models.bert import TextEncoder
from mmdx_tpu.ops.pooling import masked_mean_pool


def _small_cfgs():
    from transformers import BertConfig

    hf = BertConfig(
        vocab_size=311,
        hidden_size=64,
        num_hidden_layers=3,
        num_attention_heads=4,
        intermediate_size=128,
        max_position_embeddings=64,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    ours = TextEncoderConfig(
        vocab_size=311,
        hidden_size=64,
        num_layers=3,
        num_heads=4,
        intermediate_size=128,
        max_position_embeddings=64,
        d_txt=32,
        max_len=24,
    )
    return hf, ours


class _TorchTextEncoder(torch.nn.Module):
    """Oracle mirroring reference TextEncoderTransformer structure + key names
    (encoder.* / proj.* / classifier.*, training_pipeline.py:348-367)."""

    def __init__(self, hf_cfg, d_txt, n_disease=13):
        super().__init__()
        from transformers import BertModel

        self.encoder = BertModel(hf_cfg)
        self.proj = torch.nn.Linear(hf_cfg.hidden_size, d_txt)
        self.classifier = torch.nn.Linear(d_txt, n_disease)

    def forward(self, input_ids, attention_mask, token_type_ids):
        out = self.encoder(
            input_ids=input_ids,
            attention_mask=attention_mask,
            token_type_ids=token_type_ids,
            return_dict=True,
        )
        mask = attention_mask.unsqueeze(-1).type_as(out.last_hidden_state)
        pooled = (out.last_hidden_state * mask).sum(1) / mask.sum(1).clamp(min=1e-6)
        z = self.proj(pooled)
        return {"hidden": out.last_hidden_state, "embeddings": z, "logits": self.classifier(z)}


@pytest.fixture(scope="module")
def pair():
    torch.manual_seed(1)
    hf_cfg, our_cfg = _small_cfgs()
    oracle = _TorchTextEncoder(hf_cfg, d_txt=our_cfg.d_txt).eval()
    variables = import_text_encoder(oracle.state_dict(), num_layers=our_cfg.num_layers)
    model = TextEncoder(config=our_cfg)
    return oracle, model, variables, our_cfg


def test_forward_parity(pair, rng):
    oracle, model, variables, cfg = pair
    B, L = 3, cfg.max_len
    ids = rng.integers(0, cfg.vocab_size, size=(B, L)).astype(np.int32)
    lengths = [L, L - 5, 7]
    mask = np.zeros((B, L), np.int32)
    for i, n in enumerate(lengths):
        mask[i, :n] = 1
    tt = np.zeros((B, L), np.int32)

    with torch.no_grad():
        ref = oracle(
            torch.from_numpy(ids).long(),
            torch.from_numpy(mask).long(),
            torch.from_numpy(tt).long(),
        )
    out = model.apply(variables, ids, mask, tt)
    np.testing.assert_allclose(
        np.asarray(out["embeddings"]), ref["embeddings"].numpy(), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out["logits"]), ref["logits"].numpy(), rtol=1e-4, atol=1e-5
    )


def test_masked_pool_matches_reference_semantics(rng):
    h = rng.standard_normal((2, 5, 4)).astype(np.float32)
    m = np.array([[1, 1, 1, 0, 0], [1, 0, 0, 0, 0]], np.int32)
    got = np.asarray(masked_mean_pool(h, m))
    want = np.stack([h[0, :3].mean(0), h[1, :1].mean(0)])
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_full_size_init_shapes():
    """Full bert-base dims initialize and produce the reference shapes."""
    import jax

    from mmdx_tpu.models.bert import init_text_encoder

    model, variables = init_text_encoder(jax.random.key(0))
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables["params"]))
    # BertModel(bert-base-uncased) = 109,482,240 params (incl. pooler); + proj + classifier
    assert n == 109_482_240 + (768 * 512 + 512) + (512 * 13 + 13)
    assert "pooler" in variables["params"]["bert"]
