"""Golden parity: flax ResNet-50 image tower vs torch oracle on identical weights."""
import numpy as np
import pytest
import torch

from mmdx_tpu.checkpoints.torch_import import import_image_encoder
from mmdx_tpu.config import ImageEncoderConfig
from mmdx_tpu.models.resnet import ImageEncoder
from tests.torch_oracles.resnet_torch import TorchImageEncoder, randomize_bn_stats


@pytest.fixture(scope="module")
def pair():
    torch.manual_seed(0)
    oracle = TorchImageEncoder()
    randomize_bn_stats(oracle)
    oracle.eval()
    variables = import_image_encoder(oracle.state_dict())
    model = ImageEncoder(config=ImageEncoderConfig())
    return oracle, model, variables


def test_eval_forward_parity(pair, rng):
    oracle, model, variables = pair
    x = rng.standard_normal((2, 96, 96, 3)).astype(np.float32)
    with torch.no_grad():
        ref = oracle(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    out = model.apply(variables, x, train=False)
    np.testing.assert_allclose(
        np.asarray(out["embeddings"]), ref["embeddings"].numpy(), rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(out["logits"]), ref["logits"].numpy(), rtol=2e-4, atol=2e-4
    )


def test_folded_bn_matches_torch(pair, rng):
    """The BN-folded inference path (config.use_folded_bn) keeps torch parity
    with the SAME variables (param tree unchanged)."""
    import dataclasses

    oracle, _, variables = pair
    cfg = dataclasses.replace(ImageEncoderConfig(), use_folded_bn=True)
    folded = ImageEncoder(config=cfg)
    x = rng.standard_normal((2, 96, 96, 3)).astype(np.float32)
    with torch.no_grad():
        ref = oracle(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    out = folded.apply(variables, x, train=False)
    np.testing.assert_allclose(
        np.asarray(out["embeddings"]), ref["embeddings"].numpy(), rtol=5e-4, atol=5e-4
    )


def test_param_count(pair):
    _, _, variables = pair
    import jax

    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables["params"]))
    # resnet50 (25.557M) - fc (2049*1000) + proj (2048*1024+1024) + cls (1024*13+13)
    torch_n = sum(p.numel() for p in TorchImageEncoder().parameters())
    assert n == torch_n


def test_train_mode_batch_stats_update(pair, rng):
    """train=True must use batch statistics and report updated running stats."""
    _, model, variables = pair
    import jax.numpy as jnp

    x = rng.standard_normal((2, 96, 96, 3)).astype(np.float32)
    out, mutated = model.apply(
        variables, x, train=True, mutable=["batch_stats"]
    )
    old = variables["batch_stats"]["backbone"]["bn_stem"]["mean"]
    new = mutated["batch_stats"]["backbone"]["bn_stem"]["mean"]
    assert not np.allclose(np.asarray(old), np.asarray(new))
    assert jnp.all(jnp.isfinite(out["embeddings"]))
