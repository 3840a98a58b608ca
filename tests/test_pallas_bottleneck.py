"""Pallas fused bottleneck kernel vs the XLA op-by-op path (interpret mode)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from mmdx_tpu.config import ImageEncoderConfig
from mmdx_tpu.models.resnet import ImageEncoder
from mmdx_tpu.ops.pallas_bottleneck import fold_bn, fused_bottleneck


def _ref_block(x, w1, b1, w2, b2, w3, b3, wp=None, bp=None):
    x1 = jax.nn.relu(jnp.einsum("bhwc,cm->bhwm", x, w1) + b1)
    x2 = jax.lax.conv_general_dilated(
        x1, w2, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    x2 = jax.nn.relu(x2 + b2)
    y = jnp.einsum("bhwm,mc->bhwc", x2, w3) + b3
    sc = x if wp is None else jnp.einsum("bhwc,cd->bhwd", x, wp) + bp
    return jax.nn.relu(y + sc)


@pytest.mark.parametrize("proj", [False, True])
def test_kernel_matches_xla(proj):
    rng = np.random.default_rng(0)
    B, H, W, Cin, M = 2, 10, 10, 32, 16
    Cout = Cin
    x = jnp.asarray(rng.standard_normal((B, H, W, Cin)), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((Cin, M)) * 0.1, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal(M) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((3, 3, M, M)) * 0.1, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal(M) * 0.1, jnp.float32)
    w3 = jnp.asarray(rng.standard_normal((M, Cout)) * 0.1, jnp.float32)
    b3 = jnp.asarray(rng.standard_normal(Cout) * 0.1, jnp.float32)
    wp = bp = None
    if proj:
        wp = jnp.asarray(rng.standard_normal((Cin, Cout)) * 0.1, jnp.float32)
        bp = jnp.asarray(rng.standard_normal(Cout) * 0.1, jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        out = fused_bottleneck(x, w1, b1, w2, b2, w3, b3, wp, bp)
    ref = _ref_block(x, w1, b1, w2, b2, w3, b3, wp, bp)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_fold_bn():
    rng = np.random.default_rng(1)
    k = jnp.asarray(rng.standard_normal((3, 3, 4, 8)), jnp.float32)
    scale = jnp.asarray(rng.standard_normal(8) * 0.5 + 1.0, jnp.float32)
    bias = jnp.asarray(rng.standard_normal(8), jnp.float32)
    mean = jnp.asarray(rng.standard_normal(8), jnp.float32)
    var = jnp.asarray(rng.random(8) + 0.5, jnp.float32)
    eps = 1e-5
    x = jnp.asarray(rng.standard_normal((2, 6, 6, 4)), jnp.float32)
    conv = lambda x, k: jax.lax.conv_general_dilated(
        x, k, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    ref = (conv(x, k) - mean) * scale * jax.lax.rsqrt(var + eps) + bias
    kf, bf = fold_bn(k, scale, bias, mean, var, eps)
    np.testing.assert_allclose(
        np.asarray(conv(x, kf) + bf), np.asarray(ref), atol=1e-4)


def test_image_tower_fused_matches_unfused():
    """Full ImageEncoder: fused stages 1-2 vs the plain XLA path on the SAME
    variables (tiny input keeps interpret mode fast; BN stats are random so
    the fold is exercised for real)."""
    cfg = ImageEncoderConfig(img_size=32, use_warmup_classifier=False)
    enc = ImageEncoder(config=cfg)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 3)), jnp.float32)
    variables = enc.init(jax.random.PRNGKey(0), x, train=False)
    # randomize batch stats so BN folding is non-trivial
    variables = jax.tree.map(
        lambda a: a + jnp.asarray(
            np.abs(rng.standard_normal(a.shape)) * 0.1, a.dtype),
        variables)
    ref = enc.apply(variables, x, train=False)["embeddings"]

    cfg_f = dataclasses.replace(cfg, use_fused_bottleneck=True)
    enc_f = ImageEncoder(config=cfg_f)
    with pltpu.force_tpu_interpret_mode():
        out = enc_f.apply(variables, x, train=False)["embeddings"]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
