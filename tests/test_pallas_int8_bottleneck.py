"""Fused int8 stride-1 bottleneck kernel (ops/pallas_int8_bottleneck).

The kernel must reproduce the unfused XLA int8 block (conv1/conv2/conv3 +
identity residual, folded requant epilogues) — the GEMMs are int32-exact
and the epilogues use the same folded K/B formula, so agreement is at the
1-requant-LSB level. The integrated test swaps the fused path into
int8_backbone_apply via MMDX_INT8_FUSED_BLOCKS and re-runs the tower
guardrail vs the f32 oracle.
"""

import jax
import jax.lax as lax
import jax.numpy as jnp
import numpy as np
import pytest

from mmdx_tpu.ops.pallas_int8_bottleneck import (
    fold_block_epilogues,
    fused_bottleneck_int8,
    pad_wp,
    unpad_wp,
)


def _ref_block(x_i8, args, height, width):
    """Unfused XLA reference of the same folded math (zero-pad SAME conv)."""
    b = x_i8.shape[0]
    c = x_i8.shape[-1]
    m = args["w1"].shape[-1]
    x = x_i8.reshape(b, height, width, c)

    def req(y):
        return jnp.clip(jnp.round(y), -127, 127).astype(jnp.int8)

    a1 = lax.dot_general(
        x.reshape(-1, c), args["w1"], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    a1 = req(jnp.maximum(a1 * args["k1"] + args["b1"], 0.0))
    a1 = a1.reshape(b, height, width, m)

    w2 = args["w2flat"].reshape(3, 3, m, m)
    dn = lax.conv_dimension_numbers(a1.shape, w2.shape, ("NHWC", "HWIO", "NHWC"))
    a2 = lax.conv_general_dilated(
        a1, w2, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn,
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    a2 = req(jnp.maximum(a2 * args["k2"] + args["b2"], 0.0))

    y = lax.dot_general(
        a2.reshape(-1, m), args["w3"], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    y = (y * args["k3"] + args["b3"]
         + x.reshape(-1, c).astype(jnp.float32) * args["kx"])
    return req(jnp.maximum(y, 0.0)).reshape(b, height, width, c)


def _rand_args(rng, c, m):
    def i8(*s):
        return jnp.asarray(rng.integers(-127, 128, s), jnp.int8)

    return dict(
        w1=i8(c, m), k1=jnp.asarray(rng.random(m) * 0.01 + 1e-3, jnp.float32),
        b1=jnp.asarray(rng.standard_normal(m) * 2, jnp.float32),
        w2flat=i8(9 * m, m),
        k2=jnp.asarray(rng.random(m) * 0.002 + 1e-4, jnp.float32),
        b2=jnp.asarray(rng.standard_normal(m) * 2, jnp.float32),
        w3=i8(m, c), k3=jnp.asarray(rng.random(c) * 0.01 + 1e-3, jnp.float32),
        b3=jnp.asarray(rng.standard_normal(c) * 2, jnp.float32),
        kx=np.float32(0.7),
    )


@pytest.mark.parametrize("b,h,w,c,m,g", [
    (2, 6, 5, 128, 64, 1),    # wp > w, odd width, single image per program
    (4, 4, 4, 128, 64, 2),    # two images per program (gap-zero handling)
])
def test_kernel_matches_xla_reference(b, h, w, c, m, g):
    rng = np.random.default_rng(0)
    wp = 32
    x = rng.integers(-127, 128, (b, h, w, c)).astype(np.int8)
    args = _rand_args(rng, c, m)

    xp = pad_wp(jnp.asarray(x), wp)
    out_p = fused_bottleneck_int8(
        xp, **args, height=h, width=w, wp=wp, g=g, interpret=True)
    got = np.asarray(unpad_wp(out_p, h, w, wp))
    ref = np.asarray(_ref_block(jnp.asarray(x), args, h, w))
    # int32 GEMM sums are exact; the f32 epilogues use the identical folded
    # formula -> any deviation is a requant tie at the round() boundary
    diff = np.abs(got.astype(np.int32) - ref.astype(np.int32))
    assert diff.max() <= 1, (diff.max(), (diff > 0).mean())
    assert (diff > 0).mean() < 0.01

    # junk columns of the padded output are zero (they are the next block's
    # horizontal zero-padding — load-bearing, not cosmetic)
    op = np.asarray(out_p).reshape(b, h, wp, c)
    assert np.all(op[:, :, w:, :] == 0)


def test_integrated_tower_guardrail(monkeypatch):
    """MMDX_INT8_FUSED_BLOCKS=1,2 keeps the tower inside the same guardrail
    as the unfused int8 path, and close to it."""
    from mmdx_tpu.checkpoints.bundle import new_random_bundle
    from mmdx_tpu.models.resnet_int8 import (
        calibrate_backbone, folded_backbone, folded_forward,
        int8_backbone_apply, quantize_backbone,
    )

    bundle = new_random_bundle(seed=0, small=True)
    v = bundle.variables
    rng = np.random.default_rng(3)
    base = rng.standard_normal((4, 8, 8, 3))
    images = jnp.asarray(
        jax.image.resize(jnp.asarray(base), (4, 64, 64, 3), "cubic"),
        jnp.float32)

    scales = calibrate_backbone(v, images)
    q = quantize_backbone(v, scales)
    ref, _ = folded_forward(
        folded_backbone(
            v["params"]["image_encoder"]["backbone"],
            v["batch_stats"]["image_encoder"]["backbone"],
        ),
        images,
    )
    base_int8 = int8_backbone_apply(q, images)
    monkeypatch.setenv("MMDX_INT8_FUSED_BLOCKS", "1,2")
    fused = jax.jit(int8_backbone_apply)(q, images)

    denom = float(jnp.max(jnp.abs(ref)))
    rel_f32 = float(jnp.max(jnp.abs(fused - ref))) / denom
    assert rel_f32 < 0.10, rel_f32
    rel_base = float(jnp.max(jnp.abs(fused - base_int8))) / denom
    # fused vs unfused differ only by folded-epilogue f32 rounding at
    # requant boundaries (1 LSB per site, slightly amplified through depth)
    assert rel_base < 0.05, rel_base
