"""Int8 "turbo" image tower: numerics, accuracy guardrail, persistence.

The quantized backbone replaces the serving-path torchvision ResNet-50 of the
reference (backend/ml/pipelines/training_pipeline.py:157-311) — these tests
bound its deviation from the exact bf16/f32 tower, which IS the parity story
for an opt-in lossy mode.
"""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmdx_tpu.checkpoints.bundle import load_bundle, new_random_bundle, save_bundle
from mmdx_tpu.models.resnet import ImageEncoder
from mmdx_tpu.models.resnet_int8 import (
    calibrate_backbone,
    calibration_sites,
    folded_backbone,
    folded_forward,
    int8_backbone_apply,
    quantize_backbone,
)
from mmdx_tpu.runtime.engine import InferenceEngine


@pytest.fixture(scope="module")
def bundle():
    return new_random_bundle(seed=0, small=True)


@pytest.fixture(scope="module")
def images():
    rng = np.random.default_rng(3)
    # smooth-ish blobs, not white noise: closer to radiograph statistics
    base = rng.standard_normal((4, 8, 8, 3))
    x = jax.image.resize(jnp.asarray(base), (4, 64, 64, 3), "cubic")
    return jnp.asarray(x, jnp.float32)


def test_folded_forward_matches_flax_backbone(bundle, images):
    v = bundle.variables
    enc = ImageEncoder(config=bundle.config.image, dtype=jnp.float32)
    oracle = enc.apply(
        {
            "params": v["params"]["image_encoder"],
            "batch_stats": v["batch_stats"]["image_encoder"],
        },
        images, method=ImageEncoder.backbone_features,
    )
    folded, _ = folded_forward(
        folded_backbone(
            v["params"]["image_encoder"]["backbone"],
            v["batch_stats"]["image_encoder"]["backbone"],
        ),
        images,
    )
    np.testing.assert_allclose(
        np.asarray(folded), np.asarray(oracle), atol=2e-4, rtol=1e-3
    )


def test_calibration_covers_all_sites(bundle, images):
    scales = calibrate_backbone(bundle.variables, images)
    assert sorted(scales) == sorted(calibration_sites())
    assert all(v > 0 for v in scales.values())


def test_int8_features_close_to_f32(bundle, images):
    v = bundle.variables
    scales = calibrate_backbone(bundle.variables, images)
    q = quantize_backbone(v, scales)
    ref, _ = folded_forward(
        folded_backbone(
            v["params"]["image_encoder"]["backbone"],
            v["batch_stats"]["image_encoder"]["backbone"],
        ),
        images,
    )
    got = int8_backbone_apply(q, images)
    denom = float(jnp.max(jnp.abs(ref)))
    rel = float(jnp.max(jnp.abs(got - ref))) / denom
    # random-weight nets amplify quantization noise vs trained ones; 10% rel
    # on pooled features still bounds the head-level delta tightly (see the
    # probs guardrail below, the user-facing contract)
    assert rel < 0.10, rel


@pytest.mark.parametrize(
    "k,ci,co,pad", [(7, 3, 64, 3), (3, 16, 32, 1)]
)
def test_s2d_stride2_conv_bit_exact(k, ci, co, pad):
    """The space-to-depth form must reproduce the direct stride-2 int8 conv
    EXACTLY (same s32 sums, rearranged) — 7x7 stem and 3x3 stage-boundary
    cases."""
    import jax.lax as lax

    from mmdx_tpu.models.resnet_int8 import (
        _S2D_PAD, _s2d_weights, _space_to_depth2,
    )

    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.integers(-127, 128, (k, k, ci, co)), jnp.int8)
    x = jnp.asarray(rng.integers(-127, 128, (2, 32, 32, ci)), jnp.int8)
    dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    direct = lax.conv_general_dilated(
        x, w, (2, 2), [(pad, pad), (pad, pad)], dimension_numbers=dn,
        preferred_element_type=jnp.int32,
    )
    xs = _space_to_depth2(x)
    w2 = _s2d_weights(w)
    dn2 = lax.conv_dimension_numbers(xs.shape, w2.shape, ("NHWC", "HWIO", "NHWC"))
    s2d = lax.conv_general_dilated(
        xs, w2, (1, 1), _S2D_PAD[k], dimension_numbers=dn2,
        preferred_element_type=jnp.int32,
    )
    assert np.array_equal(np.asarray(direct), np.asarray(s2d))


def test_s2d_conv2_path_exact_end_to_end(bundle, images, monkeypatch):
    """MMDX_INT8_S2D_CONV2=1 must not change the quantized tower's output
    AT ALL (the rewrite is exact in int32; epilogues see identical s32)."""
    v = bundle.variables
    scales = calibrate_backbone(v, images)
    q = quantize_backbone(v, scales)
    assert "w_s2d" in q["layer2_block0"]["conv2"]
    assert "w_s2d" not in q["layer1_block0"]["conv2"]
    base = int8_backbone_apply(q, images)
    monkeypatch.setenv("MMDX_INT8_S2D_CONV2", "1")
    got = jax.jit(int8_backbone_apply)(q, images)
    assert np.array_equal(np.asarray(base), np.asarray(got))


def test_percentile_calibration(bundle, images):
    """Percentile scales are <= amax scales, cover all sites, and the
    quantized tower stays within the feature guardrail; with a synthetic
    outlier burned into one input pixel, percentile calibration beats amax
    on the bulk of the distribution (the whole point of clipping)."""
    v = bundle.variables
    amax = calibrate_backbone(v, images)
    p999 = calibrate_backbone(v, images, percentile=99.5)
    assert sorted(p999) == sorted(calibration_sites())
    assert all(p999[k] <= amax[k] * (1 + 1e-6) for k in amax)
    assert any(p999[k] < amax[k] * 0.999 for k in amax)

    # one absurd outlier pixel stretches the amax input grid ~8x; percentile
    # calibration of the INPUT site ignores it, so every NON-outlier sample
    # quantizes on a finer grid and lands closer to the f32 oracle
    spiked = images.at[0, 0, 0, 0].set(50.0)
    amax_s = calibrate_backbone(v, spiked)
    p_s = calibrate_backbone(v, spiked, percentile=99.5)
    assert amax_s["input"] >= 49.0
    assert p_s["input"] < amax_s["input"] * 0.25

    ref, _ = folded_forward(
        folded_backbone(
            v["params"]["image_encoder"]["backbone"],
            v["batch_stats"]["image_encoder"]["backbone"],
        ),
        spiked,
    )
    err_amax = jnp.abs(
        int8_backbone_apply(quantize_backbone(v, amax_s), spiked)[1:] - ref[1:]
    ).mean()
    err_pct = jnp.abs(
        int8_backbone_apply(quantize_backbone(v, p_s), spiked)[1:] - ref[1:]
    ).mean()
    assert float(err_pct) < float(err_amax), (err_pct, err_amax)


def test_gray_stem_fold_f32_exact():
    """The grayscale stem fold (pre-summed weights + positional K map) must
    equal the 3-channel normalize+broadcast stem conv in f32 EXACTLY up to
    sum reordering — including the zero-padded borders, where K carries the
    valid-tap correction."""
    import jax.lax as lax

    from mmdx_tpu.config import IMAGENET_MEAN, IMAGENET_STD
    from mmdx_tpu.models.resnet_int8 import GRAY_CENTER, _gray_stem

    rng = np.random.default_rng(7)
    w = jnp.asarray(rng.standard_normal((7, 7, 3, 16)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((16,)), jnp.float32)
    u = jnp.asarray(rng.random((2, 64, 64, 1)), jnp.float32)

    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(IMAGENET_STD, jnp.float32)
    x3 = (jnp.broadcast_to(u, u.shape[:-1] + (3,)) - mean) / std
    dn = lax.conv_dimension_numbers(x3.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    ref = lax.conv_general_dilated(
        x3, w, (2, 2), [(3, 3), (3, 3)], dimension_numbers=dn
    ) + b

    wg, k_map = _gray_stem(w, b, IMAGENET_MEAN, IMAGENET_STD, img_size=64)
    v = u - GRAY_CENTER
    dng = lax.conv_dimension_numbers(v.shape, wg.shape, ("NHWC", "HWIO", "NHWC"))
    got = lax.conv_general_dilated(
        v, wg, (2, 2), [(3, 3), (3, 3)], dimension_numbers=dng
    ) + k_map
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-5)
    # K is constant in the interior, positional at the borders
    km = np.asarray(k_map)[0]
    assert np.allclose(km[4:-4, 4:-4], km[16, 16], atol=1e-5)
    assert not np.allclose(km[0, 0], km[16, 16], atol=1e-3)


def test_gray_path_close_to_f32(bundle, images):
    """End-to-end int8 tower over the 1-channel centered-gray input lands
    within the same guardrail as the 3-channel path."""
    v = bundle.variables
    from mmdx_tpu.config import IMAGENET_MEAN, IMAGENET_STD
    from mmdx_tpu.models.resnet_int8 import GRAY_CENTER

    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(IMAGENET_STD, jnp.float32)
    u = jnp.clip(images[..., :1] * 0.2 + 0.5, 0.0, 1.0)  # gray in [0,1]
    x3 = (jnp.broadcast_to(u, u.shape[:-1] + (3,)) - mean) / std

    scales = calibrate_backbone(v, x3)
    q = quantize_backbone(v, scales, img_size=u.shape[1])
    assert "stem_gray" in q and q["stem_gray"]["w"].shape[2] == 1

    ref, _ = folded_forward(
        folded_backbone(
            v["params"]["image_encoder"]["backbone"],
            v["batch_stats"]["image_encoder"]["backbone"],
        ),
        x3,
    )
    got = int8_backbone_apply(q, u - GRAY_CENTER)
    rel = float(jnp.max(jnp.abs(got - ref))) / float(jnp.max(jnp.abs(ref)))
    assert rel < 0.10, rel
    # and the 3-channel int8 path agrees with the gray int8 path closely
    # (both approximate the same f32 math; they differ only in which grid
    # quantizes the input)
    got3 = int8_backbone_apply(q, x3)
    rel_g3 = float(jnp.max(jnp.abs(got - got3))) / float(
        jnp.max(jnp.abs(ref)))
    assert rel_g3 < 0.10, rel_g3


def test_gray_preproc_matches_exact_preproc():
    """preprocess_batch_device_gray + (v+0.5 -> normalize/broadcast) equals
    preprocess_exact on grayscale uint8 images, to the same ~1-uint8-ULP
    bound as the 3-channel device path (the device fast path skips PIL's
    intermediate u8 rounding; serving regains bit-exactness because wire
    images arrive pre-resized and the device resize is then an identity —
    see test_preprocess.py)."""
    from mmdx_tpu.config import IMAGENET_MEAN, IMAGENET_STD
    from mmdx_tpu.models.resnet_int8 import GRAY_CENTER
    from mmdx_tpu.ops.preprocess import (
        preprocess_batch_device_gray, preprocess_exact,
    )

    rng = np.random.default_rng(11)
    imgs = rng.integers(0, 256, (2, 96, 80, 1), dtype=np.uint8)
    v = np.asarray(preprocess_batch_device_gray(
        jnp.asarray(imgs), img_size=48, resize_size=56,
        out_dtype=jnp.float32,
    ))
    mean = np.asarray(IMAGENET_MEAN, np.float32)
    std = np.asarray(IMAGENET_STD, np.float32)
    got = (np.repeat(v + GRAY_CENTER, 3, axis=-1) - mean) / std
    ref = np.stack([
        preprocess_exact(im, img_size=48, resize_size=56) for im in imgs
    ])
    assert np.max(np.abs(got - ref)) < 2.5 / 255.0 / 0.225
    assert np.mean(np.abs(got - ref)) < 0.5 / 255.0 / 0.225


def test_quantize_requires_all_sites(bundle, images):
    scales = calibrate_backbone(bundle.variables, images)
    scales.pop("stem")
    with pytest.raises(ValueError, match="calibration sites"):
        quantize_backbone(bundle.variables, scales)


def _sample_images(n=2):
    root = Path(__file__).resolve().parents[1] / (
        "mmdx_tpu/serve/sample_data/sample_images"
    )
    return [p.read_bytes() for p in sorted(root.glob("*.jpg"))[:n]]


def test_turbo_engine_probs_guardrail(bundle):
    """The accuracy contract: turbo probabilities stay within quantization
    tolerance of fast-mode probabilities on the packaged sample assets."""
    imgs = _sample_images()
    texts = ["62 year old male, cough", "45 year old female, chest pain"]
    fast = InferenceEngine(bundle, mode="fast")
    turbo = InferenceEngine(bundle, mode="turbo")
    pf, _, _ = fast.classify_batch(imgs, texts)
    pt, _, _ = turbo.classify_batch(imgs, texts)
    assert float(np.abs(pf - pt).max()) < 0.05
    # decision-level agreement at the serving thresholds, wherever the fast
    # prediction isn't sitting on the knife's edge (random weights put some
    # probs within noise of 0.5; any lossy mode flips those)
    th = np.asarray(bundle.thresholds, np.float32)
    confident = np.abs(pf - th) > 0.02
    assert np.array_equal((pf >= th)[confident], (pt >= th)[confident])
    assert confident.mean() > 0.5  # the check isn't vacuous


def test_turbo_uses_bundle_scales_when_present(bundle, images, tmp_path):
    """Persisted metadata scales short-circuit first-batch calibration."""
    import copy

    scales = calibrate_backbone(bundle.variables, images)
    b2 = copy.copy(bundle)
    b2.metadata = {"int8_scales": scales}
    path = tmp_path / "b.mmdx"
    save_bundle(b2, path, timestamped_copy=False)
    loaded = load_bundle(path)
    assert loaded.metadata["int8_scales"].keys() == scales.keys()
    eng = InferenceEngine(loaded, mode="turbo")
    qp = eng._ensure_qparams(None)  # no batch needed: scales are persisted
    assert qp["stem"]["w"].dtype == jnp.int8
    got = eng._ensure_qparams(None)
    assert got is qp  # built once
