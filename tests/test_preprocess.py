"""Preprocessing parity: our native resize/crop/normalize vs PIL + torch-transform
semantics (the reference's image_transfom_into_tensor, training_pipeline.py:112-119)."""
import numpy as np
import pytest
from PIL import Image

from mmdx_tpu.ops import resize as R
from mmdx_tpu.ops.preprocess import preprocess_batch_device, preprocess_exact


def _pil_reference_transform(pil_img, resize_size=256, crop=224):
    """PIL/torchvision-equivalent oracle implemented straight on PIL ops."""
    w, h = pil_img.size
    new_h, new_w = R.shorter_side_target(h, w, resize_size)
    if (new_h, new_w) != (h, w):
        pil_img = pil_img.resize((new_w, new_h), Image.BILINEAR)
    top, left = R.center_crop_bounds(new_h, new_w, crop)
    pil_img = pil_img.crop((left, top, left + crop, top + crop))
    x = np.asarray(pil_img, dtype=np.float32) / 255.0
    if x.ndim == 2:
        x = np.repeat(x[:, :, None], 3, axis=-1)
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    return (x - mean) / std


@pytest.mark.parametrize("shape", [(512, 512), (333, 497), (640, 480), (256, 256), (300, 256)])
@pytest.mark.parametrize("channels", [1, 3])
def test_resize_exact_matches_pil(rng, shape, channels):
    h, w = shape
    arr = rng.integers(0, 256, size=(h, w, channels) if channels == 3 else (h, w), dtype=np.uint8)
    pil = Image.fromarray(arr, mode="RGB" if channels == 3 else "L")
    new_h, new_w = R.shorter_side_target(h, w, 256)
    ours = R.resize_u8_exact(arr, new_h, new_w)
    theirs = np.asarray(pil.resize((new_w, new_h), Image.BILINEAR))
    np.testing.assert_array_equal(ours, theirs)


@pytest.mark.parametrize("channels", [1, 3])
def test_preprocess_exact_random(rng, channels):
    arr = rng.integers(0, 256, size=(345, 517, 3) if channels == 3 else (345, 517), dtype=np.uint8)
    pil = Image.fromarray(arr, mode="RGB" if channels == 3 else "L")
    ours = preprocess_exact(arr)
    oracle = _pil_reference_transform(pil)
    np.testing.assert_array_equal(ours, oracle)
    assert ours.shape == (224, 224, 3)
    assert ours.dtype == np.float32


def test_preprocess_exact_sample_images(sample_image_paths):
    for p in sample_image_paths:
        pil = Image.open(p)
        arr = np.asarray(pil, dtype=np.uint8)
        ours = preprocess_exact(arr)
        oracle = _pil_reference_transform(pil)
        np.testing.assert_array_equal(ours, oracle)


def test_preprocess_device_close_to_exact(sample_image_paths):
    """Fast on-device path within float tolerance of the exact path."""
    imgs = []
    for p in sample_image_paths:
        arr = np.asarray(Image.open(p), dtype=np.uint8)
        if arr.ndim == 2:
            arr = arr[:, :, None]
        imgs.append(arr)
    batch = np.stack(imgs)  # sample images are all 512x512
    out = np.asarray(preprocess_batch_device(batch))
    exact = np.stack([preprocess_exact(i) for i in imgs])
    # fast path skips PIL's intermediate uint8 rounding; error bounded by ~1/255 / std
    assert np.max(np.abs(out - exact)) < 2.5 / 255.0 / 0.225
    # and matches to <1 uint8 ULP on average
    assert np.mean(np.abs(out - exact)) < 0.5 / 255.0 / 0.225


def test_wire_image_stage1_is_preprocessing_exact(rng):
    """Serving's host-side wire resize (io.images.wire_image_u8) must be
    bit-exactly the first stage of the reference transform: running the full
    exact preprocess on the wire image equals running it on the raw decode.
    Guards the (w, h) PIL argument order and the shorter-side convention for
    gray/color, downscale/upscale, and non-square inputs."""
    from mmdx_tpu.io.images import wire_image_u8
    from mmdx_tpu.ops.preprocess import preprocess_exact

    cases = [
        (300, 200, 1),   # portrait gray, downscale
        (513, 400, 3),   # color, downscale
        (120, 180, 1),   # small gray, upscale
        (256, 341, 3),   # shorter side already 256 (wire is identity)
    ]
    for h, w, c in cases:
        raw = rng.integers(0, 256, (h, w) if c == 1 else (h, w, c),
                           dtype=np.uint8)
        wired = wire_image_u8(raw, 256)
        a = preprocess_exact(raw, 224, 256)
        b = preprocess_exact(wired, 224, 256)
        np.testing.assert_array_equal(a, b, err_msg=f"case {(h, w, c)}")


def test_wire_image_square_is_preprocessing_exact(rng):
    """square=True pins the wire shape to (rs, rs) for any aspect ratio;
    center crops compose (round((H-256)/2) + 16 == round((H-224)/2)), so the
    full exact preprocess on the square wire image stays bit-identical."""
    from mmdx_tpu.io.images import wire_image_u8
    from mmdx_tpu.ops.preprocess import preprocess_exact

    for h, w, c in [(300, 431, 1), (513, 257, 3), (119, 640, 1),
                    (257, 256, 3)]:
        raw = rng.integers(0, 256, (h, w) if c == 1 else (h, w, c),
                           dtype=np.uint8)
        wired = wire_image_u8(raw, 256, square=True)
        assert wired.shape[:2] == (256, 256), (h, w, wired.shape)
        a = preprocess_exact(raw, 224, 256)
        b = preprocess_exact(wired, 224, 256)
        np.testing.assert_array_equal(a, b, err_msg=f"case {(h, w, c)}")
