"""C++ resize core (native/resize_u8.cc): bit-exact vs PIL and the Python
fixed-point replica (ops/resize.resize_u8_exact) — the serving handler's
stage-1 resize must stay reference-exact through every implementation."""
import numpy as np
import pytest

from PIL import Image

from mmdx_tpu import native
from mmdx_tpu.ops.resize import resize_u8_exact, shorter_side_target

pytestmark = pytest.mark.skipif(
    native.load() is None, reason="native lib unavailable")


@pytest.mark.parametrize("shape,out", [
    ((512, 512), (256, 256)),
    ((512, 512, 3), (256, 256)),
    ((300, 487), (256, 416)),      # non-integral ratio, both axes
    ((487, 300, 3), (416, 256)),
    ((100, 700), (256, 1792)),     # upscale one axis
    ((256, 256), (256, 256)),      # identity
    ((40, 30, 3), (17, 13)),       # heavy downscale, wide taps
])
def test_native_matches_pil_and_replica(shape, out):
    rng = np.random.default_rng(hash(shape) % 2**31)
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    oh, ow = out

    got = native.resize_u8(img, oh, ow)
    assert got is not None and got.shape[:2] == (oh, ow)
    np.testing.assert_array_equal(got, resize_u8_exact(img, oh, ow))

    pil = Image.fromarray(img).resize((ow, oh), Image.BILINEAR)
    np.testing.assert_array_equal(
        got.reshape(oh, ow, -1).squeeze(), np.asarray(pil, dtype=np.uint8))


def test_wire_image_uses_exact_semantics():
    """wire_image_u8 output is invariant to which backend performed the
    resize (native vs PIL) — the serving wire format stays reference-exact."""
    from mmdx_tpu.io.images import wire_image_u8

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (480, 640), dtype=np.uint8)
    wired = wire_image_u8(img, 256, square=True)
    nh, nw = shorter_side_target(480, 640, 256)
    ref = resize_u8_exact(img, nh, nw)
    top = int(round((nh - 256) / 2.0))
    left = int(round((nw - 256) / 2.0))
    np.testing.assert_array_equal(wired, ref[top:top + 256, left:left + 256])
