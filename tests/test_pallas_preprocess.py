"""Pallas fused preprocessing kernel vs the XLA einsum path (interpret mode on CPU)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.mark.parametrize("channels", [1, 3])
def test_pallas_preproc_matches_xla(rng, channels):
    from jax.experimental.pallas import tpu as pltpu

    from mmdx_tpu.ops.pallas_preprocess import preprocess_batch_pallas
    from mmdx_tpu.ops.preprocess import preprocess_batch_device

    batch = rng.integers(0, 256, (2, 256, 256, channels), dtype=np.uint8)
    want = np.asarray(preprocess_batch_device(batch, img_size=128, resize_size=144))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(
            preprocess_batch_pallas(batch, img_size=128, resize_size=144)
        )
    assert got.shape == (2, 128, 128, 3)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
