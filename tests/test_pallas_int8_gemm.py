"""Fused int8 GEMM + requant kernels vs the dense reference math (interpret).

ops/pallas_int8_gemm is retained as a measured negative result (module
docstring) — these tests keep it correct: each epilogue variant must be
bitwise the XLA-formulation chain it fuses (same s32 products, same f32
elementwise order, divide-by-scale requant).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from mmdx_tpu.ops.pallas_int8_gemm import (
    int8_gemm_dual_requant,
    int8_gemm_requant,
    int8_gemm_res_requant,
)


def _requant(y, s):
    return jnp.clip(jnp.round(y / s), -127, 127).astype(jnp.int8)


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    m, k, n = 64, 32, 48
    x = jnp.asarray(rng.integers(-127, 128, (m, k)), jnp.int8)
    w = jnp.asarray(rng.integers(-127, 128, (k, n)), jnp.int8)
    alpha = jnp.asarray(rng.uniform(1e-4, 1e-2, n), jnp.float32)
    bias = jnp.asarray(rng.standard_normal(n), jnp.float32)
    res = jnp.asarray(rng.integers(-127, 128, (m, n)), jnp.int8)
    x2 = jnp.asarray(rng.integers(-127, 128, (m, 2 * k)), jnp.int8)
    w2 = jnp.asarray(rng.integers(-127, 128, (2 * k, n)), jnp.int8)
    alpha2 = jnp.asarray(rng.uniform(1e-4, 1e-2, n), jnp.float32)
    bias2 = jnp.asarray(rng.standard_normal(n), jnp.float32)
    return x, w, alpha, bias, res, x2, w2, alpha2, bias2


def _dot32(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    ).astype(jnp.float32)


def test_plain(data):
    x, w, alpha, bias, *_ = data
    s = jnp.float32(0.37)
    ref = _requant(jax.nn.relu(_dot32(x, w) * alpha + bias), s)
    with pltpu.force_tpu_interpret_mode():
        got = int8_gemm_requant(x, w, alpha, bias, s)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_plain_no_relu(data):
    x, w, alpha, bias, *_ = data
    s = jnp.float32(0.21)
    ref = _requant(_dot32(x, w) * alpha + bias, s)
    with pltpu.force_tpu_interpret_mode():
        got = int8_gemm_requant(x, w, alpha, bias, s, relu=False)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_residual(data):
    x, w, alpha, bias, res, *_ = data
    s, rs = jnp.float32(0.44), jnp.float32(0.011)
    ref = _requant(
        jax.nn.relu(_dot32(x, w) * alpha + bias + res.astype(jnp.float32) * rs),
        s,
    )
    with pltpu.force_tpu_interpret_mode():
        got = int8_gemm_res_requant(x, w, alpha, bias, res, rs, s)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_dual(data):
    x, w, alpha, bias, _, x2, w2, alpha2, bias2 = data
    s = jnp.float32(0.52)
    ref = _requant(
        jax.nn.relu(
            (_dot32(x, w) * alpha + bias) + (_dot32(x2, w2) * alpha2 + bias2)
        ),
        s,
    )
    with pltpu.force_tpu_interpret_mode():
        got = int8_gemm_dual_requant(x, w, alpha, bias, x2, w2, alpha2, bias2, s)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))
