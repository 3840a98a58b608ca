"""topk_small / topk_chunked vs lax.top_k — values, indices, and tie order."""
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from mmdx_tpu.decode.beam_search import topk_chunked, topk_small


def _cases(seed=0, trials=20):
    rng = np.random.default_rng(seed)
    for trial in range(trials):
        n, v, k = 5, int(rng.integers(40, 4000)), int(rng.choice([4, 8]))
        x = rng.standard_normal((n, v)).astype(np.float32)
        for _ in range(8):  # inject ties
            i = rng.integers(n)
            a, b = rng.integers(v, size=2)
            x[i, a] = x[i, b]
        x[0, : min(30, v // 2)] = -np.inf
        yield trial, jnp.asarray(x), k, rng


def test_topk_small_matches_lax():
    for trial, x, k, _ in _cases(0):
        rv, ri = lax.top_k(x, k)
        v_, i_ = topk_small(x, k)
        np.testing.assert_allclose(np.asarray(v_), np.asarray(rv)), trial
        assert np.array_equal(np.asarray(i_), np.asarray(ri)), trial


def test_topk_chunked_matches_lax():
    for trial, x, k, rng in _cases(1):
        chunk = int(rng.choice([32, 128, 256, 1024]))
        rv, ri = lax.top_k(x, k)
        v_, i_ = topk_chunked(x, k, chunk=chunk)
        np.testing.assert_allclose(np.asarray(v_), np.asarray(rv)), trial
        assert np.array_equal(np.asarray(i_), np.asarray(ri)), (trial, chunk)


def test_beam_gather_rows_exact_for_large_ids():
    """Token ids >= 257 must survive the one-hot f32 contraction exactly.

    TPU's DEFAULT matmul precision computes f32 dots in bf16, which rounds
    257->256 and 32127->32128 (out of vocab); beam_gather_rows carries
    Precision.HIGHEST to keep every int < 2**24 exact. Runs on any backend;
    the regression it guards was TPU-only (advisor repro, round 2).
    """
    from mmdx_tpu.decode.beam_search import beam_gather_rows

    rng = np.random.default_rng(7)
    ids = rng.integers(0, 32128, size=(3, 4, 181)).astype(np.int32)
    # plant the known-bad values
    ids[0, 0, :4] = [257, 12345, 32127, 2**23 - 1]
    src = rng.integers(0, 4, size=(3, 4)).astype(np.int32)
    out = np.asarray(beam_gather_rows(jnp.asarray(ids), jnp.asarray(src)))
    ref = np.take_along_axis(ids, src[:, :, None], axis=1)
    assert np.array_equal(out, ref)


@pytest.mark.parametrize("ldtype", [jnp.float32, jnp.bfloat16])
def test_chunked_logits_candidate_topk_matches_flat(ldtype):
    """Producer-chunked [N, C, 128] logits (config.chunked_step_logits) must
    select the same candidates with the same scores as the flat [N, V] path
    — incl. ngram bans, min-length eos masking, ties, and -inf rows. Runs in
    f32 and bf16 (config.step_logits_bf16): both paths see the SAME logits
    dtype, so selection must agree exactly."""
    from mmdx_tpu.decode.beam_search import fused_candidate_topk

    rng = np.random.default_rng(11)
    b, nb, v = 3, 4, 512  # 128-aligned vocab -> 4 chunks
    n = b * nb
    for trial in range(6):
        x = rng.standard_normal((n, v)).astype(np.float32)
        for _ in range(12):  # ties across chunk boundaries
            i = rng.integers(n)
            a_, b_ = rng.integers(v, size=2)
            x[i, a_] = x[i, b_]
        x[1, :100] = -np.inf
        scores = rng.standard_normal((b, nb)).astype(np.float32)
        banned = rng.random((n, v)) < 0.1
        xj = jnp.asarray(x, ldtype)
        for mask_eos in (False, True):
            kw = dict(banned=jnp.asarray(banned),
                      mask_eos=jnp.asarray(mask_eos), eos_token_id=1,
                      k=2 * nb, b=b, nb=nb)
            fv, fi = fused_candidate_topk(xj, jnp.asarray(scores), **kw)
            cv, ci = fused_candidate_topk(
                xj.reshape(n, v // 128, 128), jnp.asarray(scores), **kw)
            assert np.array_equal(np.asarray(fi), np.asarray(ci)), \
                (trial, mask_eos)
            np.testing.assert_allclose(np.asarray(cv), np.asarray(fv),
                                       rtol=2e-6, atol=2e-6)
