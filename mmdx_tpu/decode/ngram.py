"""No-repeat-ngram logits masking, fixed-shape (jit/while_loop friendly).

Replicates HF ``NoRepeatNGramLogitsProcessor`` (used by the reference via
``no_repeat_ngram_size=3``, reference inference_pipeline.py:190): a token v is
banned at the current step if the n-gram formed by the last (n-1) generated
tokens followed by v already occurs in the sequence so far.

The HF implementation builds python dicts per step (host control flow); here the
scan over candidate windows is a vectorized compare + scatter, so it lives
inside the compiled decode loop.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

NEG_INF = jnp.float32(-jnp.inf)


@functools.partial(jax.jit, static_argnames=("cap", "ngram_size"))
def banned_follower_ids(
    seqs: jnp.ndarray,  # [N, Lmax]
    cur_len: jnp.ndarray,
    cap: int = 8,
    ngram_size: int = 3,
):
    """SPARSE form of the ngram ban: the (few) banned follower token ids.

    In practice almost no window matches the current (n-1)-suffix — the ban
    usually forbids 0-2 tokens — yet the dense mask pays a [N, W, V/128] x
    [N, W, 128] one-hot matmul plus a [N, V] (or [N, V/128, 128]) mask
    materialization every step. Here the matched windows' followers are
    extracted by a ``cap``-pass tournament over the tiny [N, W] match map:

      ids [N, cap] int32   banned follower ids, -1 padding
      overflow  bool       True iff ANY row matched more than cap windows

    Exactness contract: when ``overflow`` is False, masking tokens in
    ``ids`` is EXACTLY the dense ban. Callers must fall back to the dense
    mask when overflow is True (lax.cond — the fallback compiles once and
    essentially never runs: >cap distinct matches of one suffix within a
    <=180-token report is pathological).
    """
    n = seqs.shape[0]
    lmax = seqs.shape[1]
    k = ngram_size - 1
    if lmax < ngram_size:
        return None

    suffix_idx = cur_len - k + jnp.arange(k)
    suffix = jnp.take_along_axis(
        seqs, jnp.broadcast_to(suffix_idx[None], (n, k)), axis=1)
    w = lmax - ngram_size + 1
    win_idx = jnp.arange(w)[:, None] + jnp.arange(k)[None, :]
    windows = seqs[:, win_idx]  # [N, W, k]
    followers = seqs[:, jnp.arange(w) + k]  # [N, W]
    in_range = (jnp.arange(w) + k) < cur_len
    match = jnp.all(windows == suffix[:, None, :], axis=-1) & in_range[None]

    overflow = jnp.any(jnp.sum(match, axis=-1) > cap)
    # cap-pass tournament over [N, W]: pick cap matched window positions
    # (order irrelevant — the consumer only tests membership)
    score = jnp.where(match, jnp.arange(w, dtype=jnp.int32)[None, :] + 1, 0)
    ids = []
    for _ in range(cap):
        best = jnp.argmax(score, axis=-1)  # [N] earliest-max window
        val = jnp.take_along_axis(score, best[:, None], axis=1)  # [N, 1]
        tok = jnp.take_along_axis(followers, best[:, None], axis=1)
        ids.append(jnp.where(val > 0, tok, -1))
        score = jnp.where(jnp.arange(w)[None, :] == best[:, None], 0, score)
    return jnp.concatenate(ids, axis=1), overflow  # [N, cap], scalar


@functools.partial(jax.jit, static_argnames=("ngram_size",))
def ban_repeated_ngrams(
    logprobs: jnp.ndarray,  # [N, V]
    seqs: jnp.ndarray,  # [N, Lmax] token history (positions >= cur_len are junk)
    cur_len: jnp.ndarray,  # scalar int32: tokens generated so far (incl. start)
    ngram_size: int = 3,
) -> jnp.ndarray:
    """Return logprobs with banned tokens set to -inf."""
    banned = banned_ngram_mask(seqs, cur_len, logprobs.shape[1], ngram_size)
    if banned is None:
        return logprobs
    return jnp.where(banned, NEG_INF, logprobs)


@functools.partial(jax.jit,
                   static_argnames=("vocab_size", "ngram_size", "chunked"))
def banned_ngram_mask(
    seqs: jnp.ndarray,  # [N, Lmax]
    cur_len: jnp.ndarray,
    vocab_size: int,
    ngram_size: int = 3,
    chunked: bool = False,
):
    """Bool banned mask [N, V] (True = banned), or None when Lmax < n.

    ``chunked=True`` (valid when 128 divides V) returns the mask in its
    NATIVE [N, V/128, 128] tile shape instead of flattening — the chunked
    logits consumers (beam's _chunked_candidate_topk, greedy's chunked
    argmax) read it in exactly that layout, so the [N,V] round trip never
    exists.

    Split out of ``ban_repeated_ngrams`` so the beam hot loop can consume the
    mask inside a FUSED candidate-selection read instead of materializing a
    second [N, V] f32 logprobs tensor (the bool mask is 1/4 the bytes and the
    ``where`` rides the tournament reduce)."""
    n, v = seqs.shape[0], vocab_size
    lmax = seqs.shape[1]
    k = ngram_size - 1
    if lmax < ngram_size:
        return None

    # last (n-1)-token suffix of each sequence, gathered at dynamic cur_len
    suffix_idx = cur_len - k + jnp.arange(k)  # [k]
    suffix = jnp.take_along_axis(seqs, jnp.broadcast_to(suffix_idx[None], (n, k)), axis=1)

    # all (n-1)-windows and the token that followed each
    w = lmax - ngram_size + 1
    win_idx = jnp.arange(w)[:, None] + jnp.arange(k)[None, :]  # [W, k]
    windows = seqs[:, win_idx]  # [N, W, k]
    followers = seqs[:, jnp.arange(w) + k]  # [N, W]

    # a window is a live match if it equals the suffix and lies fully in history
    # (HF bans ngrams whose follower position < cur_len)
    in_range = (jnp.arange(w) + k) < cur_len  # [W]
    match = jnp.all(windows == suffix[:, None, :], axis=-1) & in_range[None]  # [N, W]

    # dense banned mask WITHOUT a vocab scatter: XLA lowers the batched
    # .at[f].max scatter to sort + a serial mask build (~0.6 ms/step at
    # serving shapes, per the round-2 device trace). Decompose token ids as
    # v = hi*lo_size + lo; then banned[n, hi, lo] = sum_w match * [f_hi = hi]
    # * [f_lo = lo] is ONE [N,W,Hi] x [N,W,Lo] batched matmul on the MXU.
    #
    # lo_size = 128 when it divides V: the consumer (fused_candidate_topk)
    # reduces the masked logits in [N, V/128, 128] chunk layout, and a
    # banned mask born [N, 126, 256] forced XLA to relayout both the mask
    # and a full f32 [N, V] masked-logits intermediate every step
    # (~85 us/step of transposed copies in the round-3 beam trace). With
    # matching [N, 251, 128] tiles the where+chunk-max fuses into the
    # einsum output directly. 256 kept otherwise (W < 256 exactness bound).
    lo_size = 128 if v % 128 == 0 else 256
    hi_size = -(-v // lo_size)
    f_hi = followers // lo_size
    f_lo = followers % lo_size
    m16 = match.astype(jnp.bfloat16)
    a = (f_hi[..., None] == jnp.arange(hi_size)).astype(jnp.bfloat16) * m16[..., None]
    b = (f_lo[..., None] == jnp.arange(lo_size)).astype(jnp.bfloat16)
    # bf16 output halves the [N, Hi, Lo] HBM write+read (the MXU still
    # accumulates in f32); counts are bounded by W < 256, so every value is
    # exactly representable and the > 0.5 threshold is unchanged
    banned = jnp.einsum("nwh,nwl->nhl", a, b,
                        preferred_element_type=jnp.bfloat16)  # [N, Hi, Lo]
    if chunked:
        assert lo_size == 128 and hi_size * lo_size == v, (
            "chunked mask requires 128 | V")
        return banned > 0.5  # [N, V/128, 128] — the consumers' native tiles
    return banned.reshape(n, hi_size * lo_size)[:, :v] > 0.5
