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


@functools.partial(jax.jit, static_argnames=("vocab_size", "ngram_size"))
def banned_ngram_mask(
    seqs: jnp.ndarray,  # [N, Lmax]
    cur_len: jnp.ndarray,
    vocab_size: int,
    ngram_size: int = 3,
):
    """Bool banned mask [N, V] (True = banned), or None when Lmax < n.

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
    # v = hi*256 + lo; then banned[n, hi, lo] = sum_w match * [f_hi = hi] *
    # [f_lo = lo] is ONE [N,W,Hi] x [N,W,256] batched matmul on the MXU.
    hi_size = -(-v // 256)
    f_hi = followers // 256
    f_lo = followers % 256
    m16 = match.astype(jnp.bfloat16)
    a = (f_hi[..., None] == jnp.arange(hi_size)).astype(jnp.bfloat16) * m16[..., None]
    b = (f_lo[..., None] == jnp.arange(256)).astype(jnp.bfloat16)
    # bf16 output halves the [N, Hi, 256] HBM write+read (the MXU still
    # accumulates in f32); counts are bounded by W < 256, so every value is
    # exactly representable and the > 0.5 threshold is unchanged
    banned = jnp.einsum("nwh,nwl->nhl", a, b,
                        preferred_element_type=jnp.bfloat16)  # [N, Hi, 256]
    return banned.reshape(n, hi_size * 256)[:, :v] > 0.5
