"""Greedy decoding as a fixed-shape ``lax.while_loop`` (HF ``greedy_search``
semantics with min-length and no-repeat-ngram processors). The cheap serving
mode when beam quality isn't needed."""
from __future__ import annotations

import functools
import os
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp

from mmdx_tpu.decode.ngram import (
    ban_repeated_ngrams,
    banned_follower_ids,
    banned_ngram_mask,
)

# Read ONCE at import (jit caches are keyed only on static args — a trace-time
# env read would silently ignore in-process toggles). See beam_search._NGRAM_SEG.
_NGRAM_SEG = os.environ.get("MMDX_NGRAM_SEG", "1") != "0"
# Sparse ngram ban in the chunked path (banned follower ids + dense fallback
# via lax.cond on overflow — exact either way). Measured NET LOSS on v5e-1
# (greedy fixed-180 same-process A/B: B=512 930.4 vs 1093.5, B=64 466.8 vs
# 562.5 reports/s): the [N, C, 128, cap] membership compare materializes and
# the cond blocks the selection fusion, costing far more than the one-hot
# ban matmul it replaces. Default OFF; MMDX_SPARSE_NGRAM=1 opts in
# (extraction + parity tests retained in tests/test_ngram.py).
_SPARSE_NGRAM = os.environ.get("MMDX_SPARSE_NGRAM", "") == "1"


class GreedyState(NamedTuple):
    cur_len: jnp.ndarray
    seqs: jnp.ndarray  # [B, Lmax]
    cache: Any
    finished: jnp.ndarray  # [B] bool


@functools.partial(
    jax.jit,
    static_argnames=(
        "step_fn", "batch", "vocab_size", "max_new_tokens", "min_new_tokens",
        "no_repeat_ngram_size", "eos_token_id", "pad_token_id",
        "decoder_start_token_id", "segment_caps",
    ),
)
def greedy_decode(
    step_fn: Callable,
    init_cache: Any,
    *,
    batch: int,
    vocab_size: int,
    max_new_tokens: int = 180,
    min_new_tokens: int = 150,
    no_repeat_ngram_size: int = 3,
    eos_token_id: int = 1,
    pad_token_id: int = 0,
    decoder_start_token_id: int = 0,
    segment_caps: tuple[int, ...] | None = None,
):
    """Returns sequences [B, 1+max_new_tokens] (start + tokens, pad-filled)."""
    b, v = batch, vocab_size
    lmax = 1 + max_new_tokens
    min_len = 1 + min_new_tokens

    seqs = jnp.full((b, lmax), pad_token_id, jnp.int32).at[:, 0].set(decoder_start_token_id)
    state = GreedyState(jnp.asarray(1, jnp.int32), seqs, init_cache,
                        jnp.zeros((b,), jnp.bool_))

    def cond(s):
        return (s.cur_len < lmax) & ~jnp.all(s.finished)

    def body(s, seg_len: int = 0):
        from mmdx_tpu.ops.pallas_lm_head import (
            CHUNK, LazyLogits, lm_head_greedy,
        )

        # seg_len (static): the running segment's cache cap — cur_len never
        # exceeds it inside the stage, so the ngram window scan only needs
        # the first seg_len history columns (exact; see beam_search.body).
        seg_len = min(seg_len, lmax) if seg_len else lmax
        hist = s.seqs if seg_len == lmax else s.seqs[:, :seg_len]
        cur = s.cur_len
        last = jnp.take_along_axis(s.seqs, (cur - 1)[None, None].repeat(b, 0), axis=1)
        logits, cache = step_fn(last, cur - 1, s.cache)
        if isinstance(logits, LazyLogits) and v % CHUNK == 0 and v >= 2 * CHUNK:
            # streaming selection: the [B, V] logits never touch HBM —
            # lm_head matmul + masked chunk max/argmax in one Pallas pass
            # (argmax(log_softmax(x)) == argmax(x), so no logsumexp needed;
            # tie order identical to the dense argmax, tests/test_lm_head.py)
            mask = jnp.broadcast_to(
                (cur < min_len) & (jnp.arange(v) == eos_token_id)[None, :],
                (b, v),
            )
            if no_repeat_ngram_size:
                nb = banned_ngram_mask(hist, cur, v, no_repeat_ngram_size)
                if nb is not None:  # None when Lmax < ngram size
                    mask = mask | nb
            cmax, carg = lm_head_greedy(logits.hidden, logits.emb, mask)
            best = jnp.argmax(cmax, axis=-1).astype(jnp.int32)  # [B]
            tok = best * CHUNK + jnp.take_along_axis(
                carg, best[:, None], axis=1)[:, 0]
        elif getattr(logits, "ndim", 2) == 3:
            # producer-chunked [N, C, 128] logits (config.chunked_step_logits):
            # masked chunk max/argmax — argmax(log_softmax(x)) == argmax(x),
            # ties resolve earliest-chunk then earliest-in-chunk == the dense
            # earliest-index order. No [N, V] f32 tensor (the dense chain's
            # eos/ban where-rewrites cost ~200 us/step at B=512, and its
            # relayout copies another ~106 — round-5 trace).
            n_, c, ch = logits.shape
            tok3 = (jnp.arange(c)[:, None] * ch
                    + jnp.arange(ch)[None, :])  # [C, CH] token ids
            minlen3 = jnp.broadcast_to(
                (cur < min_len) & (tok3 == eos_token_id)[None], logits.shape)
            neg = jnp.asarray(-jnp.inf, logits.dtype)

            def _pick(mask3):
                masked = jnp.where(mask3, neg, logits)
                cmax = jnp.max(masked, axis=-1)  # [N, C]
                carg = jnp.argmax(masked, axis=-1).astype(jnp.int32)
                bestc = jnp.argmax(cmax, axis=-1).astype(jnp.int32)  # [N]
                return bestc * ch + jnp.take_along_axis(
                    carg, bestc[:, None], axis=1)[:, 0]

            sparse = (banned_follower_ids(hist, cur,
                                          ngram_size=no_repeat_ngram_size)
                      if no_repeat_ngram_size and _SPARSE_NGRAM else None)
            if sparse is not None:
                # sparse ban: mask only the (few) banned follower ids; the
                # dense one-hot-matmul mask compiles as the lax.cond
                # fallback and runs only on overflow (exactness preserved)
                ids, overflow = sparse

                def dense_fn(_):
                    nb3 = banned_ngram_mask(hist, cur, v,
                                            no_repeat_ngram_size,
                                            chunked=True)
                    return _pick(minlen3 | nb3)

                def sparse_fn(_):
                    ban3 = jnp.any(
                        tok3[None, :, :, None] == ids[:, None, None, :],
                        axis=-1)  # ids pad with -1: never matches a token
                    return _pick(minlen3 | ban3)

                tok = jax.lax.cond(overflow, dense_fn, sparse_fn, 0)
            elif no_repeat_ngram_size:
                nb3 = banned_ngram_mask(hist, cur, v, no_repeat_ngram_size,
                                        chunked=True)
                tok = _pick(minlen3 | nb3 if nb3 is not None else minlen3)
            else:
                tok = _pick(minlen3)
        else:
            if isinstance(logits, LazyLogits):
                logits = logits.materialize()
            logprobs = logits.astype(jnp.float32)
            logprobs = jnp.where(
                (cur < min_len) & (jnp.arange(v) == eos_token_id)[None, :],
                -jnp.inf, logprobs,
            )
            if no_repeat_ngram_size:
                logprobs = ban_repeated_ngrams(logprobs, hist, cur,
                                               no_repeat_ngram_size)
            tok = jnp.argmax(logprobs, axis=-1).astype(jnp.int32)
        tok = jnp.where(s.finished, pad_token_id, tok)
        # vectorized iota==cur select: a dynamic_update_slice on the LANE dim
        # lowers near-serially on TPU (~10 us at serving shapes, round-3 trace)
        seqs2 = jnp.where(jnp.arange(lmax, dtype=jnp.int32)[None] == cur,
                          tok[:, None], s.seqs)
        finished = s.finished | (tok == eos_token_id)
        return GreedyState(cur + 1, seqs2, cache, finished)

    # segmented decode with growing KV buffers — see beam_search for the
    # rationale; output-invariant because the causal bias row masks
    # not-yet-written keys. Two cache layouts:
    #   heads  {k, v} [N, heads, cap, d_kv]  (decode_step; rows on axis 2)
    #   flat   {kv [N, cap, 2*h*d](, kvs [N, 2h, cap])}  (decode_step_beam at
    #          nb=1 — the engine's int8-KV greedy path; rows on axis 1, the
    #          dequant-scale leaf carries them on its LAST axis). Flat caps
    #          align to the sublane tile (8 bf16 / 32 int8) like beam_search:
    #          a misaligned K drops the Pallas cache read ~3x; padded rows
    #          sit past Lmax and the causal bias kills them.
    flat = isinstance(init_cache[0], dict) and "kv" in init_cache[0]
    if flat:
        sub = 32 if any(
            x.dtype == jnp.int8 for x in jax.tree.leaves(init_cache)
        ) else 8

        def _align(c: int) -> int:
            return c + (-c) % sub

        final = _align(lmax)
        caps = tuple(sorted({_align(c) for c in (segment_caps or ())
                             if 0 < c < lmax and _align(c) < final})) + (final,)

        def _resize(cache, rows):
            def per_leaf(path, x):
                axis = x.ndim - 1 if getattr(
                    path[-1], "key", None) == "kvs" else 1
                if x.shape[axis] >= rows:
                    return jax.lax.slice_in_dim(x, 0, rows, axis=axis)
                pad = [(0, 0)] * x.ndim
                pad[axis] = (0, rows - x.shape[axis])
                return jnp.pad(x, pad)

            return jax.tree_util.tree_map_with_path(per_leaf, cache)

        state = state._replace(cache=_resize(state.cache, caps[0]))
    else:
        caps = tuple(sorted({c for c in (segment_caps or ())
                             if 0 < c < lmax})) + (lmax,)
        if len(caps) > 1:
            state = state._replace(cache=jax.tree.map(
                lambda x: x[:, :, : caps[0], :], state.cache))

    s = state
    for idx, cap in enumerate(caps):
        if cap < lmax:
            limit = jnp.asarray(cap + 1, jnp.int32)

            def cond_cap(st, _limit=limit):
                return cond(st) & (st.cur_len < _limit)
        else:
            cond_cap = cond
        # cur_len <= cap inside this stage (cond_cap), so the ngram ban can
        # scan only the first cap history columns (MMDX_NGRAM_SEG=0 at
        # process start reverts for A/B)
        seg_len = min(cap, lmax) if _NGRAM_SEG else lmax
        s = jax.lax.while_loop(
            cond_cap, functools.partial(body, seg_len=seg_len), s)
        if cap < lmax:
            if flat:
                s = s._replace(cache=_resize(s.cache, caps[idx + 1]))
            else:
                grow = caps[idx + 1] - cap
                s = s._replace(cache=jax.tree.map(
                    lambda x, g=grow: jnp.pad(
                        x, ((0, 0), (0, 0), (0, g), (0, 0))),
                    s.cache))
    return s.seqs
