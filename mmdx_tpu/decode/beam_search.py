"""Fixed-shape beam search as a single ``lax.while_loop`` — the TPU-native
replacement for HF's host-side python ``generate`` loop (the reference's
dominant serving hot loop: ``num_beams=4``, 150-180 sequential decoder steps,
reference inference_pipeline.py:190, training_pipeline.py:613-618).

Semantics replicate the tensorized beam search of transformers>=4.50
(``GenerationMixin._beam_search`` + helpers), verified token-for-token in
tests/test_decode_parity.py:
  * min-new-tokens eos masking and no-repeat-ngram logprob bans
  * 2*num_beams candidates per step; only the top num_beams may finalize
  * a candidate finalizes when it emits eos OR hits max length (its final
    token included), scored ``sum_logprobs / num_generated**length_penalty``
  * fixed-capacity hypothesis buffer updated by merge-topk (worst replaced)
  * sticky early-stop heuristic on the best *running* beam score
  * ``early_stopping`` True/False/"never"; HF's output fill-value quirk
    (``pad_token_id or eos_token_id``)

The model is abstracted as ``step_fn(tokens [N,1], pos, cache) -> (logits [N,V],
cache)`` over a flat batch N = B * num_beams; the KV cache is an arbitrary
pytree with leading dim N (reordered by beam gather each step).
"""
from __future__ import annotations

import functools
import os
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp

from mmdx_tpu.config import GenerationConfig

# Segment-capped ngram-ban window scans (read ONCE at import: the jit cache is
# keyed only on static args, so a trace-time env read would silently ignore
# in-process toggles; restart the process — or reimport — to A/B).
_NGRAM_SEG = os.environ.get("MMDX_NGRAM_SEG", "1") != "0"
from mmdx_tpu.decode.ngram import banned_ngram_mask

NEG = jnp.float32(-1e9)


class BeamState(NamedTuple):
    cur_len: jnp.ndarray  # scalar int32: tokens in seqs so far (incl. start)
    seqs: jnp.ndarray  # [B, nb, Lmax] running beams
    beam_scores: jnp.ndarray  # [B, nb] running accumulated logprobs
    cache: Any
    anc: jnp.ndarray  # [B, nb, Lmax] ancestry (physical KV slot per position)
    fin_seqs: jnp.ndarray  # [B, nb, Lmax] finished hypotheses
    fin_scores: jnp.ndarray  # [B, nb] length-penalized
    fin_lens: jnp.ndarray  # [B, nb]
    n_fin: jnp.ndarray  # [B]
    heuristic_ok: jnp.ndarray  # [B] sticky improvement-possible flag


def topk_small(x: jnp.ndarray, k: int):
    """Exact top-k for small k via k iterated max-reductions.

    TPU's generic top_k lowering is expensive at beam-search widths
    (num_beams * vocab ~ 128k columns); k max+mask passes are plain VPU
    reductions (the mask is a broadcast-compare ``where``, not a scatter —
    TPU scatters serialize). Tie behavior matches lax.top_k (earliest index
    wins), verified by the HF-parity decode tests.
    """
    n, v = x.shape
    vals = []
    idxs = []
    cur = x
    col = jax.lax.broadcasted_iota(jnp.int32, (n, v), 1)
    for _ in range(k):
        i = jnp.argmax(cur, axis=-1)  # first index on ties
        val = jnp.take_along_axis(cur, i[:, None], axis=1)[:, 0]
        vals.append(val)
        idxs.append(i)
        cur = jnp.where(col == i[:, None].astype(jnp.int32), -jnp.inf, cur)
    return jnp.stack(vals, axis=1), jnp.stack(idxs, axis=1).astype(jnp.int32)


def topk_chunked(x: jnp.ndarray, k: int, chunk: int = 512):
    """Exact top-k over a WIDE last axis via a two-level tournament.

    ``topk_small`` pays k full passes over [N, V]; here V is split into
    chunks, each chunk reduced to its max in ONE pass, the top-k CHUNKS
    (by max) are gathered, and only the gathered k*chunk columns pay the
    k-pass selection.  Exact: any global top-k element lives in a chunk
    whose max is itself >= that element, so the top-k chunks by max cover
    the global top-k.  Tie behavior matches lax.top_k (earliest index
    wins): winning chunks are gathered in ASCENDING chunk order, so
    earlier gathered column == earlier global index.

    chunk=512 divides the nb=4 beam-candidate width (4*32128) exactly, so
    the serving shape skips the pad (a full 33MB copy per step otherwise).
    """
    n, v = x.shape
    pad = -v % chunk
    if (v + pad) // chunk < k:  # not enough chunks to tournament over
        return topk_small(x, k)
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad)), constant_values=-jnp.inf)
    c = (v + pad) // chunk
    xc = x.reshape(n, c, chunk)
    cmax = jnp.max(xc, axis=-1)  # [N, C]
    _, chunk_idx = topk_small(cmax, k)  # [N, k], value-ranked
    chunk_idx = jnp.sort(chunk_idx, axis=-1)  # ascending == global order
    gathered = jnp.take_along_axis(xc, chunk_idx[:, :, None], axis=1)  # [N,k,chunk]
    vals, gi = topk_small(gathered.reshape(n, k * chunk), k)
    src_chunk = jnp.take_along_axis(chunk_idx, gi // chunk, axis=1)
    return vals, src_chunk * chunk + gi % chunk


def _chunk_divisor(v: int, lo: int = 128, hi: int = 1024, target: int = 512):
    """Chunk width for the two-stage candidate top-k, or None (dense path).

    The chunk MUST be lane-aligned (a multiple of 128): the stage-1 reshape
    [N, V] -> [N, V/chunk, chunk] is free metadata only when the new minor
    dim keeps the (8, 128) tiling — chunk=502 (an early choice; 32128 =
    2^7 * 251) made XLA physically retile the f32 [N, V] tensor, ~130 us/step
    of pure copies in the round-3 beam trace. V=32128 -> chunk=128, c=251.
    Among aligned divisors prefer the one nearest ``target``; fall back to
    any divisor in [lo, hi] only if no aligned one exists (then the caller
    eats the relayout, still cheaper than the dense path for huge V)."""
    aligned = [c for c in range(128, hi + 1, 128) if v % c == 0]
    if aligned:
        return min(aligned, key=lambda c: abs(c - target))
    best = None
    for c in range(lo, hi + 1):
        if v % c == 0 and (best is None or abs(c - target) < abs(best - target)):
            best = c
    return best


def fused_candidate_topk(logits, beam_scores, banned, mask_eos, eos_token_id: int,
                         k: int, b: int, nb: int):
    """Top-k of ``log_softmax(logits) + beam_scores`` over each batch row's
    nb*V candidates — WITHOUT materializing any [N, V] float32 tensor.

    The round-2 trace showed the beam step paying ~0.5 ms in the logit->
    logprob->candidate chain: log_softmax writes a full f32 [N, V], the
    ngram/eos masks rewrite it, the beam-score add rewrites it again, and the
    top-k tournament reads it back — ~6 HBM round-trips of 33 MB each at the
    serving shape. Here the chain is restructured so XLA fuses everything
    into three reductions over the bf16 logits (row max, logsumexp, chunk
    max) plus small gathers:

      adjusted[r, t] = ((mask(x[r, t]) - m[r]) - L[r]) + s[r]

    which is BITWISE the reference chain ``log_softmax(x) + s`` with masks
    (same operation order, same f32 ops), so selection and returned scores
    are exactly those of the dense path (asserted in tests/test_topk.py).

    banned: optional bool [N, V] (True = banned -> -inf).
    mask_eos: traced bool scalar — mask the eos column (min-length rule).
    Returns (vals [B, k], flat_idx [B, k]) with flat_idx in the beam-major
    [nb * V] candidate space (same contract as ``topk_chunked``).
    """
    from mmdx_tpu.ops.pallas_lm_head import CHUNK, LazyLogits, lm_head_stats

    if getattr(logits, "ndim", 2) == 3:
        # producer-chunked [N, C, 128] logits (config.chunked_step_logits):
        # the chunk layout is born at the lm-head einsum, so no [N, V]
        # reshape exists for XLA to relayout (a no-op {1,0}->{0,1}->{2,1,0}
        # copy round trip, ~98 us/step at serving shape; round-5 HLO dump)
        return _chunked_candidate_topk(logits, beam_scores, banned, mask_eos,
                                       eos_token_id, k, b, nb)
    n, v = logits.shape
    if isinstance(logits, LazyLogits):
        if v % CHUNK == 0 and v >= 2 * CHUNK:
            # streaming path: the lm_head matmul and ALL stage-1 reductions
            # run in one Pallas pass — logits touch HBM exactly once (the
            # dense chain re-reads the 33 MB f32 tensor ~3x per step). The
            # online logsumexp is mathematically (not bitwise) the dense L,
            # so this path rides the fast/turbo tier only
            # (config.use_fused_lm_head; parity mode keeps the dense chain).
            eos_row = (jnp.arange(v) == eos_token_id)[None, :]
            full_mask = jnp.broadcast_to(mask_eos & eos_row, (n, v))
            if banned is not None:
                full_mask = full_mask | banned
            logits_p, m, L, cmax_p = lm_head_stats(
                logits.hidden, logits.emb, full_mask)
            c = v // CHUNK
            s_row = beam_scores.reshape(n)
            cmax = ((cmax_p - m[:, None]) - L[:, None]) + s_row[:, None]
            _, cidx = topk_small(cmax.reshape(b, nb * c), k)
            cidx = jnp.sort(cidx, axis=-1)
            rows = (jnp.arange(b, dtype=cidx.dtype)[:, None] * nb) + cidx // c
            lin = rows * c + cidx % c
            gl = jnp.take(logits_p.reshape(n * c, CHUNK), lin, axis=0)
            gm = jnp.take(full_mask.reshape(n * c, CHUNK), lin, axis=0)
            adj = jnp.where(gm, -jnp.inf, gl)
            adj = ((adj - jnp.take(m, rows)[..., None])
                   - jnp.take(L, rows)[..., None]) + jnp.take(s_row, rows)[..., None]
            vals, gi = topk_small(adj.reshape(b, k * CHUNK), k)
            sel_chunk = jnp.take_along_axis(cidx, gi // CHUNK, axis=1)
            flat_idx = ((sel_chunk // c) * v + (sel_chunk % c) * CHUNK
                        + gi % CHUNK)
            return vals, flat_idx
        logits = logits.materialize()  # small/unaligned vocab: dense chain
    # m and L over the RAW logits (log_softmax runs before the mask in the
    # reference chain). m via the bf16 max: float cast is monotone and exact,
    # so cast(max(bf16)) == max(cast(bf16)) BITWISE — and with m no longer a
    # consumer of an f32 [N, V] cast, the logsumexp chain is that tensor's
    # only reader and XLA streams it instead of materializing it (the f32
    # copy + its transposed relayout cost ~100 us/step, round-3 trace).
    m = jnp.max(logits, axis=-1).astype(jnp.float32)
    L = jnp.log(jnp.sum(jnp.exp(logits.astype(jnp.float32) - m[:, None]),
                        axis=-1))
    s_row = beam_scores.reshape(n)
    eos_col = (jnp.arange(v) == eos_token_id)[None, :]

    def adjust(x, ban, eos, mm, ll, ss):
        a = jnp.where(mask_eos & eos, -jnp.inf, x.astype(jnp.float32))
        if ban is not None:
            a = jnp.where(ban, -jnp.inf, a)
        return ((a - mm) - ll) + ss

    chunk = _chunk_divisor(v)
    if chunk is None or v // chunk < 2 or n * v <= 1 << 20:
        # small-vocab path (tests, custom configs): materializing is cheap
        adjusted = adjust(logits, banned, eos_col, m[:, None], L[:, None],
                          s_row[:, None])
        return topk_chunked(adjusted.reshape(b, nb * v), k)

    c = v // chunk
    # stage 1: per-chunk max in the LOGITS' OWN dtype, transformed to the
    # adjusted scale afterwards. t_r(x) = ((x - m_r) - L_r) + s_r is
    # monotone in f32 (sub/add preserve <=) and row-constant, so
    # max(t_r(masked)) == t_r(max(masked)) BITWISE: the chunk winner is the
    # same element and t_r applied to it is the same f32 op sequence the
    # dense path runs. Building t_r(x) elementwise instead cost a full f32
    # [N, V] materialization + a 33 MB relayout for the chunk reduce
    # (~145 us/step, round-3 trace); this form reads the bf16 logits once.
    neg = jnp.asarray(-jnp.inf, logits.dtype)
    # mask in [N, C, chunk] layout so the wheres + chunk-max fuse against the
    # ngram mask's native [N, V/128, 128] tiles (see banned_ngram_mask)
    masked_b = jnp.where((mask_eos & eos_col).reshape(1, c, chunk), neg,
                         logits.reshape(n, c, chunk))
    if banned is not None:
        masked_b = jnp.where(banned.reshape(n, c, chunk), neg, masked_b)
    cmax_raw = jnp.max(masked_b, axis=-1)  # [N, C]
    cmax = ((cmax_raw.astype(jnp.float32) - m[:, None]) - L[:, None]) + s_row[:, None]
    # stage 2: top-k chunks per BATCH row (beam-major == global order), then
    # re-derive the adjusted values on just those k*chunk columns
    _, cidx = topk_small(cmax.reshape(b, nb * c), k)  # [B, k] global chunk ids
    cidx = jnp.sort(cidx, axis=-1)  # ascending == earliest-index tie order
    rows = (jnp.arange(b, dtype=cidx.dtype)[:, None] * nb) + cidx // c  # [B,k]
    lin = rows * c + cidx % c
    gl = jnp.take(logits.reshape(n * c, chunk), lin, axis=0)  # [B, k, chunk]
    gb = (jnp.take(banned.reshape(n * c, chunk), lin, axis=0)
          if banned is not None else None)
    tok_of = (cidx % c)[..., None] * chunk + jnp.arange(chunk)[None, None, :]
    adj = adjust(gl, gb, tok_of == eos_token_id,
                 jnp.take(m, rows)[..., None], jnp.take(L, rows)[..., None],
                 jnp.take(s_row, rows)[..., None])
    vals, gi = topk_small(adj.reshape(b, k * chunk), k)
    sel_chunk = jnp.take_along_axis(cidx, gi // chunk, axis=1)
    flat_idx = (sel_chunk // c) * v + (sel_chunk % c) * chunk + gi % chunk
    return vals, flat_idx


def _chunked_candidate_topk(logits3, beam_scores, banned, mask_eos,
                            eos_token_id: int, k: int, b: int, nb: int):
    """``fused_candidate_topk`` for producer-chunked logits [N, C, chunk].

    Same two-stage tournament and the same f32 op sequence per element as
    the rank-2 chunked path; only the logsumexp's reduce SHAPE differs
    ([N,C,chunk] over two axes vs [N,V] over one — ulp-level, fast/turbo
    tier only, parity mode keeps flat logits)."""
    n, c, chunk = logits3.shape
    v = c * chunk
    if banned is not None and banned.ndim == 2:
        banned = banned.reshape(n, c, chunk)
    m = jnp.max(logits3, axis=(1, 2)).astype(jnp.float32)
    L = jnp.log(jnp.sum(jnp.exp(logits3.astype(jnp.float32) - m[:, None, None]),
                        axis=(1, 2)))
    s_row = beam_scores.reshape(n)
    neg = jnp.asarray(-jnp.inf, logits3.dtype)
    eos3 = (jnp.arange(c)[:, None] * chunk
            + jnp.arange(chunk)[None, :]) == eos_token_id  # [C, chunk]
    masked_b = jnp.where(mask_eos & eos3[None], neg, logits3)
    if banned is not None:
        masked_b = jnp.where(banned.reshape(n, c, chunk), neg, masked_b)
    cmax_raw = jnp.max(masked_b, axis=-1)  # [N, C]
    cmax = ((cmax_raw.astype(jnp.float32) - m[:, None]) - L[:, None]) + s_row[:, None]
    _, cidx = topk_small(cmax.reshape(b, nb * c), k)  # [B, k] global chunk ids
    cidx = jnp.sort(cidx, axis=-1)  # ascending == earliest-index tie order
    rows = (jnp.arange(b, dtype=cidx.dtype)[:, None] * nb) + cidx // c  # [B,k]
    lin = rows * c + cidx % c
    gl = jnp.take(logits3.reshape(n * c, chunk), lin, axis=0)  # [B, k, chunk]
    gb = (jnp.take(banned.reshape(n * c, chunk), lin, axis=0)
          if banned is not None else None)
    tok_of = (cidx % c)[..., None] * chunk + jnp.arange(chunk)[None, None, :]
    a = jnp.where(mask_eos & (tok_of == eos_token_id), -jnp.inf,
                  gl.astype(jnp.float32))
    if gb is not None:
        a = jnp.where(gb, -jnp.inf, a)
    adj = ((a - jnp.take(m, rows)[..., None])
           - jnp.take(L, rows)[..., None]) + jnp.take(s_row, rows)[..., None]
    vals, gi = topk_small(adj.reshape(b, k * chunk), k)
    sel_chunk = jnp.take_along_axis(cidx, gi // chunk, axis=1)
    flat_idx = (sel_chunk // c) * v + (sel_chunk % c) * chunk + gi % chunk
    return vals, flat_idx


def beam_gather_rows(x: jnp.ndarray, src: jnp.ndarray) -> jnp.ndarray:
    """x[b, src[b, i], :] as a one-hot batched matmul.

    x: [B, nb, L] int32; src: [B, k] int32 -> [B, k, L].

    ``jnp.take_along_axis`` with a broadcast [B, nb, L] index lowers to an
    elementwise TPU gather that runs near-serially (~0.5 ms per call at
    [64, 4, 181] — the single hottest op of the beam loop, see the round-2
    device trace); the [B,k,nb] x [B,nb,L] one-hot contraction is an MXU
    no-op by comparison.

    Precision=HIGHEST is load-bearing: TPU's DEFAULT matmul precision
    computes f32 dots in bf16, which rounds integer values >= 257
    (257->256, 32127->32128 — out of vocab). With HIGHEST, every integer
    < 2**24 survives the f32 contraction exactly (token ids and ancestry
    slots are far below that).
    """
    nb = x.shape[1]
    onehot = (src[..., None] == jnp.arange(nb, dtype=src.dtype)).astype(jnp.float32)
    out = jnp.einsum("bij,bjl->bil", onehot, x.astype(jnp.float32),
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    return out.astype(x.dtype)


def _insert_hyp(fin_seqs, fin_scores, fin_lens, n_fin, seq, score, length, do_insert):
    """Insert one hypothesis per batch row into the fixed-capacity buffer
    (equivalent to HF's merge-topk: fill a free slot, else replace the worst)."""
    nb = fin_scores.shape[-1]
    worst = jnp.argmin(fin_scores, axis=-1)  # [B]
    full = n_fin >= nb
    better = score > jnp.take_along_axis(fin_scores, worst[:, None], axis=1)[:, 0]
    slot = jnp.where(full, worst, jnp.minimum(n_fin, nb - 1))
    do = do_insert & (~full | better)

    onehot = jax.nn.one_hot(slot, nb, dtype=jnp.bool_) & do[:, None]  # [B, nb]
    fin_scores = jnp.where(onehot, score[:, None], fin_scores)
    fin_lens = jnp.where(onehot, length[:, None], fin_lens)
    fin_seqs = jnp.where(onehot[..., None], seq[:, None, :], fin_seqs)
    n_fin = n_fin + (do & ~full).astype(n_fin.dtype)
    return fin_seqs, fin_scores, fin_lens, n_fin


@functools.partial(
    jax.jit,
    static_argnames=(
        "step_fn", "batch", "num_beams", "vocab_size", "max_new_tokens",
        "min_new_tokens", "no_repeat_ngram_size", "length_penalty",
        "early_stopping", "eos_token_id", "pad_token_id",
        "decoder_start_token_id", "cache_mode", "segment_caps",
    ),
)
def beam_search(
    step_fn: Callable,
    init_cache: Any,
    *,
    batch: int,
    vocab_size: int,
    num_beams: int = 4,
    max_new_tokens: int = 180,
    min_new_tokens: int = 150,
    no_repeat_ngram_size: int = 3,
    length_penalty: float = 1.1,
    early_stopping: bool | str = True,
    eos_token_id: int = 1,
    pad_token_id: int = 0,
    decoder_start_token_id: int = 0,
    cache_mode: str = "gather",
    segment_caps: tuple[int, ...] | None = None,
):
    """Run beam search; returns (sequences [B, 1+max_new_tokens], scores [B]).

    Output rows: start token + generated tokens (eos included if emitted),
    filled with HF's output fill value (``pad_token_id or eos_token_id``).
    ``init_cache`` must have leading dim B*num_beams on every leaf.

    ``cache_mode``:
      * ``"gather"`` — classic: the full KV cache is reordered by a beam
        gather each step (``step_fn(tokens [N,1], pos, cache)``). The gather
        rewrites the whole cache every step and defeats XLA's in-place
        aliasing of the while-loop carry.
      * ``"ancestry"`` — the cache stays physical (never reordered); a tiny
        ``anc [B, nb, Lmax]`` index maps each beam's history position to the
        physical slot that wrote it, and attention resolves the indirection
        (``step_fn(tokens [N,1], pos, cache, anc)``, e.g.
        ``T5.decode_step_beam``). The carried cache is then only touched by
        in-place ``dynamic_update_slice`` — the same access pattern as the
        (15x faster per row) greedy loop.
    """
    assert cache_mode in ("gather", "ancestry"), cache_mode
    b, nb, v = batch, num_beams, vocab_size
    lmax = 1 + max_new_tokens  # max total length incl. decoder start
    min_len = 1 + min_new_tokens
    n = b * nb
    es_true = early_stopping is True
    ancestry = cache_mode == "ancestry"
    fill_value = pad_token_id if pad_token_id else eos_token_id  # HF quirk

    seqs = jnp.full((b, nb, lmax), fill_value, jnp.int32)
    seqs = seqs.at[:, :, 0].set(decoder_start_token_id)
    beam_scores = jnp.zeros((b, nb), jnp.float32).at[:, 1:].set(NEG)

    state = BeamState(
        cur_len=jnp.asarray(1, jnp.int32),
        seqs=seqs,
        beam_scores=beam_scores,
        cache=init_cache,
        anc=jnp.zeros((b, nb, lmax), jnp.int32),
        fin_seqs=jnp.full((b, nb, lmax), fill_value, jnp.int32),
        fin_scores=jnp.full((b, nb), NEG, jnp.float32),
        fin_lens=jnp.ones((b, nb), jnp.int32),
        n_fin=jnp.zeros((b,), jnp.int32),
        heuristic_ok=jnp.ones((b,), jnp.bool_),
    )

    def cond(s: BeamState):
        full = s.n_fin >= nb
        open_beams = ~(jnp.all(full) & es_true)
        return (s.cur_len < lmax) & jnp.any(s.heuristic_ok) & open_beams

    def body(s: BeamState, seg_len: int = 0) -> BeamState:
        # seg_len (static): upper bound on cur_len while this body runs — the
        # segmented driver passes the stage's cache cap so the ngram-ban
        # window scan reads only the first seg_len history columns. Exact:
        # banned_ngram_mask already drops every window whose follower
        # position is >= cur_len, and cur_len <= seg_len inside the stage,
        # so columns beyond seg_len can never contribute. The one-hot
        # einsum operands it materializes scale with the window count
        # (round-4 trace: the ban was 115 us/step at full Lmax), so early
        # stages pay proportionally less. 0 = full history.
        seg_len = min(seg_len, lmax) if seg_len else lmax
        cur = s.cur_len
        batch_full = s.n_fin >= nb  # evaluated before this step's inserts (HF order)
        frozen = (batch_full & es_true) | ~s.heuristic_ok  # no further output effect

        last_tok = jax.lax.dynamic_slice_in_dim(s.seqs, cur - 1, 1, axis=2)
        if ancestry:
            logits, cache = step_fn(last_tok.reshape(n, 1), cur - 1, s.cache, s.anc)
        else:
            logits, cache = step_fn(last_tok.reshape(n, 1), cur - 1, s.cache)

        # fused candidate selection: log_softmax + min-length eos mask +
        # ngram ban + beam-score add + top-2nb, without materializing any
        # [N, V] f32 intermediate (bitwise-identical to the dense chain)
        banned = (
            banned_ngram_mask(
                jax.lax.slice_in_dim(s.seqs, 0, seg_len, axis=2).reshape(n, seg_len),
                cur, v, no_repeat_ngram_size,
                # chunked-logits steps consume the mask in its native
                # [N, V/128, 128] tiles — skip the [N, V] flatten round trip
                chunked=(getattr(logits, "ndim", 2) == 3))
            if no_repeat_ngram_size else None
        )
        top_scores, top_idx = fused_candidate_topk(
            logits, s.beam_scores, banned, cur < min_len, eos_token_id,
            2 * nb, b, nb,
        )  # [B, 2nb]
        src_beam = top_idx // v
        token = top_idx % v
        # a candidate "hits stopping": emits eos, or its sequence reaches max len
        hits = (token == eos_token_id) | jnp.broadcast_to(cur + 1 >= lmax, token.shape)

        # --- continuing beams: top nb non-hit candidates in rank order ---
        rank = jnp.cumsum(~hits, axis=1)
        pick = (rank[:, :, None] == jnp.arange(1, nb + 1)[None, None, :]) & (~hits)[..., None]
        sel = jnp.argmax(pick, axis=1)  # [B, nb]
        new_scores = jnp.take_along_axis(top_scores, sel, axis=1)
        new_tokens = jnp.take_along_axis(token, sel, axis=1)
        new_src = jnp.take_along_axis(src_beam, sel, axis=1)

        # --- finished hypotheses: hit candidates among the top nb ranks ---
        # The whole insert block is dead work while min-length masking keeps
        # eos out of the candidates (steps 1..min_len-1, ~85% of the loop at
        # the reference generation lengths) — lax.cond skips it then. The
        # hit positions (lane-dim writes at dynamic ``cur``) use a fully
        # vectorized iota==cur select: a true dynamic_update_slice on the
        # LANE dim of [B, L] lowers near-serially (~10 us each at serving
        # shapes, round-3 trace).
        pos_lane = jnp.arange(lmax, dtype=jnp.int32)[None, :]  # [1, L]

        def do_inserts(fin):
            pen = cur.astype(jnp.float32) ** length_penalty
            for j in range(nb):
                src_j = src_beam[:, j]
                hyp = beam_gather_rows(s.seqs, src_j[:, None])[:, 0]
                hyp = jnp.where(pos_lane == cur, token[:, j : j + 1], hyp)
                do = hits[:, j] & ~frozen
                fin = _insert_hyp(
                    *fin, hyp, top_scores[:, j] / pen,
                    jnp.broadcast_to(cur + 1, (b,)), do,
                )
            return fin

        fin_seqs, fin_scores, fin_lens, n_fin = jax.lax.cond(
            jnp.any(hits[:, :nb] & ~frozen[:, None]), do_inserts,
            lambda fin: fin, (s.fin_seqs, s.fin_scores, s.fin_lens, s.n_fin),
        )

        # --- advance running beams (freeze batches with no output effect) ---
        new_src_eff = jnp.where(frozen[:, None], jnp.arange(nb)[None, :], new_src)
        gathered = beam_gather_rows(s.seqs, new_src_eff)
        step_tok = jnp.where(frozen[:, None], fill_value, new_tokens)
        seqs2 = jnp.where(pos_lane[None] == cur,
                          step_tok[..., None].astype(jnp.int32), gathered)
        beam_scores2 = jnp.where(frozen[:, None], s.beam_scores, new_scores)

        if ancestry:
            # reorder only the tiny ancestry index; the KV cache stays put.
            # position cur-1's K/V was written this step by physical slot
            # new_src (the slot whose token was consumed).
            anc_g = beam_gather_rows(s.anc, new_src_eff)
            anc2 = jnp.where(pos_lane[None] == cur - 1,
                             new_src_eff[..., None].astype(jnp.int32), anc_g)
            cache2 = cache
        else:
            flat_idx = (jnp.arange(b)[:, None] * nb + new_src_eff).reshape(n)
            cache2 = jax.tree.map(lambda x: jnp.take(x, flat_idx, axis=0), cache)
            anc2 = s.anc

        # --- sticky early-stop heuristic (HF _check_early_stop_heuristic) ---
        if early_stopping == "never" and length_penalty > 0.0:
            hyp_len = jnp.asarray(lmax - 1, jnp.float32)
        else:
            hyp_len = cur.astype(jnp.float32)
        best_running = beam_scores2[:, 0] / hyp_len**length_penalty
        worst_fin = jnp.where(n_fin >= nb, jnp.min(fin_scores, axis=1), NEG)
        heuristic_ok = s.heuristic_ok & ((n_fin < nb) | (best_running > worst_fin))

        return BeamState(cur + 1, seqs2, beam_scores2, cache2, anc2,
                         fin_seqs, fin_scores, fin_lens, n_fin, heuristic_ok)

    # segmented decode: run the loop in stages with GROWING cache buffers
    # (ancestry layout [B, nb*cap, h*d]); early steps attend over a fraction
    # of the full-Lmax cache, cutting the dominant per-step HBM read ~2x on
    # average. Output-invariant: the causal bias row masks every
    # not-yet-written key, so a larger buffer never changes the math
    # (asserted vs the unsegmented run in tests/test_decode_parity.py).
    #
    # Alignment: every segment's flat row count nb*cap is rounded up to a
    # multiple of the cache dtype's sublane tile (8 for bf16/f32, 32 for the
    # int8 cache) — a sublane-misaligned K dim drops the beam-attention
    # cache read from ~940 to ~330 GB/s on v5e (scripts/
    # bench_beam_attn_kernel.py: kk=724 vs 728). The padded rows are
    # positions >= Lmax, masked by the causal bias (see decode_step_beam),
    # so outputs are unchanged.
    #
    # Cache leaves: rows live on axis 1 for the kv buffers; the int8 mode's
    # "kvs" scale leaf ([B, 2h, K], see T5.init_cache) carries them on the
    # LAST axis. _cache_rows maps a resize fn over both.
    def _cache_rows(cache, fn):
        def per_leaf(path, x):
            last = path[-1] if path else None
            axis = x.ndim - 1 if getattr(last, "key", None) == "kvs" else 1
            return fn(x, axis)

        return jax.tree_util.tree_map_with_path(per_leaf, cache)

    sub = 8
    if ancestry and any(
        x.dtype == jnp.int8 for x in jax.tree.leaves(state.cache)
    ):
        sub = 32

    def _align(c: int) -> int:
        while ancestry and (nb * c) % sub:
            c += 1
        return c

    final = _align(lmax)
    caps = tuple(sorted({_align(c) for c in (segment_caps or ())
                         if 0 < c < lmax and _align(c) < final}))
    if caps and not ancestry:
        caps = ()  # segmenting is implemented for the ancestry layout only
    caps = caps + (final,)
    if ancestry:
        rows0 = nb * caps[0]

        def _fit(x, axis):
            if x.shape[axis] >= rows0:
                return jax.lax.slice_in_dim(x, 0, rows0, axis=axis)
            pad = [(0, 0)] * x.ndim
            pad[axis] = (0, rows0 - x.shape[axis])
            return jnp.pad(x, pad)

        state = state._replace(cache=_cache_rows(state.cache, _fit))
    # (no slicing for the gather layout: caps was forced to () above, so the
    # single final segment runs on the full-size cache)

    s = state
    for idx, cap in enumerate(caps):
        if cap < lmax:
            limit = jnp.asarray(cap + 1, jnp.int32)  # step at cur writes pos cur-1

            def cond_cap(st, _limit=limit):
                return cond(st) & (st.cur_len < _limit)
        else:
            cond_cap = cond
        # inside this stage cur_len <= cap (cond_cap), so the ngram ban only
        # ever needs the first cap history columns — pass it statically
        # (MMDX_NGRAM_SEG=0 at process start reverts to full-history scans)
        seg_len = min(cap, lmax) if _NGRAM_SEG else lmax
        s = jax.lax.while_loop(cond_cap, functools.partial(body, seg_len=seg_len), s)
        if cap < lmax:
            grow = nb * (caps[idx + 1] - cap)

            def _grow(x, axis, g=grow):
                pad = [(0, 0)] * x.ndim
                pad[axis] = (0, g)
                return jnp.pad(x, pad)

            s = s._replace(cache=_cache_rows(s.cache, _grow))

    best = jnp.argmax(s.fin_scores, axis=1)  # [B]
    best_seq = jnp.take_along_axis(
        s.fin_seqs, jnp.broadcast_to(best[:, None, None], (b, 1, s.fin_seqs.shape[-1])), axis=1
    )[:, 0]
    best_len = jnp.take_along_axis(s.fin_lens, best[:, None], axis=1)[:, 0]
    best_score = jnp.take_along_axis(s.fin_scores, best[:, None], axis=1)[:, 0]
    pos = jnp.arange(best_seq.shape[-1])[None, :]
    out = jnp.where(pos >= best_len[:, None], fill_value, best_seq)
    return out, best_score


def beam_expand(x: jnp.ndarray, num_beams: int) -> jnp.ndarray:
    """Tile a per-sample array to per-beam layout: [B, ...] -> [B*nb, ...]."""
    return jnp.repeat(x, num_beams, axis=0)


def make_generation_kwargs(cfg: GenerationConfig) -> dict:
    return dict(
        num_beams=cfg.num_beams,
        max_new_tokens=cfg.max_new_tokens,
        min_new_tokens=cfg.min_new_tokens,
        no_repeat_ngram_size=cfg.no_repeat_ngram_size,
        length_penalty=cfg.length_penalty,
        early_stopping=cfg.early_stopping,
        eos_token_id=cfg.eos_token_id,
        pad_token_id=cfg.pad_token_id,
        decoder_start_token_id=cfg.decoder_start_token_id,
    )
