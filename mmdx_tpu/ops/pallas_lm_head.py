"""Pallas streaming lm_head + candidate-selection statistics for beam decode.

The beam step's logit chain (reference hot loop: HF beam search over the T5
lm_head, reference backend/ml/pipelines/inference_pipeline.py:190) is, per
step: lm_head matmul -> [N, 32128] f32 logits to HBM -> three separate
reductions read them back (row max, logsumexp, masked per-128-chunk max for
the two-stage candidate top-k in decode/beam_search.fused_candidate_topk).
That is ~4 HBM round-trips of a 33 MB tensor per step (~0.5 ms of the
~2 ms/step round-3 beam budget).

This kernel streams the tied-embedding matmul through VMEM in vocab tiles
and computes ALL the stage-1 statistics in the same pass:

  * logits written to HBM ONCE (stage 2 of the top-k gathers a few 128-col
    chunks from them);
  * running row max ``m`` and online logsumexp ``L`` (flash-softmax style
    rescaling — mathematically equal to the dense chain, not bitwise, so
    this path is fast/turbo-mode only; parity mode and small vocabs keep the
    dense XLA chain);
  * ``cmax`` = per-128-chunk max over MASKED logits (ngram bans + the
    min-length eos mask fold into one [N, V] mask input).

HBM traffic per step drops from ~165 MB (weights + logits x4) to ~75 MB
(weights + logits once + mask).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK = 128  # stage-1 chunk width (must match fused_candidate_topk)


class LazyLogits(NamedTuple):
    """Deferred lm_head: ``logits = hidden @ emb.T`` (tied-embedding head,
    d_model**-0.5 already folded into ``hidden``). ``T5.decode_step_beam``
    returns this instead of materialized logits when
    ``config.use_fused_lm_head`` is set, so the beam search can fuse the
    matmul with candidate selection (see ``lm_head_stats``)."""

    hidden: jnp.ndarray  # [N, D], head scale pre-applied
    emb: jnp.ndarray  # [V, D]

    @property
    def shape(self):
        return (self.hidden.shape[0], self.emb.shape[0])

    def materialize(self) -> jnp.ndarray:
        return jnp.einsum("nd,vd->nv", self.hidden, self.emb,
                          preferred_element_type=jnp.float32)


def _kernel(x_ref, e_ref, mask_ref, logits_ref, m_ref, l_ref, cmax_ref,
            m_run, s_run, *, v: int, vt: int, n_tiles: int):
    g = pl.program_id(0)
    x = x_ref[...]  # [N, D]
    lt = jax.lax.dot_general(
        x, e_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [N, Vt]
    n = lt.shape[0]
    col = g * vt + jax.lax.broadcasted_iota(jnp.int32, (n, vt), 1)
    valid = col < v
    lt = jnp.where(valid, lt, -jnp.inf)  # pad cols dead for max/sum/chunks
    logits_ref[...] = lt

    # masked per-chunk max (stage 1 of the two-stage candidate top-k).
    # Written TRANSPOSED [C_t, N]: a [N, vt/128] output block has last dim
    # vt/128 (e.g. 16) — neither 128-divisible nor the full array dim, which
    # Mosaic rejects at lowering on real TPU. Transposed, the grid steps the
    # SUBLANE dim (vt/128 rows, 8-divisible for vt>=1024; single-tile grids
    # span the full dim) and N rides the lanes as the full array dim (always
    # legal). The wrapper crops the ragged tail and transposes back.
    banned = mask_ref[...] != 0
    lt_m = jnp.where(banned, -jnp.inf, lt)
    cmax_ref[...] = jnp.max(lt_m.reshape(n, vt // CHUNK, CHUNK), axis=-1).T

    # online max/logsumexp over the RAW (unmasked) logits
    tile_m = jnp.max(lt, axis=-1, keepdims=True)  # [N, 1]
    tile_s = lambda m_new: jnp.sum(jnp.exp(lt - m_new), axis=-1, keepdims=True)

    @pl.when(g == 0)
    def _init():
        m_run[...] = tile_m
        s_run[...] = tile_s(tile_m)

    @pl.when(g > 0)
    def _update():
        m_new = jnp.maximum(m_run[...], tile_m)
        s_run[...] = s_run[...] * jnp.exp(m_run[...] - m_new) + tile_s(m_new)
        m_run[...] = m_new

    @pl.when(g == n_tiles - 1)
    def _finish():
        m_ref[...] = m_run[...]
        l_ref[...] = jnp.log(s_run[...])


def _greedy_kernel(x_ref, e_ref, mask_ref, cmax_ref, carg_ref, *, v: int,
                   vt: int):
    """Greedy variant: per-chunk max + within-chunk argmax of MASKED logits,
    nothing else — the [B, V] logits never exist anywhere (greedy needs no
    logsumexp: argmax(log_softmax(x)) == argmax(x))."""
    g = pl.program_id(0)
    lt = jax.lax.dot_general(
        x_ref[...], e_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [N, Vt]
    n = lt.shape[0]
    col = g * vt + jax.lax.broadcasted_iota(jnp.int32, (n, vt), 1)
    # two separate wheres, not one &-combined predicate: Mosaic's layout
    # inference hits an "Invalid relayout ... replicated in destination" on
    # the i1 AND of a broadcasted-iota compare with the i8 mask compare
    lt = jnp.where(col < v, lt, -jnp.inf)
    # widen i8 -> i32 before the compare: Mosaic on v5e rejects the packed
    # i8 vector cmpi ("Target does not support this comparison")
    lt = jnp.where(mask_ref[...].astype(jnp.int32) == 0, lt, -jnp.inf)
    c = vt // CHUNK
    lt3 = lt.reshape(n, c, CHUNK)
    cmax = jnp.max(lt3, axis=-1)  # [N, C]
    off = jax.lax.broadcasted_iota(jnp.int32, (n, c, CHUNK), 2)
    # earliest within-chunk offset achieving the max (ties like jnp.argmax)
    carg = jnp.min(jnp.where(lt3 == cmax[..., None], off, CHUNK), axis=-1)
    # transposed [C_t, N] for Mosaic block legality (see _kernel comment)
    cmax_ref[...] = cmax.T
    carg_ref[...] = jnp.minimum(carg, CHUNK - 1).T


@functools.partial(jax.jit, static_argnames=("vt", "interpret"))
def lm_head_greedy(hidden, emb, mask, vt: int | None = None,
                   interpret: bool = False):
    """Streamed greedy selection statistics: (cmax [N, V/128] f32 masked
    per-chunk max, carg [N, V/128] i32 within-chunk argmax offset). The
    caller picks ``chunk* = argmax(cmax)`` and
    ``token = chunk* * 128 + carg[chunk*]`` — identical (incl. tie order) to
    ``argmax(where(mask, -inf, hidden @ emb.T))``."""
    n, d = hidden.shape
    v = emb.shape[0]
    assert v % CHUNK == 0, v
    if vt is None:
        vt = min(2048, v)
    n_tiles = -(-v // vt)

    ct = vt // CHUNK  # chunk rows per vocab tile (transposed-output sublanes)
    # Compiled-mode block legality: the transposed chunk-stat grid steps the
    # sublane dim by ct, so ct must be 8-divisible unless the grid is a
    # single tile (block == full dim). The default vt always satisfies this
    # (v <= 2048 -> one tile; else vt=2048 -> ct=16); an explicit multi-tile
    # vt < 1024 is only legal in interpret mode (tests) — Mosaic rejects it
    # at lowering otherwise.
    cmax_t, carg_t = pl.pallas_call(
        functools.partial(_greedy_kernel, v=v, vt=vt),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((n, d), lambda g: (0, 0)),
            pl.BlockSpec((vt, d), lambda g: (g, 0)),
            pl.BlockSpec((n, vt), lambda g: (0, g)),
        ],
        out_specs=[
            pl.BlockSpec((ct, n), lambda g: (g, 0)),
            pl.BlockSpec((ct, n), lambda g: (g, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((v // CHUNK, n), jnp.float32),
            jax.ShapeDtypeStruct((v // CHUNK, n), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(hidden, emb, mask.astype(jnp.int8))
    return cmax_t.T, carg_t.T


@functools.partial(jax.jit, static_argnames=("vt", "interpret"))
def lm_head_stats(hidden, emb, mask, vt: int | None = None,
                  interpret: bool = False):
    """hidden [N, D] (head scale applied), emb [V, D], mask [N, V] (nonzero =
    banned from selection; typically ngram bans | min-length eos mask).

    Returns (logits [N, V] f32, m [N] f32 row max, L [N] f32 logsumexp,
    cmax [N, ceil(V/128)] f32 per-chunk masked max).

    V need not divide the vocab tile ``vt``: the grid is ceil(V/vt) and the
    ragged final block's out-of-bounds lanes are garbage on input (masked by
    the kernel's ``col < v`` guard before every use) and cropped on output —
    no host-visible padding, so nothing loop-variant-looking rides into the
    decode while_loop (an explicit 33 MB emb pad would re-run per step if
    XLA declined to hoist it).
    """
    n, d = hidden.shape
    v = emb.shape[0]
    assert v % CHUNK == 0, v  # chunk boundaries must align (beam_search gates)
    if vt is None:
        vt = min(2048, v)
    n_tiles = -(-v // vt)

    ct = vt // CHUNK  # chunk rows per vocab tile (transposed-output sublanes)
    # Compiled-mode block legality: the transposed chunk-stat grid steps the
    # sublane dim by ct, so ct must be 8-divisible unless the grid is a
    # single tile (block == full dim). The default vt always satisfies this
    # (v <= 2048 -> one tile; else vt=2048 -> ct=16); an explicit multi-tile
    # vt < 1024 is only legal in interpret mode (tests) — Mosaic rejects it
    # at lowering otherwise.
    logits, m, l_, cmax_t = pl.pallas_call(
        functools.partial(_kernel, v=v, vt=vt, n_tiles=n_tiles),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((n, d), lambda g: (0, 0)),
            pl.BlockSpec((vt, d), lambda g: (g, 0)),
            pl.BlockSpec((n, vt), lambda g: (0, g)),
        ],
        out_specs=[
            pl.BlockSpec((n, vt), lambda g: (0, g)),
            pl.BlockSpec((n, 1), lambda g: (0, 0)),
            pl.BlockSpec((n, 1), lambda g: (0, 0)),
            pl.BlockSpec((ct, n), lambda g: (g, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, v), jnp.float32),
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
            jax.ShapeDtypeStruct((v // CHUNK, n), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((n, 1), jnp.float32),
            pltpu.VMEM((n, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(hidden, emb, mask.astype(jnp.int8))
    return logits, m[:, 0], l_[:, 0], cmax_t.T
