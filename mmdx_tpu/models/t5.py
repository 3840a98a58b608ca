"""T5 encoder-decoder (t5-small architecture) in flax, with KV-cached decoding.

Rebuilds the report-generation head the reference delegates to HF
``T5ForConditionalGeneration`` (reference ``backend/ml/pipelines/
training_pipeline.py:545-618``).  In the fusion model the decoder is
conditioned on K synthetic "encoder output" tokens produced from the fused
embedding (``_make_encoder_outputs``, :574-578); the T5 encoder stack is still
implemented (and its weights round-trip) because the reference's checkpoints
contain it.

Matches HF semantics: RMSNorm (no mean subtraction, fp32 accumulation),
relative position bias only from each stack's first block (shared thereafter),
unscaled dot-product attention, ReLU FFN, tied lm_head with d_model**-0.5
output scaling, decoder_start_token_id == pad == 0.

TPU-first: everything is static-shape; incremental decoding uses an explicit
KV-cache pytree (easy to reorder for beam search inside ``lax.while_loop``).
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from mmdx_tpu.config import ReportDecoderConfig

NEG_INF = -1e9


def relative_position_bucket(
    relative_position: jnp.ndarray,
    bidirectional: bool,
    num_buckets: int = 32,
    max_distance: int = 128,
) -> jnp.ndarray:
    """HF T5 bucketing of (key_pos - query_pos) into relative-attention buckets."""
    ret = jnp.zeros_like(relative_position)
    n = relative_position
    if bidirectional:
        num_buckets //= 2
        ret += (n > 0).astype(jnp.int32) * num_buckets
        n = jnp.abs(n)
    else:
        n = -jnp.minimum(n, 0)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_if_large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact + 1e-9)
        / jnp.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_if_large = jnp.minimum(val_if_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_if_large)


def compute_position_bias(
    rel_embedding: jnp.ndarray,  # [num_buckets, heads]
    q_len: int,
    k_len: int,
    bidirectional: bool,
    num_buckets: int,
    max_distance: int,
) -> jnp.ndarray:
    """[1, heads, q_len, k_len] additive attention bias."""
    ctx = jnp.arange(q_len)[:, None]
    mem = jnp.arange(k_len)[None, :]
    buckets = relative_position_bucket(
        mem - ctx, bidirectional, num_buckets, max_distance
    )  # [q,k]
    bias = rel_embedding[buckets]  # [q,k,heads]
    return jnp.transpose(bias, (2, 0, 1))[None]


class RMSNorm(nn.Module):
    """T5LayerNorm: no mean subtraction, no bias, fp32 variance accumulation."""

    eps: float = 1e-6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
        y = x.astype(jnp.float32) * jax.lax.rsqrt(var + self.eps)
        return (scale * y.astype(self.dtype)).astype(self.dtype)


class T5Attention(nn.Module):
    """Unscaled multi-head attention with optional additive position bias."""

    config: ReportDecoderConfig
    dtype: Any = jnp.float32

    def setup(self):
        cfg = self.config
        inner = cfg.num_heads * cfg.d_kv
        dense = lambda name: nn.Dense(inner, use_bias=False, dtype=self.dtype, name=name)
        self.q = dense("q")
        self.k = dense("k")
        self.v = dense("v")
        self.o = nn.Dense(cfg.d_model, use_bias=False, dtype=self.dtype, name="o")

    def _split(self, x):
        b, l, _ = x.shape
        return x.reshape(b, l, self.config.num_heads, self.config.d_kv).transpose(0, 2, 1, 3)

    def _merge(self, x):
        b, h, l, d = x.shape
        return x.transpose(0, 2, 1, 3).reshape(b, l, h * d)

    def __call__(self, hidden, kv_hidden, bias):
        """hidden [B,Lq,D], kv_hidden [B,Lk,D], bias [*,heads,Lq,Lk] additive."""
        q = self._split(self.q(hidden))
        k = self._split(self.k(kv_hidden))
        v = self._split(self.v(kv_hidden))
        return self.o(self._merge(self.attend(q, k, v, bias)))

    def attend(self, q, k, v, bias):
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
        if bias is not None:
            scores = scores + bias
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(self.dtype)
        return jnp.einsum("bhqk,bhkd->bhqd", probs, v, preferred_element_type=jnp.float32).astype(
            self.dtype
        )

    # ---- incremental decode helpers (explicit cache) ----
    def project_kv(self, kv_hidden):
        return self._split(self.k(kv_hidden)), self._split(self.v(kv_hidden))

    def cross_step(self, y, ck, cv, enc_bias):
        """One-token cross-attention without the [N,1,D] <-> [N,h,1,d]
        transposes ``_split``/``_merge`` emit (each lowered to a real copy —
        ~3 ops x 6 layers of fixed dispatch per decode step in the round-3
        trace).  y [N,1,D]; ck/cv [N,h,K,d] (loop constants); enc_bias
        [N,1,1,K] additive. Same contractions/softmax as ``attend`` — the
        head split here is a free minor-dim reshape."""
        h, d = self.config.num_heads, self.config.d_kv
        n = y.shape[0]
        q = self.q(y).reshape(n, h, d)
        scores = jnp.einsum("nhd,nhkd->nhk", q, ck,
                            preferred_element_type=jnp.float32)
        scores = scores + enc_bias[:, 0, :, :]  # [N,1,K] broadcast over heads
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(self.dtype)
        ctx = jnp.einsum("nhk,nhkd->nhd", probs, cv,
                         preferred_element_type=jnp.float32).astype(self.dtype)
        return self.o(ctx.reshape(n, 1, h * d))

    def step(self, hidden_tok, cache_k, cache_v, pos, bias_row):
        """One-token self-attention step.

        hidden_tok: [B,1,D]; cache_{k,v}: [B,heads,Lmax,d_kv] (updated at pos);
        bias_row: [1,heads,1,Lmax] additive bias+causal mask for query at pos.
        Returns (out [B,1,D], cache_k, cache_v).

        With ``config.deferred_kv_writes`` the attention reads the OLD cache
        and the current token rides as one appended score column (exact full
        softmax — no composition approximation), so the two cache updates
        move off the serial qkv->attention critical path: their only consumer
        is the NEXT step (see the beam variant's rationale in step_beam).
        """
        q = self._split(self.q(hidden_tok))  # [B,h,1,d]
        k_new = self._split(self.k(hidden_tok))
        v_new = self._split(self.v(hidden_tok))
        if self.config.deferred_kv_writes:
            lcap = cache_k.shape[2]
            col = jnp.arange(lcap)[None, None, None, :]
            # own position column comes from k_new — kill its stale cache row
            bias_hist = jnp.where(col == pos, NEG_INF, bias_row)
            s_hist = jnp.einsum(
                "bhqd,bhkd->bhqk", q, cache_k,
                preferred_element_type=jnp.float32) + bias_hist
            bias_own = jax.lax.dynamic_slice(
                bias_row, (0, 0, 0, pos),
                (1, bias_row.shape[1], 1, 1))  # distance-0 bias
            s_own = jnp.einsum(
                "bhqd,bhqd->bhq", q, k_new,
                preferred_element_type=jnp.float32)[..., None] + bias_own
            s = jnp.concatenate([s_hist, s_own], axis=-1)  # [B,h,1,L+1]
            p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(self.dtype)
            ctx = jnp.einsum(
                "bhqk,bhkd->bhqd", p[..., :lcap], cache_v,
                preferred_element_type=jnp.float32,
            ) + jnp.einsum(
                "bhqk,bhkd->bhqd", p[..., lcap:], v_new,
                preferred_element_type=jnp.float32,
            )
            out = self._merge(ctx.astype(self.dtype))
            cache_k = jax.lax.dynamic_update_slice_in_dim(
                cache_k, k_new, pos, axis=2)
            cache_v = jax.lax.dynamic_update_slice_in_dim(
                cache_v, v_new, pos, axis=2)
            return self.o(out), cache_k, cache_v
        cache_k = jax.lax.dynamic_update_slice_in_dim(cache_k, k_new, pos, axis=2)
        cache_v = jax.lax.dynamic_update_slice_in_dim(cache_v, v_new, pos, axis=2)
        out = self._merge(self.attend(q, cache_k, cache_v, bias_row))
        return self.o(out), cache_k, cache_v

    def step_beam(self, hidden_tok, cache, pos, mask, bias_k):
        """One-token beam self-attention over a PHYSICAL (never reordered)
        cache, resolving beam histories through a precomputed ancestry mask.

        hidden_tok: [N,1,D] with N = B*nb; cache: {"kv": [B, nb*Lmax,
        2*h*d_kv]} (+ {"kvs": [B, 2h, nb*Lmax]} f32 dequant scales when the
        buffer is int8 — config.kv_cache_int8). The kv buffer is
        POSITION-MAJOR flat (built by ``init_cache(...,
        beam_width=nb)``): row ``t*nb + j`` holds the K and V (packed k|v in
        the minor dim — one buffer, one dynamic_update_slice per step; the
        separate-k/v form cost ~21 us of fixed dispatch per extra update in
        the round-3 trace) written at step t by physical slot j.  mask: [B, nb, nb*Lmax] f32 additive ancestry mask
        (non-ancestor rows -inf) and bias_k: [heads, nb*Lmax] f32 relative/
        causal bias, both computed ONCE per step in ``T5.decode_step_beam``
        (they depend only on (anc, pos); recomputing per layer was waste).

        Each query attends over ALL nb*Lmax physical rows with non-ancestor
        rows masked out — nb-fold extra FLOPs (free at these sizes) in
        exchange for never rewriting the O(N*Lmax*d) cache. The HBM-critical
        part is HOW the per-head split happens: XLA's einsum over either
        [B,h,K,d] or [B,K,h*d] storage relayouts the entire cache in HBM
        every step (the beam step measured ~4x the greedy step at identical
        cache bytes). ``use_fused_beam_attn`` routes to the Pallas kernel
        (ops/pallas_beam_attn) that reads the flat cache once and splits
        heads inside VMEM. The position-major ordering makes the step's nb
        writes one contiguous ``dynamic_update_slice``, keeping the
        while-loop carry aliased in place.
        """
        b, nb, kk = mask.shape
        h, d = self.config.num_heads, self.config.d_kv
        hd = h * d
        n = b * nb

        q = self.q(hidden_tok).reshape(b, nb, hd)
        k_new = self.k(hidden_tok).reshape(b, nb, hd)
        v_new = self.v(hidden_tok).reshape(b, nb, hd)
        cache_kv = cache["kv"]

        if "kvs" in cache:
            # int8 KV cache (config.kv_cache_int8, engine turbo mode): rows
            # quantize at write time with per-(row, head) scales, HALVING
            # the dominant per-step HBM stream. kvs [B, 2h, K] f32 carries
            # the scales (rows 0..h-1 = K, h..2h-1 = V).
            kr = k_new.reshape(b, nb, h, d).astype(jnp.float32)
            vr = v_new.reshape(b, nb, h, d).astype(jnp.float32)
            sk = jnp.maximum(jnp.max(jnp.abs(kr), axis=-1), 1e-12) / 127.0
            sv = jnp.maximum(jnp.max(jnp.abs(vr), axis=-1), 1e-12) / 127.0
            ki = jnp.clip(jnp.round(kr / sk[..., None]), -127, 127)
            vi = jnp.clip(jnp.round(vr / sv[..., None]), -127, 127)
            rows = jnp.concatenate(
                [ki.reshape(b, nb, hd), vi.reshape(b, nb, hd)], axis=-1
            ).astype(jnp.int8)
            cache_kv = jax.lax.dynamic_update_slice_in_dim(
                cache_kv, rows, pos * nb, axis=1)
            s_new = jnp.concatenate(
                [sk.transpose(0, 2, 1), sv.transpose(0, 2, 1)], axis=1)
            kvs = jax.lax.dynamic_update_slice_in_dim(
                cache["kvs"], s_new, pos * nb, axis=2)
            new_cache = {"kv": cache_kv, "kvs": kvs}

            if self.config.use_fused_beam_attn:
                from mmdx_tpu.ops.pallas_beam_attn import (
                    beam_decode_attention_int8,
                )

                ctx = beam_decode_attention_int8(q, cache_kv, kvs, mask, bias_k)
                return self.o(ctx.reshape(n, 1, hd)), new_cache

            # XLA fallback mirrors the kernel's op order (scale after the
            # int8-as-float dot; V scale folded into the probabilities)
            kh = cache_kv[..., :hd].reshape(b, kk, h, d).astype(self.dtype)
            vh = cache_kv[..., hd:].reshape(b, kk, h, d).astype(self.dtype)
            scores = jnp.einsum(
                "bihd,bkhd->bhik", q.reshape(b, nb, h, d), kh,
                preferred_element_type=jnp.float32,
            ) * kvs[:, :h, None, :]
            scores = scores + bias_k[None, :, None, :] + mask[:, None, :, :]
            probs = jax.nn.softmax(scores, axis=-1)
            probs = (probs * kvs[:, h:, None, :]).astype(self.dtype)
            ctx = jnp.einsum(
                "bhik,bkhd->bihd", probs, vh, preferred_element_type=jnp.float32
            ).astype(self.dtype)
            return self.o(ctx.reshape(n, 1, hd)), new_cache

        if (self.config.deferred_kv_writes and self.config.use_fused_beam_attn
                and nb >= 2):
            # Deferred-write path: attend over the OLD cache (the caller's
            # mask kills the own column) and compose this step's own token
            # outside the kernel from softmax partials — the cache write
            # below then has a full step of slack instead of sitting on the
            # qkv->attention critical path (see config.deferred_kv_writes).
            from mmdx_tpu.ops.pallas_beam_attn import (
                beam_decode_attention_partial,
            )

            acc, m, l = beam_decode_attention_partial(q, cache_kv, mask,
                                                      bias_k)
            qh = q.reshape(b, nb, h, d)
            kh = k_new.reshape(b, nb, h, d)
            vh = v_new.reshape(b, nb, h, d)
            s_own = jnp.einsum("bihd,bihd->bih", qh, kh,
                               preferred_element_type=jnp.float32)
            # bias at the own column (distance 0; same for every slot j)
            bias_own = jax.lax.dynamic_slice(
                bias_k, (0, pos * nb), (h, 1))[None, None, :, 0]  # [1,1,h]
            s_own = s_own + bias_own
            m2 = jnp.maximum(m, s_own)
            ea = jnp.exp(m - m2)  # 0 when the cache was fully masked (m=-1e9)
            eb = jnp.exp(s_own - m2)
            num = (acc.reshape(b, nb, h, d) * ea[..., None]
                   + eb[..., None] * vh.astype(jnp.float32))
            den = l * ea + eb
            ctx = (num / den[..., None]).reshape(b, nb, hd).astype(self.dtype)
            # the write happens AFTER the read — next step's kernel is its
            # only consumer, giving the DMA a full step of slack
            cache_kv = jax.lax.dynamic_update_slice_in_dim(
                cache_kv, jnp.concatenate([k_new, v_new], axis=-1),
                pos * nb, axis=1)
            return self.o(ctx.reshape(n, 1, hd)), {"kv": cache_kv}

        cache_kv = jax.lax.dynamic_update_slice_in_dim(
            cache_kv, jnp.concatenate([k_new, v_new], axis=-1), pos * nb, axis=1
        )
        new_cache = {"kv": cache_kv}

        if self.config.use_fused_beam_attn:
            from mmdx_tpu.ops.pallas_beam_attn import beam_decode_attention

            ctx = beam_decode_attention(q, cache_kv, mask, bias_k)
            return self.o(ctx.reshape(n, 1, h * d)), new_cache

        kh = cache_kv[..., : h * d].reshape(b, kk, h, d)
        vh = cache_kv[..., h * d:].reshape(b, kk, h, d)
        scores = jnp.einsum(
            "bihd,bkhd->bhik", q.reshape(b, nb, h, d), kh,
            preferred_element_type=jnp.float32,
        )
        scores = scores + bias_k[None, :, None, :] + mask[:, None, :, :]
        probs = jax.nn.softmax(scores, axis=-1).astype(self.dtype)  # [B,h,i,K]
        ctx = jnp.einsum(
            "bhik,bkhd->bihd", probs, vh, preferred_element_type=jnp.float32
        ).astype(self.dtype)
        return self.o(ctx.reshape(n, 1, h * d)), new_cache


class T5FFN(nn.Module):
    config: ReportDecoderConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True):
        cfg = self.config
        h = nn.Dense(cfg.d_ff, use_bias=False, dtype=self.dtype, name="wi")(x)
        h = nn.relu(h)
        h = nn.Dropout(cfg.dropout)(h, deterministic=deterministic)
        return nn.Dense(cfg.d_model, use_bias=False, dtype=self.dtype, name="wo")(h)


class T5EncoderLayer(nn.Module):
    config: ReportDecoderConfig
    dtype: Any = jnp.float32

    def setup(self):
        cfg = self.config
        self.self_ln = RMSNorm(cfg.layer_norm_eps, self.dtype, name="self_ln")
        self.self_attn = T5Attention(cfg, self.dtype, name="self_attn")
        self.ffn_ln = RMSNorm(cfg.layer_norm_eps, self.dtype, name="ffn_ln")
        self.ffn_wi = nn.Dense(cfg.d_ff, use_bias=False, dtype=self.dtype, name="ffn_wi")
        self.ffn_wo = nn.Dense(cfg.d_model, use_bias=False, dtype=self.dtype, name="ffn_wo")

    def __call__(self, hidden, bias, deterministic=True):
        y = self.self_ln(hidden)
        hidden = hidden + self.self_attn(y, y, bias)
        y = self.ffn_ln(hidden)
        hidden = hidden + self.ffn_wo(nn.relu(self.ffn_wi(y)))
        return hidden


class T5DecoderLayer(nn.Module):
    config: ReportDecoderConfig
    dtype: Any = jnp.float32

    def setup(self):
        cfg = self.config
        self.self_ln = RMSNorm(cfg.layer_norm_eps, self.dtype, name="self_ln")
        self.self_attn = T5Attention(cfg, self.dtype, name="self_attn")
        self.cross_ln = RMSNorm(cfg.layer_norm_eps, self.dtype, name="cross_ln")
        self.cross_attn = T5Attention(cfg, self.dtype, name="cross_attn")
        self.ffn_ln = RMSNorm(cfg.layer_norm_eps, self.dtype, name="ffn_ln")
        self.ffn_wi = nn.Dense(cfg.d_ff, use_bias=False, dtype=self.dtype, name="ffn_wi")
        self.ffn_wo = nn.Dense(cfg.d_model, use_bias=False, dtype=self.dtype, name="ffn_wo")

    def __call__(self, hidden, self_bias, enc_hidden, enc_bias, deterministic=True):
        y = self.self_ln(hidden)
        hidden = hidden + self.self_attn(y, y, self_bias)
        y = self.cross_ln(hidden)
        hidden = hidden + self.cross_attn(y, enc_hidden, enc_bias)
        y = self.ffn_ln(hidden)
        hidden = hidden + self.ffn_wo(nn.relu(self.ffn_wi(y)))
        return hidden

    def _cross_ffn_fused(self, hidden_tok, static_kv, enc_bias):
        """Route the cross-attention + FFN half-step through the single
        Pallas program (ops/pallas_t5_step). hidden_tok [N,1,D] -> [N,1,D]."""
        from mmdx_tpu.ops.pallas_t5_step import cross_ffn_block

        h, d = self.config.num_heads, self.config.d_kv
        n = hidden_tok.shape[0]
        if "ck2" in static_kv:  # flat layout precomputed by init_cache
            ck2, cv2 = static_kv["ck2"], static_kv["cv2"]
        else:
            ck = static_kv["ck"]  # [N, h, K, d]
            kk = ck.shape[2]
            ck2 = ck.transpose(0, 2, 1, 3).reshape(n, kk, h * d)
            cv2 = static_kv["cv"].transpose(0, 2, 1, 3).reshape(n, kk, h * d)
        out = cross_ffn_block(
            hidden_tok[:, 0, :],
            self.cross_ln.variables["params"]["scale"],
            self.cross_attn.q.variables["params"]["kernel"],
            self.cross_attn.o.variables["params"]["kernel"],
            ck2, cv2,
            enc_bias[:, 0, 0, :],
            self.ffn_ln.variables["params"]["scale"],
            self.ffn_wi.variables["params"]["kernel"],
            self.ffn_wo.variables["params"]["kernel"],
            heads=h, eps=self.config.layer_norm_eps,
        )
        return out[:, None, :]

    def step(self, hidden_tok, cache, static_kv, pos, self_bias_row, enc_bias):
        """One-token decode step.

        cache = {k, v} self-attention buffers (carried + beam-gathered each
        step); static_kv = {ck, cv} cross-attention projections of the encoder
        outputs — constant for a generation, so they live OUTSIDE the carried
        cache (beams of one sample share identical values; gathering/copying
        them every step is pure waste)."""
        y = self.self_ln(hidden_tok)
        attn, k_, v_ = self.self_attn.step(y, cache["k"], cache["v"], pos, self_bias_row)
        hidden_tok = hidden_tok + attn
        if self.config.use_fused_cross_ffn:
            return self._cross_ffn_fused(hidden_tok, static_kv, enc_bias), {
                "k": k_, "v": v_}
        y = self.cross_ln(hidden_tok)
        hidden_tok = hidden_tok + self.cross_attn.cross_step(
            y, static_kv["ck"], static_kv["cv"], enc_bias
        )
        y = self.ffn_ln(hidden_tok)
        hidden_tok = hidden_tok + self.ffn_wo(nn.relu(self.ffn_wi(y)))
        return hidden_tok, {"k": k_, "v": v_}

    def step_beam(self, hidden_tok, cache, static_kv, pos, mask, bias_k,
                  enc_bias):
        """One-token beam decode step over a physical (never reordered) cache —
        see ``T5Attention.step_beam``. Cross-attention needs no ancestry: all
        beams of a sample share identical encoder K/V."""
        y = self.self_ln(hidden_tok)
        attn, new_cache = self.self_attn.step_beam(y, cache, pos, mask, bias_k)
        hidden_tok = hidden_tok + attn
        if self.config.use_fused_cross_ffn:
            return (self._cross_ffn_fused(hidden_tok, static_kv, enc_bias),
                    new_cache)
        y = self.cross_ln(hidden_tok)
        hidden_tok = hidden_tok + self.cross_attn.cross_step(
            y, static_kv["ck"], static_kv["cv"], enc_bias
        )
        y = self.ffn_ln(hidden_tok)
        hidden_tok = hidden_tok + self.ffn_wo(nn.relu(self.ffn_wi(y)))
        return hidden_tok, new_cache


class T5(nn.Module):
    """Full seq2seq model over explicit encoder outputs.

    Methods (use with ``model.apply(variables, ..., method=T5.<method>)``):
      encode              encoder stack over token ids
      decode              teacher-forced decoder -> logits [B,L,V]
      init_cache          build the KV-cache pytree for incremental decode
      decode_step         one-token decode -> (logits [B,V], cache)
    """

    config: ReportDecoderConfig = ReportDecoderConfig()
    dtype: Any = jnp.float32

    def setup(self):
        cfg = self.config
        self.shared = nn.Embed(cfg.vocab_size, cfg.d_model, dtype=self.dtype, name="shared")
        self.enc_rel_bias = nn.Embed(
            cfg.relative_attention_num_buckets, cfg.num_heads, name="encoder_rel_bias"
        )
        self.dec_rel_bias = nn.Embed(
            cfg.relative_attention_num_buckets, cfg.num_heads, name="decoder_rel_bias"
        )
        self.encoder_layers = [
            T5EncoderLayer(cfg, self.dtype, name=f"encoder_layer{i}")
            for i in range(cfg.num_layers)
        ]
        self.decoder_layers = [
            T5DecoderLayer(cfg, self.dtype, name=f"decoder_layer{i}")
            for i in range(cfg.num_decoder_layers)
        ]
        self.encoder_final_ln = RMSNorm(cfg.layer_norm_eps, self.dtype, name="encoder_final_ln")
        self.decoder_final_ln = RMSNorm(cfg.layer_norm_eps, self.dtype, name="decoder_final_ln")
        if not cfg.tie_word_embeddings:
            self.lm_head = nn.Dense(
                cfg.vocab_size, use_bias=False, dtype=self.dtype, name="lm_head"
            )

    # ------------------------------------------------------------------
    def encode(self, input_ids, attention_mask):
        cfg = self.config
        hidden = self.shared(input_ids)
        bias = compute_position_bias(
            self.enc_rel_bias.embedding,
            input_ids.shape[1],
            input_ids.shape[1],
            bidirectional=True,
            num_buckets=cfg.relative_attention_num_buckets,
            max_distance=cfg.relative_attention_max_distance,
        )
        bias = bias + (1.0 - attention_mask[:, None, None, :].astype(jnp.float32)) * NEG_INF
        for layer in self.encoder_layers:
            hidden = layer(hidden, bias)
        return self.encoder_final_ln(hidden)

    def _lm_logits(self, hidden):
        cfg = self.config
        if cfg.tie_word_embeddings:
            hidden = hidden * (cfg.d_model**-0.5)
            return jnp.einsum(
                "bld,vd->blv", hidden, self.shared.embedding, preferred_element_type=jnp.float32
            )
        return self.lm_head(hidden)

    def _lm_logits_step(self, hidden):
        """Single-position lm head for decode steps: [N,1,D] -> [N,V], or
        [N, V/128, 128] when ``config.chunked_step_logits`` (see config.py —
        producing the chunk layout at the einsum removes a ~98 us/step XLA
        relayout round trip at serving shape; same contraction either way)."""
        cfg = self.config
        if cfg.tie_word_embeddings:
            h = hidden[:, 0] * (cfg.d_model**-0.5)
            emb = self.shared.embedding
            v, d = emb.shape
            if cfg.chunked_step_logits and v % 128 == 0 and v >= 256:
                out_t = (jnp.bfloat16 if cfg.step_logits_bf16
                         else jnp.float32)
                return jnp.einsum(
                    "bd,ckd->bck", h, emb.reshape(v // 128, 128, d),
                    preferred_element_type=out_t,
                )
            return jnp.einsum(
                "bd,vd->bv", h, emb, preferred_element_type=jnp.float32,
            )
        return self.lm_head(hidden[:, 0])

    def decode(self, decoder_input_ids, encoder_hidden, encoder_mask):
        """Teacher-forced decode -> logits [B, L, vocab].

        Decoder self-attention is causal over the full length (HF default when
        no decoder_attention_mask is passed, matching the reference training,
        training_pipeline.py:600-604).
        """
        cfg = self.config
        l = decoder_input_ids.shape[1]
        hidden = self.shared(decoder_input_ids)
        self_bias = compute_position_bias(
            self.dec_rel_bias.embedding,
            l,
            l,
            bidirectional=False,
            num_buckets=cfg.relative_attention_num_buckets,
            max_distance=cfg.relative_attention_max_distance,
        )
        causal = jnp.tril(jnp.ones((l, l), jnp.float32))
        self_bias = self_bias + (1.0 - causal)[None, None] * NEG_INF
        enc_bias = (1.0 - encoder_mask[:, None, None, :].astype(jnp.float32)) * NEG_INF
        for layer in self.decoder_layers:
            hidden = layer(hidden, self_bias, encoder_hidden, enc_bias)
        hidden = self.decoder_final_ln(hidden)
        return self._lm_logits(hidden)

    # ------------------------------------------------------------------
    def init_cache(self, batch: int, max_len: int, encoder_hidden,
                   beam_width: int | None = None):
        """Build the decode state: (cache, static_kv) where cache holds the
        per-layer self-attention K/V buffers (carried through the decode loop)
        and static_kv holds the precomputed cross-attention K/V over the
        encoder outputs (loop constants).

        ``beam_width=None``: cache leaves are {k, v} [batch, heads, max_len,
        d_kv] (for ``decode_step`` — greedy, or gather-mode beam search).
        ``beam_width=nb``: BEAM layout {kv} [batch/nb, nb*max_len,
        2*heads*d_kv], position-major flat (row t*nb + j = slot j's write at
        step t) with heads AND k|v fused in the minor dim (see
        ``T5Attention.step_beam``), for ``decode_step_beam`` (ancestry mode;
        never reordered)."""
        cfg = self.config
        cache = []
        static_kv = []
        if beam_width:
            assert batch % beam_width == 0, (batch, beam_width)
            shape = (batch // beam_width, beam_width * max_len,
                     2 * cfg.num_heads * cfg.d_kv)
        else:
            shape = (batch, cfg.num_heads, max_len, cfg.d_kv)
        for layer in self.decoder_layers:
            ck, cv = layer.cross_attn.project_kv(encoder_hidden)
            if beam_width and cfg.kv_cache_int8:
                # int8 cache + per-(row, head) f32 dequant scales (rows on
                # the LAST axis of the scale buffer: a [B, K, 2h] layout
                # would pad 2h to a full 128-lane tile, 8x the bytes)
                cache.append({
                    "kv": jnp.zeros(shape, jnp.int8),
                    "kvs": jnp.zeros(
                        (shape[0], 2 * cfg.num_heads, shape[1]), jnp.float32),
                })
            elif beam_width:
                cache.append({"kv": jnp.zeros(shape, self.dtype)})
            else:
                cache.append({"k": jnp.zeros(shape, self.dtype),
                              "v": jnp.zeros(shape, self.dtype)})
            entry = {"ck": ck, "cv": cv}
            if cfg.use_fused_cross_ffn:
                # flat [N, K, h*d] layout for ops/pallas_t5_step, precomputed
                # here: XLA declines to hoist the transpose out of the decode
                # while-loop (~35 us/step across layers, round-3 trace)
                entry["ck2"] = ck.transpose(0, 2, 1, 3).reshape(
                    ck.shape[0], ck.shape[2], -1)
                entry["cv2"] = cv.transpose(0, 2, 1, 3).reshape(
                    cv.shape[0], cv.shape[2], -1)
            static_kv.append(entry)
        return cache, static_kv

    def decode_self_bias(self, max_len: int):
        """Full causal position bias [1, heads, max_len, max_len] precomputed
        once per generation; decode_step slices the query row it needs."""
        cfg = self.config
        bias = compute_position_bias(
            self.dec_rel_bias.embedding,
            max_len,
            max_len,
            bidirectional=False,
            num_buckets=cfg.relative_attention_num_buckets,
            max_distance=cfg.relative_attention_max_distance,
        )
        causal = jnp.tril(jnp.ones((max_len, max_len), jnp.float32))
        return bias + (1.0 - causal)[None, None] * NEG_INF

    def decode_step(self, token_ids, pos, cache, static_kv, self_bias_full,
                    encoder_mask):
        """token_ids [B,1] at position ``pos`` -> (logits [B,vocab], new cache).

        Cache buffers may be shorter than the bias's Lmax (segmented decode);
        the key capacity is inferred and the causal bias row masks every
        not-yet-written key."""
        cap = cache[0]["k"].shape[2]
        hidden = self.shared(token_ids)  # [B,1,D]
        bias_row = jax.lax.dynamic_slice_in_dim(self_bias_full, pos, 1, axis=2)  # [1,h,1,Lmax]
        bias_row = bias_row[..., :cap]
        enc_bias = (1.0 - encoder_mask[:, None, None, :].astype(jnp.float32)) * NEG_INF
        new_cache = []
        for layer, layer_cache, layer_static in zip(self.decoder_layers, cache, static_kv):
            hidden, lc = layer.step(hidden, layer_cache, layer_static, pos,
                                    bias_row, enc_bias)
            new_cache.append(lc)
        hidden = self.decoder_final_ln(hidden)
        cfg = self.config
        if cfg.use_fused_lm_head and cfg.tie_word_embeddings:
            # defer the lm_head: greedy decode fuses it with masked argmax
            # selection in one Pallas pass (ops/pallas_lm_head.lm_head_greedy)
            from mmdx_tpu.ops.pallas_lm_head import LazyLogits

            return LazyLogits(
                hidden[:, 0] * (cfg.d_model**-0.5), self.shared.embedding
            ), new_cache
        return self._lm_logits_step(hidden), new_cache

    def decode_step_beam(self, token_ids, pos, cache, anc, static_kv,
                         self_bias_full, encoder_mask):
        """Beam-search decode step: like ``decode_step`` but the KV cache is
        physical (never beam-reordered) and ``anc [B, nb, Lmax]`` carries the
        beam ancestry (see ``beam_search(cache_mode="ancestry")``).

        The cache buffers may be SHORTER than Lmax (segmented decode: the
        caller grows them as generation proceeds, halving average HBM traffic
        per step); the key capacity is inferred from the cache leaves, the
        ancestry/bias slices follow, and the causal bias row masks every
        not-yet-written key, so segmenting is output-invariant."""
        b, nb, lmax = anc.shape
        cap = cache[0]["kv"].shape[1] // nb  # key positions in this segment
        hidden = self.shared(token_ids)  # [N,1,D]
        bias_row = jax.lax.dynamic_slice_in_dim(self_bias_full, pos, 1, axis=2)
        bias_row = bias_row[..., :cap]
        if cap > lmax:
            # alignment padding: the final segment's cache may carry a few
            # rows past Lmax so nb*cap is a multiple of 8 (the flat-cache
            # attention read runs ~3x faster 8-aligned; see beam_search).
            # Padded keys are positions >= Lmax > any query pos -> the causal
            # NEG_INF bias kills them, so this is output-invariant.
            bias_row = jnp.pad(bias_row, ((0, 0),) * 3 + ((0, cap - lmax),),
                               constant_values=NEG_INF)
        enc_bias = (1.0 - encoder_mask[:, None, None, :].astype(jnp.float32)) * NEG_INF
        # ancestry mask + bias, computed ONCE for all layers (identical across
        # them): position `pos` is this step's own write; row t*nb+j of the
        # position-major cache is live for query i iff anc_eff[b,i,t] == j
        anc_c = anc[:, :, :cap]
        if cap > lmax:
            anc_c = jnp.pad(anc_c, ((0, 0), (0, 0), (0, cap - lmax)))
        deferred = (self.config.deferred_kv_writes
                    and self.config.use_fused_beam_attn
                    and nb >= 2 and "kvs" not in cache[0])
        if deferred:
            # own column DEAD in the cache read: the current token's k/v ride
            # as a separate kernel-external contribution (see
            # T5Attention.step_beam deferred path) so the cache write leaves
            # the critical path
            own = jnp.full((1, nb, 1), -1, jnp.int32)  # matches no slot
        else:
            own = jnp.arange(nb, dtype=jnp.int32)[None, :, None]
        anc_eff = jnp.where(jnp.arange(cap)[None, None, :] == pos, own, anc_c)
        live = anc_eff[..., None] == jnp.arange(nb, dtype=jnp.int32)  # [B,i,C,j]
        mask = jnp.where(live.reshape(b, nb, cap * nb), 0.0, NEG_INF)
        bias_k = jnp.repeat(bias_row[0, :, 0, :], nb, axis=-1)  # [h, C*nb]
        new_cache = []
        for layer, layer_cache, layer_static in zip(self.decoder_layers, cache, static_kv):
            hidden, lc = layer.step_beam(hidden, layer_cache, layer_static, pos,
                                         mask, bias_k, enc_bias)
            new_cache.append(lc)
        hidden = self.decoder_final_ln(hidden)
        cfg = self.config
        if cfg.use_fused_lm_head and cfg.tie_word_embeddings:
            # defer the lm_head: beam search fuses it with candidate
            # selection in one Pallas pass (ops/pallas_lm_head)
            from mmdx_tpu.ops.pallas_lm_head import LazyLogits

            return LazyLogits(
                hidden[:, 0] * (cfg.d_model**-0.5), self.shared.embedding
            ), new_cache
        return self._lm_logits_step(hidden), new_cache

    def __call__(self, input_ids, attention_mask, decoder_input_ids):
        enc = self.encode(input_ids, attention_mask)
        return self.decode(decoder_input_ids, enc, attention_mask)


def shift_right(labels: jnp.ndarray, decoder_start_token_id: int = 0, pad_id: int = 0):
    """HF _shift_right: prepend start token, drop last, map -100 -> pad."""
    shifted = jnp.concatenate(
        [jnp.full((labels.shape[0], 1), decoder_start_token_id, labels.dtype), labels[:, :-1]],
        axis=1,
    )
    return jnp.where(shifted == -100, pad_id, shifted)
