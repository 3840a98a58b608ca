#!/usr/bin/env python
"""Microbench: beam self-attention step formulations (real chip).

The ablation (scripts/bench_beam_ablate.py) shows decode_step_beam at
3.85 ms/step vs 0.90 ms for the greedy-layout step at the SAME N and the
same cache bytes — the ancestry attention's einsum over the
[B, h, nb*Lmax, d] physical cache is paying ~3 ms somewhere (suspect: XLA
relayouts the whole cache for an M=4 matmul). This times one layer's
self-attention step under different data layouts / contraction forms at the
exact serving shapes (B=64, nb=4, h=8, d=64, Lmax=181 -> K=724), x6 layers
to extrapolate.

Usage: python scripts/bench_beam_attn.py
"""
import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    import jax
    import jax.lax as lax
    import jax.numpy as jnp
    import numpy as np

    B, NB, H, D, LMAX = 64, 4, 8, 64, 181
    K = NB * LMAX
    N = B * NB
    dt = jnp.bfloat16
    NEG = -1e9
    print(f"[attn] device={jax.devices()[0].device_kind} B={B} nb={NB} h={H} "
          f"d={D} K={K}", flush=True)

    rng = np.random.default_rng(0)
    q_flat = jnp.asarray(rng.standard_normal((N, H * D)) * 0.05, dt)  # [N, h*d]
    anc = jnp.asarray(rng.integers(0, NB, (B, NB, LMAX)), jnp.int32)
    bias_row = jnp.asarray(rng.standard_normal((1, H, 1, LMAX)), jnp.float32)

    _salt = iter(range(1, 100000))

    def timed(fn, *args, lo=50, hi=850, reps=3):
        @functools.partial(jax.jit, static_argnames=("iters",))
        def loop(args, salt, iters: int):
            def body(i, carry):
                # q depends on the carry so the score matmul can't be hoisted
                q_i = args[0] * (1 + carry * 1e-20).astype(args[0].dtype)
                out = fn(i + salt, q_i, *args[1:])
                return carry + jnp.sum(out.astype(jnp.float32)) * 1e-6

            return lax.fori_loop(0, iters, body, jnp.float32(0))

        float(loop(args, jnp.int32(next(_salt)), lo))
        float(loop(args, jnp.int32(next(_salt)), hi))
        best = None
        for _ in range(reps):
            t0 = time.perf_counter(); float(loop(args, jnp.int32(next(_salt)), lo)); dl = time.perf_counter() - t0
            t0 = time.perf_counter(); float(loop(args, jnp.int32(next(_salt)), hi)); dh = time.perf_counter() - t0
            per = (dh - dl) / (hi - lo)
            best = per if best is None else min(best, per)
        return best

    def mask_for(pos):
        own = jnp.arange(NB, dtype=jnp.int32)[None, :, None]
        anc_eff = jnp.where(jnp.arange(LMAX)[None, None, :] == pos, own, anc)
        live = anc_eff[..., None] == jnp.arange(NB, dtype=jnp.int32)
        return jnp.where(live.reshape(B, NB, LMAX * NB), 0.0, NEG)  # [B,i,K]

    bias_rep = jnp.repeat(bias_row[0, :, 0, :], NB, axis=-1)  # [H, K]

    # ---- A: current layout [B, h, K, d], einsum i=4 matmul ----
    cacheA_k = jnp.asarray(rng.standard_normal((B, H, K, D)) * 0.05, dt)
    cacheA_v = jnp.asarray(rng.standard_normal((B, H, K, D)) * 0.05, dt)

    def heads_major(x):
        return x.reshape(B, NB, H, D).transpose(0, 2, 1, 3)

    def variant_a(salt, q, ck, cv):
        pos = salt % LMAX
        qh = heads_major(q * (1 + pos * 0))  # [B,h,i,d]
        scores = jnp.einsum("bhid,bhkd->bhik", qh, ck,
                            preferred_element_type=jnp.float32)
        scores = scores + bias_rep[None, :, None, :] + mask_for(pos)[:, None]
        probs = jax.nn.softmax(scores, axis=-1).astype(dt)
        ctx = jnp.einsum("bhik,bhkd->bhid", probs, cv,
                         preferred_element_type=jnp.float32).astype(dt)
        return ctx.transpose(0, 2, 1, 3).reshape(N, H * D)

    # ---- B: flat cache [B, K, h*d]; reshape view to [B, K, h, d] ----
    cacheB_k = jnp.asarray(rng.standard_normal((B, K, H * D)) * 0.05, dt)
    cacheB_v = jnp.asarray(rng.standard_normal((B, K, H * D)) * 0.05, dt)

    def variant_b(salt, q, ck, cv):
        pos = salt % LMAX
        qh = q.reshape(B, NB, H, D)
        kh = ck.reshape(B, K, H, D)
        vh = cv.reshape(B, K, H, D)
        scores = jnp.einsum("bihd,bkhd->bhik", qh, kh,
                            preferred_element_type=jnp.float32)
        scores = scores + bias_rep[None, :, None, :] + mask_for(pos)[:, None]
        probs = jax.nn.softmax(scores, axis=-1).astype(dt)
        ctx = jnp.einsum("bhik,bkhd->bihd", probs, vh,
                         preferred_element_type=jnp.float32).astype(dt)
        return ctx.reshape(N, H * D)

    # ---- C: current layout, vmap over beams (i as matvec) ----
    def variant_c(salt, q, ck, cv):
        pos = salt % LMAX
        qh = heads_major(q)  # [B,h,i,d]
        mask = mask_for(pos)

        def one_beam(qi, mi):  # qi [B,h,d], mi [B,K]
            s = jnp.einsum("bhd,bhkd->bhk", qi, ck,
                           preferred_element_type=jnp.float32)
            s = s + bias_rep[None] + mi[:, None]
            p = jax.nn.softmax(s, axis=-1).astype(dt)
            return jnp.einsum("bhk,bhkd->bhd", p, cv,
                              preferred_element_type=jnp.float32)

        ctx = jax.vmap(one_beam, in_axes=(2, 1), out_axes=2)(
            qh, mask)  # [B,h,d,i]? out_axes=2 -> [B,h,i,d]
        return ctx.astype(dt).transpose(0, 2, 1, 3).reshape(N, H * D)

    # ---- D: elementwise broadcast-reduce (force VPU) ----
    def variant_d(salt, q, ck, cv):
        pos = salt % LMAX
        qh = heads_major(q)  # [B,h,i,d]
        s = jnp.sum(qh[:, :, :, None, :].astype(jnp.float32)
                    * ck[:, :, None, :, :].astype(jnp.float32), axis=-1)
        s = s + bias_rep[None, :, None, :] + mask_for(pos)[:, None]
        p = jax.nn.softmax(s, axis=-1).astype(dt)
        ctx = jnp.sum(p[..., None] * cv[:, :, None, :, :], axis=3)
        return ctx.astype(dt).transpose(0, 2, 1, 3).reshape(N, H * D)

    # ---- E: greedy-shape control: [N, h, L, d] cache, q len 1 ----
    cacheE_k = jnp.asarray(rng.standard_normal((N, H, LMAX, D)) * 0.05, dt)
    cacheE_v = jnp.asarray(rng.standard_normal((N, H, LMAX, D)) * 0.05, dt)

    def variant_e(salt, q, ck, cv):
        qh = q.reshape(N, 1, H, D).transpose(0, 2, 1, 3)  # [N,h,1,d]
        scores = jnp.einsum("bhqd,bhkd->bhqk", qh, ck,
                            preferred_element_type=jnp.float32)
        scores = scores + bias_row
        probs = jax.nn.softmax(scores, axis=-1).astype(dt)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, cv,
                         preferred_element_type=jnp.float32).astype(dt)
        return ctx.transpose(0, 2, 1, 3).reshape(N, H * D)

    for name, fn, args in (
        ("A current [B,h,K,d] einsum-i4", variant_a, (q_flat, cacheA_k, cacheA_v)),
        ("B flat [B,K,h*d] bihd/bkhd", variant_b, (q_flat, cacheB_k, cacheB_v)),
        ("C vmap-matvec over beams", variant_c, (q_flat, cacheA_k, cacheA_v)),
        ("D broadcast-reduce VPU", variant_d, (q_flat, cacheA_k, cacheA_v)),
        ("E greedy control [N,h,L,d]", variant_e, (q_flat, cacheE_k, cacheE_v)),
    ):
        try:
            t = timed(fn, *args)
            print(f"[attn] {name}: {t * 1e6:.1f} us/layer-step "
                  f"(x6 = {t * 6e3:.3f} ms/step)", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"[attn] {name}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
