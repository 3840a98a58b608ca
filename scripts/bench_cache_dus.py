#!/usr/bin/env python
"""Microbench: KV-cache dynamic_update_slice forms (real chip).

The round-3 beam trace charges 18.3 us/layer/step to the cache write —
a [64, 4, 1024] bf16 DUS into [64, 724, 1024] at second-minor offset
4*pos (8-aligned only when pos is even). This times the suspects:
  a) 4-row DUS at even (8-aligned) offsets
  b) 4-row DUS at odd (4-misaligned) offsets
  c) 8-row DUS at 8-aligned offsets (the parity-buffered flush candidate)
  d) 1-row DUS into [64, 181, 4096] (row-per-position layout candidate)
  e) 4-row DUS at leading-dim offset on [724, 64, 1024] (keys-major)

Usage: python scripts/bench_cache_dus.py
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

    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    print(f"[dus] device={jax.devices()[0].device_kind}", flush=True)
    _salt = iter(range(1, 100000))

    def timed(make_state, body, lo=100, hi=1700):
        @functools.partial(jax.jit, static_argnames=("iters",), donate_argnums=(0,))
        def loop(state, salt, iters: int):
            def b(i, st):
                return body(i + salt, st)

            return lax.fori_loop(0, iters, b, state)

        r = None
        for reps in (lo, hi, lo, hi, lo, hi):
            st = make_state()
            t0 = time.perf_counter()
            out = loop(st, jnp.int32(next(_salt)), reps)
            jax.block_until_ready(out)
            dt_ = time.perf_counter() - t0
            r = (r or []) + [(reps, dt_)]
        pairs = [(r[i], r[i + 1]) for i in (2, 4)]
        per = min((h[1] - l[1]) / (h[0] - l[0]) for l, h in pairs)
        return per

    B, NB, HD2, LMAX = 64, 4, 1024, 181
    K = NB * LMAX

    def upd(cache):  # fresh data each iter so nothing is hoisted
        return cache

    # a/b: 4-row DUS, controlled offset parity. The update VALUE reads the
    # cache (rows at the previous offset) so no iteration can be replayed
    # or hoisted — the chain is genuinely sequential.
    def make_ab(parity):
        def mk():
            return jnp.zeros((B, K, HD2), dt)

        def body(i, c):
            pos = (i % 90) * 2 + parity  # even*2(+1): alternating aligned rows
            new = lax.dynamic_slice_in_dim(
                c, ((i + 1) % 90) * 2 * NB, NB, axis=1) + i.astype(dt)
            return lax.dynamic_update_slice_in_dim(c, new, pos * NB, axis=1)

        return mk, body

    # f: one stacked 6-layer DUS (the batched-write candidate)
    def make_f():
        L = 6

        def mk():
            return jnp.zeros((L, B, K, HD2), dt)

        def body(i, c):
            pos = i % 179
            new = lax.dynamic_slice_in_dim(
                c, ((i + 1) % 179) * NB, NB, axis=2) + i.astype(dt)
            return lax.dynamic_update_slice_in_dim(c, new, pos * NB, axis=2)

        return mk, body

    # c: 8-row aligned DUS
    def make_c():
        def mk():
            return jnp.zeros((B, K, HD2), dt)

        def body(i, c):
            pos = (i % 90) * 2
            new = jnp.full((B, 2 * NB, HD2), (i % 7).astype(dt))
            return lax.dynamic_update_slice_in_dim(c, new, pos * NB, axis=1)

        return mk, body

    # d: row-per-position [B, LMAX, NB*HD2]
    def make_d():
        def mk():
            return jnp.zeros((B, LMAX, NB * HD2), dt)

        def body(i, c):
            pos = i % LMAX
            new = jnp.full((B, 1, NB * HD2), (i % 7).astype(dt))
            return lax.dynamic_update_slice_in_dim(c, new, pos, axis=1)

        return mk, body

    # e: keys-major [K, B, HD2]
    def make_e():
        def mk():
            return jnp.zeros((K, B, HD2), dt)

        def body(i, c):
            pos = i % LMAX
            new = jnp.full((NB, B, HD2), (i % 7).astype(dt))
            return lax.dynamic_update_slice_in_dim(c, new, pos * NB, axis=0)

        return mk, body

    for name, (mk, body) in (
        ("a 4row even-offset  [B,K,hd2]", make_ab(0)),
        ("f 4row stacked-6L   [6,B,K,hd2]", make_f()),
        ("b 4row odd-offset   [B,K,hd2]", make_ab(1)),
        ("c 8row aligned      [B,K,hd2]", make_c()),
        ("d 1row row-per-pos  [B,L,4096]", make_d()),
        ("e 4row keys-major   [K,B,hd2]", make_e()),
    ):
        try:
            t = timed(mk, body)
            print(f"[dus] {name}: {t * 1e6:.2f} us/update", flush=True)
        except Exception as ex:  # noqa: BLE001
            print(f"[dus] {name}: FAILED {type(ex).__name__}: {str(ex)[:100]}",
                  flush=True)


if __name__ == "__main__":
    main()
