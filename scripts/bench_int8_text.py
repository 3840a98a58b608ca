#!/usr/bin/env python
"""A/B the int8 text-tower kernels vs bf16 at serving shapes.

Measures 12-layer loops at B=512, L=32 (the bucketed serving shape) of:
  * attn-bf16 / attn-int8   — fused attention block
  * ffn-bf16  / ffn-int8    — fused FFN+LN block
  * layer-bf16 / layer-int8 — attn + ffn chained (a full BertLayer)
plus the int8-vs-bf16 output relative error (quantization-noise bound).

Usage: python scripts/bench_int8_text.py [batch] [seq]
"""
import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    seq = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    import jax
    import jax.lax as lax
    import jax.numpy as jnp
    import numpy as np

    from mmdx_tpu.ops.pallas_bert_attn import fused_attention_block
    from mmdx_tpu.ops.pallas_ffn import fused_ffn_ln, fused_ffn_ln_int8

    hidden, heads, layers, d_ff = 768, 12, 12, 3072
    rng = np.random.default_rng(0)
    m = batch * seq
    x = jnp.asarray(rng.standard_normal((m, hidden)) * 0.5, jnp.bfloat16)
    kmask = jnp.zeros((m,), jnp.float32)
    wqkv = jnp.asarray(rng.standard_normal((hidden, 3 * hidden)) * 0.03, jnp.bfloat16)
    bqkv = jnp.asarray(rng.standard_normal((3 * hidden,)) * 0.02, jnp.bfloat16)
    wo = jnp.asarray(rng.standard_normal((hidden, hidden)) * 0.03, jnp.bfloat16)
    wi_f = jnp.asarray(rng.standard_normal((hidden, d_ff)) * 0.03, jnp.bfloat16)
    bi_f = jnp.asarray(rng.standard_normal((d_ff,)) * 0.02, jnp.bfloat16)
    wo_f = jnp.asarray(rng.standard_normal((d_ff, hidden)) * 0.03, jnp.bfloat16)
    bo = jnp.asarray(rng.standard_normal((hidden,)) * 0.02, jnp.bfloat16)
    lns = jnp.ones((hidden,), jnp.bfloat16)
    lnb = jnp.zeros((hidden,), jnp.bfloat16)
    log = lambda s: print(s, file=sys.stderr, flush=True)
    log(f"[i8text] device={jax.devices()[0].device_kind} B={batch} L={seq}")

    def attn(xc, int8):
        return fused_attention_block(xc, kmask, wqkv, bqkv, wo, bo, lns, lnb,
                                     seq_len=seq, num_heads=heads,
                                     int8_matmuls=int8)

    def ffn(xc, int8):
        f = fused_ffn_ln_int8 if int8 else fused_ffn_ln
        return f(xc, wi_f, bi_f, wo_f, bo, lns, lnb)

    variants = {
        "attn-bf16": lambda xc: attn(xc, False),
        "attn-int8": lambda xc: attn(xc, True),
        "ffn-bf16": lambda xc: ffn(xc, False),
        "ffn-int8": lambda xc: ffn(xc, True),
        "layer-bf16": lambda xc: ffn(attn(xc, False), False),
        "layer-int8": lambda xc: ffn(attn(xc, True), True),
    }

    # accuracy: one layer, int8 vs bf16
    a = np.asarray(variants["layer-bf16"](x), np.float32)
    b = np.asarray(variants["layer-int8"](x), np.float32)
    rel = float(np.linalg.norm(a - b) / np.linalg.norm(a))
    log(f"[i8text] one-layer int8-vs-bf16 rel error: {rel:.4f}")

    _salt = iter(range(1, 10**6))
    results = {}
    for name, f in variants.items():
        @functools.partial(jax.jit, static_argnames=("iters",))
        def loop(x, salt0, iters: int, _f=f):
            def body(_, carry):
                acc, salt, xc = carry
                xc = (xc + salt.astype(jnp.bfloat16) * 1e-6).astype(jnp.bfloat16)
                for _layer in range(layers):
                    xc = _f(xc)
                s = jnp.sum(xc.astype(jnp.float32))
                return acc + s, (jnp.abs(s) * 7.0).astype(jnp.int32) % 5, xc
            acc, _, _ = lax.fori_loop(0, iters, body, (jnp.float32(0), salt0, x))
            return acc

        try:
            float(loop(x, jnp.int32(next(_salt)), iters=1))
            best = None
            for _ in range(3):
                t0 = time.perf_counter()
                float(loop(x, jnp.int32(next(_salt)), iters=1))
                d1 = time.perf_counter() - t0
                t0 = time.perf_counter()
                float(loop(x, jnp.int32(next(_salt)), iters=5))
                d5 = time.perf_counter() - t0
                per = (d5 - d1) / 4
                best = per if best is None else min(best, per)
            results[name] = best
            log(f"[i8text] {name}: {best * 1e3:.2f} ms / {layers} layers")
        except Exception as e:  # noqa: BLE001
            log(f"[i8text] {name}: FAILED {type(e).__name__}: {str(e)[:200]}")

    if "layer-bf16" in results and "layer-int8" in results:
        log(f"[i8text] layer speedup: "
            f"{results['layer-bf16'] / results['layer-int8']:.2f}x")


if __name__ == "__main__":
    main()
