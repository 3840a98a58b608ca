#!/usr/bin/env python
"""Attribute the real beam loop's per-step cost by stubbing parts out.

The dummy-step machinery ablation sizes its buffers by the iteration count,
so lmax-scaling costs hide. Here the REAL e2e beam decode (full model, full
lmax=181) runs with individual machinery pieces monkeypatched to no-ops
(timing-only; outputs are wrong where noted) to attribute the milliseconds.

Usage: python scripts/bench_beam_parts.py [batch]
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    import mmdx_tpu.decode.beam_search as bs
    from mmdx_tpu.checkpoints.bundle import new_random_bundle
    from mmdx_tpu.runtime.engine import InferenceEngine

    b = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    bundle = new_random_bundle(seed=0)
    print(f"[parts] device={jax.devices()[0].device_kind} B={b}", flush=True)

    orig_insert = bs._insert_hyp
    orig_topk = bs.topk_chunked
    orig_ngram = bs.ban_repeated_ngrams

    def no_insert(fin_seqs, fin_scores, fin_lens, n_fin, seq, score, length, do):
        # keep n_fin advancing so early-stop conds still terminate
        return fin_seqs, fin_scores, fin_lens, n_fin + do.astype(n_fin.dtype)

    def cheap_topk(x, k, chunk=1024):
        vals = jax.lax.dynamic_slice_in_dim(x, 0, k, axis=1)
        idx = jnp.argmax(x, axis=-1, keepdims=True).astype(jnp.int32)
        return vals, jnp.broadcast_to(idx, vals.shape) + jnp.arange(k, dtype=jnp.int32)

    def no_ngram(logprobs, seqs, cur, n):
        return logprobs

    configs = [
        ("full (as served)", {}),
        ("no ngram", {"ban_repeated_ngrams": no_ngram}),
        ("no insert_hyp", {"_insert_hyp": no_insert}),
        ("cheap topk", {"topk_chunked": cheap_topk}),
        ("no ngram+insert+topk", {"ban_repeated_ngrams": no_ngram,
                                  "_insert_hyp": no_insert,
                                  "topk_chunked": cheap_topk}),
    ]

    for label, patches in configs:
        for name, fn in patches.items():
            setattr(bs, name, fn)
        try:
            engine = InferenceEngine(bundle, mode="fast")
            r = np.random.default_rng(1)
            zi = jnp.asarray(r.standard_normal((b, bundle.config.fusion.d_img)),
                             jnp.float32)
            zt = jnp.asarray(r.standard_normal((b, bundle.config.fusion.d_txt)),
                             jnp.float32)
            t0 = time.perf_counter()
            engine.generate_reports(zi, zt)
            compile_s = time.perf_counter() - t0
            best = None
            for i in range(3):
                r = np.random.default_rng(10 + i)
                zi = jnp.asarray(r.standard_normal((b, bundle.config.fusion.d_img)),
                                 jnp.float32)
                zt = jnp.asarray(r.standard_normal((b, bundle.config.fusion.d_txt)),
                                 jnp.float32)
                t0 = time.perf_counter()
                engine.generate_reports(zi, zt)
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            print(f"[parts] {label}: {b/best:.1f} reports/s "
                  f"({best/180*1e3:.2f} ms/step; compile {compile_s:.0f}s)",
                  flush=True)
        finally:
            bs._insert_hyp = orig_insert
            bs.topk_chunked = orig_topk
            bs.ban_repeated_ngrams = orig_ngram


if __name__ == "__main__":
    main()
