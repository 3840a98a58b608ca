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

    # patch the names the CURRENT hot loop calls (beam_search.body uses
    # banned_ngram_mask + fused_candidate_topk since the round-3 rewrite;
    # the old ban_repeated_ngrams/topk_chunked patches were silent no-ops)
    orig_insert = bs._insert_hyp
    orig_cand = bs.fused_candidate_topk
    orig_ngram = bs.banned_ngram_mask

    def no_insert(fin_seqs, fin_scores, fin_lens, n_fin, seq, score, length, do):
        # keep n_fin advancing so early-stop conds still terminate
        return fin_seqs, fin_scores, fin_lens, n_fin + do.astype(n_fin.dtype)

    def no_ngram_mask(*a, **k):
        return None  # the body treats None as "nothing banned"

    def cheap_candidates(logits, beam_scores, banned, mask_eos,
                         eos_token_id, k, b, nb):
        # timing stub: constant candidates that never emit eos, consuming
        # only the decoder hidden state — XLA then drops the lm_head matmul
        # AND the whole logprob/mask/topk chain, so this arm ablates the
        # full candidate chain (not just the top-k)
        hidden = getattr(logits, "hidden", logits)
        base = jnp.sum(hidden[:, :1].astype(jnp.float32)) * 1e-9
        idx = jnp.broadcast_to(
            (jnp.arange(k, dtype=jnp.int32) + eos_token_id + 2)[None], (b, k))
        scores = base - jnp.broadcast_to(
            jnp.arange(1, k + 1, dtype=jnp.float32)[None], (b, k))
        return scores, idx

    configs = [
        ("full (as served)", {}),
        ("no ngram", {"banned_ngram_mask": no_ngram_mask}),
        ("no insert_hyp", {"_insert_hyp": no_insert}),
        ("no candidate chain (lm_head+logprob+topk)",
         {"fused_candidate_topk": cheap_candidates}),
        ("no ngram+insert+candidates",
         {"banned_ngram_mask": no_ngram_mask, "_insert_hyp": no_insert,
          "fused_candidate_topk": cheap_candidates}),
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
            bs.fused_candidate_topk = orig_cand
            bs.banned_ngram_mask = orig_ngram


if __name__ == "__main__":
    main()
