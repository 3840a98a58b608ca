#!/usr/bin/env python
"""Isolate the no-repeat-ngram ban's cost in the REAL beam decode (full lmax).

The machinery ablation in bench_beam_ablate.py sizes the seq buffers by the
iteration count, so the ngram window scan (O(lmax) windows + a vocab-sized
scatter per row) runs on tiny buffers there and its true cost at lmax=181 is
underestimated. This times the full e2e beam-4 generate with ngram3 vs
ngram0 on the served engine path.

Usage: python scripts/bench_beam_ngram.py [batch]
"""
import dataclasses
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mmdx_tpu.checkpoints.bundle import new_random_bundle
    from mmdx_tpu.runtime.engine import InferenceEngine

    b = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    bundle = new_random_bundle(seed=0)
    engine = InferenceEngine(bundle, mode="fast")
    gen = bundle.config.generation
    print(f"[ngram] device={jax.devices()[0].device_kind} B={b}", flush=True)

    for label, g in (
        ("ngram3 (reference config)", gen),
        ("ngram0", dataclasses.replace(gen, no_repeat_ngram_size=0)),
        ("ngram3+es-never", dataclasses.replace(gen, early_stopping="never")),
    ):
        r = np.random.default_rng(1)
        zi = jnp.asarray(r.standard_normal((b, bundle.config.fusion.d_img)), jnp.float32)
        zt = jnp.asarray(r.standard_normal((b, bundle.config.fusion.d_txt)), jnp.float32)
        t0 = time.perf_counter()
        engine.generate_reports(zi, zt, gen=g)
        print(f"[ngram] {label}: compile+first {time.perf_counter()-t0:.1f}s", flush=True)
        best = None
        for i in range(3):
            r = np.random.default_rng(10 + i)
            zi = jnp.asarray(r.standard_normal((b, bundle.config.fusion.d_img)), jnp.float32)
            zt = jnp.asarray(r.standard_normal((b, bundle.config.fusion.d_txt)), jnp.float32)
            t0 = time.perf_counter()
            engine.generate_reports(zi, zt, gen=g)
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        print(f"[ngram] {label}: {b/best:.1f} reports/s "
              f"(~{best/gen.max_new_tokens*1e3:.2f} ms/step)", flush=True)


if __name__ == "__main__":
    main()
