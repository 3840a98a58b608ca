#!/usr/bin/env python
"""Measure report-generation decode throughput on the real chip.

Times greedy and beam-4 (ancestry cache mode) at full model size, B=64,
150-180 tokens — the reference's dominant serving hot loop
(inference_pipeline.py:190). Round-1 numbers to beat: greedy ~360 reports/s,
beam-4 ~23 reports/s (gather cache mode, ~15 ms/step).

Usage: python scripts/bench_beam.py [batch] [--fixed-steps]

--fixed-steps pins min_new_tokens == max_new_tokens (180): the decode loop's
EOS early-exit lands anywhere in [150, 180] with random weights and salted
inputs, which makes same-config throughput swing ~20% across processes —
fixed-length runs are the comparable number for kernel A/B decisions.
"""
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

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    fixed = "--fixed-steps" in sys.argv
    batch = int(args[0]) if args else 64
    print(f"[bench_beam] device: {jax.devices()[0].device_kind}, B={batch}"
          f"{' fixed-steps' if fixed else ''}",
          file=sys.stderr, flush=True)

    bundle = new_random_bundle(seed=0)  # full-size stack
    engine = InferenceEngine(bundle, mode="fast")
    gen = bundle.config.generation  # beam-4, min 150 / max 180, ngram 3
    if fixed:
        import dataclasses

        gen = dataclasses.replace(
            gen, min_new_tokens=gen.max_new_tokens)
    steps = gen.max_new_tokens

    rng = np.random.default_rng(0)

    def z(seed):
        r = np.random.default_rng(seed)
        return (
            jnp.asarray(r.standard_normal((batch, bundle.config.fusion.d_img)), jnp.float32),
            jnp.asarray(r.standard_normal((batch, bundle.config.fusion.d_txt)), jnp.float32),
        )

    for name, greedy in (("greedy", True), ("beam4-ancestry", False)):
        zi, zt = z(1)
        t0 = time.perf_counter()
        engine.generate_reports(zi, zt, gen, greedy=greedy)
        print(f"[bench_beam] {name}: compile+first {time.perf_counter()-t0:.1f}s",
              file=sys.stderr, flush=True)
        best = None
        for i in range(3):
            zi, zt = z(2 + i)  # fresh inputs each call (tunnel may cache replays)
            t0 = time.perf_counter()
            engine.generate_reports(zi, zt, gen, greedy=greedy)
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        n_rows = batch * (1 if greedy else gen.num_beams)
        print(
            f"[bench_beam] {name}: {batch / best:.1f} reports/s "
            f"({best / batch * 1e3:.1f} ms/report, ~{best / steps * 1e3:.2f} ms/step "
            f"at N={n_rows})",
            flush=True,
        )


if __name__ == "__main__":
    main()
