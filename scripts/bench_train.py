#!/usr/bin/env python
"""Training-step throughput: the joint fusion phase on one chip.

Times the full-size joint train step (ResNet-50 + BERT-base towers, T5
decoder loss, AdamW with per-group LRs — the stack the reference trains in
backend/ml/pipelines/training_pipeline.py:157-311 on CPU torch) as
samples/s/chip. Steps run in a jitted ``lax.scan`` chain — state_{i+1}
depends on state_i, so the axon tunnel cannot replay cached dispatches
(NOTES.md measurement rules) — and the clock stops on a scalar fetch.

Usage: python scripts/bench_train.py [batch] [--small] [--f32]
       python scripts/bench_train.py --sweep   # batch x dtype curve
Donation of the train state is backend-gated in parallel/train.py
(TPU on, CPU off; MMDX_TRAIN_DONATE overrides).
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def bench_one(batch: int, dtype, small: bool) -> float:
    """-> best samples/s/chip for one (batch, dtype) config."""
    import jax
    import jax.numpy as jnp

    from mmdx_tpu.checkpoints.bundle import new_random_bundle
    from mmdx_tpu.models.diagnosis import MultiModalDiagnosisModel
    from mmdx_tpu.parallel.mesh import make_mesh
    from mmdx_tpu.parallel.sharding import shard_batch, shard_variables
    from mmdx_tpu.parallel.train import (
        TrainState, build_joint_optimizer, make_joint_batch,
        make_sharded_train_step,
    )

    bundle = new_random_bundle(seed=0, small=small)
    cfg = bundle.config
    model = MultiModalDiagnosisModel(config=cfg, dtype=dtype)
    mesh = make_mesh(n_model=1)
    print(f"[train] device={jax.devices()[0].device_kind} B={batch} "
          f"dtype={dtype.__name__} small={small}", file=sys.stderr, flush=True)

    variables = shard_variables(bundle.variables, mesh)
    tx = build_joint_optimizer(variables["params"])
    state = TrainState(
        step=jnp.int32(0), params=variables["params"],
        opt_state=tx.init(variables["params"]),
        batch_stats=variables["batch_stats"],
    )
    rng = jax.random.PRNGKey(0)
    batch_data = shard_batch(
        make_joint_batch(rng, cfg, batch, report_len=64), mesh
    )
    step_fn = make_sharded_train_step(model, tx, mesh, state, batch_data)

    def run_steps(state, n):
        for i in range(n):
            # perturb one field per step: fresh args + the state chain both
            # defeat dispatch replay through the tunnel
            b = dict(batch_data)
            b["disease_targets"] = batch_data["disease_targets"].at[0, 0].set(
                (i % 2) * 1.0
            )
            state, loss = step_fn(state, b, jax.random.fold_in(rng, i))
        return state, float(loss)

    t0 = time.perf_counter()
    state, loss = run_steps(state, 2)
    print(f"[train] compile+2 steps: {time.perf_counter() - t0:.1f}s "
          f"(loss {loss:.4f})", file=sys.stderr, flush=True)

    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        state, loss = run_steps(state, 6)
        dt = (time.perf_counter() - t0) / 6
        best = dt if best is None else min(best, dt)
        print(f"[train] {dt * 1e3:.1f} ms/step -> "
              f"{batch / dt:.1f} samples/s/chip (loss {loss:.4f})",
              file=sys.stderr, flush=True)
    print(f"[train] best: {best * 1e3:.1f} ms/step, "
          f"{batch / best:.1f} samples/s/chip at B={batch} "
          f"({dtype.__name__})", flush=True)
    return batch / best


def main():
    import jax
    import jax.numpy as jnp

    small = "--small" in sys.argv
    if small:
        # CPU smoke path (tests/conftest forces cpu; axon owns the default)
        jax.config.update("jax_platforms", "cpu")

    if "--sweep" in sys.argv:
        # batch x dtype curve (VERDICT r3 #7): each config in-process serially
        results = {}
        batches = (4, 8) if small else (16, 32, 64, 128)
        for dtype in (jnp.bfloat16, jnp.float32):
            for b in batches:
                results[(dtype.__name__, b)] = bench_one(b, dtype, small)
        print("[train] sweep (samples/s/chip):", flush=True)
        for (dt, b), v in results.items():
            print(f"[train]   {dt:>9} B={b:<4} {v:8.1f}", flush=True)
        return

    dtype = jnp.float32 if "--f32" in sys.argv else jnp.bfloat16
    batch = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() \
        else (8 if small else 32)
    bench_one(batch, dtype, small)


if __name__ == "__main__":
    main()
