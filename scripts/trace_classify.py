#!/usr/bin/env python
"""Device-trace the FULL turbo classify step at serving shapes.

bench.py times the whole fused classify (preproc -> int8 ResNet tower +
int8-matmul BERT tower -> fusion head); the per-tower isolation benches
(bench_int8_tower.py, bench_int8_text.py) account for most but not all of
the budget.  This script traces the exact bench-shaped jitted program and
aggregates per-op device time so the residue (layout copies, dequant chains,
fusion head, anything XLA materializes between the towers) is attributable.

Usage: python scripts/trace_classify.py [batch] [--bf16] [--top N]
"""
import dataclasses
import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from scripts.bench_int8_tower import parse_trace  # noqa: E402


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.lax as lax
    import jax.numpy as jnp
    import numpy as np

    from mmdx_tpu.checkpoints.bundle import new_random_bundle
    from mmdx_tpu.models.diagnosis import MultiModalDiagnosisModel
    from mmdx_tpu.ops.preprocess import preprocess_batch_device

    args = [a for a in sys.argv[1:] if not a.startswith("--")
            and not (sys.argv[sys.argv.index(a) - 1] == "--top")]
    batch = int(args[0]) if args else 512
    bf16 = "--bf16" in sys.argv
    top = 40
    for i, a in enumerate(sys.argv):
        if a == "--top":
            top = int(sys.argv[i + 1])

    dev = jax.devices()[0]
    log(f"[trace] device: {dev.device_kind}, batch={batch}, "
        f"tower={'bf16' if bf16 else 'int8 turbo'}")

    bundle = new_random_bundle(seed=0)
    cfg = bundle.config
    model_cfg = dataclasses.replace(
        cfg,
        text=dataclasses.replace(
            cfg.text, use_fused_ffn=True, use_fused_attn_block=True,
            int8_matmuls=not bf16,
        ),
        image=dataclasses.replace(cfg.image, use_folded_bn=True),
    )
    model = MultiModalDiagnosisModel(config=model_cfg, dtype=jnp.bfloat16)

    rng = np.random.default_rng(0)
    canon = 512
    images = jnp.asarray(
        rng.integers(0, 256, (batch, canon, canon, 1), dtype=np.uint8))
    seq = 32
    ids = jnp.asarray(
        rng.integers(0, cfg.text.vocab_size, (batch, seq), dtype=np.int32))
    mask = jnp.ones((batch, seq), dtype=np.int32)
    variables = jax.device_put(bundle.variables, dev)

    def preproc(img_u8, out_dtype=jnp.bfloat16):
        return preprocess_batch_device(
            img_u8, cfg.image.img_size, cfg.image.resize_size,
            cfg.image.mean, cfg.image.std, out_dtype=out_dtype)

    if bf16:
        @functools.partial(jax.jit, static_argnames=("iters",))
        def loop(variables, images, ids, mask, iters: int):
            def body(_, carry):
                acc, salt = carry
                img_i = images + (salt % 2).astype(jnp.uint8)
                ids_i = ids.at[:, 0].set(salt % cfg.text.vocab_size)
                out = model.apply(
                    variables, preproc(img_i), ids_i, mask, None,
                    method=MultiModalDiagnosisModel.classify)
                s = jnp.sum(out["probs"].astype(jnp.float32))
                return acc + s, (jnp.abs(s) * 1003.0).astype(jnp.int32) % 97

            acc, _ = lax.fori_loop(0, iters, body, (jnp.float32(0), jnp.int32(1)))
            return acc

        loop_args = (variables, images, ids, mask)
    else:
        from mmdx_tpu.models.resnet_int8 import (
            calibrate_backbone, int8_backbone_apply, quantize_backbone,
        )
        from mmdx_tpu.ops.preprocess import preprocess_batch_device_gray

        x_calib = jax.jit(lambda i: preproc(i, jnp.float32))(images[:32])
        scales = calibrate_backbone(variables, x_calib)
        qparams = jax.jit(
            lambda v: quantize_backbone(
                v, scales, cfg.image.bn_eps, mean=cfg.image.mean,
                std=cfg.image.std, img_size=cfg.image.img_size,
            )
        )(variables)
        gray = images.shape[-1] == 1 and "stem_gray" in qparams

        @functools.partial(jax.jit, static_argnames=("iters",))
        def loop(variables, qparams, images, ids, mask, iters: int):
            def body(_, carry):
                acc, salt = carry
                img_i = images + (salt % 2).astype(jnp.uint8)
                ids_i = ids.at[:, 0].set(salt % cfg.text.vocab_size)
                if gray:
                    xin = preprocess_batch_device_gray(
                        img_i, cfg.image.img_size, cfg.image.resize_size,
                        out_dtype=jnp.bfloat16,
                    )
                else:
                    xin = preproc(img_i)
                feats = int8_backbone_apply(qparams, xin)
                out = model.apply(
                    variables, feats, ids_i, mask, None,
                    method=MultiModalDiagnosisModel.classify_from_image_feats)
                s = jnp.sum(out["probs"].astype(jnp.float32))
                return acc + s, (jnp.abs(s) * 1003.0).astype(jnp.int32) % 97

            acc, _ = lax.fori_loop(0, iters, body, (jnp.float32(0), jnp.int32(1)))
            return acc

        loop_args = (variables, qparams, images, ids, mask)

    from mmdx_tpu.runtime.profiler import device_trace

    t0 = time.time()
    loop(*loop_args, iters=2).block_until_ready()
    log(f"[trace] compile+warm: {time.time() - t0:.1f}s")

    iters = 10
    tdir = "/tmp/mmdx_trace_classify"
    with device_trace(tdir, host_tracer_level=0):
        loop(*loop_args, iters=iters).block_until_ready()
    log(f"[trace] captured {iters} iters; per-op totals BELOW are the sum "
        f"over all {iters} (divide by {iters} for ms/batch)")
    try:
        from scripts.xplane import print_top

        print_top(tdir, top=top)
    except Exception as e:  # tensorflow proto unavailable -> JSON fallback
        log(f"[trace] xplane parse failed ({e}); falling back to JSON export")
        parse_trace(tdir, top=top)


if __name__ == "__main__":
    main()
