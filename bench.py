#!/usr/bin/env python
"""Benchmark: multimodal classify + report-generation throughput per chip.

The BASELINE.json north-star metric: batched multimodal inference (on-device
uint8 preprocessing -> ResNet-50 tower + BERT tower -> late-fusion disease
head) in inferences/sec/chip, target >= 5000 on v5e-1.

Headline ``value`` = classification throughput with the int8 "turbo" image
tower (static PTQ, models/resnet_int8 — accuracy guardrail in
tests/test_resnet_int8.py). First-class secondary metrics, so no single
number overstates (every key says exactly what it measures):
  * classify_bf16_per_s_chip  — exact bf16 tower classification
  * beam4_reports_per_s_chip  — beam-4 150-180-token report generation
  * greedy_reports_per_s_chip — greedy report generation
  * e2e_classify_plus_beam4_report_per_s_chip — full round-trips/s when every
    sample is classified AND gets a beam-4 report (serial amortized rate)

Methodology: the timing loop runs ON DEVICE inside a single jit
(``lax.fori_loop`` with a data dependency between iterations, so XLA can
neither hoist the towers out of the loop nor cache results), and the clock
stops on a scalar fetch.  Two loop lengths are timed and differenced to cancel
fixed dispatch/RPC overhead.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
Diagnostics go to stderr.
"""
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


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

    dev = jax.devices()[0]
    log(f"[bench] device: {dev.device_kind} ({jax.default_backend()})")

    import dataclasses

    bundle = new_random_bundle(seed=0)  # full-size ResNet-50 + BERT-base stack
    cfg = bundle.config
    model_cfg = dataclasses.replace(
        cfg,
        text=dataclasses.replace(
            cfg.text, use_fused_ffn=True, use_fused_attn_block=True
        ),
        image=dataclasses.replace(cfg.image, use_folded_bn=True),
    )
    model = MultiModalDiagnosisModel(config=model_cfg, dtype=jnp.bfloat16)

    batch = int(os.environ.get("MMDX_BENCH_BATCH", "512"))
    canon = int(os.environ.get("MMDX_BENCH_CANON", "512"))
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 256, (batch, canon, canon, 1), dtype=np.uint8))

    # realistic patient-details inputs through the real tokenizer; the engine's
    # exact length bucketing (pad tokens are masked out of attention + pooling,
    # so outputs are invariant) picks the serving pad length
    import random as _random

    from mmdx_tpu.pipelines.data_prep import synthesize_patient_details
    from mmdx_tpu.runtime.engine import InferenceEngine

    _r = _random.Random(0)
    texts = []
    for i in range(batch):
        vec = [0] * 13
        vec[i % 13] = 1
        texts.append(synthesize_patient_details(vec, _r))
    engine = InferenceEngine(bundle, mode="fast")
    tok = engine.prep_texts(texts)
    seq = tok["input_ids"].shape[1]
    log(f"[bench] patient-details tokenized: pad bucket {seq} "
        f"(longest real {int(tok['attention_mask'].sum(1).max())})")
    ids = jnp.asarray(tok["input_ids"])
    mask = jnp.asarray(tok["attention_mask"])
    variables = jax.device_put(bundle.variables, dev)

    def preproc(img_u8, out_dtype=jnp.bfloat16):
        return preprocess_batch_device(
            img_u8, cfg.image.img_size, cfg.image.resize_size,
            cfg.image.mean, cfg.image.std, out_dtype=out_dtype,
        )

    @functools.partial(jax.jit, static_argnames=("iters",))
    def bench_loop_bf16(variables, images, ids, mask, iters: int):
        def body(_, carry):
            acc, salt = carry
            # data-dependent perturbation defeats loop-invariant hoisting
            img_i = images + (salt % 2).astype(jnp.uint8)
            ids_i = ids.at[:, 0].set(salt % cfg.text.vocab_size)
            out = model.apply(variables, preproc(img_i), ids_i, mask, None,
                              method=MultiModalDiagnosisModel.classify)
            s = jnp.sum(out["probs"].astype(jnp.float32))
            return acc + s, (jnp.abs(s) * 1003.0).astype(jnp.int32) % 97

        acc, _ = lax.fori_loop(0, iters, body, (jnp.float32(0), jnp.int32(1)))
        return acc

    def make_bench_loop_turbo(text_int8: bool):
        # turbo = int8 image backbone + (by default) int8 text-tower matmuls
        turbo_model = model
        if text_int8:
            turbo_model = MultiModalDiagnosisModel(
                config=dataclasses.replace(
                    model_cfg,
                    text=dataclasses.replace(model_cfg.text, int8_matmuls=True),
                ),
                dtype=jnp.bfloat16,
            )

        @functools.partial(jax.jit, static_argnames=("iters",))
        def bench_loop_turbo(variables, qparams, images, ids, mask, iters: int):
            from mmdx_tpu.models.resnet_int8 import int8_backbone_apply
            from mmdx_tpu.ops.preprocess import preprocess_batch_device_gray

            # grayscale inputs ride the folded gray stem (no 1->3 broadcast,
            # no separate normalize pass) — same as the serving engine
            gray = images.shape[-1] == 1 and "stem_gray" in qparams

            def body(_, carry):
                acc, salt = carry
                img_i = images + (salt % 2).astype(jnp.uint8)
                ids_i = ids.at[:, 0].set(salt % cfg.text.vocab_size)
                if gray:
                    x = preprocess_batch_device_gray(
                        img_i, cfg.image.img_size, cfg.image.resize_size,
                        out_dtype=jnp.bfloat16,
                    )
                else:
                    x = preproc(img_i)
                feats = int8_backbone_apply(qparams, x)
                out = turbo_model.apply(
                    variables, feats, ids_i, mask, None,
                    method=MultiModalDiagnosisModel.classify_from_image_feats,
                )
                s = jnp.sum(out["probs"].astype(jnp.float32))
                return acc + s, (jnp.abs(s) * 1003.0).astype(jnp.int32) % 97

            acc, _ = lax.fori_loop(0, iters, body, (jnp.float32(0), jnp.int32(1)))
            return acc

        return bench_loop_turbo

    def measure(loop, *args, label=""):
        def timed(iters):
            t0 = time.perf_counter()
            float(loop(*args, iters=iters))
            return time.perf_counter() - t0

        t0 = time.perf_counter()
        timed(2)
        timed(12)
        log(f"[bench] {label} compile+warmup: {time.perf_counter() - t0:.1f}s")
        best = None
        for _ in range(3):
            dt_lo, dt_hi = timed(2), timed(12)
            per_iter = (dt_hi - dt_lo) / 10
            best = per_iter if best is None else min(best, per_iter)
            log(f"[bench] {label} 2 iters: {dt_lo:.3f}s, 12 iters: {dt_hi:.3f}s "
                f"-> {per_iter * 1e3:.2f} ms/batch")
        return best

    # ---- bf16 classification (the exact tower) ----
    per_bf16 = measure(bench_loop_bf16, variables, images, ids, mask,
                       label="bf16")
    bf16_rate = batch / per_bf16
    log(f"[bench] bf16 classify: {per_bf16 * 1e3:.2f} ms/batch of {batch} "
        f"-> {bf16_rate:.0f} inferences/s/chip")

    # ---- int8 turbo classification (headline) ----
    turbo_rate = None
    text_int8 = False
    if os.environ.get("MMDX_BENCH_TURBO", "1") != "0":
        try:
            from mmdx_tpu.models.resnet_int8 import (
                calibrate_backbone, quantize_backbone,
            )

            x_calib = jax.jit(lambda i: preproc(i, jnp.float32))(images[:32])
            scales = calibrate_backbone(variables, x_calib)
            qparams = jax.jit(
                lambda v: quantize_backbone(
                    v, scales, cfg.image.bn_eps, mean=cfg.image.mean,
                    std=cfg.image.std, img_size=cfg.image.img_size,
                )
            )(variables)
            text_int8 = os.environ.get("MMDX_BENCH_TEXT_INT8", "1") != "0"
            try:
                per_turbo = measure(
                    make_bench_loop_turbo(text_int8), variables, qparams,
                    images, ids, mask, label="turbo")
            except Exception as e:  # noqa: BLE001
                if not text_int8:
                    raise
                log(f"[bench] int8 text tower failed ({type(e).__name__}: "
                    f"{e}); turbo falls back to bf16 text")
                text_int8 = False
                per_turbo = measure(
                    make_bench_loop_turbo(False), variables, qparams,
                    images, ids, mask, label="turbo")
            turbo_rate = batch / per_turbo
            log(f"[bench] turbo classify: {per_turbo * 1e3:.2f} ms/batch "
                f"-> {turbo_rate:.0f} inferences/s/chip "
                f"({turbo_rate / bf16_rate:.2f}x bf16)")
        except Exception as e:  # noqa: BLE001
            log(f"[bench] turbo path failed ({type(e).__name__}: {e}); "
                f"headline falls back to bf16")

    headline = turbo_rate or bf16_rate
    tower = "bf16"
    if turbo_rate:
        tower = "int8-turbo(img+text)" if text_int8 else "int8-turbo(img)"

    # ---- report generation: the reference's dominant hot loop (beam-4,
    # 150-180 tokens, inference_pipeline.py:190). MMDX_BENCH_GEN=0 skips. ----
    gen_stats = {}
    e2e = None
    if os.environ.get("MMDX_BENCH_GEN", "1") != "0":
        rng_g = np.random.default_rng(1)
        # Beam-4 batch ceiling (measured round 5, fixed-180 on-chip): B=64 is
        # optimal — 226.3 reports/s at B=64 vs 218.7 at B=128 vs 202.5 at
        # B=256; per-step cost grows linearly past N=512 flat rows (3.25 ->
        # 7.02 ms/step for N=512 -> 1024), i.e. the chip is compute-saturated
        # at N=512 (the round-4 trace shows 100% busy there), so more batch
        # only adds latency. gen_max_batch stays 64 for beam. (With round
        # 5's chunked-step-logits relayout fix, B=64 fixed-steps measures
        # 239.8 reports/s.)
        gb = int(os.environ.get("MMDX_BENCH_GEN_BATCH", "64"))
        # greedy (N rows == B, 4x lighter) keeps scaling past the
        # beam-optimal batch (measured fixed-180: 569/890 at B=64/128, 806 at
        # B=256, 879 at B=512 — still +9% at 512) — report that tier too
        gb_max = int(os.environ.get("MMDX_BENCH_GEN_BATCH_MAX", "512"))

        def make_z(n):
            return (
                jnp.asarray(rng_g.standard_normal((n, cfg.fusion.d_img)),
                            jnp.float32),
                jnp.asarray(rng_g.standard_normal((n, cfg.fusion.d_txt)),
                            jnp.float32),
            )

        z_img, z_txt = make_z(gb)
        rates = {}

        def measure_gen(eng, name, greedy, zi=None, zt=None, n=None):
            zi = z_img if zi is None else zi
            zt = z_txt if zt is None else zt
            n = n or gb
            t0 = time.perf_counter()
            eng.generate_reports(zi, zt, greedy=greedy)
            log(f"[bench] {name} generate compile+first: "
                f"{time.perf_counter() - t0:.1f}s")
            best_gen = None
            # 4 reps: each call pays ~30 ms of fixed tunnel RPC with real
            # jitter; 2 reps left ±25% run-to-run swings in the gen numbers
            for _ in range(4):
                t0 = time.perf_counter()
                eng.generate_reports(zi, zt, greedy=greedy)
                dt = time.perf_counter() - t0
                best_gen = dt if best_gen is None else min(best_gen, dt)
            rates[name] = n / best_gen
            log(f"[bench] {name} 150-180tok generation: {rates[name]:.1f} "
                f"reports/s/chip ({best_gen / n * 1e3:.1f} ms/report "
                f"amortized at B={n})")

        try:
            for name, greedy in (("beam4", False), ("greedy", True)):
                measure_gen(engine, name, greedy)
        except Exception as e:  # noqa: BLE001
            # never lose the whole bench to a decode-path kernel failure:
            # peel the remaining non-default kernel (the fused cross-attn+FFN
            # half-step, beam-path default), then give up. (The streaming
            # lm_head already defaults OFF after the on-chip A/B.)
            log(f"[bench] generation failed ({type(e).__name__}: {e}); "
                f"retrying with MMDX_FUSED_CROSS_FFN=0")
            fallbacks = (
                {"MMDX_FUSED_CROSS_FFN": "0"},
            )
            for fb in fallbacks:
                try:
                    os.environ.update(fb)
                    engine_fb = InferenceEngine(bundle, mode="fast")
                    for name, greedy in (("beam4", False), ("greedy", True)):
                        measure_gen(engine_fb, name, greedy)
                    engine = engine_fb  # single-request p50 reuses it
                    break
                except Exception as e2:  # noqa: BLE001
                    log(f"[bench] generation fallback {fb} failed "
                        f"({type(e2).__name__}: {e2})")
                finally:
                    for k in fb:
                        os.environ.pop(k, None)
            else:
                log("[bench] all generation fallbacks failed; skipping gen")
        # high-batch greedy tier: its own try so a B=256-specific failure
        # (e.g. memory) can never invalidate the already-measured
        # beam4/greedy numbers via the kernel-peel fallback above
        if "greedy" in rates and gb_max > gb:
            try:
                zi_m, zt_m = make_z(gb_max)
                measure_gen(engine, "greedy_bmax", True,
                            zi=zi_m, zt=zt_m, n=gb_max)
            except Exception as e:  # noqa: BLE001
                log(f"[bench] greedy B={gb_max} tier failed "
                    f"({type(e).__name__}: {e}); keeping B={gb} numbers")
        # turbo generation: int8 beam KV cache (exact decode above stays the
        # headline gen number; this is the opt-in quantized tier, guardrail
        # in tests/test_kv_int8.py)
        if "beam4" in rates and os.environ.get("MMDX_BENCH_GEN_TURBO", "1") != "0":
            try:
                os.environ["MMDX_KV_INT8"] = "1"
                engine_t = InferenceEngine(bundle, mode="fast")
                t0 = time.perf_counter()
                engine_t.generate_reports(z_img, z_txt, greedy=False)
                log(f"[bench] beam4-int8kv compile+first: "
                    f"{time.perf_counter() - t0:.1f}s")
                best_gen = None
                for _ in range(4):
                    t0 = time.perf_counter()
                    engine_t.generate_reports(z_img, z_txt, greedy=False)
                    dt = time.perf_counter() - t0
                    best_gen = dt if best_gen is None else min(best_gen, dt)
                rates["beam4_int8kv"] = gb / best_gen
                log(f"[bench] beam4-int8kv generation: "
                    f"{rates['beam4_int8kv']:.1f} reports/s/chip")
                # greedy over the flat int8 cache (decode_step_beam at nb=1)
                measure_gen(engine_t, "greedy_int8kv", True)
            except Exception as e:  # noqa: BLE001
                log(f"[bench] int8-KV gen failed ({type(e).__name__}: {e})")
            finally:
                os.environ.pop("MMDX_KV_INT8", None)
        # warm single-request beam-4 report p50 (BASELINE.json's secondary
        # metric is p50 end-to-end request latency; the report decode is
        # ~96% of it — concurrent HTTP p50/p99 lives in bench_serving.py)
        single_p50 = None
        if os.environ.get("MMDX_BENCH_SINGLE", "1") != "0":
            try:
                z1_img, z1_txt = z_img[:1], z_txt[:1]
                engine.generate_reports(z1_img, z1_txt, greedy=False)  # warm
                lat = []
                for _ in range(5):
                    t0 = time.perf_counter()
                    engine.generate_reports(z1_img, z1_txt, greedy=False)
                    lat.append(time.perf_counter() - t0)
                lat.sort()
                single_p50 = round(lat[len(lat) // 2] * 1e3, 1)
                log(f"[bench] warm single-request beam-4 report p50: "
                    f"{single_p50} ms")
            except Exception as e:  # noqa: BLE001
                log(f"[bench] single-request latency failed "
                    f"({type(e).__name__}: {e})")
        # full round-trip: every sample classified AND given a beam-4 report
        if "beam4" in rates:
            e2e = 1.0 / (1.0 / headline + 1.0 / rates["beam4"])
            gen_stats = {
                **({"warm_single_beam4_report_p50_ms": single_p50}
                   if single_p50 is not None else {}),
                "beam4_reports_per_s_chip": round(rates["beam4"], 1),
                **({"greedy_reports_per_s_chip": round(rates["greedy"], 1)}
                   if "greedy" in rates else {}),
                **({"greedy_bmax_reports_per_s_chip":
                    round(rates["greedy_bmax"], 1),
                    "greedy_bmax_batch": gb_max}
                   if "greedy_bmax" in rates else {}),
                "beam4_gen_batch": gb,
                "e2e_classify_plus_beam4_report_per_s_chip": round(e2e, 1),
                **({"beam4_int8kv_reports_per_s_chip":
                    round(rates["beam4_int8kv"], 1)}
                   if "beam4_int8kv" in rates else {}),
                **({"greedy_int8kv_reports_per_s_chip":
                    round(rates["greedy_int8kv"], 1)}
                   if "greedy_int8kv" in rates else {}),
            }

    baseline = 5000.0  # BASELINE.json north-star target
    print(json.dumps({
        "metric": (
            f"multimodal classify inferences/s/chip ({tower} towers + "
            f"fusion head, on-device preproc, B={batch})"
        ),
        "value": round(headline, 1),
        "unit": "inferences/s/chip",
        "vs_baseline": round(headline / baseline, 3),
        "classify_bf16_per_s_chip": round(bf16_rate, 1),
        **({"classify_turbo_per_s_chip": round(turbo_rate, 1)}
           if turbo_rate else {}),
        **gen_stats,
    }))


if __name__ == "__main__":
    main()
