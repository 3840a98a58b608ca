#!/usr/bin/env python
"""Per-component device timing at serving shapes (real chip).

Breaks the batch-512 fused-classify budget into: on-device preprocessing,
ResNet stem, each ResNet stage, BERT tower (per pad bucket), and the fusion
head — so kernel work goes where the milliseconds are.

Methodology mirrors bench.py: each component is timed ON DEVICE inside one
jit (lax.fori_loop with a data dependency between iterations so XLA cannot
hoist or cache), two loop lengths differenced to cancel dispatch/RPC overhead.

Usage: python scripts/profile_components.py [batch]
"""
import functools
import sys
import time
from pathlib import Path
from typing import Any, Sequence

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def log(msg):
    print(msg, flush=True)


def main():
    import flax.linen as nn
    import jax
    import jax.lax as lax
    import jax.numpy as jnp
    import numpy as np

    from mmdx_tpu.checkpoints.bundle import new_random_bundle
    from mmdx_tpu.models.bert import TextEncoder
    from mmdx_tpu.models.resnet import RESNET50_STAGES, Bottleneck
    from mmdx_tpu.ops.preprocess import preprocess_batch_device

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    dt = jnp.bfloat16
    log(f"[profile] device: {jax.devices()[0].device_kind}, batch={batch}, bf16")

    bundle = new_random_bundle(seed=0)
    cfg = bundle.config
    import dataclasses

    text_cfg = dataclasses.replace(cfg.text, use_fused_ffn=True)

    # ---- truncated ResNet mirroring models/resnet.py param names ----
    class TruncatedResNet(nn.Module):
        upto: int  # 0 = stem only; k = stem + stages 1..k
        stage_sizes: Sequence[int] = RESNET50_STAGES
        dtype: Any = dt

        @nn.compact
        def __call__(self, x):
            x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                        use_bias=False, dtype=self.dtype, name="conv_stem")(x)
            x = nn.BatchNorm(use_running_average=True, dtype=self.dtype,
                             name="bn_stem")(x)
            x = nn.relu(x)
            x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                        constant_values=-jnp.inf)
            x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")
            for stage in range(self.upto):
                width = 64 * (2 ** stage)
                for block in range(self.stage_sizes[stage]):
                    stride = 2 if (stage > 0 and block == 0) else 1
                    x = Bottleneck(width=width, stride=stride,
                                   use_projection=(block == 0), dtype=self.dtype,
                                   name=f"layer{stage + 1}_block{block}")(x)
            return jnp.mean(x, axis=(1, 2))

    bb_params = bundle.variables["params"]["image_encoder"]["backbone"]
    bb_stats = bundle.variables["batch_stats"]["image_encoder"]["backbone"]
    txt_params = {"params": bundle.variables["params"]["text_encoder"]}

    rng = np.random.default_rng(0)
    imgs_u8 = jnp.asarray(rng.integers(0, 256, (batch, 512, 512, 1), np.uint8))
    x224 = jnp.asarray(rng.standard_normal((batch, 224, 224, 3)), dt)

    # ---- generic on-device timing loop ----
    # every call gets a FRESH salt argument: repeated dispatches with
    # identical args can replay from the tunnel's cache and report
    # impossible times (below the HBM roofline) — see NOTES.md
    _salt = iter(range(1, 1_000_000))

    def timed(fn, *args, reps=3, lo=2, hi=12):
        """fn(salt, *args) -> array; returns best per-iter seconds."""

        @functools.partial(jax.jit, static_argnames=("iters",))
        def loop(args, salt0, iters: int):
            def body(_, carry):
                acc, salt = carry
                y = fn(salt, *args)
                s = jnp.sum(y.astype(jnp.float32))
                return acc + s, (jnp.abs(s) * 1003.0).astype(jnp.int32) % 97

            acc, _ = lax.fori_loop(0, iters, body, (jnp.float32(0), salt0))
            return acc

        float(loop(args, jnp.int32(next(_salt)), lo))  # compile
        float(loop(args, jnp.int32(next(_salt)), hi))
        best = None
        for _ in range(reps):
            t0 = time.perf_counter(); float(loop(args, jnp.int32(next(_salt)), lo)); d_lo = time.perf_counter() - t0
            t0 = time.perf_counter(); float(loop(args, jnp.int32(next(_salt)), hi)); d_hi = time.perf_counter() - t0
            per = (d_hi - d_lo) / (hi - lo)
            best = per if best is None else min(best, per)
        return best

    import os

    only = os.environ.get("MMDX_PROFILE_ONLY", "").split(",") if \
        os.environ.get("MMDX_PROFILE_ONLY") else None

    def want(name):
        return only is None or name in only

    results = {}

    # preprocessing (512x512 u8 -> 224 bf16)
    def f_pre(salt, imgs):
        return preprocess_batch_device(
            imgs + (salt % 2).astype(jnp.uint8), cfg.image.img_size,
            cfg.image.resize_size, cfg.image.mean, cfg.image.std, out_dtype=dt)

    if want("preproc"):
        results["preproc 512->224"] = timed(f_pre, imgs_u8)
        log(f"[profile] preproc: {results['preproc 512->224'] * 1e3:.2f} ms")

    # ResNet cumulative stages
    prev = None
    for upto in range(0, 5) if want("resnet") else ():
        m = TruncatedResNet(upto=upto)
        # params subtree: stem + first `upto` stages exist in the full tree
        def f_res(salt, x, params=None, stats=None, m=m):
            xi = x + (salt % 2).astype(dt) * 1e-3
            return m.apply({"params": params, "batch_stats": stats}, xi)

        t = timed(f_res, x224, bb_params, bb_stats)
        name = "stem" if upto == 0 else f"stem+stages1-{upto}"
        delta = "" if prev is None else f"  (stage{upto}: {(t - prev) * 1e3:.2f} ms)"
        log(f"[profile] resnet {name}: {t * 1e3:.2f} ms{delta}")
        results[f"resnet_{name}"] = t
        prev = t

    # BERT tower at pad buckets
    tower = TextEncoder(config=text_cfg, dtype=dt)
    for seq in (32, 48, 96) if want("bert") else ():
        ids = jnp.asarray(rng.integers(0, cfg.text.vocab_size, (batch, seq)), jnp.int32)
        mask = jnp.ones((batch, seq), jnp.int32)

        def f_bert(salt, params, ids, mask):
            ids_i = ids.at[:, 0].set(salt % cfg.text.vocab_size)
            out = tower.apply(params, ids_i, mask, None,
                              method=TextEncoder.encode)
            return out

        t = timed(f_bert, txt_params, ids, mask)
        log(f"[profile] bert encode seq={seq}: {t * 1e3:.2f} ms")
        results[f"bert_{seq}"] = t

    # ---- full backbone with Pallas fused bottlenecks (stages 1-2) ----
    if want("resnetfused"):
        from mmdx_tpu.models.resnet import ResNet50

        for fw in (128, 256, 512):
            mfull = ResNet50(fuse_max_width=fw, dtype=dt)

            def f_fused(salt, x, params, stats, m=mfull):
                xi = x + (salt % 2).astype(dt) * 1e-3
                return m.apply({"params": params, "batch_stats": stats}, xi)

            t = timed(f_fused, x224, bb_params, bb_stats)
            log(f"[profile] resnet fused(width<={fw}) full: {t * 1e3:.2f} ms")

    # ---- BERT layer dissection: attention block vs FFN block at seq 32 ----
    if want("bertmicro"):
        h, nh, hd, f = (cfg.text.hidden_size, cfg.text.num_heads,
                        cfg.text.hidden_size // cfg.text.num_heads,
                        cfg.text.intermediate_size)
        seq = 32
        hidden = jnp.asarray(rng.standard_normal((batch, seq, h)) * 0.02, dt)
        wq, wk, wv, wo = (jnp.asarray(rng.standard_normal((h, h)) * 0.02, dt)
                          for _ in range(4))
        wqkv = jnp.concatenate([wq, wk, wv], axis=1)  # [h, 3h]
        mask_b = jnp.zeros((batch, 1, 1, seq), jnp.float32)
        ln_s = jnp.ones((h,), dt); ln_b = jnp.zeros((h,), dt)

        def split(x):
            b, l, _ = x.shape
            return x.reshape(b, l, nh, hd).transpose(0, 2, 1, 3)

        def finish_attn(x, q, k, v):
            scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                                preferred_element_type=jnp.float32)
            scores = scores / jnp.sqrt(jnp.asarray(hd, jnp.float32)) + mask_b
            probs = jax.nn.softmax(scores.astype(jnp.float32), -1).astype(dt)
            ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, v,
                             preferred_element_type=jnp.float32)
            b_, _, l_, _ = ctx.shape
            ctx = ctx.transpose(0, 2, 1, 3).reshape(b_, l_, h).astype(dt)
            out = ctx @ wo
            y = (x + out).astype(jnp.float32)
            mu = jnp.mean(y, -1, keepdims=True)
            var = jnp.mean(jnp.square(y - mu), -1, keepdims=True)
            return ((y - mu) * jax.lax.rsqrt(var + 1e-12)).astype(dt)

        def attn_now(salt, x, wq, wk, wv):
            x = x + (salt % 2).astype(dt) * 1e-3
            return finish_attn(x, split(x @ wq), split(x @ wk), split(x @ wv))

        def attn_qkv(salt, x, wqkv):
            x = x + (salt % 2).astype(dt) * 1e-3
            qkv = x @ wqkv
            q, k, v = jnp.split(qkv, 3, axis=-1)
            return finish_attn(x, split(q), split(k), split(v))

        def attn_notrans(salt, x, wqkv):
            """No explicit head transpose: einsum contracts on [B,L,h,d]."""
            x = x + (salt % 2).astype(dt) * 1e-3
            qkv = (x @ wqkv).reshape(batch, seq, 3, nh, hd)
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
            scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                                preferred_element_type=jnp.float32)
            scores = scores / jnp.sqrt(jnp.asarray(hd, jnp.float32)) + mask_b
            probs = jax.nn.softmax(scores.astype(jnp.float32), -1).astype(dt)
            ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v,
                             preferred_element_type=jnp.float32)
            ctx = ctx.reshape(batch, seq, h).astype(dt)
            out = ctx @ wo
            y = (x + out).astype(jnp.float32)
            mu = jnp.mean(y, -1, keepdims=True)
            var = jnp.mean(jnp.square(y - mu), -1, keepdims=True)
            return ((y - mu) * jax.lax.rsqrt(var + 1e-12)).astype(dt)

        for name, fn, args in (
            ("attn-current", attn_now, (hidden, wq, wk, wv)),
            ("attn-mergedqkv", attn_qkv, (hidden, wqkv)),
            ("attn-notranspose", attn_notrans, (hidden, wqkv)),
        ):
            t = timed(fn, *args)
            log(f"[profile] bert {name} (1 layer, seq=32): {t * 1e3:.3f} ms "
                f"(x12 = {t * 12e3:.1f} ms)")

        from mmdx_tpu.ops.pallas_ffn import fused_ffn_ln

        wi = jnp.asarray(rng.standard_normal((h, f)) * 0.02, dt)
        bi = jnp.zeros((f,), dt)
        wo2 = jnp.asarray(rng.standard_normal((f, h)) * 0.02, dt)
        bo2 = jnp.zeros((h,), dt)

        def ffn_fused(salt, x, wi, bi, wo2, bo2):
            x = (x + (salt % 2).astype(dt) * 1e-3).reshape(batch * seq, h)
            return fused_ffn_ln(x, wi, bi, wo2, bo2, ln_s, ln_b)

        def ffn_xla(salt, x, wi, bi, wo2, bo2):
            x = x + (salt % 2).astype(dt) * 1e-3
            y = jax.nn.gelu((x @ wi + bi).astype(jnp.float32),
                            approximate=False).astype(dt)
            y = y @ wo2 + bo2
            z = (x + y).astype(jnp.float32)
            mu = jnp.mean(z, -1, keepdims=True)
            var = jnp.mean(jnp.square(z - mu), -1, keepdims=True)
            return ((z - mu) * jax.lax.rsqrt(var + 1e-12)).astype(dt)

        for name, fn in (("ffn-fused", ffn_fused), ("ffn-xla", ffn_xla)):
            t = timed(fn, hidden, wi, bi, wo2, bo2)
            log(f"[profile] bert {name} (1 layer, seq=32): {t * 1e3:.3f} ms "
                f"(x12 = {t * 12e3:.1f} ms)")

    if only is None:
        total = (results["preproc 512->224"] + results["resnet_stem+stages1-4"]
                 + results["bert_48"])
        log(f"[profile] sum(preproc + resnet + bert@48) = {total * 1e3:.2f} ms "
            f"-> {batch / total:.0f} inf/s upper bound")


if __name__ == "__main__":
    main()
