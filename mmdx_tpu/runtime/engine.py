"""InferenceEngine: compiled, cached, batched execution of the flagship model.

This is the TPU-native replacement for the reference's per-request torch
``inference()`` path (reference ``backend/ml/pipelines/inference_pipeline.py:
151-206``).  Design:

  * every device program is built once per (batch, image-shape) and cached —
    first request compiles, the rest replay;
  * three precision modes: ``parity`` (fp32 end-to-end + host-exact PIL
    preprocessing — bit-compatible with the reference), ``fast`` (bfloat16
    towers, on-device fused preprocessing — the throughput mode), and
    ``turbo`` (fast + the int8 static-PTQ image backbone,
    models/resnet_int8 — opt-in, quantization-level output deltas);
  * classification and generation are separate programs, so the fused
    classifier's latency never pays for the autoregressive decode;
  * generation runs the jit beam-search loop over the KV-cached decoder.
"""
from __future__ import annotations

import functools
import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from mmdx_tpu.checkpoints.bundle import ModelBundle
from mmdx_tpu.config import GenerationConfig
from mmdx_tpu.decode.beam_search import beam_expand, beam_search, make_generation_kwargs
from mmdx_tpu.decode.greedy import greedy_decode
from mmdx_tpu.io.images import decode_image, decode_images, to_canonical_u8
from mmdx_tpu.models.diagnosis import MultiModalDiagnosisModel
from mmdx_tpu.ops.preprocess import preprocess_batch_device, preprocess_exact


def bucket_ladder(max_len: int) -> tuple[int, ...]:
    """Sequence-length buckets below ``max_len`` for fast-mode tokenization.

    Computed from the model config (not hardcoded) so a max_len change keeps
    proportional bucketing: 1/3, 1/2, 2/3 of max_len rounded up to a lane
    multiple of 8. max_len=96 (the reference's fixed pad length,
    training_pipeline.py:323) yields (32, 48, 64). Override with
    MMDX_TEXT_BUCKETS=comma-separated lengths.
    """
    import os

    raw = os.environ.get("MMDX_TEXT_BUCKETS", "")
    if raw:
        return tuple(sorted({
            int(x) for x in raw.split(",") if x.strip() and 0 < int(x) < max_len
        }))
    steps = {min(max_len, max(8, -(-int(max_len * f) // 8) * 8))
             for f in (1 / 3, 1 / 2, 2 / 3)}
    return tuple(s for s in sorted(steps) if s < max_len)


class InferenceEngine:
    def __init__(self, bundle: ModelBundle, mode: str = "parity",
                 canonical_size: int = 512, mesh=None):
        """mesh: optional jax.sharding.Mesh for multi-chip serving — weights
        replicate (with tp shards per parallel/sharding rules), batches shard
        over the "data" axis. None = single device."""
        assert mode in ("parity", "fast", "turbo")
        from mmdx_tpu.runtime.compile_cache import enable_compile_cache

        enable_compile_cache()  # warm restarts replay compiles from disk
        self.bundle = bundle
        self.mode = mode
        self.canonical_size = canonical_size
        self.mesh = mesh
        self.dtype = jnp.float32 if mode == "parity" else jnp.bfloat16
        # turbo = fast + the int8 image backbone (models/resnet_int8): static
        # PTQ, ~2x the HBM-bound tower. Opt-in because outputs differ from
        # bf16 at the quantization-noise level (guardrail:
        # tests/test_resnet_int8.py); scales come from
        # bundle.metadata["int8_scales"] or first-batch calibration.
        self._qparams = None
        model_config = bundle.config
        if mode in ("fast", "turbo") and jax.default_backend() == "tpu":
            # Pallas fused FFN+LN in the text tower (~10% tower speedup; bf16-
            # rounding-level output differences only), plus flash attention for
            # sequences >= flash_min_seq_len (the bucketed 32-96 serving
            # lengths stay on the fused-einsum path, which wins there). Parity
            # mode stays on the op-by-op XLA path; CPU (tests) has no
            # compiled-Pallas support.
            import dataclasses

            model_config = dataclasses.replace(
                model_config,
                text=dataclasses.replace(
                    model_config.text, use_fused_ffn=True,
                    use_flash_attention=True,
                    use_fused_attn_block=True,
                    # int8 W8A8 matmuls in the fused text-tower kernels
                    # (turbo tier; quantization-noise deltas bounded in
                    # tests/test_int8_text.py). MMDX_TEXT_INT8=1/0 overrides.
                    int8_matmuls=(
                        os.environ.get("MMDX_TEXT_INT8", "") == "1"
                        or (mode == "turbo"
                            and os.environ.get("MMDX_TEXT_INT8", "") != "0")
                    ),
                ),
                image=dataclasses.replace(
                    model_config.image, use_folded_bn=True,
                ),
                # NOT use_fused_bottleneck: the Pallas fused bottleneck
                # compiles (raised scoped-vmem) but measures ~17% SLOWER than
                # XLA's convs at B=512 (46.8 vs 39.9 ms full tower) — the 9
                # serialized sublane-roll taps are VPU-bound while XLA's
                # implicit-GEMM convs pipeline on the MXU. Kernel + parity
                # tests kept as a documented negative result.
                report=dataclasses.replace(
                    model_config.report, use_fused_beam_attn=True,
                    # fused cross-attn+FFN decoder half-step (ops/
                    # pallas_t5_step): MMDX_FUSED_CROSS_FFN=0 reverts —
                    # escape hatch for a kernel that postdates the last
                    # on-chip run (bench.py's gen fallback uses it)
                    use_fused_cross_ffn=(
                        os.environ.get("MMDX_FUSED_CROSS_FFN", "1") != "0"
                    ),
                    # streaming lm_head+selection (ops/pallas_lm_head):
                    # measured NET LOSS on v5e-1 at production sizes
                    # (same-process A/B, 3 salted reps: beam-4 209.4 vs
                    # 216.9 dense, greedy 522.2 vs 528.0) — XLA's fusions
                    # over the dense bf16 logit chain already avoid the
                    # round-trips the kernel was built to save. Default OFF;
                    # MMDX_FUSED_LM_HEAD=1 opts in (kernel + parity tests
                    # retained)
                    use_fused_lm_head=(
                        os.environ.get("MMDX_FUSED_LM_HEAD", "") == "1"
                    ),
                    # producer-chunked [N, V/128, 128] decode-step logits:
                    # kills a no-op XLA relayout round trip (~98 us/step)
                    # in the beam candidate chain (see config.py). Greedy
                    # gets a flat-logits model variant below.
                    chunked_step_logits=(
                        os.environ.get("MMDX_CHUNKED_LOGITS", "1") != "0"
                    ),
                    # deferred KV-cache writes (beam): own token composes
                    # outside the attention kernel so the 6 per-layer cache
                    # updates leave the critical path (see config.py).
                    deferred_kv_writes=(
                        os.environ.get("MMDX_DEFER_KV", "1") != "0"
                    ),
                    # bf16 chunked step logits: halves the candidate chain's
                    # [N, V] materialization traffic; selection noise is
                    # in-tier for bf16-tower modes (see config.py)
                    step_logits_bf16=(
                        os.environ.get("MMDX_LOGITS_BF16", "1") != "0"
                    ),
                ),
            )
        if mode in ("fast", "turbo"):
            # int8 KV cache (beam + flat greedy): halves the decode loop's
            # dominant HBM stream in BYTES, but measured on v5e-1 it is a net
            # LOSS in time at production cache sizes (beam-4 216.5 vs 223.7
            # reports/s, greedy 520 vs 543 — quantize-on-write + scale
            # plumbing outweigh the read saving when the whole cache already
            # fits VMEM per program). Default OFF everywhere; MMDX_KV_INT8=1
            # opts in (it remains the right lever when cache *capacity* is
            # the constraint: 2x longer reports / 2x gen batch per HBM byte).
            # Outputs differ at quantization-noise level (tests/
            # test_kv_int8.py). Backend-agnostic: quantize-on-write is pure
            # JAX and the non-TPU read uses the XLA int8 fallback, so CPU
            # tests exercise the whole turbo decode program.
            import dataclasses

            model_config = dataclasses.replace(
                model_config,
                report=dataclasses.replace(
                    model_config.report,
                    kv_cache_int8=os.environ.get("MMDX_KV_INT8", "") == "1",
                ),
            )
        self.model_config = model_config
        self.model = MultiModalDiagnosisModel(config=model_config, dtype=self.dtype)
        if mesh is not None:
            from mmdx_tpu.parallel.sharding import shard_variables

            self.variables = shard_variables(bundle.variables, mesh)
        else:
            self.variables = bundle.variables
        self.bert_tok, self.t5_tok = bundle.tokenizers()
        self.thresholds = np.asarray(bundle.thresholds, np.float32)
        self._classify_cache: dict[Any, Any] = {}
        self._generate_cache: dict[Any, Any] = {}
        # fast mode feeds raw (H, W) straight to jit (exact resize geometry per
        # shape); cap how many distinct raw shapes may each compile a program
        # before falling back to host canonicalization, so a heterogeneous
        # archive can't degrade to compile-per-request.
        self.max_raw_shapes = int(
            __import__("os").environ.get("MMDX_MAX_RAW_SHAPES", "4")
        )
        self._raw_shapes_seen: set[tuple] = set()

    def _shard_inputs(self, *arrays):
        """Place batch arrays on the mesh (leading axis over "data"),
        padding the batch up to a multiple of the dp degree so any batch size
        works on any mesh. Returns (arrays, true_batch)."""
        n = int(arrays[0].shape[0])
        if self.mesh is None:
            return arrays, n
        from mmdx_tpu.parallel.sharding import shard_batch

        dp = self.mesh.shape.get("data", 1)
        pad = (-n) % dp
        if pad:
            arrays = tuple(
                np.concatenate([a, np.repeat(np.asarray(a[:1]), pad, axis=0)])
                for a in arrays
            )
        return tuple(shard_batch(list(arrays), self.mesh)), n

    # ------------------------------------------------------------------
    # host-side input prep
    # ------------------------------------------------------------------
    def prep_images(self, images) -> np.ndarray:
        """list of (bytes|PIL|ndarray) -> model-ready batch.

        parity: host-exact preprocessing -> [B, S, S, 3] float32
        fast:   canonical uint8 -> [B, C, C, ch] (preprocessing runs on device)
        """
        cfg = self.bundle.config.image
        arrays = decode_images(images)
        if self.mode == "parity":
            return np.stack([
                preprocess_exact(a, cfg.img_size, cfg.resize_size, cfg.mean, cfg.std)
                for a in arrays
            ])
        # fast mode: when the batch shares one raw shape (the common case —
        # medical archives are uniform), feed it directly: the fused resize+crop
        # matrices are built per shape, preserving the reference's exact
        # shorter-side-256 + center-crop geometry. Mixed shapes — or more than
        # max_raw_shapes distinct shapes over the engine's lifetime (bounding
        # the compiled-program count) — fall back to a square host
        # canonicalization.
        shapes = {a.shape[:2] for a in arrays}
        direct = False
        if len(shapes) == 1:
            shape = next(iter(shapes))
            if shape in self._raw_shapes_seen:
                direct = True
            elif len(self._raw_shapes_seen) < self.max_raw_shapes:
                self._raw_shapes_seen.add(shape)
                direct = True
        if direct:
            canon = [a[:, :, None] if a.ndim == 2 else a for a in arrays]
        else:
            canon = [to_canonical_u8(a, self.canonical_size) for a in arrays]
        ch = max(c.shape[-1] for c in canon)
        if ch == 3:
            canon = [np.repeat(c, 3, -1) if c.shape[-1] == 1 else c for c in canon]
        return np.stack(canon)

    def prep_texts(self, texts: list[str],
                   fixed_len: bool = False) -> dict[str, np.ndarray]:
        """Tokenize to the model's max_len (reference semantics) in parity mode.

        Fast mode buckets the pad length to the smallest of {32, 48, 64, ...}
        covering the batch's longest sequence: BERT outputs are exactly
        invariant to trailing pad tokens (they are masked out of attention and
        of the mean pool), so this is a pure speedup — FFN/QKV FLOPs scale
        with the padded length the reference always fixes at 96.

        ``fixed_len=True`` disables bucketing (always max_len): bucketed
        SERVING must hold every program shape constant — one long
        patient-details string moving the bucket 32->48 mid-traffic would
        compile a novel program (multi-minute remote compile). The extra
        text-tower FLOPs are ~1-2 ms at serving batch sizes.
        """
        max_len = self.bundle.config.text.max_len
        if self.mode in ("fast", "turbo") and not fixed_len:
            enc = self.bert_tok.encode_batch(texts, max_len=max_len)
            longest = int(enc["attention_mask"].sum(axis=1).max(initial=1))
            for bucket in bucket_ladder(max_len):
                if bucket >= longest:
                    return {k: v[:, :bucket] for k, v in enc.items()}
            return enc
        return self.bert_tok.encode_batch(texts, max_len=max_len)

    # ------------------------------------------------------------------
    # compiled programs
    # ------------------------------------------------------------------
    def _classify_fn(self, image_shape: tuple):
        key = ("classify", image_shape)
        if key not in self._classify_cache:
            model = self.model
            cfg = self.bundle.config.image
            on_device_preproc = self.mode in ("fast", "turbo") and len(image_shape) == 4

            precision = "highest" if self.mode == "parity" else "default"
            use_int8 = self.mode == "turbo"

            @jax.jit
            def run(variables, qparams, images, ids, mask, tt):
                # parity mode forces true-fp32 matmuls (TPU otherwise uses
                # bf16-multipass for f32 dots)
                with jax.default_matmul_precision(precision):
                    gray_turbo = (
                        use_int8 and on_device_preproc
                        and image_shape[-1] == 1
                    )
                    if gray_turbo:
                        # 1-channel turbo: centered raw gray + the folded
                        # grayscale stem (resnet_int8._gray_stem) — skips the
                        # 1->3 broadcast/normalize the 3-channel path pays
                        from mmdx_tpu.ops.preprocess import (
                            preprocess_batch_device_gray,
                        )

                        x = preprocess_batch_device_gray(
                            images, cfg.img_size, cfg.resize_size,
                            out_dtype=model.dtype,
                        )
                    elif on_device_preproc:
                        x = preprocess_batch_device(
                            images, cfg.img_size, cfg.resize_size, cfg.mean, cfg.std,
                            out_dtype=model.dtype,
                        )
                    else:
                        x = images
                    if use_int8:
                        from mmdx_tpu.models.resnet_int8 import int8_backbone_apply

                        feats = int8_backbone_apply(qparams, x)
                        out = model.apply(
                            variables, feats, ids, mask, tt,
                            method=MultiModalDiagnosisModel.classify_from_image_feats,
                        )
                    else:
                        out = model.apply(variables, x, ids, mask, tt,
                                          method=MultiModalDiagnosisModel.classify)
                    return out["probs"], out["z_img"], out["z_txt"]

            self._classify_cache[key] = run
        return self._classify_cache[key]

    def _ensure_qparams(self, images):
        """Int8 tower qparams, built once per engine (turbo mode only).

        Activation scales come from ``bundle.metadata["int8_scales"]`` when
        the bundle was calibrated offline (scripts/calibrate_int8.py);
        otherwise the FIRST batch calibrates in place (one extra pass of the
        folded f32 tower).
        """
        if self._qparams is None:
            from mmdx_tpu.models import resnet_int8 as ri

            cfg = self.bundle.config.image
            scales = (self.bundle.metadata or {}).get("int8_scales")
            if scales and set(ri.calibration_sites()) - set(scales):
                # bundle calibrated under an older site schema (e.g. before
                # the downsample-shortcut requant points): recalibrate
                scales = None
            if not scales:
                import sys

                print(
                    "[mmdx] turbo: no persisted int8_scales in the bundle — "
                    "calibrating from the first batch "
                    f"({len(images)} image(s)); for production scales run "
                    "scripts/calibrate_int8.py on representative studies",
                    file=sys.stderr, flush=True,
                )
                imgs = jnp.asarray(images)
                if imgs.dtype == jnp.uint8:
                    imgs = jax.jit(lambda i: preprocess_batch_device(
                        i, cfg.img_size, cfg.resize_size, cfg.mean, cfg.std,
                        out_dtype=jnp.float32,
                    ))(imgs)
                scales = ri.calibrate_backbone(self.variables, imgs)
            self._qparams = jax.jit(
                lambda v: ri.quantize_backbone(
                    v, scales, cfg.bn_eps,
                    mean=cfg.mean, std=cfg.std, img_size=cfg.img_size,
                )
            )(self.variables)
        return self._qparams

    def _generate_fn(self, gen: GenerationConfig, greedy: bool):
        kw = make_generation_kwargs(gen)
        lmax = 1 + gen.max_new_tokens
        # segmented decode: grow the KV buffers in stages so early steps read
        # a fraction of the full cache (output-invariant; perf knob only)
        # default swept on-chip: 5 stages beat 2 (176.6 vs 169.3 reports/s
        # beam-4 at B=64); finer stages trade compile count for average-K
        raw = __import__("os").environ.get(
            "MMDX_DECODE_SEGMENTS", "32,64,96,128,160"
        )
        seg_caps = tuple(sorted({
            int(x) for x in raw.split(",") if x.strip() and 0 < int(x) < lmax
        })) if raw else ()
        # int8-KV greedy (turbo tier): run greedy over the FLAT physical
        # cache as a 1-beam ancestry decode — same decode_step_beam /
        # Pallas-read machinery as beam search (ancestry trivially slot 0,
        # the causal bias masks future keys), halving greedy's dominant
        # per-step HBM stream. MMDX_GREEDY_FLAT=0 reverts to the heads-major
        # bf16 cache.
        flat_greedy = (
            greedy and self.model_config.report.kv_cache_int8
            and __import__("os").environ.get("MMDX_GREEDY_FLAT", "1") != "0"
        )
        key = ("generate", tuple(sorted(kw.items())), greedy, seg_caps,
               flat_greedy)
        if key not in self._generate_cache:
            model = self.model
            rep_over = {}
            if (greedy and self.model_config.report.use_fused_cross_ffn
                    and os.environ.get("MMDX_FUSED_CROSS_FFN", "") != "1"):
                # fixed-length on-chip A/B: the fused cross-attn+FFN decoder
                # half-step WINS at beam row counts (N=256: 215.8 vs 202.1
                # reports/s) but LOSES at greedy's N=64 (509.8 vs 537.3) —
                # kernel block overhead outweighs the fusion below ~128
                # rows. Greedy decodes unfused unless MMDX_FUSED_CROSS_FFN=1
                # forces the kernel everywhere. Same param tree either way
                # (the kernel is a compute-path change only).
                rep_over["use_fused_cross_ffn"] = False
            # (chunked_step_logits stays ON for greedy too: its decode loop
            # consumes [N, C, 128] logits via chunked ban + masked chunk
            # max/argmax — same relayout-free selection as the beam path)
            if greedy and self.model_config.report.deferred_kv_writes:
                # deferred writes are a measured LOSS for greedy (316 vs
                # 432.8 reports/s fixed-180 at B=64: the appended own-score
                # column breaks XLA's fused attend chain), while beam's
                # Pallas-partial variant wins (+6.1%) — beam only
                rep_over["deferred_kv_writes"] = False
            if rep_over:
                import dataclasses

                model = MultiModalDiagnosisModel(
                    config=dataclasses.replace(
                        self.model_config,
                        report=dataclasses.replace(
                            self.model_config.report, **rep_over,
                        ),
                    ),
                    dtype=self.dtype,
                )
            rep = self.bundle.config.report
            fusion_method = MultiModalDiagnosisModel.prepare_generation
            # parity mode forces true-fp32 dots in the decode program too
            # (TPU default computes f32 matmuls in bf16 — the one-hot
            # gather/ngram einsums are id-exact either way via their explicit
            # Precision.HIGHEST, but the model math should match _classify_fn)
            precision = "highest" if self.mode == "parity" else "default"

            def _run(variables, z_img, z_txt, batch: int):
                nb = 1 if greedy else gen.num_beams
                zi = beam_expand(z_img, nb) if nb > 1 else z_img
                zt = beam_expand(z_txt, nb) if nb > 1 else z_txt
                prep = model.apply(variables, zi, zt, lmax,
                                   (1 if flat_greedy else None) if greedy
                                   else gen.num_beams,
                                   method=fusion_method)
                # loop constants (cross-attn KV, shared bias, enc mask) are
                # closed over — only the self-attn KV buffers ride the
                # beam-reordered carried cache.
                static_kv = prep["static_kv"]
                self_bias, enc_mask = prep["self_bias"], prep["enc_mask"]

                cache = prep["cache"]
                if greedy:
                    if flat_greedy:
                        anc0 = jnp.zeros((batch, 1, lmax), jnp.int32)

                        def step_fn(tokens, pos, layers):
                            return model.apply(
                                variables, tokens, pos, layers, anc0,
                                static_kv, self_bias, enc_mask,
                                method=MultiModalDiagnosisModel.decode_step_beam,
                            )
                    else:
                        def step_fn(tokens, pos, layers):
                            return model.apply(
                                variables, tokens, pos, layers, static_kv, self_bias,
                                enc_mask, method=MultiModalDiagnosisModel.decode_step,
                            )

                    return greedy_decode(
                        step_fn, cache, batch=batch, vocab_size=rep.vocab_size,
                        max_new_tokens=gen.max_new_tokens,
                        min_new_tokens=gen.min_new_tokens,
                        no_repeat_ngram_size=gen.no_repeat_ngram_size,
                        eos_token_id=gen.eos_token_id, pad_token_id=gen.pad_token_id,
                        decoder_start_token_id=gen.decoder_start_token_id,
                        segment_caps=seg_caps,
                    )

                # ancestry mode: the KV cache is never beam-reordered (the
                # while-loop carry stays aliased in place); attention resolves
                # beam histories through the tiny anc index instead.
                def beam_step_fn(tokens, pos, layers, anc):
                    return model.apply(
                        variables, tokens, pos, layers, anc, static_kv,
                        self_bias, enc_mask,
                        method=MultiModalDiagnosisModel.decode_step_beam,
                    )

                seqs, _ = beam_search(
                    beam_step_fn, cache, batch=batch, vocab_size=rep.vocab_size,
                    cache_mode="ancestry", segment_caps=seg_caps, **kw,
                )
                return seqs

            @functools.partial(jax.jit, static_argnames=("batch",))
            def run(variables, z_img, z_txt, batch: int):
                with jax.default_matmul_precision(precision):
                    return _run(variables, z_img, z_txt, batch)

            self._generate_cache[key] = run
        return self._generate_cache[key]

    def _tower_fn(self, which: str, shape_key):
        key = (which, shape_key)
        if key not in self._classify_cache:
            model = self.model
            cfg = self.bundle.config.image
            on_device_preproc = self.mode in ("fast", "turbo")

            if which == "image":
                from mmdx_tpu.models.resnet import ImageEncoder

                tower = ImageEncoder(config=cfg, dtype=model.dtype)

                @jax.jit
                def run(variables, images):
                    x = (
                        preprocess_batch_device(
                            images, cfg.img_size, cfg.resize_size, cfg.mean,
                            cfg.std, out_dtype=model.dtype,
                        )
                        if on_device_preproc and images.dtype == jnp.uint8
                        else images
                    )
                    out = tower.apply(
                        {
                            "params": variables["params"]["image_encoder"],
                            "batch_stats": variables["batch_stats"]["image_encoder"],
                        },
                        x, train=False,
                    )
                    return jax.nn.sigmoid(out["logits"].astype(jnp.float32))
            else:
                from mmdx_tpu.models.bert import TextEncoder

                tower = TextEncoder(config=self.model_config.text, dtype=model.dtype)

                @jax.jit
                def run(variables, ids, mask, tt):
                    out = tower.apply(
                        {"params": variables["params"]["text_encoder"]}, ids, mask, tt
                    )
                    return jax.nn.sigmoid(out["logits"].astype(jnp.float32))

            self._classify_cache[key] = run
        return self._classify_cache[key]

    # ------------------------------------------------------------------
    # public API
    # ------------------------------------------------------------------
    def classify_image_batch(self, images) -> np.ndarray:
        """Single-modality: image -> warm-up classifier probs [B, 13]
        (BASELINE config 1: image-only CNN classification)."""
        imgs = self.prep_images(images)
        fn = self._tower_fn("image", tuple(imgs.shape))
        return np.asarray(fn(self.variables, imgs), np.float32)

    def classify_text_batch(self, texts: list[str]) -> np.ndarray:
        """Single-modality: free-text -> warm-up classifier probs [B, 13]
        (BASELINE config 2: report-only text classification)."""
        tok = self.prep_texts(texts)
        fn = self._tower_fn("text", tok["input_ids"].shape[1])
        return np.asarray(
            fn(self.variables, tok["input_ids"], tok["attention_mask"],
               tok["token_type_ids"]),
            np.float32,
        )

    def classify_batch(self, images, texts: list[str], pad_to: int | None = None,
                       host_outputs: bool = False):
        """-> (probs [B,13] np.float32, z_img, z_txt).

        ``pad_to``: pad the STACKED batch to this size (repeat last row) so
        bucketed serving reuses one compiled program per bucket; outputs are
        sliced back to the true batch. Padding here (after decode/tokenize)
        keeps the serving stage from re-decoding pad images per call.

        ``host_outputs``: fetch z_img/z_txt to host (one ``device_get``) and
        slice in numpy. The serving batcher REQUIRES this: device-resident z
        makes every downstream slice/concat/pad an eager device op whose
        shape varies with the live batch mix, and each novel shape is a
        fresh (multi-second, remote) compile — measured as recurring ~15 s
        p99 waves under 32-client load. A ~100 KB d2h per batch is noise
        next to that, and it pipelines with the generate stage.
        """
        imgs = self.prep_images(images)
        # bucketed callers (pad_to) get FIXED-length tokenization: the whole
        # point of the bucket ladder is a closed, boot-warmed program set,
        # and a batch-longest text bucket would reopen it per traffic mix
        tok = self.prep_texts(texts, fixed_len=pad_to is not None)
        n0 = int(imgs.shape[0])
        ids, mask, tt = (tok["input_ids"], tok["attention_mask"],
                         tok["token_type_ids"])
        if pad_to is not None and pad_to > n0:
            k = pad_to - n0

            def _pad(a):
                return np.concatenate([a, np.repeat(a[-1:], k, axis=0)])

            imgs, ids, mask, tt = _pad(imgs), _pad(ids), _pad(mask), _pad(tt)
        (imgs, ids, mask, tt), _ = self._shard_inputs(imgs, ids, mask, tt)
        qp = self._ensure_qparams(imgs) if self.mode == "turbo" else None
        fn = self._classify_fn(tuple(imgs.shape))
        probs, z_img, z_txt = fn(self.variables, qp, imgs, ids, mask, tt)
        if host_outputs:
            probs, z_img, z_txt = jax.device_get((probs, z_img, z_txt))
            z_img, z_txt = np.asarray(z_img), np.asarray(z_txt)
        return np.asarray(probs, np.float32)[:n0], z_img[:n0], z_txt[:n0]

    def generate_report_ids(self, z_img, z_txt,
                            gen: GenerationConfig | None = None,
                            greedy: bool = False) -> np.ndarray:
        """Decode report token ids [B, 1+max_new_tokens] (HF ``generate``
        sequence layout: leading decoder_start, pad/eos fill past finish)."""
        gen = gen or self.bundle.config.generation
        n = int(z_img.shape[0])
        if self.mesh is not None:
            # dp-sharded decode: the whole beam/greedy while_loop state leads
            # with the batch axis, so sharding the conditioning embeddings
            # over "data" shards the entire loop (weights replicated/tp per
            # the rules; XLA inserts no cross-batch collectives).
            (z_img, z_txt), n = self._shard_inputs(
                np.asarray(z_img), np.asarray(z_txt)
            )
        batch = int(z_img.shape[0])
        run = self._generate_fn(gen, greedy)
        return np.asarray(run(self.variables, z_img, z_txt, batch))[:n]

    def generate_reports(self, z_img, z_txt, gen: GenerationConfig | None = None,
                         greedy: bool = False) -> list[str]:
        seqs = self.generate_report_ids(z_img, z_txt, gen, greedy=greedy)
        return self.t5_tok.batch_decode(seqs, skip_special_tokens=True)

    def infer(self, image, patient_details: str, gen_kwargs: dict | None = None,
              generate: bool = True, greedy: bool = False) -> dict:
        """Single-sample inference with the reference's output contract
        (inference_pipeline.py:199-206). ``greedy=True`` swaps beam search for
        the ~15x-faster greedy decode."""
        gen = self.bundle.config.generation
        if gen_kwargs:
            import dataclasses

            gen = dataclasses.replace(gen, **gen_kwargs)
        probs, z_img, z_txt = self.classify_batch([image], [patient_details])
        report = ""
        if generate:
            report = self.generate_reports(z_img, z_txt, gen, greedy=greedy)[0]
        return self.result_dict(probs[0], report)

    def result_dict(self, probs_row, report_text: str) -> dict:
        """The reference inference() output contract for ONE sample
        (inference_pipeline.py:199-206) — the single place it is built
        (engine.infer, the serving MicroBatcher, and the offline
        batch-inference CLI all return exactly this)."""
        return {
            "report_text": report_text,
            "disease_probs": {
                name: float(probs_row[j])
                for j, name in enumerate(self.bundle.class_names)
            },
            "disease_vector": (
                probs_row >= self.thresholds
            ).astype(int).tolist(),
            "model_version": self.bundle.version,
        }
