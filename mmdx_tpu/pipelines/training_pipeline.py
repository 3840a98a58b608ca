"""Training pipeline: two-phase tower fine-tuning + frozen-embedding fusion
training, functional optax edition.

Rebuilds the reference training flow (reference ``backend/ml/pipelines/
training_pipeline.py:808-1127``) the TPU-native way:

  torch semantics                         -> functional equivalent
  ------------------------------------------------------------------
  requires_grad=False freeze (:200-213)   -> optax.multi_transform with
                                             set_to_zero() on frozen labels,
                                             frozen module applied OUTSIDE the
                                             grad (stop-gradient by construction)
  backbone.eval() BN lock (:206)          -> apply with train=False (running
                                             stats, no stat updates)
  per-group discriminative LRs (:238-269) -> one adamw per label group
  clip_grad_norm_(1.0) (:1058)            -> optax.clip_by_global_norm(1.0)
  BCE + 1.0 * T5-CE joint loss (:1053)    -> pipelines.losses.fusion_loss
  fusion trains on frozen precomputed
  embeddings (:996-1009)                  -> identical: encoders run once in
                                             eval, the 300-step loop compiles
                                             to a single jitted step over
                                             [B, d_img]/[B, d_txt]

AdamW hyperparameters match torch defaults (b1=0.9, b2=0.999, eps=1e-8) with
weight decay applied to every parameter in the group, as the reference does.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from flax import struct

from mmdx_tpu.checkpoints.bundle import ModelBundle, assemble_variables
from mmdx_tpu.models.bert import TextEncoder
from mmdx_tpu.models.fusion import FusionModel
from mmdx_tpu.models.resnet import ImageEncoder
from mmdx_tpu.pipelines.losses import bce_with_logits, fusion_loss


def _adamw(lr: float, weight_decay: float = 1e-2) -> optax.GradientTransformation:
    """torch.optim.AdamW-equivalent (decays every param, torch defaults)."""
    return optax.adamw(lr, b1=0.9, b2=0.999, eps=1e-8, weight_decay=weight_decay)


def _label_tree(params, top_level_to_label: Callable[[str], str]):
    return jax.tree_util.tree_map_with_path(
        lambda path, _: top_level_to_label(path[0].key), params
    )


def build_encoder_optimizer(
    params, backbone_key: str, phase: int, lr_backbone: float = 1e-4,
    lr_head: float = 5e-4, weight_decay: float = 1e-2, clip_norm: float | None = None,
) -> optax.GradientTransformation:
    """Reference build_optimizer semantics for either tower (:238-269, :408-432):
    phase 1 trains heads only; phase 2 adds the backbone at a smaller LR."""
    backbone_tx = (
        optax.set_to_zero() if phase == 1 else _adamw(lr_backbone, weight_decay)
    )
    tx = optax.multi_transform(
        {"backbone": backbone_tx, "head": _adamw(lr_head, weight_decay)},
        _label_tree(params, lambda k: "backbone" if k == backbone_key else "head"),
    )
    if clip_norm:
        tx = optax.chain(optax.clip_by_global_norm(clip_norm), tx)
    return tx


def build_fusion_optimizer(
    params, lr_heads: float = 5e-4, lr_t5: float = 2e-5,
    weight_decay: float = 1e-2, clip_norm: float = 1.0,
) -> optax.GradientTransformation:
    """Reference fusion param groups (:1018-1023) + global-norm clip (:1058)."""
    tx = optax.multi_transform(
        {"t5": _adamw(lr_t5, weight_decay), "heads": _adamw(lr_heads, weight_decay)},
        _label_tree(params, lambda k: "t5" if k == "report_model" else "heads"),
    )
    return optax.chain(optax.clip_by_global_norm(clip_norm), tx)


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    batch_stats: Any = None

    @classmethod
    def create(cls, params, tx, batch_stats=None):
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=tx.init(params),
            batch_stats=batch_stats,
        )


# ---------------------------------------------------------------------------
# Image tower (ImageEncoderCNN training, reference :845-880)
# ---------------------------------------------------------------------------
@functools.partial(jax.jit, static_argnames=("model", "tx", "phase"))
def image_train_step(model: ImageEncoder, tx, phase: int, state: TrainState,
                     images, labels):
    """One BCE step. Phase 1 runs the frozen backbone outside the grad (eval-mode
    BN); phase 2 differentiates end-to-end and updates batch stats."""
    if phase == 1:
        feats = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            images, train=False, method=ImageEncoder.backbone_features,
        )

        def loss_fn(params):
            out = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                feats, method=ImageEncoder.heads,
            )
            return bce_with_logits(out["logits"], labels)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        new_stats = state.batch_stats
    else:
        def loss_fn(params):
            out, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                images, train=True, mutable=["batch_stats"],
            )
            return bce_with_logits(out["logits"], labels), mutated["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)

    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return state.replace(step=state.step + 1, params=params,
                         opt_state=opt_state, batch_stats=new_stats), loss


# ---------------------------------------------------------------------------
# Text tower (TextEncoderTransformer training, reference :885-939)
# ---------------------------------------------------------------------------
@functools.partial(jax.jit, static_argnames=("model", "tx", "phase"))
def text_train_step(model: TextEncoder, tx, phase: int, state: TrainState,
                    input_ids, attention_mask, token_type_ids, labels,
                    dropout_rng=None):
    if phase == 1:
        pooled = model.apply(
            {"params": state.params}, input_ids, attention_mask, token_type_ids,
            True, method=TextEncoder.backbone_pooled,
        )

        def loss_fn(params):
            out = model.apply({"params": params}, pooled, method=TextEncoder.heads)
            return bce_with_logits(out["logits"], labels)

    else:
        def loss_fn(params):
            out = model.apply(
                {"params": params}, input_ids, attention_mask, token_type_ids,
                deterministic=dropout_rng is None,
                rngs={"dropout": dropout_rng} if dropout_rng is not None else {},
            )
            return bce_with_logits(out["logits"], labels)

    loss, grads = jax.value_and_grad(loss_fn)(state.params)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return state.replace(step=state.step + 1, params=params, opt_state=opt_state), loss


# ---------------------------------------------------------------------------
# Fusion training on frozen embeddings (reference :1028-1064)
# ---------------------------------------------------------------------------
@functools.partial(jax.jit, static_argnames=("model", "tx"))
def fusion_train_step(model: FusionModel, tx, state: TrainState, z_img, z_txt,
                      disease_targets, report_labels, dropout_rng):
    def loss_fn(params):
        out = model.apply(
            {"params": params}, z_img, z_txt, report_labels=report_labels,
            deterministic=False, rngs={"dropout": dropout_rng},
        )
        total, parts = fusion_loss(
            out["disease_logits"], disease_targets,
            out.get("report_logits"), report_labels,
        )
        return total, parts

    (loss, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return state.replace(step=state.step + 1, params=params, opt_state=opt_state), (
        loss, parts,
    )


# ---------------------------------------------------------------------------
# End-to-end pipeline driver (reference training_tests, :808-1127)
# ---------------------------------------------------------------------------
@dataclass
class TrainingOptions:
    image_phase1_steps: int = 1  # reference runs one batch per phase (:863,:880)
    image_phase2_steps: int = 1
    text_steps_per_phase: int = 3  # (:913,:930)
    fusion_steps: int = 300  # (:951)
    fusion_batch: int = 10  # (:950)
    image_batch: int = 32  # (:830)
    lr_head: float = 5e-4
    lr_backbone: float = 1e-4
    lr_text_enc: float = 2e-5  # (:927)
    lr_t5: float = 2e-5
    weight_decay: float = 1e-2
    seed: int = 0
    # held-out evaluation split (the reference evaluates nothing — its metrics
    # are hardcoded, :1112; we train on (1-val_fraction) and report metrics on
    # unseen rows)
    val_fraction: float = 0.2
    # "bfloat16" = TPU-native AMP: bf16 compute, fp32 master weights (the
    # reference's CUDA autocast+GradScaler path, :1025-1026; bf16 needs no
    # loss scaling)
    compute_dtype: str = "float32"
    log_every: int = 25  # (:1063)
    publish_model_name: str = "fusion_model_T5"
    log: Callable[[str], None] = field(default=print)
    # checkpoint/resume (capability beyond the reference, see checkpoints/orbax_io)
    checkpoint_dir: str | None = None
    checkpoint_every: int = 100
    # local serving bundle (reference :773-797); None -> default_bundle_path()
    local_bundle_path: str | None = None
    save_local_bundle: bool = True
    # persist int8 "turbo" activation scales into the published bundle,
    # calibrated on training images (one folded-f32 pass over <=32 images):
    # serving then quantizes deterministically instead of calibrating from
    # its first live batch
    calibrate_int8: bool = True
    calibrate_images: int = 32


def _fetch_training_batch(df, engine, n: int, seed: int):
    """Sample rows, fetch+preprocess images, tokenize text/reports
    (reference :949-994)."""
    from mmdx_tpu.io.store import open_url

    rows = df.sample(n=min(n, len(df)), random_state=seed).reset_index(drop=True)
    images = [open_url(u) for u in rows["image_url"].tolist()]
    imgs = engine.prep_images(images)
    tok = engine.prep_texts(rows["patient_details"].astype(str).tolist())
    y = np.stack(
        [np.asarray(v, np.float32) for v in rows["disease_classification_vector"]]
    )
    rep = engine.t5_tok.encode_batch(
        rows["report"].astype(str).tolist(),
        max_length=engine.bundle.config.report.max_report_len,
    )
    report_labels = np.where(rep["attention_mask"] == 0, -100, rep["input_ids"])
    return rows, imgs, tok, y, report_labels.astype(np.int32)


def run_training_pipeline(
    feature_store, registry, bundle: ModelBundle | None = None,
    options: TrainingOptions | None = None,
) -> dict:
    """Full training run: returns {bundle, version, metrics, losses}."""
    from mmdx_tpu.pipelines.feature_pipeline import load_features_labels_from_feature_store
    from mmdx_tpu.pipelines.metrics import auroc_micro, rouge_l_corpus
    from mmdx_tpu.runtime.compile_cache import enable_compile_cache
    from mmdx_tpu.runtime.engine import InferenceEngine
    from mmdx_tpu.checkpoints.bundle import new_random_bundle, split_variables

    enable_compile_cache()  # daily runs replay yesterday's train-step compiles
    opt = options or TrainingOptions()
    log = opt.log
    rng = jax.random.key(opt.seed)

    bundle = bundle or new_random_bundle(seed=opt.seed)
    cfg = bundle.config
    engine = InferenceEngine(bundle, mode="parity")

    log("[mmdx] loading features from feature store")
    df = load_features_labels_from_feature_store(feature_store)

    # held-out split: deterministic shuffle, last val_fraction rows are never
    # trained on (too-small datasets fall back to train-set eval, labeled so)
    shuffled = df.sample(frac=1.0, random_state=opt.seed).reset_index(drop=True)
    n_val = int(len(shuffled) * opt.val_fraction) if len(shuffled) >= 5 else 0
    val_df = shuffled.iloc[len(shuffled) - n_val:].reset_index(drop=True)
    train_df = shuffled.iloc[: len(shuffled) - n_val].reset_index(drop=True)
    log(f"[mmdx] split: {len(train_df)} train / {len(val_df)} val rows")

    dtype = (
        jnp.bfloat16 if opt.compute_dtype in ("bfloat16", "bf16") else jnp.float32
    )

    image_vars, text_vars, fusion_vars = split_variables(bundle.variables)
    losses: dict[str, list[float]] = {}

    # ---- image tower, two phases, fed by the prefetching DataLoader ----
    from mmdx_tpu.pipelines.dataloader import CXRImageDataset, DataLoader

    image_model = ImageEncoder(config=cfg.image, dtype=dtype)
    dataset = CXRImageDataset.from_dataframe(
        train_df, img_size=cfg.image.img_size, resize_size=cfg.image.resize_size
    )
    loader = DataLoader(dataset, batch_size=min(opt.image_batch, len(dataset)),
                        shuffle=True, seed=opt.seed, drop_last=True)
    for phase, steps in ((1, opt.image_phase1_steps), (2, opt.image_phase2_steps)):
        tx = build_encoder_optimizer(
            image_vars["params"], "backbone", phase,
            lr_backbone=opt.lr_backbone, lr_head=opt.lr_head,
            weight_decay=opt.weight_decay,
        )
        state = TrainState.create(image_vars["params"], tx, image_vars["batch_stats"])
        key = f"image_phase{phase}"
        losses[key] = []
        while len(losses[key]) < steps:
            for imgs, y in loader:
                state, loss = image_train_step(image_model, tx, phase, state, imgs, y)
                losses[key].append(float(loss))
                if len(losses[key]) >= steps:
                    break
        image_vars = {"params": state.params, "batch_stats": state.batch_stats}
        log(f"[mmdx] image phase {phase}: loss {losses[key]}")

    # text batch (patient details + labels) for the text phases
    _, _, tok, y, _ = _fetch_training_batch(train_df, engine, opt.image_batch, opt.seed)

    # ---- text tower, two phases ----
    text_model = TextEncoder(config=cfg.text, dtype=dtype)
    for phase, steps in ((1, opt.text_steps_per_phase), (2, opt.text_steps_per_phase)):
        tx = build_encoder_optimizer(
            text_vars["params"], "bert", phase,
            lr_backbone=opt.lr_text_enc, lr_head=opt.lr_head,
            weight_decay=opt.weight_decay,
        )
        state = TrainState.create(text_vars["params"], tx)
        key = f"text_phase{phase}"
        losses[key] = []
        for i in range(steps):
            rng, drop = jax.random.split(rng)
            state, loss = text_train_step(
                text_model, tx, phase, state,
                tok["input_ids"], tok["attention_mask"], tok["token_type_ids"], y,
                dropout_rng=drop if phase == 2 else None,
            )
            losses[key].append(float(loss))
        text_vars = {"params": state.params}
        log(f"[mmdx] text phase {phase}: loss {losses[key]}")

    # ---- fusion on frozen precomputed embeddings (:996-1009) ----
    rows, f_imgs, f_tok, f_y, f_report_labels = _fetch_training_batch(
        train_df, engine, opt.fusion_batch, opt.seed + 42
    )
    z_img = image_model.apply(image_vars, f_imgs, train=False)["embeddings"]
    z_txt = text_model.apply(
        text_vars, f_tok["input_ids"], f_tok["attention_mask"], f_tok["token_type_ids"]
    )["embeddings"]

    fusion_model = FusionModel(config=cfg.fusion, report_config=cfg.report,
                               dtype=dtype)
    tx = build_fusion_optimizer(
        fusion_vars["params"], lr_heads=opt.lr_head, lr_t5=opt.lr_t5,
        weight_decay=opt.weight_decay,
    )
    state = TrainState.create(fusion_vars["params"], tx)
    start_step = 0
    if opt.checkpoint_dir:
        from mmdx_tpu.checkpoints.orbax_io import restore_train_state, save_train_state

        restored, ck_step = restore_train_state(opt.checkpoint_dir, state)
        if restored is not None:
            state, start_step = restored, int(ck_step)
            log(f"[mmdx][fusion] resumed from checkpoint step {start_step}")
    losses["fusion"] = []
    for step in range(start_step + 1, opt.fusion_steps + 1):
        rng, drop = jax.random.split(rng)
        state, (loss, parts) = fusion_train_step(
            fusion_model, tx, state, z_img, z_txt, f_y, f_report_labels, drop,
        )
        losses["fusion"].append(float(loss))
        if step % opt.log_every == 0 or step == 1:
            log(
                f"[mmdx][fusion] step {step:04d} | cls={float(parts['cls']):.4f} "
                f"gen={float(parts['gen']):.4f} total={float(loss):.4f}"
            )
        if opt.checkpoint_dir and step % opt.checkpoint_every == 0:
            save_train_state(opt.checkpoint_dir, state, step=step)
    fusion_vars = {"params": state.params}

    # ---- assemble trained bundle, generate, compute real metrics ----
    trained = ModelBundle(
        config=cfg,
        variables=assemble_variables(image_vars, text_vars, fusion_vars),
        bert_vocab=bundle.bert_vocab,
        t5_vocab=bundle.t5_vocab,
        t5_scores=bundle.t5_scores,
        class_names=bundle.class_names,
        thresholds=bundle.thresholds,
        version=bundle.version,
    )
    eval_engine = InferenceEngine(trained, mode="parity")

    def _evaluate(eval_rows, targets, chunk: int = 64):
        # chunked: one giant batch would hold every decoded f32 image at
        # once AND compile a one-off XLA program per dataset size
        probs_l, reps = [], []
        urls = eval_rows["image_url"].tolist()
        texts = eval_rows["patient_details"].astype(str).tolist()
        for i in range(0, len(urls), chunk):
            probs_c, zi, zt = eval_engine.classify_batch(
                [open_url_bytes(u) for u in urls[i:i + chunk]],
                texts[i:i + chunk],
            )
            probs_l.append(probs_c)
            reps.extend(eval_engine.generate_reports(zi, zt, greedy=True))
        probs = np.concatenate(probs_l, axis=0)
        return (
            auroc_micro(targets, probs),
            rouge_l_corpus(eval_rows["report"].astype(str).tolist(), reps),
            reps,
        )

    # training-set metrics on the fusion batch (fit diagnostics) ...
    train_auroc, train_rouge, reports = _evaluate(rows, f_y)
    metrics = {
        "train_auroc_micro": train_auroc,
        "train_rougeL": train_rouge,
        "final_fusion_loss": losses["fusion"][-1] if losses["fusion"] else None,
    }
    # ... and honest held-out metrics on rows never trained on
    if len(val_df):
        val_y = np.stack([
            np.asarray(v, np.float32)
            for v in val_df["disease_classification_vector"]
        ])
        val_auroc, val_rouge, _ = _evaluate(val_df, val_y)
        metrics["val_auroc_micro"] = val_auroc
        metrics["val_rougeL"] = val_rouge
    else:
        log("[mmdx] WARNING: dataset too small for a held-out split; "
            "val_* metrics omitted")
    log(f"[mmdx] metrics: {metrics}")

    if opt.calibrate_int8 and len(df):
        # turbo-ready publish: calibrate the int8 tower's activation scales
        # on real training images so every serving boot of this bundle
        # quantizes deterministically (engine._ensure_qparams short-circuit)
        from mmdx_tpu.models.resnet_int8 import calibrate_backbone

        cal_urls = df["image_url"].tolist()[: opt.calibrate_images]
        cal_imgs = eval_engine.prep_images(
            [open_url_bytes(u) for u in cal_urls])  # parity-exact f32
        scales = calibrate_backbone(trained.variables, jnp.asarray(cal_imgs))
        trained.metadata = {**(trained.metadata or {}), "int8_scales": scales}
        log(f"[mmdx] int8 scales calibrated on {len(cal_urls)} training "
            "images (persisted in bundle metadata)")

    version = registry.create_model(
        opt.publish_model_name, trained,
        metrics={k: v for k, v in metrics.items() if v == v},  # drop nans
        description="CXR fusion: CNN+Text -> MLP; multi-label disease head; T5 report head.",
    )
    trained.version = version
    log(f"[mmdx] published {opt.publish_model_name} v{version}")

    if opt.save_local_bundle:
        # also publish the low-latency local serving bundle, atomically with a
        # timestamped history copy (reference :773-797)
        from mmdx_tpu.checkpoints.bundle import save_bundle
        from mmdx_tpu.pipelines.inference_pipeline import default_bundle_path

        bundle_path = save_bundle(
            trained, opt.local_bundle_path or default_bundle_path()
        )
        log(f"[mmdx] saved local bundle: {bundle_path}")
    return {
        "bundle": trained,
        "version": version,
        "metrics": metrics,
        "losses": losses,
        "reports": reports,
    }


def open_url_bytes(url: str) -> bytes:
    from mmdx_tpu.io.store import open_url

    return open_url(url)
