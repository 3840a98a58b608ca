"""Sharded end-to-end training step (dp x tp) for the flagship model.

The reference has no distributed training (SURVEY §2.4); this is the TPU-native
scaling path: one jitted train step over a ("data","model") mesh — batch
sharded over "data", Megatron-style weight shards over "model", GSPMD
collectives over ICI.  The step differentiates the FULL model (both towers +
fusion + teacher-forced T5 report head) under the joint loss
BCE(disease) + CE(report).
"""
from __future__ import annotations

import jax
import optax

from mmdx_tpu.models.diagnosis import MultiModalDiagnosisModel
from mmdx_tpu.parallel.mesh import Mesh, replicated
from mmdx_tpu.parallel.sharding import batch_shardings, variable_shardings
from mmdx_tpu.pipelines.losses import fusion_loss
from mmdx_tpu.pipelines.training_pipeline import TrainState, _adamw, _label_tree


def build_joint_optimizer(
    params, lr_image: float = 1e-4, lr_text: float = 2e-5, lr_heads: float = 5e-4,
    lr_t5: float = 2e-5, weight_decay: float = 1e-2, clip_norm: float = 1.0,
) -> optax.GradientTransformation:
    """Per-tower discriminative LRs, mirroring the reference's per-phase groups."""
    def label(top: str) -> str:
        return {"image_encoder": "image", "text_encoder": "text"}.get(top, "fusion")

    labels = _label_tree(params, label)
    # fusion subtree: T5 params at a smaller LR than the fusion heads
    fusion_labels = jax.tree_util.tree_map_with_path(
        lambda path, _: "t5" if path[0].key == "report_model" else "fusion_heads",
        params["fusion"],
    )
    labels = dict(labels)
    labels["fusion"] = fusion_labels
    tx = optax.multi_transform(
        {
            "image": _adamw(lr_image, weight_decay),
            "text": _adamw(lr_text, weight_decay),
            "fusion_heads": _adamw(lr_heads, weight_decay),
            "t5": _adamw(lr_t5, weight_decay),
        },
        labels,
    )
    return optax.chain(optax.clip_by_global_norm(clip_norm), tx)


def make_sharded_train_step(model: MultiModalDiagnosisModel, tx, mesh: Mesh,
                            example_state: TrainState, example_batch: dict):
    """Compile the joint train step with explicit dp/tp shardings.

    example_state/example_batch provide shapes for the sharding annotations;
    the returned function is jit-compiled once and reused.
    """
    def leaf_sharding(x):
        # optimizer moments inherit the param shardings from tx.init on the
        # already-sharded params; keep them (sharded optimizer state = memory
        # scales with tp degree)
        if isinstance(x, jax.Array) and isinstance(x.sharding, type(replicated(mesh))):
            return x.sharding
        return replicated(mesh)

    state_shardings = TrainState(
        step=replicated(mesh),
        params=variable_shardings(example_state.params, mesh),
        opt_state=jax.tree.map(leaf_sharding, example_state.opt_state),
        batch_stats=jax.tree.map(lambda _: replicated(mesh), example_state.batch_stats),
    )
    batch_sh = batch_shardings(example_batch, mesh)

    def step(state: TrainState, batch: dict, dropout_rng):
        def loss_fn(params):
            out, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["images"], batch["input_ids"], batch["attention_mask"],
                batch.get("token_type_ids"),
                report_labels=batch["report_labels"], train=True,
                mutable=["batch_stats"], rngs={"dropout": dropout_rng},
            )
            total, parts = fusion_loss(
                out["disease_logits"], batch["disease_targets"],
                out.get("report_logits"), batch["report_labels"],
            )
            return total, (parts, mutated["batch_stats"])

        (loss, (parts, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1, params=params, opt_state=opt_state,
            batch_stats=new_stats,
        )
        return new_state, loss

    # Donation is gated on backend: on TPU the state (params + adam moments,
    # the dominant HBM residents) is donated so XLA updates in place instead
    # of holding two copies; on the virtual-device CPU backend donation
    # triggers sporadic aborts (round-1 note), so it stays off there.
    # MMDX_TRAIN_DONATE=0/1 overrides either way.
    import os

    env = os.environ.get("MMDX_TRAIN_DONATE")
    donate = (jax.default_backend() == "tpu") if env is None else env == "1"
    return jax.jit(
        step,
        in_shardings=(state_shardings, batch_sh, replicated(mesh)),
        out_shardings=(state_shardings, replicated(mesh)),
        donate_argnums=(0,) if donate else (),
    )


def make_joint_batch(rng, config, batch: int, report_len: int = 16):
    """Tiny synthetic batch for dryrun/compile checks."""
    import numpy as np

    r = np.random.default_rng(int(jax.random.randint(rng, (), 0, 2**31 - 1)))
    return {
        "images": r.standard_normal(
            (batch, config.image.img_size, config.image.img_size, 3)
        ).astype(np.float32),
        "input_ids": r.integers(0, config.text.vocab_size, (batch, config.text.max_len)).astype(np.int32),
        "attention_mask": np.ones((batch, config.text.max_len), np.int32),
        "token_type_ids": np.zeros((batch, config.text.max_len), np.int32),
        "disease_targets": (r.random((batch, 13)) > 0.5).astype(np.float32),
        "report_labels": r.integers(1, config.report.vocab_size, (batch, report_len)).astype(np.int32),
    }
