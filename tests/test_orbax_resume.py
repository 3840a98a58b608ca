"""Checkpoint/resume: fusion training snapshots and resumes exactly."""
import jax
import jax.numpy as jnp
import numpy as np

from mmdx_tpu.checkpoints.orbax_io import (
    latest_step,
    restore_train_state,
    save_train_state,
)
from mmdx_tpu.config import FusionConfig, ReportDecoderConfig
from mmdx_tpu.models.fusion import FusionModel
from mmdx_tpu.pipelines.training_pipeline import (
    TrainState,
    build_fusion_optimizer,
    fusion_train_step,
)


def test_fusion_checkpoint_resume(tmp_path, rng):
    fusion_cfg = FusionConfig(d_img=16, d_txt=8, d_fuse_hidden=16)
    rep_cfg = ReportDecoderConfig(
        vocab_size=64, d_model=16, d_kv=4, d_ff=32, num_layers=1,
        num_decoder_layers=1, num_heads=4,
    )
    model = FusionModel(config=fusion_cfg, report_config=rep_cfg)
    z_img = jnp.asarray(rng.standard_normal((4, 16)), jnp.float32)
    z_txt = jnp.asarray(rng.standard_normal((4, 8)), jnp.float32)
    y = jnp.asarray((rng.random((4, 13)) > 0.5), jnp.float32)
    labels = jnp.asarray(rng.integers(1, 64, (4, 6)), jnp.int32)

    variables = model.init(jax.random.key(0), z_img, z_txt, report_labels=labels)
    tx = build_fusion_optimizer(variables["params"])
    state = TrainState.create(variables["params"], tx)

    def run(state, steps, seed0):
        for i in range(steps):
            state, _ = fusion_train_step(
                model, tx, state, z_img, z_txt, y, labels, jax.random.key(seed0 + i)
            )
        return state

    ckdir = tmp_path / "ckpt"
    state = run(state, 3, 100)
    save_train_state(ckdir, state, step=3)
    assert latest_step(ckdir) == 3

    # continue 2 more steps -> reference trajectory
    ref = run(state, 2, 200)

    # resume from disk into a fresh template and replay the same 2 steps
    fresh = TrainState.create(variables["params"], tx)
    restored, step = restore_train_state(ckdir, fresh)
    assert step == 3
    resumed = run(restored, 2, 200)

    for a, b in zip(jax.tree.leaves(ref.params), jax.tree.leaves(resumed.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(resumed.step) == int(ref.step)
