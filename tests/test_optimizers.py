"""Optimizer semantics vs the reference's build_optimizer behavior."""
import jax
import jax.numpy as jnp
import numpy as np

from mmdx_tpu.config import FusionConfig, ReportDecoderConfig, TextEncoderConfig
from mmdx_tpu.models.bert import TextEncoder, init_text_encoder
from mmdx_tpu.models.fusion import FusionModel
from mmdx_tpu.pipelines.training_pipeline import (
    TrainState,
    build_encoder_optimizer,
    build_fusion_optimizer,
    text_train_step,
)


def _small_text():
    cfg = TextEncoderConfig(
        vocab_size=97, hidden_size=32, num_layers=1, num_heads=4,
        intermediate_size=64, d_txt=16, max_len=12, max_position_embeddings=16,
    )
    model, variables = init_text_encoder(jax.random.key(0), cfg)
    return cfg, model, variables


def test_text_phase1_freezes_encoder(rng):
    cfg, model, variables = _small_text()
    tx = build_encoder_optimizer(variables["params"], "bert", phase=1)
    state = TrainState.create(variables["params"], tx)
    ids = jnp.asarray(rng.integers(0, 97, (2, 12)), jnp.int32)
    mask = jnp.ones((2, 12), jnp.int32)
    tt = jnp.zeros((2, 12), jnp.int32)
    y = jnp.zeros((2, 13), jnp.float32)
    new_state, loss = text_train_step(model, tx, 1, state, ids, mask, tt, y)
    for a, b in zip(jax.tree.leaves(state.params["bert"]),
                    jax.tree.leaves(new_state.params["bert"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not np.array_equal(np.asarray(state.params["proj"]["kernel"]),
                              np.asarray(new_state.params["proj"]["kernel"]))


def test_text_phase2_updates_encoder(rng):
    cfg, model, variables = _small_text()
    tx = build_encoder_optimizer(variables["params"], "bert", phase=2)
    state = TrainState.create(variables["params"], tx)
    ids = jnp.asarray(rng.integers(0, 97, (2, 12)), jnp.int32)
    mask = jnp.ones((2, 12), jnp.int32)
    tt = jnp.zeros((2, 12), jnp.int32)
    y = jnp.ones((2, 13), jnp.float32)
    new_state, _ = text_train_step(model, tx, 2, state, ids, mask, tt, y)
    moved = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(state.params["bert"]),
                        jax.tree.leaves(new_state.params["bert"]))
    )
    assert moved


def test_fusion_discriminative_lrs(rng):
    """T5 params step at lr 2e-5, fusion heads at 5e-4 (reference :1018-1023):
    on the very first adamw step, |update| ~= lr, so head movement must be
    ~25x the t5 movement."""
    fusion_cfg = FusionConfig(d_img=8, d_txt=8, d_fuse_hidden=16)
    rep_cfg = ReportDecoderConfig(
        vocab_size=32, d_model=16, d_kv=4, d_ff=16, num_layers=1,
        num_decoder_layers=1, num_heads=4,
    )
    model = FusionModel(config=fusion_cfg, report_config=rep_cfg)
    z_img = jnp.asarray(rng.standard_normal((2, 8)), jnp.float32)
    z_txt = jnp.asarray(rng.standard_normal((2, 8)), jnp.float32)
    labels = jnp.asarray(rng.integers(2, 32, (2, 5)), jnp.int32)
    y = jnp.ones((2, 13), jnp.float32)
    variables = model.init(jax.random.key(1), z_img, z_txt, report_labels=labels)
    tx = build_fusion_optimizer(variables["params"], lr_heads=5e-4, lr_t5=2e-5,
                                clip_norm=1e9)  # disable clipping for the ratio check
    state = TrainState.create(variables["params"], tx)
    from mmdx_tpu.pipelines.training_pipeline import fusion_train_step

    new_state, _ = fusion_train_step(model, tx, state, z_img, z_txt, y, labels,
                                     jax.random.key(2))

    def max_delta(a, b):
        return max(
            float(np.max(np.abs(np.asarray(x) - np.asarray(y_))))
            for x, y_ in zip(jax.tree.leaves(a), jax.tree.leaves(b))
        )

    d_heads = max_delta(state.params["fuse_dense"], new_state.params["fuse_dense"])
    d_t5 = max_delta(state.params["report_model"], new_state.params["report_model"])
    assert d_heads > 10 * d_t5
    np.testing.assert_allclose(d_heads, 5e-4, rtol=0.2)  # adamw first step ~ lr
    np.testing.assert_allclose(d_t5, 2e-5, rtol=0.2)
