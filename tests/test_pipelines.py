"""End-to-end offline MLOps flow: data prep -> feature pipeline -> training ->
registry publish -> inference, all on in-memory stores (no external services)."""
import numpy as np
import pytest

from mmdx_tpu.checkpoints.bundle import new_random_bundle
from mmdx_tpu.checkpoints.registry import LocalModelRegistry
from mmdx_tpu.io.feature_store import FeatureStore
from mmdx_tpu.io.store import InMemoryStore, register_store
from mmdx_tpu.pipelines.data_prep import (
    prepare_raw_dataset,
    rule_based_disease_labeler,
    synthesize_patient_details,
    synthetic_raw_examples,
)
from mmdx_tpu.pipelines.feature_pipeline import (
    load_features_labels_from_feature_store,
    load_raw_data,
    run_feature_pipeline,
)
from mmdx_tpu.pipelines.metrics import auroc_micro, rouge_l


def test_rule_based_labeler():
    vec = rule_based_disease_labeler(
        "Mild cardiomegaly. Patchy consolidation in the right lower lobe, likely "
        "pneumonia. No pleural effusion or pneumothorax."
    )
    from mmdx_tpu.config import DISEASES

    as_names = {DISEASES[i] for i, b in enumerate(vec) if b}
    assert {"Cardiomegaly", "Consolidation", "Pneumonia"} <= as_names
    assert "Pleural Effusion" not in as_names and "Pneumothorax" not in as_names

    clear = rule_based_disease_labeler("The lungs are clear. No acute abnormality.")
    assert clear[0] == 1 and sum(clear) == 1  # No Finding


def test_patient_details_synthesis():
    import random

    vec = [0] * 13
    vec[7] = 1  # Pneumonia
    text = synthesize_patient_details(vec, random.Random(0))
    assert "year old" in text
    assert any(s in text for s in ("fever", "cough", "chills", "chest pain"))


def test_patient_details_report_hints():
    """Report-text symptom hinting (reference _infer_hints, helper.py:36-45):
    symptoms the report mentions always appear in the synthesized details."""
    import random

    from mmdx_tpu.pipelines.data_prep import infer_symptom_hints

    report = ("Patient is febrile with productive cough. Small right "
              "pleural effusion noted.")
    hints = infer_symptom_hints(report)
    assert hints == {"fever", "cough", "pleuritic chest pain", "leg swelling"}
    assert infer_symptom_hints(None) == set()
    assert infer_symptom_hints("unremarkable study") == set()

    vec = [0] * 13
    vec[10] = 1  # Pleural Effusion
    for seed in range(5):  # hints survive any sampling outcome
        text = synthesize_patient_details(vec, random.Random(seed),
                                          report_text=report)
        for h in hints:
            assert h in text, (seed, h, text)


def test_metrics():
    y = np.array([[1, 0], [0, 1], [1, 0]], np.float32)
    perfect = np.array([[0.9, 0.1], [0.2, 0.8], [0.7, 0.3]], np.float32)
    assert auroc_micro(y, perfect) == 1.0
    assert auroc_micro(y, 1 - perfect) == 0.0
    assert rouge_l("the lungs are clear", "the lungs are clear") == 1.0
    assert rouge_l("the lungs are clear", "totally unrelated words") == 0.0


@pytest.fixture(scope="module")
def prepared_world():
    store = register_store(InMemoryStore("medical-ml-bucket"))
    fs = FeatureStore(object_store=store)
    df = prepare_raw_dataset(synthetic_raw_examples(12, seed=1), store)
    return store, fs, df


def test_data_prep_and_feature_pipeline(prepared_world):
    store, fs, df = prepared_world
    assert len(df) == 12
    assert store.exists("raw_data/dataset.parquet")
    assert all(u.startswith("mem://medical-ml-bucket/chest-x-ray-images/")
               for u in df["image_url"])

    raw = load_raw_data(store)
    assert list(raw.columns) == [
        "image_url", "patient_details", "disease_classification_vector", "report",
    ]
    run_feature_pipeline(store, fs)
    # idempotent upsert: inserting twice still dedups to unique image_urls
    run_feature_pipeline(store, fs)
    feats = load_features_labels_from_feature_store(fs)
    assert len(feats) == raw["image_url"].nunique()
    assert "event_time" in feats.columns


def test_training_pipeline_end_to_end(prepared_world, tmp_path):
    from mmdx_tpu.pipelines.training_pipeline import TrainingOptions, run_training_pipeline

    store, fs, _ = prepared_world
    run_feature_pipeline(store, fs)
    registry = LocalModelRegistry(tmp_path / "registry")
    bundle = new_random_bundle(seed=0, small=True)
    # shrink generation for test speed
    import dataclasses

    gen = dataclasses.replace(
        bundle.config.generation, max_new_tokens=8, min_new_tokens=2, num_beams=2
    )
    bundle.config = dataclasses.replace(bundle.config, generation=gen)

    result = run_training_pipeline(
        fs, registry, bundle=bundle,
        options=TrainingOptions(
            image_phase1_steps=2, image_phase2_steps=1, text_steps_per_phase=2,
            fusion_steps=12, fusion_batch=6, image_batch=6, log_every=6,
            log=lambda s: None,
            local_bundle_path=str(tmp_path / "model_bundle.mmdx"),
        ),
    )
    assert (tmp_path / "model_bundle.mmdx").exists()
    assert result["version"] == 1
    assert registry.latest_version("fusion_model_T5") == 1
    losses = result["losses"]["fusion"]
    assert losses[-1] < losses[0]  # joint loss decreases
    assert "val_auroc_micro" in result["metrics"]
    assert len(result["reports"]) == 6

    # the published bundle is turbo-ready: int8 activation scales were
    # calibrated on training images and persisted (serving skips its
    # first-batch calibration fallback)
    from mmdx_tpu.models.resnet_int8 import calibration_sites

    scales = (result["bundle"].metadata or {}).get("int8_scales")
    assert scales and not (set(calibration_sites()) - set(scales))
    assert all(v > 0 for v in scales.values())

    # the published model serves end-to-end
    from mmdx_tpu.pipelines.inference_pipeline import get_engine, load_model_from_registry

    loaded = load_model_from_registry(registry)
    eng = get_engine(loaded)
    out = eng.infer(
        synthetic_raw_examples(1, seed=9)[0].image_bytes, "67M smoker dyspnea",
        gen_kwargs=dict(max_new_tokens=6, min_new_tokens=1, num_beams=2),
    )
    assert len(out["disease_probs"]) == 13
    assert out["model_version"] == 1


def test_bf16_training_tracks_fp32():
    """The TPU-native AMP mode (bf16 compute, fp32 master weights — the
    reference's CUDA autocast equivalent, training_pipeline.py:1025-1026):
    loss trajectories track fp32 and params stay fp32."""
    import jax
    import jax.numpy as jnp

    from mmdx_tpu.config import FusionConfig, ReportDecoderConfig
    from mmdx_tpu.models.fusion import FusionModel
    from mmdx_tpu.pipelines.training_pipeline import (
        TrainState,
        build_fusion_optimizer,
        fusion_train_step,
    )

    fcfg = FusionConfig(d_img=16, d_txt=8, d_fuse_hidden=16)
    rcfg = ReportDecoderConfig(
        vocab_size=50, d_model=16, d_kv=4, d_ff=32, num_layers=1,
        num_decoder_layers=1, num_heads=2, relative_attention_num_buckets=8,
        relative_attention_max_distance=20,
    )
    rng = np.random.default_rng(0)
    z_img = rng.standard_normal((4, 16)).astype(np.float32)
    z_txt = rng.standard_normal((4, 8)).astype(np.float32)
    y = (rng.random((4, 13)) > 0.5).astype(np.float32)
    labels = rng.integers(1, 50, (4, 6)).astype(np.int32)

    traj = {}
    for name, dtype in (("fp32", jnp.float32), ("bf16", jnp.bfloat16)):
        model = FusionModel(config=fcfg, report_config=rcfg, dtype=dtype)
        variables = model.init(jax.random.key(0), z_img, z_txt, report_labels=labels)
        # master weights are fp32 in BOTH modes (flax param_dtype default)
        assert all(
            np.asarray(l).dtype == np.float32
            for l in jax.tree.leaves(variables["params"])
        )
        tx = build_fusion_optimizer(variables["params"])
        state = TrainState.create(variables["params"], tx)
        ls = []
        key = jax.random.key(1)
        for _ in range(8):
            key, drop = jax.random.split(key)
            state, (loss, _) = fusion_train_step(
                model, tx, state, z_img, z_txt, y, labels, drop
            )
            ls.append(float(loss))
        traj[name] = ls

    a, b = np.asarray(traj["fp32"]), np.asarray(traj["bf16"])
    assert a[-1] < a[0] and b[-1] < b[0]  # both learn
    np.testing.assert_allclose(a, b, rtol=0.08)  # bf16 tracks fp32


def test_phase1_freezes_backbone(prepared_world):
    """Phase-1 optimizer must leave backbone params untouched (reference
    freeze_backbone semantics)."""
    import jax
    import jax.numpy as jnp

    from mmdx_tpu.config import ImageEncoderConfig
    from mmdx_tpu.models.resnet import ImageEncoder, init_image_encoder
    from mmdx_tpu.pipelines.training_pipeline import (
        TrainState,
        build_encoder_optimizer,
        image_train_step,
    )

    cfg = ImageEncoderConfig(d_img=32, img_size=32)
    model, variables = init_image_encoder(jax.random.key(0), cfg)
    tx = build_encoder_optimizer(variables["params"], "backbone", phase=1)
    state = TrainState.create(variables["params"], tx, variables["batch_stats"])
    imgs = jnp.ones((2, 32, 32, 3), jnp.float32)
    y = jnp.zeros((2, 13), jnp.float32)
    new_state, loss = image_train_step(model, tx, 1, state, imgs, y)

    before = jax.tree.leaves(state.params["backbone"])
    after = jax.tree.leaves(new_state.params["backbone"])
    assert all(np.array_equal(a, b) for a, b in zip(before, after))
    # heads did move
    assert not np.array_equal(
        np.asarray(state.params["proj"]["kernel"]),
        np.asarray(new_state.params["proj"]["kernel"]),
    )
    # BN stats unchanged in phase 1 (backbone.eval())
    bs_before = jax.tree.leaves(state.batch_stats)
    bs_after = jax.tree.leaves(new_state.batch_stats)
    assert all(np.array_equal(a, b) for a, b in zip(bs_before, bs_after))
