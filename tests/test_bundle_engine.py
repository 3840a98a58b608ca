"""Bundle save/load roundtrip, registry versioning, and end-to-end engine
inference with the reference's output contract."""
import numpy as np
import pytest

import jax

from mmdx_tpu.checkpoints.bundle import (
    ModelBundle,
    load_bundle,
    new_random_bundle,
    save_bundle,
)
from mmdx_tpu.checkpoints.registry import LocalModelRegistry
from mmdx_tpu.runtime.engine import InferenceEngine


@pytest.fixture(scope="module")
def small_bundle():
    return new_random_bundle(seed=0, small=True)


def test_bundle_roundtrip(small_bundle, tmp_path):
    p = save_bundle(small_bundle, tmp_path / "model_bundle.mmdx")
    loaded = load_bundle(p)
    assert loaded.class_names == small_bundle.class_names
    assert loaded.config == small_bundle.config
    orig = jax.tree.leaves(small_bundle.variables)
    new = jax.tree.leaves(loaded.variables)
    assert len(orig) == len(new)
    for a, b in zip(orig, new):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # timestamped history copy exists (reference :795)
    copies = list(tmp_path.glob("model_bundle_*.mmdx"))
    assert len(copies) == 1


def test_registry_versioning(small_bundle, tmp_path):
    reg = LocalModelRegistry(tmp_path / "registry")
    v1 = reg.create_model("fusion_model_T5", small_bundle, metrics={"val_auroc_micro": 0.9})
    v2 = reg.create_model("fusion_model_T5", small_bundle)
    assert (v1, v2) == (1, 2)
    assert reg.latest_version("fusion_model_T5") == 2
    got = reg.get_model("fusion_model_T5")
    assert got.version == 2
    assert reg.get_metrics("fusion_model_T5", 1)["metrics"]["val_auroc_micro"] == 0.9
    with pytest.raises(LookupError):
        reg.latest_version("nope")


@pytest.mark.parametrize("mode", ["parity", "fast"])
def test_engine_end_to_end(small_bundle, sample_image_paths, sample_patient_details, mode):
    engine = InferenceEngine(small_bundle, mode=mode, canonical_size=128)
    img_bytes = sample_image_paths[0].read_bytes()
    details = list(sample_patient_details.values())[0]
    out = engine.infer(
        img_bytes, details,
        gen_kwargs=dict(max_new_tokens=8, min_new_tokens=2, num_beams=2),
    )
    assert set(out) == {"report_text", "disease_probs", "disease_vector", "model_version"}
    assert len(out["disease_probs"]) == 13
    assert all(0.0 <= p <= 1.0 for p in out["disease_probs"].values())
    assert out["disease_vector"] == [
        int(p >= 0.5) for p in out["disease_probs"].values()
    ]
    assert isinstance(out["report_text"], str)


def test_parity_vs_fast_probs_close(small_bundle, sample_image_paths, sample_patient_details):
    imgs = [p.read_bytes() for p in sample_image_paths]
    texts = list(sample_patient_details.values())[: len(imgs)]
    p_parity, _, _ = InferenceEngine(small_bundle, mode="parity").classify_batch(imgs, texts)
    p_fast, _, _ = InferenceEngine(small_bundle, mode="fast",
                                   canonical_size=512).classify_batch(imgs, texts)
    # bf16 towers + float preproc: probabilities agree loosely
    assert np.max(np.abs(p_parity - p_fast)) < 0.1


def test_classification_batched(small_bundle, rng):
    engine = InferenceEngine(small_bundle, mode="parity")
    imgs = [rng.integers(0, 256, (300, 260, 3), dtype=np.uint8) for _ in range(4)]
    texts = ["67M smoker dyspnea", "54F cough asthma", "", "78 year old female"]
    probs, z_img, z_txt = engine.classify_batch(imgs, texts)
    assert probs.shape == (4, 13)
    assert z_img.shape[0] == 4 and z_txt.shape[0] == 4


def test_single_modality_classification(small_bundle, rng):
    """BASELINE configs 1-2: image-only and text-only classification via the
    warm-up classifier heads."""
    engine = InferenceEngine(small_bundle, mode="parity")
    imgs = [rng.integers(0, 256, (160, 160), dtype=np.uint8) for _ in range(2)]
    p_img = engine.classify_image_batch(imgs)
    assert p_img.shape == (2, 13) and np.all((p_img >= 0) & (p_img <= 1))
    p_txt = engine.classify_text_batch(["67M smoker dyspnea", "54F cough"])
    assert p_txt.shape == (2, 13) and np.all((p_txt >= 0) & (p_txt <= 1))


def test_engine_default_generation_config(small_bundle, sample_image_paths):
    """The reference's real generation settings (beam 4, min 150 / max 180,
    no-repeat-3, length penalty 1.1) run end-to-end on the small model."""
    engine = InferenceEngine(small_bundle, mode="parity")
    out = engine.infer(sample_image_paths[0].read_bytes(), "44 year old female PA view")
    assert isinstance(out["report_text"], str)
    # min_new_tokens forces a long generation; t5-style decode yields words
    assert len(out["report_text"]) > 0


def test_fast_mode_mixed_shapes(small_bundle, rng):
    """Mixed raw shapes in one fast-mode batch use the canonicalization path."""
    engine = InferenceEngine(small_bundle, mode="fast", canonical_size=128)
    imgs = [
        rng.integers(0, 256, (150, 120), dtype=np.uint8),
        rng.integers(0, 256, (128, 128, 3), dtype=np.uint8),
    ]
    probs, _, _ = engine.classify_batch(imgs, ["a cough", "b fever"])
    assert probs.shape == (2, 13)
    assert np.all(np.isfinite(probs))


def test_fast_mode_compile_surface_capped(small_bundle, rng):
    """A stream of many distinct raw shapes must not compile per-shape: after
    max_raw_shapes distinct direct shapes, new shapes canonicalize (bounding
    the compiled-program count)."""
    engine = InferenceEngine(small_bundle, mode="fast", canonical_size=96)
    for i in range(10):
        img = rng.integers(0, 256, (100 + 4 * i, 90 + 4 * i), dtype=np.uint8)
        probs, _, _ = engine.classify_batch([img], [f"case {i}"])
        assert probs.shape == (1, 13)
    # ≤ max_raw_shapes direct programs + 1 canonical program
    classify_keys = [k for k in engine._classify_cache if k[0] == "classify"]
    assert len(classify_keys) <= engine.max_raw_shapes + 1
    # previously-seen shapes keep replaying their compiled program
    img = rng.integers(0, 256, (100, 90), dtype=np.uint8)
    n_before = len(engine._classify_cache)
    engine.classify_batch([img], ["again"])
    assert len(engine._classify_cache) == n_before


def test_engine_greedy_generation(small_bundle, rng):
    engine = InferenceEngine(small_bundle, mode="parity")
    z_img = np.asarray(rng.standard_normal((2, 64)), np.float32)
    z_txt = np.asarray(rng.standard_normal((2, 32)), np.float32)
    import dataclasses

    gen = dataclasses.replace(small_bundle.config.generation,
                              max_new_tokens=10, min_new_tokens=2)
    texts = engine.generate_reports(z_img, z_txt, gen, greedy=True)
    assert len(texts) == 2 and all(isinstance(t, str) for t in texts)
