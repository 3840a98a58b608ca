"""Inference pipeline — the reference-compatible Python serving API.

Mirrors the surface of the reference ``backend/ml/pipelines/inference_pipeline
.py``: ``load_model_from_registry`` (:53-139), ``inference(model_bundle,
image, patient_details, gen_kwargs)`` (:150-206) and the lazily-cached local
bundle loader used by the live serving path (``get_model_bundle``, replacing
``views.get_model_bundle_pickle``, views.py:162-258).
"""
from __future__ import annotations

import os
import threading
from pathlib import Path

from mmdx_tpu.checkpoints.bundle import ModelBundle, bundle_from_torch, load_bundle
from mmdx_tpu.checkpoints.registry import LocalModelRegistry
from mmdx_tpu.runtime.engine import InferenceEngine

DEFAULT_MODEL_NAME = "fusion_model_T5"  # the reference's registry name (views.py:44)

_ENGINES: dict[tuple, InferenceEngine] = {}
_BUNDLE: ModelBundle | None = None
_LOCK = threading.Lock()


def load_model_from_registry(
    registry: LocalModelRegistry, model_name: str = DEFAULT_MODEL_NAME,
    version: int | None = None,
) -> ModelBundle:
    """Registry load path (reference load_model_from_hopsworks_model_registry)."""
    return registry.get_model(model_name, version)


def default_bundle_path() -> Path:
    env = os.getenv("MMDX_BUNDLE_PATH") or os.getenv("CXR_BUNDLE_PATH")
    if env:
        return Path(env)
    return Path(__file__).resolve().parents[1] / "model" / "model_bundle.mmdx"


def get_model_bundle(path: str | os.PathLike | None = None) -> ModelBundle:
    """Thread-safe lazily-cached local bundle load (views.py:188-258 equivalent).

    Accepts our native ``.mmdx`` bundles and the reference's torch
    ``model_bundle.pt`` (auto-detected)."""
    global _BUNDLE
    if _BUNDLE is not None and path is None:
        return _BUNDLE
    with _LOCK:
        if _BUNDLE is not None and path is None:
            return _BUNDLE
        bundle_path = Path(path) if path else default_bundle_path()
        if not bundle_path.is_file():
            raise FileNotFoundError(f"Bundle not found: {bundle_path}")
        # sniff only the 8-byte magic — a reference model_bundle.pt can be
        # hundreds of MB, and torch re-reads the file itself anyway
        with bundle_path.open("rb") as fh:
            magic = fh.read(8)
        if magic == b"MMDX0001":
            bundle = load_bundle(bundle_path)
        else:
            bundle = bundle_from_torch(bundle_path)
        if path is None:
            _BUNDLE = bundle
        return bundle


def clear_model_bundle() -> None:
    global _BUNDLE
    with _LOCK:
        _BUNDLE = None
        _ENGINES.clear()


_ENGINE_CACHE_MAX = 4  # old engines pin full weight sets + jit caches


def get_engine(model_bundle: ModelBundle, mode: str = "parity",
               mesh=None) -> InferenceEngine:
    """Engine per (bundle object, mode, mesh), LRU-bounded and lock-guarded.

    A service that reloads its bundle after each daily training run gets a
    fresh engine per reload; the bound evicts the stale ones instead of
    leaking one full model (weights + compiled programs) per version.

    ``mesh``: optional jax.sharding.Mesh — weights replicate/tp-shard per
    parallel/sharding rules and batches dp-shard over "data" (multi-chip
    serving; the reference is strictly single-device)."""
    key = (id(model_bundle), mode, id(mesh) if mesh is not None else None)
    with _LOCK:
        if key in _ENGINES:
            _ENGINES[key] = _ENGINES.pop(key)  # refresh LRU position
            return _ENGINES[key]
    engine = InferenceEngine(model_bundle, mode=mode, mesh=mesh)
    with _LOCK:
        existing = _ENGINES.setdefault(key, engine)
        while len(_ENGINES) > _ENGINE_CACHE_MAX:
            _ENGINES.pop(next(iter(_ENGINES)))
        return existing


def inference(model_bundle: ModelBundle, image_pil, patient_details: str,
              device=None, gen_kwargs: dict | None = None) -> dict:
    """Drop-in equivalent of the reference ``inference()`` (:150-206).

    Returns {report_text, disease_probs, disease_vector, model_version}.
    ``device`` is accepted for signature compatibility and ignored (placement
    is handled by JAX)."""
    engine = get_engine(model_bundle)
    return engine.infer(image_pil, patient_details, gen_kwargs=gen_kwargs)
