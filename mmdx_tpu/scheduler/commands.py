"""Pipeline entry-point commands.

Mirrors the reference's Django management commands (reference
``backend/api/management/commands/run_daily_feature_pipeline.py:5-21`` and
``run_daily_training_pipeline.py:5-21``): styled start/success output, errors
logged and re-raised so cron/schedulers see the failure.

Usage:
    python -m mmdx_tpu.scheduler.commands run_daily_feature_pipeline
    python -m mmdx_tpu.scheduler.commands run_daily_training_pipeline
    python -m mmdx_tpu.scheduler.commands prepare_raw_data

Environment:
    MMDX_DATA_ROOT      object-store root directory (default ./mmdx_data)
    MMDX_REGISTRY_ROOT  model-registry root (default <data-root>/registry)
    MMDX_FUSION_STEPS   fusion training steps (default 300)
"""
from __future__ import annotations

import os
import sys
import time
from pathlib import Path


def _world():
    from mmdx_tpu.checkpoints.registry import LocalModelRegistry
    from mmdx_tpu.io.feature_store import FeatureStore
    from mmdx_tpu.io.store import LocalFSStore, register_store

    root = Path(os.getenv("MMDX_DATA_ROOT", "mmdx_data"))
    store = register_store(LocalFSStore(root / "store", bucket="medical-ml-bucket"))
    fs = FeatureStore(object_store=store)
    registry = LocalModelRegistry(os.getenv("MMDX_REGISTRY_ROOT", root / "registry"))
    return store, fs, registry


def _run(name, fn):
    """Styled run wrapper + outcome notification (the reference's Celery
    tasks wire send_mail into these pipelines; scheduler/notify.py)."""
    from mmdx_tpu.scheduler.notify import make_event, notifier_from_env

    print(f"[{time.strftime('%Y-%m-%d %H:%M:%S')}] Starting {name}...")
    try:
        fn()
    except Exception as e:
        print(f"{name} FAILED: {e}", file=sys.stderr)
        try:
            notifier_from_env()(make_event(name, "failed", error=str(e)))
        except Exception as ne:  # notification failure must not mask the run error
            print(f"notify failed: {ne}", file=sys.stderr)
        raise  # re-raise so schedulers mark the run failed (reference :19-21)
    print(f"{name} completed successfully.")


def prepare_raw_data():
    """One-shot data prep (reference raw_data_pre_preparation.py capability,
    synthetic source offline)."""
    from mmdx_tpu.pipelines.data_prep import prepare_raw_dataset, synthetic_raw_examples

    store, _, _ = _world()
    n = int(os.getenv("MMDX_PREP_EXAMPLES", "100"))
    df = prepare_raw_dataset(synthetic_raw_examples(n), store)
    print(f"prepared {len(df)} rows -> {store.url_for('raw_data/dataset.parquet')}")


def run_daily_feature_pipeline():
    from mmdx_tpu.pipelines.feature_pipeline import run_feature_pipeline

    store, fs, _ = _world()
    df = run_feature_pipeline(store, fs)
    print(f"inserted {len(df)} rows into feature group")


def run_daily_training_pipeline():
    from mmdx_tpu.pipelines.training_pipeline import TrainingOptions, run_training_pipeline

    _, fs, registry = _world()
    result = run_training_pipeline(
        fs, registry,
        options=TrainingOptions(fusion_steps=int(os.getenv("MMDX_FUSION_STEPS", "300"))),
    )
    print(f"published version {result['version']}; metrics {result['metrics']}")


COMMANDS = {
    "prepare_raw_data": prepare_raw_data,
    "run_daily_feature_pipeline": run_daily_feature_pipeline,
    "run_daily_training_pipeline": run_daily_training_pipeline,
}


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if not argv or argv[0] not in COMMANDS:
        print(f"usage: python -m mmdx_tpu.scheduler.commands {{{'|'.join(COMMANDS)}}}")
        return 2
    _run(argv[0], COMMANDS[argv[0]])
    return 0


if __name__ == "__main__":
    sys.exit(main())
