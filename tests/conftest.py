"""Test config: force CPU with 8 virtual devices so sharding tests run without TPUs.

Must set env vars before jax is imported anywhere.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    # raised collective-rendezvous timeouts: on a 1-CPU box the 8 virtual
    # devices time-slice one core and can reach an all-reduce >40s apart,
    # which the default termination timeout would LOG(FATAL) on.
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
        " --xla_cpu_collective_timeout_seconds=1200"
    ).strip()
os.environ.setdefault("TOKENIZERS_PARALLELISM", "false")
os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")

import pathlib
import sys

REPO_ROOT = pathlib.Path(__file__).resolve().parents[1]
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

import jax

# The axon sitecustomize forces jax_platforms="axon,cpu"; override back to the
# virtual 8-device CPU mesh for tests (must run before backend initialization).
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def sample_image_paths():
    ref = pathlib.Path("/root/reference/backend/sample_images")
    paths = sorted(ref.glob("*.jpg")) if ref.exists() else []
    if not paths:
        pytest.skip("reference sample images not available")
    return paths


@pytest.fixture(scope="session")
def sample_patient_details():
    import json

    p = pathlib.Path("/root/reference/backend/sample_details/patient_details.json")
    if not p.exists():
        pytest.skip("reference sample details not available")
    return json.loads(p.read_text())
