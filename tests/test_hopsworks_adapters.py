"""Contract tests for the gated Hopsworks adapters — fake clients, no live
calls.

The fakes mirror the client surface the reference exercises:
feature_pipeline.py:73-88 (login -> get_feature_store ->
get_or_create_feature_group -> insert(write_options)),
training_pipeline.py:74-89 (get_feature_group -> select -> read -> dedup),
training_pipeline.py:753-770 (python.create_model / generic fallback ->
registry_model.save(dir)), inference_pipeline.py:37-41 (get_models ->
max version).
"""
import json
import shutil
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

from mmdx_tpu.io.hopsworks_store import (
    HopsworksFeatureStore,
    HopsworksModelRegistry,
    _sanitize,
)


# ---------------------------------------------------------------- fakes
class FakeQuery:
    def __init__(self, df, columns):
        self._df = df
        self._cols = columns

    def as_of(self, ts):
        return self

    def read(self):
        df = self._df.copy()
        if self._cols:
            df = df[[c for c in self._cols if c in df.columns]]
        return df


class FakeFG:
    def __init__(self, name, version, primary_key, event_time, online_enabled):
        self.name = name
        self.version = version
        self.primary_key = primary_key
        self.event_time = event_time
        self.online_enabled = online_enabled
        self.df = pd.DataFrame()
        self.insert_calls = []

    def insert(self, df, write_options=None):
        self.insert_calls.append({"write_options": write_options})
        self.df = pd.concat([self.df, df], ignore_index=True)

    def select(self, columns):
        return FakeQuery(self.df, columns)

    def select_all(self):
        return FakeQuery(self.df, None)


class FakeFS:
    def __init__(self):
        self.groups = {}

    def get_or_create_feature_group(self, name, version, primary_key,
                                    event_time, online_enabled):
        key = (name, version)
        if key not in self.groups:
            self.groups[key] = FakeFG(name, version, primary_key, event_time,
                                      online_enabled)
        return self.groups[key]

    def get_feature_group(self, name, version):
        return self.groups[(name, version)]


class FakeRegistryModel:
    def __init__(self, name, version, metrics, description, store_dir):
        self.name = name
        self.version = version
        self.metrics = metrics
        self.description = description
        self._store_dir = store_dir

    def save(self, local_dir):
        dest = self._store_dir / self.name / f"v{self.version}"
        if dest.exists():
            shutil.rmtree(dest)
        shutil.copytree(local_dir, dest)

    def download(self):
        return str(self._store_dir / self.name / f"v{self.version}")


class FakePythonAPI:
    def __init__(self, registry, fail=False):
        self._registry = registry
        self.fail = fail
        self.calls = []

    def create_model(self, name, version, metrics, description):
        self.calls.append(name)
        if self.fail:
            raise RuntimeError("python API unavailable")
        return self._registry._make(name, version, metrics, description)


class FakeModelRegistry:
    def __init__(self, store_dir, python_fails=False):
        self._store_dir = Path(store_dir)
        self.models = {}  # name -> {version: FakeRegistryModel}
        self.python = FakePythonAPI(self, fail=python_fails)
        self.generic_calls = []

    def _make(self, name, version, metrics, description):
        m = FakeRegistryModel(name, version, metrics, description,
                              self._store_dir)
        self.models.setdefault(name, {})[version] = m
        return m

    def create_model(self, name, version, metrics, description):
        self.generic_calls.append(name)
        return self._make(name, version, metrics, description)

    def get_models(self, name):
        return list(self.models.get(name, {}).values())

    def get_model(self, name, version):
        return self.models[name][version]


class FakeProject:
    def __init__(self, fs=None, mr=None):
        self._fs = fs
        self._mr = mr

    def get_feature_store(self):
        return self._fs

    def get_model_registry(self):
        return self._mr


class FakeHopsworksModule:
    """Stands in for `import hopsworks` in the login path."""

    def __init__(self, project):
        self._project = project
        self.login_calls = []

    def login(self, project=None):
        self.login_calls.append(project)
        return self._project


# ---------------------------------------------------------------- feature store
def _rows(urls, t0="2026-01-01"):
    ts = pd.Timestamp(t0, tz="UTC")
    return pd.DataFrame({
        "image_url": urls,
        "patient_details": [f"details {u}" for u in urls],
        "disease_classification_vector": [
            np.zeros(13, np.float32).tolist() for _ in urls],
        "report": [f"report {u}" for u in urls],
        "event_time": [ts + pd.Timedelta(seconds=i) for i in range(len(urls))],
    })


def test_feature_store_insert_contract():
    fake_fs = FakeFS()
    module = FakeHopsworksModule(FakeProject(fs=fake_fs))
    store = HopsworksFeatureStore(project_name="medical_ml_project",
                                  client=module)
    assert module.login_calls == ["medical_ml_project"]

    fg = store.get_or_create_feature_group(
        "cxr_features", version=1, primary_key=["image_url"])
    raw = fake_fs.groups[("cxr_features", 1)]
    assert raw.event_time == "event_time"
    assert raw.online_enabled is True
    assert raw.primary_key == ["image_url"]

    df = _rows(["s3://b/a.jpg", "s3://b/b.jpg"]).drop(columns=["event_time"])
    fg.insert(df)
    # wait_for_job=False is the reference's non-blocking insert contract
    assert raw.insert_calls[0]["write_options"] == {"wait_for_job": False}
    # event_time added when missing
    assert "event_time" in raw.df.columns
    assert len(raw.df) == 2


def test_feature_store_read_dedups_latest_event():
    fake_fs = FakeFS()
    store = HopsworksFeatureStore(
        project=FakeProject(fs=fake_fs))
    fg = store.get_or_create_feature_group(
        "cxr_features", version=1, primary_key=["image_url"])
    fg.insert(_rows(["s3://b/a.jpg", "s3://b/b.jpg"], "2026-01-01"))
    newer = _rows(["s3://b/a.jpg"], "2026-02-01")
    newer["report"] = ["updated report"]
    fg.insert(newer)

    out = store.get_feature_group("cxr_features", 1,
                                  primary_key=["image_url"]).read(
        columns=["image_url", "report", "event_time"])
    assert len(out) == 2  # deduped per image_url
    rep = out.set_index("image_url")["report"]
    assert rep["s3://b/a.jpg"] == "updated report"

    # dedup=False keeps all rows
    raw = fg.read(dedup=False)
    assert len(raw) == 3


# ---------------------------------------------------------------- registry
@pytest.fixture(scope="module")
def small_bundle():
    from mmdx_tpu.checkpoints.bundle import new_random_bundle

    return new_random_bundle(seed=0, small=True)


def test_registry_publish_load_roundtrip(tmp_path, small_bundle):
    mr = FakeModelRegistry(tmp_path / "store")
    reg = HopsworksModelRegistry(project=FakeProject(mr=mr))

    v = reg.create_model("fusion_model_T5", small_bundle,
                         metrics={"val_auroc_micro": 0.874,
                                  "val_rougeL": 0.214},
                         description="round-5 contract test")
    assert v == 1
    assert mr.python.calls == ["fusion_model_T5"]  # python API first
    assert mr.generic_calls == []

    # second publish auto-increments
    v2 = reg.create_model("fusion_model_T5", small_bundle)
    assert v2 == 2
    assert reg.latest_version("fusion_model_T5") == 2

    # uploaded dir has the native layout + reference-style config/metrics
    d = Path(mr.models["fusion_model_T5"][1].download())
    assert (d / "bundle.mmdx").exists()
    cfg = json.loads((d / "config.json").read_text())
    assert cfg["fusion"]["d_img"] == small_bundle.config.fusion.d_img
    met = json.loads((d / "metrics.json").read_text())
    assert met["metrics"]["val_auroc_micro"] == 0.874
    f = small_bundle.config.fusion
    assert met["model_schema"] == {"input": [1, f.d_img + f.d_txt],
                                   "output": [1, f.n_disease]}

    loaded = reg.get_model("fusion_model_T5", version=1)
    assert loaded.version == 1
    assert loaded.config.fusion.n_disease == f.n_disease
    a = np.concatenate([np.ravel(x) for x in
                        map(np.asarray, __import__("jax").tree.leaves(
                            small_bundle.variables))])
    b = np.concatenate([np.ravel(x) for x in
                        map(np.asarray, __import__("jax").tree.leaves(
                            loaded.variables))])
    assert np.array_equal(a, b)  # weights byte-identical through publish/load

    # latest resolution used by the serving loader
    latest = reg.get_model("fusion_model_T5")
    assert latest.version == 2


def test_registry_generic_fallback(tmp_path, small_bundle):
    """python.create_model failing falls back to the generic API
    (training_pipeline.py:753-767)."""
    mr = FakeModelRegistry(tmp_path / "store", python_fails=True)
    reg = HopsworksModelRegistry(project=FakeProject(mr=mr))
    v = reg.create_model("fusion model: T5!", small_bundle)
    assert v == 1
    assert mr.generic_calls == ["fusion model_ T5_"]  # sanitized name

    with pytest.raises(LookupError):
        reg.latest_version("missing_model")


def test_sanitize():
    assert _sanitize("a/b:c") == "a_b_c"
    assert len(_sanitize("x" * 500, max_len=120)) == 120
