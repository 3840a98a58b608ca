"""MicroBatcher: concurrent requests aggregate into one device batch."""
import concurrent.futures
import threading

import numpy as np

from mmdx_tpu.checkpoints.bundle import new_random_bundle
from mmdx_tpu.runtime.batcher import MicroBatcher
from mmdx_tpu.runtime.engine import InferenceEngine


def test_microbatcher_concurrent(rng):
    bundle = new_random_bundle(seed=0, small=True)
    engine = InferenceEngine(bundle, mode="parity")
    batcher = MicroBatcher(engine, max_batch=8, max_wait_ms=30.0)
    try:
        imgs = [rng.integers(0, 256, (128, 128, 3), dtype=np.uint8) for _ in range(6)]
        futures = [batcher.submit(img, f"patient {i} cough") for i, img in enumerate(imgs)]
        results = [f.result(timeout=120) for f in futures]
        assert len(results) == 6
        for r in results:
            assert len(r["disease_probs"]) == 13
            assert r["report_text"] == ""
        # batched result must equal the direct single-sample path
        direct, _, _ = engine.classify_batch([imgs[0]], ["patient 0 cough"])
        np.testing.assert_allclose(
            list(results[0]["disease_probs"].values()), direct[0], rtol=1e-5, atol=1e-6
        )
    finally:
        batcher.stop()


class _CountingEngine:
    """Wraps an InferenceEngine, counting fused classify calls + batch sizes."""

    def __init__(self, engine):
        self._engine = engine
        self.calls = []
        self._lock = threading.Lock()

    def classify_batch(self, images, texts):
        with self._lock:
            self.calls.append(len(images))
        return self._engine.classify_batch(images, texts)

    def __getattr__(self, name):
        return getattr(self._engine, name)


def test_concurrent_requests_fuse_into_one_batch(rng):
    """N simultaneous submits -> ONE fused device batch, results fanned out to
    the right callers (the reference serves strictly batch=1 per request)."""
    bundle = new_random_bundle(seed=0, small=True)
    engine = _CountingEngine(InferenceEngine(bundle, mode="parity"))
    # warm the compile path so the batching window isn't spent compiling
    warm_img = rng.integers(0, 256, (96, 96, 3), dtype=np.uint8)
    engine._engine.classify_batch([warm_img] * 8, ["warm"] * 8)

    batcher = MicroBatcher(engine, max_batch=16, max_wait_ms=200.0)
    try:
        imgs = [rng.integers(0, 256, (96, 96, 3), dtype=np.uint8) for _ in range(8)]
        texts = [f"patient {i} has a cough" for i in range(8)]
        # release all submits at once from worker threads
        barrier = threading.Barrier(8)

        def fire(i):
            barrier.wait()
            return batcher.submit(imgs[i], texts[i])

        with concurrent.futures.ThreadPoolExecutor(8) as pool:
            futures = list(pool.map(fire, range(8)))
        results = [f.result(timeout=180) for f in futures]

        assert engine.calls, "no fused batch ran"
        assert max(engine.calls) >= 4, f"requests did not fuse: {engine.calls}"
        assert sum(engine.calls) >= 8
        # fan-out correctness: each caller gets its own sample's probs
        direct, _, _ = engine._engine.classify_batch(imgs, texts)
        for i, r in enumerate(results):
            np.testing.assert_allclose(
                list(r["disease_probs"].values()), direct[i], rtol=1e-4, atol=1e-5
            )
    finally:
        batcher.stop()


def test_batcher_generation_options(rng):
    """greedy + gen overrides flow through to the engine's generate path."""
    bundle = new_random_bundle(seed=0, small=True)
    engine = InferenceEngine(bundle, mode="parity")
    batcher = MicroBatcher(
        engine, max_batch=4, max_wait_ms=10.0, generate=True, greedy=True,
        gen_overrides=dict(max_new_tokens=6, min_new_tokens=1),
    )
    try:
        img = rng.integers(0, 256, (96, 96, 3), dtype=np.uint8)
        out = batcher.infer(img, "67M smoker dyspnea", timeout=300)
        assert isinstance(out["report_text"], str)
        assert len(out["disease_probs"]) == 13
    finally:
        batcher.stop()
