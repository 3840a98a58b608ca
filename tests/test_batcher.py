"""MicroBatcher: concurrent requests aggregate into one device batch."""
import concurrent.futures

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
