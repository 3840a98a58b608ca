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

    def classify_batch(self, images, texts, pad_to=None, host_outputs=False):
        with self._lock:
            self.calls.append(len(images))
        return self._engine.classify_batch(
            images, texts, pad_to=pad_to, host_outputs=host_outputs)

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


class _StageProbeEngine:
    """Fake engine with controllable stage latencies, recording a timeline of
    (event, batch_tag) tuples — for pipelining/backpressure tests with no
    device work at all."""

    class _Bundle:
        class_names = ["d%d" % i for i in range(13)]
        version = 1

        class config:  # noqa: N801 - attribute shim
            generation = None

    def __init__(self, gen_gate: threading.Event | None = None,
                 distinct_reports: bool = False):
        self.bundle = self._Bundle()
        self.thresholds = np.full(13, 0.5, np.float32)
        self.timeline = []
        self.gen_sizes = []  # z batch size of every generate_reports call
        self._lock = threading.Lock()
        self.gen_gate = gen_gate  # generation blocks until set
        self.distinct_reports = distinct_reports  # "r{i}" instead of "report"

    def _log(self, event, tag):
        with self._lock:
            self.timeline.append((event, tag))

    def classify_batch(self, images, texts, pad_to=None, host_outputs=False):
        tag = texts[0]
        self._log("classify_start", tag)
        n = len(images)  # real engine slices outputs back to the true batch
        probs = np.full((n, 13), 0.25, np.float32)
        self._log("classify_end", tag)
        return probs, np.zeros((n, 4), np.float32), np.zeros((n, 4), np.float32)

    def generate_reports(self, z_img, z_txt, gen=None, greedy=False):
        n = int(z_img.shape[0])
        with self._lock:
            self.gen_sizes.append(n)
        self._log("generate_start", "gen")
        if self.gen_gate is not None:
            assert self.gen_gate.wait(timeout=30)
        self._log("generate_end", "gen")
        if self.distinct_reports:
            return [f"r{i}" for i in range(n)]
        return ["report"] * n

    def result_dict(self, probs_row, report_text):
        # mirror InferenceEngine.result_dict (the batcher calls it per item)
        return {
            "report_text": report_text,
            "disease_probs": {
                n: float(probs_row[j])
                for j, n in enumerate(self.bundle.class_names)
            },
            "disease_vector": (probs_row >= self.thresholds)
            .astype(int).tolist(),
            "model_version": self.bundle.version,
        }


def test_pipeline_overlap():
    """Batch 2's CLASSIFY must run while batch 1's GENERATE is still blocked —
    the two stages are separate threads with a handoff queue (round-2 verdict:
    the single-loop batcher serialized classify behind a ~340 ms beam-4
    generation)."""
    gate = threading.Event()
    engine = _StageProbeEngine(gen_gate=gate)
    batcher = MicroBatcher(engine, max_batch=4, max_wait_ms=5.0, generate=True)
    try:
        f1 = batcher.submit("img", "batch1")
        # wait until batch 1 is inside generate (blocked on the gate)
        for _ in range(200):
            if ("generate_start", "gen") in engine.timeline:
                break
            threading.Event().wait(0.01)
        assert ("generate_start", "gen") in engine.timeline

        f2 = batcher.submit("img", "batch2")
        # batch 2's classify must COMPLETE while batch 1's generate is blocked
        for _ in range(200):
            if ("classify_end", "batch2") in engine.timeline:
                break
            threading.Event().wait(0.01)
        assert ("classify_end", "batch2") in engine.timeline, engine.timeline
        assert ("generate_end", "gen") not in engine.timeline  # still blocked

        gate.set()
        assert f1.result(timeout=30)["report_text"] == "report"
        assert f2.result(timeout=30)["report_text"] == "report"
    finally:
        gate.set()
        batcher.stop()


def test_backpressure_saturation():
    """A full bounded input queue raises BatcherSaturated instead of queueing
    without bound."""
    from mmdx_tpu.runtime.batcher import BatcherSaturated

    gate = threading.Event()
    engine = _StageProbeEngine(gen_gate=gate)
    batcher = MicroBatcher(engine, max_batch=2, max_wait_ms=1.0,
                           generate=True, queue_depth=3)
    try:
        # stall the pipeline: batch 1 occupies generate, handoff fills, then
        # the input queue (depth 3) fills
        futures = []
        saturated = 0
        for i in range(40):
            try:
                futures.append(batcher.submit("img", f"t{i}"))
            except BatcherSaturated:
                saturated += 1
            threading.Event().wait(0.005)
        assert saturated > 0, "queue never saturated"
        gate.set()
        # everything accepted still completes
        for f in futures:
            assert f.result(timeout=30)["report_text"] == "report"
    finally:
        gate.set()
        batcher.stop()


def test_graceful_stop_drains():
    """stop(drain=True) completes queued work; later submits are rejected."""
    from mmdx_tpu.runtime.batcher import BatcherSaturated

    engine = _StageProbeEngine()
    batcher = MicroBatcher(engine, max_batch=4, max_wait_ms=5.0, generate=True)
    futures = [batcher.submit("img", f"t{i}") for i in range(6)]
    batcher.stop(drain=True)
    for f in futures:
        assert f.result(timeout=1)["report_text"] == "report"
    try:
        batcher.submit("img", "late")
        raised = False
    except BatcherSaturated:
        raised = True
    assert raised


def test_nondrain_stop_never_strands_classified_batches():
    """A non-drain stop() must resolve (with an error) every future whose
    batch was classified but not yet generated — including a handoff the
    classify thread enqueues AFTER the shutdown sentinel, and handoffs
    stranded when the sentinel could not be enqueued at all (full queue)."""
    from mmdx_tpu.runtime.batcher import BatcherSaturated

    gate = threading.Event()
    engine = _StageProbeEngine(gen_gate=gate)
    batcher = MicroBatcher(engine, max_batch=1, max_wait_ms=1.0,
                           generate=True, queue_depth=8)
    futures = []
    try:
        # fill the pipeline: batch 1 blocks inside generate; two more
        # classified batches fill both handoff slots; more wait in the queue
        for i in range(5):
            futures.append(batcher.submit("img", f"t{i}"))
            threading.Event().wait(0.05)
        for _ in range(200):
            if ("generate_start", "gen") in engine.timeline:
                break
            threading.Event().wait(0.01)
        stopper = threading.Thread(target=batcher.stop, daemon=True)
        stopper.start()
        threading.Event().wait(0.2)
        gate.set()  # unblock the in-flight generation
        stopper.join(timeout=30)
        assert not stopper.is_alive(), "stop() hung"
        # EVERY accepted future must be resolved one way or the other
        for f in futures:
            assert f.done() or f.exception(timeout=10) is not None
        results, errors = 0, 0
        for f in futures:
            try:
                f.result(timeout=10)
                results += 1
            except (BatcherSaturated, Exception):  # noqa: BLE001
                errors += 1
        assert results + errors == len(futures)
        assert errors >= 1  # the stranded ones error rather than hang
    finally:
        gate.set()
        batcher.stop()


def test_nondrain_stop_with_wedged_generate_stage():
    """stop() while the generate stage is WEDGED inside the device call (never
    returns during shutdown): the classify thread must abort its blocking
    handoff put — not hang forever — and fail that batch's futures. Regression
    for the unconditional self._handoff.put() in the classify loop."""
    gate = threading.Event()
    engine = _StageProbeEngine(gen_gate=gate)
    batcher = MicroBatcher(engine, max_batch=1, max_wait_ms=1.0,
                           generate=True, queue_depth=8)
    futures = []
    try:
        # batch 1 wedges inside generate; batches 2+3 fill both handoff
        # slots; batch 4 leaves classify BLOCKED in the handoff put
        for i in range(4):
            futures.append(batcher.submit("img", f"t{i}"))
            threading.Event().wait(0.05)
        deadline = threading.Event()
        for _ in range(400):
            ends = [e for e in engine.timeline if e[0] == "classify_end"]
            if len(ends) >= 4:
                break
            deadline.wait(0.01)
        assert len([e for e in engine.timeline if e[0] == "classify_end"]) >= 4

        stopper = threading.Thread(target=batcher.stop, daemon=True)
        stopper.start()
        stopper.join(timeout=25)  # gate NEVER opens while stopping
        assert not stopper.is_alive(), "stop() hung on a wedged generate stage"
        # the classify thread must have aborted its put and exited
        batcher._classify_thread.join(timeout=10)
        assert not batcher._classify_thread.is_alive(), (
            "classify thread still blocked in handoff.put")
        # every future except the one wedged inside generate resolves NOW
        unresolved = [f for f in futures if not f.done()]
        assert len(unresolved) <= 1, f"{len(unresolved)} futures stranded"
    finally:
        gate.set()
        batcher.stop()


def test_generate_stage_coalesces_backlog():
    """Classified batches that queue up while a generation is in flight are
    MERGED into one decode call (decode wall-clock is ~flat in batch size,
    so per-handoff generation collapses concurrent throughput — measured
    12 req/s at 32 clients before coalescing). Each caller must still get
    its own report."""
    gate = threading.Event()
    engine = _StageProbeEngine(gen_gate=gate, distinct_reports=True)
    # max_batch=1 forces every submit into its OWN classify batch/handoff
    batcher = MicroBatcher(engine, max_batch=1, max_wait_ms=1.0,
                           generate=True)
    futures = []
    try:
        # item 0 enters generate and blocks on the gate
        futures.append(batcher.submit("img", "t0"))
        for _ in range(400):
            if ("generate_start", "gen") in engine.timeline:
                break
            threading.Event().wait(0.01)
        assert ("generate_start", "gen") in engine.timeline

        # items 1-4 classify into four separate handoffs while gen is busy
        for i in range(1, 5):
            futures.append(batcher.submit("img", f"t{i}"))
        for _ in range(400):
            ends = [e for e in engine.timeline if e[0] == "classify_end"]
            if len(ends) >= 5:
                break
            threading.Event().wait(0.01)
        assert len([e for e in engine.timeline
                    if e[0] == "classify_end"]) >= 5

        gate.set()
        results = [f.result(timeout=30) for f in futures]
        # first call was the blocked single; the backlog merged into ONE call
        assert engine.gen_sizes[0] == 1, engine.gen_sizes
        assert len(engine.gen_sizes) == 2, engine.gen_sizes
        # 4 real rows ride the 8-bucket (coarse {1, 8, cap} gen ladder)
        assert engine.gen_sizes[1] == 8, engine.gen_sizes
        # fan-out: item k's report is its own row of the merged decode
        assert results[0]["report_text"] == "r0"
        for k in range(1, 5):
            assert results[k]["report_text"] == f"r{k - 1}", results[k]
        st = batcher.stats()
        assert st["gen_batches"] == 2
        assert st["mean_gen_coalesced"] == 2.5  # (1 + 4 handoffs) / 2 calls
    finally:
        gate.set()
        batcher.stop()


def test_generate_coalescing_respects_cap():
    """A merged generate batch never exceeds gen_max_batch."""
    gate = threading.Event()
    engine = _StageProbeEngine(gen_gate=gate)
    batcher = MicroBatcher(engine, max_batch=1, max_wait_ms=1.0,
                           generate=True, gen_max_batch=2)
    futures = []
    try:
        futures.append(batcher.submit("img", "t0"))
        for _ in range(400):
            if ("generate_start", "gen") in engine.timeline:
                break
            threading.Event().wait(0.01)
        for i in range(1, 5):
            futures.append(batcher.submit("img", f"t{i}"))
        for _ in range(400):
            if len([e for e in engine.timeline
                    if e[0] == "classify_end"]) >= 5:
                break
            threading.Event().wait(0.01)
        gate.set()
        for f in futures:
            assert f.result(timeout=30)["report_text"] == "report"
        assert max(engine.gen_sizes) <= 2, engine.gen_sizes
    finally:
        gate.set()
        batcher.stop()


def test_gen_coalesce_carries_overflowing_handoff():
    """A handoff that would push the merge past gen_max_batch must CARRY to
    the next decode call, not ride along: merging e.g. 6+6+6 = 18 > 16 hits
    the decoder at a novel batch shape — a fresh multi-minute TPU compile
    mid-traffic (measured as a 16 s p99 under 32-client load). Handoff sizes
    here (6) deliberately don't divide gen_max_batch (16) so the old
    ``while total < cap`` merge WOULD overshoot."""
    import time

    gate = threading.Event()
    engine = _StageProbeEngine(gen_gate=gate)
    batcher = MicroBatcher(engine, max_batch=6, max_wait_ms=40.0,
                           generate=True, gen_max_batch=16)
    futures = []
    try:
        # wave 1 classifies; its generation blocks on the gate
        futures += [batcher.submit("img", "batch1") for _ in range(6)]
        deadline = time.time() + 20
        while ("generate_start", "gen") not in engine.timeline:
            assert time.time() < deadline, engine.timeline
            time.sleep(0.01)
        # three more waves pile up as classified handoffs (18 items > 16)
        for w in (2, 3, 4):
            futures += [batcher.submit("img", f"batch{w}") for _ in range(6)]
            deadline = time.time() + 20
            while sum(1 for e in engine.timeline
                      if e[0] == "classify_end") < w:
                assert time.time() < deadline, engine.timeline
                time.sleep(0.01)
        gate.set()
        for f in futures:
            assert len(f.result(timeout=30)["disease_probs"]) == 13
        # every decode call rode a ladder bucket; nothing overshot the cap
        assert engine.gen_sizes, "no generation ran"
        assert all(s <= 16 for s in engine.gen_sizes), engine.gen_sizes
        assert all(s in {1, 8, 16} for s in engine.gen_sizes), engine.gen_sizes
        # the 18-item backlog forced at least one carry (a merge stopped at
        # the cap) — so some call actually coalesced up to the 16 bucket
        assert max(engine.gen_sizes) == 16, engine.gen_sizes
    finally:
        gate.set()
        batcher.stop()


def test_oversized_handoff_splits_across_decode_calls():
    """When classify's max_batch exceeds gen_max_batch, a single classified
    handoff must SPLIT across decode calls at the cap — never silently
    re-bucket the decoder (a novel decode shape is a multi-minute TPU
    compile) and never raise the operator's decode cap."""
    engine = _StageProbeEngine(distinct_reports=True)
    batcher = MicroBatcher(engine, max_batch=10, max_wait_ms=60.0,
                           generate=True, gen_max_batch=4)
    assert batcher.gen_max_batch == 4  # the cap is not silently raised
    futures = []
    try:
        futures += [batcher.submit("img", "batch1") for _ in range(10)]
        results = [f.result(timeout=30) for f in futures]
        # 10 items through a cap of 4 -> decode calls of 4, 4, 2 (padded to
        # ladder buckets {1, 4}): every call size must be a ladder bucket
        assert engine.gen_sizes, "no generation ran"
        assert all(s <= 4 for s in engine.gen_sizes), engine.gen_sizes
        assert sum(min(s, 4) for s in engine.gen_sizes) >= 10
        # fan-out correctness across the split: each item got a report row
        for r in results:
            assert r["report_text"].startswith("r"), r
    finally:
        batcher.stop()
