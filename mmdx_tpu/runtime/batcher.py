"""Dynamic micro-batcher: aggregates concurrent requests into device batches.

The reference serves batch=1 per HTTP request (reference
``inference_pipeline.py:174``) — each request pays a full model invocation.
This batcher gives the serving layer the throughput of the batched path:
requests queue up, a collector thread drains up to ``max_batch`` of them (or
whatever arrived within ``max_wait_ms``), runs ONE fused classify on the
padded batch, and distributes results back to the waiting callers.

Pipelined (round 3): classification and generation run on separate stage
threads with a bounded handoff queue, so batch N+1's classify overlaps batch
N's (much slower) beam-search generation — with beam-4 on, a B=64 generation
is ~340 ms during which the classify stage keeps draining the input queue.

Coalescing (round 3): the generate stage merges every classified batch
already waiting in the handoff queue into ONE decode call (up to
``gen_max_batch``). Beam decode runs 150-180 *sequential* steps whose
per-step cost is nearly flat in batch size up to B=64, so a generation
batch of 4 costs the same wall-clock as one of 32 — without coalescing,
staggered arrivals form small generate batches and concurrent throughput
collapses to ~batch_size/decode_time (measured: 12 req/s at 32 closed-loop
clients; the decode loop was the serialized bottleneck at mean batch ~4).
A merge never exceeds ``gen_max_batch``: a handoff that would overflow the
bucket carries over to the next decode call (an over-bucket batch is a
novel shape — a fresh multi-minute TPU compile mid-traffic).

Backpressure: the input queue is bounded (``queue_depth``); when it is full
``submit`` raises ``BatcherSaturated`` and the HTTP layer translates that to
503 + Retry-After instead of letting latency (and memory) grow without bound.

Shutdown: ``stop(drain=True)`` stops accepting work, lets both stages empty
their queues, then joins the threads — in-flight requests complete.
"""
from __future__ import annotations

import os
import queue
import threading
from concurrent.futures import Future
from dataclasses import dataclass


class BatcherSaturated(RuntimeError):
    """Input queue at capacity — shed load upstream (HTTP 503)."""


def classify_bucket_ladder(max_batch: int) -> tuple[int, ...]:
    """Classify-batch buckets: {1, 8, then powers of two} up to max_batch.

    Finer than the generate ladder on purpose: a classify call's cost is
    dominated by the raw-u8 host->device transfer (bucket * H * W * 3 bytes
    rides the remote-device tunnel every call), so padding an 11-request
    batch to 64 ships ~6x the bytes the requests need — measured 172 ms
    classify p50 under 32-client load where the compute is ~10 ms. Each
    bucket is one compiled program (warmed at boot, replayed from the
    persistent compile cache on restarts). MMDX_CLASSIFY_BUCKETS=comma-list
    overrides.
    """
    raw = os.environ.get("MMDX_CLASSIFY_BUCKETS", "")
    if raw:
        ladder = {int(x) for x in raw.split(",")
                  if x.strip() and 0 < int(x) <= max_batch}
    else:
        ladder = {1, 8}
        b = 16
        while b < max_batch:
            ladder.add(b)
            b *= 2
    ladder.add(max_batch)
    return tuple(sorted(b for b in ladder if 0 < b <= max_batch))


@dataclass
class _Item:
    image: object
    text: str
    future: Future


@dataclass
class _Handoff:
    """Classified batch awaiting report generation."""

    items: list
    probs: object  # np [bucket, 13]
    z_img: object
    z_txt: object


class MicroBatcher:
    def __init__(self, engine, max_batch: int = 32, max_wait_ms: float = 5.0,
                 generate: bool = False, greedy: bool = False,
                 gen_overrides: dict | None = None, queue_depth: int = 0,
                 gen_max_batch: int = 64):
        self.engine = engine
        self.max_batch = max_batch
        self.max_wait_s = max_wait_ms / 1e3
        self.generate = generate
        self.greedy = greedy
        # beam decode throughput saturates at B=64 on v5e (larger batches
        # cost MORE per report); coalesced generate batches cap here. The
        # cap is REAL even when max_batch exceeds it: an oversized classified
        # handoff is split across decode calls in _generate_loop (never
        # silently re-bucketed — that would compile a novel decode shape)
        self.gen_max_batch = gen_max_batch
        self.classify_buckets = classify_bucket_ladder(max_batch)
        self.gen = None
        if gen_overrides:
            import dataclasses

            self.gen = dataclasses.replace(
                engine.bundle.config.generation, **gen_overrides
            )
        # default depth: 4 full batches queued before load shedding
        self.queue_depth = queue_depth or 4 * max_batch
        self._queue: queue.Queue[_Item] = queue.Queue(maxsize=self.queue_depth)
        # observability counters (served by GET /api/stats/)
        self._stats_lock = threading.Lock()
        self._n_submitted = 0
        self._n_shed = 0
        self._n_batches = 0
        self._batch_sizes_sum = 0
        self._n_gen_batches = 0
        self._gen_sizes_sum = 0
        self._gen_handoffs_sum = 0
        # last-N wall-clock of each stage's device call (serving-bottleneck
        # diagnosis: which stage actually paces a loaded server)
        import collections

        self._classify_times = collections.deque(maxlen=256)
        self._generate_times = collections.deque(maxlen=256)
        # handoff between the classify and generate stages; deep enough that
        # classified batches PILE UP while a generation is in flight — that
        # backlog is exactly what the generate stage coalesces into its next
        # (much more efficient) decode call. Futures stay bounded by the
        # input queue either way.
        self._handoff: queue.Queue[_Handoff] = queue.Queue(maxsize=8)
        self._gen_busy = threading.Event()  # a decode is holding the device
        self._gen_last_end = 0.0  # when the last decode finished
        self._stop = threading.Event()
        self._draining = threading.Event()
        self._classify_thread = threading.Thread(
            target=self._classify_loop, daemon=True, name="mmdx-batcher-classify"
        )
        self._classify_thread.start()
        self._generate_thread = None
        if self.generate:
            self._generate_thread = threading.Thread(
                target=self._generate_loop, daemon=True,
                name="mmdx-batcher-generate",
            )
            self._generate_thread.start()

    # -- client API ------------------------------------------------------
    def submit(self, image, text: str) -> Future:
        """Returns a Future resolving to the reference-shaped inference dict.

        Raises BatcherSaturated when the bounded input queue is full or the
        batcher is shutting down.
        """
        if self._stop.is_set() or self._draining.is_set():
            raise BatcherSaturated("batcher is shutting down")
        item = _Item(image, text, Future())
        try:
            self._queue.put_nowait(item)
        except queue.Full:
            with self._stats_lock:
                self._n_shed += 1
            raise BatcherSaturated(
                f"input queue at capacity ({self.queue_depth})"
            ) from None
        with self._stats_lock:
            self._n_submitted += 1
        return item.future

    def infer(self, image, text: str, timeout: float | None = 30.0) -> dict:
        return self.submit(image, text).result(timeout=timeout)

    # -- stage 1: collect + classify --------------------------------------
    def _classify_bucket(self, n: int) -> int:
        for b in self.classify_buckets:
            if b >= n:
                return b
        return self.max_batch

    def _collect(self) -> list[_Item]:
        import time

        try:
            first = self._queue.get(timeout=0.1)
        except queue.Empty:
            return []
        items = [first]
        deadline = threading.Event()
        # drain whatever arrives within the batching window
        timer = threading.Timer(self.max_wait_s, deadline.set)
        timer.start()
        try:
            while len(items) < self.max_batch and not deadline.is_set():
                try:
                    items.append(self._queue.get(timeout=self.max_wait_s / 4))
                except queue.Empty:
                    if self._queue.empty():
                        break
        finally:
            timer.cancel()
        # Classify-call consolidation + cohort merge (round 4, measured):
        # (a) while a decode holds the device a classify call can't execute
        # anyway — keep draining arrivals into THIS batch instead of burning
        # fixed per-call cost (dispatch RPC + bucket padding) on several
        # small classify calls that would all queue behind the same decode;
        # (b) when the decode finishes, hold a short GRACE window so the
        # clients it just released can re-submit and join this batch.
        # Without (b), closed-loop clients phase-lock into two alternating
        # half-size cohorts: each decode carries only the requests released
        # two decodes ago (measured on-chip: 32 clients -> 15.3-row decodes,
        # p50 = exactly two decode+classify cycles = 742 ms, 46 rps).
        # Merging the cohorts roughly doubles rows per decode at ~flat
        # decode cost. The branch engages while a decode is in flight OR
        # shortly after one ended (the released cohort is still traversing
        # the HTTP handlers — on the 1-CPU box a 32-cohort takes ~100 ms to
        # re-arrive); a cold pipeline never waits. MMDX_CLASSIFY_CONSOLIDATE=0
        # disables; MMDX_COHORT_GRACE_MS tunes the idle-gap window.
        if (self.generate
                and (self._gen_busy.is_set()
                     or time.perf_counter() - self._gen_last_end < 1.0)
                and os.environ.get("MMDX_CLASSIFY_CONSOLIDATE", "1") != "0"):
            grace = float(
                os.environ.get("MMDX_COHORT_GRACE_MS", "35")) / 1e3
            cap = time.perf_counter() + 1.5  # decode-length safety bound
            last = time.perf_counter()
            was_busy = True
            while (len(items) < self.max_batch and not self._stop.is_set()
                   and time.perf_counter() < cap):
                busy = self._gen_busy.is_set()
                if was_busy and not busy:
                    last = time.perf_counter()  # grace starts at decode end
                was_busy = busy
                try:
                    items.append(self._queue.get(timeout=0.005))
                    last = time.perf_counter()
                except queue.Empty:
                    if not busy and time.perf_counter() - last > grace:
                        break
        return items

    def _classify_loop(self):
        while not self._stop.is_set():
            if self._draining.is_set() and self._queue.empty():
                break
            items = self._collect()
            if not items:
                continue
            try:
                # bucket the batch size so compiled programs are reused —
                # every distinct batch size is a separate TPU program. The
                # engine pads the STACKED arrays (pad_to=...): padding the
                # item list here would re-decode the pad image per copy in
                # this stage thread, serialized with device dispatch
                n = len(items)
                bucket = self._classify_bucket(n)
                images = [it.image for it in items]
                texts = [it.text for it in items]
                import time

                t0 = time.perf_counter()
                # host_outputs: z must come back as numpy — the generate
                # stage assembles merges with host slices/concats, and
                # device-resident z would turn those into per-shape eager
                # device compiles (seconds each through remote compile;
                # measured as ~15 s p99 waves under load)
                probs, z_img, z_txt = self.engine.classify_batch(
                    images, texts, pad_to=bucket, host_outputs=True)
                dt = time.perf_counter() - t0
                with self._stats_lock:
                    self._n_batches += 1
                    self._batch_sizes_sum += n
                    self._classify_times.append(dt)
                if self.generate:
                    # hand off to the generate stage; blocks only when two
                    # classified batches are already waiting (bounded
                    # pipelining, not unbounded buffering). Must stay
                    # interruptible: after a non-drain stop() the generate
                    # stage may already be gone (or wedged inside the device
                    # call), and an unconditional blocking put would strand
                    # this batch's futures until every caller times out.
                    h = _Handoff(items, probs, z_img, z_txt)
                    while True:
                        # checked BEFORE the put: stop()'s failure sweep runs
                        # >=5s after _stop is set, so a handoff enqueued here
                        # (within 0.5s of a false check) is always swept —
                        # never stranded behind the sweep
                        if self._stop.is_set():
                            err = BatcherSaturated("batcher stopped")
                            for it in items:
                                if not it.future.done():
                                    it.future.set_exception(err)
                            break
                        try:
                            self._handoff.put(h, timeout=0.5)
                            break
                        except queue.Full:
                            continue
                else:
                    self._resolve(items, probs, [""] * n)
            except Exception as e:  # noqa: BLE001
                for it in items:
                    if not it.future.done():
                        it.future.set_exception(e)
        # signal the generate stage that no more handoffs are coming. The
        # sentinel must be delivered RELIABLY: dropping it on queue.Full
        # leaves the generate thread blocked on get() forever (it frees a
        # slot every time it consumes a handoff, so retry while it lives)
        if self.generate:
            while True:
                try:
                    self._handoff.put(None, timeout=0.5)
                    break
                except queue.Full:
                    t = self._generate_thread
                    if t is None or not t.is_alive():
                        break

    # -- stage 2: generate -------------------------------------------------
    def gen_bucket(self, n: int) -> int:
        """Smallest generate-batch bucket >= n from the coarse ladder
        {1, 8, gen_max_batch} (single requests stay cheap; everything else
        rides one of two batched programs)."""
        for b in sorted({1, min(8, self.gen_max_batch), self.gen_max_batch}):
            if b >= n:
                return b
        return self.gen_max_batch

    def _generate_loop(self):
        done = False
        carry = None  # handoff that would have overflowed the previous merge
        while True:
            if carry is not None:
                h, carry = carry, None
            else:
                if done:
                    break
                h = self._handoff.get()
                if h is None:
                    break
            # a handoff larger than the decode cap (classify max_batch can
            # exceed gen_max_batch) splits across decode calls: process the
            # first cap-sized piece now, carry the remainder (an oversized
            # remainder re-splits next iteration)
            if len(h.items) > self.gen_max_batch:
                cap = self.gen_max_batch
                carry = _Handoff(h.items[cap:], h.probs[cap:],
                                 h.z_img[cap:], h.z_txt[cap:])
                h = _Handoff(h.items[:cap], h.probs[:cap],
                             h.z_img[:cap], h.z_txt[:cap])
            # coalesce: merge every batch that classified while the previous
            # generation was running into this decode call (see module doc —
            # decode wall-clock is ~flat in batch size, so this multiplies
            # throughput under concurrent load). NEVER past gen_max_batch:
            # an over-bucket merge would reach the decoder at a novel batch
            # shape, i.e. a fresh multi-minute TPU compile mid-traffic (this
            # exact stall measured as a 16 s p99 under 32-client load) — a
            # handoff that doesn't fit carries over to the next call instead
            merged = [h]
            total = len(h.items)
            while total < self.gen_max_batch:
                try:
                    nxt = self._handoff.get_nowait()
                except queue.Empty:
                    break
                if nxt is None:
                    done = True  # classify stage is finished; exit after this
                    break
                if total + len(nxt.items) > self.gen_max_batch:
                    carry = nxt
                    break
                merged.append(nxt)
                total += len(nxt.items)
            if self._stop.is_set() and not self._draining.is_set():
                err = BatcherSaturated("batcher stopped")
                for b in merged:
                    for it in b.items:
                        if not it.future.done():
                            it.future.set_exception(err)
                continue
            try:
                # assemble the merged batch in NUMPY (z arrives host-side
                # from the classify stage): every slice/concat/pad here has
                # a shape that varies with the live batch mix, and as eager
                # DEVICE ops each novel shape would be a fresh multi-second
                # remote compile — the measured ~15 s p99 stall waves under
                # 32-client load. Host assembly is shape-oblivious; the one
                # device program that runs is the warmed gen-bucket decode
                import numpy as np

                zi = np.concatenate(
                    [b.z_img[:len(b.items)] for b in merged])
                zt = np.concatenate(
                    [b.z_txt[:len(b.items)] for b in merged])
                # pad the combined batch to a COARSE bucket so the decode
                # program is reused across load patterns. Decode wall-clock
                # is ~flat in batch size, so over-padding is nearly free in
                # time while every distinct size costs a full TPU compile
                # (30-60 s over the remote-compile tunnel) — three programs
                # bound the cold-start surface
                n = zi.shape[0]
                bucket = self.gen_bucket(n)
                if bucket > n:
                    zi = np.concatenate(
                        [zi, np.repeat(zi[-1:], bucket - n, axis=0)])
                    zt = np.concatenate(
                        [zt, np.repeat(zt[-1:], bucket - n, axis=0)])
                import time

                t0 = time.perf_counter()
                self._gen_busy.set()  # classify consolidates while we decode
                try:
                    reports = self.engine.generate_reports(
                        zi, zt, self.gen, greedy=self.greedy
                    )
                finally:
                    self._gen_last_end = time.perf_counter()
                    self._gen_busy.clear()
                dt_gen = time.perf_counter() - t0
                with self._stats_lock:
                    self._generate_times.append(dt_gen)
                off = 0
                for b in merged:
                    k = len(b.items)
                    self._resolve(b.items, b.probs, reports[off:off + k])
                    off += k
                with self._stats_lock:
                    self._n_gen_batches += 1
                    self._gen_sizes_sum += total
                    self._gen_handoffs_sum += len(merged)
            except Exception as e:  # noqa: BLE001
                for b in merged:
                    for it in b.items:
                        if not it.future.done():
                            it.future.set_exception(e)

    def _resolve(self, items, probs, reports):
        for i, it in enumerate(items):
            it.future.set_result(self.engine.result_dict(probs[i], reports[i]))

    # -- observability -----------------------------------------------------
    def stats(self) -> dict:
        """Point-in-time batcher counters (for the /api/stats/ route)."""
        with self._stats_lock:
            n_sub, n_shed = self._n_submitted, self._n_shed
            n_b, sizes = self._n_batches, self._batch_sizes_sum
            n_g, g_sizes = self._n_gen_batches, self._gen_sizes_sum
            g_merged = self._gen_handoffs_sum
            ct = sorted(self._classify_times)
            gt = sorted(self._generate_times)
        p50 = lambda xs: round(xs[len(xs) // 2] * 1e3, 1) if xs else None
        return {
            "classify_call_p50_ms": p50(ct),
            "generate_call_p50_ms": p50(gt),
            "submitted": n_sub,
            "shed": n_shed,
            "batches": n_b,
            "mean_batch_size": round(sizes / n_b, 2) if n_b else None,
            "gen_batches": n_g,
            "mean_gen_batch_size": round(g_sizes / n_g, 2) if n_g else None,
            # >1.0 means the generate stage is actually merging backlogged
            # classified batches (the concurrent-throughput lever)
            "mean_gen_coalesced": round(g_merged / n_g, 2) if n_g else None,
            "queue_size": self._queue.qsize(),
            "queue_depth": self.queue_depth,
            "pipelined_generate": self.generate,
        }

    # -- lifecycle ---------------------------------------------------------
    def stop(self, drain: bool = False, timeout: float = 30.0):
        """Stop the batcher. ``drain=True`` completes queued work first
        (new submits are rejected immediately either way)."""
        if drain:
            self._draining.set()
            self._classify_thread.join(timeout=timeout)
            if self._generate_thread is not None:
                self._generate_thread.join(timeout=timeout)
        self._stop.set()
        if not drain:
            # unblock the generate stage if it's waiting on the handoff
            try:
                self._handoff.put_nowait(None)
            except queue.Full:
                pass
        self._classify_thread.join(timeout=5)
        if self._generate_thread is not None:
            self._generate_thread.join(timeout=5)
        # fail whatever is still queued — both the input queue AND any
        # classified batch stranded in the handoff (a non-drain stop's
        # sentinel can be enqueued ahead of a handoff the classify thread
        # adds afterwards; those futures must not hang their callers)
        err = BatcherSaturated("batcher stopped")
        while True:
            try:
                it = self._queue.get_nowait()
            except queue.Empty:
                break
            if not it.future.done():
                it.future.set_exception(err)
        while True:
            try:
                h = self._handoff.get_nowait()
            except queue.Empty:
                break
            if h is not None:
                for it in h.items:
                    if not it.future.done():
                        it.future.set_exception(err)
