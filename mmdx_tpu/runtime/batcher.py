"""Dynamic micro-batcher: aggregates concurrent requests into device batches.

The reference serves batch=1 per HTTP request (reference
``inference_pipeline.py:174``) — each request pays a full model invocation.
This batcher gives the serving layer the throughput of the batched path:
requests queue up, a collector thread drains up to ``max_batch`` of them (or
whatever arrived within ``max_wait_ms``), runs ONE fused classify on the
padded batch, and distributes results back to the waiting callers.
"""
from __future__ import annotations

import queue
import threading
from concurrent.futures import Future
from dataclasses import dataclass


@dataclass
class _Item:
    image: object
    text: str
    future: Future


class MicroBatcher:
    def __init__(self, engine, max_batch: int = 32, max_wait_ms: float = 5.0,
                 generate: bool = False, greedy: bool = False,
                 gen_overrides: dict | None = None):
        self.engine = engine
        self.max_batch = max_batch
        self.max_wait_s = max_wait_ms / 1e3
        self.generate = generate
        self.greedy = greedy
        self.gen = None
        if gen_overrides:
            import dataclasses

            self.gen = dataclasses.replace(
                engine.bundle.config.generation, **gen_overrides
            )
        self._queue: queue.Queue[_Item] = queue.Queue()
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._loop, daemon=True,
                                        name="mmdx-batcher")
        self._thread.start()

    def submit(self, image, text: str) -> Future:
        """Returns a Future resolving to the reference-shaped inference dict."""
        item = _Item(image, text, Future())
        self._queue.put(item)
        return item.future

    def infer(self, image, text: str, timeout: float | None = 30.0) -> dict:
        return self.submit(image, text).result(timeout=timeout)

    def _collect(self) -> list[_Item]:
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
        return items

    def _loop(self):
        while not self._stop.is_set():
            items = self._collect()
            if not items:
                continue
            try:
                # pad to power-of-two buckets so compiled programs are reused
                n = len(items)
                bucket = 1
                while bucket < n:
                    bucket *= 2
                images = [it.image for it in items] + [items[0].image] * (bucket - n)
                texts = [it.text for it in items] + [items[0].text] * (bucket - n)
                probs, z_img, z_txt = self.engine.classify_batch(images, texts)
                reports = (
                    self.engine.generate_reports(z_img, z_txt, self.gen,
                                                 greedy=self.greedy)[:n]
                    if self.generate else [""] * n
                )
                probs = probs[:n]
                thresholds = self.engine.thresholds
                names = self.engine.bundle.class_names
                for i, it in enumerate(items):
                    it.future.set_result({
                        "report_text": reports[i],
                        "disease_probs": {
                            n: float(probs[i][j]) for j, n in enumerate(names)
                        },
                        "disease_vector": (probs[i] >= thresholds).astype(int).tolist(),
                        "model_version": self.engine.bundle.version,
                    })
            except Exception as e:
                for it in items:
                    if not it.future.done():
                        it.future.set_exception(e)

    def stop(self):
        self._stop.set()
        self._thread.join(timeout=5)
