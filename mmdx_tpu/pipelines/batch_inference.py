"""Offline batch inference CLI: a directory of studies -> JSONL, batched.

The reference can only serve one study at a time through its Django view
(reference backend/api/views.py:60-103 -> inference_pipeline.py:150-206);
there is no offline path at all — backfilling a folder of images means a
shell loop of single requests. This runs the batched engine directly:

  python -m mmdx_tpu.pipelines.batch_inference --images DIR --out out.jsonl \
      [--bundle B.mmdx] [--details-json MAP.json] [--mode fast|turbo|parity] \
      [--batch 64] [--gen beam|greedy|off] [--cpu]

One JSON line per study, the reference inference() contract plus the
filename: {"image", "report_text", "disease_probs", "disease_vector",
"model_version"}. ``--details-json`` maps filename -> patient-details text
(missing entries run with empty details, like an empty form field).
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

IMAGE_SUFFIXES = (".jpg", ".jpeg", ".png", ".bmp")


def run(engine, paths: list[Path], details: dict[str, str], batch: int,
        gen: str, out_fh) -> int:
    """Chunked offline inference with a one-chunk IO prefetcher.

    * decode + stage-1 shorter-side resize run host-side in a thread pool
      (``wire_image_u8``): under remote-device serving the host->device
      transfer (~50 MB/s tunnel) dominates, and wiring 512x512x3 decodes
      down to the post-resize image cuts those bytes 4-12x with
      reference-exact preprocessing semantics;
    * chunk i+1's decode overlaps chunk i's device work (the device call
      releases the GIL while it waits);
    * the ragged tail chunk pads to the same compiled program via
      ``pad_to`` instead of compiling a second batch size.
    """
    from concurrent.futures import ThreadPoolExecutor

    import numpy as np

    from mmdx_tpu.io.images import wire_image_u8

    rs = engine.bundle.config.image.resize_size
    # a single prefetch worker: decode runs INLINE in the prefetch task
    # (nested pool.map from a pool task deadlocks at max_workers=1, i.e.
    # any 1-CPU host); PIL releases the GIL, so one thread already overlaps
    # the device call
    pool = ThreadPoolExecutor(max_workers=1)

    def load(chunk):
        # square=True: one compiled classify shape for ANY mix of aspect
        # ratios (center crops compose — bit-identical preprocessing), and
        # mixed-shape chunks never fall to the aspect-squashing canonical
        # path
        imgs = [wire_image_u8(p.read_bytes(), rs, square=True)
                for p in chunk]
        return imgs, [details.get(p.name, "") for p in chunk]

    chunks = [paths[i:i + batch] for i in range(0, len(paths), batch)]
    n_done = 0
    nxt = pool.submit(load, chunks[0])
    for ci, chunk in enumerate(chunks):
        images, texts = nxt.result()
        if ci + 1 < len(chunks):
            nxt = pool.submit(load, chunks[ci + 1])
        k = len(chunk)
        t0 = time.perf_counter()
        probs, z_img, z_txt = engine.classify_batch(
            images, texts, pad_to=batch, host_outputs=(gen != "off"))
        reports = [""] * k
        if gen != "off":
            if k < batch:  # ride the same compiled decode program
                z_img = np.concatenate(
                    [z_img, np.repeat(z_img[-1:], batch - k, axis=0)])
                z_txt = np.concatenate(
                    [z_txt, np.repeat(z_txt[-1:], batch - k, axis=0)])
            reports = engine.generate_reports(
                z_img, z_txt, greedy=(gen == "greedy")
            )[:k]
        dt = time.perf_counter() - t0
        for j, p in enumerate(chunk):
            out_fh.write(json.dumps(
                {"image": p.name, **engine.result_dict(probs[j], reports[j])}
            ) + "\n")
        out_fh.flush()
        n_done += k
        print(f"[batch-infer] {n_done}/{len(paths)} "
              f"({k / dt:.1f} studies/s)", file=sys.stderr,
              flush=True)
    pool.shutdown(wait=False)
    return n_done


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", required=True,
                    help="directory of study images (jpg/png)")
    ap.add_argument("--out", required=True, help="output JSONL path")
    ap.add_argument("--bundle", default=None,
                    help=".mmdx or reference model_bundle.pt "
                         "(default: MMDX_BUNDLE_PATH or packaged)")
    ap.add_argument("--details-json", default=None,
                    help="JSON file mapping image filename -> patient "
                         "details text")
    ap.add_argument("--mode", default="fast",
                    choices=["parity", "fast", "turbo"])
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--gen", default="beam",
                    choices=["beam", "greedy", "off"])
    ap.add_argument("--cpu", action="store_true", help="pin jax to CPU")
    args = ap.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from mmdx_tpu.pipelines.inference_pipeline import get_model_bundle
    from mmdx_tpu.runtime.engine import InferenceEngine

    paths = sorted(
        p for p in Path(args.images).iterdir()
        if p.suffix.lower() in IMAGE_SUFFIXES
    )
    if not paths:
        ap.error(f"no images found under {args.images}")
    details = {}
    if args.details_json:
        details = json.loads(Path(args.details_json).read_text())

    bundle = get_model_bundle(args.bundle)
    # mixed-shape directories canonicalize near the wire size (post-resize
    # images are ~resize_size; the default 512 canonical would UPSCALE them)
    engine = InferenceEngine(
        bundle, mode=args.mode,
        canonical_size=int(bundle.config.image.resize_size),
    )
    out_path = Path(args.out)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    t0 = time.perf_counter()
    with out_path.open("w") as fh:
        n = run(engine, paths, details, args.batch, args.gen, fh)
    dt = time.perf_counter() - t0
    print(f"[batch-infer] wrote {n} results -> {out_path} "
          f"({dt:.1f}s incl. compile)", file=sys.stderr)


if __name__ == "__main__":
    main()
