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
    n_done = 0
    for i in range(0, len(paths), batch):
        chunk = paths[i:i + batch]
        images = [p.read_bytes() for p in chunk]
        texts = [details.get(p.name, "") for p in chunk]
        t0 = time.perf_counter()
        probs, z_img, z_txt = engine.classify_batch(images, texts)
        reports = [""] * len(chunk)
        if gen != "off":
            reports = engine.generate_reports(
                z_img, z_txt, greedy=(gen == "greedy")
            )
        dt = time.perf_counter() - t0
        for j, p in enumerate(chunk):
            out_fh.write(json.dumps(
                {"image": p.name, **engine.result_dict(probs[j], reports[j])}
            ) + "\n")
        out_fh.flush()
        n_done += len(chunk)
        print(f"[batch-infer] {n_done}/{len(paths)} "
              f"({len(chunk) / dt:.1f} studies/s)", file=sys.stderr,
              flush=True)
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
    engine = InferenceEngine(bundle, mode=args.mode)
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
