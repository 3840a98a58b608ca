#!/usr/bin/env python
"""Calibrate a bundle for the int8 "turbo" image tower and persist the scales.

Runs the BN-folded f32 ResNet backbone over a representative image set,
records per-site activation ranges (models/resnet_int8.calibration_sites),
and writes them into the bundle's metadata ("int8_scales") so
``InferenceEngine(bundle, mode="turbo")`` quantizes deterministically instead
of calibrating on its first serving batch.

Usage:
  python scripts/calibrate_int8.py BUNDLE.mmdx [OUT.mmdx] [--images DIR]

With no --images, the packaged sample chest X-rays are used (fine for
structure; use a directory of real study images for production scales).
Replaces the calibration a torch user would run via torch.ao.quantization on
the reference backbone (reference backend/ml/pipelines/training_pipeline.py:
157-311 — the reference itself ships no quantization).
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("bundle")
    ap.add_argument("out", nargs="?", default=None)
    ap.add_argument("--images", default=None,
                    help="directory of calibration images (jpg/png)")
    ap.add_argument("--batch", type=int, default=32,
                    help="max calibration images")
    ap.add_argument("--percentile", type=float, default=None,
                    help="clip calibration at this |activation| percentile "
                         "(e.g. 99.9) instead of amax; saturates outliers "
                         "but spends the int8 grid on the bulk of the "
                         "distribution")
    ap.add_argument("--cpu", action="store_true",
                    help="pin jax to CPU (calibration is a one-off f32 "
                         "pass; also avoids hanging on an unreachable "
                         "accelerator backend)")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from mmdx_tpu.checkpoints.bundle import load_bundle, save_bundle
    from mmdx_tpu.io.images import decode_image
    from mmdx_tpu.models.resnet_int8 import calibrate_backbone
    from mmdx_tpu.ops.preprocess import preprocess_exact

    bundle = load_bundle(args.bundle)
    cfg = bundle.config.image

    if args.images:
        paths = sorted(
            p for p in Path(args.images).iterdir()
            if p.suffix.lower() in (".jpg", ".jpeg", ".png", ".bmp")
        )[: args.batch]
    else:
        paths = sorted(
            (Path(__file__).resolve().parents[1]
             / "mmdx_tpu/serve/sample_data/sample_images").glob("*.jpg")
        )
    if not paths:
        raise SystemExit("no calibration images found")
    print(f"[calibrate] {len(paths)} images", file=sys.stderr)

    batch = np.stack([
        preprocess_exact(decode_image(p.read_bytes()), cfg.img_size,
                         cfg.resize_size, cfg.mean, cfg.std)
        for p in paths
    ])
    scales = calibrate_backbone(bundle.variables, jnp.asarray(batch),
                                percentile=args.percentile)
    bundle.metadata = dict(bundle.metadata or {})
    bundle.metadata["int8_scales"] = scales
    out = args.out or args.bundle
    save_bundle(bundle, out, timestamped_copy=False)
    print(f"[calibrate] wrote {len(scales)} site scales -> {out}",
          file=sys.stderr)


if __name__ == "__main__":
    main()
