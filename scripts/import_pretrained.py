#!/usr/bin/env python
"""Assemble a training-ready bundle from local pretrained checkpoint files.

The production-equivalent starting point: the reference fine-tunes from
ResNet-50 ImageNet1K-V2 + BERT-base + T5-small (training_pipeline.py:176-197,
360, 545), never from scratch. This CLI grafts those trunks (from files you
already have — zero egress) into a fresh bundle ready for
run_training_pipeline.

Usage:
  python scripts/import_pretrained.py --out /path/bundle.mmdx \
      [--resnet resnet50-11ad3fa6.pth] [--bert pytorch_model.bin] \
      [--t5 model.safetensors] [--seed 0]

Any subset of towers may be given; the rest stay randomly initialized (heads
are always fresh, like the reference).
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", required=True, help="output bundle path (.mmdx)")
    ap.add_argument("--resnet", help="torchvision resnet50 state-dict file")
    ap.add_argument("--bert", help="HF BertModel/BertFor* state-dict file")
    ap.add_argument("--t5", help="HF T5ForConditionalGeneration state-dict file")
    ap.add_argument("--seed", type=int, default=0,
                    help="seed for the fresh heads")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")  # host-side assembly only

    from mmdx_tpu.checkpoints.bundle import save_bundle
    from mmdx_tpu.checkpoints.pretrained import bundle_from_pretrained

    if not (args.resnet or args.bert or args.t5):
        ap.error("give at least one of --resnet/--bert/--t5 "
                 "(otherwise the bundle is pure random init)")

    bundle = bundle_from_pretrained(
        resnet=args.resnet, bert=args.bert, t5=args.t5, seed=args.seed)
    out = save_bundle(bundle, args.out, timestamped_copy=False)
    prov = bundle.metadata.get("pretrained", {})
    print(f"wrote {out}  (pretrained towers: {sorted(prov) or 'none'})")


if __name__ == "__main__":
    main()
