"""Per-layer fp32 parity diagnosis vs the reference torch stack — where does
bitwise break, and by how much?

BASELINE.json's north star says "bit-for-bit at fp32"; the shipped e2e
certificate measures probs agreeing to ~3.6e-7 (<= 1e-5 asserted) with exact
thresholded vectors and exact report token ids. This script confronts the gap
head-on: it runs BOTH stacks on the reference's own sample assets and compares
EVERY mapped layer output in bits (max |diff|, max rel, max ulp distance),
reporting the first point of divergence.

Expected finding (recorded in NOTES.md): the preprocessed input tensor is
bit-identical (0 ulp); bitwise breaks at the FIRST dot-product op (the
ResNet stem conv / the BERT embedding LayerNorm matmul chain), because
PyTorch's CPU backend (oneDNN blocked GEMM) and XLA (its own tiled reduction
schedule) sum the same products in different orders and fp32 addition is not
associative. Everything downstream amplifies those few-ulp seeds. Matching
bit-for-bit would require forcing one global summation order through two
independently scheduled backends — i.e. scalar-ordered loops on both sides,
orders of magnitude off speed-of-light on either. The deviation is therefore
accepted and quantified: per-layer ulp table + the e2e tolerance, plus a
self-determinism check (our stack IS bitwise reproducible run-to-run).

Usage: python scripts/parity_layers.py [--out /tmp/parity_layers]
"""
import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")
sys.path.insert(0, "/root/repo/scripts")

import numpy as np
import torch

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
from PIL import Image


def ulp_distance(a: np.ndarray, b: np.ndarray) -> int:
    """Max distance in representable float32 steps between two arrays."""
    ai = a.astype(np.float32).view(np.int32).astype(np.int64)
    bi = b.astype(np.float32).view(np.int32).astype(np.int64)
    # map the sign-magnitude int space onto a monotonic lattice
    ai = np.where(ai < 0, np.int64(-(2**31)) - ai, ai)
    bi = np.where(bi < 0, np.int64(-(2**31)) - bi, bi)
    return int(np.max(np.abs(ai - bi))) if a.size else 0


def stat(name, a, b):
    a = np.asarray(a, np.float32).reshape(-1)
    b = np.asarray(b, np.float32).reshape(-1)
    assert a.shape == b.shape, (name, a.shape, b.shape)
    diff = np.abs(a - b)
    denom = np.maximum(np.abs(b), 1e-12)
    return {
        "layer": name,
        "max_abs": float(diff.max()) if a.size else 0.0,
        "max_rel": float((diff / denom).max()) if a.size else 0.0,
        "ulp": ulp_distance(a, b),
        "bitwise": bool(np.array_equal(a.view(np.int32), b.view(np.int32))),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/parity_layers")
    args = ap.parse_args()
    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    t0 = time.time()

    def log(m):
        print(f"[{time.time() - t0:5.0f}s] {m}", file=sys.stderr, flush=True)

    # ---- both stacks on identical weights (the e2e certificate's setup)
    from parity_e2e import (
        TorchFusion,
        TorchText,
        preprocess_torch,
    )
    from torch_oracles.reference_writer import save_reference_model_bundle
    from torch_oracles.resnet_torch import TorchImageEncoder, randomize_bn_stats

    torch.manual_seed(0)
    img_m, txt_m, fus_m = TorchImageEncoder(), TorchText(), TorchFusion()
    randomize_bn_stats(img_m, seed=0)
    img_m.eval(), txt_m.eval(), fus_m.eval()
    log("torch stack built")

    from mmdx_tpu.config import DISEASES

    bundle_pt = save_reference_model_bundle(
        fus_m, img_m, txt_m, out_dir, registry_version=1,
        hf_model_name="t5-small",
        artifacts={"class_names": list(DISEASES), "thresholds": [0.5] * 13})

    from mmdx_tpu.checkpoints.bundle import bundle_from_torch
    from mmdx_tpu.models.diagnosis import MultiModalDiagnosisModel

    mb = bundle_from_torch(bundle_pt)
    model = MultiModalDiagnosisModel(config=mb.config, dtype=None)  # fp32
    log("bundle imported")

    # ---- sample input: the reference's own e1.jpg + its patient details
    ref = Path("/root/reference/backend")
    img_pil = Image.open(ref / "sample_images" / "e1.jpg").convert("RGB")
    details = json.loads(
        (ref / "sample_details" / "patient_details.json").read_text())
    text = details[0]["patient_details"] if isinstance(details, list) else \
        next(iter(details.values()))

    # preproc: ours is certified bit-exact vs the PIL reference path — verify
    x_t = preprocess_torch(img_pil).unsqueeze(0)  # [1,3,224,224]
    from mmdx_tpu.ops.preprocess import preprocess_exact

    x_j = preprocess_exact(np.asarray(img_pil))[None]  # [1,224,224,3]
    pre = stat("preprocess", np.transpose(np.asarray(x_j), (0, 3, 1, 2)),
               x_t.numpy())
    log(f"preprocess bitwise: {pre['bitwise']} (ulp {pre['ulp']})")

    # tokenize once with our WordPiece (both stacks consume the same ids)
    tok, _ = mb.tokenizers()
    enc = tok.encode_batch([text], max_len=mb.config.text.max_len)
    ids = np.asarray(enc["input_ids"], np.int32)
    mask = np.asarray(enc["attention_mask"], np.int32)
    tt = np.asarray(enc["token_type_ids"], np.int32)

    # ---- torch per-layer captures
    tcap: dict[str, np.ndarray] = {}

    def hook(name):
        def fn(_m, _i, out):
            o = out[0] if isinstance(out, tuple) else out
            if torch.is_tensor(o):
                tcap[name] = o.detach().numpy().copy()
        return fn

    bb = img_m.backbone
    bb[0].register_forward_hook(hook("img/conv_stem"))
    bb[1].register_forward_hook(hook("img/bn_stem"))
    for s in range(4):
        bb[4 + s].register_forward_hook(hook(f"img/layer{s + 1}"))
    img_m.proj.register_forward_hook(hook("img/proj"))
    txt_m.encoder.embeddings.register_forward_hook(hook("txt/embeddings"))
    for i in (0, 5, 11):
        txt_m.encoder.encoder.layer[i].register_forward_hook(
            hook(f"txt/layer{i}"))
    txt_m.proj.register_forward_hook(hook("txt/proj"))
    fus_m.fusion_mlp.register_forward_hook(hook("fus/mlp"))
    fus_m.disease_head.register_forward_hook(hook("fus/disease_logits"))

    with torch.no_grad():
        z_img_t = img_m(x_t)["embeddings"]
        z_txt_t = txt_m(torch.from_numpy(ids).long(),
                        torch.from_numpy(mask).long(),
                        torch.from_numpy(tt).long())["embeddings"]
        logits_t = fus_m(z_img_t, z_txt_t)["disease_logits"]
        probs_t = torch.sigmoid(logits_t).numpy()
    # NCHW -> NHWC for comparison with flax convs
    for k in list(tcap):
        if k.startswith("img/") and tcap[k].ndim == 4:
            tcap[k] = np.transpose(tcap[k], (0, 2, 3, 1))
    log("torch per-layer captures done")

    # ---- our per-layer captures (capture_intermediates)
    out, state = model.apply(
        mb.variables, jnp.asarray(x_j), jnp.asarray(ids), jnp.asarray(mask),
        jnp.asarray(tt), method=MultiModalDiagnosisModel.classify,
        capture_intermediates=True, mutable=["intermediates"],
    )
    inter = state["intermediates"]

    def pick(*path):
        node = inter
        for p in path:
            node = node[p]
        return np.asarray(node["__call__"][0])

    jcap = {
        "img/conv_stem": pick("image_encoder", "backbone", "conv_stem"),
        "img/bn_stem": pick("image_encoder", "backbone", "bn_stem"),
        "img/proj": pick("image_encoder", "proj"),
        "txt/embeddings": pick("text_encoder", "bert", "embeddings_ln"),
        "txt/proj": pick("text_encoder", "proj"),
        "fus/disease_logits": pick("fusion", "disease_head"),
    }
    for s in range(4):
        n_blocks = {1: 3, 2: 4, 3: 6, 4: 3}[s + 1]
        jcap[f"img/layer{s + 1}"] = pick(
            "image_encoder", "backbone", f"layer{s + 1}_block{n_blocks - 1}")
    for i in (0, 5, 11):
        jcap[f"txt/layer{i}"] = pick("text_encoder", "bert", f"layer{i}")
    probs_j = np.asarray(out["probs"])
    log("jax per-layer captures done")

    # ---- the table
    order = ["preprocess", "img/conv_stem", "img/bn_stem", "img/layer1",
             "img/layer2", "img/layer3", "img/layer4", "img/proj",
             "txt/embeddings", "txt/layer0", "txt/layer5", "txt/layer11",
             "txt/proj", "fus/disease_logits", "probs"]
    rows = [pre]
    for name in order[1:-1]:
        a, b = jcap[name], tcap[name]
        if name.startswith("txt/layer") or name == "txt/embeddings":
            # compare only unmasked positions: our fused attention writes
            # garbage-but-masked pad rows by design
            L = int(mask.sum())
            a, b = a[:, :L], b[:, :L]
        rows.append(stat(name, a, b))
    rows.append(stat("probs", probs_j, probs_t))

    # ---- self-determinism: our stack re-run -> identical bits
    out2, _ = model.apply(
        mb.variables, jnp.asarray(x_j), jnp.asarray(ids), jnp.asarray(mask),
        jnp.asarray(tt), method=MultiModalDiagnosisModel.classify,
        capture_intermediates=True, mutable=["intermediates"],
    )
    self_det = bool(np.array_equal(
        np.asarray(out2["probs"]).view(np.int32), probs_j.view(np.int32)))

    hdr = f"{'layer':<20}{'max_abs':>12}{'max_rel':>12}{'ulp':>12}  bitwise"
    print(hdr)
    print("-" * len(hdr))
    first_break = None
    for r in rows:
        if not r["bitwise"] and first_break is None:
            first_break = r["layer"]
        print(f"{r['layer']:<20}{r['max_abs']:>12.3e}{r['max_rel']:>12.3e}"
              f"{r['ulp']:>12d}  {r['bitwise']}")
    print(f"\nfirst bitwise divergence: {first_break}")
    print(f"our stack self-deterministic (re-run -> identical bits): {self_det}")

    (out_dir / "layers.json").write_text(json.dumps({
        "rows": rows, "first_bitwise_divergence": first_break,
        "self_deterministic": self_det,
    }, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
