"""Full-size END-TO-END fp32 parity certificate vs the reference torch stack.

BASELINE's core clause: match the reference's per-sample predictions on its
own sample assets (``backend/sample_images/{e1,e2}.jpg`` +
``backend/sample_details/patient_details.json``) at fp32. This script runs
BOTH stacks end-to-end at FULL dims on those exact assets and asserts:

  * the 13 disease probabilities agree to <= 1e-5 (max abs diff printed),
  * the thresholded disease vectors are identical,
  * the beam-4 report token ids are IDENTICAL (the reference's generation
    config: max 180 / min 150 new tokens, no_repeat_ngram 3, length_penalty
    1.1, early_stopping; inference_pipeline.py:190).

Reference side (torch, CPU): reference-shaped modules at full dims
(ImageEncoderCNN / TextEncoderTransformer / FusionTransformerModel semantics,
training_pipeline.py:157-618) with seeded random weights (zero egress — no
pretrained checkpoints are reachable; parity on identical weights is the
certified property), the reference's preprocessing (torchvision's PIL backend
== plain PIL resize + center crop + normalize, training_pipeline.py:112-119)
and HF ``generate`` beam search exactly as ``inference()`` invokes it
(inference_pipeline.py:150-206).

Our side: the torch bundle is exported to the reference's model_bundle.pt
format, imported through ``get_model_bundle`` (the serving load path), and
run through the parity-mode InferenceEngine. Both sides tokenize the patient
details with the SAME WordPiece vocab (tokenizer-implementation parity is
certified separately by scripts/verify_tokenizers.py against real vocabs).

Runtime: ~5-15 min on the 1-CPU box (two full beam-4 decodes of >=150 tokens
per stack). ``--quick`` drops generation to 24/8 tokens for a smoke run.
"""
import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import numpy as np
import torch

import jax

jax.config.update("jax_platforms", "cpu")

from PIL import Image
from transformers import BertConfig, BertModel, T5Config, T5ForConditionalGeneration
from transformers.modeling_outputs import BaseModelOutput

from torch_oracles.resnet_torch import TorchImageEncoder, randomize_bn_stats

REF = Path("/root/reference/backend")
IMAGENET_MEAN = [0.485, 0.456, 0.406]
IMAGENET_STD = [0.229, 0.224, 0.225]


# ---------------------------------------------------------------- torch side
class TorchText(torch.nn.Module):
    """Reference TextEncoderTransformer (training_pipeline.py:348-508)."""

    def __init__(self):
        super().__init__()
        self.encoder = BertModel(BertConfig())  # bert-base dims
        self.proj = torch.nn.Linear(768, 512)
        self.classifier = torch.nn.Linear(512, 13)

    def forward(self, input_ids, attention_mask, token_type_ids):
        out = self.encoder(input_ids=input_ids, attention_mask=attention_mask,
                           token_type_ids=token_type_ids, return_dict=True)
        mask = attention_mask.unsqueeze(-1).type_as(out.last_hidden_state)
        pooled = (out.last_hidden_state * mask).sum(1) / mask.sum(1).clamp(min=1e-6)
        return {"embeddings": self.proj(pooled)}


class TorchFusion(torch.nn.Module):
    """Reference FusionTransformerModel (training_pipeline.py:516-618)."""

    def __init__(self):
        super().__init__()
        # the attribute surface the reference's bundle writer reads via
        # getattr (training_pipeline.py:520-551,686-691)
        self.d_img, self.d_txt, self.d_fuse_hidden = 1024, 512, 1024
        self.n_disease, self.n_cond_tokens, self.n_cond = 13, 4, 4
        self.fusion_mlp = torch.nn.Sequential(
            torch.nn.Linear(1536, 1024), torch.nn.GELU(),
            torch.nn.Dropout(0.1), torch.nn.LayerNorm(1024))
        self.disease_head = torch.nn.Linear(1024, 13)
        self.cond_proj = torch.nn.Sequential(
            torch.nn.Linear(1024, 512 * 4), torch.nn.GELU())
        self.report_model = T5ForConditionalGeneration(
            T5Config(decoder_start_token_id=0))  # t5-small dims

    def _enc_out(self, z_fuse):
        cond = self.cond_proj(z_fuse).view(z_fuse.size(0), 4, 512)
        return BaseModelOutput(last_hidden_state=cond)

    def forward(self, z_img, z_txt):
        z_fuse = self.fusion_mlp(torch.cat([z_img, z_txt], dim=-1))
        return {"disease_logits": self.disease_head(z_fuse)}

    @torch.no_grad()
    def generate(self, z_img, z_txt, **gen_kwargs):
        z_fuse = self.fusion_mlp(torch.cat([z_img, z_txt], dim=-1))
        return self.report_model.generate(
            encoder_outputs=self._enc_out(z_fuse), **gen_kwargs)


def preprocess_torch(img_pil: Image.Image) -> torch.Tensor:
    """The reference transform on a PIL input (training_pipeline.py:112-119).

    torchvision's PIL backend delegates Resize to ``PIL.Image.resize`` with
    the requested filter (antialias is implied for PIL), so plain PIL IS the
    reference implementation — independent of our fixed-point resize replica.
    """
    w, h = img_pil.size
    # torchvision Resize(int): shorter side -> 256, long side int-truncated
    if w <= h:
        nw, nh = 256, (h if w == 256 else int(256 * h / w))
    else:
        nh, nw = 256, (w if h == 256 else int(256 * w / h))
    if (nw, nh) != (w, h):
        img_pil = img_pil.resize((nw, nh), Image.BILINEAR)
    # torchvision CenterCrop(224)
    top = int(round((nh - 224) / 2.0))
    left = int(round((nw - 224) / 2.0))
    img_pil = img_pil.crop((left, top, left + 224, top + 224))
    x = np.asarray(img_pil, dtype=np.float32) / 255.0  # ToTensor scale
    x = np.transpose(x, (2, 0, 1))  # CHW
    mean = np.asarray(IMAGENET_MEAN, np.float32)[:, None, None]
    std = np.asarray(IMAGENET_STD, np.float32)[:, None, None]
    return torch.from_numpy((x - mean) / std)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="24/8 gen tokens instead of the full 180/150")
    ap.add_argument("--out", default="/tmp/parity_e2e")
    args = ap.parse_args()
    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    t0 = time.time()

    def log(msg):
        print(f"[{time.time() - t0:6.0f}s] {msg}", file=sys.stderr, flush=True)

    torch.manual_seed(0)
    img_m, txt_m, fus_m = TorchImageEncoder(), TorchText(), TorchFusion()
    randomize_bn_stats(img_m, seed=0)
    img_m.eval(), txt_m.eval(), fus_m.eval()
    log("torch stack built (full dims)")

    from mmdx_tpu.config import DISEASES
    from torch_oracles.reference_writer import save_reference_model_bundle

    # the bundle is written by the reference's exact publishing flow
    # (getattr-driven cfg + atomic .pt.tmp replace, training_pipeline.py:
    # 682-720,773-797), not by our exporter — so this certificate also covers
    # the genuine on-disk format end to end
    bundle_pt = save_reference_model_bundle(
        fus_m, img_m, txt_m, out_dir, registry_version=7,
        hf_model_name="t5-small",
        artifacts={"class_names": list(DISEASES), "thresholds": [0.5] * 13})
    log(f"reference-format bundle saved (reference writer flow): {bundle_pt}")

    from mmdx_tpu.pipelines.inference_pipeline import get_model_bundle
    from mmdx_tpu.runtime.engine import InferenceEngine

    mb = get_model_bundle(bundle_pt)
    engine = InferenceEngine(mb, mode="parity")
    bert_tok = engine.bert_tok
    log("bundle imported through the serving load path; parity engine up")

    gen_attributes = dict(
        max_new_tokens=180, min_new_tokens=150, num_beams=4,
        no_repeat_ngram_size=3, length_penalty=1.1, early_stopping=True,
        eos_token_id=1, pad_token_id=0,
    )  # inference_pipeline.py:190
    if args.quick:
        gen_attributes.update(max_new_tokens=24, min_new_tokens=8)

    details_map = json.loads(
        (REF / "sample_details" / "patient_details.json").read_text())
    thresholds = torch.tensor([0.5] * 13)

    cert = {"samples": {}, "gen": gen_attributes, "quick": args.quick}
    ok = True
    for name in ("e1.jpg", "e2.jpg"):
        details = details_map[name]
        image_pil = Image.open(REF / "sample_images" / name).convert("RGB")
        # --- reference inference() semantics, torch stack ---------------
        with torch.no_grad():
            x_img = preprocess_torch(image_pil).unsqueeze(0)
            tok_np = bert_tok.encode_batch([details], max_len=96)
            tok = {k: torch.from_numpy(np.asarray(v)) for k, v in tok_np.items()}
            z_img_t = img_m(x_img)["embeddings"]
            z_txt_t = txt_m(**tok)["embeddings"]
            logits_t = fus_m(z_img_t, z_txt_t)["disease_logits"]
            probs_t = torch.sigmoid(logits_t)[0]
            vector_t = (probs_t >= thresholds).int().tolist()
        log(f"{name}: torch classify done")
        hf_ids = fus_m.generate(z_img_t, z_txt_t, **gen_attributes).numpy()
        log(f"{name}: torch beam-4 generate done ({hf_ids.shape[1]} tokens)")

        # --- our stack: parity engine on the SAME raw inputs -------------
        import dataclasses

        probs_j, z_img_j, z_txt_j = engine.classify_batch(
            [image_pil], [details], host_outputs=True)
        gen_cfg = dataclasses.replace(
            mb.config.generation,
            max_new_tokens=gen_attributes["max_new_tokens"],
            min_new_tokens=gen_attributes["min_new_tokens"])
        our_ids = engine.generate_report_ids(z_img_j, z_txt_j, gen_cfg)
        log(f"{name}: our classify + beam-4 generate done")

        prob_diff = float(np.max(np.abs(probs_j[0] - probs_t.numpy())))
        vector_j = (probs_j[0] >= 0.5).astype(int).tolist()
        hl = hf_ids.shape[1]
        ids_equal = (our_ids.shape[1] >= hl
                     and bool(np.array_equal(our_ids[0, :hl], hf_ids[0])))
        tail = our_ids[0, hl:]
        tail_ok = bool(np.all((tail == 0) | (tail == 1)))  # pad/eos fill
        zi_diff = float(np.max(np.abs(z_img_j[0] - z_img_t.numpy()[0])))
        zt_diff = float(np.max(np.abs(z_txt_j[0] - z_txt_t.numpy()[0])))

        sample_ok = (prob_diff <= 1e-5 and vector_j == vector_t
                     and ids_equal and tail_ok)
        ok &= sample_ok
        cert["samples"][name] = {
            "prob_max_abs_diff": prob_diff,
            "z_img_max_abs_diff": zi_diff,
            "z_txt_max_abs_diff": zt_diff,
            "vector_match": vector_j == vector_t,
            "disease_vector": vector_j,
            "report_ids_identical": ids_equal,
            "report_len": int(hl),
            "tail_fill_ok": tail_ok,
            "ok": sample_ok,
        }
        log(f"{name}: prob diff {prob_diff:.2e} (z_img {zi_diff:.2e}, "
            f"z_txt {zt_diff:.2e}), vector match {vector_j == vector_t}, "
            f"ids identical {ids_equal} (len {hl})")

    cert["ok"] = ok
    (out_dir / "certificate.json").write_text(json.dumps(cert, indent=2))
    print(json.dumps(cert))
    log(f"certificate {'PASS' if ok else 'FAIL'} -> {out_dir}/certificate.json")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
