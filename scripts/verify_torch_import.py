"""One-off verification: build a reference-format torch model_bundle.pt at FULL
dims, import via bundle_from_torch, run the engine on it."""
import sys, time
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/tests")
import torch, numpy as np
import jax; jax.config.update("jax_platforms", "cpu")
from transformers import BertConfig, BertModel, T5Config, T5ForConditionalGeneration

from torch_oracles.resnet_torch import TorchImageEncoder

t0 = time.time()
torch.manual_seed(0)

class TorchText(torch.nn.Module):
    def __init__(self):
        super().__init__()
        self.encoder = BertModel(BertConfig())  # bert-base dims
        self.proj = torch.nn.Linear(768, 512)
        self.classifier = torch.nn.Linear(512, 13)

class TorchFusion(torch.nn.Module):
    def __init__(self):
        super().__init__()
        t5c = T5Config(decoder_start_token_id=0)  # t5-small dims
        self.fusion_mlp = torch.nn.Sequential(
            torch.nn.Linear(1536, 1024), torch.nn.GELU(),
            torch.nn.Dropout(0.1), torch.nn.LayerNorm(1024))
        self.disease_head = torch.nn.Linear(1024, 13)
        self.cond_proj = torch.nn.Sequential(torch.nn.Linear(1024, 512*4), torch.nn.GELU())
        self.report_model = T5ForConditionalGeneration(t5c)

img = TorchImageEncoder(); txt = TorchText(); fus = TorchFusion()
print(f"torch init: {time.time()-t0:.0f}s", file=sys.stderr)

cfg = {
    "fusion": {"d_img": 1024, "d_txt": 512, "d_fuse_hidden": 1024,
               "n_disease": 13, "n_cond_tokens": 4, "decoder_hidden": 512},
    "report_head": {"hf_model_name": "t5-small"},
    "text_encoder": {"hf_model_name": "bert-base-uncased", "d_txt": 512,
                     "pooling": "masked_mean", "max_len": 96},
    "image_encoder": {"backbone": "resnet50", "d_img": 1024, "img_size": 224,
                      "normalize": {"mean": [0.485,0.456,0.406], "std": [0.229,0.224,0.225]}},
    "artifacts": {"class_names": None, "thresholds": [0.5]*13},
}
from mmdx_tpu.config import DISEASES
cfg["artifacts"]["class_names"] = list(DISEASES)
bundle = {
    "cfg": cfg,
    "fusion_state": fus.state_dict(),
    "image_state": img.state_dict(),
    "text_state": txt.state_dict(),
    "t5_tokenizer_name": "t5-small",
    "bert_tokenizer_name": "bert-base-uncased",
    "version": 7,
}
torch.save(bundle, "/tmp/model_bundle.pt")
print(f"saved torch bundle: {time.time()-t0:.0f}s", file=sys.stderr)

from mmdx_tpu.pipelines.inference_pipeline import get_model_bundle
mb = get_model_bundle("/tmp/model_bundle.pt")
print("imported; version:", mb.version, "classes:", len(mb.class_names), file=sys.stderr)

# parity check: z_img from imported weights vs torch oracle
from mmdx_tpu.models.resnet import ImageEncoder
from mmdx_tpu.config import ImageEncoderConfig
rng = np.random.default_rng(0)
x = rng.standard_normal((1, 96, 96, 3)).astype(np.float32)
img.eval()
with torch.no_grad():
    want = img(torch.from_numpy(np.transpose(x, (0,3,1,2))))["embeddings"].numpy()
model = ImageEncoder(config=ImageEncoderConfig())
iv = {"params": mb.variables["params"]["image_encoder"],
      "batch_stats": mb.variables["batch_stats"]["image_encoder"]}
got = np.asarray(model.apply(iv, x, train=False)["embeddings"])
print("z_img max diff vs torch:", np.max(np.abs(got - want)), file=sys.stderr)
assert np.max(np.abs(got - want)) < 2e-3
print(f"torch bundle round-trip OK ({time.time()-t0:.0f}s total)", file=sys.stderr)
