"""mmdx_tpu — TPU-native multi-modal medical imaging + report diagnosis framework.

A ground-up JAX/XLA/Pallas/pjit rebuild of the capabilities of the reference
chest-X-ray diagnosis stack (PravCoder/Multi-Modal-Medical-Imaging-and-Report-ML-
Diagnosis-System): a ResNet-50 image tower, a BERT text tower, a late-fusion MLP
with a 13-class multi-label disease head, and a T5 report-generation head, plus
the surrounding data/feature/training/inference pipelines and a serving API.

Layer map (bottom -> top):
  ops/          Pallas kernels + fused preprocessing / attention / pooling ops
  models/       pure-functional flax models: resnet50, bert, t5, fusion, diagnosis
  decode/       jit-compiled autoregressive decoding (greedy + beam search)
  text/         host-side tokenizers (native WordPiece, T5-conventions subword)
  parallel/     jax.sharding Mesh + sharding rules (dp/tp) for multi-chip
  runtime/      inference engine: compile cache, batching, precision policies
  checkpoints/  bundle format, orbax save/restore, torch state_dict importer
  io/           image decode, object store + feature store abstractions
  pipelines/    data-prep / feature / training / inference pipelines
  serve/        WSGI serving app exposing the reference REST API shapes
  scheduler/    daily pipeline commands + in-process periodic scheduler
"""

__version__ = "0.1.0"

from mmdx_tpu.config import (  # noqa: F401
    DiagnosisConfig,
    FusionConfig,
    GenerationConfig,
    ImageEncoderConfig,
    ReportDecoderConfig,
    TextEncoderConfig,
    DISEASES,
)
