"""ResNet-50 image tower in flax (NHWC, TPU-native), torchvision-graph-equivalent.

Rebuilds the capability of the reference's ``ImageEncoderCNN`` (reference
``backend/ml/pipelines/training_pipeline.py:157-311``): a ResNet-50 backbone
with the classification fc removed, global average pooling, a projection head
``Linear(2048 -> d_img)`` and an optional warm-up classifier
``Linear(d_img -> n_disease)``.

TPU-first choices:
  * NHWC activations / HWIO kernels (XLA's native TPU conv layout).
  * BatchNorm in inference mode folds to scale+shift; XLA fuses it into the
    preceding conv's epilogue.
  * Freeze/unfreeze phases are not module state (torch ``requires_grad``) but
    functional: the training pipeline masks optimizer updates (optax) and
    chooses whether batch stats update — see pipelines/training_pipeline.py.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from mmdx_tpu.config import ImageEncoderConfig

# Bottleneck counts per stage for resnet50 (stage widths 256/512/1024/2048).
RESNET50_STAGES = (3, 4, 6, 3)


class _ConvKernel(nn.Module):
    """Declares an nn.Conv-compatible 'kernel' param without computing — the
    fused-bottleneck path reads raw weights (to BN-fold them) while keeping
    the param tree identical to the nn.Conv layers of the XLA path."""

    shape: tuple  # (kh, kw, cin, cout)

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.lecun_normal(), self.shape)


class _BNParams(nn.Module):
    """Declares nn.BatchNorm-compatible params + batch_stats without computing."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones_init(), (self.features,))
        bias = self.param("bias", nn.initializers.zeros_init(), (self.features,))
        mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((self.features,), jnp.float32)
        )
        var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((self.features,), jnp.float32)
        )
        return scale, bias, mean.value, var.value


class Bottleneck(nn.Module):
    """ResNet v1.5 bottleneck: 1x1 -> 3x3(stride) -> 1x1, identity shortcut."""

    width: int  # bottleneck width (out channels = 4 * width)
    stride: int = 1
    use_projection: bool = False
    bn_momentum: float = 0.9  # flax convention: ra = m*ra + (1-m)*batch
    bn_eps: float = 1e-5
    use_fused: bool = False  # Pallas fused path (inference, stride 1 only)
    use_folded: bool = False  # BN-folded XLA convs (inference)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.use_folded and not train:
            return self._folded(x)
        if self.use_fused and not train and self.stride == 1:
            return self._fused(x)

        def bn(name):
            return nn.BatchNorm(
                use_running_average=not train,
                momentum=self.bn_momentum,
                epsilon=self.bn_eps,
                dtype=self.dtype,
                name=name,
            )

        shortcut = x
        if self.use_projection:
            shortcut = nn.Conv(
                self.width * 4, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, dtype=self.dtype, name="downsample_conv",
            )(x)
            shortcut = bn("downsample_bn")(shortcut)

        y = nn.Conv(self.width, (1, 1), use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = nn.relu(bn("bn1")(y))
        y = nn.Conv(
            self.width, (3, 3), strides=(self.stride, self.stride),
            padding=[(1, 1), (1, 1)], use_bias=False, dtype=self.dtype, name="conv2",
        )(y)
        y = nn.relu(bn("bn2")(y))
        y = nn.Conv(self.width * 4, (1, 1), use_bias=False, dtype=self.dtype, name="conv3")(y)
        y = bn("bn3")(y)
        return nn.relu(y + shortcut)

    def _folded(self, x):
        """Inference path with the BatchNorms folded into the conv weights
        (f32 fold, conv in self.dtype): the serving graph becomes pure
        conv+bias+relu with no batch_stats dependence. End-to-end effect is
        ~1% (XLA already fuses inference BN into conv epilogues — see
        config.use_folded_bn); kept for the simpler graph. Param tree is
        identical to the training path (same names, shapes, collections)."""
        from mmdx_tpu.ops.pallas_bottleneck import fold_bn

        cin = x.shape[-1]
        m, cout = self.width, self.width * 4
        s = (self.stride, self.stride)

        def conv(inp, w, b, strides, padding="SAME"):
            # output stays in self.dtype (MXU accumulates f32 internally):
            # preferred_element_type=f32 here materialized f32 activations —
            # DOUBLE the HBM bytes of the tower's dominant cost
            dn = jax.lax.conv_dimension_numbers(
                inp.shape, w.shape, ("NHWC", "HWIO", "NHWC")
            )
            y = jax.lax.conv_general_dilated(
                inp, w.astype(self.dtype), strides, padding,
                dimension_numbers=dn,
            )
            return y + b.astype(self.dtype)

        k1 = _ConvKernel((1, 1, cin, m), name="conv1")()
        w1, b1 = fold_bn(k1, *_BNParams(m, name="bn1")(), self.bn_eps)
        k2 = _ConvKernel((3, 3, m, m), name="conv2")()
        w2, b2 = fold_bn(k2, *_BNParams(m, name="bn2")(), self.bn_eps)
        k3 = _ConvKernel((1, 1, m, cout), name="conv3")()
        w3, b3 = fold_bn(k3, *_BNParams(cout, name="bn3")(), self.bn_eps)

        y = nn.relu(conv(x, w1, b1, (1, 1)))
        y = nn.relu(conv(y, w2, b2, s, padding=[(1, 1), (1, 1)]))
        y = conv(y, w3, b3, (1, 1))
        if self.use_projection:
            kp = _ConvKernel((1, 1, cin, cout), name="downsample_conv")()
            wp, bp = fold_bn(
                kp, *_BNParams(cout, name="downsample_bn")(), self.bn_eps
            )
            shortcut = conv(x, wp, bp, s)
        else:
            shortcut = x
        return nn.relu(y + shortcut)

    def _fused(self, x):
        """Single-kernel bottleneck (ops/pallas_bottleneck): BNs folded into
        the conv weights in f32, one HBM read + one write per block instead of
        the XLA path's per-conv round-trips. Param tree is identical to the
        unfused branch (same names, shapes, collections)."""
        from mmdx_tpu.ops.pallas_bottleneck import fold_bn, fused_bottleneck

        cin = x.shape[-1]
        m, cout = self.width, self.width * 4
        k1 = _ConvKernel((1, 1, cin, m), name="conv1")()
        w1, b1 = fold_bn(k1[0, 0], *_BNParams(m, name="bn1")(), self.bn_eps)
        k2 = _ConvKernel((3, 3, m, m), name="conv2")()
        w2, b2 = fold_bn(k2, *_BNParams(m, name="bn2")(), self.bn_eps)
        k3 = _ConvKernel((1, 1, m, cout), name="conv3")()
        w3, b3 = fold_bn(k3[0, 0], *_BNParams(cout, name="bn3")(), self.bn_eps)
        wp = bp = None
        if self.use_projection:
            kp = _ConvKernel((1, 1, cin, cout), name="downsample_conv")()
            wp, bp = fold_bn(
                kp[0, 0], *_BNParams(cout, name="downsample_bn")(), self.bn_eps
            )
            wp = wp.astype(self.dtype)
        return fused_bottleneck(
            x.astype(self.dtype), w1.astype(self.dtype), b1,
            w2.astype(self.dtype), b2, w3.astype(self.dtype), b3, wp, bp,
        )


class ResNet50(nn.Module):
    """ResNet-50 feature extractor: NHWC in, pooled [B, 2048] features out."""

    stage_sizes: Sequence[int] = RESNET50_STAGES
    bn_momentum: float = 0.9
    bn_eps: float = 1e-5
    fuse_max_width: int = 0  # fuse stride-1 bottlenecks up to this width
    folded_bn: bool = False  # inference-only BN-folded convs (all blocks)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.folded_bn and not train:
            from mmdx_tpu.ops.pallas_bottleneck import fold_bn

            ks = _ConvKernel((7, 7, x.shape[-1], 64), name="conv_stem")()
            ws, bs = fold_bn(ks, *_BNParams(64, name="bn_stem")(), self.bn_eps)
            dn = jax.lax.conv_dimension_numbers(
                x.shape, ws.shape, ("NHWC", "HWIO", "NHWC")
            )
            x = jax.lax.conv_general_dilated(
                x, ws.astype(self.dtype), (2, 2), [(3, 3), (3, 3)],
                dimension_numbers=dn,
            )
            x = nn.relu(x + bs.astype(self.dtype))
        else:
            x = nn.Conv(
                64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                use_bias=False, dtype=self.dtype, name="conv_stem",
            )(x)
            x = nn.BatchNorm(
                use_running_average=not train, momentum=self.bn_momentum,
                epsilon=self.bn_eps, dtype=self.dtype, name="bn_stem",
            )(x)
            x = nn.relu(x)
        # torch MaxPool2d(kernel=3, stride=2, padding=1): pad with -inf then max
        x = jnp.pad(
            x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf
        )
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")

        for stage, n_blocks in enumerate(self.stage_sizes):
            width = 64 * (2**stage)
            for block in range(n_blocks):
                stride = 2 if (stage > 0 and block == 0) else 1
                x = Bottleneck(
                    width=width,
                    stride=stride,
                    use_projection=(block == 0),
                    bn_momentum=self.bn_momentum,
                    bn_eps=self.bn_eps,
                    use_fused=0 < width <= self.fuse_max_width,
                    use_folded=self.folded_bn,
                    dtype=self.dtype,
                    name=f"layer{stage + 1}_block{block}",
                )(x, train=train)

        # global average pool (torch AdaptiveAvgPool2d(1) + flatten)
        return jnp.mean(x, axis=(1, 2))  # [B, 2048]


class ImageEncoder(nn.Module):
    """ResNet-50 backbone + projection + optional warm-up classifier.

    ``__call__`` mirrors reference ``ImageEncoderCNN.forward`` (:306-311):
    returns {"embeddings": [B, d_img], "logits": [B, n_disease]?}.
    """

    config: ImageEncoderConfig = ImageEncoderConfig()
    dtype: Any = jnp.float32

    def setup(self):
        self.backbone = ResNet50(
            bn_momentum=1.0 - self.config.bn_momentum,
            bn_eps=self.config.bn_eps,
            fuse_max_width=(
                self.config.fused_bottleneck_max_width
                if self.config.use_fused_bottleneck else 0
            ),
            folded_bn=self.config.use_folded_bn,
            dtype=self.dtype,
            name="backbone",
        )
        self.proj = nn.Dense(self.config.d_img, dtype=self.dtype, name="proj")
        if self.config.use_warmup_classifier:
            self.classifier = nn.Dense(
                self.config.n_disease, dtype=self.dtype, name="classifier"
            )

    def encode(self, images, train: bool = False):
        """NHWC images -> [B, d_img] embeddings (reference encode, :291-302)."""
        feats = self.backbone(images, train=train)
        return self.proj(feats.astype(self.dtype))

    def backbone_features(self, images, train: bool = False):
        """Pooled backbone features only — lets phase-1 training run the frozen
        backbone outside the grad (reference _backbone_forward_nograd, :275-282)."""
        return self.backbone(images, train=train)

    def heads(self, feats):
        """Projection + optional classifier over precomputed features."""
        z = self.proj(feats.astype(self.dtype))
        out = {"embeddings": z}
        if self.config.use_warmup_classifier:
            out["logits"] = self.classifier(z)
        return out

    def __call__(self, images, train: bool = False):
        z = self.encode(images, train=train)
        out = {"embeddings": z}
        if self.config.use_warmup_classifier:
            out["logits"] = self.classifier(z)
        return out


def init_image_encoder(rng: jax.Array, config: ImageEncoderConfig | None = None):
    """Initialize variables ({'params', 'batch_stats'}) for the image tower."""
    config = config or ImageEncoderConfig()
    model = ImageEncoder(config=config)
    dummy = jnp.zeros((1, config.img_size, config.img_size, 3), jnp.float32)
    variables = model.init(rng, dummy, train=False)
    return model, variables
