"""Int8 "turbo" ResNet-50 image tower — static post-training quantization.

The bf16 tower is HBM-roofline-bound (round-2 device traces: conv fusions at
500-825 GB/s, ~25.6 GB of activation traffic per B=512 batch), so int8 is a
double win on TPU: activations/weights halve the bytes AND the MXU runs int8
at 2x the bf16 rate (measured on this chip: 384 TF/s vs 163 at stage-1 shapes,
scripts/bench_int8_conv.py). This module replaces the torchvision backbone the
reference serves through torch (reference backend/ml/pipelines/
training_pipeline.py:157-311, inference_pipeline.py:151-206) on the serving
path only — training stays bf16/f32.

Scheme (standard static PTQ, symmetric):
  * BatchNorms folded into conv weights first (f32, ops/pallas_bottleneck.
    fold_bn) — the quantized graph is conv+requant only.
  * Weights: per-output-channel int8, scale = amax/127 over (kh,kw,cin).
  * Activations: per-tensor int8 with STATIC scales calibrated offline from a
    representative batch (``calibrate_backbone``). Dynamic quantization would
    re-read the f32 tensor to find its range — adding back the HBM bytes the
    whole exercise removes.
  * Every inter-conv tensor is materialized as int8; dequant -> relu ->
    requant is a fused f32 epilogue on the int32 conv output (XLA fuses it
    into the convolution, nothing f32 touches HBM).
  * Residual adds run in the f32 epilogue of conv3 (shortcut dequantized
    elementwise from the block-input int8), then requantize. In downsample
    blocks the shortcut conv requantizes to int8 at its own calibrated scale
    ("<block>.short") first: XLA output fusion holds at most one dot/conv
    root, so joining two f32 products in one epilogue forces one dot's s32
    accumulator through HBM (measured 10.5 ms/batch across the four joins).
  * The final pooled [B, 2048] features return in f32; the projection head
    and everything downstream stay in the engine's normal dtype.

Accuracy contract: ``tests/test_resnet_int8.py`` bounds the probability delta
vs the bf16/f32 tower on the packaged sample assets (the guardrail), and the
engine only uses this path in the opt-in ``mode="turbo"``.
"""
from __future__ import annotations

import os

import jax
import jax.lax as lax
import jax.numpy as jnp

from mmdx_tpu.models.resnet import RESNET50_STAGES
from mmdx_tpu.ops.pallas_bottleneck import fold_bn

# Calibration site names, in execution order:
#   "input"            stem conv input (preprocessed, ImageNet-normalized)
#   "stem"             post stem-relu + maxpool (= layer1_block0 input)
#   "<block>.a1"       post bn1+relu (conv2 input)
#   "<block>.a2"       post bn2+relu (conv3 input)
#   "<block>.out"      post residual relu (next block's input)


def _block_names():
    for stage, n_blocks in enumerate(RESNET50_STAGES):
        for block in range(n_blocks):
            yield f"layer{stage + 1}_block{block}", stage, block


def calibration_sites() -> list[str]:
    sites = ["input", "stem"]
    for name, _, block in _block_names():
        sites += [f"{name}.a1", f"{name}.a2", f"{name}.out"]
        if block == 0:
            # downsample shortcut requant point (see int8_backbone_apply:
            # XLA can output-fuse only ONE dot per epilogue, so the shortcut
            # quantizes separately instead of riding f32/s32 through HBM)
            sites.append(f"{name}.short")
    return sites


def _folded(params, stats, conv: str, bn: str, eps: float):
    w, b = fold_bn(
        params[conv]["kernel"], params[bn]["scale"], params[bn]["bias"],
        stats[bn]["mean"], stats[bn]["var"], eps,
    )
    return w.astype(jnp.float32), b


def folded_backbone(backbone_params, backbone_stats, eps: float = 1e-5):
    """BN-folded f32 conv stack of the ResNet-50 backbone, keyed by block."""
    tree = {"stem": _folded(backbone_params, backbone_stats,
                            "conv_stem", "bn_stem", eps)}
    for name, _, block in _block_names():
        p, s = backbone_params[name], backbone_stats[name]
        d = {
            "conv1": _folded(p, s, "conv1", "bn1", eps),
            "conv2": _folded(p, s, "conv2", "bn2", eps),
            "conv3": _folded(p, s, "conv3", "bn3", eps),
        }
        if block == 0:
            d["down"] = _folded(p, s, "downsample_conv", "downsample_bn", eps)
        tree[name] = d
    return tree


def _conv(x, w, b, stride: int, padding):
    dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    y = lax.conv_general_dilated(
        x, w, (stride, stride), padding, dimension_numbers=dn
    )
    return y + b


def _maxpool_nonneg(x):
    """torch MaxPool2d(3, stride=2, padding=1) for tensors known >= 0
    (post-relu): zero padding is equivalent to -inf padding."""
    import flax.linen as nn

    x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    return nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")


def folded_forward(folded, x, collect: bool = False, compute_dtype=jnp.float32,
                   percentile: float | None = None):
    """Reference forward over the folded stack (f32 by default).

    Returns (pooled [B, 2048] features, sites) — sites maps every calibration
    site to amax(|tensor|) f32 scalars when ``collect``, else is empty. This
    is both the calibration pass and the numerics oracle for the int8 tests;
    ``compute_dtype=bfloat16`` (with a bf16-cast folded tree) gives the
    serving-precision comparator used by scripts/bench_int8_tower.py.

    ``percentile`` (e.g. 99.9) records that quantile of |tensor| instead of
    the max: a handful of activation outliers otherwise stretch the whole
    int8 grid and waste resolution on values that occur once per million
    (standard percentile/clipping PTQ calibration; the requant epilogue
    saturates clipped values at +-127, so the tail is bounded, not wrapped).
    """
    sites = {}

    def tap(name, v):
        if collect:
            a = jnp.abs(v)
            if percentile is None:
                sites[name] = jnp.max(a).astype(jnp.float32)
            else:
                sites[name] = jnp.quantile(
                    a.astype(jnp.float32).reshape(-1), percentile / 100.0
                )
        return v

    x = x.astype(compute_dtype)
    tap("input", x)
    x = jax.nn.relu(_conv(x, *folded["stem"], 2, [(3, 3), (3, 3)]))
    x = _maxpool_nonneg(x)
    tap("stem", x)
    for name, stage, block in _block_names():
        d = folded[name]
        stride = 2 if (stage > 0 and block == 0) else 1
        a1 = jax.nn.relu(_conv(x, *d["conv1"], 1, "SAME"))
        tap(f"{name}.a1", a1)
        a2 = jax.nn.relu(_conv(a1, *d["conv2"], stride, [(1, 1), (1, 1)]))
        tap(f"{name}.a2", a2)
        y = _conv(a2, *d["conv3"], 1, "SAME")
        if "down" in d:
            short = _conv(x, *d["down"], stride, "SAME")
            tap(f"{name}.short", short)
        else:
            short = x
        x = jax.nn.relu(y + short)
        tap(f"{name}.out", x)
    return jnp.mean(x, axis=(1, 2)), sites


def calibrate_backbone(variables, images,
                       percentile: float | None = None) -> dict[str, float]:
    """Run the folded f32 tower over a representative PREPROCESSED batch
    (NHWC, ImageNet-normalized — i.e. the exact serving input) and return
    {site: amax} as plain floats, suitable for persisting in a bundle.

    variables: the full model variables dict ({'params', 'batch_stats'}).
    percentile: clip calibration (see ``folded_forward``); None = amax.
    """
    bp = variables["params"]["image_encoder"]["backbone"]
    bs = variables["batch_stats"]["image_encoder"]["backbone"]

    @jax.jit
    def run(bp, bs, x):
        folded = folded_backbone(bp, bs)
        _, sites = folded_forward(folded, x, collect=True,
                                  percentile=percentile)
        return sites

    sites = run(bp, bs, jnp.asarray(images))
    return {k: float(v) for k, v in sites.items()}


GRAY_CENTER = 0.5        # preprocess_batch_device_gray emits u - GRAY_CENTER
GRAY_SCALE = 0.5 / 127.0  # static activation scale: |u - 0.5| <= 0.5 exactly


def _gray_stem(w_f32, b, mean, std, img_size: int):
    """Fold the 1->3 channel broadcast + per-channel ImageNet normalize into
    the (BN-folded, f32) stem conv, for grayscale inputs.

    For a gray image, channel c of the normalized input is the affine
    (u - m_c)/s_c of the same u, and the conv pads with zeros AFTER the
    normalize.  Splitting u = v + 0.5 (v = the centered gray the device
    preproc emits, zero-padded like x was):

        y_o(p) = sum_{t in valid(p)} [sum_c W[t,c,o]/s_c] v(t)
                 + sum_{t in valid(p)} sum_c W[t,c,o] (0.5 - m_c)/s_c + b_o
               = conv(v, Wg)(p) + K_o(p)

    The second sum runs over only the taps inside the image, so K is a
    positional map near the borders and a constant in the interior —
    computed exactly as conv(ones, Wz) + b.  f32-exact (sums reordered
    only); tests/test_resnet_int8.py asserts it against the 3-channel
    normalized conv.
    """
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    wg = jnp.sum(w_f32 / std[None, None, :, None], axis=2, keepdims=True)
    wz = jnp.sum(
        w_f32 * ((GRAY_CENTER - mean) / std)[None, None, :, None],
        axis=2, keepdims=True,
    )
    ones = jnp.ones((1, img_size, img_size, 1), jnp.float32)
    dn = lax.conv_dimension_numbers(ones.shape, wz.shape,
                                    ("NHWC", "HWIO", "NHWC"))
    k_map = lax.conv_general_dilated(
        ones, wz, (2, 2), [(3, 3), (3, 3)], dimension_numbers=dn
    ) + b  # [1, img/2, img/2, co]
    return wg, k_map


def quantize_backbone(variables, act_scales: dict[str, float],
                      eps: float = 1e-5, mean=None, std=None,
                      img_size: int = 224):
    """Build the int8 qparams pytree from model variables + calibrated amax.

    Per conv: {"w": int8 [kh,kw,ci,co], "ws": f32 [co] weight scales,
    "b": f32 [co] folded bias}. Plus {"scales": {site: f32 scalar}} with
    scale = amax/127 (what one int8 step is worth).

    The result is a plain pytree of arrays — pass it as a jit ARGUMENT (the
    remote compiler rejects giant HLO constants; NOTES.md environment rules).
    """
    bp = variables["params"]["image_encoder"]["backbone"]
    bs = variables["batch_stats"]["image_encoder"]["backbone"]

    def qconv(w, b, s2d: bool = False):
        ws = jnp.maximum(jnp.max(jnp.abs(w), axis=(0, 1, 2)), 1e-12) / 127.0
        wi = jnp.clip(jnp.round(w / ws), -127, 127).astype(jnp.int8)
        d = {"w": wi, "ws": ws, "b": b}
        if s2d:
            # space-to-depth form precomputed HERE so the rearrange never
            # runs inside the serving loop (it would be 9-16 update-slices
            # per call if done at apply time)
            d["w_s2d"] = _s2d_weights(wi)
        return d

    folded = folded_backbone(bp, bs, eps)
    q = {"stem": qconv(*folded["stem"], s2d=True)}
    if mean is None or std is None:
        from mmdx_tpu.config import IMAGENET_MEAN, IMAGENET_STD

        mean = IMAGENET_MEAN if mean is None else mean
        std = IMAGENET_STD if std is None else std
    wg, k_map = _gray_stem(*folded["stem"], mean, std, img_size)
    q["stem_gray"] = qconv(wg, k_map, s2d=True)
    for name, stage, block in _block_names():
        tree = folded[name]
        q[name] = {
            k: qconv(*v, s2d=(k == "conv2" and stage > 0 and block == 0))
            for k, v in tree.items()
        }
    missing = [s for s in calibration_sites() if s not in act_scales]
    if missing:
        raise ValueError(f"act_scales missing calibration sites: {missing[:4]}")
    q["scales"] = {
        k: jnp.float32(max(float(v), 1e-12) / 127.0)
        for k, v in act_scales.items()
    }
    return q


def _qconv(x_i8, qc, stride: int, padding):
    kh, kw = qc["w"].shape[:2]
    if kh == kw == 1:
        # 1x1 conv as an explicit int8 GEMM over flattened spatial. Lowering
        # it as conv_general_dilated lets XLA's layout assignment bury the
        # BATCH dim in the lanes when C < 128 (s8[512,56,56,64]{0,3,2,1}),
        # and the stage-1 1x1s then run at ~17 TF/s (measured, round-3
        # trace); the dot form keeps channels lane-major.
        if stride != 1:
            x_i8 = x_i8[:, ::stride, ::stride, :]
        b, h, w, cin = x_i8.shape
        y = lax.dot_general(
            x_i8.reshape(b * h * w, cin), qc["w"][0, 0],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32,
        )
        return y.reshape(b, h, w, -1)
    dn = lax.conv_dimension_numbers(
        x_i8.shape, qc["w"].shape, ("NHWC", "HWIO", "NHWC")
    )
    return lax.conv_general_dilated(
        x_i8, qc["w"], (stride, stride), padding, dimension_numbers=dn,
        preferred_element_type=jnp.int32,
    )


def _requant(y_f32, s):
    """f32 -> int8 at activation scale s (symmetric, saturating)."""
    return jnp.clip(jnp.round(y_f32 / s), -127, 127).astype(jnp.int8)


def _s2d_weights(w):
    """Rearrange an ODD-k stride-2 "SAME" conv kernel into its space-to-depth
    form: a ceil((k+1)/2)-tap STRIDE-1 kernel over 2x2-packed (4*ci-channel)
    input.

    With pad q = (k-1)//2 (odd for k = 7 or 3), output row o of the stride-2
    conv reads input rows i = 2o + ky - q, ky in [0, k). In super-row
    coordinates (S[r] packs rows 2r, 2r+1): kr = (ky + 1) // 2 and parity
    p = (ky + 1) % 2, so the k taps land in a (k+1)/2 + (k==7) window with
    slot (kr=0, p=0) structurally zero. Same multiplies, same s32 sums ->
    bit-exact, but the input tensor presents 4x the channels (XLA's int8
    conv tiling pads C=3 ~3x at the stem — measured 2.03 ms at B=512,
    ~240 GB/s effective — and runs the 3x3 s2 stage-boundary convs at only
    ~188 TF/s). Use stride 1 and padding [(2, 1), (2, 1)] for k=7,
    [(1, 0), (1, 0)] for k=3."""
    kh, kw, ci, co = w.shape
    assert kh == kw and kh in (3, 7), (kh, kw)
    n = (kh + 1 + 1) // 2  # taps in super-row space: 7 -> 4, 3 -> 2
    w2 = jnp.zeros((n, n, 4 * ci, co), w.dtype)
    for ky in range(kh):
        kr, py = (ky + 1) // 2, (ky + 1) % 2
        for kx in range(kw):
            kc, px = (kx + 1) // 2, (kx + 1) % 2
            cbase = (py * 2 + px) * ci
            w2 = w2.at[kr, kc, cbase:cbase + ci, :].set(w[ky, kx])
    return w2


_S2D_PAD = {7: [(2, 1), (2, 1)], 3: [(1, 0), (1, 0)]}

def _s2d_conv2_enabled() -> bool:
    """Conv2 s2d rewrite gate — read at TRACE time (callers toggling it must
    build a fresh jit; scripts/bench_int8_tower.py does). Default off until
    the on-chip A/B proves the packing transpose costs less than the conv
    saves (NOTES.md measured-first rule)."""
    return os.environ.get("MMDX_INT8_S2D_CONV2", "0") != "0"


def _space_to_depth2(x):
    """[B, H, W, C] -> [B, H/2, W/2, 4C], channel order (p_y, p_x, c)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)


def int8_backbone_apply(q, x) -> jnp.ndarray:
    """Preprocessed NHWC images (f32/bf16) -> pooled [B, 2048] f32 features.

    3-channel inputs are ImageNet-normalized images (the usual preprocess
    contract). 1-channel inputs MUST be the centered raw gray emitted by
    ``preprocess_batch_device_gray`` (v = u - 0.5, |v| <= 0.5): the gray
    branch quantizes at the static GRAY_SCALE and folds the normalize into
    the pre-summed gray stem — feeding it a normalized 1-channel tensor
    would silently misquantize (ADVICE r3).

    Every conv runs int8 x int8 -> int32 on the MXU; the epilogue
    (dequant * (sx*ws), +b, relu, requant) is a fused f32 elementwise chain,
    so only int8 tensors are materialized between convs.
    """
    sc = q["scales"]
    gray = x.shape[-1] == 1 and "stem_gray" in q
    if gray:
        km = q["stem_gray"]["b"]  # positional K map [1, img/2, img/2, co]
        if km.shape[1] != x.shape[1] // 2 or km.shape[2] != x.shape[2] // 2:
            raise ValueError(
                "gray stem K map was folded for img_size "
                f"{km.shape[1] * 2}, got a {x.shape[1]}x{x.shape[2]} gray "
                "batch — pass img_size= to quantize_backbone"
            )
    if gray:
        # grayscale fast path: x is the CENTERED RAW gray from
        # preprocess_batch_device_gray (v = u - 0.5, |v| <= 0.5 exactly ->
        # static scale, no calibration); normalize + channel broadcast live
        # in the pre-summed weights + K map (see _gray_stem). 3x fewer
        # stem-input bytes and no [B,224,224,3] f32 broadcast tensor.
        stem, s_in = q["stem_gray"], jnp.float32(GRAY_SCALE)
    else:
        stem, s_in = q["stem"], sc["input"]
    xi = _requant(x.astype(jnp.float32), s_in)

    if (
        "w_s2d" in stem and xi.shape[1] % 2 == 0 and xi.shape[2] % 2 == 0
        and os.environ.get("MMDX_INT8_S2D_STEM", "1") != "0"
    ):
        # bit-exact space-to-depth form of the 7x7 s2 stem (see
        # _s2d_weights); the s2d transpose fuses into the input
        # requant, and the conv reads 12 channels instead of pad-heavy 3
        xs = _space_to_depth2(xi)
        w2 = stem["w_s2d"]
        dn = lax.conv_dimension_numbers(
            xs.shape, w2.shape, ("NHWC", "HWIO", "NHWC")
        )
        y = lax.conv_general_dilated(
            xs, w2, (1, 1), _S2D_PAD[7], dimension_numbers=dn,
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
    else:
        y = _qconv(xi, stem, 2, [(3, 3), (3, 3)]).astype(jnp.float32)
    # gray path: stem["b"] is the positional K map [1, H/2, W/2, co]
    # (interior-constant; borders carry the valid-tap correction)
    y = jax.nn.relu(y * (s_in * stem["ws"]) + stem["b"])
    xi = _requant(y, sc["stem"])
    xi = _maxpool_nonneg(xi)  # int8 max; values >= 0 post-relu-requant
    sx = sc["stem"]

    # Fused stride-1 bottlenecks (ops/pallas_int8_bottleneck): one HBM
    # read + one write per block instead of ~4 activation round-trips on
    # the XLA path — the early stages are HBM-roofline-bound. Gated by
    # stage: width-padding maps 56->64 and 28->32 with 1.14x row waste
    # (stages 3-4 would pad 14/7 -> 32, 2.3-4.6x — left on XLA).
    fuse_stages = {
        int(s) for s in os.environ.get(
            "MMDX_INT8_FUSED_BLOCKS", "").split(",") if s.strip()
    }
    xp = None  # width-padded running activation inside a fused run

    for name, stage, block in _block_names():
        d = q[name]
        stride = 2 if (stage > 0 and block == 0) else 1
        s1, s2, so = sc[f"{name}.a1"], sc[f"{name}.a2"], sc[f"{name}.out"]

        if block > 0 and (stage + 1) in fuse_stages:
            from mmdx_tpu.ops.pallas_int8_bottleneck import (
                fold_block_epilogues, fused_bottleneck_int8, pad_wp,
                unpad_wp,
            )

            b_, h_, w_, _ = xi.shape
            # round W up to the int8 sublane tile, STRICTLY above w_: the
            # kernel needs >=1 zero junk column per row as the 3x3 SAME
            # padding (fused_bottleneck_int8 asserts width < wp)
            wp = -(-(w_ + 1) // 32) * 32
            g = 1 if h_ * wp >= 2048 else (2 if b_ % 2 == 0 else 1)
            if xp is None:
                xp = pad_wp(xi, wp)
            xp = fused_bottleneck_int8(
                xp, **fold_block_epilogues(d, sx, s1, s2, so),
                height=h_, width=w_, wp=wp, g=g,
                interpret=jax.default_backend() != "tpu",
            )
            xi = unpad_wp(xp, h_, w_, wp)  # XLA slices lazily; only
            # materialized if a non-fused consumer actually reads it
            sx = so
            continue
        xp = None

        a = _qconv(xi, d["conv1"], 1, "SAME").astype(jnp.float32)
        a = jax.nn.relu(a * (sx * d["conv1"]["ws"]) + d["conv1"]["b"])
        ai = _requant(a, s1)

        if (
            stride == 2 and _s2d_conv2_enabled() and "w_s2d" in d["conv2"]
            and ai.shape[1] % 2 == 0 and ai.shape[2] % 2 == 0
        ):
            # same bit-exact space-to-depth rewrite for the stage-boundary
            # 3x3 s2 convs (direct form measured at only ~188 TF/s; the 2x2
            # s1 form over 4x channels tiles like a dense GEMM). Gated by
            # MMDX_INT8_S2D_CONV2 until the A/B lands on-chip: the packing
            # transpose is NOT free here (the input is a conv epilogue, not
            # the requant of a host tensor).
            xs = _space_to_depth2(ai)
            dn = lax.conv_dimension_numbers(
                xs.shape, d["conv2"]["w_s2d"].shape, ("NHWC", "HWIO", "NHWC")
            )
            a = lax.conv_general_dilated(
                xs, d["conv2"]["w_s2d"], (1, 1), _S2D_PAD[3],
                dimension_numbers=dn, preferred_element_type=jnp.int32,
            ).astype(jnp.float32)
        else:
            a = _qconv(
                ai, d["conv2"], stride, [(1, 1), (1, 1)]
            ).astype(jnp.float32)
        a = jax.nn.relu(a * (s1 * d["conv2"]["ws"]) + d["conv2"]["b"])
        ai = _requant(a, s2)

        main = _qconv(ai, d["conv3"], 1, "SAME").astype(jnp.float32)
        main = main * (s2 * d["conv3"]["ws"]) + d["conv3"]["b"]
        if "down" in d:
            # Requantize the shortcut to int8 at its own calibrated scale so
            # each dot owns a fused requant epilogue. XLA output fusion holds
            # at most ONE dot/conv root: joining both products in f32 forces
            # one of them to materialize its s32 accumulator to HBM (round-3
            # trace: 10.5 ms across the four downsample joins at B=512).
            ss = sc[f"{name}.short"]
            short = _qconv(xi, d["down"], stride, "SAME").astype(jnp.float32)
            short_i8 = _requant(
                short * (sx * d["down"]["ws"]) + d["down"]["b"], ss
            )
            short = short_i8.astype(jnp.float32) * ss
        else:
            short = xi.astype(jnp.float32) * sx
        y = jax.nn.relu(main + short)
        xi = _requant(y, so)
        sx = so

    return jnp.mean(xi.astype(jnp.float32), axis=(1, 2)) * sx
