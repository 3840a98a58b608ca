"""Minimal torch ResNet-50 oracle (torchvision is not installed in this env).

Standard bottleneck ResNet (v1.5: stride on the 3x3), wrapped the same way the
reference wraps torchvision's model — ``backbone = nn.Sequential(children[:-1])``
followed by a projection and warm-up classifier — so its state_dict keys match
the reference's ``image_state`` layout (``backbone.0.weight`` etc., reference
training_pipeline.py:183).  Used only as a random-weights parity oracle.
"""
import torch
import torch.nn as nn


class TorchBottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride=stride, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = downsample

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


def _make_layer(inplanes, planes, blocks, stride):
    downsample = nn.Sequential(
        nn.Conv2d(inplanes, planes * 4, 1, stride=stride, bias=False),
        nn.BatchNorm2d(planes * 4),
    )
    layers = [TorchBottleneck(inplanes, planes, stride, downsample)]
    inplanes = planes * 4
    for _ in range(1, blocks):
        layers.append(TorchBottleneck(inplanes, planes))
    return nn.Sequential(*layers), inplanes


def make_resnet50_backbone():
    """nn.Sequential equivalent of torchvision resnet50 children()[:-1]."""
    conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
    bn1 = nn.BatchNorm2d(64)
    relu = nn.ReLU(inplace=True)
    maxpool = nn.MaxPool2d(3, stride=2, padding=1)
    inplanes = 64
    layer1, inplanes = _make_layer(inplanes, 64, 3, 1)
    layer2, inplanes = _make_layer(inplanes, 128, 4, 2)
    layer3, inplanes = _make_layer(inplanes, 256, 6, 2)
    layer4, inplanes = _make_layer(inplanes, 512, 3, 2)
    avgpool = nn.AdaptiveAvgPool2d(1)
    return nn.Sequential(conv1, bn1, relu, maxpool, layer1, layer2, layer3, layer4, avgpool)


class TorchImageEncoder(nn.Module):
    """Oracle mirroring the reference ImageEncoderCNN's structure + key names."""

    def __init__(self, d_img=1024, n_disease=13):
        super().__init__()
        self.backbone = make_resnet50_backbone()
        self.proj = nn.Linear(2048, d_img)
        self.classifier = nn.Linear(d_img, n_disease)

    def forward(self, x):
        feats = self.backbone(x).flatten(1)
        z = self.proj(feats)
        return {"embeddings": z, "logits": self.classifier(z)}


def randomize_bn_stats(model, seed=0):
    """Give BN layers nontrivial running stats so eval-mode parity is meaningful."""
    g = torch.Generator().manual_seed(seed)
    for m in model.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean = torch.randn(m.num_features, generator=g) * 0.1
            m.running_var = torch.rand(m.num_features, generator=g) * 2 + 0.5
            with torch.no_grad():
                m.weight.copy_(torch.rand(m.num_features, generator=g) + 0.5)
                m.bias.copy_(torch.randn(m.num_features, generator=g) * 0.1)
