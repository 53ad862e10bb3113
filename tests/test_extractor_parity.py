"""Numeric parity of the VGG19 / InceptionV3 extractors vs torch forwards.

torchvision is absent in this environment, so its *architectures* are rebuilt
here in plain torch (which is present) with the exact torchvision module
layout and state_dict key names, random-initialized, converted through
tools/convert_torch, and compared activation-for-activation against the flax
implementations. This verifies everything except the pretrained weight
*values*: layer graph, padding/pooling semantics (incl. count_include_pad
avg-pools), BN eps, state_dict key mapping, and OIHW->HWIO conversion.

Reference context: the reference consumes torchvision's pretrained VGG19 for
its perceptual loss (/root/reference/models/loss.py:138-223) and distributes
FID/IS tooling (InceptionV3-based) as an external download
(/root/reference/README.md:109-118).
"""

from __future__ import annotations

import numpy as np
import pytest


def _rel_err(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return float(np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-12))


# ---------------------------------------------------------------------------
# VGG19
# ---------------------------------------------------------------------------


def _torch_vgg19_features(torch, seed=0):
    """torchvision ``vgg19().features`` layout: Sequential under ``features.``"""
    nn = torch.nn
    from disentangledcolorization_tpu.models.vgg import _VGG19_CFG

    torch.manual_seed(seed)
    layers, ic = [], 3
    for c in _VGG19_CFG:
        if c == "M":
            layers.append(nn.MaxPool2d(kernel_size=2, stride=2))
        else:
            layers.append(nn.Conv2d(ic, int(c), kernel_size=3, padding=1))
            layers.append(nn.ReLU(inplace=False))
            ic = int(c)
    wrapper = nn.Module()
    wrapper.features = nn.Sequential(*layers)
    # keep activation magnitudes sane through 16 relu convs
    with torch.no_grad():
        for m in wrapper.features:
            if isinstance(m, nn.Conv2d):
                m.weight.mul_(0.5)
    return wrapper.eval()


@pytest.mark.parametrize("feat_type", ["liu", "lei", "lpips"])
def test_vgg19_slices_match_torch(feat_type, tmp_path):
    torch = pytest.importorskip("torch")
    import jax.numpy as jnp

    from disentangledcolorization_tpu.models.vgg import (
        _SLICES,
        IMAGENET_MEAN,
        IMAGENET_STD,
        VGG19Features,
        load_vgg19_params,
    )
    from disentangledcolorization_tpu.tools.convert_torch import convert_vgg19_torchvision

    net = _torch_vgg19_features(torch)
    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    npz = tmp_path / "vgg19.npz"
    np.savez(npz, **convert_vgg19_torchvision(sd))
    variables = load_vgg19_params(str(npz))
    assert variables is not None

    rng = np.random.default_rng(1)
    x01 = rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)

    # torch path: normalize, walk the sequential, tap the activation that is
    # the *input* to each slice-boundary index (same convention as the flax
    # module and the reference's torchvision slicing, loss.py:158-173)
    xn = (x01 - IMAGENET_MEAN) / IMAGENET_STD
    h = torch.from_numpy(np.ascontiguousarray(xn.transpose(0, 3, 1, 2)))
    boundaries = _SLICES[feat_type]
    taps = []
    with torch.no_grad():
        for i, layer in enumerate(net.features):
            if i in boundaries:
                taps.append(h.numpy().transpose(0, 2, 3, 1))
            if i >= max(boundaries):
                break
            h = layer(h)
    assert len(taps) == len(boundaries)

    outs = VGG19Features(feat_type=feat_type).apply(variables, jnp.asarray(x01))
    assert len(outs) == len(taps)
    for got, want in zip(outs, taps):
        assert got.shape == want.shape
        assert _rel_err(got, want) < 2e-4


# ---------------------------------------------------------------------------
# InceptionV3 (torchvision inception_v3 layout)
# ---------------------------------------------------------------------------


def _torch_inception3(torch, seed=0):
    nn = torch.nn
    F = torch.nn.functional

    class BasicConv2d(nn.Module):
        def __init__(self, ic, oc, **kw):
            super().__init__()
            self.conv = nn.Conv2d(ic, oc, bias=False, **kw)
            self.bn = nn.BatchNorm2d(oc, eps=0.001)

        def forward(self, x):
            return F.relu(self.bn(self.conv(x)))

    class InceptionA(nn.Module):
        def __init__(self, ic, pool_features):
            super().__init__()
            self.branch1x1 = BasicConv2d(ic, 64, kernel_size=1)
            self.branch5x5_1 = BasicConv2d(ic, 48, kernel_size=1)
            self.branch5x5_2 = BasicConv2d(48, 64, kernel_size=5, padding=2)
            self.branch3x3dbl_1 = BasicConv2d(ic, 64, kernel_size=1)
            self.branch3x3dbl_2 = BasicConv2d(64, 96, kernel_size=3, padding=1)
            self.branch3x3dbl_3 = BasicConv2d(96, 96, kernel_size=3, padding=1)
            self.branch_pool = BasicConv2d(ic, pool_features, kernel_size=1)

        def forward(self, x):
            b1 = self.branch1x1(x)
            b5 = self.branch5x5_2(self.branch5x5_1(x))
            bd = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
            bp = self.branch_pool(F.avg_pool2d(x, 3, stride=1, padding=1))
            return torch.cat([b1, b5, bd, bp], 1)

    class InceptionB(nn.Module):
        def __init__(self, ic):
            super().__init__()
            self.branch3x3 = BasicConv2d(ic, 384, kernel_size=3, stride=2)
            self.branch3x3dbl_1 = BasicConv2d(ic, 64, kernel_size=1)
            self.branch3x3dbl_2 = BasicConv2d(64, 96, kernel_size=3, padding=1)
            self.branch3x3dbl_3 = BasicConv2d(96, 96, kernel_size=3, stride=2)

        def forward(self, x):
            b3 = self.branch3x3(x)
            bd = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
            return torch.cat([b3, bd, F.max_pool2d(x, 3, stride=2)], 1)

    class InceptionC(nn.Module):
        def __init__(self, ic, c7):
            super().__init__()
            self.branch1x1 = BasicConv2d(ic, 192, kernel_size=1)
            self.branch7x7_1 = BasicConv2d(ic, c7, kernel_size=1)
            self.branch7x7_2 = BasicConv2d(c7, c7, kernel_size=(1, 7), padding=(0, 3))
            self.branch7x7_3 = BasicConv2d(c7, 192, kernel_size=(7, 1), padding=(3, 0))
            self.branch7x7dbl_1 = BasicConv2d(ic, c7, kernel_size=1)
            self.branch7x7dbl_2 = BasicConv2d(c7, c7, kernel_size=(7, 1), padding=(3, 0))
            self.branch7x7dbl_3 = BasicConv2d(c7, c7, kernel_size=(1, 7), padding=(0, 3))
            self.branch7x7dbl_4 = BasicConv2d(c7, c7, kernel_size=(7, 1), padding=(3, 0))
            self.branch7x7dbl_5 = BasicConv2d(c7, 192, kernel_size=(1, 7), padding=(0, 3))
            self.branch_pool = BasicConv2d(ic, 192, kernel_size=1)

        def forward(self, x):
            b1 = self.branch1x1(x)
            b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
            bd = self.branch7x7dbl_5(
                self.branch7x7dbl_4(
                    self.branch7x7dbl_3(self.branch7x7dbl_2(self.branch7x7dbl_1(x)))
                )
            )
            bp = self.branch_pool(F.avg_pool2d(x, 3, stride=1, padding=1))
            return torch.cat([b1, b7, bd, bp], 1)

    class InceptionD(nn.Module):
        def __init__(self, ic):
            super().__init__()
            self.branch3x3_1 = BasicConv2d(ic, 192, kernel_size=1)
            self.branch3x3_2 = BasicConv2d(192, 320, kernel_size=3, stride=2)
            self.branch7x7x3_1 = BasicConv2d(ic, 192, kernel_size=1)
            self.branch7x7x3_2 = BasicConv2d(192, 192, kernel_size=(1, 7), padding=(0, 3))
            self.branch7x7x3_3 = BasicConv2d(192, 192, kernel_size=(7, 1), padding=(3, 0))
            self.branch7x7x3_4 = BasicConv2d(192, 192, kernel_size=3, stride=2)

        def forward(self, x):
            b3 = self.branch3x3_2(self.branch3x3_1(x))
            b7 = self.branch7x7x3_4(
                self.branch7x7x3_3(self.branch7x7x3_2(self.branch7x7x3_1(x)))
            )
            return torch.cat([b3, b7, F.max_pool2d(x, 3, stride=2)], 1)

    class InceptionE(nn.Module):
        def __init__(self, ic):
            super().__init__()
            self.branch1x1 = BasicConv2d(ic, 320, kernel_size=1)
            self.branch3x3_1 = BasicConv2d(ic, 384, kernel_size=1)
            self.branch3x3_2a = BasicConv2d(384, 384, kernel_size=(1, 3), padding=(0, 1))
            self.branch3x3_2b = BasicConv2d(384, 384, kernel_size=(3, 1), padding=(1, 0))
            self.branch3x3dbl_1 = BasicConv2d(ic, 448, kernel_size=1)
            self.branch3x3dbl_2 = BasicConv2d(448, 384, kernel_size=3, padding=1)
            self.branch3x3dbl_3a = BasicConv2d(384, 384, kernel_size=(1, 3), padding=(0, 1))
            self.branch3x3dbl_3b = BasicConv2d(384, 384, kernel_size=(3, 1), padding=(1, 0))
            self.branch_pool = BasicConv2d(ic, 192, kernel_size=1)

        def forward(self, x):
            b1 = self.branch1x1(x)
            b3 = self.branch3x3_1(x)
            b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
            bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
            bd = torch.cat([self.branch3x3dbl_3a(bd), self.branch3x3dbl_3b(bd)], 1)
            bp = self.branch_pool(F.avg_pool2d(x, 3, stride=1, padding=1))
            return torch.cat([b1, b3, bd, bp], 1)

    class Inception3(nn.Module):
        def __init__(self):
            super().__init__()
            self.Conv2d_1a_3x3 = BasicConv2d(3, 32, kernel_size=3, stride=2)
            self.Conv2d_2a_3x3 = BasicConv2d(32, 32, kernel_size=3)
            self.Conv2d_2b_3x3 = BasicConv2d(32, 64, kernel_size=3, padding=1)
            self.Conv2d_3b_1x1 = BasicConv2d(64, 80, kernel_size=1)
            self.Conv2d_4a_3x3 = BasicConv2d(80, 192, kernel_size=3)
            self.Mixed_5b = InceptionA(192, pool_features=32)
            self.Mixed_5c = InceptionA(256, pool_features=64)
            self.Mixed_5d = InceptionA(288, pool_features=64)
            self.Mixed_6a = InceptionB(288)
            self.Mixed_6b = InceptionC(768, c7=128)
            self.Mixed_6c = InceptionC(768, c7=160)
            self.Mixed_6d = InceptionC(768, c7=160)
            self.Mixed_6e = InceptionC(768, c7=192)
            self.Mixed_7a = InceptionD(768)
            self.Mixed_7b = InceptionE(1280)
            self.Mixed_7c = InceptionE(2048)
            self.fc = nn.Linear(2048, 1000)

        def forward(self, x):
            x = self.Conv2d_1a_3x3(x)
            x = self.Conv2d_2a_3x3(x)
            x = self.Conv2d_2b_3x3(x)
            x = F.max_pool2d(x, 3, stride=2)
            x = self.Conv2d_3b_1x1(x)
            x = self.Conv2d_4a_3x3(x)
            x = F.max_pool2d(x, 3, stride=2)
            for blk in (
                self.Mixed_5b, self.Mixed_5c, self.Mixed_5d, self.Mixed_6a,
                self.Mixed_6b, self.Mixed_6c, self.Mixed_6d, self.Mixed_6e,
                self.Mixed_7a, self.Mixed_7b, self.Mixed_7c,
            ):
                x = blk(x)
            feats = torch.flatten(F.adaptive_avg_pool2d(x, (1, 1)), 1)
            return feats, self.fc(feats)

    torch.manual_seed(seed)
    net = Inception3()
    with torch.no_grad():
        for m in net.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.uniform_(-0.1, 0.1)
                m.running_var.uniform_(0.5, 1.5)
                m.weight.uniform_(0.5, 1.5)
                m.bias.uniform_(-0.1, 0.1)
    return net.eval()


def test_inception_v3_matches_torch():
    torch = pytest.importorskip("torch")
    import jax.numpy as jnp

    from disentangledcolorization_tpu.models.inception import InceptionV3Features
    from disentangledcolorization_tpu.tools.convert_torch import convert_inception_torchvision

    net = _torch_inception3(torch)
    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    variables = convert_inception_torchvision(sd)
    variables_fc = convert_inception_torchvision(sd, include_fc=True)

    rng = np.random.default_rng(2)
    x01 = rng.uniform(0, 1, (1, 299, 299, 3)).astype(np.float32)
    with torch.no_grad():
        feats_t, logits_t = net(
            torch.from_numpy(np.ascontiguousarray((x01 * 2 - 1).transpose(0, 3, 1, 2)))
        )

    feats_j = InceptionV3Features().apply(variables, jnp.asarray(x01))
    assert feats_j.shape == (1, 2048)
    assert _rel_err(feats_j, feats_t.numpy()) < 1e-3

    logits_j = InceptionV3Features(with_logits=True).apply(variables_fc, jnp.asarray(x01))
    assert logits_j.shape == (1, 1000)
    assert _rel_err(logits_j, logits_t.numpy()) < 1e-3
