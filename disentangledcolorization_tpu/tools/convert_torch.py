"""PyTorch reference checkpoint -> flax variables converter.

Maps the reference DISCO state_dicts (/root/reference layout) onto this
framework's parameter trees so pretrained weights (DISCO, DISCO-c0.2,
SpixelNet-s16, README.md:57-61) load for pixel-level parity and for skipping
stage-1 pretraining. Layout transforms:

  torch Conv2d weight (O, I, kh, kw)        -> HWIO (kh, kw, I, O)
  torch ConvTranspose2d weight (I, O, kh, kw) -> spatial flip + (kh, kw, I, O)
      (our Deconv is an lhs-dilated conv with a pre-flipped kernel)
  torch Linear weight (out, in)             -> kernel (in, out)
  torch BatchNorm weight/bias/running_*     -> scale/bias + batch_stats mean/var
  spectral_norm weight_orig,u,v             -> folded: weight_orig / sigma
                                               unfolded: kernel=weight_orig, u

Run as a script to convert a .pth.tar into an .npz/orbax dir:
  python -m disentangledcolorization_tpu.tools.convert_torch ckpt.pth.tar out_dir
"""

from __future__ import annotations

import sys
from typing import Mapping

import numpy as np


def _conv_w(w):
    return np.transpose(w, (2, 3, 1, 0))


def _deconv_w(w):
    return np.ascontiguousarray(np.transpose(w[:, :, ::-1, ::-1], (2, 3, 0, 1)))


def _linear_w(w):
    return np.transpose(w)


def _sn_sigma(w_orig, u, v):
    w_mat = w_orig.reshape(w_orig.shape[0], -1)
    return float(u @ (w_mat @ v))


class _TreeBuilder:
    """Collects params/batch_stats/spectral leaves by path."""

    def __init__(self, sd: Mapping[str, np.ndarray], sn_folded: bool):
        self.sd = {k: np.asarray(v) for k, v in sd.items()}
        self.sn_folded = sn_folded
        self.params: dict = {}
        self.batch_stats: dict = {}
        self.spectral: dict = {}

    def _set(self, tree: dict, path: tuple[str, ...], leaf):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = np.asarray(leaf)

    def conv(self, tkey: str, path: tuple[str, ...], bias: bool = True):
        # our Conv wraps nn.Conv under the name 'conv'
        self._set(self.params, path + ("conv", "kernel"), _conv_w(self.sd[f"{tkey}.weight"]))
        if bias and f"{tkey}.bias" in self.sd:
            self._set(self.params, path + ("conv", "bias"), self.sd[f"{tkey}.bias"])

    def raw_conv(self, tkey: str, path: tuple[str, ...], bias: bool = True):
        # plain nn.Conv (no wrapper), e.g. SpixelNet units
        self._set(self.params, path + ("kernel",), _conv_w(self.sd[f"{tkey}.weight"]))
        if bias and f"{tkey}.bias" in self.sd:
            self._set(self.params, path + ("bias",), self.sd[f"{tkey}.bias"])

    def deconv(self, tkey: str, path: tuple[str, ...]):
        self._set(self.params, path + ("kernel",), _deconv_w(self.sd[f"{tkey}.weight"]))
        if f"{tkey}.bias" in self.sd:
            self._set(self.params, path + ("bias",), self.sd[f"{tkey}.bias"])

    def snconv(self, tkey: str, path: tuple[str, ...]):
        w_orig = self.sd[f"{tkey}.weight_orig"]
        u = self.sd[f"{tkey}.weight_u"]
        v = self.sd[f"{tkey}.weight_v"]
        if self.sn_folded:
            w = w_orig / _sn_sigma(w_orig, u, v)
            self._set(self.params, path + ("kernel",), _conv_w(w))
        else:
            self._set(self.params, path + ("kernel",), _conv_w(w_orig))
            self._set(self.spectral, path + ("u",), u)
        if f"{tkey}.bias" in self.sd:
            self._set(self.params, path + ("bias",), self.sd[f"{tkey}.bias"])

    def bn(self, tkey: str, path: tuple[str, ...]):
        # our BatchNorm wraps nn.BatchNorm under 'bn'
        self._set(self.params, path + ("bn", "scale"), self.sd[f"{tkey}.weight"])
        self._set(self.params, path + ("bn", "bias"), self.sd[f"{tkey}.bias"])
        self._set(self.batch_stats, path + ("bn", "mean"), self.sd[f"{tkey}.running_mean"])
        self._set(self.batch_stats, path + ("bn", "var"), self.sd[f"{tkey}.running_var"])

    def linear(self, tkey: str, path: tuple[str, ...], bias: bool = True):
        self._set(self.params, path + ("kernel",), _linear_w(self.sd[f"{tkey}.weight"]))
        if bias and f"{tkey}.bias" in self.sd:
            self._set(self.params, path + ("bias",), self.sd[f"{tkey}.bias"])

    def layernorm(self, tkey: str, path: tuple[str, ...]):
        self._set(self.params, path + ("scale",), self.sd[f"{tkey}.weight"])
        self._set(self.params, path + ("bias",), self.sd[f"{tkey}.bias"])


def _convert_spixelnet(b: _TreeBuilder, tprefix: str, path: tuple[str, ...]):
    """SpixelNet (reference network.py:260-313): conv units are Sequential
    (Conv2d, BN, LeakyReLU) with batchNorm, deconvs (ConvTranspose2d, LeakyReLU)."""
    units = [
        "conv0a", "conv0b", "conv1a", "conv1b", "conv2a", "conv2b",
        "conv3a", "conv3b", "conv4a", "conv4b", "conv3_1", "conv2_1",
        "conv1_1", "conv0_1",
    ]
    for u in units:
        b.raw_conv(f"{tprefix}{u}.0", path + (u, "conv"), bias=False)
        b.bn(f"{tprefix}{u}.1", path + (u, "norm"))
    for d in ("deconv3", "deconv2", "deconv1", "deconv0"):
        b.deconv(f"{tprefix}{d}.0", path + (d, "deconv"))
    b.raw_conv(f"{tprefix}pred_mask0", path + ("pred_mask0",))


def _convert_colorprobnet(b: _TreeBuilder, tprefix: str, path: tuple[str, ...]):
    """ColorProbNet (network.py:147-236). Encoder stages: Sequential of
    [SNConv, LReLU]*n + BN; decoder plain convs."""
    stages = {
        "conv1_2": 2, "conv2_3": 3, "conv3_3": 3, "conv4_3": 3,
        "conv5_3": 3, "conv6_3": 3, "conv7_3": 3,
    }
    for name, n in stages.items():
        for i in range(n):
            b.snconv(f"{tprefix}{name}.{2 * i}", path + (name, f"conv{i}"))
        b.bn(f"{tprefix}{name}.{2 * n}", path + (name, "norm"))
    # decoder (torchvision Sequential indices per network.py:188-201)
    b.conv(f"{tprefix}conv8up.1", path + ("conv8up",))
    b.conv(f"{tprefix}conv3short8.0", path + ("conv3short8",))
    b.conv(f"{tprefix}conv8_3.1", path + ("conv8_1",))
    b.conv(f"{tprefix}conv8_3.3", path + ("conv8_2",))
    b.bn(f"{tprefix}conv8_3.5", path + ("norm8",))
    b.conv(f"{tprefix}conv9up.1", path + ("conv9up",))
    b.conv(f"{tprefix}conv9_2.0", path + ("conv9_1",))
    b.bn(f"{tprefix}conv9_2.2", path + ("norm9",))
    b.conv(f"{tprefix}conv10up.1", path + ("conv10up",))
    b.conv(f"{tprefix}conv10_2.1", path + ("conv10_1",))


def _convert_encoder(b: _TreeBuilder, tprefix: str, path: tuple[str, ...], n_layers: int = 6):
    """TransformerEncoder (transformer2d.py:9-60): layers.{i}.{self_attn,...}."""
    for i in range(n_layers):
        tl = f"{tprefix}layers.{i}."
        pl = path + (f"layer{i}",)
        b._set(b.params, pl + ("self_attn", "in_proj_weight"), b.sd[tl + "self_attn.in_proj_weight"])
        b._set(b.params, pl + ("self_attn", "in_proj_bias"), b.sd[tl + "self_attn.in_proj_bias"])
        b.linear(tl + "self_attn.out_proj", pl + ("self_attn", "out_proj"))
        b.linear(tl + "linear1", pl + ("linear1",))
        b.linear(tl + "linear2", pl + ("linear2",))
        b.layernorm(tl + "norm1", pl + ("norm1",))
        b.layernorm(tl + "norm2", pl + ("norm2",))


def _convert_convblock(b: _TreeBuilder, tprefix: str, path: tuple[str, ...], conv_num: int, use_norm: bool):
    """ConvBlock (network.py:10-28): inConv Sequential(Conv,ReLU) + conv Sequential."""
    b.conv(f"{tprefix}inConv.0", path + ("in_conv",))
    for i in range(conv_num - 1):
        b.conv(f"{tprefix}conv.{2 * i}", path + (f"conv{i}",))
    if use_norm:
        b.bn(f"{tprefix}conv.{2 * (conv_num - 1)}", path + ("norm",))


def _convert_downblock(b: _TreeBuilder, tprefix: str, path: tuple[str, ...], conv_num: int, use_norm: bool):
    b.conv(f"{tprefix}conv.0", path + ("down_conv",))
    for i in range(conv_num - 1):
        b.conv(f"{tprefix}conv.{2 * (i + 1)}", path + (f"conv{i}",))
    if use_norm:
        b.bn(f"{tprefix}conv.{2 * conv_num}", path + ("norm",))


def _convert_upblock(b: _TreeBuilder, tprefix: str, path: tuple[str, ...], conv_num: int, use_norm: bool):
    b.conv(f"{tprefix}conv1", path + ("conv1",))
    b.conv(f"{tprefix}combine", path + ("combine",))
    for i in range(conv_num - 1):
        b.conv(f"{tprefix}conv2.{2 * i}", path + (f"post_conv{i}",))
    if use_norm:
        b.bn(f"{tprefix}conv2.{2 * (conv_num - 1)}", path + ("norm",))


def _convert_residual(b: _TreeBuilder, tprefix: str, path: tuple[str, ...], use_norm: bool):
    """ResidualBlock (network.py:31-47): [Conv, SNConv, (BN), ReLU, Conv, (BN)]."""
    b.conv(f"{tprefix}conv.0", path + ("conv_a",))
    b.snconv(f"{tprefix}conv.1", path + ("conv_sn",))
    i = 2
    if use_norm:
        b.bn(f"{tprefix}conv.{i}", path + ("norm1",))
        i += 1
    i += 1  # ReLU
    b.conv(f"{tprefix}conv.{i}", path + ("conv_b",))
    if use_norm:
        b.bn(f"{tprefix}conv.{i + 1}", path + ("norm2",))


def _convert_hourglass(b: _TreeBuilder, tprefix: str, path: tuple[str, ...], res_num: int = 3):
    """HourGlass2 (network.py:125-144), built with normLayer=BatchNorm2d and
    residuals without norm (model.py:44, network.py:131)."""
    _convert_convblock(b, f"{tprefix}inConv.", path + ("in_conv",), 2, True)
    _convert_downblock(b, f"{tprefix}down1.", path + ("down1",), 2, True)
    _convert_downblock(b, f"{tprefix}down2.", path + ("down2",), 2, True)
    for i in range(res_num):
        _convert_residual(b, f"{tprefix}residual.{i}.", path + (f"residual{i}",), use_norm=False)
    _convert_upblock(b, f"{tprefix}up2.", path + ("up2",), 3, True)
    _convert_upblock(b, f"{tprefix}up1.", path + ("up1",), 3, True)
    b.conv(f"{tprefix}outConv", path + ("out_conv",))


def convert_spixelseg_state_dict(sd: Mapping[str, np.ndarray]) -> dict:
    """SpixelSeg standalone checkpoint ('net.*' keys, train_spixel stage 1)."""
    b = _TreeBuilder(sd, sn_folded=False)
    _convert_spixelnet(b, "net.", ("net",))
    return {"params": b.params, "batch_stats": b.batch_stats}


def convert_disco_state_dict(
    sd: Mapping[str, np.ndarray],
    hint2regress: bool = False,
    enhanced: bool = True,
    sn_folded: bool = True,
) -> dict:
    """Full AnchorColorProb checkpoint -> flax variables.

    sn_folded=True emits inference-only weights (spectral sigma divided in);
    construct the model with sn_folded=True to match.
    """
    sd = {k.replace("module.", "", 1) if k.startswith("module.") else k: v for k, v in sd.items()}
    b = _TreeBuilder(sd, sn_folded=sn_folded)
    _convert_spixelnet(b, "segnet.net.", ("segnet", "net"))
    _convert_colorprobnet(b, "repnet.", ("repnet",))
    _convert_encoder(b, "wildpath.", ("wildpath",))
    _convert_encoder(b, "hintpath.", ("hintpath",))
    b.linear("mid_word_prj", ("mid_word_prj",), bias=False)
    b.linear("trg_word_emb", ("trg_word_emb",), bias=False)
    b.linear("trg_word_prj", ("trg_word_prj",), bias=False)
    if enhanced:
        _convert_hourglass(b, "enhanceNet.", ("enhanceNet",))
    out = {"params": b.params, "batch_stats": b.batch_stats}
    if not sn_folded:
        out["spectral"] = b.spectral
    return out


def convert_vgg19_torchvision(sd: Mapping[str, np.ndarray]) -> dict:
    """torchvision vgg19 state_dict -> raw npz dict for models/vgg.py."""
    return {k: np.asarray(v) for k, v in sd.items() if k.startswith("features.")}


def load_torch_checkpoint(path: str) -> dict:
    """Load a .pth(.tar) with torch (cpu) and return numpy state_dict."""
    import torch

    data = torch.load(path, map_location="cpu", weights_only=False)
    sd = data.get("state_dict", data) if isinstance(data, dict) else data
    return {k: v.detach().cpu().numpy() for k, v in sd.items()}


def main():
    if len(sys.argv) < 3:
        print(__doc__)
        sys.exit(1)
    src, out = sys.argv[1], sys.argv[2]
    sd = load_torch_checkpoint(src)
    if any(k.startswith("features.") for k in sd):
        np.savez(out, **convert_vgg19_torchvision(sd))
        print(f"wrote VGG19 npz to {out}")
        return
    if any(k.startswith("segnet.") for k in sd):
        variables = convert_disco_state_dict(sd)
    else:
        variables = convert_spixelseg_state_dict(sd)
    import pickle

    with open(out, "wb") as f:
        pickle.dump(variables, f)
    print(f"wrote converted variables to {out}")


if __name__ == "__main__":
    main()


def convert_inception_torchvision(
    sd: Mapping[str, "np.ndarray"], include_fc: bool = False
) -> dict:
    """torchvision inception_v3 state_dict -> InceptionV3Features flax variables.

    Generic walk: '<mod>.conv.weight' -> params[<mod>]/conv/kernel (HWIO),
    '<mod>.bn.{weight,bias}' -> params, running stats -> batch_stats.
    AuxLogits entries are ignored; the ``fc`` classifier head is converted
    only when ``include_fc`` (needed for Inception Score, where
    InceptionV3Features(with_logits=True) consumes it).
    """
    params: dict = {}
    stats: dict = {}

    def set_path(tree, dotted, leaf):
        node = tree
        parts = dotted.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = np.asarray(leaf)

    for k, v in sd.items():
        if k.startswith("AuxLogits."):
            continue
        if k.startswith("fc."):
            if include_fc:
                if k == "fc.weight":  # torch Linear (out, in) -> flax (in, out)
                    set_path(params, "fc.kernel", np.asarray(v).T)
                elif k == "fc.bias":
                    set_path(params, "fc.bias", v)
            continue
        v = np.asarray(v)
        if k.endswith(".conv.weight"):
            set_path(params, k[: -len(".weight")] + ".kernel", _conv_w(v))
        elif k.endswith(".bn.weight"):
            set_path(params, k[: -len(".weight")] + ".scale", v)
        elif k.endswith(".bn.bias"):
            set_path(params, k, v)
        elif k.endswith(".bn.running_mean"):
            set_path(stats, k[: -len(".running_mean")] + ".mean", v)
        elif k.endswith(".bn.running_var"):
            set_path(stats, k[: -len(".running_var")] + ".var", v)
    return {"params": params, "batch_stats": stats}
