"""Differentiable RGB <-> CIELAB conversion chains, NHWC, pure jnp.

Capability parity with the reference conversion chain (Zhang-style,
/root/reference/models/basic.py:395-475), rewritten channel-last and fully
jittable/vmappable. Range conventions match the reference:

  * rgb in [0, 1]
  * normalized lab: L' = (L - 50) / 50 in [-1, 1], ab' = ab / 110 in ~[-1, 1]

Two Lab implementations intentionally coexist in this framework, mirroring the
reference: this differentiable chain feeds losses, while OpenCV's LAB conversion
is used on the host I/O path (see utils/io.py) for bit-compatible PNG output.
"""

from __future__ import annotations

import jax.numpy as jnp

from .cielab import AB_NORM, L_MEAN, L_NORM

# sRGB -> XYZ (D65) matrix rows, as used by the reference.
_RGB2XYZ = jnp.array(
    [
        [0.412453, 0.357580, 0.180423],
        [0.212671, 0.715160, 0.072169],
        [0.019334, 0.119193, 0.950227],
    ],
    dtype=jnp.float32,
)
_XYZ2RGB = jnp.array(
    [
        [3.24048134, -1.53715152, -0.49853633],
        [-0.96925495, 1.87599, 0.04155593],
        [0.05564664, -0.20404134, 1.05731107],
    ],
    dtype=jnp.float32,
)
_WHITE = jnp.array([0.95047, 1.0, 1.08883], dtype=jnp.float32)


def _mat3(x: jnp.ndarray, m: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) @ m.T as explicit elementwise math.

    Written without a matmul on purpose: a (.., 3) x (3, 3) dot would hit the
    MXU's default-bf16 path on TPU and lose ~3 decimal digits; elementwise
    multiply-adds stay in full float32 on the VPU at identical cost.
    """
    m = m.astype(x.dtype)
    out = [
        x[..., 0] * m[i, 0] + x[..., 1] * m[i, 1] + x[..., 2] * m[i, 2] for i in range(3)
    ]
    return jnp.stack(out, axis=-1)


def rgb2xyz(rgb: jnp.ndarray) -> jnp.ndarray:
    """sRGB (..., 3) in [0,1] -> XYZ. Gamma-expands with the sRGB curve.

    Branch inputs are clamped into each branch's own domain before the pow
    ("safe where"): a fractional power at 0 has an infinite derivative whose
    NaN survives the 0-mask multiply in the backward pass. The reference has
    this latent NaN too, but its perceptual loss was accidentally detached
    (loss.py:81) so it never surfaced.
    """
    mask = (rgb > 0.04045).astype(rgb.dtype)
    safe = jnp.maximum(rgb, 0.04045)
    rgb = (((safe + 0.055) / 1.055) ** 2.4) * mask + (rgb / 12.92) * (1 - mask)
    return _mat3(rgb, _RGB2XYZ)


def xyz2rgb(xyz: jnp.ndarray) -> jnp.ndarray:
    """XYZ (..., 3) -> sRGB in [0,1] (gradient-safe at 0, see rgb2xyz)."""
    rgb = _mat3(xyz, _XYZ2RGB)
    rgb = jnp.maximum(rgb, 0.0)
    mask = (rgb > 0.0031308).astype(rgb.dtype)
    safe = jnp.maximum(rgb, 0.0031308)
    return (1.055 * (safe ** (1.0 / 2.4)) - 0.055) * mask + 12.92 * rgb * (1 - mask)


def xyz2lab(xyz: jnp.ndarray) -> jnp.ndarray:
    """XYZ (..., 3) -> Lab (L in [0,100], ab in real units); gradient-safe cube root."""
    xyz_scale = xyz / _WHITE.astype(xyz.dtype)
    mask = (xyz_scale > 0.008856).astype(xyz.dtype)
    safe = jnp.maximum(xyz_scale, 0.008856)
    f = (safe ** (1.0 / 3.0)) * mask + (7.787 * xyz_scale + 16.0 / 116.0) * (1 - mask)
    l = 116.0 * f[..., 1] - 16.0
    a = 500.0 * (f[..., 0] - f[..., 1])
    b = 200.0 * (f[..., 1] - f[..., 2])
    return jnp.stack([l, a, b], axis=-1)


def lab2xyz(lab: jnp.ndarray) -> jnp.ndarray:
    """Lab (..., 3) -> XYZ."""
    y = (lab[..., 0] + 16.0) / 116.0
    x = lab[..., 1] / 500.0 + y
    z = jnp.maximum(y - lab[..., 2] / 200.0, 0.0)
    f = jnp.stack([x, y, z], axis=-1)
    mask = (f > 0.2068966).astype(lab.dtype)
    f = (f**3.0) * mask + (f - 16.0 / 116.0) / 7.787 * (1 - mask)
    return f * _WHITE.astype(lab.dtype)


def rgb2lab(rgb: jnp.ndarray) -> jnp.ndarray:
    """sRGB (..., 3) in [0,1] -> normalized Lab (..., 3) in [-1,1]."""
    lab = xyz2lab(rgb2xyz(rgb))
    l_rs = (lab[..., :1] - L_MEAN) / L_NORM
    ab_rs = lab[..., 1:] / AB_NORM
    return jnp.concatenate([l_rs, ab_rs], axis=-1)


def lab2rgb(lab_rs: jnp.ndarray) -> jnp.ndarray:
    """Normalized Lab (..., 3) in [-1,1] -> sRGB (..., 3) in [0,1]."""
    l = lab_rs[..., :1] * L_NORM + L_MEAN
    ab = lab_rs[..., 1:] * AB_NORM
    return xyz2rgb(lab2xyz(jnp.concatenate([l, ab], axis=-1)))


def rgb2gray(rgb: jnp.ndarray) -> jnp.ndarray:
    """Luma (..., 3) -> (..., 1): 0.299 R + 0.587 G + 0.114 B."""
    w = jnp.array([0.299, 0.587, 0.114], dtype=rgb.dtype)
    return (rgb @ w)[..., None]
