"""Loss composition: base losses × color spaces × tone map / gamma.

Capability parity: /root/reference/runner.py:467-479, 552-603 — the loss
is a sum over selected base losses (l2/l1/rmse/fft/ssim) applied in
selected color spaces (rgb/hsv/luminance/xyz), with optional tone mapping
(x/(1+x)), gamma decoding, and an SDF-style masked silhouette loss.

All losses operate on flat ray batches [N, C] (prediction vs target);
image-structured losses (ssim, fft) accept [..., H, W, C] crops.
"""
from __future__ import annotations

import math
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp

from ..ops.math import rgb2hsv, rgb2luminance, rgb2xyz


def l2(x, ref):
  return jnp.mean(jnp.square(x - ref))


def l1(x, ref):
  return jnp.mean(jnp.abs(x - ref))


def rmse(x, ref):
  return jnp.sqrt(jnp.maximum(l2(x, ref), 1e-12))


def fft_loss(x, ref):
  """Spectral L2 over the last three axes (needs image-shaped input)."""
  fx = jnp.fft.rfft2(x, axes=(-3, -2))
  fr = jnp.fft.rfft2(ref, axes=(-3, -2))
  return jnp.mean(jnp.abs(fx - fr) ** 2)


def _gaussian_kernel(size: int = 11, sigma: float = 1.5):
  xs = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2
  g = jnp.exp(-0.5 * (xs / sigma) ** 2)
  g = g / g.sum()
  return g[:, None] * g[None, :]


def ssim(x, ref, *, max_val: float = 1.0):
  """Single-scale SSIM over [..., H, W, C] (mean over channels/windows)."""
  k = _gaussian_kernel()[..., None, None]          # [11, 11, 1, 1]
  C = x.shape[-1]
  kern = jnp.tile(k, (1, 1, 1, C))

  def filt(img):
    # depthwise conv via lax.conv_general_dilated with feature_group_count
    img4 = img.reshape((-1,) + img.shape[-3:])
    out = jax.lax.conv_general_dilated(
        img4, kern, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=C)
    return out.reshape(img.shape[:-3] + out.shape[-3:])

  mu_x, mu_r = filt(x), filt(ref)
  mu_x2, mu_r2, mu_xr = mu_x ** 2, mu_r ** 2, mu_x * mu_r
  sx = filt(x * x) - mu_x2
  sr = filt(ref * ref) - mu_r2
  sxr = filt(x * ref) - mu_xr
  c1 = (0.01 * max_val) ** 2
  c2 = (0.03 * max_val) ** 2
  score = ((2 * mu_xr + c1) * (2 * sxr + c2)) / (
      (mu_x2 + mu_r2 + c1) * (sx + sr + c2))
  return jnp.mean(score)


def ssim_loss(x, ref):
  return 1.0 - ssim(x, ref)


_MSSSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def _downsample2(img):
  """2x average-pool over [..., H, W, C]."""
  h, w = img.shape[-3] // 2, img.shape[-2] // 2
  img = img[..., : h * 2, : w * 2, :]
  s = img.shape
  img = img.reshape(s[:-3] + (h, 2, w, 2, s[-1]))
  return img.mean(axis=(-4, -2))


def ms_ssim(x, ref, *, max_val: float = 1.0, levels: int = 5):
  """Multi-scale SSIM over [..., H, W, C] (standard 5-level weights;
  levels shrink automatically for small images)."""
  h = min(x.shape[-3], x.shape[-2])
  usable = 1
  while usable < levels and (h >> usable) >= 11:
    usable += 1
  weights = jnp.asarray(_MSSSIM_WEIGHTS[:usable])
  weights = weights / weights.sum()
  total = 1.0
  for i in range(usable):
    s = ssim(x, ref, max_val=max_val)
    total = total * jnp.maximum(s, 1e-6) ** weights[i]
    if i + 1 < usable:
      x, ref = _downsample2(x), _downsample2(ref)
  return total


LOSS_KINDS = {
    "l2": l2,
    "l1": l1,
    "rmse": rmse,
    "fft": fft_loss,
    "ssim": ssim_loss,
}

COLOR_SPACES = {
    "rgb": lambda v: v,
    "hsv": rgb2hsv,
    "luminance": rgb2luminance,
    "xyz": rgb2xyz,
}


def mse2psnr(mse):
  return -10.0 * jnp.log10(jnp.maximum(mse, 1e-10))


def psnr(x, ref):
  return mse2psnr(l2(x, ref))


def load_loss_fn(
    loss_kinds: Sequence[str] = ("l2",),
    color_spaces: Sequence[str] = ("rgb",),
    tone_map: bool = False,
    gamma_correct=False,
    style_weight: float = 0.0,
) -> Callable:
  """Compose the training loss (reference runner.py:552-603).

  Returns loss(pred [N, 3|4], target [N, C]) -> scalar. When the target
  has 4 channels the 4th is a mask: masked silhouette supervision uses
  pred's optional 4th channel (throughput) against it (SDF-style,
  runner.py:598), and RGB loss is computed everywhere (matching the
  reference's behavior of supervising full images).

  `gamma_correct`: bool (True -> 2.2) or a float gamma (the reference's
  --gamma-correct-loss takes an arbitrary float, runner.py:109-111).
  """
  fns = [LOSS_KINDS[k] for k in loss_kinds]
  spaces = [COLOR_SPACES[c] for c in color_spaces]
  gamma = (2.2 if gamma_correct is True
           else float(gamma_correct) if gamma_correct else 1.0)

  def loss(pred, target):
    pred_rgb = pred[..., :3]
    targ_rgb = target[..., :3]
    if tone_map:
      pred_rgb = pred_rgb / (1 + pred_rgb)
      targ_rgb = targ_rgb / (1 + targ_rgb)
    if gamma != 1.0:
      pred_rgb = jnp.sign(pred_rgb) * jnp.abs(pred_rgb) ** (1 / gamma)
      targ_rgb = jnp.sign(targ_rgb) * jnp.abs(targ_rgb) ** (1 / gamma)
    total = 0.0
    for f in fns:
      for s in spaces:
        total = total + f(s(pred_rgb), s(targ_rgb))
    if pred.shape[-1] > 3 and target.shape[-1] > 3:
      total = total + l2(pred[..., 3:4], target[..., 3:4])
    return total

  return loss
