"""Convolutional blocks: neural upsampler, image feature encoder
(PixelNeRF-style), DCGAN discriminator, and a conv-GRU update operator.

Capability parity: /root/reference/src/neural_blocks.py:381-563.
Notes vs the reference:
- SpatialEncoder: the reference wraps a *pretrained* torchvision ResNet34;
  with no network egress, pretrained weights don't exist here, so this is
  a from-scratch residual conv encoder with the same contract (image ->
  feature pyramid; `sample_features(uv)` bilinear lookup). The latent size
  is configurable rather than pinned to ResNet34's channel widths.
- All convs are NHWC (XLA's preferred TPU layout).
"""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


class Upsampler(nn.Module):
  """GIRAFFE-style neural upsampler: conv + bilinear-resize blocks with an
  RGB skip pyramid (reference src/neural_blocks.py:381-436). Input/output
  NHWC; out size must be a power-of-two-ish multiple of in size."""
  in_size: int
  out_size: int
  in_features: int = 3
  out_features: int = 3
  feats: int = 32
  dtype: Any = jnp.float32

  @nn.compact
  def __call__(self, x):
    import math as _math
    num_blocks = max(1, _math.ceil(_math.log2(self.out_size / self.in_size)))
    h = nn.Conv(self.feats, (3, 3), dtype=self.dtype)(x)
    rgb = nn.Conv(self.out_features, (1, 1), dtype=self.dtype)(h)
    size = self.in_size
    for i in range(num_blocks):
      size = min(size * 2, self.out_size)
      h = jax.image.resize(h, h.shape[:-3] + (size, size, h.shape[-1]),
                           method="bilinear")
      h = nn.leaky_relu(nn.Conv(self.feats, (3, 3), dtype=self.dtype)(h))
      rgb = jax.image.resize(rgb, rgb.shape[:-3] + (size, size,
                                                    self.out_features),
                             method="bilinear")
      rgb = rgb + nn.Conv(self.out_features, (1, 1), dtype=self.dtype)(h)
    if size != self.out_size:
      rgb = jax.image.resize(rgb, rgb.shape[:-3] + (self.out_size,
                                                    self.out_size,
                                                    self.out_features),
                             method="bilinear")
    return rgb


class _ResBlock(nn.Module):
  features: int
  stride: int = 1
  dtype: Any = jnp.float32

  @nn.compact
  def __call__(self, x):
    h = nn.Conv(self.features, (3, 3), strides=(self.stride, self.stride),
                dtype=self.dtype)(x)
    h = nn.relu(nn.GroupNorm(num_groups=8, dtype=self.dtype)(h))
    h = nn.Conv(self.features, (3, 3), dtype=self.dtype)(h)
    h = nn.GroupNorm(num_groups=8, dtype=self.dtype)(h)
    if x.shape[-1] != self.features or self.stride != 1:
      x = nn.Conv(self.features, (1, 1),
                  strides=(self.stride, self.stride), dtype=self.dtype)(x)
    return nn.relu(x + h)


class SpatialEncoder(nn.Module):
  """Image -> per-pixel feature volume + bilinear uv sampling (PixelNeRF).

  `__call__(img)` returns the feature map [..., H', W', latent_size];
  `sample(feats, uv, image_hw)` looks features up at normalized uv
  coordinates in [-1, 1] (matching grid_sample semantics).
  """
  latent_size: int = 64
  num_blocks: int = 3
  dtype: Any = jnp.float32

  @nn.compact
  def __call__(self, img):
    h = nn.Conv(32, (7, 7), strides=(2, 2), dtype=self.dtype)(img)
    h = nn.relu(nn.GroupNorm(num_groups=8, dtype=self.dtype)(h))
    feats = self.latent_size
    for i in range(self.num_blocks):
      h = _ResBlock(feats, stride=1 if i == 0 else 2, dtype=self.dtype)(h)
    return nn.Conv(self.latent_size, (1, 1), dtype=self.dtype)(h)

  @staticmethod
  def sample(feats, uv):
    """Bilinear sample of feats [H, W, C] at uv [..., 2] in [-1, 1]."""
    H, W, C = feats.shape
    x = (uv[..., 0] + 1) * 0.5 * (W - 1)
    y = (uv[..., 1] + 1) * 0.5 * (H - 1)
    x0 = jnp.clip(jnp.floor(x), 0, W - 2).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(y), 0, H - 2).astype(jnp.int32)
    fx = jnp.clip(x - x0, 0.0, 1.0)[..., None]
    fy = jnp.clip(y - y0, 0.0, 1.0)[..., None]
    flat = feats.reshape(H * W, C)
    idx00 = y0 * W + x0
    v00 = jnp.take(flat, idx00, axis=0)
    v01 = jnp.take(flat, idx00 + 1, axis=0)
    v10 = jnp.take(flat, idx00 + W, axis=0)
    v11 = jnp.take(flat, idx00 + W + 1, axis=0)
    return ((v00 * (1 - fx) + v01 * fx) * (1 - fy)
            + (v10 * (1 - fx) + v11 * fx) * fy)


class Discriminator(nn.Module):
  """DCGAN-style conv discriminator (for the GAN-SDF experiments)."""
  features: Sequence[int] = (32, 64, 128, 256)
  dtype: Any = jnp.float32

  @nn.compact
  def __call__(self, img):
    h = img
    for f in self.features:
      h = nn.leaky_relu(
          nn.Conv(f, (4, 4), strides=(2, 2), dtype=self.dtype)(h), 0.2)
    h = h.reshape(h.shape[:-3] + (-1,))
    return nn.Dense(1, dtype=self.dtype)(h)


class UpdateOperator(nn.Module):
  """RAFT-style conv-GRU producing iterative deltas over an image grid."""
  hidden_size: int = 64
  out_features: int = 3
  iters: int = 3
  dtype: Any = jnp.float32

  @nn.compact
  def __call__(self, x):
    convz = nn.Conv(self.hidden_size, (3, 3), dtype=self.dtype, name="convz")
    convr = nn.Conv(self.hidden_size, (3, 3), dtype=self.dtype, name="convr")
    convq = nn.Conv(self.hidden_size, (3, 3), dtype=self.dtype, name="convq")
    head = nn.Conv(self.out_features, (3, 3), dtype=self.dtype, name="head")
    h = jnp.zeros(x.shape[:-1] + (self.hidden_size,), self.dtype)
    out = jnp.zeros(x.shape[:-1] + (self.out_features,), self.dtype)
    for _ in range(self.iters):
      hx = jnp.concatenate([h, x, out], axis=-1)
      z = nn.sigmoid(convz(hx))
      r = nn.sigmoid(convr(hx))
      q = jnp.tanh(convq(jnp.concatenate([r * h, x, out], axis=-1)))
      h = (1 - z) * h + z * q
      out = out + head(h)
    return out
