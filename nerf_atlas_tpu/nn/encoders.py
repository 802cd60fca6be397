"""Input encoders: positional sin/cos bands, random/learned Fourier
features, cheap-SIREN, and an Instant-NGP-style multi-level hash grid.

Capability parity: /root/reference/src/neural_blocks.py:14-193.
TPU-first notes:
- every encoder maps [..., D] -> [..., F] with static F so the follow-on
  MLP sees one large static-shape MXU batch;
- HashEncoder keeps the whole table as one [L*T, F] array and gathers the
  8 corners of all L levels with a single `jnp.take` over a fused index
  tensor — one XLA gather instead of L×8 small ones. Gradients scatter-add
  into the table via the gather transpose, which XLA handles natively.
"""
from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


class PositionalEncoder(nn.Module):
  """Classic NeRF sin/cos frequency bands.

  input_dims: D of the input; max_freq_log2/num_freqs control the bands;
  include_input appends the raw input.
  """
  input_dims: int = 3
  max_freq_log2: int = 5
  num_freqs: int = 6
  log_sampling: bool = True
  include_input: bool = True

  def size(self) -> int:
    return self.input_dims * (2 * self.num_freqs + int(self.include_input))

  @nn.compact
  def __call__(self, x):
    if self.log_sampling:
      freqs = 2.0 ** jnp.linspace(0.0, self.max_freq_log2, self.num_freqs)
    else:
      freqs = jnp.linspace(1.0, 2.0 ** self.max_freq_log2, self.num_freqs)
    xb = x[..., None, :] * freqs[:, None]                  # [..., F, D]
    enc = jnp.concatenate([jnp.sin(xb), jnp.cos(xb)], axis=-1)
    enc = enc.reshape(x.shape[:-1] + (-1,))
    if self.include_input:
      enc = jnp.concatenate([x, enc], axis=-1)
    return enc


class FourierEncoder(nn.Module):
  """Random Gaussian Fourier features (non-trainable frequency matrix).

  `scale_freqs()` semantics (reference --inc-fourier-freqs): the caller
  stores a scale multiplier in training state and passes it in; we keep
  the encoder pure by exposing `freq_scale` as a call argument.
  """
  input_dims: int = 3
  freqs: int = 16
  sigma: float = 1 << 5

  def size(self) -> int:
    return self.freqs * 2

  @nn.compact
  def __call__(self, x, freq_scale: float | jax.Array = 1.0):
    B = self.param(
        "B",
        lambda key, shape: jax.random.normal(key, shape) * self.sigma,
        (self.input_dims, self.freqs),
    )
    B = jax.lax.stop_gradient(B) * freq_scale  # fixed random features
    mapped = 2 * math.pi * (x @ B)
    return jnp.concatenate([jnp.sin(mapped), jnp.cos(mapped)], axis=-1)


class LearnedFourierEncoder(nn.Module):
  """Fourier features with a trainable per-frequency scale."""
  input_dims: int = 3
  freqs: int = 16
  sigma: float = 1 << 5

  def size(self) -> int:
    return self.freqs * 2

  @nn.compact
  def __call__(self, x):
    B = self.param(
        "B",
        lambda key, shape: jax.random.normal(key, shape) * self.sigma,
        (self.input_dims, self.freqs),
    )
    scale = self.param("scale", nn.initializers.ones, (self.freqs,))
    mapped = 2 * math.pi * (x @ (jax.lax.stop_gradient(B) * scale))
    return jnp.concatenate([jnp.sin(mapped), jnp.cos(mapped)], axis=-1)


class NNEncoder(nn.Module):
  """sin(30 · Linear(x)) cheap-SIREN first layer as an encoder."""
  input_dims: int = 3
  out: int = 32

  def size(self) -> int:
    return self.out

  @nn.compact
  def __call__(self, x):
    w_init = nn.initializers.uniform(scale=2.0 / self.input_dims)
    # uniform in [-1/in, 1/in]: flax's uniform is [0, scale); shift below.
    y = nn.Dense(self.out, use_bias=False,
                 kernel_init=lambda k, s, d=jnp.float32:
                 jax.random.uniform(k, s, d, -1.0 / self.input_dims,
                                    1.0 / self.input_dims))(x)
    del w_init
    return jnp.sin(30.0 * y)


# NGP hash primes (public constants from the Instant-NGP paper).
_PRIMES = (1, 2654435761, 805459861)


class HashEncoder(nn.Module):
  """Multi-resolution hash-grid encoder (Instant-NGP style).

  levels:     number of resolution levels L
  table_size: entries per level T (power of two)
  features:   feature width F per level
  base_res / max_res: geometric progression of grid resolutions

  Output: [..., L*F]. Dense levels whose full grid fits in the table are
  indexed directly (injective), larger ones via XOR-prime hashing.
  Device-agnostic, one fused gather for all levels and corners.
  """
  levels: int = 8
  table_size: int = 1 << 19
  features: int = 2
  base_res: int = 16
  max_res: int = 2048
  bbox_min: float = -1.0
  bbox_max: float = 1.0

  def size(self) -> int:
    return self.levels * self.features

  def _resolutions(self):
    if self.levels == 1:
      return [self.base_res]
    growth = math.exp(
        (math.log(self.max_res) - math.log(self.base_res)) / (self.levels - 1))
    return [int(round(self.base_res * growth**i)) for i in range(self.levels)]

  @nn.compact
  def __call__(self, x):
    L, T, F = self.levels, self.table_size, self.features
    table = self.param(
        "table",
        lambda key, shape: (jax.random.uniform(key, shape) * 2 - 1) * 1e-4,
        (L * T, F),
    )
    res = jnp.asarray(self._resolutions(), jnp.float32)          # [L]
    batch = x.shape[:-1]
    xn = (x.reshape(-1, 3) - self.bbox_min) / (self.bbox_max - self.bbox_min)
    xn = jnp.clip(xn, 0.0, 1.0)

    # voxel coords per level: [N, L, 3]
    v = xn[:, None, :] * (res[None, :, None] - 1)
    lo = jnp.floor(v)
    frac = (v - lo).astype(x.dtype)
    lo = lo.astype(jnp.uint32)

    # 8 corners: [N, L, 8, 3]
    corners_off = jnp.asarray(
        [[(i >> 0) & 1, (i >> 1) & 1, (i >> 2) & 1] for i in range(8)],
        jnp.uint32)
    corners = lo[:, :, None, :] + corners_off[None, None]
    res_u = res.astype(jnp.uint32)
    corners = jnp.minimum(corners, (res_u - 1)[None, :, None, None])

    # hash (XOR of prime-multiplied coords) or direct index for dense levels
    primes = jnp.asarray(_PRIMES, jnp.uint32)
    hashed = (corners[..., 0] * primes[0]) ^ (corners[..., 1] * primes[1]) \
        ^ (corners[..., 2] * primes[2])
    dense_idx = (corners[..., 2] * res_u[None, :, None]
                 + corners[..., 1]) * res_u[None, :, None] + corners[..., 0]
    # resolutions are static -> decide dense-vs-hashed per level in Python
    dense_fits = jnp.asarray([int(r) ** 3 <= T for r in self._resolutions()],
                             bool)
    idx = jnp.where(dense_fits[None, :, None], dense_idx, hashed) % T

    # offset each level into its own table slice, then ONE gather
    level_off = (jnp.arange(L, dtype=jnp.uint32) * T)[None, :, None]
    flat_idx = (idx + level_off).astype(jnp.int32)               # [N, L, 8]
    vals = jnp.take(table, flat_idx, axis=0)                     # [N, L, 8, F]

    # trilinear blend
    w = ((jnp.where(corners_off[None, None, :, 0] == 1, frac[..., None, 0],
                    1 - frac[..., None, 0]))
         * (jnp.where(corners_off[None, None, :, 1] == 1, frac[..., None, 1],
                      1 - frac[..., None, 1]))
         * (jnp.where(corners_off[None, None, :, 2] == 1, frac[..., None, 2],
                      1 - frac[..., None, 2])))                  # [N, L, 8]
    out = jnp.sum(vals * w[..., None], axis=2)                   # [N, L, F]
    return out.reshape(batch + (L * F,)).astype(x.dtype)
