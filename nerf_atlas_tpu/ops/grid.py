"""Dense voxel-grid ops: trilinear interpolation, upsampling, total
variation, random grid sampling.

Behavior parity: /root/reference/src/nerf.py:363-399 (trilinear_weights /
grid_lookup / upsample_grid / total_variation).

TPU-first design: the 8-corner gather is expressed as one flat
`jnp.take` over a linearized index tensor (a single XLA gather with a
[..., 8] index batch) rather than 8 separate advanced-index lookups; the
trilinear blend is a fused VPU weighted sum.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _bit(i, b):
  return (i >> b) & 1


# Corner offsets in the same order the reference builds its weights
# (x-major over bit 0, y bit 1, z bit 2).
_CORNERS = jnp.array([[_bit(i, 0), _bit(i, 1), _bit(i, 2)] for i in range(8)],
                     dtype=jnp.int32)


def trilinear_weights(frac):
  """frac [..., 3] in [0,1] -> weights [..., 8] matching _CORNERS order."""
  x, y, z = frac[..., 0:1], frac[..., 1:2], frac[..., 2:3]
  wx = jnp.concatenate([1 - x, x], axis=-1)  # [..., 2]
  wy = jnp.concatenate([1 - y, y], axis=-1)
  wz = jnp.concatenate([1 - z, z], axis=-1)
  cx, cy, cz = _CORNERS[:, 0], _CORNERS[:, 1], _CORNERS[:, 2]
  return (jnp.take(wx, cx, axis=-1) * jnp.take(wy, cy, axis=-1)
          * jnp.take(wz, cz, axis=-1))


def grid_lookup(grid, pts, *, world_min: float = -1.0, world_max: float = 1.0):
  """Trilinear lookup of `grid` [R, R, R, C] at world points `pts` [..., 3].

  Points outside [world_min, world_max]^3 clamp to the border voxel.
  Returns [..., C].
  """
  R = grid.shape[0]
  C = grid.shape[-1]
  # world -> voxel coordinates
  v = (pts - world_min) / (world_max - world_min) * (R - 1)
  v = jnp.clip(v, 0.0, R - 1 - 1e-6)
  lo = jnp.floor(v)
  frac = v - lo
  lo = lo.astype(jnp.int32)  # [..., 3]

  corners = lo[..., None, :] + _CORNERS  # [..., 8, 3]
  corners = jnp.clip(corners, 0, R - 1)
  flat_idx = (corners[..., 0] * R + corners[..., 1]) * R + corners[..., 2]
  vals = jnp.take(grid.reshape(R * R * R, C), flat_idx, axis=0)  # [..., 8, C]
  w = trilinear_weights(frac)  # [..., 8]
  return jnp.sum(vals * w[..., None], axis=-2)


def upsample_grid(grid, new_res: int, method: str = "trilinear"):
  """Resize [R,R,R,C] -> [new_res]*3 + [C] (for coarse-to-fine training)."""
  del method
  C = grid.shape[-1]
  return jax.image.resize(grid, (new_res, new_res, new_res, C),
                          method="trilinear")


def total_variation(grid, key: Optional[jax.Array] = None,
                    samples: int = 32**3):
  """Mean squared difference between adjacent voxels along each axis.

  With `key`, estimates TV on `samples` random voxels (the reference's
  random_sample_grid + TV combo) instead of the full grid — keeps the
  regularizer O(samples) regardless of resolution.
  """
  def axis_tv(d):
    return jnp.mean(jnp.square(d))

  if key is None:
    dx = grid[1:] - grid[:-1]
    dy = grid[:, 1:] - grid[:, :-1]
    dz = grid[:, :, 1:] - grid[:, :, :-1]
    return axis_tv(dx) + axis_tv(dy) + axis_tv(dz)

  R = grid.shape[0]
  idx = jax.random.randint(key, (samples, 3), 0, R - 1)
  base = grid[idx[:, 0], idx[:, 1], idx[:, 2]]
  tv = 0.0
  for axis in range(3):
    off = idx.at[:, axis].add(1)
    nb = grid[off[:, 0], off[:, 1], off[:, 2]]
    tv = tv + jnp.mean(jnp.square(nb - base))
  return tv


def random_sample_grid(key, grid, samples: int = 4096,
                       *, world_min: float = -1.0, world_max: float = 1.0):
  """Random world-space points inside the grid plus their interpolated
  values (for grid-consistency regularizers)."""
  pts = jax.random.uniform(key, (samples, 3), minval=world_min,
                           maxval=world_max, dtype=grid.dtype)
  return pts, grid_lookup(grid, pts, world_min=world_min, world_max=world_max)
