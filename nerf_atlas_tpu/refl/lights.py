"""Light models: point lights with inverse-square decay and a learned
ambient light field.

Capability parity: /root/reference/src/lights.py:31-137. Point lights are
a pytree (positions can come from data or be trained); Field is a flax
module. `__call__(pts) -> (direction_toward_light [..., L, 3],
spectrum [..., L, C])`.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax import struct

from ..nn import SkipConnMLP


@struct.dataclass
class Point:
  """Point light(s): positions [N, L, 3] (per-view sets of L lights),
  intensity [L, C] or scalar. `idx` selects the per-batch view set."""
  positions: jnp.ndarray
  intensity: jnp.ndarray
  decay: float = struct.field(pytree_node=False, default=2.0)

  @classmethod
  def make(cls, positions, intensity=100.0, channels: int = 3):
    positions = jnp.asarray(positions, jnp.float32)
    if positions.ndim == 2:
      positions = positions[:, None]
    inten = jnp.broadcast_to(
        jnp.asarray(intensity, jnp.float32),
        (positions.shape[1], channels))
    return cls(positions=positions, intensity=inten)

  @property
  def num_lights(self) -> int:
    return self.positions.shape[1]

  def select(self, view_idx):
    """Per-ray light positions for given view indices: [..., L, 3]."""
    return self.positions[view_idx]

  def __call__(self, pts, view_idx=None, mask=None):
    """pts [..., 3] -> (dir [..., L, 3], spectrum [..., L, C])."""
    del mask
    lp = (self.positions[0] if view_idx is None
          else self.positions[view_idx])           # [..., L, 3]
    d = lp - pts[..., None, :]
    dist2 = jnp.maximum(jnp.sum(d * d, axis=-1, keepdims=True), 1e-8)
    direction = d / jnp.sqrt(dist2)
    falloff = dist2 ** (-self.decay / 2)
    spectrum = self.intensity * falloff
    return direction, spectrum

  def iter_lights(self):
    """One Point per light (the reference's iter(); for integrators)."""
    for i in range(self.num_lights):
      yield Point(positions=self.positions[:, i:i + 1],
                  intensity=self.intensity[i:i + 1], decay=self.decay)


class Field(nn.Module):
  """Learned ambient light field: MLP over (position, direction-ish
  embedding) -> per-point incident light; optional per-image latent."""
  latent_size: int = 0
  channels: int = 3

  @nn.compact
  def __call__(self, pts, view_idx=None, latent=None, mask=None):
    del mask
    mlp = SkipConnMLP(in_size=3, out=self.channels + 3,
                      latent_size=self.latent_size, num_layers=4,
                      hidden_size=128, name="field")
    out = mlp(pts, latent)
    direction = out[..., :3]
    direction = direction / jnp.maximum(
        jnp.linalg.norm(direction, axis=-1, keepdims=True), 1e-6)
    spectrum = jax.nn.softplus(out[..., 3:])
    return direction[..., None, :], spectrum[..., None, :]


LIGHT_KINDS = {
    "point": Point.make,
    "field": Field,
    "dataset": "FROM_DATASET",  # loader-provided positions -> Point.make
}


def load_light(kind: str, **kwargs):
  ctor = LIGHT_KINDS.get(kind)
  if ctor is None:
    raise NotImplementedError(f"unknown light kind {kind}")
  return ctor if ctor == "FROM_DATASET" else ctor(**kwargs)
