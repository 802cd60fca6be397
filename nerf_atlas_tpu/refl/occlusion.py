"""Occlusion models and direct/path integrators for relightable rendering.

Capability parity: /root/reference/src/renderers.py:29-237. An occlusion
model maps (pts, light_dir, visibility-test fn) -> attenuation in [0, 1];
integrators loop over lights: attenuation × BRDF × incident spectrum.

The visibility test `isect_fn(pts, dir) -> hit mask` is supplied by the
model (e.g. VolSDF's sdf intersect_mask); everything is dense/masked —
no boolean compaction, TPU-static shapes.
"""
from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn import SkipConnMLP
from ..ops.math import dir_to_elev_azim


def lighting_wo_isect(pts, light_dir, isect_fn=None, params=None):
  """No shadows: attenuation 1 everywhere."""
  return jnp.ones_like(light_dir[..., :1])


class LightingWIsect(nn.Module):
  """Hard binary shadows from the raycast visibility test."""

  @nn.compact
  def __call__(self, pts, light_dir, isect_fn):
    hit = isect_fn(pts, light_dir)                 # [...] bool, True=occluded
    return (~hit).astype(pts.dtype)[..., None]


class LearnedLighting(nn.Module):
  """Raycast shadows with a learned attenuation where occluded."""

  @nn.compact
  def __call__(self, pts, light_dir, isect_fn):
    hit = isect_fn(pts, light_dir)[..., None]
    mlp = SkipConnMLP(in_size=5, out=1, num_layers=3, hidden_size=64,
                      name="atten")
    inp = jnp.concatenate([pts, dir_to_elev_azim(light_dir)], axis=-1)
    att = jax.nn.sigmoid(mlp(inp))
    return jnp.where(hit, att, 1.0)


class LearnedConstantSoftLighting(nn.Module):
  """Raycast shadows with a single learned alpha for occluded points."""

  @nn.compact
  def __call__(self, pts, light_dir, isect_fn):
    alpha = self.param("alpha", nn.initializers.constant(-1.0), ())
    hit = isect_fn(pts, light_dir)[..., None]
    return jnp.where(hit, jax.nn.sigmoid(alpha), 1.0)


class AllLearnedOcc(nn.Module):
  """Fully learned attenuation MLP over position (+ light elaz)."""
  use_dir: bool = True

  @nn.compact
  def __call__(self, pts, light_dir, isect_fn=None):
    del isect_fn
    if self.use_dir:
      inp = jnp.concatenate([pts, dir_to_elev_azim(light_dir)], axis=-1)
    else:
      inp = pts
    mlp = SkipConnMLP(in_size=inp.shape[-1], out=1, num_layers=3,
                      hidden_size=64, name="atten")
    return jax.nn.sigmoid(mlp(inp))


class JointLearnedConstOcc(nn.Module):
  """All-learned attenuation × raycast-constant shadows."""
  use_dir: bool = True   # --all-learned-occ-kind of the nested module

  @nn.compact
  def __call__(self, pts, light_dir, isect_fn):
    learned = AllLearnedOcc(use_dir=self.use_dir,
                            name="all_learned")(pts, light_dir)
    const = LearnedConstantSoftLighting(name="const")(pts, light_dir,
                                                      isect_fn)
    return learned * const


OCC_KINDS = {
    None: lighting_wo_isect,
    "none": lighting_wo_isect,
    "hard": LightingWIsect,
    "learned": LearnedLighting,
    "learned-const": LearnedConstantSoftLighting,
    "all-learned": AllLearnedOcc,
    "joint-all-const": JointLearnedConstOcc,
}


def load_occlusion(kind: Optional[str], **kwargs):
  ctor = OCC_KINDS.get(kind, None)
  if ctor is None and kind not in OCC_KINDS:
    raise NotImplementedError(f"unknown occlusion kind {kind}")
  if ctor is lighting_wo_isect or ctor is None:
    return lighting_wo_isect
  return ctor(**kwargs)


class Direct(nn.Module):
  """Direct illumination: sum over lights of occ × BRDF × spectrum.

  `refl` and `occ` are submodules; `light` is a light pytree/module;
  `isect_fn` the visibility test.
  """
  refl: Any = None
  occ: Any = None

  @nn.compact
  def __call__(self, x, view, normal, light, isect_fn,
               view_idx=None, latent=None):
    light_dir, spectrum = light(x, view_idx=view_idx)  # [..., L, 3/C]
    L = light_dir.shape[-2]
    total = 0.0
    for i in range(L):
      ld = light_dir[..., i, :]
      sp = spectrum[..., i, :]
      att = self.occ(x, ld, isect_fn)
      bsdf = self.refl(x, view=view, normal=normal, light=ld, latent=latent)
      total = total + att * bsdf * sp
    return total


# The one-bounce "path" integrator lives where it is actually used:
# `models/volsdf.py:VolSDF._one_bounce` (marched second surface, hemisphere
# sampling, learned transfer). Select it with `integrator_kind="path"` on
# VolSDF / `--integrator-kind path` on the CLI. The reference's standalone
# Path class (src/renderers.py:205-237) was unfinished and uncalled; we do
# not mirror a dead class here.
