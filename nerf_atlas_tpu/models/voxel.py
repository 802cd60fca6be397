"""Dense voxel-grid radiance fields (static + dynamic spline voxels).

Capability parity: /root/reference/src/nerf.py:401-524 (NeRFVoxel:
sigma + reflectance-parameter grids, trilinear interpolation, the
`to_voxel()` reflectance protocol, upsampling) and :1526-1586
(DynamicNeRFVoxel: voxel grid of Bezier control points + rigidity grid,
first control point pinned to 0).

TPU-first: lookups are the single-gather trilinear kernel from ops.grid;
`upsample_params` is a functional param transform (pytree -> pytree) —
the structured-checkpoint analog of the reference's in-place upsample().
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import grid as grid_ops, sh as sh_ops
from ..ops.math import load_sigmoid, normalize
from .base import NeRFBase, view_per_sample


class NeRFVoxel(NeRFBase):
  """Dense grids for density and reflectance parameters.

  refl_kind selects the voxel decode:
    "pos"             -> 3 channels, raw RGB through the sigmoid;
    "pos-linear-view" -> 3 + 9 channels: RGB × SH(deg 2)-modulated
                         view-dependent scalar gate in [0.5, 1].
  """
  resolution: int = 64
  refl_kind: str = "pos"
  world_min: float = -1.0
  world_max: float = 1.0
  # eval tiling bound (driver.render_view): a 65536-ray eval chunk's
  # 4.2M-point trilinear grid gather crashes the v5e remote compile
  # helper (subprocess exit 1, no diagnostic — round 5); the 4096-ray
  # train batch shape is proven, so eval reuses it
  EVAL_CHUNK_CAP = 4096

  def setup(self):
    R = self.resolution
    self.sigma_grid = self.param(
        "sigma_grid", nn.initializers.constant(0.1), (R, R, R, 1))
    C = 3 if self.refl_kind == "pos" else 3 + 9
    self.refl_grid = self.param(
        "refl_grid", lambda k, s: jax.random.uniform(k, s) * 0.1, (R, R, R, C))

  def _decode_refl(self, refl_params, view):
    act = load_sigmoid(self.sigmoid_kind)
    rgb = act(refl_params[..., :3])
    if self.refl_kind == "pos-linear-view":
      coeffs = refl_params[..., 3:].reshape(refl_params.shape[:-1] + (1, 9))
      gate = jax.nn.sigmoid(
          sh_ops.eval_sh(2, coeffs, normalize(view))) * 0.5 + 0.5
      rgb = rgb * gate
    return rgb

  def query(self, pts, view=None, latent=None, train: bool = False):
    kw = dict(world_min=self.world_min, world_max=self.world_max)
    density = grid_ops.grid_lookup(self.sigma_grid, pts, **kw)[..., 0]
    density = self.add_density_noise(density, train)
    refl_params = grid_ops.grid_lookup(self.refl_grid, pts, **kw)
    rgb = self._decode_refl(refl_params, view)
    return density, rgb

  def __call__(self, rays, times=None, latents=None, train: bool = False):
    pts, ts, r_o, r_d = self.sample_points(rays, train)
    view = view_per_sample(r_d, self.steps)
    density, rgb = self.query(pts, view=view, train=train)
    out = self.finish(density, rgb, ts, r_d, train)
    out["tv_sigma"] = grid_ops.total_variation(self.sigma_grid)
    out["tv_refl"] = grid_ops.total_variation(self.refl_grid)
    return out


class DynamicNeRFVoxel(NeRFBase):
  """Voxel grid of Bezier-spline control points (+ rigidity grid) warping
  into a canonical voxel field; control point 0 pinned to 0."""
  resolution: int = 64
  warp_resolution: int = 32
  spline_points: int = 4
  refl_kind: str = "pos"
  world_min: float = -1.0
  world_max: float = 1.0
  EVAL_CHUNK_CAP = 4096  # see NeRFVoxel

  def setup(self):
    Rw = self.warp_resolution
    n_ctrl_free = self.spline_points - 1
    self.ctrl_grid = self.param(
        "ctrl_grid", nn.initializers.zeros, (Rw, Rw, Rw, n_ctrl_free * 3))
    self.rigidity_grid = self.param(
        "rigidity_grid", nn.initializers.zeros, (Rw, Rw, Rw, 1))
    self.canonical = NeRFVoxel(
        resolution=self.resolution, refl_kind=self.refl_kind,
        steps=self.steps, t_near=self.t_near, t_far=self.t_far,
        sky_kind=self.sky_kind, sigmoid_kind=self.sigmoid_kind,
        world_min=self.world_min, world_max=self.world_max,
        name="canonical")

  def delta_x(self, pts, t):
    kw = dict(world_min=self.world_min, world_max=self.world_max)
    from ..ops import bezier
    ctrl = grid_ops.grid_lookup(self.ctrl_grid, pts, **kw)
    ctrl = ctrl.reshape(pts.shape[:-1] + (self.spline_points - 1, 3))
    ctrl = jnp.concatenate([jnp.zeros_like(ctrl[..., :1, :]), ctrl], axis=-2)
    ctrl = jnp.moveaxis(ctrl, -2, 0)
    dp = bezier.de_casteljau(ctrl, t, self.spline_points)
    rig = jax.nn.sigmoid(grid_ops.grid_lookup(self.rigidity_grid, pts, **kw))
    return dp * rig

  def __call__(self, rays, times=None, latents=None, train: bool = False):
    assert times is not None
    pts, ts, r_o, r_d = self.sample_points(rays, train)
    t = jnp.broadcast_to(times[..., None, None], pts.shape[:-1] + (1,))
    dp = self.delta_x(pts, t)
    view = view_per_sample(r_d, self.steps)
    density, rgb = self.canonical.query(pts + dp, view=view, train=train)
    out = self.finish(density, rgb, ts, r_d, train)
    out["dp"] = dp
    out["tv_bezier"] = grid_ops.total_variation(self.ctrl_grid)
    out["tv_rigidity"] = grid_ops.total_variation(self.rigidity_grid)
    return out


def upsample_params(params, new_res: int, grid_names=("sigma_grid",
                                                      "refl_grid")):
  """Functional coarse-to-fine: return params with the named voxel grids
  trilinearly resized to `new_res` (reference's upsample(),
  src/nerf.py:515-524, as a pytree transform)."""
  def visit(tree):
    if isinstance(tree, dict):
      return {k: (grid_ops.upsample_grid(v, new_res)
                  if k in grid_names and hasattr(v, "ndim") and v.ndim == 4
                  else visit(v))
              for k, v in tree.items()}
    return tree
  return visit(params)
