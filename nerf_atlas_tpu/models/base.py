"""Shared model machinery: render config, point sampling, compositing,
backgrounds, latent plumbing.

Capability parity: CommonNeRF (/root/reference/src/nerf.py:147-276) —
t bounds/steps, mip encoding, per-pixel/instance/per-point latents, sky
color kinds, sigmoid kind, intermediate feature width.

Model contract (TPU wire format):
  __call__(rays [..., 6], times=None, latents=None, train=False)
      -> dict: rgb [..., 3], weights [..., T], ts, plus model extras.
  query(pts [..., 3], view [..., 3], latents, train)
      -> (density [...], rgb [..., 3])   - the point-field view, used by
  dynamic wrappers, hierarchical samplers, and the fused Pallas path.
Stratified jitter and density noise draw from the 'sampler' rng stream:
  model.apply(params, rays, train=True, rngs={"sampler": key}).
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn import SkipConnMLP
from ..ops import integrate, mip as mip_ops, rays as rays_ops
from ..ops.math import dir_to_elev_azim, load_sigmoid


class NeRFBase(nn.Module):
  """Base class holding the common render configuration."""
  steps: int = 64
  t_near: float = 2.0
  t_far: float = 6.0
  mip: Optional[str] = None              # None | "cone" | "cylinder"
  sky_kind: str = "black"                # black|white|random|mlp
  sigmoid_kind: str = "thin"
  intermediate_size: int = 32
  latent_size: int = 0                   # total extra latent fed to fields
  density_noise: float = 0.0
  per_ray_jitter: bool = False
  lindisp: bool = False                  # sample linear in disparity
  dtype: Any = jnp.float32

  # ---- helpers shared by all subclasses --------------------------------

  def sample_points(self, rays, train: bool):
    key = self.make_rng("sampler") if train else None
    return rays_ops.compute_pts_ts(
        rays, self.t_near, self.t_far, self.steps,
        lindisp=self.lindisp,
        perturb=1.0 if train else 0.0, key=key,
        per_ray_jitter=self.per_ray_jitter)

  def add_density_noise(self, density, train: bool):
    if train and self.density_noise > 0:
      key = self.make_rng("sampler")
      density = density + self.density_noise * jax.random.normal(
          key, density.shape, density.dtype)
    return density

  def rgb_act(self, v):
    return load_sigmoid(self.sigmoid_kind)(v)

  def mip_encode(self, r_o, r_d, ts):
    """IPE features per sample when mip is enabled, else None."""
    if self.mip is None:
      return None
    enc = mip_ops.load_mip(self.mip)
    if ts.ndim == 1:
      ts = jnp.broadcast_to(ts, r_o.shape[:-1] + ts.shape)
    t0, t1 = mip_ops.mip_segments(ts)
    rad = jnp.full_like(t0, 1e-3)
    return enc(r_o, r_d, t0, t1, rad)

  def sky_color(self, weights, r_d, train: bool):
    """Background contribution on leftover transmittance [..., 1|3]."""
    kind = self.sky_kind
    if kind == "black":
      return 0.0
    rem = integrate.leftover_transmittance(weights)
    if kind == "white":
      return rem
    if kind == "random":
      if not train:
        return 0.0
      key = self.make_rng("sampler")
      return rem * jax.random.uniform(key, rem.shape, rem.dtype)
    if kind == "mlp":
      elaz = dir_to_elev_azim(r_d)
      sky = SkipConnMLP(in_size=2, out=3, num_layers=3, hidden_size=64,
                        dtype=self.dtype, name="sky_mlp")
      return rem * self.rgb_act(sky(elaz))
    raise NotImplementedError(f"unknown sky kind {kind}")

  def finish(self, density, rgb, ts, r_d, train: bool,
             softplus: bool = True) -> Dict[str, Any]:
    """density [..., T], rgb [..., T, 3] -> composited output dict."""
    alpha, weights = integrate.alpha_from_density(density, ts, r_d,
                                                  softplus=softplus)
    img = integrate.volumetric_integrate(weights, rgb)
    img = img + self.sky_color(weights, r_d, train)
    return dict(rgb=img, weights=weights, ts=ts, alpha=alpha)


def broadcast_latent(latents, pts_shape, latent_size: int):
  """Broadcast an optional latent to [..., T, L]; None when unused."""
  if latents is None or latent_size == 0:
    return None
  return jnp.broadcast_to(latents[..., None, :],
                          pts_shape[:-1] + (latents.shape[-1],))


def view_per_sample(r_d, steps: int):
  """Ray direction broadcast to every sample: [..., T, 3]."""
  return jnp.broadcast_to(r_d[..., None, :], r_d.shape[:-1] + (steps, 3))
