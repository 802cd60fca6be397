"""The long tail of the model zoo: MPI, RigNeRF (+dynamic), SplineNeRF,
HistogramNeRF, BendyNeRF, RecurrentNeRF, SinglePixelNeRF.

Capability parity:
  MPI            /root/reference/src/nerf.py:1616-1678
  RigNeRF        :1020-1070    DynamicRigNeRF :1472-1504
  SplineNeRF     :714-763
  HistogramNeRF  :583-643   (reference is broken — undefined step_size at
                             :610; ours implements the intended learned
                             sample-placement histogram, working)
  BendyNeRF      :646-712   (sequential Snell refraction march)
  RecurrentNeRF  :1072-1126
  SinglePixelNeRF:1589-1612 (PixelNeRF-style per-pixel image features)
"""
from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn import (EncodedGRU, FourierEncoder, SkipConnMLP, SpatialEncoder)
from ..ops import bezier, integrate
from ..ops.math import dir_to_elev_azim, load_sigmoid, normalize
from ..refl import load_refl
from .base import NeRFBase, broadcast_latent, view_per_sample


class MPI(NeRFBase):
  """Multi-plane image: N parallel planes with per-plane embeddings; a
  SIREN MLP maps (in-plane uv, plane embedding) -> (alpha, rgb);
  front-to-back compositing."""
  n_planes: int = 32
  normal: Any = (0.0, 0.0, 1.0)
  delta: float = 0.1
  # world-space plane span. Planes are SCENE geometry: they must cover
  # the content volume (the procedural scene sits in |p| <= ~0.7), NOT
  # the camera ray interval — the old offsets in [t_near, t_far] put
  # every plane at z in [2, 6], outside the scene, and MPI quality
  # pinned at the black baseline (round-5 sweep finding). Ref context:
  # the reference's MPI (src/nerf.py:640-664) centers its planes on a
  # reference camera looking at the content.
  plane_min: float = -1.0
  plane_max: float = 1.0

  def setup(self):
    self.embeddings = self.param(
        "plane_emb", nn.initializers.normal(0.1), (self.n_planes, 16))
    self.mlp = SkipConnMLP(in_size=3, out=4, latent_size=16,
                           init_kind="siren", num_layers=5,
                           hidden_size=256, dtype=self.dtype, name="mlp")

  def __call__(self, rays, times=None, latents=None, train: bool = False):
    r_o, r_d = rays[..., :3], rays[..., 3:6]
    n = jnp.asarray(self.normal, rays.dtype)
    # plane offsets along the normal, spanning the content volume
    offsets = self.plane_min + (self.plane_max - self.plane_min) * (
        jnp.arange(self.n_planes, dtype=rays.dtype)
        / max(self.n_planes - 1, 1))
    denom = jnp.sum(r_d * n, axis=-1, keepdims=True)
    denom = jnp.where(jnp.abs(denom) < 1e-6, 1e-6, denom)
    # intersection t per plane: [..., P]
    t = (offsets - jnp.sum(r_o * n, axis=-1, keepdims=True)) / denom
    pts = r_o[..., None, :] + t[..., None] * r_d[..., None, :]
    emb = jnp.broadcast_to(self.embeddings, pts.shape[:-1] + (16,))
    out = self.mlp(pts, emb)
    alpha = jax.nn.sigmoid(out[..., 0])
    # mask out planes behind the camera
    alpha = jnp.where(t > 0, alpha, 0.0)
    rgb = self.rgb_act(out[..., 1:])
    weights = integrate.alpha_composite(alpha)
    img = integrate.volumetric_integrate(weights, rgb)
    img = img + self.sky_color(weights, r_d, train)
    return dict(rgb=img, weights=weights, ts=t, alpha=alpha)


class RigNeRF(NeRFBase):
  """Density from an MLP over inverse squared distances to N learned
  3-D rig points — geometry is controlled by moving the points."""
  n_points: int = 32
  refl_kind: str = "view"

  def setup(self):
    self.points = self.param(
        "rig_points", lambda k, s: jax.random.normal(k, s) * 0.5,
        (self.n_points, 3))
    self.mlp = SkipConnMLP(in_size=self.n_points,
                           out=1 + self.intermediate_size,
                           num_layers=5, hidden_size=256, dtype=self.dtype,
                           name="density_mlp")
    self.refl = load_refl(self.refl_kind, latent_size=self.intermediate_size,
                          act=self.sigmoid_kind)

  def _density_input(self, pts, points):
    d2 = jnp.sum(
        jnp.square(pts[..., None, :] - points), axis=-1)
    return 1.0 / (1.0 + 10.0 * d2)

  def query(self, pts, view=None, latent=None, train: bool = False,
            points=None):
    points = self.points if points is None else points
    out = self.mlp(self._density_input(pts, points))
    density = self.add_density_noise(out[..., 0], train)
    rgb = self.refl(pts, view=view, latent=out[..., 1:])
    return density, rgb

  def __call__(self, rays, times=None, latents=None, train: bool = False):
    pts, ts, r_o, r_d = self.sample_points(rays, train)
    view = view_per_sample(r_d, self.steps)
    density, rgb = self.query(pts, view=view, train=train)
    out = self.finish(density, rgb, ts, r_d, train)
    out["rig_points"] = self.points
    return out


class DynamicRigNeRF(NeRFBase):
  """Bezier spline per rig point: control points are parameters (not MLP
  outputs); the canonical RigNeRF reads the moved points."""
  n_points: int = 32
  spline_points: int = 4
  refl_kind: str = "view"

  def setup(self):
    self.canonical = RigNeRF(
        n_points=self.n_points, refl_kind=self.refl_kind, steps=self.steps,
        t_near=self.t_near, t_far=self.t_far, sky_kind=self.sky_kind,
        sigmoid_kind=self.sigmoid_kind,
        intermediate_size=self.intermediate_size, name="canonical")
    self.ctrl = self.param(
        "ctrl", nn.initializers.zeros,
        (self.spline_points - 1, self.n_points, 3))

  def points_at(self, t):
    """Rig point positions at time t (scalar or [..., 1, 1] batched)."""
    base = self.canonical.points
    ctrl = jnp.concatenate([jnp.zeros_like(self.ctrl[:1]), self.ctrl], 0)
    t = jnp.asarray(t)
    extra = max(t.ndim - 2, 0)   # batch dims ahead of the (P, 3) tail
    ctrl = ctrl.reshape((ctrl.shape[0],) + (1,) * extra + ctrl.shape[1:])
    dp = bezier.de_casteljau(ctrl, t, self.spline_points)
    return base + dp

  def __call__(self, rays, times=None, latents=None, train: bool = False):
    assert times is not None
    pts, ts, r_o, r_d = self.sample_points(rays, train)
    view = view_per_sample(r_d, self.steps)
    # per-ray time -> per-ray rig points: broadcast t over control dims
    t = times.reshape(times.shape + (1, 1))        # [..., 1, 1]
    points = self.points_at(t)                     # [..., P, 3]
    points = points[..., None, :, :]               # add sample axis
    points = jnp.broadcast_to(points,
                              pts.shape[:-1] + (self.n_points, 3))
    out_mlp = self.canonical.mlp(
        self.canonical._density_input(pts, points))
    density = self.canonical.add_density_noise(out_mlp[..., 0], train)
    rgb = self.canonical.refl(pts, view=view, latent=out_mlp[..., 1:])
    out = self.finish(density, rgb, ts, r_d, train)
    out["rig_points"] = points
    return out


class SplineNeRF(NeRFBase):
  """Density from a 2-D Bezier patch over (elev, azim) × a radial MLP."""
  patch_n: int = 4
  refl_kind: str = "view"

  def setup(self):
    self.ctrl = self.param(
        "patch", nn.initializers.normal(0.1),
        (self.patch_n, self.patch_n, 16))
    self.mlp = SkipConnMLP(in_size=1, out=1 + self.intermediate_size,
                           latent_size=16,
                           enc=FourierEncoder(input_dims=1, freqs=16,
                                              sigma=8.0),
                           num_layers=4, hidden_size=128, dtype=self.dtype,
                           name="radial")
    self.refl = load_refl(self.refl_kind, latent_size=self.intermediate_size,
                          act=self.sigmoid_kind)

  def query(self, pts, view=None, latent=None, train: bool = False):
    elaz = dir_to_elev_azim(pts)
    u = (elaz[..., 0:1] / math.pi)                 # [0, 1] (acos range)
    v = (elaz[..., 1:2] / math.pi + 1) * 0.5       # [0, 1]
    rad = jnp.linalg.norm(pts, axis=-1, keepdims=True)
    # de Casteljau along both patch axes (broadcast over pts' batch dims)
    P = self.patch_n
    ctrl = self.ctrl.reshape((P,) + (1,) * (pts.ndim - 1) + (P, 16))
    rows = bezier.de_casteljau(ctrl, u[..., None], P)     # [..., P, 16]
    cols = jnp.moveaxis(rows, -2, 0)                      # [P, ..., 16]
    patch_feat = bezier.de_casteljau(cols, v, P)          # [..., 16]
    out = self.mlp(rad, patch_feat)
    density = self.add_density_noise(out[..., 0], train)
    rgb = self.refl(pts, view=view, latent=out[..., 1:])
    return density, rgb

  def __call__(self, rays, times=None, latents=None, train: bool = False):
    pts, ts, r_o, r_d = self.sample_points(rays, train)
    view = view_per_sample(r_d, self.steps)
    density, rgb = self.query(pts, view=view, train=train)
    return self.finish(density, rgb, ts, r_d, train)


class HistogramNeRF(NeRFBase):
  """Learned per-ray histogram over [t_near, t_far] that places samples
  where the ray needs them (working version of the reference's broken
  experiment): a small MLP over the ray maps to bin weights; samples are
  drawn by inverse-CDF over those bins and fed to a PlainNeRF-style
  field."""
  refl_kind: str = "view"
  bins: int = 32

  def setup(self):
    from ..nn import HashEncoder
    self.hist_mlp = SkipConnMLP(in_size=6, out=self.bins, num_layers=3,
                                hidden_size=64, dtype=self.dtype,
                                name="hist")
    self.first = SkipConnMLP(in_size=3, out=1 + self.intermediate_size,
                             enc=HashEncoder(), num_layers=5,
                             hidden_size=256, dtype=self.dtype,
                             name="density_mlp")
    self.refl = load_refl(self.refl_kind, latent_size=self.intermediate_size,
                          act=self.sigmoid_kind)

  def query(self, pts, view=None, latent=None, train: bool = False):
    out = self.first(pts, latent)
    density = self.add_density_noise(out[..., 0], train)
    rgb = self.refl(pts, view=view, latent=out[..., 1:])
    return density, rgb

  def __call__(self, rays, times=None, latents=None, train: bool = False):
    from ..ops import sampling
    logits = self.hist_mlp(rays)                       # [..., bins]
    edges = jnp.linspace(self.t_near, self.t_far, self.bins + 1,
                         dtype=rays.dtype)
    mids = 0.5 * (edges[:-1] + edges[1:])
    w = jax.nn.softmax(logits, axis=-1)
    key = self.make_rng("sampler") if train else None
    ts = sampling.sample_pdf(
        jnp.broadcast_to(mids, w.shape), w, N=self.steps, key=key)
    pts = rays[..., None, :3] + ts[..., :, None] * rays[..., None, 3:]
    r_d = rays[..., 3:6]
    view = view_per_sample(r_d, self.steps)
    density, rgb = self.query(pts, view=view, train=train)
    out = self.finish(density, rgb, ts, r_d, train)
    out["hist_weights"] = w
    return out


class BendyNeRF(NeRFBase):
  """Curved rays: a learned index-of-refraction field bends the ray at
  each step (Snell), marched sequentially with lax.scan."""
  refl_kind: str = "view"

  def setup(self):
    from ..nn import HashEncoder
    self.ior_mlp = SkipConnMLP(
        in_size=3, out=1 + 3,
        enc=FourierEncoder(input_dims=3, freqs=16, sigma=4.0),
        num_layers=3, hidden_size=64, zero_last=True, dtype=self.dtype,
        name="ior")
    self.first = SkipConnMLP(in_size=3, out=1 + self.intermediate_size,
                             enc=HashEncoder(), num_layers=5,
                             hidden_size=256, dtype=self.dtype,
                             name="density_mlp")
    self.refl = load_refl(self.refl_kind, latent_size=self.intermediate_size,
                          act=self.sigmoid_kind)

  def __call__(self, rays, times=None, latents=None, train: bool = False):
    r_o, r_d = rays[..., :3], normalize(rays[..., 3:6])
    dt = (self.t_far - self.t_near) / self.steps
    # touch the ior MLP once outside the scan so its params exist before
    # the traced body runs (linen + lax.scan requirement)
    _ = self.ior_mlp(r_o)

    def march_step(carry, _unused):
      pos, direc = carry
      ior_out = self.ior_mlp(pos)
      grad_n = ior_out[..., 1:]                    # learned ∇ior surrogate
      new_dir = normalize(direc + dt * grad_n)
      new_pos = pos + dt * new_dir
      return (new_pos, new_dir), (new_pos, new_dir)

    init = (r_o + self.t_near * r_d, r_d)
    _, (pts, dirs) = jax.lax.scan(march_step, init, None, length=self.steps)
    pts = jnp.moveaxis(pts, 0, -2)                 # [..., T, 3]
    dirs = jnp.moveaxis(dirs, 0, -2)
    out_mlp = self.first(pts)
    density = self.add_density_noise(out_mlp[..., 0], train)
    rgb = self.refl(pts, view=dirs, latent=out_mlp[..., 1:])
    ts = self.t_near + dt * (
        1 + jnp.arange(self.steps, dtype=rays.dtype))
    return self.finish(density, rgb, ts, r_d, train)


class RecurrentNeRF(NeRFBase):
  """EncodedGRU multi-resolution density: returns a coarse-to-fine image
  pyramid; the finest level is `rgb`."""
  refl_kind: str = "view"

  def setup(self):
    self.gru = EncodedGRU(in_size=3, out=1 + self.intermediate_size,
                          hidden_size=128, dtype=self.dtype, name="gru")
    self.refl = load_refl(self.refl_kind, latent_size=self.intermediate_size,
                          act=self.sigmoid_kind)

  def __call__(self, rays, times=None, latents=None, train: bool = False):
    pts, ts, r_o, r_d = self.sample_points(rays, train)
    levels = self.gru(pts)                          # [L, ..., T, 1+I]
    view = view_per_sample(r_d, self.steps)
    images = []
    out = None
    for i in range(levels.shape[0]):
      density = self.add_density_noise(levels[i][..., 0], train)
      rgb = self.refl(pts, view=view, latent=levels[i][..., 1:])
      out = self.finish(density, rgb, ts, r_d, train)
      images.append(out["rgb"])
    out["pyramid"] = jnp.stack(images, 0)
    return out


class SinglePixelNeRF(NeRFBase):
  """PixelNeRF-style: condition a canonical NeRF on per-pixel image
  features sampled at the reference view's projection of each point.

  With `focal`/`img_size` set (the pixel-single CLI path: one image, an
  identity pinhole camera), `uv` is derived from the ray directions so
  the driver only has to thread `image` through extra_kwargs."""
  canonical_kind: str = "plain"
  canonical_kwargs: Any = None
  feat_size: int = 64
  focal: float = 0.0
  img_size: int = 0

  def setup(self):
    from . import MODEL_KINDS
    kwargs = dict(self.canonical_kwargs or {})
    kwargs.setdefault("steps", self.steps)
    kwargs.setdefault("t_near", self.t_near)
    kwargs.setdefault("t_far", self.t_far)
    kwargs["latent_size"] = self.feat_size
    self.canonical = MODEL_KINDS[self.canonical_kind](**kwargs)
    self.encoder = SpatialEncoder(latent_size=self.feat_size,
                                  name="spatial_enc")

  def _uv_from_rays(self, r_d):
    """Identity-camera inverse projection: ray dir -> uv in [-1, 1]."""
    z = jnp.maximum(-r_d[..., 2:3], 1e-8)
    u = r_d[..., 0:1] / z * self.focal + self.img_size * 0.5
    v = -r_d[..., 1:2] / z * self.focal + self.img_size * 0.5
    return 2.0 * jnp.concatenate([u, v], -1) / self.img_size - 1.0

  def __call__(self, rays, times=None, latents=None, train: bool = False,
               image=None, uv=None):
    """`image` [H, W, 3]: the conditioning view; `uv` [..., 2] in [-1,1]:
    where each ray's pixel projects in that view."""
    assert image is not None, "pixel-single needs the conditioning image"
    if uv is None:
      assert self.focal > 0 and self.img_size > 0, (
          "pass uv explicitly or set focal/img_size for the identity-"
          "camera fallback")
      uv = self._uv_from_rays(rays[..., 3:6])
    feats = self.encoder(image)
    per_pixel = SpatialEncoder.sample(feats, uv)    # [..., F]
    pts, ts, r_o, r_d = self.sample_points(rays, train)
    lat = jnp.broadcast_to(per_pixel[..., None, :],
                           pts.shape[:-1] + (self.feat_size,))
    view = view_per_sample(r_d, self.steps)
    density, rgb = self.canonical.query(pts, view=view, latent=lat,
                                        train=train)
    return self.finish(density, rgb, ts, r_d, train)
