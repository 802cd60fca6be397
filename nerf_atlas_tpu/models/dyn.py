"""Dynamic (time-varying) model wrappers.

Capability parity: /root/reference/src/nerf.py:1209-1504 —
  DynamicNeRF    :1209-1319  Δx(x,t) MLP (D-NeRF) or Bezier-spline control
                             points from an MLP (Spline-NeRF, the repo's
                             paper), per-point rigidity gate, optional
                             per-time refl latent, keyframe rendering.
  DynamicNeRFAE  :1449-1469  Δx plus Δlatent on NeRFAE's encoding.
  LongDynamicNeRF:1322-1446  poly-Bezier over time segments with one MLP
                             per segment and C0 continuity (previous
                             segment's last control point is reused).

All wrappers hold a canonical model and warp query points before calling
`canonical.query`. Times ride per-ray ([...] matching rays' batch shape).
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn import FourierEncoder, SkipConnMLP
from ..ops import bezier
from .base import NeRFBase, broadcast_latent, view_per_sample


class DynamicNeRF(NeRFBase):
  """D-NeRF-style deformation (spline_points=0) or Spline-NeRF Bezier
  dynamics (spline_points=N>1)."""
  canonical_kind: str = "plain"
  canonical_kwargs: Any = None
  spline_points: int = 0
  with_rigidity: bool = True
  time_latent_size: int = 0

  def setup(self):
    from . import MODEL_KINDS
    kwargs = dict(self.canonical_kwargs or {})
    kwargs.setdefault("steps", self.steps)
    kwargs.setdefault("t_near", self.t_near)
    kwargs.setdefault("t_far", self.t_far)
    kwargs.setdefault("sky_kind", self.sky_kind)
    kwargs.setdefault("sigmoid_kind", self.sigmoid_kind)
    if self.time_latent_size > 0:
      # --dyn-refl-latent: the warp passes a latent from the delta to the
      # canonical reflectance (reference src/nerf.py:1209-1319)
      kwargs["latent_size"] = (self.time_latent_size
                               + kwargs.get("latent_size", 0))
    self.canonical = MODEL_KINDS[self.canonical_kind](**kwargs)
    enc = FourierEncoder(input_dims=4 if self.spline_points == 0 else 3,
                         freqs=32, sigma=16.0)
    out_width = 3 if self.spline_points == 0 else 3 * (self.spline_points - 1)
    self.warp = SkipConnMLP(
        in_size=4 if self.spline_points == 0 else 3,
        out=out_width + self.time_latent_size, enc=enc, num_layers=5,
        hidden_size=256, zero_last=True, dtype=self.dtype, name="warp")
    if self.with_rigidity:
      self.rigidity = SkipConnMLP(in_size=3, out=1, num_layers=3,
                                  hidden_size=64, dtype=self.dtype,
                                  name="rigidity")

  def delta_x_latent(self, pts, t):
    """Deformation (+ optional per-time refl latent) at (pts [..., 3],
    t [..., 1]) -> (dp [..., 3], tlat [..., time_latent_size] | None)."""
    tlat = None
    if self.spline_points == 0:
      w = self.warp(jnp.concatenate([pts, t], axis=-1))
      dp = w[..., :3]
      if self.time_latent_size > 0:
        tlat = w[..., 3:]
    else:
      # control points from an MLP over canonical position; first control
      # point pinned to 0 so t=0 is the canonical frame
      w = self.warp(pts)
      nw = 3 * (self.spline_points - 1)
      ctrl = w[..., :nw].reshape(pts.shape[:-1] + (self.spline_points - 1, 3))
      if self.time_latent_size > 0:
        tlat = w[..., nw:]
      ctrl = jnp.concatenate([jnp.zeros_like(ctrl[..., :1, :]), ctrl],
                             axis=-2)
      ctrl = jnp.moveaxis(ctrl, -2, 0)       # [N_ctrl, ..., 3]
      dp = bezier.de_casteljau(ctrl, t, self.spline_points)
    if self.with_rigidity:
      dp = dp * jax.nn.sigmoid(self.rigidity(pts))
    return dp, tlat

  def delta_x(self, pts, t):
    """Deformation at (pts [..., 3], t [..., 1]) -> dp [..., 3]."""
    return self.delta_x_latent(pts, t)[0]

  def query(self, pts, view=None, latent=None, train: bool = False,
            t=None):
    dp = 0.0 if t is None else self.delta_x(pts, t)
    return self.canonical.query(pts + dp, view=view, latent=latent,
                                train=train)

  def __call__(self, rays, times=None, latents=None, train: bool = False):
    assert times is not None, "dynamic model needs times"
    pts, ts, r_o, r_d = self.sample_points(rays, train)
    t = jnp.broadcast_to(times[..., None, None], pts.shape[:-1] + (1,))
    dp, tlat = self.delta_x_latent(pts, t)
    lat = broadcast_latent(latents, pts.shape, self.latent_size)
    if tlat is not None:
      lat = tlat if lat is None else jnp.concatenate([tlat, lat], axis=-1)
    view = view_per_sample(r_d, self.steps)
    density, rgb = self.canonical.query(pts + dp, view=view, latent=lat,
                                        train=train)
    out = self.finish(density, rgb, ts, r_d, train)
    out["dp"] = dp
    if self.with_rigidity:
      out["rigidity"] = jax.nn.sigmoid(self.rigidity(pts))
    return out


class DynamicNeRFAE(NeRFBase):
  """Δx plus Δlatent applied to a NeRFAE canonical model."""
  canonical_kwargs: Any = None

  def setup(self):
    from .nerf import NeRFAE
    kwargs = dict(self.canonical_kwargs or {})
    kwargs.setdefault("steps", self.steps)
    kwargs.setdefault("t_near", self.t_near)
    kwargs.setdefault("t_far", self.t_far)
    self.canonical = NeRFAE(**kwargs)
    enc = FourierEncoder(input_dims=4, freqs=32, sigma=16.0)
    self.warp = SkipConnMLP(
        in_size=4, out=3 + self.canonical.encoding_size, enc=enc,
        num_layers=5, hidden_size=256, zero_last=True, dtype=self.dtype,
        name="warp")

  def __call__(self, rays, times=None, latents=None, train: bool = False):
    assert times is not None
    pts, ts, r_o, r_d = self.sample_points(rays, train)
    t = jnp.broadcast_to(times[..., None, None], pts.shape[:-1] + (1,))
    w = self.warp(jnp.concatenate([pts, t], axis=-1))
    dp, dlat = w[..., :3], w[..., 3:]
    lat = broadcast_latent(latents, pts.shape, self.latent_size)
    view = view_per_sample(r_d, self.steps)
    enc = self.canonical.encode(pts + dp, lat) + dlat
    density, rgb = self.canonical.query_from_encoding(
        pts + dp, enc, view=view, train=train)
    out = self.finish(density, rgb, ts, r_d, train)
    out["dp"] = dp
    return out


class LongDynamicNeRF(NeRFBase):
  """Segmented poly-Bezier dynamics for long videos: time in [0,1] is
  split into `segments` spans; C0 continuity comes from evaluating
  segment s with the previous segment's endpoint as its first control
  point.

  TPU-first layout (replaces the reference's one-MLP-per-segment with
  sparse `seg.unique()` eval, src/nerf.py:1322-1446): ONE wide warp MLP
  emits every segment's control deltas in a single MXU-friendly matmul;
  a global cumulative sum stitches the poly-Bezier (C0 for free), and a
  per-point windowed gather selects the active segment's control points.
  Warp cost is O(1) in `segments` — the reference pays one MLP per
  segment even when sparse."""
  canonical_kind: str = "plain"
  canonical_kwargs: Any = None
  segments: int = 4
  spline_points: int = 4
  with_rigidity: bool = True

  def setup(self):
    from . import MODEL_KINDS
    kwargs = dict(self.canonical_kwargs or {})
    kwargs.setdefault("steps", self.steps)
    kwargs.setdefault("t_near", self.t_near)
    kwargs.setdefault("t_far", self.t_far)
    self.canonical = MODEL_KINDS[self.canonical_kind](**kwargs)
    enc = FourierEncoder(input_dims=3, freqs=32, sigma=16.0)
    # all segments' control deltas from one MLP; segment 0's first
    # control point is pinned to 0
    self.warp = SkipConnMLP(
        in_size=3, out=3 * (self.spline_points - 1) * self.segments,
        enc=enc, num_layers=4, hidden_size=128, zero_last=True,
        dtype=self.dtype, name="warp")
    if self.with_rigidity:
      self.rigidity = SkipConnMLP(in_size=3, out=1, num_layers=3,
                                  hidden_size=64, dtype=self.dtype,
                                  name="rigidity")

  def _ctrl_track(self, pts):
    """Global stitched control track: padded [..., S*(P-1)+1, 3] where
    padded[0] = 0 and padded[k] = cumsum(deltas)[k-1]. Segment s's
    control points are the window padded[s*(P-1) : s*(P-1)+P] — sharing
    the window edge with its neighbors IS the C0 stitch."""
    P = self.spline_points
    deltas = self.warp(pts).reshape(
        pts.shape[:-1] + (self.segments * (P - 1), 3))
    cum = jnp.cumsum(deltas, axis=-2)
    zero = jnp.zeros(pts.shape[:-1] + (1, 3), pts.dtype)
    return jnp.concatenate([zero, cum], axis=-2)

  def delta_x(self, pts, t):
    S, P = self.segments, self.spline_points
    seg = jnp.clip((t[..., 0] * S).astype(jnp.int32), 0, S - 1)
    local_t = t[..., 0] * S - seg
    padded = self._ctrl_track(pts)                      # [..., S(P-1)+1, 3]
    idx = seg[..., None] * (P - 1) + jnp.arange(P)      # [..., P]
    ctrl = jnp.take_along_axis(
        padded, idx[..., None].astype(jnp.int32), axis=-2)  # [..., P, 3]
    dp = bezier.de_casteljau(jnp.moveaxis(ctrl, -2, 0),
                             local_t[..., None], P)
    if self.with_rigidity:
      dp = dp * jax.nn.sigmoid(self.rigidity(pts))
    return dp

  def __call__(self, rays, times=None, latents=None, train: bool = False):
    assert times is not None
    pts, ts, r_o, r_d = self.sample_points(rays, train)
    t = jnp.broadcast_to(times[..., None, None], pts.shape[:-1] + (1,))
    dp = self.delta_x(pts, t)
    lat = broadcast_latent(latents, pts.shape, self.latent_size)
    view = view_per_sample(r_d, self.steps)
    density, rgb = self.canonical.query(pts + dp, view=view, latent=lat,
                                        train=train)
    out = self.finish(density, rgb, ts, r_d, train)
    out["dp"] = dp
    return out


DYN_MODEL_KINDS = {
    "plain": DynamicNeRF,
    "ae": DynamicNeRFAE,
    "long": LongDynamicNeRF,
}
