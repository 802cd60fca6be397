"""SDF shape models and the SDF surface renderer.

Capability parity: /root/reference/src/sdf.py:15-316 —
  MLP :250-258, SIREN :278-287, Local :290-306, CurlMLP :264-276,
  SmoothedSpheres :172-204, Triangles :212-248, UnitSphere :65-81,
  autograd normals + sphere pre-init :34-62, SDF renderer :83-169.

Every SDF model maps pts [..., 3] -> (sdf [...], latent [..., L]);
`value(pts)` returns just the sdf (the function handed to the marchers).
Normals come from jax.grad through the bound module — exact, and
double-differentiable for eikonal training.
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn import FourierEncoder, SkipConnMLP
from ..ops import march
from ..ops.math import smooth_min
from ..refl import load_refl


class SDFModel(nn.Module):
  """Base: latent size + shared normal/intersection helpers.

  sphere_init: start the field as a unit sphere (the reference pre-fits
  to a sphere by optimization, src/sdf.py:50-62 `set_to_sphere`; here the
  analytic ‖p‖−1 bias achieves the same init exactly, so --sphere-init
  toggles the bias instead of running a fitting loop)."""
  latent_out: int = 32
  sphere_init: bool = True

  def _sphere_bias(self, pts):
    if not self.sphere_init:
      return 0.0
    return jnp.linalg.norm(pts, axis=-1) - 1.0

  def value(self, pts):
    return self(pts)[0]

  def normals(self, pts):
    """∇sdf via autograd (exact; supports grad-of-grad for eikonal)."""
    return jax.grad(lambda p: self.value(p).sum())(pts)


class MLP(SDFModel):
  """Fourier-encoded MLP SDF.

  enc_freqs/enc_sigma: the TPU-native default is 32 freqs at sigma 4
  (the fused VolSDF kernel's envelope, ops/pallas/render_volsdf.py
  S_FREQS); the reference's MLP SDF uses 128 freqs at an effective
  sigma 16 (ref src/sdf.py:250-258 + the no-2π fourier map,
  src/utils.py:10-17) — pass enc_freqs=128, enc_sigma=16/2π for that
  spectrum (runner --ref-compat for volsdf/sdf). Non-default widths
  fall off the fused kernel envelope and run the XLA oracle."""
  enc_freqs: int = 32
  enc_sigma: float = 4.0

  @nn.compact
  def __call__(self, pts):
    mlp = SkipConnMLP(
        in_size=3, out=1 + self.latent_out,
        enc=FourierEncoder(input_dims=3, freqs=self.enc_freqs,
                           sigma=self.enc_sigma),
        num_layers=6, hidden_size=256, name="mlp")
    out = mlp(pts)
    # bias init toward a unit sphere: add ||p|| - 1 analytic term scaled in
    return out[..., 0] + self._sphere_bias(pts), out[..., 1:]


class SIREN(SDFModel):
  """sin-activation SDF."""

  @nn.compact
  def __call__(self, pts):
    mlp = SkipConnMLP(in_size=3, out=1 + self.latent_out,
                      init_kind="siren", num_layers=5, hidden_size=256,
                      name="mlp")
    out = mlp(pts)
    return out[..., 0] + self._sphere_bias(pts), out[..., 1:]


class CurlMLP(SDFModel):
  """‖∇F‖·tanh(F) signed-directional construction: guarantees |∇sdf| ≈ 1
  near the zero set without an explicit eikonal loss."""

  @nn.compact
  def __call__(self, pts):
    mlp = SkipConnMLP(
        in_size=3, out=1 + self.latent_out,
        enc=FourierEncoder(input_dims=3, freqs=32, sigma=4.0),
        num_layers=5, hidden_size=256, name="mlp")

    out = mlp(pts)
    f = out[..., 0] + jnp.linalg.norm(pts, axis=-1) - 1.0
    g = jax.grad(lambda p: (mlp(p)[..., 0]
                            + jnp.linalg.norm(p, axis=-1) - 1.0).sum())(pts)
    gn = jnp.linalg.norm(g, axis=-1)
    return jnp.tanh(f) * gn / jnp.maximum(gn, 1.0), out[..., 1:]


class Local(SDFModel):
  """Partitioned space: latent from coarse cell coords + local MLP."""
  partitions: int = 4

  @nn.compact
  def __call__(self, pts):
    cell = jnp.floor((pts + 1) * 0.5 * self.partitions)
    local = (pts + 1) * 0.5 * self.partitions - cell
    coarse = SkipConnMLP(in_size=3, out=32, num_layers=2, hidden_size=64,
                         name="coarse")(cell / self.partitions)
    fine = SkipConnMLP(in_size=3, out=1 + self.latent_out, latent_size=32,
                       enc=FourierEncoder(input_dims=3, freqs=16, sigma=2.0),
                       num_layers=4, hidden_size=128, name="fine")
    out = fine(local * 2 - 1, coarse)
    return out[..., 0] + jnp.linalg.norm(pts, axis=-1) - 1.0, out[..., 1:]


class SmoothedSpheres(SDFModel):
  """Smooth-min union of N learnable spheres plus a residual MLP."""
  n_spheres: int = 16

  @nn.compact
  def __call__(self, pts):
    centers = self.param(
        "centers", lambda k, s: jax.random.normal(k, s) * 0.3,
        (self.n_spheres, 3))
    radii = self.param("radii", nn.initializers.constant(0.2),
                       (self.n_spheres,))
    d = jnp.linalg.norm(pts[..., None, :] - centers, axis=-1) - \
        jax.nn.softplus(radii)
    base = smooth_min(jnp.moveaxis(d, -1, 0), k=32.0, axis=0)
    resid = SkipConnMLP(in_size=3, out=1 + self.latent_out, num_layers=3,
                        hidden_size=128, zero_last=True, name="resid")(pts)
    return base + 0.1 * jnp.tanh(resid[..., 0]), resid[..., 1:]


def _point_triangle_dist(pts, tris):
  """Exact unsigned distance from pts [..., 3] to triangles [K, 3, 3]."""
  a, b, c = tris[:, 0], tris[:, 1], tris[:, 2]
  p = pts[..., None, :]
  ab, ac, ap = b - a, c - a, p - a
  d1 = jnp.sum(ab * ap, -1)
  d2 = jnp.sum(ac * ap, -1)
  bp = p - b
  d3 = jnp.sum(ab * bp, -1)
  d4 = jnp.sum(ac * bp, -1)
  cp = p - c
  d5 = jnp.sum(ab * cp, -1)
  d6 = jnp.sum(ac * cp, -1)
  # interior face projection (valid when all barycentric regions positive);
  # the three edge projections cover every boundary/vertex region, so the
  # min over {face, edges} is the exact distance everywhere.
  va = d3 * d6 - d5 * d4
  vb = d5 * d2 - d1 * d6
  vc = d1 * d4 - d3 * d2
  denom = jnp.where(jnp.abs(va + vb + vc) < 1e-12, 1e-12, va + vb + vc)
  v = vb / denom
  w = vc / denom
  inside = (va >= 0) & (vb >= 0) & (vc >= 0)
  face = a + v[..., None] * ab + w[..., None] * ac

  def seg(p0, e):
    t = jnp.clip(jnp.sum((p - p0) * e, -1)
                 / jnp.maximum(jnp.sum(e * e, -1), 1e-12), 0, 1)
    return p0 + t[..., None] * e

  edges = jnp.stack([seg(a, ab), seg(a, ac), seg(b, c - b)], -2)
  edge_d = jnp.min(jnp.linalg.norm(p[..., None, :] - edges, axis=-1), -1)
  face_d = jnp.linalg.norm(p - face, axis=-1)
  return jnp.where(inside, jnp.minimum(face_d, edge_d), edge_d)


class Triangles(SDFModel):
  """Smooth-min union of learnable triangles (unsigned distance surface)."""
  n_triangles: int = 16

  @nn.compact
  def __call__(self, pts):
    tris = self.param("tris", lambda k, s: jax.random.normal(k, s) * 0.4,
                      (self.n_triangles, 3, 3))
    d = _point_triangle_dist(pts, tris) - 0.02   # slight inflation
    sd = smooth_min(jnp.moveaxis(d, -1, 0), k=32.0, axis=0)
    latent = jnp.zeros(pts.shape[:-1] + (self.latent_out,), pts.dtype)
    return sd, latent


class UnitSphere(SDFModel):
  """Intersection of an inner SDF with a bounding sphere."""
  inner_kind: str = "mlp"
  radius: float = 1.5

  @nn.compact
  def __call__(self, pts):
    inner = SDF_KINDS[self.inner_kind](latent_out=self.latent_out,
                                       sphere_init=self.sphere_init,
                                       name="inner")
    sd, latent = inner(pts)
    bound = jnp.linalg.norm(pts, axis=-1) - self.radius
    return jnp.maximum(sd, bound), latent


SDF_KINDS = {
    "mlp": MLP,
    "siren": SIREN,
    "curl-mlp": CurlMLP,
    "local": Local,
    "spheres": SmoothedSpheres,
    "triangles": Triangles,
}


def load_sdf_shape(kind: str, latent_out: int = 32, bounded: bool = False,
                   bound_radius: float = 1.5, **kwargs):
  if bounded:
    return UnitSphere(inner_kind=kind, radius=bound_radius,
                      latent_out=latent_out,
                      sphere_init=kwargs.get("sphere_init", True))
  ctor = SDF_KINDS.get(kind)
  if ctor is None:
    raise NotImplementedError(f"unknown sdf kind {kind}")
  return ctor(latent_out=latent_out, **kwargs)


class SDF(nn.Module):
  """SDF surface renderer (`--model sdf`): root-find the intersection,
  shade with the reflectance model, and emit a differentiable throughput
  channel for silhouette supervision during training."""
  sdf_kind: str = "mlp"
  refl_kind: str = "view"
  isect_kind: str = "bisect"
  latent_out: int = 32
  t_near: float = 0.0
  t_far: float = 6.0
  march_steps: int = 128
  sigmoid_kind: str = "thin"
  bounded: bool = True
  bound_radius: float = 1.5
  alpha: float = 500.0   # throughput sharpness
  refl_kwargs: Any = None
  sdf_kwargs: Any = None
  # eval tiling bound (driver.render_view): the root-finding march at
  # 65536-ray chunks crashes the v5e remote compile helper; the train
  # batch shape is proven
  EVAL_CHUNK_CAP = 4096

  def setup(self):
    self.shape = load_sdf_shape(self.sdf_kind, latent_out=self.latent_out,
                                bounded=self.bounded,
                                bound_radius=self.bound_radius,
                                **(self.sdf_kwargs or {}))
    self.refl = load_refl(self.refl_kind, latent_size=self.latent_out,
                          act=self.sigmoid_kind,
                          **(self.refl_kwargs or {}))

  def value(self, pts):
    return self.shape(pts)[0]

  def normals(self, pts):
    return jax.grad(lambda p: self.value(p).sum())(pts)

  def intersect_mask(self, pts, direction, near: float = 0.05,
                     far: float = 4.0, steps: int = 32):
    """Visibility test used by occlusion models: does a ray from pts
    along direction hit the surface?"""
    d = direction / jnp.maximum(
        jnp.linalg.norm(direction, axis=-1, keepdims=True), 1e-8)
    tput, _, _, _, hits = march.throughput_with_sign_change(
        self.value, pts, d, near, far, batch_size=steps)
    del tput
    return hits

  def __call__(self, rays, times=None, latents=None, train: bool = False):
    r_o, r_d = rays[..., :3], rays[..., 3:6]
    if self.is_initializing():
      # materialize the shape's params OUTSIDE lax control flow: marchers
      # that first evaluate the SDF inside fori_loop would otherwise
      # create params under the loop trace (leaked-tracer error at init)
      self.shape(r_o)
    isect = march.INTERSECTION_KINDS[self.isect_kind]
    pts, hits, best_pos, tput = isect(
        self.value, r_o, r_d, iters=self.march_steps,
        near=self.t_near, far=self.t_far)
    if tput is None:
      # sphere marching returns (pts, hits, dist, None) — no min-SDF track
      # and no best position; the differentiable miss signal is the SDF at
      # the march end points themselves.
      tput = self.value(pts)[..., None]
    elif tput.ndim == r_o.ndim - 1:
      tput = tput[..., None]

    _, latent = self.shape(pts)
    n = self.normals(pts)
    view = r_d / jnp.maximum(jnp.linalg.norm(r_d, axis=-1, keepdims=True),
                             1e-8)
    rgb = self.refl(pts, view=view, normal=n, latent=latent)
    rgb = jnp.where(hits[..., None], rgb, 0.0)

    out = dict(rgb=rgb, hits=hits, pts=pts, normals=n)
    # differentiable silhouette: sigmoid(-alpha * min_sdf) ~ hit
    # probability. sil_logit is the PRE-sigmoid value: at alpha = 500
    # the sigmoid is fully saturated for |min sdf| > ~0.01, so an l2
    # loss on the squashed value has zero gradient almost everywhere
    # and geometry never trains (the round-5 sweep's sdf_surface row
    # pinned at loss 0.23 for 1500 steps) — the driver supervises the
    # logit with sigmoid-BCE instead, whose gradient is linear in the
    # logit. (The reference's own `--model sdf` path dies upstream:
    # runner.py:598 calls sdf.masked_loss, which src/sdf.py never
    # defines.)
    out["sil_logit"] = -self.alpha * tput
    out["throughput"] = jax.nn.sigmoid(out["sil_logit"])
    out["weights"] = out["throughput"]
    return out
