"""Reflectance (BRDF) zoo.

Capability parity: /root/reference/src/refl.py:17-751. Uniform call
contract: `refl.apply(params, x, view=None, normal=None, light=None,
latent=None) -> rgb [..., out]` over arbitrary batch shapes. All angular
inputs are encoded as (elev, azim) pairs like the reference; the final
activation is a configurable sigmoid kind.

Reference bugs intentionally fixed rather than reproduced (SURVEY.md §7):
- Basic kept a dead light-encoder clear (src/refl.py:184) — ours shades
  with the light direction properly;
- CookTorrance's forward referenced undefined `h`/`n` and shadowed its
  Fresnel term (src/refl.py:445-455) — ours is a working microfacet model
  with learned ior/roughness/specular fraction;
- RusinHelmholtz was unfinished (exit() at :591) — ours symmetrizes the
  Rusin MLP over (in,out) swap, the intended Helmholtz reciprocity.
"""
from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax import struct

from ..nn import FourierEncoder, HashEncoder, SkipConnMLP
from ..ops import sh as sh_ops
from ..ops.math import (
    coordinate_system, dir_to_elev_azim, load_sigmoid, normalize,
)


def _elaz(v):
  return dir_to_elev_azim(v)


class SurfaceSpace(nn.Module):
  """Learned 3D->2D surface parameterization (`--space-kind surface`)."""
  dtype: Any = jnp.float32

  def size(self) -> int:
    return 2

  @nn.compact
  def __call__(self, x):
    return SkipConnMLP(in_size=3, out=2, num_layers=3, hidden_size=128,
                       dtype=self.dtype, name="param")(x)


class IdentitySpace(nn.Module):
  def size(self) -> int:
    return 3

  def __call__(self, x):
    return x


class NoSpace(nn.Module):
  def size(self) -> int:
    return 0

  def __call__(self, x):
    return x[..., :0]


SPACE_KINDS = {"identity": IdentitySpace, "surface": SurfaceSpace,
               "none": NoSpace}


class Reflectance(nn.Module):
  """Base: holds activation + latent bookkeeping."""
  latent_size: int = 0
  out_features: int = 3
  act: str = "thin"

  def _finish(self, v):
    return load_sigmoid(self.act)(v)

  @property
  def can_use_normal(self) -> bool:
    return False

  @property
  def can_use_view(self) -> bool:
    return False


class Positional(Reflectance):
  """RGB from position only (hash-encoded)."""
  space: str = "identity"

  @nn.compact
  def __call__(self, x, view=None, normal=None, light=None, latent=None):
    xs = SPACE_KINDS[self.space]()(x)
    mlp = SkipConnMLP(
        in_size=3, out=self.out_features, latent_size=self.latent_size,
        enc=HashEncoder(), num_layers=3, hidden_size=128, name="mlp")
    return self._finish(mlp(xs, latent))

  def to_voxel(self):
    """Voxel form: raw per-voxel RGB (no MLP); channel count for the grid."""
    return self.out_features


class View(Reflectance):
  """Position + view direction (the default refl).

  The TPU-tuned default is a 128-wide siren (the fused kernel's refl
  stream); hidden_size/num_layers/siren_w0 are exposed so reference
  checkpoints import at their native dims (ref src/refl.py:190-207:
  4×256, plain torch.sin = w0 1.0)."""
  space: str = "identity"
  hidden_size: int = 128
  num_layers: int = 5
  siren_w0: float = 30.0

  @property
  def can_use_view(self):
    return True

  @nn.compact
  def __call__(self, x, view=None, normal=None, light=None, latent=None):
    assert view is not None, "View refl requires view directions"
    xs = SPACE_KINDS[self.space]()(x)
    elaz = _elaz(view)
    inp = jnp.concatenate([xs, elaz], axis=-1)
    mlp = SkipConnMLP(
        in_size=inp.shape[-1], out=self.out_features,
        latent_size=self.latent_size, init_kind="siren",
        num_layers=self.num_layers, hidden_size=self.hidden_size,
        siren_w0=self.siren_w0, name="mlp")
    return self._finish(mlp(inp, latent))


class ViewLight(Reflectance):
  """Position + view + light directions."""
  space: str = "identity"

  @property
  def can_use_view(self):
    return True

  @nn.compact
  def __call__(self, x, view=None, normal=None, light=None, latent=None):
    assert view is not None and light is not None
    xs = SPACE_KINDS[self.space]()(x)
    inp = jnp.concatenate([xs, _elaz(view), _elaz(light)], axis=-1)
    mlp = SkipConnMLP(
        in_size=inp.shape[-1], out=self.out_features,
        latent_size=self.latent_size, num_layers=5, hidden_size=128,
        name="mlp")
    return self._finish(mlp(inp, latent))


class PosLinearView(Reflectance):
  """View-independent RGB modulated by a view-dependent scalar in
  [0.5, 1] — cheap specular sheen; voxel form = RGB + SH-linear scale."""
  space: str = "identity"

  @property
  def can_use_view(self):
    return True

  @nn.compact
  def __call__(self, x, view=None, normal=None, light=None, latent=None):
    xs = SPACE_KINDS[self.space]()(x)
    base = SkipConnMLP(in_size=3, out=self.out_features,
                       latent_size=self.latent_size, enc=HashEncoder(),
                       num_layers=3, hidden_size=128, name="pos_mlp")
    gate = SkipConnMLP(in_size=5, out=1, latent_size=self.latent_size,
                       num_layers=2, hidden_size=64, name="view_gate")
    rgb = self._finish(base(xs, latent))
    g_in = jnp.concatenate([xs, _elaz(view)], axis=-1)
    g = jax.nn.sigmoid(gate(g_in, latent)) * 0.5 + 0.5
    return rgb * g

  def to_voxel(self):
    return self.out_features + 9  # rgb + SH(2) scale coeffs


class Basic(Reflectance):
  """Space + view + normal (+ light) MLP shading.

  normal_kind: how normals enter the MLP (--normal-kind, reference
  runner.py:161-163): "raw" = normalized 3-vector, "elaz" = 2-angle
  parameterization, None/"none" = omit normals entirely."""
  space: str = "identity"
  normal_kind: Optional[str] = "raw"

  @property
  def can_use_normal(self):
    return self.normal_kind not in (None, "none")

  @property
  def can_use_view(self):
    return True

  @nn.compact
  def __call__(self, x, view=None, normal=None, light=None, latent=None):
    xs = SPACE_KINDS[self.space]()(x)
    parts = [xs, _elaz(view)]
    if normal is not None and self.normal_kind == "elaz":
      parts.append(_elaz(normalize(normal)))
    elif normal is not None and self.normal_kind == "raw":
      parts.append(normalize(normal))
    if light is not None:
      parts.append(_elaz(light))
    inp = jnp.concatenate(parts, axis=-1)
    mlp = SkipConnMLP(in_size=inp.shape[-1], out=self.out_features,
                      latent_size=self.latent_size, num_layers=4,
                      hidden_size=128, name="mlp")
    return self._finish(mlp(inp, latent))


class Diffuse(Reflectance):
  """Lambertian: learned albedo × max(n·l, 0) (optionally |n·l|)."""
  space: str = "identity"
  bidirectional: bool = False

  @property
  def can_use_normal(self):
    return True

  @nn.compact
  def __call__(self, x, view=None, normal=None, light=None, latent=None):
    assert normal is not None and light is not None
    xs = SPACE_KINDS[self.space]()(x)
    albedo_mlp = SkipConnMLP(in_size=xs.shape[-1], out=self.out_features,
                             latent_size=self.latent_size, num_layers=3,
                             hidden_size=128, name="albedo")
    albedo = self._finish(albedo_mlp(xs, latent))
    nl = jnp.sum(normalize(normal) * normalize(light), axis=-1, keepdims=True)
    atten = jnp.abs(nl) if self.bidirectional else jax.nn.relu(nl)
    return albedo * atten


class CookTorrance(Reflectance):
  """Microfacet BRDF with learned per-point (albedo, roughness, ior,
  specular fraction). Working version of the reference's broken one."""
  space: str = "identity"

  @property
  def can_use_normal(self):
    return True

  @property
  def can_use_view(self):
    return True

  @nn.compact
  def __call__(self, x, view=None, normal=None, light=None, latent=None):
    assert normal is not None and light is not None and view is not None
    xs = SPACE_KINDS[self.space]()(x)
    mlp = SkipConnMLP(in_size=xs.shape[-1], out=self.out_features + 3,
                      latent_size=self.latent_size, num_layers=4,
                      hidden_size=128, name="props")
    props = mlp(xs, latent)
    albedo = self._finish(props[..., :self.out_features])
    rough = jax.nn.sigmoid(props[..., -3:-2]) * 0.9 + 0.05
    ior = 1.0 + jax.nn.softplus(props[..., -2:-1])
    spec_frac = jax.nn.sigmoid(props[..., -1:])

    n = normalize(normal)
    l = normalize(light)
    v = normalize(-view)
    h = normalize(l + v)
    nl = jax.nn.relu(jnp.sum(n * l, axis=-1, keepdims=True))
    nv = jax.nn.relu(jnp.sum(n * v, axis=-1, keepdims=True)) + 1e-6
    nh = jax.nn.relu(jnp.sum(n * h, axis=-1, keepdims=True))
    vh = jax.nn.relu(jnp.sum(v * h, axis=-1, keepdims=True))
    a2 = jnp.square(rough * rough)
    D = a2 / (math.pi * jnp.square(jnp.square(nh) * (a2 - 1) + 1) + 1e-8)
    f0 = jnp.square((ior - 1) / (ior + 1))
    F = f0 + (1 - f0) * jnp.power(jnp.clip(1 - vh, 0.0, 1.0), 5.0)
    k = jnp.square(rough + 1) / 8
    G = (nl / (nl * (1 - k) + k + 1e-8)) * (nv / (nv * (1 - k) + k + 1e-8))
    spec = D * F * G / (4 * nv + 1e-8)
    return (spec_frac * spec + (1 - spec_frac) * albedo / math.pi) * nl


def rusin_params(view, light, normal):
  """Rusinkiewicz halfway/difference angles (θh, θd, φd) from world-space
  view/light/normal (reference src/refl.py:651-692)."""
  n = normalize(normal)
  frame = coordinate_system(n)                       # [..., 3, 3] cols s,t,n
  wo = jnp.einsum("...ij,...i->...j", frame, normalize(-view))
  wi = jnp.einsum("...ij,...i->...j", frame, normalize(light))
  h = normalize(wo + wi)
  theta_h = jnp.arccos(jnp.clip(h[..., 2:3], -1 + 1e-6, 1 - 1e-6))
  phi_h = jnp.arctan2(h[..., 1:2], h[..., 0:1])
  # rotate wi into the halfway frame to get the difference vector
  z = jnp.zeros_like(theta_h)
  cos_ph, sin_ph = jnp.cos(-phi_h), jnp.sin(-phi_h)
  wi_r1 = jnp.concatenate([
      cos_ph * wi[..., 0:1] - sin_ph * wi[..., 1:2],
      sin_ph * wi[..., 0:1] + cos_ph * wi[..., 1:2],
      wi[..., 2:3]], axis=-1)
  cos_th, sin_th = jnp.cos(-theta_h), jnp.sin(-theta_h)
  d = jnp.concatenate([
      cos_th * wi_r1[..., 0:1] + sin_th * wi_r1[..., 2:3],
      wi_r1[..., 1:2],
      -sin_th * wi_r1[..., 0:1] + cos_th * wi_r1[..., 2:3]], axis=-1)
  theta_d = jnp.arccos(jnp.clip(d[..., 2:3], -1 + 1e-6, 1 - 1e-6))
  phi_d = jnp.mod(jnp.arctan2(d[..., 1:2], d[..., 0:1]), math.pi)
  del z
  return jnp.concatenate([theta_h, theta_d, phi_d], axis=-1)


class Rusin(Reflectance):
  """Learned BRDF over Rusinkiewicz parameters."""
  space: str = "identity"
  helmholtz: bool = False

  @property
  def can_use_normal(self):
    return True

  @property
  def can_use_view(self):
    return True

  @nn.compact
  def __call__(self, x, view=None, normal=None, light=None, latent=None):
    assert view is not None and normal is not None and light is not None
    xs = SPACE_KINDS[self.space]()(x)
    mlp = SkipConnMLP(
        in_size=3 + xs.shape[-1], out=self.out_features,
        latent_size=self.latent_size,
        enc=None, num_layers=5, hidden_size=128, name="brdf")
    p = rusin_params(view, light, normal)
    raw = mlp(jnp.concatenate([p, xs], axis=-1), latent)
    if self.helmholtz:
      # reciprocity: average with swapped in/out directions
      p2 = rusin_params(-light, -view, normal)
      raw = 0.5 * (raw + mlp(jnp.concatenate([p2, xs], axis=-1), latent))
    nl = jax.nn.relu(jnp.sum(normalize(normal) * normalize(light),
                             axis=-1, keepdims=True))
    return self._finish(raw) * nl


class SphericalHarmonic(Reflectance):
  """MLP(position) -> SH coefficients, evaluated at the view direction."""
  space: str = "identity"
  degree: int = 4

  @property
  def can_use_view(self):
    return True

  @nn.compact
  def __call__(self, x, view=None, normal=None, light=None, latent=None):
    assert view is not None
    xs = SPACE_KINDS[self.space]()(x)
    n_coeff = sh_ops.sh_size(self.degree)
    mlp = SkipConnMLP(in_size=xs.shape[-1],
                      out=self.out_features * n_coeff,
                      latent_size=self.latent_size, num_layers=4,
                      hidden_size=128, name="coeffs")
    coeffs = mlp(xs, latent).reshape(x.shape[:-1]
                                     + (self.out_features, n_coeff))
    vals = sh_ops.eval_sh(self.degree, coeffs, normalize(view))
    return self._finish(vals)


class FourierBasis(Reflectance):
  """Fourier-basis BSDF: MLP -> Fourier coefficients over cosΔφ, evaluated
  with a Chebyshev recurrence (reference src/refl.py:326-368)."""
  space: str = "identity"
  order: int = 16

  @property
  def can_use_normal(self):
    return True

  @property
  def can_use_view(self):
    return True

  @nn.compact
  def __call__(self, x, view=None, normal=None, light=None, latent=None):
    assert view is not None and normal is not None and light is not None
    xs = SPACE_KINDS[self.space]()(x)
    p = rusin_params(view, light, normal)          # (θh, θd, φd)
    mlp = SkipConnMLP(in_size=2 + xs.shape[-1],
                      out=self.out_features * self.order,
                      latent_size=self.latent_size, num_layers=4,
                      hidden_size=128, name="coeffs")
    ak = mlp(jnp.concatenate([p[..., :2], xs], axis=-1), latent)
    ak = ak.reshape(x.shape[:-1] + (self.out_features, self.order))
    # Chebyshev recurrence: cos(k φd) from cos φd
    c1 = jnp.cos(p[..., 2:3])                       # cos φd
    cos_k = [jnp.ones_like(c1), c1]
    for _ in range(2, self.order):
      cos_k.append(2 * c1 * cos_k[-1] - cos_k[-2])
    basis = jnp.concatenate(cos_k[:self.order], axis=-1)   # [..., order]
    val = jnp.einsum("...co,...o->...c", ak, basis)
    nl = jax.nn.relu(jnp.sum(normalize(normal) * normalize(light),
                             axis=-1, keepdims=True))
    return self._finish(val) * nl


class WeightedChoice(Reflectance):
  """Softmax-gated mixture of sub-reflectance models."""
  subrefl_kinds: Sequence[str] = ("diffuse", "rusin")
  space: str = "identity"

  @property
  def can_use_normal(self):
    return True

  @property
  def can_use_view(self):
    return True

  @nn.compact
  def __call__(self, x, view=None, normal=None, light=None, latent=None):
    xs = SPACE_KINDS[self.space]()(x)
    gate = SkipConnMLP(in_size=xs.shape[-1], out=len(self.subrefl_kinds),
                       latent_size=self.latent_size, num_layers=2,
                       hidden_size=64, name="gate")
    w = jax.nn.softmax(gate(xs, latent), axis=-1)
    outs = []
    for i, kind in enumerate(self.subrefl_kinds):
      sub = _construct(kind, latent_size=self.latent_size,
                       out_features=self.out_features, act=self.act,
                       name=f"sub_{i}")
      outs.append(sub(x, view=view, normal=normal, light=light,
                      latent=latent))
    stacked = jnp.stack(outs, axis=-1)
    return jnp.einsum("...ck,...k->...c", stacked, w)


class AlternatingOptimization(Reflectance):
  """Learned blend of an analytic BRDF (diffuse) and a learned one
  (rusin); `frozen` selects which side is stop-gradiented this phase —
  the functional analog of the reference's toggle() freeze."""
  space: str = "identity"

  @property
  def can_use_normal(self):
    return True

  @property
  def can_use_view(self):
    return True

  @nn.compact
  def __call__(self, x, view=None, normal=None, light=None, latent=None,
               frozen: Optional[str] = None):
    analytic = Diffuse(latent_size=self.latent_size,
                       out_features=self.out_features, act=self.act,
                       name="analytic")(x, view=view, normal=normal,
                                        light=light, latent=latent)
    learned = Rusin(latent_size=self.latent_size,
                    out_features=self.out_features, act=self.act,
                    name="learned")(x, view=view, normal=normal,
                                    light=light, latent=latent)
    if frozen == "analytic":
      analytic = jax.lax.stop_gradient(analytic)
    elif frozen == "learned":
      learned = jax.lax.stop_gradient(learned)
    gate = SkipConnMLP(in_size=3, out=1, num_layers=2, hidden_size=32,
                       name="blend")
    t = jax.nn.sigmoid(gate(x))
    return t * learned + (1 - t) * analytic


@struct.dataclass
class LightAndRefl:
  """Pairs a reflectance module with a light module (pytree of configs,
  used by the model factory when --light-kind is set)."""
  refl: Any = struct.field(pytree_node=False)
  light: Any = struct.field(pytree_node=False)


REFL_KINDS = {
    "pos": Positional,
    "view": View,
    "view-light": ViewLight,
    "pos-linear-view": PosLinearView,
    "basic": Basic,
    "diffuse": Diffuse,
    "cook-torrance": CookTorrance,
    "rusin": Rusin,
    "rusin-helmholtz": lambda **kw: Rusin(helmholtz=True, **kw),
    "sph-har": SphericalHarmonic,
    "fourier": FourierBasis,
    "weighted": WeightedChoice,
    "alternating": AlternatingOptimization,
}


def _construct(kind: str, **kwargs):
  ctor = REFL_KINDS.get(kind)
  if ctor is None:
    raise NotImplementedError(f"unknown refl kind {kind}")
  return ctor(**kwargs)


def load_refl(kind: str = "view", latent_size: int = 0,
              out_features: int = 3, act: str = "thin", **kwargs):
  return _construct(kind, latent_size=latent_size,
                    out_features=out_features, act=act, **kwargs)
