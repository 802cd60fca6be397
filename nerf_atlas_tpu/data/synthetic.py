"""Procedural synthetic scenes with analytic ground truth.

There is no network egress in the build/test environment, so the framework
ships a procedural dataset family: colored soft spheres volume-rendered
analytically with the framework's own integrator. This gives golden
train/test images for every model family (static, dynamic via moving
spheres, masks for SDF training, point lights for relighting) — the role
the NeRF-synthetic lego scene plays for the reference.
"""
from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import cameras as cam_lib
from ..ops import integrate, rays as rays_ops


def look_at(eye, target, up=(0.0, 1.0, 0.0)):
  """NeRF-convention camera-to-world (camera looks along -z)."""
  eye = jnp.asarray(eye, jnp.float32)
  target = jnp.asarray(target, jnp.float32)
  up = jnp.asarray(up, jnp.float32)
  fwd = eye - target  # camera -z points at target
  fwd = fwd / jnp.linalg.norm(fwd)
  right = jnp.cross(up, fwd)
  right = right / jnp.maximum(jnp.linalg.norm(right), 1e-8)
  true_up = jnp.cross(fwd, right)
  c2w = jnp.eye(4)
  c2w = c2w.at[:3, 0].set(right).at[:3, 1].set(true_up).at[:3, 2].set(fwd)
  c2w = c2w.at[:3, 3].set(eye)
  return c2w


def hemisphere_poses(n: int, radius: float = 3.0, seed: int = 0,
                     front_facing: bool = False):
  """n camera-to-world poses looking at the origin.

  Default: spread over the upper hemisphere (the NeRF-synthetic orbit).
  front_facing: clustered in a narrow cone on the -z side looking +z —
  the LLFF/forward-facing capture geometry that plane-sweep
  representations (MPI) can actually express; cameras at z < 0 make
  ray·(0,0,1) > 0, so ascending plane offsets composite front-to-back.
  """
  rng = np.random.default_rng(seed)
  poses = []
  for i in range(n):
    if front_facing:
      azim = -math.pi / 2 + (rng.uniform(-0.22, 0.22) if n > 1 else 0.0)
      elev = rng.uniform(0.25, 0.55)
    else:
      azim = 2 * math.pi * (i / n) + rng.uniform(0, 0.1)
      elev = rng.uniform(0.15, 1.2)
    eye = (radius * math.cos(elev) * math.cos(azim),
           radius * math.sin(elev),
           radius * math.cos(elev) * math.sin(azim))
    poses.append(look_at(eye, (0.0, 0.0, 0.0)))
  return jnp.stack(poses)


# scene definition: K spheres (center [3], radius, rgb [3], sharpness)
DEFAULT_SPHERES = dict(
    centers=jnp.asarray([[0.0, 0.0, 0.0], [0.45, 0.3, 0.2],
                         [-0.4, -0.25, 0.3]]),
    radii=jnp.asarray([0.42, 0.22, 0.18]),
    colors=jnp.asarray([[0.9, 0.25, 0.2], [0.2, 0.8, 0.3], [0.25, 0.3, 0.9]]),
    sigma=40.0,
)


def scene_density_rgb(pts, t: Optional[jnp.ndarray] = None,
                      spheres=None):
  """Analytic density + rgb field at pts [..., 3].

  With `t` (scalar or broadcastable time in [0,1]) the first sphere
  orbits — the dynamic variant. Returns (density [...], rgb [..., 3]).
  """
  sp = spheres or DEFAULT_SPHERES
  centers, radii = sp["centers"], sp["radii"]
  if t is not None:
    ang = 2 * math.pi * t
    offset = 0.35 * jnp.stack(
        [jnp.cos(ang), jnp.zeros_like(ang), jnp.sin(ang)], axis=-1)
    c0 = centers[0] + offset  # [..., 3]
    d0 = jnp.linalg.norm(pts - c0, axis=-1) - radii[0]
    rest = jnp.linalg.norm(pts[..., None, :] - centers[1:], axis=-1) - radii[1:]
    d = jnp.concatenate([d0[..., None], rest], axis=-1)
  else:
    d = jnp.linalg.norm(pts[..., None, :] - centers, axis=-1) - radii
  inside = jax.nn.sigmoid(-d * 60.0)                       # soft indicator
  density = sp["sigma"] * jnp.max(inside, axis=-1)
  w = jax.nn.softmax(-d * 30.0, axis=-1)
  rgb = jnp.einsum("...k,kc->...c", w, sp["colors"])
  return density, rgb


LIGHT_INTENSITY = 6.0


def _sphere_shadow(pts, light_pos, spheres=None, eps: float = 2e-2):
  """Analytic hard-shadow visibility: is the segment from pts to the
  light blocked by any scene sphere? (closed-form ray-sphere test).
  pts [..., 3], light_pos [..., 3] -> visibility [...] in {0, 1}."""
  sp = spheres or DEFAULT_SPHERES
  to_l = light_pos - pts
  dist = jnp.linalg.norm(to_l, axis=-1, keepdims=True)
  d = to_l / jnp.maximum(dist, 1e-8)
  o = pts[..., None, :] - sp["centers"]                 # [..., K, 3]
  b = jnp.sum(o * d[..., None, :], axis=-1)             # [..., K]
  c = jnp.sum(o * o, axis=-1) - sp["radii"] ** 2
  disc = b * b - c
  sqrt_disc = jnp.sqrt(jnp.maximum(disc, 0.0))
  t0 = -b - sqrt_disc
  t1 = -b + sqrt_disc
  # blocked if any sphere is hit strictly between the point and the light
  hit = (disc > 0) & (t1 > eps) & (t0 < dist - eps)
  return 1.0 - jnp.any(hit, axis=-1).astype(pts.dtype)


def scene_lit_rgb(pts, light_pos, spheres=None):
  """Relightable analytic shading at pts: Lambert albedo × (n·l) ×
  inverse-square falloff × hard shadows — ground truth for the
  nerv_point-style relighting pipeline (VolSDF + occ + direct).
  pts [..., 3], light_pos [..., 3] (broadcastable) -> rgb [..., 3]."""
  sp = spheres or DEFAULT_SPHERES
  diff = pts[..., None, :] - sp["centers"]
  d = jnp.linalg.norm(diff, axis=-1) - sp["radii"]
  w = jax.nn.softmax(-d * 30.0, axis=-1)
  albedo = jnp.einsum("...k,kc->...c", w, sp["colors"])
  # normal of the nearest sphere
  near = jnp.argmin(d, axis=-1)
  n = jnp.take_along_axis(diff, near[..., None, None].repeat(3, -1),
                          axis=-2)[..., 0, :]
  n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-8)
  to_l = light_pos - pts
  dist2 = jnp.maximum(jnp.sum(to_l * to_l, axis=-1, keepdims=True), 1e-8)
  l = to_l / jnp.sqrt(dist2)
  lambert = jax.nn.relu(jnp.sum(n * l, axis=-1, keepdims=True))
  vis = _sphere_shadow(pts, light_pos, spheres)[..., None]
  return albedo * lambert * vis * (LIGHT_INTENSITY / dist2)


def light_ring(n: int, radius: float = 2.5, height: float = 1.6,
               phase: float = 0.7):
  """Per-view point-light positions on a ring: [N, 1, 3]."""
  ang = 2 * math.pi * np.arange(n) / n + phase
  pos = np.stack([radius * np.cos(ang),
                  np.full(n, height),
                  radius * np.sin(ang)], axis=-1).astype(np.float32)
  return pos[:, None, :]


def scene_sdf(pts, spheres=None):
  """Exact SDF of the sphere union (for SDF-model golden tests)."""
  sp = spheres or DEFAULT_SPHERES
  d = jnp.linalg.norm(pts[..., None, :] - sp["centers"], axis=-1) - sp["radii"]
  return jnp.min(d, axis=-1)


def render_gt(camera, size: int, *, t_near=2.0, t_far=4.5, steps=96,
              times=None, white_bg: bool = False, chunk: int = 16384,
              light_pos=None):
  """Ground-truth render of the procedural scene for every camera view.

  With `light_pos` [N, 1, 3] the scene is shaded with the analytic
  relightable model (Lambert + falloff + hard shadows) instead of the
  emissive colors. Returns imgs [N, size, size, 4] (rgb + alpha).
  """
  n = len(camera)
  xs = jnp.arange(size, dtype=jnp.float32) + 0.5
  gy, gx = jnp.meshgrid(xs, xs, indexing="ij")
  positions = jnp.stack([gx, gy], axis=-1)                 # [S, S, 2]
  all_rays = camera.sample_positions(positions, size)      # [N, S, S, 6]
  flat = all_rays.reshape(-1, 6)
  if times is not None:
    tper = jnp.repeat(jnp.asarray(times), size * size)
  if light_pos is not None:
    lper = jnp.repeat(jnp.asarray(light_pos)[:, 0], size * size, axis=0)

  def render_chunk(rs, tt, lp):
    pts, ts, _, r_d = rays_ops.compute_pts_ts(rs, t_near, t_far, steps)
    density, rgb = scene_density_rgb(
        pts, None if times is None else tt[:, None])
    if lp is not None:
      rgb = scene_lit_rgb(pts, lp[:, None, :])
    _, weights = integrate.alpha_from_density(density, ts, r_d,
                                              softplus=False)
    img = integrate.volumetric_integrate(weights, rgb)
    acc = jnp.sum(weights, axis=-1, keepdims=True)
    if white_bg:
      img = img + (1 - acc)
    return jnp.concatenate([img, acc], axis=-1)

  render_jit = jax.jit(render_chunk)
  outs = []
  for i in range(0, flat.shape[0], chunk):
    rs = flat[i:i + chunk]
    tt = tper[i:i + chunk] if times is not None else None
    lp = lper[i:i + chunk] if light_pos is not None else None
    outs.append(render_jit(rs, tt, lp))
  out = jnp.concatenate(outs, axis=0)
  return np.asarray(out.reshape(n, size, size, 4))


def dataset(num_views: int = 8, size: int = 64, *, dynamic: bool = False,
            white_bg: bool = False, lit: bool = False, seed: int = 0,
            front_facing: bool = False):
  """(labels, camera, lights|None) in the loader contract.

  Static: labels = imgs [N,S,S,4]. Dynamic: labels = (imgs, times [N]).
  Lit: per-view point lights on a ring; lights dict in the nerv_point
  loader contract ({"positions" [N,1,3], "intensity"}).
  front_facing: LLFF-style clustered poses (see hemisphere_poses).
  """
  poses = hemisphere_poses(num_views, seed=seed, front_facing=front_facing)
  camera = cam_lib.NeRFCamera.from_json_transforms(
      poses, camera_angle_x=0.6911, width=size)
  times = np.linspace(0.0, 1.0, num_views) if dynamic else None
  light_pos = light_ring(num_views, phase=0.7 + seed) if lit else None
  imgs = render_gt(camera, size, times=times, white_bg=white_bg,
                   light_pos=light_pos)
  lights = (None if light_pos is None
            else {"positions": light_pos, "intensity": LIGHT_INTENSITY})
  if dynamic:
    return (imgs, np.asarray(times, np.float32)), camera, lights
  return imgs, camera, lights
