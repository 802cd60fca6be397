"""Cameras as jittable pytree dataclasses.

Capability parity: /root/reference/src/cameras.py (NeRFCamera :19-91,
OrthogonalCamera :93-125, StaticCamera :130-157, DTUCamera :159-223).

Design differences from the reference (which makes cameras nn.Modules):
cameras here are `flax.struct` pytrees — indexable, batchable, jittable,
and optimizable (pass the camera through the optimizer pytree to train
extrinsics, the analog of `--train-parts camera`). Ray generation takes
*flat pixel index arrays* (view_idx, x, y) so the driver can sample
uniform random rays across all views — the TPU-friendly batch shape —
while `sample_positions` keeps the reference's grid semantics for tiled
eval rendering.
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct


def _rays_from_dirs(r_o, r_d):
  return jnp.concatenate([r_o, r_d], axis=-1)


@struct.dataclass
class NeRFCamera:
  """Pinhole camera with per-view camera-to-world transforms.

  cam_to_world: [N, 4, 4] (row-convention: world = R @ cam + t)
  focal: [] or [N] focal length in pixels (for the training image size).
  """
  cam_to_world: jnp.ndarray
  focal: jnp.ndarray

  def __len__(self):
    return self.cam_to_world.shape[0]

  def __getitem__(self, idxs):
    focal = self.focal if self.focal.ndim == 0 else self.focal[idxs]
    return NeRFCamera(cam_to_world=self.cam_to_world[idxs], focal=focal)

  @classmethod
  def identity(cls, n: int, focal: float = 1.0, dtype=jnp.float32):
    c2w = jnp.broadcast_to(jnp.eye(4, dtype=dtype), (n, 4, 4))
    return cls(cam_to_world=c2w, focal=jnp.asarray(focal, dtype))

  @classmethod
  def from_json_transforms(cls, frames_c2w, camera_angle_x: float, width: int):
    """Constructor for the NeRF-synthetic JSON convention:
    focal = 0.5 * W / tan(0.5 * camera_angle_x)."""
    focal = 0.5 * width / math.tan(0.5 * camera_angle_x)
    return cls(cam_to_world=jnp.asarray(frames_c2w),
               focal=jnp.asarray(focal, jnp.float32))

  def _pixel_dirs(self, xy, size: int):
    """Camera-space directions for pixel coords xy [..., 2] (x right,
    y down, image size `size`): the NeRF-synthetic convention
    (x-W/2)/f, -(y-H/2)/f, -1."""
    f = self.focal
    u = (xy[..., 0] - size * 0.5) / f
    v = -(xy[..., 1] - size * 0.5) / f
    return jnp.stack([u, v, -jnp.ones_like(u)], axis=-1)

  def rays_at(self, view_idx, xy, size: int,
              jitter: float = 0.0, key: Optional[jax.Array] = None):
    """Rays for flat pixel samples.

    view_idx: [...] int view indices; xy: [..., 2] pixel coords.
    Returns rays [..., 6].
    """
    if jitter > 0:
      assert key is not None
      xy = xy + jitter * (jax.random.uniform(key, xy.shape, xy.dtype) - 0.5)
    d_cam = self._pixel_dirs(xy, size)                       # [..., 3]
    c2w = self.cam_to_world[view_idx]                        # [..., 4, 4]
    r_d = jnp.einsum("...ij,...j->...i", c2w[..., :3, :3], d_cam)
    r_o = jnp.broadcast_to(c2w[..., :3, 3], r_d.shape)
    return _rays_from_dirs(r_o, r_d)

  def sample_positions(self, positions, size: int,
                       with_noise: float = 0.0,
                       key: Optional[jax.Array] = None):
    """Grid form (reference src/cameras.py:45-66): positions [H', W', 2]
    pixel coords; returns rays [N, H', W', 6] for all N views."""
    n = len(self)
    view_idx = jnp.arange(n)[:, None, None]
    xy = jnp.broadcast_to(positions, (n,) + positions.shape)
    return self.rays_at(view_idx, xy, size, jitter=with_noise, key=key)

  def project_pts(self, pts, size: int):
    """World points [..., 3] -> pixel coords [..., 2] per camera
    (inverse of rays_at; used to project rig points)."""
    c2w = self.cam_to_world
    R = c2w[..., :3, :3]
    t = c2w[..., :3, 3]
    local = jnp.einsum("...ji,...j->...i", R, pts - t)  # R^T (p - t)
    z = -local[..., 2:3]
    z = jnp.where(jnp.abs(z) < 1e-8, 1e-8, z)
    u = local[..., 0:1] / z * self.focal + size * 0.5
    v = -local[..., 1:2] / z * self.focal + size * 0.5
    return jnp.concatenate([u, v], axis=-1)


@struct.dataclass
class OrthogonalCamera:
  """Orthographic camera: parallel rays along the view direction
  (used by the GAN-SDF turntable renderer)."""
  cam_to_world: jnp.ndarray  # [N, 4, 4]
  view_width: float = struct.field(pytree_node=False, default=2.0)

  def __len__(self):
    return self.cam_to_world.shape[0]

  def __getitem__(self, idxs):
    return OrthogonalCamera(cam_to_world=self.cam_to_world[idxs],
                            view_width=self.view_width)

  def rays_at(self, view_idx, xy, size: int, jitter: float = 0.0,
              key: Optional[jax.Array] = None):
    if jitter > 0:
      assert key is not None
      xy = xy + jitter * (jax.random.uniform(key, xy.shape, xy.dtype) - 0.5)
    uv = (xy / size - 0.5) * self.view_width
    c2w = self.cam_to_world[view_idx]
    offset = (uv[..., 0:1] * c2w[..., :3, 0]
              - uv[..., 1:2] * c2w[..., :3, 1])
    r_o = c2w[..., :3, 3] + offset
    r_d = -c2w[..., :3, 2]
    r_d = jnp.broadcast_to(r_d, r_o.shape)
    return _rays_from_dirs(r_o, r_d)

  def sample_positions(self, positions, size: int, with_noise: float = 0.0,
                       key: Optional[jax.Array] = None):
    n = len(self)
    view_idx = jnp.arange(n)[:, None, None]
    xy = jnp.broadcast_to(positions, (n,) + positions.shape)
    return self.rays_at(view_idx, xy, size, jitter=with_noise, key=key)


@struct.dataclass
class StaticCamera:
  """All views share one origin-pinned pose with a FOV-derived focal —
  for single-video data where the camera never moves."""
  focal: jnp.ndarray
  n_views: int = struct.field(pytree_node=False, default=1)

  def __len__(self):
    return self.n_views

  def __getitem__(self, idxs):
    try:
      n = len(idxs)  # array / list of indices
    except TypeError:
      n = 1
    return StaticCamera(focal=self.focal, n_views=n)

  @classmethod
  def from_fov(cls, fov_deg: float, width: int, n_views: int = 1):
    focal = 0.5 * width / math.tan(0.5 * math.radians(fov_deg))
    return cls(focal=jnp.asarray(focal, jnp.float32), n_views=n_views)

  def rays_at(self, view_idx, xy, size: int, jitter: float = 0.0,
              key: Optional[jax.Array] = None):
    del view_idx
    if jitter > 0:
      assert key is not None
      xy = xy + jitter * (jax.random.uniform(key, xy.shape, xy.dtype) - 0.5)
    u = (xy[..., 0] - size * 0.5) / self.focal
    v = -(xy[..., 1] - size * 0.5) / self.focal
    r_d = jnp.stack([u, v, -jnp.ones_like(u)], axis=-1)
    r_o = jnp.zeros_like(r_d)
    return _rays_from_dirs(r_o, r_d)

  def sample_positions(self, positions, size: int, with_noise: float = 0.0,
                       key: Optional[jax.Array] = None):
    n = len(self)
    xy = jnp.broadcast_to(positions, (n,) + positions.shape)
    return self.rays_at(None, xy, size, jitter=with_noise, key=key)


@struct.dataclass
class DTUCamera:
  """Intrinsics-based camera for DTU scans: per-view pose (camera-to-world)
  plus intrinsics K; rays lift pixels through K^-1.

  pose: [N, 4, 4]; K: [N, 3, 3] (pixel units for the training size).
  """
  pose: jnp.ndarray
  K: jnp.ndarray

  def __len__(self):
    return self.pose.shape[0]

  def __getitem__(self, idxs):
    return DTUCamera(pose=self.pose[idxs], K=self.K[idxs])

  def rays_at(self, view_idx, xy, size: int, jitter: float = 0.0,
              key: Optional[jax.Array] = None):
    del size  # K already carries the pixel scale
    if jitter > 0:
      assert key is not None
      xy = xy + jitter * (jax.random.uniform(key, xy.shape, xy.dtype) - 0.5)
    pose = self.pose[view_idx]
    K = self.K[view_idx]
    homog = jnp.concatenate([xy, jnp.ones_like(xy[..., :1])], axis=-1)
    d_cam = jnp.einsum("...ij,...j->...i", jnp.linalg.inv(K), homog)
    r_d = jnp.einsum("...ij,...j->...i", pose[..., :3, :3], d_cam)
    r_d = r_d / jnp.maximum(
        jnp.linalg.norm(r_d, axis=-1, keepdims=True), 1e-8)
    r_o = jnp.broadcast_to(pose[..., :3, 3], r_d.shape)
    return _rays_from_dirs(r_o, r_d)

  def sample_positions(self, positions, size: int, with_noise: float = 0.0,
                       key: Optional[jax.Array] = None):
    n = len(self)
    view_idx = jnp.arange(n)[:, None, None]
    xy = jnp.broadcast_to(positions, (n,) + positions.shape)
    return self.rays_at(view_idx, xy, size, jitter=with_noise, key=key)


CAMERA_KINDS = {
    "nerf": NeRFCamera,
    "ortho": OrthogonalCamera,
    "static": StaticCamera,
    "dtu": DTUCamera,
}
