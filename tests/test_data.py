"""Camera math + procedural dataset + sampler tests."""
import jax
import jax.numpy as jnp
import numpy as np

from nerf_atlas_tpu.data import cameras, sampler, synthetic, loaders


def test_look_at_points_at_target():
  c2w = synthetic.look_at((0.0, 0.0, 3.0), (0.0, 0.0, 0.0))
  # camera -z axis should point from eye to target
  fwd = -c2w[:3, 2]
  np.testing.assert_allclose(fwd, [0, 0, -1], atol=1e-6)
  np.testing.assert_allclose(c2w[:3, 3], [0, 0, 3], atol=1e-6)


def test_center_ray_hits_target():
  size = 64
  poses = synthetic.hemisphere_poses(4)
  cam = cameras.NeRFCamera.from_json_transforms(poses, 0.6911, size)
  center = jnp.array([[size / 2, size / 2]], jnp.float32)
  rays = cam.rays_at(jnp.array([0]), center, size)
  r_o, r_d = rays[0, :3], rays[0, 3:]
  # the ray through the image center passes near the origin (look-at target)
  t_closest = -jnp.dot(r_o, r_d) / jnp.dot(r_d, r_d)
  closest = r_o + t_closest * r_d
  assert float(jnp.linalg.norm(closest)) < 1e-3


def test_project_pts_inverts_rays():
  size = 64
  poses = synthetic.hemisphere_poses(2)
  cam = cameras.NeRFCamera.from_json_transforms(poses, 0.6911, size)
  xy = jnp.array([[12.0, 40.0], [50.0, 9.0]])
  vidx = jnp.array([0, 1])
  rays = cam.rays_at(vidx, xy, size)
  pts = rays[:, :3] + 1.7 * rays[:, 3:]
  uv = cam[vidx].project_pts(pts, size)
  np.testing.assert_allclose(uv, xy, atol=1e-3)


def test_camera_indexing():
  poses = synthetic.hemisphere_poses(5)
  cam = cameras.NeRFCamera.from_json_transforms(poses, 0.6911, 32)
  sub = cam[jnp.array([1, 3])]
  assert len(sub) == 2
  np.testing.assert_allclose(sub.cam_to_world[0], cam.cam_to_world[1])


def test_synthetic_dataset_golden():
  imgs, cam, _ = synthetic.dataset(num_views=3, size=32)
  assert imgs.shape == (3, 32, 32, 4)
  assert imgs[..., :3].max() <= 1.01 and imgs.min() >= 0
  # scene occupies the image center: center alpha should be opaque
  assert imgs[:, 14:18, 14:18, 3].mean() > 0.8
  # corners mostly empty
  assert imgs[:, :3, :3, 3].mean() < 0.2


def test_dynamic_dataset_times_move_sphere():
  (imgs, times), cam, _ = synthetic.dataset(num_views=4, size=32,
                                            dynamic=True)
  assert times.shape == (4,)
  # different times must produce different images (sphere orbits)
  assert np.abs(imgs[0] - imgs[2]).max() > 0.1


def test_ray_dataset_sampling():
  bundle = loaders.synthetic_spheres(size=32, num_views=3)
  ds = sampler.RayDataset.from_bundle(bundle, size=32)
  rays, pix, t = ds.sample_rays(jax.random.PRNGKey(0), 128)
  assert rays.shape == (128, 6) and pix.shape == (128, 4) and t is None
  rays, pix, t, view = ds.sample_crop(jax.random.PRNGKey(1), 8,
                                      views_per_batch=2)
  assert rays.shape == (2, 8, 8, 6) and pix.shape == (2, 8, 8, 4)
  assert view.shape == (2,)


def test_view_rays_match_gt_pixels():
  """Rendering view 0's rays with the analytic field reproduces the GT img."""
  from nerf_atlas_tpu.ops import integrate, rays as rays_ops
  bundle = loaders.synthetic_spheres(size=24, num_views=2)
  ds = sampler.RayDataset.from_bundle(bundle, size=24)
  rays = ds.view_rays(0)
  pts, ts, _, r_d = rays_ops.compute_pts_ts(rays, 2.0, 4.5, 96)
  density, rgb = synthetic.scene_density_rgb(pts)
  _, weights = integrate.alpha_from_density(density, ts, r_d, softplus=False)
  img = integrate.volumetric_integrate(weights, rgb).reshape(24, 24, 3)
  np.testing.assert_allclose(img, bundle.labels[0][..., :3], atol=1e-4)


def test_static_camera():
  cam = cameras.StaticCamera.from_fov(60.0, 64, n_views=3)
  xy = jnp.array([[32.0, 32.0]])
  rays = cam.rays_at(None, xy, 64)
  np.testing.assert_allclose(rays[0, :3], 0.0)
  np.testing.assert_allclose(rays[0, 3:], [0, 0, -1], atol=1e-6)


def test_dtu_camera_roundtrip():
  """A DTU camera built from K[R|t] recovers rays whose origin is the
  camera center."""
  K = jnp.array([[[100.0, 0, 32], [0, 100.0, 32], [0, 0, 1]]])
  pose = jnp.eye(4)[None].at[0, :3, 3].set(jnp.array([1.0, 2.0, 3.0]))
  cam = cameras.DTUCamera(pose=pose, K=K)
  rays = cam.rays_at(jnp.array([0]), jnp.array([[32.0, 32.0]]), 64)
  np.testing.assert_allclose(rays[0, :3], [1, 2, 3], atol=1e-6)
  np.testing.assert_allclose(rays[0, 3:], [0, 0, 1], atol=1e-5)


def test_decompose_projection():
  rng = np.random.default_rng(0)
  K = np.array([[120.0, 0.0, 30.0], [0.0, 110.0, 28.0], [0.0, 0.0, 1.0]])
  # random rotation via QR
  Q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
  if np.linalg.det(Q) < 0:
    Q = -Q
  t = rng.normal(size=3)
  P = K @ np.concatenate([Q, t[:, None]], axis=1)
  K2, R2, center2 = loaders._decompose_projection(P)
  np.testing.assert_allclose(K2, K / K[2, 2], atol=1e-6)
  np.testing.assert_allclose(R2, Q, atol=1e-6)
  np.testing.assert_allclose(center2, -Q.T @ t, atol=1e-6)
