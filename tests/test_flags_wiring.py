"""Behavior tests for the round-2 flag surface: set_per_run conversions,
serial/biased view sampling, float gamma, dyn refl latent, VolSDF
surface rendering, dataset view slicing.

Reference analogs: runner.py:1041-1170 (set_per_run), :632-637 (serial /
higher-end sampling), :109-111 (gamma-correct-loss), :308 (dyn-refl-
latent), src/nerf.py:1133-1170 (AlternatingVolSDF).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import runner
from nerf_atlas_tpu.data import sampler as sampler_lib
from nerf_atlas_tpu.data.synthetic import hemisphere_poses
from nerf_atlas_tpu.data import cameras as cam_lib


def _tiny_ds(n_views=6, size=8, times=False):
  poses = hemisphere_poses(n_views, seed=0)
  cam = cam_lib.NeRFCamera.from_json_transforms(poses, 0.69, size)
  pix = jnp.linspace(0, 1, n_views * size * size * 3).reshape(
      n_views, size, size, 3)
  t = jnp.linspace(0, 1, n_views) if times else None
  return sampler_lib.RayDataset(pixels=pix, camera=cam, times=t, size=size)


def test_serial_idxs_sampling():
  ds = _tiny_ds()
  key = jax.random.PRNGKey(0)
  for step in (0, 3, 7):
    _, _, _, view = ds.sample(key, 16, serial_step=jnp.int32(step))
    assert np.all(np.asarray(view) == step % ds.num_views)


def test_end_bias_sampling():
  ds = _tiny_ds()
  key = jax.random.PRNGKey(0)
  _, _, _, view = ds.sample(key, 4096, end_bias=10)
  counts = np.bincount(np.asarray(view), minlength=ds.num_views)
  # first/last views get (1 + 10)x the draw weight of interior views
  assert counts[0] > 3 * counts[2]
  assert counts[-1] > 3 * counts[2]


def test_gamma_float_loss():
  from nerf_atlas_tpu.train import losses
  x = jnp.full((16, 3), 0.25)
  y = jnp.full((16, 3), 0.5)
  l1 = losses.load_loss_fn(gamma_correct=False)(x, y)
  l2 = losses.load_loss_fn(gamma_correct=2.2)(x, y)
  l3 = losses.load_loss_fn(gamma_correct=True)(x, y)
  assert not np.isclose(float(l1), float(l2))
  assert np.isclose(float(l2), float(l3))   # True == 2.2


def test_set_per_run_conversions():
  args = runner.arguments([
      "--model", "volsdf", "--occ-kind", "all-learned",
      "--refl-kind", "diffuse", "--volsdf-direct-to-path",
      "--all-learned-to-joint", "--convert-analytic-to-alt",
      "--dp-weight", "0.5"])
  ds = _tiny_ds()
  remaps = runner.set_per_run(args, ds)
  assert args.integrator_kind == "path"
  assert args.occ_kind == "joint-all-const"
  assert args.refl_kind == "alternating"
  assert (("params", "occ"), ("params", "occ", "all_learned")) in remaps
  # static model -> dyn reg zeroed with a warning
  assert args.dp_weight == 0.0


def test_set_per_run_autogamma():
  args = runner.arguments(["--autogamma-correct-loss"])
  ds = _tiny_ds()
  dark = ds.replace(pixels=ds.pixels * 0.6)   # mean 0.3 -> gamma ~0.58
  runner.set_per_run(args, dark)
  assert 0.4 < args.gamma_correct_loss < 0.9

  bright = ds  # mean 0.5 -> gamma 1.0 -> ignored
  args2 = runner.arguments(["--autogamma-correct-loss"])
  runner.set_per_run(args2, bright)
  assert args2.gamma_correct_loss == 1.0


def test_remap_subtree():
  from nerf_atlas_tpu.train.checkpoints import remap_subtree
  tree = {"params": {"occ": {"atten": {"w": np.ones(3)}}}}
  out = remap_subtree(tree, ("params", "occ"),
                      ("params", "occ", "all_learned"))
  assert "atten" in out["params"]["occ"]["all_learned"]


def test_slice_views():
  ds = _tiny_ds(n_views=6, times=True)
  out = runner._slice_views(ds, 3)
  assert out.num_views == 3
  assert out.times.shape == (3,)
  assert out.camera.cam_to_world.shape[0] == 3


def test_dyn_refl_latent():
  from nerf_atlas_tpu import models
  m = models.load_dyn_model("plain", canonical_kind="plain", steps=4,
                            t_near=2.0, t_far=6.0, time_latent_size=8,
                            canonical_kwargs={"refl_kind": "view"})
  rays = jnp.concatenate([jnp.zeros((4, 3)),
                          jnp.tile(jnp.array([[0., 0., -1.]]), (4, 1))], -1)
  p = m.init({"params": jax.random.PRNGKey(0),
              "sampler": jax.random.PRNGKey(1)}, rays,
             times=jnp.zeros((4,)), train=True)
  out = m.apply(p, rays, times=jnp.full((4,), 0.5))
  assert out["rgb"].shape == (4, 3)
  assert np.all(np.isfinite(np.asarray(out["rgb"])))


def test_volsdf_surface_render():
  from nerf_atlas_tpu import models
  m = models.load_model("volsdf", steps=8, t_near=0.5, t_far=6.0)
  rays = jnp.concatenate([jnp.tile(jnp.array([[0., 0., -3.]]), (8, 1)),
                          jnp.tile(jnp.array([[0., 0., 1.]]), (8, 1))], -1)
  p = m.init({"params": jax.random.PRNGKey(0),
              "sampler": jax.random.PRNGKey(1)}, rays, train=True)
  out = m.apply(p, rays, method="surface_render")
  assert out["rgb"].shape == (8, 3)
  assert out["throughput"].shape[-1] == 1
  # sphere-initialized SDF: rays toward the origin hit the unit sphere
  assert np.asarray(out["hits"]).any()


def test_eikonal_weight_reaches_the_loss():
  """--eikonal-weight must actually contribute: it requires the model to
  compute normals (runner wires with_normals from the flag — without
  that, out has no 'eikonal' key and the regularizer silently reads 0,
  which is exactly what happened in rounds 1-3)."""
  from nerf_atlas_tpu import models
  from nerf_atlas_tpu.train.regularizers import total_regularizer
  argv = ["-d", "", "--data-kind", "synthetic", "--model", "volsdf",
          "--sdf-kind", "mlp", "--eikonal-weight", "0.1"]
  args = runner.arguments(argv)
  model = runner.build_model(args, dynamic=False)
  assert model.with_normals, "--eikonal-weight did not enable normals"
  rays = jnp.concatenate([jnp.tile(jnp.array([[0., 0., -3.]]), (4, 1)),
                          jnp.tile(jnp.array([[0., 0., 1.]]), (4, 1))], -1)
  p = model.init({"params": jax.random.PRNGKey(0),
                  "sampler": jax.random.PRNGKey(1)}, rays, train=True)
  out = model.apply(p, rays, train=True, rngs={"sampler": jax.random.PRNGKey(2)})
  assert "eikonal" in out
  reg = float(total_regularizer(out, {"eikonal": 0.1}))
  assert reg != 0.0


def test_sphere_init_flag():
  from nerf_atlas_tpu.models.sdf import load_sdf_shape
  pts = jnp.array([[2.0, 0.0, 0.0]])
  on = load_sdf_shape("mlp", sphere_init=True)
  off = load_sdf_shape("mlp", sphere_init=False)
  p_on = on.init(jax.random.PRNGKey(0), pts)
  p_off = off.init(jax.random.PRNGKey(0), pts)
  sd_on = float(on.apply(p_on, pts)[0][0])
  sd_off = float(off.apply(p_off, pts)[0][0])
  # with the bias the zero-init MLP gives exactly ||p|| - 1
  assert abs(sd_on - 1.0) < 0.2
  assert abs(sd_off) < 0.2


def test_async_checkpoint_save(tmp_path):
  from nerf_atlas_tpu.train import checkpoints
  p = str(tmp_path / "m.ckpt")
  params = {"params": {"w": np.ones((4, 4), np.float32)}}
  checkpoints.save(p, params, step=7, async_save=True)
  checkpoints.wait_for_saves()
  raw = checkpoints.load(p)
  assert raw["step"] == 7
  np.testing.assert_array_equal(raw["params"]["params"]["w"],
                                np.ones((4, 4)))
