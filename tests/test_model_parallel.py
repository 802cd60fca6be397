"""2-D (data × model) mesh: sharding rule, placement, driver parity.

The model axis is the scaling path for parameter tensors that outgrow
one chip's HBM (dense voxel grids, hash tables) — the reference keeps
its whole grid on one CUDA device (/root/reference/src/nerf.py:1407-1470)
and OOMs past it. Here GSPMD partitions the tensors; these tests pin the
shape-driven sharding rule and prove a model-parallel train step computes
the same math as the data-parallel one on the virtual 8-device mesh.
"""
import jax
import jax.numpy as jnp
import numpy as np

from nerf_atlas_tpu import models
from nerf_atlas_tpu.data import loaders, sampler
from nerf_atlas_tpu.parallel import (make_mesh_2d, model_axis_size,
                                     model_shardings, place_model_parallel)
from nerf_atlas_tpu.train import driver


def _flagship_params():
  model = models.PlainNeRF(steps=8, t_near=2.0, t_far=6.0, enc_kind="cp")
  rays = jnp.ones((16, 6))
  params = model.init({"params": jax.random.PRNGKey(0),
                       "sampler": jax.random.PRNGKey(1)}, rays, train=True)
  return model, params


def test_model_shardings_rule():
  mesh = make_mesh_2d(2)
  assert model_axis_size(mesh) == 2
  assert model_axis_size(None) == 1
  _, params = _flagship_params()
  sh = model_shardings(params, mesh)
  mlp = sh["params"]["density_mlp"]
  # a [256, 256] kernel shards over the model axis
  assert "model" in tuple(mlp["layer_1"]["kernel"].spec)
  # a [256] bias is below the element floor -> replicated
  assert tuple(mlp["layer_1"]["bias"].spec) in ((), (None,))
  # [256, 33]: 33 is indivisible, the 256 axis carries the shard
  out_spec = tuple(mlp["layer_out"]["kernel"].spec)
  assert out_spec[0] == "model" and out_spec[1] in (None,)


def test_voxel_grid_actually_partitions():
  mesh = make_mesh_2d(2)
  model = models.NeRFVoxel(resolution=16, steps=8, t_near=1.5, t_far=4.5)
  rays = jnp.ones((16, 6))
  params = model.init({"params": jax.random.PRNGKey(0),
                       "sampler": jax.random.PRNGKey(1)}, rays, train=True)
  placed = place_model_parallel(params, mesh)
  grid = placed["params"]["sigma_grid"]      # [16, 16, 16, 1]
  shard_shapes = {s.data.shape for s in grid.addressable_shards}
  # each model-axis shard holds half the leading grid axis, replicated
  # over the 4 data-axis rows
  assert shard_shapes == {(8, 16, 16, 1)}
  # values survive the layout round trip
  np.testing.assert_allclose(np.asarray(grid),
                             np.asarray(params["params"]["sigma_grid"]))
  # forward still computes
  out = model.apply(placed, rays)
  assert np.isfinite(np.asarray(out["rgb"])).all()


def test_driver_model_parallel_matches_data_parallel():
  """--model-parallel 2 (4×2 mesh) reproduces the pure-DP step math."""
  bundle = loaders.synthetic_spheres(size=16, num_views=2)
  ds = sampler.RayDataset.from_bundle(bundle, size=16)
  model = models.PlainNeRF(steps=8, t_near=1.5, t_far=4.5, enc_kind="cp")
  common = dict(steps=4, batch_size=128, log_freq=1, save_freq=0,
                valid_freq=0, learning_rate=1e-3)
  p_mp, _, h_mp = driver.train(model, ds,
                               driver.TrainConfig(model_parallel=2, **common))
  p_dp, _, h_dp = driver.train(model, ds,
                               driver.TrainConfig(use_mesh=True, **common))
  assert np.isfinite(h_mp[-1]["loss"])
  # same seeds, same sampled rays; only the reduction layout differs
  np.testing.assert_allclose(h_mp[-1]["loss"], h_dp[-1]["loss"],
                             rtol=1e-4, atol=1e-6)
  for a, b in zip(jax.tree_util.tree_leaves(p_mp),
                  jax.tree_util.tree_leaves(p_dp)):
    # adam's eps amplifies reduction-order noise for near-zero second
    # moments; the observed worst case over 4 steps is ~3e-4 absolute
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=5e-3, atol=1e-3)
