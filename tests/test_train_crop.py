"""Crop-mode training (image-structured losses), style loss, optimizer
state checkpointing, and the finite-loss guard.

Covers ADVICE round-1 items #2/#3 and VERDICT missing #6/#8:
--loss-fns ssim/fft must train (reference trains them on image crops,
runner.py:552-603), --save-load-opt must resume Adam moments, and the
train loop must fail fast on NaN (reference runner.py:673,818).
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_atlas_tpu import models
from nerf_atlas_tpu.data import load, sampler
from nerf_atlas_tpu.train import checkpoints, driver


def _ds(size=24, views=4):
  bundle = load("", data_kind="synthetic", training=True, size=size,
                num_views=views)
  return sampler.RayDataset.from_bundle(bundle, size=size)


@pytest.mark.parametrize("loss_kind", ["ssim", "fft"])
def test_image_structured_loss_trains(loss_kind):
  ds = _ds()
  model = models.TinyNeRF(steps=8, t_near=1.5, t_far=4.5)
  cfg = driver.TrainConfig(steps=3, batch_size=256, crop_size=12,
                           loss_kinds=(loss_kind, "l2"), save_freq=0,
                           valid_freq=0, log_freq=1)
  params, _, hist = driver.train(model, ds, cfg)
  assert np.isfinite(hist[-1]["loss"])


def test_style_loss_trains(tmp_path):
  import imageio.v2 as imageio
  style_path = os.path.join(tmp_path, "style.png")
  rng = np.random.default_rng(0)
  imageio.imwrite(style_path,
                  (rng.uniform(size=(32, 32, 3)) * 255).astype(np.uint8))
  ds = _ds()
  model = models.TinyNeRF(steps=8, t_near=1.5, t_far=4.5)
  cfg = driver.TrainConfig(steps=3, batch_size=256, crop_size=12,
                           style_img=style_path, style_weight=1e-2,
                           save_freq=0, valid_freq=0, log_freq=1)
  params, _, hist = driver.train(model, ds, cfg)
  assert np.isfinite(hist[-1]["loss"])


def test_crop_mode_dynamic_times():
  bundle = load("", data_kind="synthetic-dyn", training=True, size=24,
                num_views=4)
  ds = sampler.RayDataset.from_bundle(bundle, size=24)
  model = models.DynamicNeRF(steps=8, t_near=1.5, t_far=4.5,
                             canonical_kind="tiny")
  cfg = driver.TrainConfig(steps=2, batch_size=144, crop_size=12,
                           save_freq=0, valid_freq=0, log_freq=1)
  params, _, hist = driver.train(model, ds, cfg)
  assert np.isfinite(hist[-1]["loss"])


def test_save_load_opt_roundtrip(tmp_path):
  ds = _ds()
  model = models.TinyNeRF(steps=8, t_near=1.5, t_far=4.5)
  path = os.path.join(tmp_path, "m.ckpt")
  cfg = driver.TrainConfig(steps=4, batch_size=128, save_freq=4,
                           valid_freq=0, log_freq=2, save_path=path,
                           save_load_opt=True)
  params, opt_state, _ = driver.train(model, ds, cfg)

  fresh = driver.init_model(model, ds, 0)
  restored, info = checkpoints.restore_or_graft(path, fresh)
  assert info["opt_state"] is not None
  # resume: the deserialized opt state must carry the trained Adam moments
  params2, opt2, hist2 = driver.train(
      model, ds, cfg, params=restored, opt_state_saved=info["opt_state"])
  assert np.isfinite(hist2[-1]["loss"])
  # adam mu tensors restored (nonzero after training, zero on fresh init)
  import optax
  mu_leaves = jax.tree_util.tree_leaves(opt_state)
  assert any(np.abs(np.asarray(l)).max() > 0 for l in mu_leaves
             if hasattr(l, "shape") and getattr(l, "size", 0) > 1)


def test_finite_loss_guard():
  ds = _ds()
  model = models.TinyNeRF(steps=8, t_near=1.5, t_far=4.5)
  params = driver.init_model(model, ds, 0)
  params = jax.tree.map(lambda x: x * jnp.nan, params)
  cfg = driver.TrainConfig(steps=3, batch_size=128, save_freq=0,
                           valid_freq=0, log_freq=1)
  with pytest.raises(FloatingPointError):
    driver.train(model, ds, cfg, params=params)
