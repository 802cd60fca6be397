"""On-disk loader tests: write real-format fixture datasets (NeRF-synthetic
JSON + PNGs, D-NeRF with times, DTU cameras.npz) from the procedural scene
and load them back through the loaders."""
import json
import os

import numpy as np
import pytest

from nerf_atlas_tpu.data import loaders, synthetic


def _write_nerf_synthetic(root, dynamic=False, n=3, size=24):
  import imageio.v2 as imageio
  os.makedirs(os.path.join(root, "train"), exist_ok=True)
  poses = np.asarray(synthetic.hemisphere_poses(n))
  from nerf_atlas_tpu.data import cameras as cam_lib
  cam = cam_lib.NeRFCamera.from_json_transforms(poses, 0.6911, size)
  times = np.linspace(0, 1, n) if dynamic else None
  imgs = synthetic.render_gt(cam, size, times=times)
  frames = []
  for i in range(n):
    rel = f"train/r_{i}"
    imageio.imwrite(os.path.join(root, rel + ".png"),
                    (np.clip(imgs[i], 0, 1) * 255).astype(np.uint8))
    fr = {"file_path": rel, "transform_matrix": poses[i].tolist()}
    if dynamic:
      fr["time"] = float(times[i])
    frames.append(fr)
  meta = {"camera_angle_x": 0.6911, "frames": frames}
  for split in ("train", "test"):
    with open(os.path.join(root, f"transforms_{split}.json"), "w") as f:
      json.dump(meta, f)
  return imgs


def test_original_loader_roundtrip(tmp_path):
  root = str(tmp_path / "lego")
  imgs = _write_nerf_synthetic(root, n=3, size=24)
  bundle = loaders.load(root, training=True, size=24)
  assert loaders.kind_from_path(root) == "original"
  assert bundle.labels.shape == (3, 24, 24, 4)
  # PNG quantization round-trip within 1/255
  np.testing.assert_allclose(bundle.labels, imgs, atol=2 / 255)
  assert len(bundle.camera) == 3


def test_dnerf_loader_roundtrip(tmp_path):
  root = str(tmp_path / "jj")
  _write_nerf_synthetic(root, dynamic=True, n=4, size=16)
  assert loaders.kind_from_path(root) == "dnerf"
  bundle = loaders.load(root, training=True, size=16)
  imgs, times = bundle.labels
  assert imgs.shape == (4, 16, 16, 4)
  np.testing.assert_allclose(times, np.linspace(0, 1, 4), atol=1e-6)
  assert np.all(np.diff(times) > 0)  # sorted


def test_dnerf_white_bg(tmp_path):
  root = str(tmp_path / "jj2")
  _write_nerf_synthetic(root, dynamic=True, n=2, size=16)
  bundle = loaders.load(root, training=True, size=16, white_bg=True)
  imgs, _ = bundle.labels
  # empty corners become white under white-bg compositing
  assert imgs[0, 0, 0, :3].min() > 0.9


def test_dnerf_time_gamma_matches_reference_form(tmp_path):
  """--time-gamma applies the reference's per-frame IMAGE gamma
  exp(2t-1) to rgb (src/loaders.py:148), leaving alpha untouched."""
  root = str(tmp_path / "jj3")
  _write_nerf_synthetic(root, dynamic=True, n=4, size=16)
  plain = loaders.load(root, training=True, size=16)
  gamma = loaders.load(root, training=True, size=16, time_gamma=True)
  (im0, t0), (im1, t1) = plain.labels, gamma.labels
  np.testing.assert_allclose(t0, t1)
  g = np.exp(2.0 * np.asarray(t0) - 1.0)[:, None, None, None]
  np.testing.assert_allclose(np.asarray(im1[..., :3]),
                             np.asarray(im0[..., :3]) ** g, atol=1e-6)
  np.testing.assert_allclose(np.asarray(im1[..., 3:]),
                             np.asarray(im0[..., 3:]), atol=1e-6)


def test_dtu_loader_roundtrip(tmp_path):
  import imageio.v2 as imageio
  root = str(tmp_path / "scan")
  os.makedirs(os.path.join(root, "image"), exist_ok=True)
  os.makedirs(os.path.join(root, "mask"), exist_ok=True)
  size = 20
  rng = np.random.default_rng(0)
  K = np.array([[60.0, 0, 10.0], [0, 60.0, 10.0], [0, 0, 1.0]])
  mats = {}
  for i in range(2):
    Q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    if np.linalg.det(Q) < 0:
      Q = -Q
    t = rng.normal(size=3)
    P = K @ np.concatenate([Q, t[:, None]], 1)
    world = np.eye(4)
    world[:3] = P
    mats[f"world_mat_{i}"] = world
    mats[f"scale_mat_{i}"] = np.eye(4)
    img = (rng.uniform(size=(size, size, 3)) * 255).astype(np.uint8)
    imageio.imwrite(os.path.join(root, "image", f"{i:03d}.png"), img)
    imageio.imwrite(os.path.join(root, "mask", f"{i:03d}.png"),
                    np.full((size, size), 255, np.uint8))
  np.savez(os.path.join(root, "cameras.npz"), **mats)
  assert loaders.kind_from_path(root) == "dtu"
  bundle = loaders.load(root, training=True, size=size)
  assert bundle.labels.shape == (2, size, size, 4)
  assert bundle.camera.pose.shape == (2, 4, 4)
  # recovered camera center must match -R^T t
  for i in range(2):
    P3 = mats[f"world_mat_{i}"][:3]
    K2, R2, c2 = loaders._decompose_projection(P3)
    np.testing.assert_allclose(np.asarray(bundle.camera.pose[i][:3, 3]),
                               c2, atol=1e-5)


def test_single_image_loader(tmp_path):
  import imageio.v2 as imageio
  p = str(tmp_path / "img.png")
  imageio.imwrite(p, np.zeros((16, 16, 3), np.uint8))
  assert loaders.kind_from_path(p) == "pixel-single"
  bundle = loaders.load(p, size=16)
  assert bundle.labels.shape == (1, 16, 16, 3)


def test_dnerf_gibson_quirks(tmp_path):
  """Gibson datasets: camera_angle_x in DEGREES, world-to-camera
  matrices (inverted on load), `timestep` instead of `time`
  (reference src/loaders.py:113-124)."""
  import imageio.v2 as imageio
  root = str(tmp_path / "gibson_scene")
  os.makedirs(os.path.join(root, "train"), exist_ok=True)
  n, size = 3, 16
  poses = np.asarray(synthetic.hemisphere_poses(n))
  poses4 = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
  poses4[:, :3, :4] = poses[:, :3, :4]
  frames = []
  for i in range(n):
    rel = f"train/r_{i}"
    imageio.imwrite(os.path.join(root, rel + ".png"),
                    np.full((size, size, 3), 128, np.uint8))
    frames.append({"file_path": rel,
                   "transform_matrix": np.linalg.inv(poses4[i]).tolist(),
                   "timestep": float(i)})     # 0..2: needs normalization
  meta = {"camera_angle_x": np.degrees(0.6911), "frames": frames}
  with open(os.path.join(root, "transforms_train.json"), "w") as f:
    json.dump(meta, f)
  bundle = loaders.load(root, data_kind="dnerf", training=True, size=size)
  _, times = bundle.labels
  np.testing.assert_allclose(times, [0, 0.5, 1], atol=1e-6)
  # the inverse-of-inverse restores the original camera-to-world poses
  c2w = np.asarray(bundle.camera.cam_to_world)[:, :3, :4]
  np.testing.assert_allclose(c2w, poses4[:, :3, :4], atol=1e-4)
  # degrees converted: focal matches the radian-loaded equivalent
  from nerf_atlas_tpu.data import cameras as cam_lib
  ref_cam = cam_lib.NeRFCamera.from_json_transforms(poses, 0.6911, size)
  np.testing.assert_allclose(float(bundle.camera.focal),
                             float(ref_cam.focal), rtol=1e-5)


def test_nerv_multi_point_split(tmp_path):
  """multi_point=True loads frames 100+ at per-light intensity 55
  (reference src/loaders.py:198,219-221)."""
  import imageio.v2 as imageio
  root = str(tmp_path / "nerv")
  os.makedirs(os.path.join(root, "train"), exist_ok=True)
  poses = np.asarray(synthetic.hemisphere_poses(4))
  frames = []
  for i in range(4):
    rel = f"train/r_{i}"
    imageio.imwrite(os.path.join(root, rel + ".png"),
                    np.full((8, 8, 3), 100, np.uint8))
    frames.append({"file_path": rel, "transform_matrix": poses[i].tolist(),
                   "light_loc": [[0.0, 2.0, 0.0], [1.0, 2.0, 0.0]]})
  meta = {"camera_angle_x": 0.6911, "frames": frames}
  with open(os.path.join(root, "transforms_train.json"), "w") as f:
    json.dump(meta, f)
  # fewer than 100 frames: the [:100] / [100:] split falls back to all
  b = loaders.nerv_point(root, training=True, size=8)
  assert b.labels.shape[0] == 4
  bm = loaders.nerv_point(root, training=True, size=8, multi_point=True)
  assert bm.lights["intensity"] == 55.0


def test_shiny_loader_roundtrip(tmp_path):
  """NeX shiny (LLFF) fixture: poses_bounds + hwf_cxcy + images. The
  LLFF [down,right,back] axis order converts to NeRF [right,up,back],
  translations rescale by 1/(0.75*near), focal rescales to the loaded
  size, and every-8th-view splits test from train."""
  import imageio.v2 as imageio
  root = str(tmp_path / "cd")
  os.makedirs(os.path.join(root, "images"), exist_ok=True)
  n, orig_w, size = 9, 32, 16
  poses = np.asarray(synthetic.hemisphere_poses(n))  # NeRF-style [N,4,4]
  # NeRF cols [right, up, back, t] -> LLFF cols [down, right, back, t]
  llff = np.concatenate(
      [-poses[:, :3, 1:2], poses[:, :3, 0:1], poses[:, :3, 2:4]], -1)
  bds = np.tile(np.array([[2.0, 6.0]]), (n, 1))
  np.save(os.path.join(root, "poses_bounds.npy"),
          np.concatenate([llff.reshape(n, 12), bds], -1))
  np.save(os.path.join(root, "hwf_cxcy.npy"),
          np.array([orig_w, orig_w, 40.0, 40.0, 16.0, 16.0]))
  for i in range(n):
    imageio.imwrite(os.path.join(root, "images", f"{i:03d}.png"),
                    np.full((orig_w, orig_w, 3), 10 * i, np.uint8))
  assert loaders.kind_from_path(root) == "shiny"
  train = loaders.load(root, training=True, size=size)
  test = loaders.load(root, training=False, size=size)
  assert train.labels.shape == (7, size, size, 3)   # 9 - ceil(9/8) held out
  assert test.labels.shape == (2, size, size, 3)    # views 0 and 8
  np.testing.assert_allclose(test.labels[1], 80 / 255, atol=2 / 255)
  # focal rescaled: 40px at width 32 -> 20px at size 16
  np.testing.assert_allclose(float(train.camera.focal), 20.0, rtol=1e-6)
  # rotation survives the axis-order round trip; translation scales by
  # sc = 1/(0.75*near) = 1/1.5
  c2w = np.asarray(train.camera.cam_to_world)
  np.testing.assert_allclose(c2w[0, :3, :3], poses[1, :3, :3], atol=1e-5)
  np.testing.assert_allclose(c2w[0, :3, 3], poses[1, :3, 3] / 1.5,
                             atol=1e-5)
