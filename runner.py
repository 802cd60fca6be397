#!/usr/bin/env python3
"""nerf_atlas_tpu runner — the flag-driven CLI.

Capability parity with /root/reference/runner.py:37-438 (flag surface) and
:1236-1322 (main flow): load data → build model from registries → train →
test → optional render-over-time. Flags keep the reference's names where
they exist; everything resolves into an immutable config dumped to
log.json (the reference mutates args in place; we don't).

Example (procedural golden scene, no downloads needed):
  python runner.py -d synth --data-kind synthetic --model plain \
      --steps 64 --epochs 500 --size 64 --test-crop-size 32
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np


def arguments(argv=None):
  a = argparse.ArgumentParser(description="TPU-native nerf_atlas")
  a.add_argument("-d", "--data", default="", help="path to data")
  a.add_argument("--data-kind", default=None,
                 choices=[None, "original", "dnerf", "dtu", "nerv_point",
                          "single_video", "pixel-single", "synthetic",
                          "synthetic-dyn", "synthetic-lit"],
                 help="dataset loader (default: derived from path)")
  a.add_argument("--size", type=int, default=64, help="training image size")
  a.add_argument("--outdir", default="outputs")

  # model
  a.add_argument("--model", default="plain",
                 choices=["tiny", "plain", "ae", "coarse_fine", "volsdf",
                          "sdf", "voxel", "mpi", "rig", "spline", "hist",
                          "bendy", "recurrent", "pixel-single"])
  a.add_argument("--dyn-model", default=None,
                 choices=[None, "plain", "ae", "long", "rig", "voxel"])
  a.add_argument("--steps", type=int, default=64, help="samples per ray")
  a.add_argument("--near", type=float, default=2.0)
  a.add_argument("--far", type=float, default=6.0)
  a.add_argument("--lindisp", action="store_true",
                 help="sample linearly in disparity instead of depth")
  a.add_argument("--per-ray-jitter", action="store_true",
                 help="independent per-ray stratified sample jitter")
  a.add_argument("--mip", default=None, choices=[None, "cone", "cylinder"])
  a.add_argument("--sigmoid-kind", default="thin")
  a.add_argument("--bg", "--sky-kind", dest="sky_kind", default="black",
                 choices=["black", "white", "random", "mlp"])
  a.add_argument("--intermediate-size", type=int, default=32)
  a.add_argument("--density-noise", type=float, default=0.0)
  a.add_argument("--voxel-resolution", type=int, default=64)
  a.add_argument("--spline", type=int, default=0,
                 help="spline control points for dynamic models (0=direct)")
  a.add_argument("--long-vid-segments", type=int, default=4)
  a.add_argument("--long-vid-progressive-train", action="store_true",
                 help="train time windows sequentially (per-segment)")
  a.add_argument("--neural-upsample", action="store_true",
                 help="render low-res and neurally upsample")
  a.add_argument("--upsample-low-res", type=int, default=16)

  # reflectance / shading
  a.add_argument("--refl-kind", default="view",
                 choices=["pos", "view", "view-light", "pos-linear-view",
                          "basic", "diffuse", "cook-torrance", "rusin",
                          "rusin-helmholtz", "sph-har", "fourier",
                          "weighted", "alternating"])
  a.add_argument("--weighted-subrefl-kinds", nargs="+",
                 default=["diffuse", "rusin"],
                 help="sub-BRDFs for --refl-kind weighted")
  a.add_argument("--space-kind", default="identity",
                 choices=["identity", "surface", "none"])
  a.add_argument("--light-kind", default=None,
                 choices=[None, "point", "field", "dataset"])
  a.add_argument("--occ-kind", default=None,
                 choices=[None, "hard", "learned", "learned-const",
                          "all-learned", "joint-all-const"])
  a.add_argument("--integrator-kind", default=None,
                 choices=[None, "direct", "path"])

  # sdf
  a.add_argument("--sdf-kind", default="mlp",
                 choices=["mlp", "siren", "curl-mlp", "local", "spheres",
                          "triangles"])
  a.add_argument("--bound-sphere-rad", type=float, default=-1,
                 help=">0 bounds the SDF by a sphere of this radius")
  a.add_argument("--isect-kind", default="bisect",
                 choices=["bisect", "secant", "sphere"])

  # optimization
  a.add_argument("--epochs", type=int, default=1000,
                 help="training steps (ray batches)")
  a.add_argument("--batch-size", type=int, default=4096,
                 help="rays per step")
  a.add_argument("-lr", "--learning-rate", type=float, default=5e-4)
  a.add_argument("--opt-kind", default="adam",
                 choices=["adam", "adamw", "sgd", "rmsprop", "uniform_adam"])
  a.add_argument("--loss-fns", nargs="+", default=["l2"],
                 choices=["l2", "l1", "rmse", "fft", "ssim"])
  a.add_argument("--crop-size", type=int, default=0,
                 help="train on [V,c,c] image crops instead of flat ray "
                      "batches (auto-enabled for ssim/fft/style losses)")
  a.add_argument("--style-img", default=None,
                 help="style-transfer target image (enables style loss)")
  a.add_argument("--style-img-weight", type=float, default=1e-2)
  a.add_argument("--color-spaces", nargs="+", default=["rgb"],
                 choices=["rgb", "hsv", "luminance", "xyz"])
  a.add_argument("--tone-map", action="store_true")
  a.add_argument("--gamma-correct", action="store_true")
  a.add_argument("--no-sched", action="store_true")
  a.add_argument("--sched-min", type=float, default=5e-5)
  a.add_argument("--clip-gradients", type=float, default=0.0)
  a.add_argument("--opt-step", type=int, default=1,
                 help="gradient accumulation steps")
  a.add_argument("--seed", type=int, default=1337)
  a.add_argument("--duration-sec", type=float, default=0.0)
  a.add_argument("--inc-fourier-freqs", action="store_true",
                 help="grow Fourier encoder frequencies during training")
  a.add_argument("--time-gamma", type=float, default=1.0,
                 help="gamma-warp normalized times (dnerf loader)")

  # regularizers
  a.add_argument("--latent-l2-weight", type=float, default=0.0)
  a.add_argument("--eikonal-weight", type=float, default=0.0)
  a.add_argument("--dp-weight", type=float, default=0.0,
                 help="delta-x deformation magnitude reg")
  a.add_argument("--offset-decay", type=float, default=0.0,
                 help="NR-NeRF offset loss weight")
  a.add_argument("--rigidity-sparsity", type=float, default=0.0)
  a.add_argument("--tv-sigma", type=float, default=0.0)
  a.add_argument("--tv-refl", type=float, default=0.0)
  a.add_argument("--tv-bezier", type=float, default=0.0)
  a.add_argument("--tv-rigidity", type=float, default=0.0)
  a.add_argument("--weight-sparsity", type=float, default=0.0)
  a.add_argument("--volsdf-scale-decay", type=float, default=0.0)
  a.add_argument("--occ-decay-weight", type=float, default=0.0,
                 help="decay learned occlusion toward visible")
  a.add_argument("--smooth-normals-weight", type=float, default=0.0)
  a.add_argument("--smooth-surface-weight", type=float, default=0.0)
  a.add_argument("--smooth-occ-weight", type=float, default=0.0)
  a.add_argument("--view-variance-weight", type=float, default=0.0)
  a.add_argument("--eikonal-random-weight", type=float, default=0.0,
                 help="eikonal on uniform random points")
  a.add_argument("--dyn-divergence-weight", type=float, default=0.0,
                 help="FFJORD-style divergence of the deformation field")
  a.add_argument("--spline-length-weight", type=float, default=0.0)
  a.add_argument("--spline-pt0-weight", type=float, default=0.0)

  # reporting / io
  a.add_argument("--valid-freq", type=int, default=500)
  a.add_argument("--save-freq", type=int, default=1000)
  a.add_argument("--versioned-save", action="store_true")
  a.add_argument("--load", default=None, help="checkpoint to restore/graft")
  a.add_argument("--save-load-opt", action="store_true",
                 help="checkpoint and restore optimizer state too")
  a.add_argument("--cam-save-load", default=None,
                 help="path to save/restore the (trainable) camera")
  a.add_argument("--alt-train", type=int, default=0,
                 help=">0: toggle analytic/learned refl halves every N "
                      "steps (alternating reflectance)")
  a.add_argument("--replace", nargs="+", default=[],
                 help="submodule names to re-init on load (surgery), e.g. "
                      "refl sky_mlp occ")
  a.add_argument("--save", default=None, help="checkpoint path")
  a.add_argument("--notest", action="store_true")
  a.add_argument("--notraintest", action="store_true")
  a.add_argument("--test-crop-size", type=int, default=0,
                 help="eval render chunk (0 = whole image)")
  a.add_argument("--render-size", type=int, default=0,
                 help="eval render resolution (0 = dataset size)")
  a.add_argument("--depth-images", action="store_true",
                 help="save normalized depth maps at test time")
  a.add_argument("--normals-images", action="store_true",
                 help="save integrated normal maps at test time")
  a.add_argument("--flow-images", action="store_true",
                 help="save deformation magnitude maps (dynamic models)")
  a.add_argument("--rigidity-images", action="store_true",
                 help="save rigidity maps (dynamic models)")
  a.add_argument("--msssim-loss", action="store_true",
                 help="also report SSIM at test time")
  a.add_argument("--render-over-time", type=int, default=-1,
                 help=">=0: render this view over swept time")
  a.add_argument("--render-frames", type=int, default=24)
  a.add_argument("--num-views", type=int, default=8,
                 help="views for procedural synthetic data")

  # parallelism
  a.add_argument("--mesh-devices", type=int, default=0,
                 help="devices in the data mesh (0 = all)")

  # meta
  a.add_argument("--param-file", default=None,
                 help="JSON hyper-parameter file (overrides defaults)")
  a.add_argument("--train-parts", nargs="+", default=["all"],
                 choices=["all", "camera", "refl"],
                 help="which parameter groups to optimize")
  a.add_argument("--profile-dir", default=None,
                 help="capture a jax.profiler trace of the train loop")
  a.add_argument("--loss-window", type=int, default=50,
                 help="smoothing window for the loss plot")
  args = a.parse_args(argv)
  if args.param_file:
    from nerf_atlas_tpu.utils import load_param_file
    load_param_file(args.param_file).apply_to_args(args, parser=a,
                                                   argv=argv)
  return args


def build_model(args, dynamic: bool):
  from nerf_atlas_tpu import models
  common = dict(steps=args.steps, t_near=args.near, t_far=args.far,
                sky_kind=args.sky_kind, sigmoid_kind=args.sigmoid_kind,
                intermediate_size=args.intermediate_size,
                density_noise=args.density_noise,
                lindisp=args.lindisp, per_ray_jitter=args.per_ray_jitter)
  kind = args.model
  kwargs = dict(common)
  if kind in ("plain", "coarse_fine"):
    kwargs["refl_kind"] = args.refl_kind
    if kind == "plain":
      kwargs["mip"] = args.mip
      kwargs["refl_space"] = args.space_kind
      if args.refl_kind == "weighted":
        kwargs["refl_kwargs"] = {
            "subrefl_kinds": tuple(args.weighted_subrefl_kinds)}
  elif kind == "ae":
    kwargs["refl_kind"] = args.refl_kind
  elif kind == "volsdf":
    kwargs.update(sdf_kind=args.sdf_kind, refl_kind=args.refl_kind,
                  occ_kind=args.occ_kind,
                  integrator_kind=args.integrator_kind,
                  # "field" is a learned light module owned by the model;
                  # "point"/"dataset" lights ride the dataset instead
                  light_kind=("field" if args.light_kind == "field"
                              else None))
  elif kind == "sdf":
    kwargs = dict(sdf_kind=args.sdf_kind, refl_kind=args.refl_kind,
                  isect_kind=args.isect_kind, t_near=max(args.near - 2, 0.0),
                  t_far=args.far, sigmoid_kind=args.sigmoid_kind,
                  bounded=args.bound_sphere_rad > 0 or True,
                  bound_radius=(args.bound_sphere_rad
                                if args.bound_sphere_rad > 0 else 1.5))
  elif kind == "voxel":
    kwargs["resolution"] = args.voxel_resolution
    kwargs["refl_kind"] = ("pos" if args.refl_kind
                           not in ("pos", "pos-linear-view")
                           else args.refl_kind)
    kwargs.pop("intermediate_size", None)
  elif kind in ("rig",):
    kwargs["refl_kind"] = args.refl_kind
  elif kind == "pixel-single":
    # identity pinhole camera (the pixel-single loader's): uv derives
    # from ray directions inside the model
    kwargs.update(focal=args.size * 0.5, img_size=args.size,
                  canonical_kwargs={"refl_kind": args.refl_kind})
    kwargs.pop("intermediate_size", None)
    kwargs.pop("density_noise", None)

  if not dynamic or args.dyn_model is None:
    return models.load_model(kind, **{k: v for k, v in kwargs.items()
                                      if v is not None or k == "mip"})

  dyn_kwargs = dict(common)
  # only reflectance-bearing canonical models accept refl_kind
  canon_kwargs = ({"refl_kind": args.refl_kind}
                  if kind not in ("tiny", "mpi", "voxel") else {})
  if args.dyn_model == "plain":
    dyn_kwargs.update(canonical_kind=kind, spline_points=args.spline,
                      canonical_kwargs=canon_kwargs)
  elif args.dyn_model == "long":
    dyn_kwargs.update(canonical_kind=kind, segments=args.long_vid_segments,
                      canonical_kwargs=canon_kwargs)
  elif args.dyn_model == "voxel":
    dyn_kwargs.update(resolution=args.voxel_resolution,
                      spline_points=max(args.spline, 2))
    dyn_kwargs.pop("intermediate_size", None)
  elif args.dyn_model == "rig":
    dyn_kwargs.update(spline_points=max(args.spline, 2))
  return models.load_dyn_model(args.dyn_model, **dyn_kwargs)


def apply_light_kind(args, ds):
  """Resolve --light-kind against the dataset (reference semantics:
  lights participate only when the flag is set — runner.py:969-977,
  src/refl.py:45-47).
    dataset: loader-provided per-view lights (nerv_point / synthetic-lit)
    point:   a point light collocated with each view's camera
    field:   learned light module inside the model (no dataset lights)
  """
  if args.light_kind is None or args.light_kind == "field":
    return ds.replace(lights=None)
  if args.light_kind == "dataset":
    if ds.lights is None:
      raise ValueError("--light-kind dataset requires a dataset with "
                       "lights (nerv_point or synthetic-lit)")
    return ds
  if args.light_kind == "point":
    if ds.lights is not None:
      return ds
    from nerf_atlas_tpu.refl.lights import Point
    c2w = getattr(ds.camera, "cam_to_world", None)
    if c2w is None:
      c2w = ds.camera.pose  # DTUCamera
    origins = np.asarray(c2w[:, :3, 3])
    return ds.replace(lights=Point.make(origins, intensity=10.0))
  raise NotImplementedError(args.light_kind)


def main():
  args = arguments()
  from nerf_atlas_tpu.data import load, sampler
  from nerf_atlas_tpu.train import checkpoints, driver

  t0 = time.time()
  os.makedirs(args.outdir, exist_ok=True)

  load_kwargs = {}
  if args.data_kind in ("synthetic", "synthetic-dyn", "synthetic-lit"):
    load_kwargs["num_views"] = args.num_views
  if args.data_kind == "dnerf" and args.time_gamma != 1.0:
    load_kwargs["time_gamma"] = args.time_gamma
  bundle = load(args.data, data_kind=args.data_kind, training=True,
                size=args.size, **load_kwargs)
  ds = sampler.RayDataset.from_bundle(bundle, size=args.size)
  ds = apply_light_kind(args, ds)
  if args.cam_save_load and os.path.exists(args.cam_save_load):
    from nerf_atlas_tpu.train.checkpoints import load_camera
    ds = ds.replace(camera=load_camera(args.cam_save_load, ds.camera))
    print(f"[camera] restored from {args.cam_save_load}")
  dynamic = ds.times is not None
  if args.neural_upsample:
    return run_neural_upsample(args, ds)
  model = build_model(args, dynamic)

  extra_kwargs = None
  if args.model == "pixel-single":
    # conditioning image for the PixelNeRF path (uv derives from rays)
    extra_kwargs = {"image": ds.pixels[0][..., :3]}

  crop_size = args.crop_size
  if crop_size == 0 and (set(args.loss_fns) & {"ssim", "fft"}
                         or args.style_img):
    crop_size = 32  # image-structured losses need image-shaped batches

  cfg = driver.TrainConfig(
      steps=args.epochs, batch_size=args.batch_size,
      learning_rate=args.learning_rate, opt_kind=args.opt_kind,
      loss_kinds=tuple(args.loss_fns),
      color_spaces=tuple(args.color_spaces), tone_map=args.tone_map,
      gamma_correct=args.gamma_correct,
      reg_coeffs={
          "latent_l2": args.latent_l2_weight,
          "eikonal": args.eikonal_weight,
          "delta_x": args.dp_weight,
          "offset": args.offset_decay,
          "rigidity_sparsity": args.rigidity_sparsity,
          "tv_sigma": args.tv_sigma,
          "tv_refl": args.tv_refl,
          "tv_bezier": args.tv_bezier,
          "tv_rigidity": args.tv_rigidity,
          "weight_sparsity": args.weight_sparsity,
          "volsdf_scale": args.volsdf_scale_decay,
          "occ_decay": args.occ_decay_weight,
          "smooth_normals": args.smooth_normals_weight,
          "smooth_surface": args.smooth_surface_weight,
          "smooth_occ": args.smooth_occ_weight,
          "view_variance": args.view_variance_weight,
          "eikonal_random": args.eikonal_random_weight,
          "dyn_divergence": args.dyn_divergence_weight,
          "spline_length": args.spline_length_weight,
          "spline_pt0": args.spline_pt0_weight,
      },
      grad_clip=args.clip_gradients, accum_steps=args.opt_step,
      no_sched=args.no_sched, sched_min=args.sched_min, seed=args.seed,
      valid_freq=args.valid_freq, save_freq=args.save_freq,
      versioned_save=args.versioned_save,
      save_path=args.save or os.path.join(args.outdir, "model.ckpt"),
      duration_sec=args.duration_sec,
      train_camera="camera" in args.train_parts,
      train_only=("refl" if ("refl" in args.train_parts
                             and "all" not in args.train_parts) else None),
      profile_dir=args.profile_dir,
      save_load_opt=args.save_load_opt,
      alt_train=args.alt_train,
      inc_fourier_freqs=args.inc_fourier_freqs,
      crop_size=crop_size,
      style_img=args.style_img, style_weight=args.style_img_weight,
      use_mesh=args.mesh_devices != 1)

  config_dict = {**vars(args), "argv": sys.argv,
                 "timestamp": time.strftime("%Y-%m-%d %H:%M:%S")}
  with open(os.path.join(args.outdir, "log.json"), "w") as f:
    json.dump(config_dict, f, indent=2, default=str)

  params = None
  opt_saved = None
  if args.load:
    fresh = driver.init_model(model, ds, cfg.seed, extra_kwargs)
    params, info = checkpoints.restore_or_graft(args.load, fresh,
                                                replace=args.replace)
    if args.save_load_opt:
      opt_saved = info.get("opt_state")
    print(f"[load] restored {len(info['restored'])} tensors, "
          f"re-initialized {len(info['skipped'])} (step {info['step']})")

  if args.epochs > 0:
    def log_cb(m):
      psnr = m.get("psnr", -10 * np.log10(max(m.get("mse", 1e-10), 1e-10)))
      print(f"step {m['step']:6d}  loss {m['loss']:.5f}  "
            f"psnr {psnr:.2f}  ({time.time() - t0:.0f}s)")
    if args.long_vid_progressive_train and dynamic:
      params, _, history = driver.train_progressive(
          model, ds, cfg, segments=args.long_vid_segments, params=params,
          config_dict=config_dict, callback=log_cb)
    else:
      params, _, history = driver.train(model, ds, cfg, params=params,
                                        config_dict=config_dict,
                                        callback=log_cb,
                                        extra_kwargs=extra_kwargs,
                                        opt_state_saved=opt_saved)
    if history:
      driver.plot_history(history, os.path.join(args.outdir, "loss.png"),
                          window=args.loss_window)
    if cfg.train_camera:
      # rebind the dataset to the trained camera for eval rendering
      ds = ds.replace(camera=params["camera"])
      params = params["model"]
    if args.cam_save_load:
      from nerf_atlas_tpu.train.checkpoints import save_camera
      save_camera(args.cam_save_load, ds.camera)
  elif params is None:
    params = driver.init_model(model, ds, cfg.seed, extra_kwargs)

  extra_maps = tuple(
      m for m, on in [("normals", args.normals_images),
                      ("flow", args.flow_images),
                      ("rigidity", args.rigidity_images)] if on)

  results = {}
  if not args.notraintest:
    results["train"] = driver.test(
        model, params, ds, out_dir=os.path.join(args.outdir, "train"),
        render_size=args.render_size or None, with_ssim=args.msssim_loss,
        save_depth=args.depth_images, extra_kwargs=extra_kwargs,
        extra_maps=extra_maps,
        chunk=(args.test_crop_size ** 2 if args.test_crop_size else 65536))
    print("[train]", results["train"]["summary"])
  if not args.notest:
    tb = load(args.data, data_kind=args.data_kind, training=False,
              size=args.size, **load_kwargs)
    tds = sampler.RayDataset.from_bundle(tb, size=args.size)
    tds = apply_light_kind(args, tds)
    results["test"] = driver.test(
        model, params, tds, out_dir=os.path.join(args.outdir, "test"),
        render_size=args.render_size or None, with_ssim=args.msssim_loss,
        save_depth=args.depth_images, extra_kwargs=extra_kwargs,
        extra_maps=extra_maps,
        chunk=(args.test_crop_size ** 2 if args.test_crop_size else 65536))
    print("[test]", results["test"]["summary"])

  if args.render_over_time >= 0 and dynamic:
    frames = driver.render_over_time(model, params, ds,
                                     view=args.render_over_time,
                                     frames=args.render_frames)
    import imageio.v2 as imageio
    vid_path = os.path.join(args.outdir, "over_time.gif")
    imageio.mimwrite(vid_path,
                     (np.clip(frames[..., :3], 0, 1) * 255).astype("uint8"))
    print(f"[time] wrote {vid_path}")
  return results


def run_neural_upsample(args, ds):
  """--neural-upsample: train on whole low-res views, neurally upsampled
  to the dataset resolution (reference runner.py:1195-1204 semantics)."""
  import jax
  import jax.numpy as jnp
  import optax
  from nerf_atlas_tpu import models
  from nerf_atlas_tpu.train import checkpoints, driver

  lo = args.upsample_low_res
  model = models.NeuralUpsampled(
      low_res=lo, out_res=args.size, steps=args.steps, t_near=args.near,
      t_far=args.far, sky_kind=args.sky_kind,
      canonical_kind=args.model if args.model != "pixel-single" else "plain",
      canonical_kwargs=({} if args.model in ("tiny", "mpi", "voxel")
                        else {"refl_kind": args.refl_kind}))
  rays0 = ds.view_rays(0, lo).reshape(1, lo, lo, 6)
  params = model.init({"params": jax.random.PRNGKey(args.seed),
                       "sampler": jax.random.PRNGKey(args.seed + 1)},
                      rays0, train=True)
  tx = optax.adam(args.learning_rate)
  opt_state = tx.init(params)

  @jax.jit
  def step(params, opt_state, key):
    k1, k2 = jax.random.split(key)
    v = jax.random.randint(k1, (), 0, ds.num_views)
    rays = ds.view_rays(v, lo).reshape(1, lo, lo, 6)
    target = ds.pixels[v][..., :3][None]

    def loss_fn(p):
      out = model.apply(p, rays, train=True, rngs={"sampler": k2})
      return jnp.mean((out["rgb"] - target) ** 2)

    loss, g = jax.value_and_grad(loss_fn)(params)
    up, opt_state2 = tx.update(g, opt_state)
    return optax.apply_updates(params, up), opt_state2, loss

  key = jax.random.PRNGKey(args.seed + 7)
  for i in range(args.epochs):
    key, k = jax.random.split(key)
    params, opt_state, loss = step(params, opt_state, k)
    if (i + 1) % 50 == 0 or i == 0:
      print(f"step {i+1:6d}  loss {float(loss):.5f}")
  path = args.save or os.path.join(args.outdir, "model.ckpt")
  checkpoints.save(path, params, config=vars(args), step=args.epochs)

  # eval: render every view upsampled, report PSNR
  psnrs = []
  for v in range(ds.num_views):
    rays = ds.view_rays(v, lo).reshape(1, lo, lo, 6)
    img = np.asarray(model.apply(params, rays)["rgb"][0])
    ref = np.asarray(ds.pixels[v][..., :3])
    mse = float(np.mean((img - ref) ** 2))
    psnrs.append(-10 * np.log10(max(mse, 1e-10)))
  print(f"[upsample] PSNR mean {np.mean(psnrs):.3f} over {len(psnrs)} views")
  return {"psnr_mean": float(np.mean(psnrs))}


if __name__ == "__main__":
  main()
