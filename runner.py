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
import math
import os
import sys
import time

import numpy as np


def arguments(argv=None):
  a = argparse.ArgumentParser(description="TPU-native nerf_atlas")
  a.add_argument("-d", "--data", default="", help="path to data")
  a.add_argument("--data-kind", default=None,
                 choices=[None, "original", "dnerf", "dtu", "nerv_point",
                          "shiny", "single_video", "pixel-single", "synthetic",
                          "synthetic-dyn", "synthetic-lit", "synthetic-ff"],
                 help="dataset loader (default: derived from path)")
  a.add_argument("--derive-kind", action="store_false",
                 help="allow deriving the data kind from the path "
                      "(pass to require an explicit --data-kind)")
  a.add_argument("--size", type=int, default=64, help="training image size")
  a.add_argument("--train-imgs", type=int, default=-1,
                 help="limit the number of training views")
  a.add_argument("--outdir", default="outputs")
  a.add_argument("--timed-outdir", action="store_true",
                 help="append date+time of the run to --outdir")
  a.add_argument("--name", default="",
                 help="display name recorded in the log file")

  # model
  a.add_argument("--model", default="plain",
                 choices=["tiny", "plain", "ae", "coarse_fine", "volsdf",
                          "sdf", "voxel", "mpi", "rig", "spline", "hist",
                          "bendy", "recurrent", "pixel-single"])
  a.add_argument("--bendy", action="store_true",
                 help="curved rays through a learned IOR field "
                      "(shorthand for --model bendy)")
  a.add_argument("--dyn-model", default=None,
                 choices=[None, "plain", "ae", "long", "rig", "voxel"])
  a.add_argument("--with-canon", default=None,
                 help="checkpoint to preload as the canonical model of a "
                      "dynamic wrapper")
  a.add_argument("--fix-canon", action="store_true",
                 help="freeze the canonical model while training the warp")
  a.add_argument("--dyn-refl-latent", type=int, default=0,
                 help="latent size passed from the deformation to the "
                      "canonical reflectance")
  a.add_argument("--steps", type=int, default=64, help="samples per ray")
  a.add_argument("--near", type=float, default=2.0)
  a.add_argument("--far", type=float, default=6.0)
  a.add_argument("--lindisp", action="store_true",
                 help="sample linearly in disparity instead of depth")
  a.add_argument("--per-ray-jitter", action="store_true",
                 help="independent per-ray stratified sample jitter")
  a.add_argument("--mip", default=None, choices=[None, "cone", "cylinder"])
  a.add_argument("--enc-kind", default="cp",
                 choices=["cp", "hash", "posenc", "ref-hash"],
                 help="plain-NeRF spatial encoder (cp = TPU-native "
                      "factorized volume, the fused-kernel fast path; "
                      "ref-hash = the reference's exact hash grid incl. "
                      "its descending-resolution schedule bug, for "
                      "parity diagnosis)")
  a.add_argument("--hash-table-log2", type=int, default=19,
                 help="hash-grid entries per level = 2^N (19 = the "
                      "reference default; <=16 engages the fused "
                      "one-hot MXU lookup kernel — 14 is the TPU-fast "
                      "config)")
  a.add_argument("--sigmoid-kind", default="thin")
  a.add_argument("--bg", "--sky-kind", dest="sky_kind", default="black",
                 choices=["black", "white", "random", "mlp"])
  a.add_argument("--intermediate-size", "--shape-to-refl-size",
                 dest="intermediate_size", type=int, default=32,
                 help="feature width passed from density to reflectance")
  a.add_argument("--encoding-size", type=int, default=32,
                 help="latent size of the auto-encoded NeRF (--model ae)")
  a.add_argument("--normalize-latent", action="store_true",
                 help="L2-normalize the AE latent")
  a.add_argument("--rig-points", type=int, default=32,
                 help="number of rig points (--model rig)")
  a.add_argument("--density-noise", type=float, default=0.0)
  a.add_argument("--voxel-resolution", type=int, default=64)
  a.add_argument("--spline", type=int, default=0,
                 help="spline control points for dynamic models (0=direct)")
  a.add_argument("--long-vid-segments", type=int, default=4)
  a.add_argument("--long-vid-progressive-train", type=int, nargs="?",
                 const=-1, default=0,
                 help="train time chunks sequentially; the optional int "
                      "is the chunk count (reference runner.py:322-325), "
                      "bare flag defers to --long-vid-segments/"
                      "--long-vid-chunk-len-sec")
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
  a.add_argument("--refl-order", type=int, default=2,
                 help="order for spherical-harmonic & Fourier-basis BRDFs")
  a.add_argument("--refl-bidirectional", action="store_true",
                 help="allow flipped normals in the diffuse BRDF")
  a.add_argument("--normal-kind", default="raw",
                 choices=["none", "elaz", "raw"],
                 help="how normals enter the 'basic' reflectance")
  a.add_argument("--feature-space", type=int, default=3,
                 help="reflectance output feature size (neural upsampling "
                      "renders features instead of RGB)")
  a.add_argument("--light-kind", default=None,
                 choices=[None, "point", "field", "dataset"])
  a.add_argument("--light-intensity", type=float, default=100.0,
                 help="intensity of dataset/point lights")
  a.add_argument("--point-light-position", type=float, nargs="+",
                 default=[0.0, 0.0, -3.0],
                 help="world position for --light-kind point (default: "
                      "collocate with each view's camera)")
  a.add_argument("--has-multi-light", action="store_true",
                 help="nerv_point: also evaluate the multi-point-light "
                      "test split")
  a.add_argument("--occ-kind", default=None,
                 choices=[None, "hard", "learned", "learned-const",
                          "all-learned", "joint-all-const"])
  a.add_argument("--all-learned-occ-kind", default="pos",
                 choices=["pos", "pos-elaz"],
                 help="inputs of the all-learned occlusion MLP")
  a.add_argument("--integrator-kind", default=None,
                 choices=[None, "direct", "path"])

  # checkpoint surgery / conversions (reference set_per_run,
  # runner.py:1041-1170)
  a.add_argument("--volsdf-direct-to-path", action="store_true",
                 help="convert a loaded direct-integration VolSDF to the "
                      "one-bounce path integrator")
  a.add_argument("--volsdf-alternate", action="store_true",
                 help="alternate volume/surface supervision for VolSDF "
                      "(sets --alt-train cadence on the sdf/volume halves)")
  a.add_argument("--all-learned-to-joint", action="store_true",
                 help="convert a loaded all-learned occlusion into the "
                      "joint learned+raycast-const kind")
  a.add_argument("--convert-analytic-to-alt", action="store_true",
                 help="wrap a loaded analytic (diffuse) BRDF into the "
                      "alternating analytic/learned optimization")
  a.add_argument("--autogamma-correct-loss", action="store_true",
                 help="infer the loss gamma from the dataset mean "
                      "luminance (imagick autogamma rule)")

  # sdf
  a.add_argument("--sdf-kind", default="mlp",
                 choices=["mlp", "siren", "curl-mlp", "local", "spheres",
                          "triangles"])
  a.add_argument("--bound-sphere-rad", type=float, default=-1,
                 help=">0 bounds the SDF by a sphere of this radius")
  a.add_argument("--isect-kind", "--sdf-isect-kind", dest="isect_kind",
                 default="bisect", choices=["bisect", "secant", "sphere"])
  a.add_argument("--sphere-init", dest="sphere_init", action="store_true",
                 default=True,
                 help="initialize the SDF to a unit sphere (analytic "
                      "bias; on by default)")
  a.add_argument("--no-sphere-init", dest="sphere_init",
                 action="store_false")

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
  a.add_argument("--gamma-correct", action="store_true",
                 help="gamma-correct the loss at 2.2 (shorthand for "
                      "--gamma-correct-loss 2.2)")
  a.add_argument("--gamma-correct-loss", type=float, default=1.0,
                 help="gamma correct the training loss by this exponent")
  a.add_argument("--decay", type=float, default=0.0,
                 help="optimizer weight decay")
  a.add_argument("--no-sched", action="store_true")
  a.add_argument("--sched-min", type=float, default=5e-5)
  a.add_argument("--clip-gradients", type=float, default=0.0)
  a.add_argument("--opt-step", type=int, default=1,
                 help="gradient accumulation steps")
  a.add_argument("--seed", type=int, default=1337)
  a.add_argument("--duration-sec", type=float, default=0.0)
  a.add_argument("--inc-fourier-freqs", action="store_true",
                 help="grow Fourier encoder frequencies during training")
  a.add_argument("--time-gamma", action="store_true",
                 help="apply the time-conditioned image gamma exp(2t-1) "
                      "(dnerf loader; reference src/loaders.py:148)")
  a.add_argument("--serial-idxs", action="store_true",
                 help="train on views in serial (view = step %% N)")
  a.add_argument("--higher-end-chance", type=int, default=0,
                 help="extra draws of the first/last view per batch "
                      "(dynamic scenes: anchor the endpoints)")
  a.add_argument("--omit-bg", action="store_true",
                 help="skip mostly-background batches with some "
                      "probability (focus on the subject)")
  a.add_argument("--skip-loss", type=int, default=0,
                 help="suppress loss reporting for the first N steps")
  a.add_argument("--torchjit", action="store_true",
                 help="no-op: the XLA jit is always on (flag kept for "
                      "reference recipe compatibility)")
  a.add_argument("--debug-nans", action="store_true",
                 help="enable jax_debug_nans (traps the first NaN at its "
                      "producing op; SURVEY §5 sanitizer)")
  a.add_argument("--data-parallel", action="store_true",
                 help="no-op unless --mesh-devices 1 was set: ray batches "
                      "data-parallel over the device mesh by default")
  a.add_argument("--no-fused", action="store_true",
                 help="force the XLA-oracle train path even where a fused "
                      "Pallas kernel would auto-engage (A/B switch for "
                      "kernel-vs-recipe attribution); the engaged path is "
                      "recorded in log.json either way")

  # regularizers (reference flag names kept as aliases of the -weight
  # spellings introduced in round 1)
  a.add_argument("--latent-l2-weight", type=float, default=0.0)
  a.add_argument("--eikonal-weight", "--sdf-eikonal", dest="eikonal_weight",
                 type=float, default=0.0)
  a.add_argument("--surface-eikonal", type=float, default=0.0,
                 help="eikonal on surface-intersection points")
  a.add_argument("--dp-weight", "--delta-x-decay", dest="dp_weight",
                 type=float, default=0.0,
                 help="delta-x deformation magnitude reg")
  a.add_argument("--offset-decay", type=float, default=0.0,
                 help="NR-NeRF offset loss weight")
  a.add_argument("--rigidity-sparsity", type=float, default=0.0)
  a.add_argument("--tv-sigma", "--voxel-tv-sigma", dest="tv_sigma",
                 type=float, default=0.0)
  a.add_argument("--tv-refl", "--voxel-tv-rgb", dest="tv_refl",
                 type=float, default=0.0)
  a.add_argument("--tv-bezier", "--voxel-tv-bezier", dest="tv_bezier",
                 type=float, default=0.0)
  a.add_argument("--tv-rigidity", "--voxel-tv-rigidity",
                 dest="tv_rigidity", type=float, default=0.0)
  a.add_argument("--weight-sparsity", type=float, default=0.0)
  a.add_argument("--volsdf-scale-decay", type=float, default=0.0)
  a.add_argument("--occ-decay-weight", "--decay-all-learned-occ",
                 dest="occ_decay_weight", type=float, default=0.0,
                 help="decay learned occlusion toward visible")
  a.add_argument("--smooth-normals-weight", "--smooth-normals",
                 dest="smooth_normals_weight", type=float, default=0.0)
  a.add_argument("--smooth-surface-weight", "--smooth-surface",
                 dest="smooth_surface_weight", type=float, default=0.0)
  a.add_argument("--smooth-occ-weight", "--smooth-occ",
                 dest="smooth_occ_weight", type=float, default=0.0)
  a.add_argument("--smooth-eps", type=float, default=1e-3,
                 help="perturbation radius for the smoothness regs")
  a.add_argument("--smooth-eps-rng", action="store_true",
                 help="random perturbation radius instead of fixed")
  a.add_argument("--smooth-n-ord", nargs="+", type=int, default=[2],
                 choices=[1, 2],
                 help="vector norm order(s) for normal smoothing")
  a.add_argument("--view-variance-weight", "--view-variance-decay",
                 dest="view_variance_weight", type=float, default=0.0)
  a.add_argument("--eikonal-random-weight", type=float, default=0.0,
                 help="eikonal on uniform random points")
  a.add_argument("--dyn-divergence-weight", "--dyn-diverge-decay",
                 dest="dyn_divergence_weight", type=float, default=0.0,
                 help="divergence of the deformation field")
  a.add_argument("--ffjord-div-decay", type=float, default=0.0,
                 help="FFJORD stochastic divergence of the deformation "
                      "field, ramped in over training")
  a.add_argument("--spline-length-weight", "--spline-len-decay",
                 dest="spline_length_weight", type=float, default=0.0)
  a.add_argument("--spline-pt0-weight", "--spline-pt0-decay",
                 dest="spline_pt0_weight", type=float, default=0.0)
  a.add_argument("--random-spline-len-decay", type=float, default=0.0,
                 help="spline length on randomly sampled points")
  a.add_argument("--voxel-random-spline-len-decay", type=float,
                 default=0.0,
                 help="spline length on random voxel-grid chunks")

  # reporting / io
  a.add_argument("--valid-freq", type=int, default=500)
  a.add_argument("--save-freq", type=int, default=1000)
  a.add_argument("--versioned-save", action="store_true")
  a.add_argument("--nosave", action="store_true", help="do not checkpoint")
  a.add_argument("--log", default="log.json",
                 help="file name for the resolved-config dump")
  a.add_argument("--load", default=None, help="checkpoint to restore/graft")
  a.add_argument("--ref-compat", action="store_true",
                 help="build the model at the PyTorch reference's native "
                      "architecture dims so checkpoints imported by "
                      "scripts/import_reference_ckpt.py graft exactly")
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
  a.add_argument("--flow-images", "--flow-map", dest="flow_images",
                 action="store_true",
                 help="save deformation magnitude maps (dynamic models)")
  a.add_argument("--rigidity-images", "--rigidity-map",
                 dest="rigidity_images", action="store_true",
                 help="save rigidity maps (dynamic models)")
  a.add_argument("--visualize", nargs="*", default=[],
                 choices=["depth", "normals", "flow", "rigidity"],
                 help="shorthand list form of the *-images flags")
  a.add_argument("--normals-from-depth", action="store_true",
                 help="extra normal maps from depth finite differences")
  a.add_argument("--depth-query-normal", action="store_true",
                 help="extra normal maps by querying SDF normals at the "
                      "termination depth")
  a.add_argument("--draw-colormap", action="store_true",
                 help="colormap the depth/extra maps")
  a.add_argument("--plt-cmap-kind", default="magma",
                 help="matplotlib colormap for --draw-colormap")
  a.add_argument("--with-alpha", action="store_true",
                 help="save test renders as RGBA (alpha = opacity)")
  a.add_argument("--test-white-bg", action="store_true",
                 help="composite masked references over white at test")
  a.add_argument("--exp-bg", action="store_true",
                 help="multiply saved test images by the label mask "
                      "(visualization only)")
  a.add_argument("--render-frame", type=int, default=-1,
                 help=">=0: test only this view")
  a.add_argument("--cluster-movement", type=int, default=0,
                 help=">0: save a k-means clustering of the deformation "
                      "field (dynamic models)")
  a.add_argument("--display-regularization", action="store_true",
                 help="print the regularization component of the loss")
  a.add_argument("--display-smoothness", action="store_true",
                 help="print smoothness regularizer values (alias of "
                      "--display-regularization: both show loss - mse)")
  a.add_argument("--y-scale", default="log",
                 choices=["linear", "log", "symlog", "logit"],
                 help="y scale of the loss plot")
  a.add_argument("--msssim-loss", action="store_true",
                 help="also report MS-SSIM at test time")
  a.add_argument("--render-over-time", type=int, default=-1,
                 help=">=0: render this view over swept time")
  a.add_argument("--render-frames", "--render-over-time-steps",
                 dest="render_frames", type=int, default=24)
  a.add_argument("--render-over-time-end-sec", type=float, default=1.0,
                 help="end of the swept time range")
  a.add_argument("--render-bezier-keyframes", action="store_true",
                 help="also render the spline keyframe times")
  a.add_argument("--num-views", type=int, default=8,
                 help="views for procedural synthetic data")

  # video
  a.add_argument("--start-sec", type=float, default=0.0,
                 help="start load time of a video dataset")
  a.add_argument("--end-sec", type=float, default=None,
                 help="end load time of a video dataset")
  a.add_argument("--long-vid-chunk-len-sec", type=float, default=None,
                 help="chunk length in seconds for progressive long-video "
                      "training (overrides --long-vid-segments)")
  a.add_argument("--static-vid-cam-angle-deg", type=float, default=40.0,
                 help="FOV for the static video camera")

  # parallelism
  a.add_argument("--mesh-devices", type=int, default=0,
                 help="devices in the data mesh (0 = all)")
  a.add_argument("--model-parallel", type=int, default=1,
                 help=">1: 2-D (data × model) mesh; large parameter "
                      "tensors (voxel grids, hash tables) shard over the "
                      "model axis (device_count must divide evenly)")

  # meta
  a.add_argument("--param-file", default=None,
                 help="JSON hyper-parameter file (overrides defaults)")
  a.add_argument("--train-parts", nargs="+", default=["all"],
                 choices=["all", "camera", "refl", "occ", "path-tf"],
                 help="which parameter groups to optimize (reference "
                      "runner.py:94-97; path-tf selects the refl group — "
                      "in this design the one-bounce transfer folds "
                      "through the BRDF itself, models/volsdf.py)")
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


def _refl_kwargs(args):
  """Per-kind BRDF knobs from flags (--refl-order / --refl-bidirectional /
  --normal-kind / --weighted-subrefl-kinds)."""
  rk = {}
  if args.refl_kind == "sph-har":
    rk["degree"] = args.refl_order
  elif args.refl_kind == "fourier":
    rk["order"] = max(args.refl_order, 2)
  elif args.refl_kind == "diffuse":
    rk["bidirectional"] = args.refl_bidirectional
  elif args.refl_kind == "basic":
    rk["normal_kind"] = (None if args.normal_kind == "none"
                         else args.normal_kind)
  elif args.refl_kind == "weighted":
    rk["subrefl_kinds"] = tuple(args.weighted_subrefl_kinds)
  return rk


def build_model(args, dynamic: bool):
  from nerf_atlas_tpu import models
  common = dict(steps=args.steps, t_near=args.near, t_far=args.far,
                sky_kind=args.sky_kind, sigmoid_kind=args.sigmoid_kind,
                intermediate_size=args.intermediate_size,
                density_noise=args.density_noise,
                lindisp=args.lindisp, per_ray_jitter=args.per_ray_jitter)
  kind = args.model
  refl_kwargs = _refl_kwargs(args)
  kwargs = dict(common)
  if kind in ("plain", "coarse_fine"):
    kwargs["refl_kind"] = args.refl_kind
    # --mip / --enc-kind apply to BOTH plain and coarse_fine (the
    # reference's coarse_fine is a CommonNeRF with the same encoder
    # surface; round 5 fix — these silently stayed at the model
    # defaults for coarse_fine, so `--model coarse_fine --mip cone`
    # trained a no-mip hash model on the oracle path)
    kwargs["mip"] = args.mip
    kwargs["enc_kind"] = args.enc_kind
    if kind == "plain":
      kwargs["refl_space"] = args.space_kind
      if args.enc_kind == "hash" and args.hash_table_log2 != 19:
        kwargs["enc_kwargs"] = dict(table_size=1 << args.hash_table_log2)
      if refl_kwargs:
        kwargs["refl_kwargs"] = refl_kwargs
      if args.ref_compat:
        # the reference's native dims, so checkpoints imported by
        # scripts/import_reference_ckpt.py graft exactly (ref
        # src/nerf.py:320-324 density 4x256 hash; src/refl.py:190-207
        # View 4x256 plain-sin)
        kwargs["enc_kind"] = "ref-hash"
        kwargs["mlp_kwargs"] = dict(num_layers=4, hidden_size=256)
        kwargs["refl_kwargs"] = dict(refl_kwargs or {}, hidden_size=256,
                                     num_layers=4, siren_w0=1.0)
  elif kind == "ae":
    kwargs.update(refl_kind=args.refl_kind,
                  encoding_size=args.encoding_size,
                  normalize_latent=args.normalize_latent)
    if args.ref_compat:
      # ref src/nerf.py:784-793 + src/refl.py:190-207 native dims.
      # sigma: the reference's fourier map is x @ (32·randn) with NO 2π
      # (src/utils.py:10-17) while our encoder applies 2π (the fused
      # kernels bake it in; the ckpt importer divides imported bases by
      # 2π to match) — so from-scratch ref-compat draws B at 32/2π for
      # the SAME effective spectrum. Without this the encoder's
      # bandwidth is 6.3x the reference's and few-view novel-pose PSNR
      # collapses (measured: PARITY_E2E ae, round 5).
      from nerf_atlas_tpu.nn import FourierEncoder
      kwargs.update(
          enc_mlp_kwargs=dict(enc=FourierEncoder(
              input_dims=3, freqs=128, sigma=32 / (2 * math.pi)),
              num_layers=5, hidden_size=128, skip=3),
          density_mlp_kwargs=dict(num_layers=5, hidden_size=64, skip=3),
          refl_kwargs=dict(hidden_size=256, num_layers=4, siren_w0=1.0))
  elif kind == "volsdf":
    kwargs.update(sdf_kind=args.sdf_kind, refl_kind=args.refl_kind,
                  occ_kind=args.occ_kind,
                  integrator_kind=args.integrator_kind,
                  # "field" is a learned light module owned by the model;
                  # "point"/"dataset" lights ride the dataset instead
                  light_kind=("field" if args.light_kind == "field"
                              else None),
                  refl_kwargs=refl_kwargs or None,
                  # eikonal regularizers read out["eikonal"], which the
                  # model only emits when it computes normals — without
                  # this the flags were silent no-ops for view-refl volsdf
                  with_normals=(args.eikonal_weight > 0
                                or args.surface_eikonal > 0),
                  sdf_kwargs=(
                      # reference-native MLP SDF spectrum: 128 freqs at
                      # effective sigma 16 (ref src/sdf.py:250-258; our
                      # encoder applies 2π so sigma = 16/2π draws the
                      # same distribution — models/sdf.py:MLP note).
                      # The reference recipe also does NOT sphere-init
                      # (--sphere-init is opt-in upstream, sdf.py:21).
                      {"sphere_init": False, "enc_freqs": 128,
                       "enc_sigma": 16 / (2 * math.pi)}
                      if args.ref_compat and args.sdf_kind in
                      ("mlp", "curl-mlp")
                      else {"sphere_init": args.sphere_init}),
                  # reference scale dynamics: raw IS the scale
                  # (models/volsdf.py scale_kind note)
                  **({"scale_kind": "ident"} if args.ref_compat else {}),
                  occ_kwargs=(
                      {"use_dir": args.all_learned_occ_kind == "pos-elaz"}
                      if args.occ_kind in ("all-learned", "joint-all-const")
                      else None))
  elif kind == "sdf":
    kwargs = dict(sdf_kind=args.sdf_kind, refl_kind=args.refl_kind,
                  isect_kind=args.isect_kind, t_near=max(args.near - 2, 0.0),
                  t_far=args.far, sigmoid_kind=args.sigmoid_kind,
                  bounded=args.bound_sphere_rad > 0 or True,
                  bound_radius=(args.bound_sphere_rad
                                if args.bound_sphere_rad > 0 else 1.5),
                  refl_kwargs=refl_kwargs or None,
                  sdf_kwargs={"sphere_init": args.sphere_init})
  elif kind == "voxel":
    kwargs["resolution"] = args.voxel_resolution
    kwargs["refl_kind"] = ("pos" if args.refl_kind
                           not in ("pos", "pos-linear-view")
                           else args.refl_kind)
    kwargs.pop("intermediate_size", None)
  elif kind in ("rig",):
    kwargs["refl_kind"] = args.refl_kind
    kwargs["n_points"] = args.rig_points
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
  if kind == "plain":
    canon_kwargs["enc_kind"] = args.enc_kind
  if args.dyn_model == "plain":
    dyn_kwargs.update(canonical_kind=kind, spline_points=args.spline,
                      canonical_kwargs=canon_kwargs,
                      time_latent_size=args.dyn_refl_latent)
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
    point:   a point light at --point-light-position (or collocated with
             each view's camera when the default sentinel is kept)
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
    pos = list(args.point_light_position)
    if pos != [0.0, 0.0, -3.0]:      # explicit world-space light
      origins = np.tile(np.asarray(pos, np.float32)[None], (ds.num_views, 1))
    else:                            # default: collocate with the cameras
      c2w = getattr(ds.camera, "cam_to_world", None)
      if c2w is None:
        c2w = ds.camera.pose  # DTUCamera
      origins = np.asarray(c2w[:, :3, 3])
    return ds.replace(lights=Point.make(origins,
                                        intensity=args.light_intensity))
  raise NotImplementedError(args.light_kind)


def set_per_run(args, ds):
  """Checkpoint-surgery conversions + flag validation (the reference's
  set_per_run, runner.py:1041-1170). Mutates args BEFORE model
  construction (our models are immutable config + pytree params; a
  conversion = build the new config, then graft the old checkpoint with
  `remaps` moving renamed subtrees). Returns the graft remap list."""
  remaps = []
  if args.volsdf_direct_to_path:
    assert args.model == "volsdf", "--volsdf-direct-to-path needs volsdf"
    if args.integrator_kind == "path":
      print("[note]: model already uses path integration, nothing changed")
    else:
      print("[note]: converting VolSDF direct integration to path")
      args.integrator_kind = "path"
  if args.all_learned_to_joint:
    if args.occ_kind == "joint-all-const":
      print("[note]: occlusion already joint-all-const, nothing changed")
    else:
      assert args.occ_kind == "all-learned", \
          "--all-learned-to-joint needs --occ-kind all-learned"
      print("[note]: converting occlusion to joint learned+const")
      args.occ_kind = "joint-all-const"
      # the old AllLearnedOcc params nest under occ/all_learned in the
      # joint module (reference runner.py:1095-1101 keeps `alo`)
      remaps.append((("params", "occ"),
                     ("params", "occ", "all_learned")))
  if args.convert_analytic_to_alt:
    if args.refl_kind == "alternating":
      print("[note]: redundant alternating optimization, ignoring")
    else:
      assert args.refl_kind == "diffuse", \
          "--convert-analytic-to-alt wraps an analytic (diffuse) BRDF"
      print("[note]: wrapping analytic BRDF in alternating optimization")
      args.refl_kind = "alternating"
      remaps.append((("params", "refl"),
                     ("params", "refl", "analytic")))
  if args.autogamma_correct_loss:
    # imagick autogamma: gamma = log(0.5) / log(mean) (reference
    # runner.py:1159-1170, clamped/specialized the same way)
    import math
    mean = float(np.mean(np.asarray(ds.pixels[..., :3])))
    weight = max(math.log(0.5) / math.log(max(mean, 1e-6)), 0.0)
    if weight < 0.55:
      weight = 0.5
    if weight >= 0.9:
      print(f"[note]: autogamma would darken/hardly change ({weight:.3f}),"
            " ignoring")
    else:
      args.gamma_correct_loss = weight
      print(f"[note]: autogamma correction weight: {weight:.3f}")

  # flag validation / zeroing (reference runner.py:1103-1158)
  def zero(flag, why):
    if getattr(args, flag) > 0:
      print(f"[warn]: zeroing --{flag.replace('_', '-')}: {why}")
      setattr(args, flag, 0.0)

  if args.model != "volsdf":
    zero("volsdf_scale_decay", "model is not volsdf")
  if args.model not in ("volsdf", "sdf"):
    zero("eikonal_weight", "model has no SDF")
    zero("eikonal_random_weight", "model has no SDF")
    zero("surface_eikonal", "model has no SDF")
    zero("smooth_surface_weight", "model has no SDF")
  if args.occ_kind not in ("all-learned", "joint-all-const"):
    zero("smooth_occ_weight", "occlusion is not (all-)learned")
    zero("occ_decay_weight", "occlusion is not all-learned")
  if args.dyn_model is None:
    for f in ("dp_weight", "dyn_divergence_weight", "ffjord_div_decay",
              "offset_decay", "rigidity_sparsity",
              "spline_length_weight", "spline_pt0_weight",
              "random_spline_len_decay", "voxel_random_spline_len_decay"):
      zero(f, "model is not dynamic")
  if args.model != "voxel" and args.dyn_model != "voxel":
    for f in ("tv_sigma", "tv_refl", "tv_bezier", "tv_rigidity"):
      zero(f, "model is not voxel")
  elif args.dyn_model != "voxel":
    for f in ("tv_bezier", "tv_rigidity"):
      zero(f, "static voxel has no bezier/rigidity grids")
  if args.refl_kind == "pos" and args.view_variance_weight > 0:
    zero("view_variance_weight", "positional refl does not use view")
  return remaps


def _slice_views(ds, n: int):
  """Limit the dataset to its first n views (--train-imgs). Slices every
  per-view leaf (pixels, camera pose, times, lights) on the view axis."""
  import jax
  total = ds.num_views
  if n <= 0 or n >= total:
    return ds

  def cut(x):
    return (x[:n] if hasattr(x, "shape") and getattr(x, "ndim", 0) > 0
            and x.shape[0] == total else x)

  return ds.replace(
      pixels=ds.pixels[:n],
      camera=jax.tree.map(cut, ds.camera),
      times=None if ds.times is None else ds.times[:n],
      lights=None if ds.lights is None else jax.tree.map(cut, ds.lights))




def _train_only_substrings(train_parts):
  """--train-parts → param-path substrings whose grads stay live
  (reference runner.py:1266-1280). "all" disables masking; "camera" is
  handled separately (train_camera); "path-tf" maps to the refl group
  because the one-bounce transfer folds through the BRDF itself
  (models/volsdf.py:_one_bounce)."""
  if "all" in train_parts:
    return None
  keys = tuple(sorted({
      {"refl": "refl", "occ": "occ", "path-tf": "refl"}[p]
      for p in train_parts if p not in ("camera",)}))
  return keys or None


def make_train_config(args):
  """Resolve parsed flags into the immutable TrainConfig (the
  flag→behavior contract tested in tests/test_flags_behavior.py)."""
  from nerf_atlas_tpu.train import driver

  crop_size = args.crop_size
  if crop_size == 0 and (set(args.loss_fns) & {"ssim", "fft"}
                         or args.style_img):
    crop_size = 32  # image-structured losses need image-shaped batches

  if args.volsdf_alternate:
    assert args.model == "volsdf", "--volsdf-alternate needs --model volsdf"
    if args.alt_train == 0:
      args.alt_train = 2048   # the reference's run_len=4096 halves

  return driver.TrainConfig(
      steps=args.epochs, batch_size=args.batch_size,
      learning_rate=args.learning_rate, opt_kind=args.opt_kind,
      loss_kinds=tuple(args.loss_fns),
      color_spaces=tuple(args.color_spaces), tone_map=args.tone_map,
      gamma_correct=(2.2 if args.gamma_correct
                     else args.gamma_correct_loss),
      reg_coeffs={
          "latent_l2": args.latent_l2_weight,
          "eikonal": args.eikonal_weight,
          "surface_eikonal": args.surface_eikonal,
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
          "ffjord_div": args.ffjord_div_decay,
          # our spline-length reg is point-sampled, i.e. already the
          # "random" variant — the three reference spellings sum
          "spline_length": (args.spline_length_weight
                            + args.random_spline_len_decay
                            + args.voxel_random_spline_len_decay),
          "spline_pt0": args.spline_pt0_weight,
      },
      grad_clip=args.clip_gradients, accum_steps=args.opt_step,
      no_sched=args.no_sched, sched_min=args.sched_min, seed=args.seed,
      valid_freq=args.valid_freq, save_freq=args.save_freq,
      versioned_save=args.versioned_save,
      save_path=args.save or os.path.join(args.outdir, "model.ckpt"),
      duration_sec=args.duration_sec,
      train_camera="camera" in args.train_parts,
      train_only=_train_only_substrings(args.train_parts),
      profile_dir=args.profile_dir,
      save_load_opt=args.save_load_opt,
      alt_train=args.alt_train,
      inc_fourier_freqs=args.inc_fourier_freqs,
      crop_size=crop_size,
      style_img=args.style_img, style_weight=args.style_img_weight,
      use_mesh=args.mesh_devices != 1,
      model_parallel=args.model_parallel,
      weight_decay=args.decay,
      serial_idxs=args.serial_idxs,
      end_bias=args.higher_end_chance,
      omit_bg=args.omit_bg,
      skip_loss=args.skip_loss,
      freeze_substr="canonical" if args.fix_canon else None,
      smooth_eps=args.smooth_eps,
      smooth_eps_rng=args.smooth_eps_rng,
      smooth_ords=tuple(args.smooth_n_ord),
      volsdf_alternate=args.volsdf_alternate,
      no_fused=args.no_fused)


def main(argv=None):
  import jax
  # persistent compile cache: Mosaic kernel compiles on the TPU run
  # 5-30 min — never pay twice for the same config across CLI invocations
  jax.config.update("jax_compilation_cache_dir",
                    os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                   os.path.expanduser("~/.jax_cache")))
  jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
  args = arguments(argv)
  from nerf_atlas_tpu.data import load, sampler
  from nerf_atlas_tpu.train import checkpoints, driver

  t0 = time.time()
  if args.bendy:
    args.model = "bendy"
  if args.torchjit:
    print("[note]: --torchjit is a no-op — the XLA jit is always on")
  if args.debug_nans:
    import jax
    jax.config.update("jax_debug_nans", True)
  if args.data_parallel and args.mesh_devices == 1:
    args.mesh_devices = 0     # re-enable the mesh
  if not args.derive_kind and args.data_kind is None:
    raise ValueError("--data-kind is required when --derive-kind is unset")
  if args.timed_outdir:
    args.outdir = f"{args.outdir}-{time.strftime('%Y-%m-%d-%H%M%S')}"
  for vis in args.visualize:   # list form of the *-images flags
    setattr(args, {"depth": "depth_images", "normals": "normals_images",
                   "flow": "flow_images",
                   "rigidity": "rigidity_images"}[vis], True)
  if args.nosave:
    args.save_freq = 0
  os.makedirs(args.outdir, exist_ok=True)

  load_kwargs = {}
  if args.data_kind in ("synthetic", "synthetic-dyn", "synthetic-lit"):
    load_kwargs["num_views"] = args.num_views
  if args.data_kind == "dnerf" and args.time_gamma:
    load_kwargs["time_gamma"] = True
  if args.data_kind == "nerv_point":
    load_kwargs["light_intensity"] = args.light_intensity
  if args.data_kind == "single_video":
    load_kwargs.update(fov=args.static_vid_cam_angle_deg,
                       start_sec=args.start_sec, end_sec=args.end_sec)
  bundle = load(args.data, data_kind=args.data_kind, training=True,
                size=args.size, **load_kwargs)
  ds = sampler.RayDataset.from_bundle(bundle, size=args.size)
  ds = apply_light_kind(args, ds)
  if args.train_imgs > 0:
    ds = _slice_views(ds, args.train_imgs)
  remaps = set_per_run(args, ds)
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

  cfg = make_train_config(args)

  config_dict = {**vars(args), "argv": sys.argv, "name": args.name,
                 "timestamp": time.strftime("%Y-%m-%d %H:%M:%S")}
  with open(os.path.join(args.outdir, args.log), "w") as f:
    json.dump(config_dict, f, indent=2, default=str)

  params = None
  opt_saved = None
  if args.load:
    fresh = driver.init_model(model, ds, cfg.seed, extra_kwargs)
    params, info = checkpoints.restore_or_graft(args.load, fresh,
                                                replace=args.replace,
                                                remaps=remaps)
    if args.save_load_opt:
      opt_saved = info.get("opt_state")
    print(f"[load] restored {len(info['restored'])} tensors, "
          f"re-initialized {len(info['skipped'])} (step {info['step']})")
  if args.with_canon:
    # preload a trained canonical model into the dynamic wrapper
    # (reference --with-canon, runner.py:250): the standalone
    # checkpoint's params graft under params/canonical
    fresh = (params if params is not None
             else driver.init_model(model, ds, cfg.seed, extra_kwargs))
    params, info = checkpoints.restore_or_graft(
        args.with_canon, fresh,
        remaps=[(("params",), ("params", "canonical"))])
    print(f"[with-canon] grafted {len(info['restored'])} canonical tensors")

  if args.epochs > 0:
    show_reg = args.display_regularization or args.display_smoothness

    def log_cb(m):
      psnr = m.get("psnr", -10 * np.log10(max(m.get("mse", 1e-10), 1e-10)))
      extra_txt = (f"  reg {m['loss'] - m['mse']:.5f}" if show_reg else "")
      print(f"step {m['step']:6d}  loss {m['loss']:.5f}  "
            f"psnr {psnr:.2f}{extra_txt}  ({time.time() - t0:.0f}s)")
    if args.long_vid_progressive_train and dynamic:
      segments = (args.long_vid_progressive_train
                  if args.long_vid_progressive_train > 0
                  else args.long_vid_segments)
      if args.long_vid_chunk_len_sec:
        # chunk length in seconds over the loaded window
        span = ((args.end_sec - args.start_sec)
                if args.end_sec else ds.num_views / 30.0)
        segments = max(1, round(span / args.long_vid_chunk_len_sec))
        print(f"[video] {segments} progressive chunks of "
              f"{args.long_vid_chunk_len_sec}s")
      params, _, history = driver.train_progressive(
          model, ds, cfg, segments=segments, params=params,
          config_dict=config_dict, callback=log_cb)
    else:
      params, _, history = driver.train(model, ds, cfg, params=params,
                                        config_dict=config_dict,
                                        callback=log_cb,
                                        extra_kwargs=extra_kwargs,
                                        opt_state_saved=opt_saved)
    if history:
      driver.plot_history(history, os.path.join(args.outdir, "loss.png"),
                          window=args.loss_window, yscale=args.y_scale)
    # record which train path actually ran (fused-one-kernel | fused |
    # oracle) so every artifact citing this run carries its attribution
    config_dict["engaged_path"] = driver.LAST_TRAIN_PATH
    with open(os.path.join(args.outdir, args.log), "w") as f:
      json.dump(config_dict, f, indent=2, default=str)
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

  test_kwargs = dict(
      render_size=args.render_size or None, with_ssim=args.msssim_loss,
      save_depth=args.depth_images, extra_kwargs=extra_kwargs,
      extra_maps=extra_maps,
      chunk=(args.test_crop_size ** 2 if args.test_crop_size else 65536),
      only_view=args.render_frame if args.render_frame >= 0 else None,
      white_bg=args.test_white_bg, with_alpha=args.with_alpha,
      exp_bg=args.exp_bg,
      colormap=args.plt_cmap_kind if args.draw_colormap else None,
      normals_from_depth=args.normals_from_depth,
      depth_query_normal=args.depth_query_normal)

  results = {}
  if args.epochs > 0:
    results["engaged_path"] = driver.LAST_TRAIN_PATH
  if not args.notraintest:
    results["train"] = driver.test(
        model, params, ds, out_dir=os.path.join(args.outdir, "train"),
        **test_kwargs)
    print("[train]", results["train"]["summary"])
  if not args.notest:
    tb = load(args.data, data_kind=args.data_kind, training=False,
              size=args.size, **load_kwargs)
    tds = sampler.RayDataset.from_bundle(tb, size=args.size)
    tds = apply_light_kind(args, tds)
    results["test"] = driver.test(
        model, params, tds, out_dir=os.path.join(args.outdir, "test"),
        **test_kwargs)
    print("[test]", results["test"]["summary"])
    if args.has_multi_light and args.data_kind == "nerv_point":
      # the multi-point-light split (reference runner.py:969-977)
      mb = load(args.data, data_kind="nerv_point", training=False,
                size=args.size, multi_point=True)
      mds = apply_light_kind(args, sampler.RayDataset.from_bundle(
          mb, size=args.size))
      results["test_multi"] = driver.test(
          model, params, mds,
          out_dir=os.path.join(args.outdir, "test_multi"), **test_kwargs)
      print("[test multi-light]", results["test_multi"]["summary"])

  if args.cluster_movement > 0 and dynamic:
    save_movement_clusters(model, params, ds, args.cluster_movement,
                           os.path.join(args.outdir, "clusters.png"))

  if args.render_over_time >= 0 and dynamic:
    frames = driver.render_over_time(
        model, params, ds, view=args.render_over_time,
        frames=args.render_frames, end_sec=args.render_over_time_end_sec)
    import imageio.v2 as imageio
    vid_path = os.path.join(args.outdir, "over_time.gif")
    imageio.mimwrite(vid_path,
                     (np.clip(frames[..., :3], 0, 1) * 255).astype("uint8"))
    print(f"[time] wrote {vid_path}")
    if args.render_bezier_keyframes and args.spline > 1:
      # one frame per Bezier control-point time (reference
      # render_keyframes, src/nerf.py:1292-1303)
      kf = driver.render_over_time(model, params, ds,
                                   view=args.render_over_time,
                                   frames=args.spline)
      import imageio.v2 as imageio
      for i in range(kf.shape[0]):
        imageio.imwrite(
            os.path.join(args.outdir, f"keyframe_{i:02d}.png"),
            (np.clip(kf[i, ..., :3], 0, 1) * 255).astype("uint8"))
      print(f"[time] wrote {args.spline} keyframes")
  return results


def save_movement_clusters(model, params, ds, k: int, out_path: str):
  """--cluster-movement: k-means over the integrated deformation field of
  view 0 (reference runner.py:317), colored by cluster id."""
  from nerf_atlas_tpu.train import driver
  flow = driver.render_view(model, params, ds, 0, min(ds.size, 64),
                            mode="flow", time_val=0.5)      # [S, S, 3]
  pts = flow.reshape(-1, 3)
  rng = np.random.RandomState(0)
  centers = pts[rng.choice(len(pts), k, replace=False)]
  for _ in range(10):                                       # lloyd steps
    d = np.linalg.norm(pts[:, None] - centers[None], axis=-1)
    assign = d.argmin(-1)
    for c in range(k):
      sel = pts[assign == c]
      if len(sel):
        centers[c] = sel.mean(0)
  import matplotlib
  cm = matplotlib.colormaps["tab10"]
  img = cm(assign.reshape(flow.shape[:2]) % 10)[..., :3]
  import imageio.v2 as imageio
  imageio.imwrite(out_path, (img * 255).astype(np.uint8))
  print(f"[clusters] wrote {out_path}")


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
      # --feature-space: width of the upsampler's feature images (the
      # reference renders feature_space channels at low res)
      feats=(args.feature_space if args.feature_space != 3 else 32),
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
