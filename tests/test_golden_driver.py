"""Driver-level golden configs with pinned PSNR floors (VERDICT r2 #6).

Each test runs `runner.main` end-to-end (loader → model build →
set_per_run → jitted train → tiled test eval → results.txt) on a
procedural scene and asserts a PSNR floor pinned near the measured
round-3 values, so a quality regression in any of these model families
fails loudly. Floors sit ~2 dB under the measured medians to absorb
seed/backend jitter while still catching halvings.

Configs mirror the reference's canonical recipes (makefile: ae:380-384,
volsdf:21-28, dnerf:105-114, nerv relighting via --light-kind dataset).

Every golden ALSO asserts the trained PSNR beats the all-black trivial
baseline of its scene by >= 2 dB — a floor alone can silently sit below
the trivial level (round 3 caught exactly that: VolSDF at lr 1e-3
collapsed to empty density and scored the black baseline, 12.7, to the
hundredth, and the relit golden scored BELOW its scene's 21.5 black
level; both were "passing").
"""
import os

import numpy as np
import pytest

import runner


def _black_psnr(argv):
  """All-black PSNR of the golden's exact scene (the trivial baseline)."""
  from nerf_atlas_tpu.data import synthetic
  get = lambda flag: argv[argv.index(flag) + 1]
  kw = {}
  kind = get("--data-kind")
  if kind == "synthetic-lit":
    kw["lit"] = True
  elif kind == "synthetic-dyn":
    kw["dynamic"] = True
  labels, *_ = synthetic.dataset(num_views=int(get("--num-views")),
                                 size=int(get("--size")), seed=0, **kw)
  if isinstance(labels, (tuple, list)):
    labels = labels[0]
  im = np.asarray(labels)[..., :3]
  return float(-10 * np.log10((im ** 2).mean()))

pytestmark = pytest.mark.slow  # full driver runs, minutes each on 1 core


def _run(tmp_path, extra, psnr_floor, views=5, size=24, epochs=250,
         beat_black_by=2.0):
  argv = [
      "-d", "synth", "--size", str(size), "--num-views", str(views),
      "--epochs", str(epochs), "--near", "2", "--far", "6",
      "--batch-size", "512", "--steps", "24", "--loss-fns", "l2",
      "--outdir", str(tmp_path), "--nosave", "--notest", "--seed", "0",
  ] + extra
  results = runner.main(argv)
  psnr = results["train"]["psnr_mean"]
  assert psnr > psnr_floor, (psnr, psnr_floor)
  black = _black_psnr(argv)
  assert psnr > black + beat_black_by, (
      f"PSNR {psnr:.2f} does not beat the trivial all-black baseline "
      f"{black:.2f} by 2 dB — the model learned nothing")
  assert os.path.exists(os.path.join(tmp_path, "train", "results.txt"))
  return psnr


def test_golden_driver_ae(tmp_path):
  _run(tmp_path, ["--data-kind", "synthetic", "--model", "ae",
                  "-lr", "1e-3"], psnr_floor=14.5)  # measured 16.7 (r3)


def test_golden_driver_volsdf(tmp_path):
  # lr 3e-4 (the reference's own volsdf lr, ref makefile:25): at 1e-3 the
  # SDF density collapses to empty in <50 steps and the run scores the
  # all-black 12.7 exactly — which the original floor (10.5) "passed"
  _run(tmp_path, ["--data-kind", "synthetic", "--model", "volsdf",
                  "--sdf-kind", "mlp", "-lr", "3e-4",
                  "--sigmoid-kind", "upshifted"], psnr_floor=18.0)  # measured 20.5 (r3, black=12.7)


def test_golden_driver_dnerf_spline(tmp_path):
  _run(tmp_path, ["--data-kind", "synthetic-dyn", "--model", "plain",
                  "--enc-kind", "posenc", "--dyn-model", "plain",
                  "--spline", "4", "-lr", "1e-3"], psnr_floor=14.5)  # measured 16.8 (r3)


def test_golden_driver_coarse_fine_mip(tmp_path):
  # BASELINE config #2: PlainNeRF-style field with MipNeRF IPE features
  # + hierarchical fine sampling (reference makefile:15-19 shape); on a
  # TPU backend this exact config engages the fused coarse-fine kernel.
  # --mesh-devices 1: XLA:CPU's SPMD partitioner takes >15 min to compile
  # the hierarchical sort graph over the 8 virtual devices (TPU backends
  # are unaffected); the mesh path has its own coverage in test_train.
  _run(tmp_path, ["--data-kind", "synthetic", "--model", "coarse_fine",
                  "--mip", "cone", "-lr", "1e-3", "--mesh-devices", "1"],
       psnr_floor=20.0)  # measured 22.0 (r3)


def test_golden_driver_relit(tmp_path):
  # no --occ-kind: raycast visibility marches the SDF per step, which is
  # an hour-class run on a 1-core host; occlusion kinds have their own
  # analytic tests (test_relight.py) — this golden pins the lights+BRDF
  # relighting chain through the driver
  # lr 3e-4: same SDF-collapse mode as the volsdf golden at 1e-3 — the
  # original run measured 12.1, BELOW this scene's 21.5 all-black level.
  # The lit scene is shadow-dominated, so the margin over black is
  # structurally small (the model plateaus ~23.5 by step 200): floor 22
  # with a 1 dB anti-trivial margin.
  _run(tmp_path, ["--data-kind", "synthetic-lit", "--model", "volsdf",
                  "--sdf-kind", "mlp", "--light-kind", "dataset",
                  "--integrator-kind", "direct", "--refl-kind", "diffuse",
                  "-lr", "3e-4"], psnr_floor=22.0,  # measured 23.5 (r3, black=21.5)
       beat_black_by=1.0)
