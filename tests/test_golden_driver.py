"""Driver-level golden configs with pinned PSNR floors (VERDICT r2 #6).

Each test runs `runner.main` end-to-end (loader → model build →
set_per_run → jitted train → tiled test eval → results.txt) on a
procedural scene and asserts a PSNR floor pinned near the measured
round-3 values, so a quality regression in any of these model families
fails loudly. Floors sit ~2 dB under the measured medians to absorb
seed/backend jitter while still catching halvings.

Configs mirror the reference's canonical recipes (makefile: ae:380-384,
volsdf:21-28, dnerf:105-114, nerv relighting via --light-kind dataset).
"""
import os

import pytest

import runner

pytestmark = pytest.mark.slow  # full driver runs, minutes each on 1 core


def _run(tmp_path, extra, psnr_floor, views=5, size=24, epochs=250):
  argv = [
      "-d", "synth", "--size", str(size), "--num-views", str(views),
      "--epochs", str(epochs), "--near", "2", "--far", "6",
      "--batch-size", "512", "--steps", "24", "--loss-fns", "l2",
      "--outdir", str(tmp_path), "--nosave", "--notest", "--seed", "0",
  ] + extra
  results = runner.main(argv)
  psnr = results["train"]["psnr_mean"]
  assert psnr > psnr_floor, (psnr, psnr_floor)
  assert os.path.exists(os.path.join(tmp_path, "train", "results.txt"))
  return psnr


def test_golden_driver_ae(tmp_path):
  _run(tmp_path, ["--data-kind", "synthetic", "--model", "ae",
                  "-lr", "1e-3"], psnr_floor=14.5)  # measured 16.7 (r3)


def test_golden_driver_volsdf(tmp_path):
  _run(tmp_path, ["--data-kind", "synthetic", "--model", "volsdf",
                  "--sdf-kind", "mlp", "-lr", "1e-3",
                  "--sigmoid-kind", "upshifted"], psnr_floor=10.5)  # measured 12.7 (r3)


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
  _run(tmp_path, ["--data-kind", "synthetic-lit", "--model", "volsdf",
                  "--sdf-kind", "mlp", "--light-kind", "dataset",
                  "--integrator-kind", "direct", "--refl-kind", "diffuse",
                  "-lr", "1e-3"], psnr_floor=10.0)  # measured 12.1 (r3)
