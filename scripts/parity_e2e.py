#!/usr/bin/env python3
"""End-to-end quality parity vs the PyTorch reference (BASELINE 0.1 dB bar).

Exports the procedural golden scene to the NeRF-synthetic format both
frameworks load, trains the reference's `original` recipe (makefile:8-13:
PlainNeRF + refl pos, l2, lr 2e-4) with its OWN runner on torch-CPU, and
trains our matched config (--model plain --enc-kind hash --refl-kind pos)
on the same ray/step budget. Reports test-split PSNR for both and the
delta, into PARITY_E2E.json.

Run: python scripts/parity_e2e.py [--epochs N] [--size S]
(torch-CPU is the slow side: ~30-60 min at the default budget).

Harness accommodations for the reference on a CPU-only box (same as
scripts/bench_reference.py): torchvision stubbed (unused by this path),
`.cuda()` no-op'd, matplotlib forced Agg.
"""
from __future__ import annotations

import argparse
import json
import os
import re
import sys
import types

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def export_scene(out_dir: str, size: int, n_train: int = 8,
                 n_test: int = 4):
  import imageio.v2 as imageio
  import numpy as np
  from nerf_atlas_tpu.data import synthetic

  os.makedirs(out_dir, exist_ok=True)
  for kind, n, seed in (("train", n_train, 0), ("test", n_test, 1)):
    imgs, cam, _ = synthetic.dataset(num_views=n, size=size, seed=seed)
    frames = []
    for i in range(n):
      fp = f"{kind}_{i:03d}"
      arr = np.clip(np.asarray(imgs[i]), 0, 1)
      imageio.imwrite(os.path.join(out_dir, fp + ".png"),
                      (arr * 255).astype(np.uint8))
      frames.append({
          "file_path": fp,
          "transform_matrix": np.asarray(cam.cam_to_world[i]).tolist(),
      })
    with open(os.path.join(out_dir, f"transforms_{kind}.json"), "w") as f:
      json.dump({"camera_angle_x": 0.6911, "frames": frames}, f)
  print(f"[scene] exported {n_train}+{n_test} views at {size}px -> "
        f"{out_dir}")


def _stub_torchvision():
  tv = types.ModuleType("torchvision")
  tv.models = types.ModuleType("torchvision.models")
  tfm = types.ModuleType("torchvision.transforms")
  tff = types.ModuleType("torchvision.transforms.functional")
  tv.transforms = tfm
  tfm.functional = tff
  sys.modules.update({
      "torchvision": tv, "torchvision.models": tv.models,
      "torchvision.transforms": tfm,
      "torchvision.transforms.functional": tff,
  })


def run_reference(scene: str, workdir: str, epochs: int, size: int,
                  steps: int, ref_path: str = "/root/reference"):
  """Train + test the reference with its own runner.py (torch CPU)."""
  import matplotlib
  matplotlib.use("Agg")
  import torch
  _stub_torchvision()
  if not torch.cuda.is_available():
    torch.nn.Module.cuda = lambda self, *a, **k: self
  sys.path.insert(0, ref_path)

  os.makedirs(workdir, exist_ok=True)
  outdir = os.path.join(workdir, "ref_outputs")
  os.makedirs(outdir, exist_ok=True)
  cwd = os.getcwd()
  argv = sys.argv
  try:
    os.chdir(REPO)   # the reference's git_hash() needs a git cwd; its
    # outputs go to the absolute --outdir (never /root/reference)
    sys.argv = [
        "runner.py", "-d", scene + "/", "--data-kind", "original",
        "--size", str(size), "--epochs", str(epochs),
        "--crop-size", "16", "--batch-size", "2",
        "--near", "1.5", "--far", "4.5", "--steps", str(steps),
        "--model", "plain", "--refl-kind", "pos", "-lr", "2e-4",
        "--loss-fns", "l2", "--notraintest", "--seed", "0",
        "--outdir", outdir + "/",
        "--save", os.path.join(workdir, "ref.pt"),
        "--valid-freq", str(10 ** 9), "--save-freq", str(10 ** 9),
    ]
    import runpy
    runpy.run_path(os.path.join(ref_path, "runner.py"),
                   run_name="__main__")
  finally:
    os.chdir(cwd)
    sys.argv = argv
  res = open(os.path.join(outdir, "results.txt")).read()
  print("[reference results]\n" + res)
  return _parse_psnr(res)


def _parse_psnr(results_txt: str) -> float:
  m = re.search(r"mean.*?(\d+\.\d+)", results_txt)
  if m:
    return float(m.group(1))
  # reference summary format: "mean: X.XXX" or similar — fall back to the
  # average of per-view lines
  views = [float(x) for x in re.findall(r"PSNR[:\s]+(\d+\.\d+)",
                                        results_txt)]
  assert views, results_txt
  return sum(views) / len(views)


def run_ours(scene: str, workdir: str, epochs: int, size: int, steps: int):
  """Matched config through OUR runner (ray budget 512/step, same loss,
  lr, near/far, sample count; hash encoder + pos reflectance to mirror
  the reference's PlainNeRF recipe)."""
  import runner
  results = runner.main([
      "-d", scene, "--data-kind", "original", "--size", str(size),
      "--epochs", str(epochs), "--batch-size", "512",
      "--near", "1.5", "--far", "4.5", "--steps", str(steps),
      "--model", "plain", "--enc-kind", "hash", "--refl-kind", "pos",
      "-lr", "2e-4", "--loss-fns", "l2", "--notraintest", "--seed", "0",
      "--outdir", os.path.join(workdir, "ours"), "--nosave",
  ])
  return results["test"]["psnr_mean"]


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("--epochs", type=int, default=1500)
  ap.add_argument("--size", type=int, default=32)
  ap.add_argument("--steps", type=int, default=32)
  ap.add_argument("--workdir", default="/tmp/parity_e2e")
  ap.add_argument("--skip-reference", action="store_true")
  ap.add_argument("--skip-ours", action="store_true")
  args = ap.parse_args()

  scene = os.path.join(args.workdir, "scene")
  out_path = os.path.join(REPO, "PARITY_E2E.json")
  try:
    with open(out_path) as f:
      out = json.load(f)
  except Exception:  # noqa: BLE001
    out = {}
  out["config"] = {
      "recipe": "reference makefile `original` (PlainNeRF + refl pos, "
                "l2, lr 2e-4), procedural scene, matched ray/step budget",
      "epochs": args.epochs, "size": args.size, "steps": args.steps,
      "rays_per_step": 512,
  }

  if not os.path.exists(os.path.join(scene, "transforms_train.json")):
    export_scene(scene, args.size)

  if not args.skip_ours:
    out["ours_test_psnr"] = round(run_ours(scene, args.workdir,
                                           args.epochs, args.size,
                                           args.steps), 3)
    print(f"[ours] test PSNR {out['ours_test_psnr']}")
  if not args.skip_reference:
    out["reference_test_psnr"] = round(
        run_reference(scene, args.workdir, args.epochs, args.size,
                      args.steps), 3)
    print(f"[reference] test PSNR {out['reference_test_psnr']}")
  if "ours_test_psnr" in out and "reference_test_psnr" in out:
    out["delta_db"] = round(out["ours_test_psnr"]
                            - out["reference_test_psnr"], 3)
    print(f"[parity] ΔPSNR (ours - reference) = {out['delta_db']} dB")
  with open(out_path, "w") as f:
    json.dump(out, f, indent=2)
  print(f"wrote {out_path}")


if __name__ == "__main__":
  main()
