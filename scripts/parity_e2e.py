#!/usr/bin/env python3
"""End-to-end quality parity vs the PyTorch reference, PER MODEL VARIANT
(BASELINE bar: PSNR within 0.1 dB — or better — per variant).

Exports the procedural golden scene to the NeRF-synthetic format both
frameworks load (plus a D-NeRF-format dynamic export), trains the
reference's recipe for each variant with its OWN runner on torch-CPU,
and trains our matched config on the same ray/step budget. Reports
held-out test-split PSNR for both sides and the delta, per variant,
into PARITY_E2E.json.

Variants (reference recipes):
  plain   — makefile:8-13   (PlainNeRF + refl pos, l2, lr 2e-4)
  ae      — makefile:380-384 (NeRFAE, lr 1e-3, no-sched)
  volsdf  — makefile:21-28   (VolSDF + mlp SDF, upshifted, lr 3e-4;
            relighting extras dropped on BOTH sides for the core
            quality comparison)
  dnerf   — makefile:105-114 (DynamicNeRF --spline 6 over PlainNeRF;
            regularizer extras dropped on both sides; refl pos on both
            sides for stability at tiny budgets)

`--diagnose-hash` additionally trains OUR plain config with the
reference's EXACT hash encoder (enc-kind ref-hash: the descending-
resolution schedule bug preserved, see nn/encoders.py:RefHashEncoder)
so the measured plain-variant delta can be attributed: if ours(ref-hash)
lands at the reference's PSNR while ours(hash) is far above, the
reference's schedule bug is the measured cause of the gap.

Run: python scripts/parity_e2e.py [--epochs N] [--size S] \
       [--variants plain,ae,volsdf,dnerf] [--diagnose-hash]
(torch-CPU is the slow side: ~30-40 min per variant at the default
budget.)

Harness accommodations for the reference on a CPU-only box (same as
scripts/bench_reference.py): torchvision stubbed (unused by this path),
`.cuda()` no-op'd, matplotlib forced Agg, `with_transmission` module
global injected (ref src/nerf.py:895 reads an undefined name).
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
                 n_test: int = 4, dynamic: bool = False):
  """Write the procedural scene in NeRF-synthetic (or, with
  dynamic=True, D-NeRF) transforms format — the shared wire format both
  frameworks' `original`/`dnerf` loaders read."""
  import imageio.v2 as imageio
  import numpy as np
  from nerf_atlas_tpu.data import synthetic

  os.makedirs(out_dir, exist_ok=True)
  for kind, n, seed in (("train", n_train, 0), ("test", n_test, 1)):
    labels, cam, _ = synthetic.dataset(num_views=n, size=size, seed=seed,
                                       dynamic=dynamic)
    times = None
    if dynamic:
      labels, times = labels
    frames = []
    for i in range(n):
      fp = f"{kind}_{i:03d}"
      arr = np.clip(np.asarray(labels[i]), 0, 1)
      imageio.imwrite(os.path.join(out_dir, fp + ".png"),
                      (arr * 255).astype(np.uint8))
      frame = {
          "file_path": fp,
          "transform_matrix": np.asarray(cam.cam_to_world[i]).tolist(),
      }
      if times is not None:
        frame["time"] = float(times[i])
      frames.append(frame)
    with open(os.path.join(out_dir, f"transforms_{kind}.json"), "w") as f:
      json.dump({"camera_angle_x": 0.6911, "frames": frames}, f)
  print(f"[scene] exported {n_train}+{n_test} views at {size}px"
        f"{' (dynamic)' if dynamic else ''} -> {out_dir}")


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


# per-variant flags BEYOND the shared budget/scene flags.
# ref: the reference's runner.py argv; ours: our runner.py argv.
# Reference recipe sources cited in the module docstring.
VARIANTS = {
    "plain": dict(
        data_kind="original",
        ref=["--model", "plain", "--refl-kind", "pos", "-lr", "2e-4"],
        ours=["--model", "plain", "--enc-kind", "hash",
              "--refl-kind", "pos", "-lr", "2e-4"],
    ),
    "ae": dict(
        data_kind="original",
        ref=["--model", "ae", "-lr", "1e-3", "--no-sched"],
        # --ref-compat: the head-to-head trains the reference's NATIVE
        # ae architecture on both sides (Fourier encode MLP 5x128 at the
        # ref's spectrum, density tform 5x64 — runner.py ref-compat
        # branch). Our TPU-native default (PositionalEncoder, 256-wide
        # encoder) is a different, higher-bandwidth model that overfits
        # this 8-view 32px probe scene (train 26 dB / test 13.5 —
        # measured round 5), which would measure the architecture gap,
        # not the framework gap.
        # --density-noise 0.2: the reference trains EVERY CommonNeRF
        # with sigma=0.2 density noise (hard-coded override, ref
        # src/nerf.py:197) — a train-time regularizer that matters at
        # few views; our default is 0 so the matched config sets it.
        # --shape-to-refl-size 64: the reference's runner passes its
        # default 64 as intermediate_size to every model (ref
        # runner.py:127,140), so its NeRFAE density transform emits
        # 1+64 and its View refl reads a 96-wide latent; our runner
        # default is 32 (the fused-kernel envelope) — the matched
        # config overrides it.
        ours=["--model", "ae", "-lr", "1e-3", "--no-sched",
              "--ref-compat", "--density-noise", "0.2",
              "--shape-to-refl-size", "64"],
    ),
    "volsdf": dict(
        data_kind="original",
        ref=["--model", "volsdf", "--sdf-kind", "mlp", "-lr", "3e-4",
             "--sigmoid-kind", "upshifted", "--refl-kind", "pos"],
        # --ref-compat (round 5): the reference's MLP-SDF spectrum (128
        # Fourier freqs at effective sigma 16) and no sphere-init — our
        # TPU-native defaults (32 freqs at sigma-equivalent 25, sphere
        # bias) plateaued at ~12.9 dB train on this probe scene while
        # the reference fits it (runner.py volsdf ref-compat branch).
        ours=["--model", "volsdf", "--sdf-kind", "mlp", "-lr", "3e-4",
              "--sigmoid-kind", "upshifted", "--refl-kind", "pos",
              "--ref-compat"],
    ),
    "dnerf": dict(
        data_kind="dnerf",
        ref=["--model", "plain", "--dyn-model", "plain", "--spline", "6",
             "--refl-kind", "pos", "--sigmoid-kind", "upshifted",
             "-lr", "5e-4"],
        ours=["--model", "plain", "--enc-kind", "hash", "--dyn-model",
              "plain", "--spline", "6", "--refl-kind", "pos",
              "--sigmoid-kind", "upshifted", "-lr", "5e-4"],
    ),
}


def run_reference(scene: str, workdir: str, epochs: int, size: int,
                  steps: int, variant: str,
                  ref_path: str = "/root/reference"):
  """Train + test the reference with its own runner.py (torch CPU)."""
  import matplotlib
  matplotlib.use("Agg")
  import torch
  _stub_torchvision()
  if not torch.cuda.is_available():
    torch.nn.Module.cuda = lambda self, *a, **k: self
  sys.path.insert(0, ref_path)
  # ref src/nerf.py:895 reads an undefined module-level name when
  # constructing VolSDF (documented ctor patch, scripts/bench_reference)
  from src import nerf as ref_nerf
  ref_nerf.with_transmission = False
  # upstream bug (found round 5): `--model ae` through the reference's
  # OWN runner always crashes — load_model (ref runner.py:1182-1183)
  # replaces NeRFAE's ctor-built refl (latent = encoding+intermediate =
  # 96, ref src/nerf.py:773-780,834-837) with one sized
  # latent_size=model.intermediate_size (64), so the first forward dies
  # on the latent reshape (neural_blocks.py:286). Accommodation: keep
  # the ctor-built refl (the model's own intended wiring) by no-op'ing
  # set_refl for NeRFAE only.
  ref_nerf.NeRFAE.set_refl = lambda self, refl_obj: None

  spec = VARIANTS[variant]
  os.makedirs(workdir, exist_ok=True)
  outdir = os.path.join(workdir, f"ref_outputs_{variant}")
  os.makedirs(outdir, exist_ok=True)
  cwd = os.getcwd()
  argv = sys.argv
  try:
    os.chdir(REPO)   # the reference's git_hash() needs a git cwd; its
    # outputs go to the absolute --outdir (never /root/reference)
    sys.argv = [
        "runner.py", "-d", scene + "/", "--data-kind", spec["data_kind"],
        "--size", str(size), "--epochs", str(epochs),
        "--crop-size", "16", "--batch-size", "2",
        "--near", "1.5", "--far", "4.5", "--steps", str(steps),
        "--loss-fns", "l2", "--notraintest", "--seed", "0",
        "--outdir", outdir + "/",
        "--save", os.path.join(workdir, f"ref_{variant}.pt"),
        "--valid-freq", str(10 ** 9), "--save-freq", str(10 ** 9),
    ] + spec["ref"]
    import runpy
    runpy.run_path(os.path.join(ref_path, "runner.py"),
                   run_name="__main__")
  finally:
    os.chdir(cwd)
    sys.argv = argv
  res = open(os.path.join(outdir, "results.txt")).read()
  print(f"[reference {variant} results]\n" + res)
  return _parse_psnr(res)


def _parse_psnr(results_txt: str) -> float:
  # the reference writes "\tmean X.XXX" on its own line
  # (ref runner.py:979-984); anchor on that exact shape so an unrelated
  # line containing "mean" can never be silently mis-parsed
  m = re.search(r"^\s*mean\s+(-?\d+\.\d+)\s*$", results_txt, re.MULTILINE)
  if m:
    return float(m.group(1))
  # fall back to the average of per-view lines
  views = [float(x) for x in re.findall(r"PSNR[:\s]+(\d+\.\d+)",
                                        results_txt)]
  assert views, f"no parsable PSNR summary in results.txt:\n{results_txt}"
  return sum(views) / len(views)


def run_ours(scene: str, workdir: str, epochs: int, size: int, steps: int,
             variant: str, enc_override: str | None = None):
  """Matched config through OUR runner (ray budget 512/step = the ref's
  batch 2 x crop 16^2, same loss, lr, near/far, sample count)."""
  import runner
  spec = VARIANTS[variant]
  flags = list(spec["ours"])
  if enc_override is not None:
    i = flags.index("--enc-kind")
    flags[i + 1] = enc_override
  tag = variant + (f"_{enc_override}" if enc_override else "")
  results = runner.main([
      "-d", scene, "--data-kind", spec["data_kind"], "--size", str(size),
      "--epochs", str(epochs), "--batch-size", "512",
      "--near", "1.5", "--far", "4.5", "--steps", str(steps),
      "--loss-fns", "l2", "--notraintest", "--seed", "0",
      "--outdir", os.path.join(workdir, f"ours_{tag}"), "--nosave",
  ] + flags)
  return results["test"]["psnr_mean"]


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("--epochs", type=int, default=1500)
  ap.add_argument("--size", type=int, default=32)
  ap.add_argument("--steps", type=int, default=32)
  ap.add_argument("--train-views", type=int, default=8,
                  help="training views in the exported scene — the 8-view"
                       " default probes fit; 30 views makes the held-out"
                       " split meaningful for variants that overfit it"
                       " (volsdf: both frameworks hit ~28-30 dB train /"
                       " ~13-14.5 test at 8 views)")
  ap.add_argument("--workdir", default="/tmp/parity_e2e")
  ap.add_argument("--variants", default="plain",
                  help=f"comma list from {sorted(VARIANTS)}")
  ap.add_argument("--skip-reference", action="store_true")
  ap.add_argument("--skip-ours", action="store_true")
  ap.add_argument("--diagnose-hash", action="store_true",
                  help="also train ours(plain) with the reference's "
                       "exact (buggy-schedule) hash encoder")
  args = ap.parse_args()

  variants = [v.strip() for v in args.variants.split(",") if v.strip()]
  unknown = [v for v in variants if v not in VARIANTS]
  if unknown:
    raise SystemExit(f"unknown variant(s) {unknown}; known "
                     f"{sorted(VARIANTS)}")

  out_path = os.path.join(REPO, "PARITY_E2E.json")
  try:
    with open(out_path) as f:
      out = json.load(f)
  except Exception:  # noqa: BLE001
    out = {}
  out["config"] = {
      "recipe": "per-variant reference makefile recipes on the exported "
                "procedural scene, matched ray/step budget both sides",
      "epochs": args.epochs, "size": args.size, "steps": args.steps,
      "rays_per_step": 512,
  }
  out.setdefault("variants", {})
  # keys THIS invocation computed: only these beat the on-disk value at
  # save time, so an interleaved invocation refreshing the other side
  # can never be clobbered by values we merely loaded at startup
  written: set[tuple[str, str]] = set()

  def put(variant, key, value):
    out["variants"].setdefault(variant, {})[key] = value
    written.add((variant, key))

  def save():
    # merge-read before writing: two invocations (e.g. the torch-CPU
    # reference side and the TPU ours side) may interleave; last-writer
    # must not drop rows the other landed since our initial read.
    # Merge IN PLACE (never replace the row dict — callers hold aliases)
    # and let disk win for every key this run didn't itself compute.
    try:
      with open(out_path) as f:
        disk = json.load(f)
      for v, disk_row in disk.get("variants", {}).items():
        cur = out["variants"].setdefault(v, {})
        for k, val in disk_row.items():
          if (v, k) not in written:
            cur[k] = val
    except Exception:  # noqa: BLE001
      pass
    for row in out["variants"].values():
      if "ours_test_psnr" in row and "reference_test_psnr" in row:
        row["delta_db"] = round(
            row["ours_test_psnr"] - row["reference_test_psnr"], 3)
    with open(out_path, "w") as f:
      json.dump(out, f, indent=2)

  for variant in variants:
    dyn = VARIANTS[variant]["data_kind"] == "dnerf"
    tag = ("scene_dyn" if dyn else "scene") + (
        f"{args.train_views}" if args.train_views != 8 else "")
    scene = os.path.join(args.workdir, tag)
    if not os.path.exists(os.path.join(scene, "transforms_train.json")):
      export_scene(scene, args.size, n_train=args.train_views, dynamic=dyn)
    put(variant, "train_views", args.train_views)
    # per-variant budget: variants may run at different (but per-variant
    # MATCHED ours-vs-ref) budgets; the top-level config records the
    # plain variant's original protocol
    for k, v in (("epochs", args.epochs), ("size", args.size),
                 ("steps", args.steps)):
      put(variant, k, v)

    if not args.skip_ours:
      put(variant, "ours_test_psnr", round(
          run_ours(scene, args.workdir, args.epochs, args.size,
                   args.steps, variant), 3))
      print(f"[ours {variant}] test PSNR "
            f"{out['variants'][variant]['ours_test_psnr']}")
      save()
    if args.diagnose_hash and variant == "plain":
      put(variant, "ours_refhash_test_psnr", round(
          run_ours(scene, args.workdir, args.epochs, args.size,
                   args.steps, variant, enc_override="ref-hash"), 3))
      print(f"[ours {variant} ref-hash] test PSNR "
            f"{out['variants'][variant]['ours_refhash_test_psnr']}")
      save()
    if not args.skip_reference:
      put(variant, "reference_test_psnr", round(
          run_reference(scene, args.workdir, args.epochs, args.size,
                        args.steps, variant), 3))
      print(f"[reference {variant}] test PSNR "
            f"{out['variants'][variant]['reference_test_psnr']}")
      save()
    save()  # pull in rows the other side may have landed meanwhile
    row = out["variants"][variant]
    if "ours_test_psnr" in row and "reference_test_psnr" in row:
      put(variant, "delta_db", round(row["ours_test_psnr"]
                                     - row["reference_test_psnr"], 3))
      print(f"[parity {variant}] ΔPSNR (ours - reference) = "
            f"{row['delta_db']} dB")
      save()

  # legacy top-level keys (round-3 shape) mirror the plain variant
  if "plain" in out["variants"]:
    for k in ("ours_test_psnr", "reference_test_psnr", "delta_db"):
      if k in out["variants"]["plain"]:
        out[k] = out["variants"]["plain"][k]
  save()
  print(f"wrote {out_path}")


if __name__ == "__main__":
  main()
