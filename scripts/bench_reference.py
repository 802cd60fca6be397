#!/usr/bin/env python3
"""Measure the PyTorch reference's training throughput (rays/sec).

Runs the reference's OWN hot loop (PlainNeRF forward -> MSE -> backward
-> Adam step; /root/reference/src/nerf.py:310-361, runner.py:647-850)
at the canonical `original` recipe's batch shape (crop 16x16 x 4 views
= 1024 rays/step, 64 samples/ray; reference makefile:8-13).

Harness accommodations (the reference cannot run unmodified on a
CPU-only box — both are recorded honestly in BASELINE.md):
  * torchvision is stubbed (only used by SpatialEncoder/StyleTransfer,
    not by this path);
  * nn.Module.cuda is a no-op (HashEncoder hardcodes `.cuda()` at
    src/neural_blocks.py:144 — the reference's own CPU bug).

Writes/updates BASELINE.json with the measured number and prints it.
"""
from __future__ import annotations

import json
import os
import sys
import time
import types

import torch


def _stub_torchvision():
  tv = types.ModuleType("torchvision")
  tv.models = types.ModuleType("torchvision.models")
  tfm = types.ModuleType("torchvision.transforms")
  tff = types.ModuleType("torchvision.transforms.functional")
  tv.transforms = tfm
  tfm.functional = tff
  sys.modules.update({
      "torchvision": tv,
      "torchvision.models": tv.models,
      "torchvision.transforms": tfm,
      "torchvision.transforms.functional": tff,
  })


def _build_model(nerf, kind: str, device: str):
  """The five canonical model families (BASELINE.json configs; makefile
  recipes original:8-13, ae:380-384, volsdf:21-28, dnerf:105-114).

  Three of them cannot run unmodified at the reference's HEAD — each
  workaround below measures the INTENDED behavior and favors the
  reference (recorded in BASELINE.md):
    * TinyNeRF: CommonNeRF.set_sigmoid touches self.refl, which a
      refl-less TinyNeRF never has (src/nerf.py:216-220) -> tolerate.
      Also its from_pts passes density with a trailing singleton into
      alpha_from_density (src/nerf.py:300-303), which broadcast-errors
      against dists*[B,H,W] — PlainNeRF squeezes (src/nerf.py:336) ->
      squeeze, measuring the intended behavior.
    * VolSDF.__init__ reads `with_transmission` where the parameter is
      named `w_transmission` (src/nerf.py:874 vs :898) — NameError on
      every construction -> inject the module global it looks up.
    * DynamicNeRF's direct-Δx path reads self.dp before assignment
      (src/nerf.py:1265) -> use the spline path (the makefile's dnerf
      recipe trains --spline 6 anyway, makefile:105-114).
  """
  from src import utils as rutils
  if not hasattr(nerf.CommonNeRF, "_orig_set_sigmoid"):
    nerf.CommonNeRF._orig_set_sigmoid = nerf.CommonNeRF.set_sigmoid

    def _safe_set_sigmoid(self, kind="thin"):
      try:
        nerf.CommonNeRF._orig_set_sigmoid(self, kind)
      except AttributeError:   # refl-less models (TinyNeRF)
        self.feat_act = rutils.load_sigmoid(kind)

    nerf.CommonNeRF.set_sigmoid = _safe_set_sigmoid
  nerf.with_transmission = False   # VolSDF ctor NameError (see above)

  common = dict(steps=64, t_near=2.0, t_far=6.0)
  if kind == "tiny":
    m = nerf.TinyNeRF(**common)

    def _squeezed_from_pts(pts, ts, r_o, r_d, refl_latent=None, _m=m):
      # reproduce from_pts with the density squeeze PlainNeRF applies
      # (src/nerf.py:300-303 vs :336) — upstream TinyNeRF broadcast bug
      latent = nerf.cat_not_none(_m.curr_latent(pts.shape),
                                 _m.mip_encoding(r_o, r_d, ts), dim=-1)
      density, feats = _m.estim(pts, latent).split([1, 3], dim=-1)
      _m.alpha, _m.weights = nerf.alpha_from_density(
          density[..., 0], ts, r_d)
      return (nerf.volumetric_integrate(_m.weights, _m.feat_act(feats))
              + _m.sky_color(None, _m.weights))

    m.from_pts = _squeezed_from_pts
    return m.to(device)
  if kind == "plain":
    return nerf.PlainNeRF(**common).to(device)
  if kind == "ae":
    return nerf.NeRFAE(**common).to(device)
  if kind == "volsdf":
    from src import march, refl as rrefl, sdf as rsdf
    shape = rsdf.MLP()
    refl_inst = rrefl.View(out_features=3,
                           latent_size=shape.intermediate_size)
    s = rsdf.SDF(shape, refl_inst, isect=march.bisect, t_near=2.0,
                 t_far=6.0)
    return nerf.VolSDF(s, **common).to(device)
  if kind == "dnerf":
    return nerf.DynamicNeRF(canonical=nerf.PlainNeRF(**common),
                            spline=6).to(device)
  raise ValueError(kind)


def _time_config(nerf, kind: str, device: str, steps_timed: int):
  model = _build_model(nerf, kind, device)
  opt = torch.optim.Adam(model.parameters(), lr=5e-4)
  B, H, W = 4, 16, 16                      # 1024 rays/step (makefile:8-13)
  g = torch.Generator().manual_seed(0)
  rays = torch.randn(B, H, W, 6, generator=g)
  rays[..., 3:] = torch.nn.functional.normalize(rays[..., 3:], dim=-1)
  rays = rays.to(device)
  target = torch.rand(B, H, W, 3, generator=g).to(device)
  times = torch.rand(B, generator=g).to(device)
  inp = (rays, times) if kind == "dnerf" else rays

  model.train()

  def step():
    opt.zero_grad()
    out = model(inp)
    loss = ((out[..., :3] - target) ** 2).mean()
    loss.backward()
    opt.step()
    return float(loss)

  for _ in range(3):
    step()                                  # warmup
  if device == "cuda":
    torch.cuda.synchronize()
  t0 = time.perf_counter()
  for _ in range(steps_timed):
    step()
  if device == "cuda":
    torch.cuda.synchronize()
  dt = time.perf_counter() - t0
  return steps_timed * B * H * W / dt


def main(ref_path: str = "/root/reference", steps_timed: int = 30,
         only=None):
  _stub_torchvision()
  if not torch.cuda.is_available():
    torch.nn.Module.cuda = lambda self, *a, **k: self  # ref's .cuda() bug
  sys.path.insert(0, ref_path)
  from src import nerf

  device = "cuda" if torch.cuda.is_available() else "cpu"
  base_path = os.path.join(os.path.dirname(os.path.dirname(
      os.path.abspath(__file__))), "BASELINE.json")
  kinds = ("tiny", "plain", "ae", "volsdf", "dnerf")
  if only:
    unknown = [k for k in only if k not in kinds]
    if unknown:  # error on typos BEFORE rewriting BASELINE.json
      raise SystemExit(f"unknown config kind(s) {unknown}; known: {kinds}")
  per_config = {}
  if only:
    # re-measure a subset, keeping the other configs' recorded numbers
    try:
      with open(base_path) as f:
        per_config = json.load(f)["measured_reference"][
            "per_config_rays_per_sec"]
    except Exception:  # noqa: BLE001
      pass
  for kind in (k for k in kinds if not only or k in only):
    try:
      per_config[kind] = round(_time_config(nerf, kind, device,
                                            steps_timed), 2)
    except Exception as e:  # noqa: BLE001 — record, keep measuring others
      per_config[kind] = f"error: {type(e).__name__}: {e}"
    print(f"# reference {kind}: {per_config[kind]} rays/s", file=sys.stderr)

  rays_per_sec = per_config.get("plain")
  result = {
      "reference_train_rays_per_sec": rays_per_sec,
      "per_config_rays_per_sec": per_config,
      "device": device,
      "torch_threads": torch.get_num_threads(),
      "config": "64 steps, 1024 rays/step, Adam (per-config table)",
      "timed_steps": steps_timed,
  }
  print(json.dumps(result))

  try:
    with open(base_path) as f:
      base = json.load(f)
  except Exception:  # noqa: BLE001
    base = {}
  base["measured_reference"] = result
  with open(base_path, "w") as f:
    json.dump(base, f, indent=2)
  return result


if __name__ == "__main__":
  main(only=sys.argv[1:] or None)
