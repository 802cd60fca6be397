#!/usr/bin/env python3
"""Generate numerical-parity fixtures from the PyTorch reference.

SURVEY §4 calls for "numerical-parity fixtures generated from the PyTorch
reference"; this script runs the reference's own code (/root/reference)
on seeded inputs and dumps input/output pairs to
`tests/fixtures/parity_reference.npz`. `tests/test_parity_reference.py`
then asserts our JAX ops reproduce each chain to fp32 tolerance WITHOUT
needing torch at test time.

Chains covered (reference file:line):
  * cumuprod_exclusive / alpha_from_density (softplus + relu) /
    volumetric_integrate       src/nerf.py:22-92
  * compute_pts_ts (linear + lindisp, no perturb)   src/nerf.py:29-55
  * NeRFCamera.sample_positions + project_pts       src/cameras.py:45-74
  * IPE: expected_sin / integrated_pos_enc_diag / conic + cylinder
    Gaussians / radii_x                             src/utils.py:23-140
  * laplace_cdf                                     src/utils.py:50-58
  * sigmoid zoo (fat/thin/upshifted[+relu/softplus])src/utils.py:484-513
  * de_casteljau / bezier_derivative / cubic_bezier src/nerf.py:1172-1206
  * eval_sh deg 0..4                                src/spherical_harmonics.py
  * fourier features (create_fourier_basis/fourier) src/utils.py:10-17
  * PositionalEncoder                               src/neural_blocks.py:14-34
  * SkipConnMLP forward (seeded weights, enc=None and FourierEncoder,
    latent, every init kind)                        src/neural_blocks.py:204-311

Run: python scripts/gen_parity_fixtures.py
(Re-run regenerates the .npz; the committed copy keeps the test hermetic.)

Harness accommodations (same as scripts/bench_reference.py): torchvision
stubbed, `.cuda()` no-op'd — neither affects these chains.
"""
from __future__ import annotations

import os
import sys
import types

import numpy as np
import torch

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "fixtures", "parity_reference.npz")


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


def main(ref_path: str = "/root/reference"):
  _stub_torchvision()
  if not torch.cuda.is_available():
    torch.nn.Module.cuda = lambda self, *a, **k: self
  sys.path.insert(0, ref_path)
  from src import nerf as rnerf
  from src import utils as rutils
  from src import cameras as rcams
  from src import neural_blocks as rblocks
  from src import spherical_harmonics as rsh

  torch.manual_seed(0)
  fx = {}

  def put(name, *tensors):
    for i, t in enumerate(tensors):
      fx[f"{name}_{i}"] = (t.detach().numpy() if torch.is_tensor(t)
                           else np.asarray(t))

  # ---- render core: alpha chain (src/nerf.py:22-92) -------------------
  T, B, H, W = 16, 2, 4, 4
  g = torch.Generator().manual_seed(1)
  density = torch.randn(T, B, H, W, generator=g) * 2.0
  ts = torch.linspace(2.0, 6.0, T)
  r_d = torch.randn(B, H, W, 3, generator=g)
  rgb = torch.rand(T, B, H, W, 3, generator=g)
  put("alpha_in", density, ts, r_d, rgb)
  for soft, tag in ((True, "softplus"), (False, "relu")):
    alpha, weights = rnerf.alpha_from_density(density, ts, r_d, softplus=soft)
    img = rnerf.volumetric_integrate(weights, rgb)
    put(f"alpha_out_{tag}", alpha, weights, img)
  pos = torch.rand(T, B, H, W, generator=g) + 0.1
  put("cumuprod", pos, rnerf.cumuprod_exclusive(pos))

  # ---- compute_pts_ts (src/nerf.py:29-55), no perturb -----------------
  rays = torch.randn(B, H, W, 6, generator=g)
  put("pts_in", rays)
  for lin, tag in ((False, "linear"), (True, "lindisp")):
    pts, ts2, r_o2, rd2, _ = rnerf.compute_pts_ts(rays, 2.0, 6.0, T,
                                                  lindisp=lin)
    put(f"pts_out_{tag}", pts, ts2, r_o2, rd2)

  # ---- NeRFCamera (src/cameras.py:45-74) ------------------------------
  n_cams, size = 3, 8
  angles = torch.linspace(0, 2 * np.pi * (n_cams - 1) / n_cams, n_cams)
  c2ws = []
  for a in angles:
    ca, sa = float(np.cos(a)), float(np.sin(a))
    rot = torch.tensor([[ca, 0.0, sa], [0.0, 1.0, 0.0], [-sa, 0.0, ca]])
    trans = rot @ torch.tensor([0.0, 0.0, 4.0])
    c2ws.append(torch.cat([rot, trans[:, None]], dim=-1))
  c2w = torch.stack(c2ws)                                   # [N, 3, 4]
  cam = rcams.NeRFCamera(cam_to_world=c2w.clone(), focal=8.0)
  u, v = torch.meshgrid(torch.arange(size, dtype=torch.float32),
                        torch.arange(size, dtype=torch.float32),
                        indexing="ij")
  positions = torch.stack([u, v], dim=-1)                   # [H, W, 2]
  cam_rays = cam.sample_positions(positions, size=size, with_noise=False)
  put("camera_in", c2w, np.float32(8.0), positions)
  put("camera_rays", cam_rays)

  # ---- IPE / mip (src/utils.py:23-140) --------------------------------
  x = torch.randn(5, 3, generator=g)
  x_var = torch.rand(5, 3, generator=g) * 0.3
  es_y, es_var = rutils.expected_sin(x, x_var)
  put("expected_sin", x, x_var, es_y, es_var)
  ipe = rutils.integrated_pos_enc_diag(x, x_var, 0, 8)
  put("ipe_diag", ipe)

  rd_grid = torch.randn(1, H, W, 3, generator=g)            # [B, H, W, 3]
  rad = rutils.radii_x(rd_grid)
  put("radii_x", rd_grid, rad)
  t0 = torch.linspace(2.0, 5.5, 8)
  t1 = torch.linspace(2.5, 6.0, 8)
  for ctor, tag in ((rutils.ConicGaussian, "conic"),
                    (rutils.CylinderGaussian, "cylinder")):
    mip = ctor(min_deg=0, max_deg=8)
    r_o_g = torch.randn(1, H, W, 3, generator=g)
    feats = mip(r_o_g, rd_grid, t0, t1)
    put(f"mip_{tag}", r_o_g, t0, t1, feats)

  # ---- laplace_cdf + sigmoid zoo --------------------------------------
  sd = torch.randn(64, generator=g) * 0.5
  put("laplace_cdf", sd, np.float32(0.1),
      rutils.laplace_cdf(sd, torch.tensor(0.1)))
  vals = torch.linspace(-6, 6, 101)
  put("sigmoid_in", vals)
  put("sigmoid_fat", rutils.fat_sigmoid(vals))
  put("sigmoid_thin", rutils.thin_sigmoid(vals))
  put("sigmoid_upshifted", rutils.upshifted_sigmoid(vals))
  put("sigmoid_upshifted_softplus", rutils.upshifted_softplus(vals))
  put("sigmoid_upshifted_relu", rutils.upshifted_relu(vals))

  # ---- Bezier (src/nerf.py:1172-1206) ---------------------------------
  N = 5
  coeffs = torch.randn(N, 7, 3, generator=g)
  t = torch.rand(7, 1, generator=g)
  put("bezier_in", coeffs, t)
  put("bezier_eval", rnerf.de_casteljau(coeffs.unsqueeze(1), t, N))
  put("bezier_deriv", rnerf.bezier_derivative(coeffs.unsqueeze(1), t, N))
  cub = torch.randn(4, 7, 3, generator=g)
  put("cubic_in", cub)
  put("cubic_eval", rnerf.cubic_bezier(cub, t, 4))

  # ---- spherical harmonics --------------------------------------------
  dirs = torch.nn.functional.normalize(torch.randn(9, 3, generator=g), dim=-1)
  put("sh_dirs", dirs)
  for deg in range(5):
    sh = torch.randn(9, 3, (deg + 1) ** 2, generator=g)
    put(f"sh_{deg}", sh, rsh.eval_sh(deg, sh, dirs))

  # ---- fourier features (src/utils.py:10-17) --------------------------
  basis = rutils.create_fourier_basis(16, features=3, freq=4.0, device="cpu")
  xf = torch.randn(11, 3, generator=g)
  put("fourier", basis, xf, rutils.fourier(xf, basis))

  # ---- PositionalEncoder (src/neural_blocks.py:14-34) -----------------
  for logs, tag in ((False, "lin"), (True, "log")):
    pe = rblocks.PositionalEncoder(input_dims=3, max_freq=4.0, N=6,
                                   log_sampling=logs)
    put(f"posenc_{tag}", pe.bands.detach(), pe(xf))

  # ---- SkipConnMLP forward (src/neural_blocks.py:204-311) -------------
  # Seeded weights are saved so the JAX side can transplant them into our
  # SkipConnMLP (reference wiring: init = cat(p, enc(p), latent); skip
  # concat at every i%skip==0 except the last layer; pre-activations).
  def dump_mlp(tag, mlp, inputs):
    sd = {k: v.detach().numpy() for k, v in mlp.state_dict().items()
          if "enc" not in k}
    for k, v in sd.items():
      fx[f"mlp_{tag}_w_{k}"] = v
    with torch.no_grad():
      out = mlp(*inputs)
    put(f"mlp_{tag}_io", *inputs, out)

  xin = torch.randn(13, 3, generator=g)
  for init in (None, "xavier", "siren", "kaiming", "zero"):
    torch.manual_seed(7)
    mlp = rblocks.SkipConnMLP(num_layers=5, hidden_size=32, in_size=3,
                              out=4, skip=3, enc=None, init=init)
    dump_mlp(f"plain_{init or 'default'}", mlp, (xin,))

  torch.manual_seed(8)
  latent = torch.randn(13, 6, generator=g)
  mlp = rblocks.SkipConnMLP(num_layers=4, hidden_size=24, in_size=3, out=2,
                            skip=2, latent_size=6, enc=None, init="xavier")
  dump_mlp("latent", mlp, (xin, latent))

  torch.manual_seed(9)
  enc = rblocks.FourierEncoder(input_dims=3, freqs=10, sigma=2.0,
                               device="cpu")
  mlp = rblocks.SkipConnMLP(num_layers=3, hidden_size=16, in_size=3, out=3,
                            skip=3, enc=enc, init="xavier")
  fx["mlp_fourier_basis"] = enc.basis.detach().numpy()
  dump_mlp("fourier", mlp, (xin,))

  # ---- HashEncoder (src/neural_blocks.py:92-194) -----------------------
  # small table so the committed npz stays compact; the uint32 index math
  # under test is size-independent. Includes negative coords (the
  # reference floors/hashes them without clamping).
  torch.manual_seed(11)
  he = rblocks.HashEncoder(emb_size=1 << 10, feat_size=2, levels=4)
  xh = torch.randn(37, 3, generator=g) * 1.5
  with torch.no_grad():
    hout = he(xh)
  fx["hash_emb"] = np.stack([e.weight.detach().numpy() for e in he.embs])
  put("hash_io", xh, hout)

  os.makedirs(os.path.dirname(OUT), exist_ok=True)
  np.savez_compressed(OUT, **fx)
  print(f"wrote {OUT}: {len(fx)} arrays")


if __name__ == "__main__":
  main()
