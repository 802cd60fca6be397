"""Numerical parity vs the PyTorch reference (SURVEY §4, BASELINE 0.1 dB bar).

Fixtures in tests/fixtures/parity_reference.npz are generated from the
reference's own code by scripts/gen_parity_fixtures.py (seeded inputs +
outputs; re-run it to regenerate). These tests assert our JAX ops
reproduce each reference chain to fp32 tolerance, torch-free at test time.

Layout mapping: the reference puts the sample axis T first ([T, B, H, W]);
we put it last ([..., T]) — fixtures are moveaxis'd accordingly.

Documented intentional deviations (also recorded in PARITY.md):
  * conic-frustum t_var uses the MipNeRF closed form hw^2/3 (the
    reference's hw/3 at src/utils.py:89 is dimensionally wrong) — tested
    against a corrected-reference recompute;
  * bezier_derivative scales by the correct degree factor N-1 (reference
    uses N) — exact scalar relation tested;
  * reference project_pts (src/cameras.py:67-74) is broken (elementwise
    product in place of a matmul, unused `untrans`) — no fixture.
"""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

FIX = os.path.join(os.path.dirname(__file__), "fixtures",
                   "parity_reference.npz")

pytestmark = pytest.mark.slow  # many small jit compiles on the 1-core host


@pytest.fixture(scope="module")
def fx():
  assert os.path.exists(FIX), (
      "run scripts/gen_parity_fixtures.py to generate parity fixtures")
  return dict(np.load(FIX))


def close(a, b, tol=2e-5):
  np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=tol,
                             atol=tol)


# ---------------------------------------------------------------------------
# render core: alpha chain (reference src/nerf.py:22-92)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("tag,softplus", [("softplus", True), ("relu", False)])
def test_alpha_chain(fx, tag, softplus):
  # torch's softplus switches to identity above threshold=20; jax computes
  # log1p(exp) throughout -> ~5e-5 fp32 divergence on the softplus path
  tol = 1e-4 if softplus else 2e-5
  from nerf_atlas_tpu.ops import integrate
  density = np.moveaxis(fx["alpha_in_0"], 0, -1)    # [B, H, W, T]
  ts = fx["alpha_in_1"]
  r_d = fx["alpha_in_2"]
  rgb = np.moveaxis(fx["alpha_in_3"], 0, -2)        # [B, H, W, T, 3]
  alpha, weights = integrate.alpha_from_density(
      jnp.asarray(density), jnp.asarray(ts), jnp.asarray(r_d),
      softplus=softplus)
  close(alpha, np.moveaxis(fx[f"alpha_out_{tag}_0"], 0, -1), tol=tol)
  close(weights, np.moveaxis(fx[f"alpha_out_{tag}_1"], 0, -1), tol=tol)
  img = integrate.volumetric_integrate(weights, jnp.asarray(rgb))
  close(img, fx[f"alpha_out_{tag}_2"], tol=tol)


def test_exclusive_cumprod(fx):
  from nerf_atlas_tpu.ops import integrate
  x = np.moveaxis(fx["cumuprod_0"], 0, -1)
  out = integrate.exclusive_cumprod(jnp.asarray(x))
  close(out, np.moveaxis(fx["cumuprod_1"], 0, -1))


@pytest.mark.parametrize("tag,lindisp", [("linear", False), ("lindisp", True)])
def test_compute_pts_ts(fx, tag, lindisp):
  from nerf_atlas_tpu.ops import rays as rays_ops
  rays = jnp.asarray(fx["pts_in_0"])
  T = fx[f"pts_out_{tag}_1"].shape[0]
  pts, ts, r_o, r_d = rays_ops.compute_pts_ts(rays, 2.0, 6.0, T,
                                              lindisp=lindisp)
  close(ts, fx[f"pts_out_{tag}_1"])
  close(pts, np.moveaxis(fx[f"pts_out_{tag}_0"], 0, -2))
  close(r_o, fx[f"pts_out_{tag}_2"])
  close(r_d, fx[f"pts_out_{tag}_3"])


# ---------------------------------------------------------------------------
# cameras (reference src/cameras.py:45-66)
# ---------------------------------------------------------------------------

def test_nerf_camera_rays(fx):
  from nerf_atlas_tpu.data.cameras import NeRFCamera
  c2w34 = fx["camera_in_0"]                          # [N, 3, 4]
  n = c2w34.shape[0]
  bottom = np.broadcast_to(
      np.array([0.0, 0, 0, 1], np.float32), (n, 1, 4))
  c2w = np.concatenate([c2w34, bottom], axis=1)
  cam = NeRFCamera(cam_to_world=jnp.asarray(c2w),
                   focal=jnp.asarray(fx["camera_in_1"]))
  rays = cam.sample_positions(jnp.asarray(fx["camera_in_2"]), size=8)
  close(rays, fx["camera_rays_0"], tol=1e-4)


# ---------------------------------------------------------------------------
# mip / IPE (reference src/utils.py:23-140)
# ---------------------------------------------------------------------------

def test_expected_sin_and_ipe(fx):
  from nerf_atlas_tpu.ops import mip
  x, x_var = jnp.asarray(fx["expected_sin_0"]), jnp.asarray(
      fx["expected_sin_1"])
  y, y_var = mip.expected_sin(x, x_var)
  close(y, fx["expected_sin_2"])
  close(y_var, fx["expected_sin_3"])
  close(mip.integrated_pos_enc_diag(x, x_var, 0, 8), fx["ipe_diag_0"])


def test_radii(fx):
  from nerf_atlas_tpu.ops import mip
  close(mip.radii_from_dirs(jnp.asarray(fx["radii_x_0"])), fx["radii_x_1"])


def test_cylinder_gaussian_full_chain_vs_corrected_reference(fx):
  """Full cylinder IPE chain vs a numpy recompute of the reference with
  its lift_gaussian layout bug fixed: the reference builds `mean` with T
  LAST ([..., 3, T]) but `cov` with T second-to-last ([..., T, 3]), then
  movedim(-1, 0)'s both (src/utils.py:60-72) — the cov axes end up
  scrambled by the reshape inside integrated_pos_enc_diag for image-grid
  inputs, so the raw fixture output is garbage for the variance half.
  Ours keeps mean/cov layouts consistent (Monte-Carlo-verified in
  test_ops_core.py); here we check the full chain against the corrected
  recompute."""
  from nerf_atlas_tpu.ops import mip
  r_o = fx["mip_cylinder_0"]
  t0, t1 = fx["mip_cylinder_1"], fx["mip_cylinder_2"]
  r_d = fx["radii_x_0"]
  rad = np.asarray(mip.radii_from_dirs(jnp.asarray(r_d)))
  t_mean = (t1 + t0) / 2
  r_var = rad * rad / 4
  t_var = (t1 - t0) ** 2 / 12
  magn_sq = np.maximum((r_d**2).sum(-1, keepdims=True), 1e-10)
  outer = r_d**2
  null_outer = 1 - outer / magn_sq
  mean = t_mean[:, None] * r_d[..., None, :] + r_o[..., None, :]
  cov = (t_var[:, None] * outer[..., None, :]
         + r_var[..., :, None] * null_outer[..., None, :])
  scales = np.exp2(np.arange(0, 8, dtype=np.float32))
  y = (mean[..., None, :] * scales[:, None]).reshape(mean.shape[:-1] + (-1,))
  y_var = (cov[..., None, :] * (scales**2)[:, None]).reshape(
      cov.shape[:-1] + (-1,))
  yy = np.concatenate([y, y + 0.5 * np.pi], axis=-1)
  vv = np.concatenate([y_var, y_var], axis=-1)
  expected = np.exp(-0.5 * vv) * np.sin(yy)
  feats = mip.CylinderGaussian(min_deg=0, max_deg=8)(
      jnp.asarray(r_o), jnp.asarray(r_d), jnp.asarray(t0), jnp.asarray(t1),
      jnp.asarray(rad))
  close(feats, expected, tol=1e-4)


def test_conic_gaussian_vs_corrected_reference(fx):
  """The reference's conic t_var uses hw/3 (src/utils.py:89) where MipNeRF's
  closed form is hw^2/3; ours implements the corrected form. Check our
  Gaussian against a numpy recompute of the reference pipeline with only
  that term fixed."""
  from nerf_atlas_tpu.ops import mip
  t0, t1 = fx["mip_conic_1"], fx["mip_conic_2"]
  r_d = fx["radii_x_0"]
  rad = np.asarray(mip.radii_from_dirs(jnp.asarray(r_d)))
  mu, hw = (t1 + t0) / 2, (t1 - t0) / 2
  mu2, hw2 = mu * mu, hw * hw
  hw4 = hw2 * hw2
  denom = 3 * mu2 + hw2
  t_mean = mu + (2 * mu * hw2) / denom
  t_var = hw2 / 3 - (4 / 15) * ((hw4 * (12 * mu2 - hw2)) / denom**2)
  r_var = rad * rad * (mu2 / 4 + (5 / 12) * hw2 - (4 / 15) * hw4 / denom)
  # reference lift_gaussian (src/utils.py:60-72), T moved last
  magn_sq = np.maximum((r_d**2).sum(-1, keepdims=True), 1e-10)
  outer = r_d**2
  null_outer = 1 - outer / magn_sq
  mean_ref = t_mean[..., :, None] * r_d[..., None, :]
  cov_ref = (t_var[..., :, None] * outer[..., None, :]
             + r_var[..., :, None] * null_outer[..., None, :])
  mean, cov = mip.conical_frustum_to_gaussian(
      jnp.asarray(r_d), jnp.asarray(t0), jnp.asarray(t1), jnp.asarray(rad))
  close(mean, mean_ref)
  close(cov, cov_ref, tol=1e-4)


# ---------------------------------------------------------------------------
# scalar math (reference src/utils.py)
# ---------------------------------------------------------------------------

def test_laplace_cdf(fx):
  from nerf_atlas_tpu.ops import math as m
  close(m.laplace_cdf(jnp.asarray(fx["laplace_cdf_0"]),
                      float(fx["laplace_cdf_1"])), fx["laplace_cdf_2"])


@pytest.mark.parametrize("kind", ["fat", "thin", "upshifted",
                                  "upshifted_softplus", "upshifted_relu"])
def test_sigmoid_zoo(fx, kind):
  from nerf_atlas_tpu.ops import math as m
  fn = {"fat": m.fat_sigmoid, "thin": m.thin_sigmoid,
        "upshifted": m.upshifted_sigmoid,
        "upshifted_softplus": m.upshifted_softplus,
        "upshifted_relu": m.upshifted_relu}[kind]
  tol = 1e-4 if "softplus" in kind else 2e-5  # torch softplus threshold
  close(fn(jnp.asarray(fx["sigmoid_in_0"])), fx[f"sigmoid_{kind}_0"], tol=tol)


# ---------------------------------------------------------------------------
# bezier (reference src/nerf.py:1172-1206)
# ---------------------------------------------------------------------------

def test_de_casteljau(fx):
  from nerf_atlas_tpu.ops import bezier
  coeffs = jnp.asarray(fx["bezier_in_0"])[:, None]   # [N, 1, 7, 3]
  t = jnp.asarray(fx["bezier_in_1"])
  close(bezier.de_casteljau(coeffs, t, 5), fx["bezier_eval_0"])


def test_bezier_derivative_scaling(fx):
  """Ours uses the correct degree factor N-1; the reference scales by N.
  Exact relation: ref = ours * N / (N - 1)."""
  from nerf_atlas_tpu.ops import bezier
  N = 5
  coeffs = jnp.asarray(fx["bezier_in_0"])[:, None]
  t = jnp.asarray(fx["bezier_in_1"])
  ours = bezier.bezier_derivative(coeffs, t, N)
  close(np.asarray(ours) * N / (N - 1), fx["bezier_deriv_0"], tol=1e-4)


def test_cubic_bezier(fx):
  from nerf_atlas_tpu.ops import bezier
  close(bezier.cubic_bezier(jnp.asarray(fx["cubic_in_0"]),
                            jnp.asarray(fx["bezier_in_1"]), 4),
        fx["cubic_eval_0"])


# ---------------------------------------------------------------------------
# spherical harmonics (reference src/spherical_harmonics.py:55-106)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("deg", [0, 1, 2, 3, 4])
def test_eval_sh(fx, deg):
  from nerf_atlas_tpu.ops import sh
  close(sh.eval_sh(deg, jnp.asarray(fx[f"sh_{deg}_0"]),
                   jnp.asarray(fx["sh_dirs_0"])), fx[f"sh_{deg}_1"])


# ---------------------------------------------------------------------------
# encoders (reference src/utils.py:10-17, src/neural_blocks.py:14-34)
# ---------------------------------------------------------------------------

def test_fourier_features(fx):
  """Our FourierEncoder computes cat(sin(2π·xB), cos(2π·xB)); the reference
  omits the 2π (src/utils.py:15-17). Transplant with B_ours = basis/(2π)."""
  from nerf_atlas_tpu.nn import FourierEncoder
  basis = fx["fourier_0"]
  enc = FourierEncoder(input_dims=3, freqs=basis.shape[1])
  params = {"params": {"B": jnp.asarray(basis / (2 * np.pi))}}
  out = enc.apply(params, jnp.asarray(fx["fourier_1"]))
  close(out, fx["fourier_2"], tol=1e-4)


@pytest.mark.parametrize("tag,log", [("lin", False), ("log", True)])
def test_positional_encoder(fx, tag, log):
  from nerf_atlas_tpu.nn import PositionalEncoder
  pe = PositionalEncoder(input_dims=3, max_freq_log2=4.0,
                         min_freq_log2=1.0 if log else 0.0,
                         num_freqs=6, log_sampling=log, include_input=False)
  bands = np.asarray(
      2.0 ** np.linspace(1.0, 4.0, 6) if log
      else np.linspace(1.0, 2.0**4.0, 6), np.float32)
  close(bands, fx[f"posenc_{tag}_0"])                 # band convention
  out = pe.apply({}, jnp.asarray(fx["fourier_1"]))
  close(out, fx[f"posenc_{tag}_1"], tol=1e-4)


# ---------------------------------------------------------------------------
# SkipConnMLP weight-transplant parity (reference src/neural_blocks.py:204-311)
# ---------------------------------------------------------------------------

def _transplant(fx, tag, num_layers):
  """Torch state_dict arrays -> our flax param tree (kernel = weight.T)."""
  def lin(name):
    return {"kernel": jnp.asarray(fx[f"mlp_{tag}_w_{name}.weight"].T),
            "bias": jnp.asarray(fx[f"mlp_{tag}_w_{name}.bias"])}
  p = {"layer_in": lin("init"), "layer_out": lin("out")}
  for i in range(num_layers):
    p[f"layer_{i}"] = lin(f"layers.{i}")
  return p


@pytest.mark.parametrize("init", ["default", "xavier", "siren", "kaiming",
                                  "zero"])
def test_skipconnmlp_transplant_plain(fx, init):
  """Identical weights -> identical outputs, for every reference init kind
  (init only changes the weight values; the wiring is what's under test)."""
  from nerf_atlas_tpu.nn import SkipConnMLP
  tag = f"plain_{init}"
  mlp = SkipConnMLP(in_size=3, out=4, num_layers=5, hidden_size=32, skip=3)
  params = {"params": _transplant(fx, tag, 5)}
  out = mlp.apply(params, jnp.asarray(fx[f"mlp_{tag}_io_0"]))
  close(out, fx[f"mlp_{tag}_io_1"], tol=1e-4)


def test_skipconnmlp_transplant_latent(fx):
  from nerf_atlas_tpu.nn import SkipConnMLP
  mlp = SkipConnMLP(in_size=3, out=2, num_layers=4, hidden_size=24, skip=2,
                    latent_size=6)
  params = {"params": _transplant(fx, "latent", 4)}
  out = mlp.apply(params, jnp.asarray(fx["mlp_latent_io_0"]),
                  jnp.asarray(fx["mlp_latent_io_1"]))
  close(out, fx["mlp_latent_io_2"], tol=1e-4)


def test_skipconnmlp_transplant_fourier_enc(fx):
  from nerf_atlas_tpu.nn import FourierEncoder, SkipConnMLP
  basis = fx["mlp_fourier_basis"]
  mlp = SkipConnMLP(in_size=3, out=3, num_layers=3, hidden_size=16, skip=3,
                    enc=FourierEncoder(input_dims=3, freqs=basis.shape[1]))
  p = _transplant(fx, "fourier", 3)
  p["enc"] = {"B": jnp.asarray(basis / (2 * np.pi))}
  out = mlp.apply({"params": p}, jnp.asarray(fx["mlp_fourier_io_0"]))
  close(out, fx["mlp_fourier_io_1"], tol=1e-4)


# ---------------------------------------------------------------------------
# HashEncoder (reference src/neural_blocks.py:92-194) — transplant parity
# ---------------------------------------------------------------------------

def test_ref_hash_encoder_transplant(fx):
  """The reference's hash tables, moved into RefHashEncoder, reproduce its
  outputs exactly — including its descending-resolution schedule bug and
  signed-coordinate hashing (negative floors xor'd and mod'd like torch
  int64; our uint32 math is residue-identical)."""
  from nerf_atlas_tpu.nn import RefHashEncoder
  emb = fx["hash_emb"]                       # [levels, T, F]
  enc = RefHashEncoder(levels=emb.shape[0], emb_size=emb.shape[1],
                       feat_size=emb.shape[2])
  params = {"params": {"emb": jnp.asarray(emb.reshape(-1, emb.shape[-1]))}}
  out = enc.apply(params, jnp.asarray(fx["hash_io_0"]))
  close(out, fx["hash_io_1"], tol=1e-5)
