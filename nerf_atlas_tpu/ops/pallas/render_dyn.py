"""Fused render megakernel for the flagship D-NeRF path.

Extends the static PlainNeRF-CP megakernel (render.py) with the dynamic
warp (reference src/nerf.py:1209-1319): per-ray time rides in as one more
input column, a Fourier-encoded warp MLP emits Δx, a small rigidity MLP
gates it, and the warped points feed the identical canonical CP chain —
all inside one pallas_call per ray block.

  ray, t → T sample points → Δx = warp(x, t)·σ(rigidity(x))
        → canonical: CP encode → density MLP → view-refl MLP
        → α-composite → rgb ‖ acc

Spline-NeRF mode (spline_points=S>=2, the reference repo's paper model,
src/nerf.py:1240-1263): the warp MLP sees x only and emits 3(S-1) Bezier
control points (P_0 pinned to 0); Δx = de Casteljau at per-ray t. The
combine is linear in the control points, so the backward scatters the
Δx cotangent into each control slot scaled by its Bernstein weight —
exactly the adjoint of the forward's repeated lerp.

Backward (custom VJP, recompute-in-VMEM like the static kernel) also
differentiates THROUGH the warp: the canonical chain's position
cotangent flows along three paths — the CP hat basis (piecewise-linear
derivative), the density MLP's raw-input columns, and the refl MLP's
position columns — into d(Δx), then through the rigidity gate and the
warp MLP weight gradients. The warp's Fourier basis is stop_gradient in
the oracle (nn/encoders.py FourierEncoder), so it gets a zero cotangent.

Oracle: models.DynamicNeRF(canonical PlainNeRF-CP, spline_points=0 or
S>=2); parity for both modes in tests/test_pallas_dyn.py (interpret).
"""
from __future__ import annotations

import functools
import math
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .render import (
    CP_RESOLUTIONS, CP_RANK, ENC_DIM, HIDDEN, IN_DIM, INTERMEDIATE,
    N_LAYERS, R_HIDDEN, R_LAYERS, SKIP, DEFAULT_BLOCK_RAYS, BWD_BLOCK_RAYS,
    _composite_bwd, _composite_fwd, _cp_bwd, _cp_fwd, _cos_approx,
    _dists_base, _dot, _dot_nt, _dot_t, _leaky_act, _leaky_grad,
    _linspace_ts, _mlp_bwd, _mlp_fwd, _pack_lines, _posenc_bwd,
    _posenc_fwd, _rgb_act_grad, _sin_approx, _sin30_act, _sin30_grad,
    _write_outputs,
)

# warp architecture (models/dyn.py DynamicNeRF defaults, spline_points=0)
W_IN = 4                                   # (x, y, z, t)
W_FREQS = 32                               # FourierEncoder freqs
W_ENC = 2 * W_FREQS                        # sin ‖ cos
W_FEAT = W_IN + W_ENC                      # MLP init features
W_HIDDEN = 256
W_LAYERS = 5
# rigidity MLP (models/dyn.py:60-62)
G_HIDDEN = 64
G_LAYERS = 3

_TWO_PI = 2.0 * math.pi


def _fourier_feats(x, basis):
  """FourierEncoder features (nn/encoders.py): cat(sin, cos)(2π·xB).

  PRECISION: the projection must run in f32 — with σ=16 the phases reach
  hundreds of radians, so a bf16 matmul (0.4% relative) injects ~1 rad of
  phase noise and decorrelates the features (and every warp gradient)
  from the f32 oracle. The [4, 32] basis also stays f32 (see _cast_ws).
  """
  mapped = _TWO_PI * jax.lax.dot_general(
      x.astype(jnp.float32), basis.astype(jnp.float32),
      dimension_numbers=(((1,), (0,)), ((), ())),
      preferred_element_type=jnp.float32)
  return jnp.concatenate(
      [_sin_approx(mapped), _cos_approx(mapped)], axis=-1)


def _bernstein_weights(t, n):
  """B_{j,n}(t) = C(n,j) t^j (1-t)^{n-j} for j = 1..n as [P,1] f32 arrays.

  The spline combine Σ_j B_j·ctrl_j is the SAME linear map de Casteljau
  evaluates, so these weights give the exact adjoint of the forward's
  repeated-lerp form (ops/bezier.de_casteljau)."""
  t = t.astype(jnp.float32)
  om = 1.0 - t
  tp = [t]
  op = [om]
  for _ in range(n - 1):
    tp.append(tp[-1] * t)
    op.append(op[-1] * om)
  out = []
  for j in range(1, n + 1):
    c = float(math.comb(n, j))
    w = c * tp[j - 1]
    if n - j > 0:
      w = w * op[n - j - 1]
    out.append(w)
  return out


def _spline_eval(warp_out, t_col, spline_points):
  """Bezier Δx from warp control points: warp_out [P, 3(S-1)] holds
  P_1..P_{S-1} (P_0 pinned to 0, models/dyn.py:76-87); de Casteljau
  repeated lerp at per-sample t — the oracle's exact form."""
  n = spline_points - 1
  t = t_col.astype(jnp.float32)
  cur = [jnp.zeros_like(warp_out[:, 0:3], dtype=jnp.float32)]
  cur += [warp_out[:, 3 * j:3 * j + 3].astype(jnp.float32)
          for j in range(n)]
  for _ in range(n):
    cur = [(1.0 - t) * cur[j] + t * cur[j + 1] for j in range(len(cur) - 1)]
  return cur[0]


def _warp_fwd(pts, t_col, basis, wbs_w, wbs_g, stash=None,
              spline_points=0):
  """Δx and gate at (pts [P,3], t [P,1]) -> (dp [P,3], gate [P,1]).

  spline_points=0: direct D-NeRF Δx(x, t). spline_points=S>=2:
  Spline-NeRF — the warp MLP sees x only and emits 3(S-1) Bezier control
  points, evaluated at t (models/dyn.py:69-88).

  `stash`, when given, is a dict receiving the MLP pre-activation chains
  plus init_w/gate/warp_out/spl for the backward kernel's recompute.
  """
  if spline_points:
    x_in = pts
  else:
    x_in = jnp.concatenate([pts, t_col], axis=-1)
  fenc = _fourier_feats(x_in, basis)
  init_w = jnp.concatenate([x_in.astype(jnp.bfloat16),
                            fenc.astype(jnp.bfloat16)], axis=-1)
  w_stash = [] if stash is not None else None
  warp_out = _mlp_fwd(init_w, wbs_w, _leaky_act, W_LAYERS, stash=w_stash)
  if spline_points:
    spl = _spline_eval(warp_out, t_col, spline_points)
  else:
    spl = warp_out
  g_stash = [] if stash is not None else None
  rig_out = _mlp_fwd(pts.astype(jnp.bfloat16), wbs_g, _leaky_act, G_LAYERS,
                     stash=g_stash)
  gate = jax.nn.sigmoid(rig_out)                          # [P, 1]
  if stash is not None:
    stash["warp"] = w_stash
    stash["rig"] = g_stash
    stash["init_w"] = init_w
    stash["gate"] = gate
    stash["warp_out"] = warp_out
    stash["spl"] = spl
  return spl * gate, gate


def _dyn_kernel(rays_ref, elaz_ref, times_ref, ts_ref, dists_ref, *refs,
                steps, block_rays, sigmoid_kind="thin", sky_white=False,
                spline_points=0, want_dp=False, enc_kind="cp"):
  """Forward: refs = [fourier_B, warp wbs, rigidity wbs, packed CP (cp
  only), density wbs, refl wbs, out_ref]. enc_kind "posenc" swaps the
  canonical CP volume for the closed-form frequency bands (no params)."""
  out_ref = refs[-1]
  wrefs = refs[:-1]
  widx = [0]

  def next_w():
    r = wrefs[widx[0]]
    widx[0] += 1
    return r

  B, T = block_rays, steps
  P = B * T

  rays = rays_ref[:, :]
  r_o, r_d = rays[:, 0:3], rays[:, 3:6]
  ts = ts_ref[:, :]
  pts = (r_o[:, None, :] + ts[0][None, :, None] * r_d[:, None, :]
         ).reshape(P, 3)
  t_ray = times_ref[:, 0:1]                               # [B, 1]
  t_col = jnp.broadcast_to(t_ray[:, None, :], (B, T, 1)).reshape(P, 1)

  basis = next_w()[...]

  def wbs(n_layers):
    return [(next_w()[...], next_w()[...]) for _ in range(n_layers + 2)]

  dp, _ = _warp_fwd(pts, t_col, basis, wbs(W_LAYERS), wbs(G_LAYERS),
                    spline_points=spline_points)
  warped = pts + dp

  if enc_kind == "cp":
    pw = next_w()[...]
    enc, _ = _cp_fwd(warped, pw)
  else:
    enc = _posenc_fwd(warped)
  init_feat = jnp.concatenate([warped.astype(jnp.bfloat16), enc], axis=-1)
  first_out = _mlp_fwd(init_feat, wbs(N_LAYERS), _leaky_act, N_LAYERS)
  density = first_out[:, 0:1]
  feats = first_out[:, 1:1 + INTERMEDIATE]

  elaz = elaz_ref[:, 0:2]
  elaz_p = jnp.broadcast_to(elaz[:, None, :], (B, T, 2)).reshape(P, 2)
  r_in = jnp.concatenate([warped, elaz_p, feats], axis=-1)
  rgb_raw = _mlp_fwd(r_in.astype(jnp.bfloat16), wbs(R_LAYERS), _sin30_act,
                     R_LAYERS)
  rgb, _ = _rgb_act_grad(rgb_raw, sigmoid_kind)

  weights, _, _, _, _ = _composite_fwd(density, r_d, dists_ref[:, :], B, T)
  _write_outputs(out_ref, rgb, weights, B, T, sky_white)
  if want_dp:
    # --dp-weight runs IN-KERNEL (like the VolSDF eikonal column): the
    # 5th output is the per-ray mean squared deformation, so
    # mean(out[:, 4]) over the batch == the oracle's
    # regularizers.delta_x = mean(dp**2) over [N, T, 3]
    m = jnp.mean(jnp.square(dp), axis=-1)                 # [P]
    out_ref[:, 4:5] = jnp.mean(m.reshape(B, T), axis=-1, keepdims=True)


# flat weight list length: B + warp (7×2) + rigidity (5×2) + CP lines
# (cp only) + density (7×2) + refl (7×2)
def _n_ws_dyn(enc_kind: str = "cp") -> int:
  return (1 + 2 * (W_LAYERS + 2) + 2 * (G_LAYERS + 2)
          + (len(CP_RESOLUTIONS) if enc_kind == "cp" else 0)
          + 2 * (N_LAYERS + 2) + 2 * (R_LAYERS + 2))


N_WS_DYN = _n_ws_dyn("cp")


def _dyn_bwd_kernel(rays_ref, elaz_ref, times_ref, g_ref, ts_ref, dists_ref,
                    *refs, steps, block_rays,
                    sigmoid_kind="thin", sky_white=False, spline_points=0,
                    want_dp=False, enc_kind="cp", loss_scale=None,
                    dp_coeff=0.0):
  """refs = (packed_ref?, *w_refs, *dw_refs) in `_flatten_params_dyn`
  order; for enc_kind "cp", packed_ref is the packed CP block-diagonal
  (per-level grads still scatter to the per-level grefs). posenc carries
  no packed tensor and no encoder gradients (closed-form bands).

  loss_scale: one-kernel train-step mode (render.py `_render_bwd_kernel`
  doc) — g_ref carries the [B, 4] TARGET, refs trails the loss
  accumulator, and with want_dp the --dp-weight regularizer
  dp_coeff·mean(dp²) folds into the same scaled accumulator (its
  cotangent is the constant dp_coeff/N per ray-column)."""
  loss_ref = None
  if loss_scale is not None:
    loss_ref, refs = refs[-1], refs[:-1]
  if enc_kind == "cp":
    packed_ref, refs = refs[0], refs[1:]
  nw = _n_ws_dyn(enc_kind)
  wrefs = refs[:nw]
  grefs = refs[nw:]
  assert len(grefs) == nw

  @pl.when(pl.program_id(0) == 0)
  def _zero():
    for r in grefs:
      r[...] = jnp.zeros(r.shape, r.dtype)
    if loss_ref is not None:
      loss_ref[...] = jnp.zeros(loss_ref.shape, loss_ref.dtype)

  B, T = block_rays, steps
  P = B * T
  L = len(CP_RESOLUTIONS) if enc_kind == "cp" else 0

  # weight list offsets (must mirror _flatten_params_dyn)
  OFF_W = 1                                   # warp wbs
  OFF_G = OFF_W + 2 * (W_LAYERS + 2)          # rigidity wbs
  OFF_L = OFF_G + 2 * (G_LAYERS + 2)          # CP lines (per level, cp)
  OFF_D = OFF_L + L                           # density wbs
  OFF_R = OFF_D + 2 * (N_LAYERS + 2)          # refl wbs

  def pair(base, k):
    return wrefs[base + 2 * k][...], wrefs[base + 2 * k + 1][...]

  def acc(base, k, dW, db):
    grefs[base + 2 * k][...] += dW
    grefs[base + 2 * k + 1][...] += db

  rays = rays_ref[:, :]
  r_o, r_d = rays[:, 0:3], rays[:, 3:6]
  ts = ts_ref[:, :]
  pts = (r_o[:, None, :] + ts[0][None, :, None] * r_d[:, None, :]
         ).reshape(P, 3)
  t_ray = times_ref[:, 0:1]
  t_col = jnp.broadcast_to(t_ray[:, None, :], (B, T, 1)).reshape(P, 1)

  basis = wrefs[0][...]
  wbs_w = [pair(OFF_W, k) for k in range(W_LAYERS + 2)]
  wbs_g = [pair(OFF_G, k) for k in range(G_LAYERS + 2)]
  wbs_d = [pair(OFF_D, k) for k in range(N_LAYERS + 2)]
  wbs_r = [pair(OFF_R, k) for k in range(R_LAYERS + 2)]

  # ---- forward recompute with stashes ----
  wstash = {}
  dp, gate = _warp_fwd(pts, t_col, basis, wbs_w, wbs_g, stash=wstash,
                       spline_points=spline_points)
  warped = pts + dp

  if enc_kind == "cp":
    pw = packed_ref[...]
    enc, cp_stash = _cp_fwd(warped, pw)
  else:
    enc = _posenc_fwd(warped)
  d_feat = jnp.concatenate([warped.astype(jnp.bfloat16), enc], axis=-1)
  d_hs = []
  first_out = _mlp_fwd(d_feat, wbs_d, _leaky_act, N_LAYERS, stash=d_hs)
  density = first_out[:, 0:1]
  feats = first_out[:, 1:1 + INTERMEDIATE]

  elaz = elaz_ref[:, 0:2]
  elaz_p = jnp.broadcast_to(elaz[:, None, :], (B, T, 2)).reshape(P, 2)
  r_in = jnp.concatenate([warped, elaz_p, feats], axis=-1
                         ).astype(jnp.bfloat16)
  r_zs = []
  rgb_raw = _mlp_fwd(r_in, wbs_r, _sin30_act, R_LAYERS, stash=r_zs)
  rgb, dact = _rgb_act_grad(rgb_raw, sigmoid_kind)

  weights, alpha, trans, one_m_alpha, dists = _composite_fwd(
      density, r_d, dists_ref[:, :], B, T)

  if loss_scale is None:
    g = g_ref[:, :]
  else:
    from .render import _loss_mode_cotangent
    g = _loss_mode_cotangent(loss_scale, rgb, weights, g_ref, loss_ref,
                             B, T, sky_white)
    if want_dp:
      # dp_coeff arrives pre-divided by N_rays: fold dp_coeff·mean(dp²)
      # into the scaled loss and emit its constant per-ray cotangent
      m = jnp.mean(jnp.mean(jnp.square(dp), axis=-1).reshape(B, T),
                   axis=-1, keepdims=True)                    # [B, 1]
      loss_ref[...] += jnp.broadcast_to(
          dp_coeff * jnp.sum(m, axis=0, keepdims=True), loss_ref.shape)
      g = jnp.concatenate(
          [g, jnp.full((B, 1), dp_coeff, jnp.float32)], axis=-1)

  # ---- backward: compositing → refl → density → CP (with d_warped) ----
  drgb, ddensity = _composite_bwd(g[:, 0:4], rgb, density, weights,
                                  alpha, trans, one_m_alpha, dists, B, T,
                                  sky_white)
  drgb_raw = drgb * dact

  dr_in, r_grads = _mlp_bwd(drgb_raw, r_zs, r_in, wbs_r, _sin30_act,
                            _sin30_grad, R_LAYERS, R_HIDDEN)
  for k, (dW, db) in enumerate(r_grads):
    acc(OFF_R, k, dW, db)
  dfeats = dr_in[:, 5:5 + INTERMEDIATE]
  d_warped = dr_in[:, 0:3]                    # refl consumes warped pos

  d_first = jnp.concatenate([ddensity, dfeats], axis=-1)
  d_featg, d_grads = _mlp_bwd(d_first, d_hs, d_feat, wbs_d, _leaky_act,
                              _leaky_grad, N_LAYERS, HIDDEN)
  for k, (dW, db) in enumerate(d_grads):
    acc(OFF_D, k, dW, db)
  d_warped = d_warped + d_featg[:, 0:IN_DIM]  # density raw-input columns
  denc = d_featg[:, IN_DIM:]

  if enc_kind == "cp":
    dls, d_pts_enc = _cp_bwd(denc, cp_stash, pw, want_dpts=True)
    for axis in range(3):
      dl = dls[axis]
      r0, k0 = 0, 0
      for li, R in enumerate(CP_RESOLUTIONS):
        grefs[OFF_L + li][axis] = (grefs[OFF_L + li][axis]
                                   + dl[r0:r0 + R, k0:k0 + CP_RANK])
        r0 += R
        k0 += CP_RANK
  else:
    # posenc has no params; its pts cotangent folds back to the warp
    d_pts_enc = _posenc_bwd(denc, warped)
  d_warped = d_warped + d_pts_enc

  if want_dp:
    # dp-reg adjoint: col 4 = (1/(3T)) Σ_{t,a} dp², so each sample adds
    # g5(ray) · 2·dp/(3T) directly to the dp cotangent (dp reaches the
    # output through warped pts AND this column)
    cd = g[:, 4:5] / float(T)                              # [B, 1]
    cd_p = jnp.broadcast_to(cd[:, None, :], (B, T, 1)).reshape(P, 1)
    d_warped = d_warped + cd_p * ((2.0 / 3.0) * dp)

  # ---- backward: warp + rigidity (d_dp = d_warped; pts are leaves) ----
  spl = wstash["spl"]
  d_spl = d_warped * gate                                 # [P, 3]
  dgate = jnp.sum(d_warped * spl, axis=-1, keepdims=True)
  drig = dgate * gate * (1.0 - gate)                      # σ' = σ(1-σ)
  if spline_points:
    # the spline combine is linear in the control points: the adjoint
    # scatters d_spl into each control slot scaled by its Bernstein
    # weight (exactly de Casteljau's linear map; P_0 is pinned -> no slot)
    bw = _bernstein_weights(t_col, spline_points - 1)
    d_warp_out = jnp.concatenate([b * d_spl for b in bw], axis=-1)
  else:
    d_warp_out = d_spl

  _, w_grads = _mlp_bwd(d_warp_out.astype(jnp.float32), wstash["warp"],
                        wstash["init_w"], wbs_w, _leaky_act, _leaky_grad,
                        W_LAYERS, W_HIDDEN)
  for k, (dW, db) in enumerate(w_grads):
    acc(OFF_W, k, dW, db)
  _, g_grads = _mlp_bwd(drig, wstash["rig"], pts.astype(jnp.bfloat16),
                        wbs_g, _leaky_act, _leaky_grad, G_LAYERS, G_HIDDEN)
  for k, (dW, db) in enumerate(g_grads):
    acc(OFF_G, k, dW, db)
  # fourier basis is stop_gradient in the oracle -> zero cotangent
  # (grefs[0] stays zeroed)


def _flatten_params_dyn(params, enc_kind: str = "cp") -> Sequence[jnp.ndarray]:
  """DynamicNeRF(plain-cp|posenc) param pytree -> flat list in kernel
  order (posenc has no encoder leaves)."""
  p = params["params"]
  wm, gm = p["warp"], p["rigidity"]
  cm = p["canonical"]
  dm, rm = cm["density_mlp"], cm["refl"]["mlp"]
  ws = [wm["enc"]["B"]]

  def add(layer):
    ws.append(layer["kernel"])
    ws.append(layer["bias"][None, :])

  def add_mlp(m, n_layers):
    add(m["layer_in"])
    for i in range(n_layers):
      add(m[f"layer_{i}"])
    add(m["layer_out"])

  add_mlp(wm, W_LAYERS)
  add_mlp(gm, G_LAYERS)
  if enc_kind == "cp":
    for li in range(len(CP_RESOLUTIONS)):
      ws.append(dm["enc"][f"lines_{li}"])
  add_mlp(dm, N_LAYERS)
  add_mlp(rm, R_LAYERS)
  return ws


def _common_specs(block_rays, steps):
  return [pl.BlockSpec((block_rays, 6), lambda i: (i, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((block_rays, 2), lambda i: (i, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((block_rays, 1), lambda i: (i, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, steps), lambda i: (0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, steps), lambda i: (0, 0),
                       memory_space=pltpu.VMEM)]


def _dyn_forward_call(ws, rays, elaz, times, ts, dists, *, steps,
                      block_rays, interpret, sigmoid_kind="thin",
                      sky_white=False, spline_points=0, want_dp=False,
                      enc_kind="cp"):
  if enc_kind == "cp":
    # CP lines pre-packed for the forward (indices OFF_L..OFF_L+3 of the
    # flat list collapse into one block-diagonal tensor)
    OFF_L = 1 + 2 * (W_LAYERS + 2) + 2 * (G_LAYERS + 2)
    L = len(CP_RESOLUTIONS)
    ws = (list(ws[:OFF_L]) + [_pack_lines(ws[OFF_L:OFF_L + L])]
          + list(ws[OFF_L + L:]))
  N = rays.shape[0]
  assert N % block_rays == 0, (N, block_rays)
  kernel = functools.partial(_dyn_kernel, steps=steps,
                             block_rays=block_rays,
                             sigmoid_kind=sigmoid_kind, sky_white=sky_white,
                             spline_points=spline_points, want_dp=want_dp,
                             enc_kind=enc_kind)
  grid = (N // block_rays,)
  in_specs = _common_specs(block_rays, steps)
  for w in ws:
    in_specs.append(pl.BlockSpec(
        w.shape, lambda i, nd=w.ndim: (0,) * nd, memory_space=pltpu.VMEM))
  C = 5 if want_dp else 4
  out_spec = pl.BlockSpec((block_rays, C), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
  return pl.pallas_call(
      kernel,
      grid=grid,
      in_specs=in_specs,
      out_specs=out_spec,
      out_shape=jax.ShapeDtypeStruct((N, C), jnp.float32),
      interpret=interpret,
      compiler_params=pltpu.CompilerParams(
          vmem_limit_bytes=100 * 1024 * 1024),
  )(rays, elaz, times, ts, dists, *ws)


def _dyn_backward_call(ws, rays, elaz, times, ts, dists, g, *, steps,
                       block_rays, interpret, sigmoid_kind="thin",
                       sky_white=False, spline_points=0, want_dp=False,
                       enc_kind="cp", loss_scale=None, dp_coeff=0.0):
  extra = ()
  N = rays.shape[0]
  assert N % block_rays == 0, (N, block_rays)
  kernel = functools.partial(_dyn_bwd_kernel, steps=steps,
                             block_rays=block_rays,
                             sigmoid_kind=sigmoid_kind, sky_white=sky_white,
                             spline_points=spline_points, want_dp=want_dp,
                             enc_kind=enc_kind, loss_scale=loss_scale,
                             dp_coeff=dp_coeff)
  grid = (N // block_rays,)
  in_specs = _common_specs(block_rays, steps)
  # g slots in after times (kernel arg order: rays, elaz, times, g, ts,
  # dists, packed?, *ws). Loss mode: g is the [N, 4] target (the dp
  # column needs no input — its cotangent is the constant dp_coeff).
  C = 4 if loss_scale is not None else (5 if want_dp else 4)
  in_specs.insert(3, pl.BlockSpec((block_rays, C), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM))
  if enc_kind == "cp":
    OFF_L = 1 + 2 * (W_LAYERS + 2) + 2 * (G_LAYERS + 2)
    L = len(CP_RESOLUTIONS)
    packed = _pack_lines(ws[OFF_L:OFF_L + L])
    extra = (packed,)
    in_specs.append(pl.BlockSpec(packed.shape, lambda i: (0, 0, 0),
                                 memory_space=pltpu.VMEM))
  out_specs, out_shapes = [], []
  for w in ws:
    in_specs.append(pl.BlockSpec(
        w.shape, lambda i, nd=w.ndim: (0,) * nd, memory_space=pltpu.VMEM))
    out_specs.append(pl.BlockSpec(
        w.shape, lambda i, nd=w.ndim: (0,) * nd, memory_space=pltpu.VMEM))
    out_shapes.append(jax.ShapeDtypeStruct(w.shape, jnp.float32))
  if loss_scale is not None:
    out_specs.append(pl.BlockSpec((8, 128), lambda i: (0, 0),
                                  memory_space=pltpu.VMEM))
    out_shapes.append(jax.ShapeDtypeStruct((8, 128), jnp.float32))
  return pl.pallas_call(
      kernel,
      grid=grid,
      in_specs=in_specs,
      out_specs=out_specs,
      out_shape=out_shapes,
      interpret=interpret,
      compiler_params=pltpu.CompilerParams(
          vmem_limit_bytes=100 * 1024 * 1024),
  )(rays, elaz, times, g, ts, dists, *extra, *ws)


def _cast_ws(ws):
  # ws[0] is the warp Fourier basis — must stay f32 (see _fourier_feats)
  return tuple(
      w.astype(jnp.bfloat16) if i > 0 and w.ndim >= 2 and w.shape[0] > 1
      else w for i, w in enumerate(ws))


@functools.partial(jax.jit, static_argnames=("steps", "t_near", "t_far",
                                             "block_rays", "interpret",
                                             "sigmoid_kind", "sky_kind",
                                             "spline_points", "enc_kind"))
def fused_dyn_cp_render(params, rays, times, *, steps: int = 64,
                        t_near: float = 2.0, t_far: float = 6.0,
                        block_rays: int = DEFAULT_BLOCK_RAYS,
                        interpret: bool = False,
                        sigmoid_kind: str = "thin",
                        sky_kind: str = "black",
                        spline_points: int = 0,
                        enc_kind: str = "cp"):
  """Eval-mode fused D-NeRF render: rays [N, 6] + times [N] -> [N, 4]."""
  ws = _cast_ws(_flatten_params_dyn(params, enc_kind=enc_kind))
  from ...ops.math import dir_to_elev_azim
  elaz = dir_to_elev_azim(rays[:, 3:6])
  ts = _linspace_ts(steps, t_near, t_far)
  dists = _dists_base(ts)
  return _dyn_forward_call(ws, rays, elaz, times[:, None], ts, dists,
                           steps=steps, block_rays=block_rays,
                           interpret=interpret, sigmoid_kind=sigmoid_kind,
                           sky_white=sky_kind == "white",
                           spline_points=spline_points, enc_kind=enc_kind)


@functools.lru_cache(maxsize=8)
def _make_diff_dyn_render(steps, block_rays, bwd_block_rays, interpret,
                          sigmoid_kind="thin", sky_white=False,
                          spline_points=0, want_dp=False, enc_kind="cp"):
  """Custom-VJP fused D-NeRF render: (ws, rays, elaz, times, ts, dists)
  -> [N, 4|5]; gradients flow to the weights (incl. warp + rigidity)."""

  @jax.custom_vjp
  def render(ws, rays, elaz, times, ts, dists):
    return _dyn_forward_call(_cast_ws(ws), rays, elaz, times, ts, dists,
                             steps=steps, block_rays=block_rays,
                             interpret=interpret,
                             sigmoid_kind=sigmoid_kind,
                             sky_white=sky_white,
                             spline_points=spline_points, want_dp=want_dp,
                             enc_kind=enc_kind)

  def fwd(ws, rays, elaz, times, ts, dists):
    return render(ws, rays, elaz, times, ts, dists), (ws, rays, elaz,
                                                      times, ts, dists)

  def bwd(res, g):
    ws, rays, elaz, times, ts, dists = res
    dws = _dyn_backward_call(_cast_ws(ws), rays, elaz, times, ts, dists, g,
                             steps=steps, block_rays=bwd_block_rays,
                             interpret=interpret,
                             sigmoid_kind=sigmoid_kind,
                             sky_white=sky_white,
                             spline_points=spline_points, want_dp=want_dp,
                             enc_kind=enc_kind)
    dws = tuple(d.astype(w.dtype) for d, w in zip(dws, ws))
    return (dws, jnp.zeros_like(rays), jnp.zeros_like(elaz),
            jnp.zeros_like(times), jnp.zeros_like(ts),
            jnp.zeros_like(dists))

  render.defvjp(fwd, bwd)
  return render


def fused_dyn_cp_render_train(params, rays, times, ts=None, *,
                              steps: int = 64, t_near: float = 2.0,
                              t_far: float = 6.0,
                              block_rays: int = DEFAULT_BLOCK_RAYS,
                              bwd_block_rays: int = BWD_BLOCK_RAYS,
                              interpret: bool = False,
                              sigmoid_kind: str = "thin",
                              sky_kind: str = "black",
                              spline_points: int = 0,
                              want_dp: bool = False,
                              enc_kind: str = "cp"):
  """Differentiable fused D-NeRF render: rays [N, 6] + times [N] ->
  [N, 4] (rgb ‖ acc), or [N, 5] with want_dp (per-ray mean dp² column
  for the --dp-weight regularizer), with gradients w.r.t. `params` via
  the custom-VJP backward kernel."""
  ws = tuple(_flatten_params_dyn(params, enc_kind=enc_kind))
  from ...ops.math import dir_to_elev_azim
  elaz = dir_to_elev_azim(rays[:, 3:6])
  if ts is None:
    ts = _linspace_ts(steps, t_near, t_far)
  dists = _dists_base(ts)
  render = _make_diff_dyn_render(steps, block_rays, bwd_block_rays,
                                 interpret, sigmoid_kind,
                                 sky_kind == "white", spline_points,
                                 want_dp, enc_kind)
  return render(ws, rays, elaz, times[:, None], ts, dists)


def fused_dyn_cp_render_train_sharded(
    params, rays, times, ts=None, *, mesh, axis: str = "data",
    steps: int = 64, t_near: float = 2.0, t_far: float = 6.0,
    block_rays: int = DEFAULT_BLOCK_RAYS,
    bwd_block_rays: int = BWD_BLOCK_RAYS, interpret: bool = False,
    sigmoid_kind: str = "thin", sky_kind: str = "black",
    spline_points: int = 0, want_dp: bool = False, enc_kind: str = "cp"):
  """Multi-chip fused D-NeRF training render: rays + times shard over the
  mesh's data axis, weights replicate, weight cotangents psum over ICI
  via shard_map's transpose (same pattern as the static
  `fused_plain_cp_render_train_sharded`). N must be a multiple of
  mesh.size * block_rays."""
  from jax.sharding import PartitionSpec as P
  try:
    from jax import shard_map  # jax >= 0.8
  except ImportError:
    from jax.experimental.shard_map import shard_map

  ws = tuple(_flatten_params_dyn(params, enc_kind=enc_kind))
  from ...ops.math import dir_to_elev_azim
  elaz = dir_to_elev_azim(rays[:, 3:6])
  if ts is None:
    ts = _linspace_ts(steps, t_near, t_far)
  dists = _dists_base(ts)
  render = _make_diff_dyn_render(steps, block_rays, bwd_block_rays,
                                 interpret, sigmoid_kind,
                                 sky_kind == "white", spline_points,
                                 want_dp, enc_kind)

  import inspect
  sig = inspect.signature(shard_map).parameters
  no_check = ({"check_vma": False} if "check_vma" in sig
              else {"check_rep": False})
  smapped = shard_map(
      render,
      mesh=mesh,
      in_specs=(P(), P(axis), P(axis), P(axis), P(), P()),
      out_specs=P(axis),
      **no_check)
  return smapped(ws, rays, elaz, times[:, None], ts, dists)


def fused_dyn_cp_train_step(params, rays, times, target, ts=None, *,
                            steps: int = 64, t_near: float = 2.0,
                            t_far: float = 6.0,
                            bwd_block_rays: int = BWD_BLOCK_RAYS,
                            interpret: bool = False,
                            sigmoid_kind: str = "thin",
                            sky_kind: str = "black",
                            spline_points: int = 0,
                            dp_weight: float = 0.0,
                            enc_kind: str = "cp"):
  """ONE-kernel fused train step for D-NeRF/Spline-NeRF (see render.py
  `fused_plain_cp_train_step`): loss = mean((rgb − target)²)
  [+ dp_weight·mean(dp²), computed in-kernel like the want_dp column].
  Returns (loss, grads pytree)."""
  ws, unflat = jax.vjp(
      lambda p: tuple(_flatten_params_dyn(p, enc_kind=enc_kind)), params)
  from ...ops.math import dir_to_elev_azim
  elaz = dir_to_elev_azim(rays[:, 3:6])
  if ts is None:
    ts = _linspace_ts(steps, t_near, t_far)
  dists = _dists_base(ts)
  N = rays.shape[0]
  scale = 1.0 / (N * 3)
  tgt = jnp.concatenate(
      [target.astype(jnp.float32), jnp.zeros((N, 1), jnp.float32)], axis=-1)
  outs = _dyn_backward_call(_cast_ws(ws), rays, elaz, times[:, None], ts,
                            dists, tgt, steps=steps,
                            block_rays=bwd_block_rays, interpret=interpret,
                            sigmoid_kind=sigmoid_kind,
                            sky_white=sky_kind == "white",
                            spline_points=spline_points,
                            want_dp=dp_weight != 0.0, enc_kind=enc_kind,
                            loss_scale=scale, dp_coeff=dp_weight / N)
  dws, loss_acc = outs[:-1], outs[-1]
  dws = tuple(d.astype(w.dtype) for d, w in zip(dws, ws))
  (dparams,) = unflat(dws)
  return loss_acc[0, 0], dparams  # scaled in-kernel
