"""Fused render megakernel for the NeRFAE (auto-encoded) model.

The NeRFAE chain (models/nerf.py NeRFAE; reference src/nerf.py:766-840)
is the third matmul-chain family the fused framework covers:

  ray → T sample points → positional-encode (closed-form sin/cos bands)
      → encoder MLP (256×5) → L2-normalize latent → density-transform
      MLP (128×4) → view-reflectance MLP (128×6, latent = enc ‖ feats)
      → α-composite → rgb ‖ acc

All of it runs in VMEM per ray block, forward and backward (custom VJP,
recompute-in-VMEM — same strategy as render.py). The positional encoder
is parameter-free: its frequency selector is built from iota in-kernel
and the phase projection runs at true-f32 precision (`_dot_exact`) —
band 2^6 phases reach hundreds of radians, where a default-precision
(single-pass-bf16) MXU dot would inject O(1)-radian errors (the bf16
fourier-phase trap, see BENCH_NOTES.md).

The latent L2-normalize is the one non-MLP nonlinearity in the chain;
its VJP (g - ŷ(ŷ·g))/‖x‖ is hand-chained between the two MLP VJPs, with
the `max(‖x‖, 1e-6)` clamp gated arithmetically (Mosaic has no bool
relayouts).

Oracle: models.NeRFAE(refl_kind="view", latent_size=0,
normalize_latent=True) with default sizes; parity in
tests/test_pallas_ae.py (interpret mode). `latent_l2` needs no kernel
output: under normalize_latent the per-point latent norm is exactly 1,
so mean(enc²) ≡ 1/32 — a constant with zero gradient (and the driver's
fused gate rejects configs with any active regularizer anyway).
"""
from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .render import (
    INTERMEDIATE, R_HIDDEN, R_LAYERS, DEFAULT_BLOCK_RAYS, BWD_BLOCK_RAYS,
    RENDER_BLOCK_RAYS, _composite_bwd, _composite_fwd, _cos_approx,
    _dists_base, _dot_exact, _leaky_act, _leaky_grad, _linspace_ts,
    _mlp_bwd, _mlp_fwd, _rgb_act_grad, _sin_approx, _sin30_act,
    _sin30_grad, _write_outputs,
)

# NeRFAE architecture (models/nerf.py NeRFAE defaults)
AE_ENC_SIZE = 32                          # encoding_size (latent width)
E_FREQS = 8                               # PositionalEncoder num_freqs
E_MAX_LOG2 = 6.0                          # ... max_freq_log2
E_ENC = 2 * 3 * E_FREQS                   # sin ‖ cos bands = 48
E_FEAT = 3 + E_ENC                        # encoder MLP init: raw ‖ posenc
E_HIDDEN = 256
E_LAYERS = 5
D_HIDDEN = 128                            # density_tfm MLP
D_LAYERS = 4
AE_R_IN = 3 + 2 + AE_ENC_SIZE + INTERMEDIATE   # refl init: x‖elaz‖latent

N_WS_AE = 2 * (E_LAYERS + 2) + 2 * (D_LAYERS + 2) + 2 * (R_LAYERS + 2)


def _posenc_sel():
  """S [3, 24] with S[c, j] = 2^((j%8)·6/7)·[j//8 == c]: `pts @ S` lays
  phases out dim-major / band-minor, matching nn.PositionalEncoder's
  reshape of x[..., :, None]·freqs (log-spaced 2^linspace(0, 6, 8)).
  Built from iota in-kernel (Pallas forbids captured array constants)."""
  row = jax.lax.broadcasted_iota(jnp.int32, (3, 3 * E_FREQS), 0)
  col = jax.lax.broadcasted_iota(jnp.int32, (3, 3 * E_FREQS), 1)
  sel = (col // E_FREQS == row).astype(jnp.float32)
  expo = (col % E_FREQS).astype(jnp.float32) * (E_MAX_LOG2 / (E_FREQS - 1))
  return sel * jnp.exp2(expo)


def _posenc_fwd(pts):
  """[P, 3] -> [P, 48] bf16 positional-encoder features (sin ‖ cos)."""
  y = _dot_exact(pts.astype(jnp.float32), _posenc_sel())     # [P, 24]
  return jnp.concatenate(
      [_sin_approx(y), _cos_approx(y)], axis=-1).astype(jnp.bfloat16)


def _normalize_fwd(x):
  """y = x / max(‖x‖₂, 1e-6) over the last axis, f32.

  Returns (y, (x, n, m)) with n = ‖x‖, m = max(n, 1e-6)."""
  x = x.astype(jnp.float32)
  n = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True))
  m = jnp.maximum(n, 1e-6)
  return x / m, (x, n, m)


def _normalize_bwd(g, res):
  """VJP of `_normalize_fwd`: dx = g/m - x·(x·g)·[n > eps]/(m²·n).

  The clamp gate is arithmetic (0 below eps, 1 above — Mosaic cannot
  relayout vector<i1>); below the clamp m is constant so only the g/m
  term survives."""
  x, n, m = res
  g = g.astype(jnp.float32)
  gate = 0.5 * (jnp.sign(n - 1e-6) + 1.0)
  xg = jnp.sum(x * g, axis=-1, keepdims=True)
  return g / m - x * (xg * gate / (m * m * jnp.maximum(n, 1e-20)))


def _ae_chain_fwd(pts, elaz_p, wbs_e, wbs_d, wbs_r, sigmoid_kind,
                  stash=None):
  """The full per-sample AE chain: pts [P, 3] -> (density [P, 1],
  rgb [P, 3]). `stash` (dict) receives the recompute state for the
  backward kernel."""
  fenc = _posenc_fwd(pts)
  init_e = jnp.concatenate([pts.astype(jnp.bfloat16), fenc], axis=-1)
  e_hs = [] if stash is not None else None
  enc_raw = _mlp_fwd(init_e, wbs_e, _leaky_act, E_LAYERS, stash=e_hs)
  enc, norm_res = _normalize_fwd(enc_raw)                  # [P, 32] f32
  enc_b = enc.astype(jnp.bfloat16)

  d_hs = [] if stash is not None else None
  d_out = _mlp_fwd(enc_b, wbs_d, _leaky_act, D_LAYERS, stash=d_hs)
  density = d_out[:, 0:1]
  feats = d_out[:, 1:1 + INTERMEDIATE]

  r_in = jnp.concatenate(
      [pts.astype(jnp.bfloat16), elaz_p.astype(jnp.bfloat16), enc_b,
       feats.astype(jnp.bfloat16)], axis=-1)               # [P, 69]
  r_zs = [] if stash is not None else None
  rgb_raw = _mlp_fwd(r_in, wbs_r, _sin30_act, R_LAYERS, stash=r_zs)
  rgb, dact = _rgb_act_grad(rgb_raw, sigmoid_kind)
  if stash is not None:
    stash.update(init_e=init_e, e_hs=e_hs, norm_res=norm_res, enc_b=enc_b,
                 d_hs=d_hs, r_in=r_in, r_zs=r_zs, dact=dact)
  return density, rgb


def _ae_kernel(rays_ref, elaz_ref, ts_ref, dists_ref, *refs, steps,
               block_rays, sigmoid_kind="thin", sky_white=False):
  """Forward: refs = [encoder wbs, density_tfm wbs, refl wbs, out_ref]."""
  out_ref = refs[-1]
  wrefs = refs[:-1]
  widx = [0]

  def wbs(n_layers):
    out = []
    for _ in range(n_layers + 2):
      out.append((wrefs[widx[0]][...], wrefs[widx[0] + 1][...]))
      widx[0] += 2
    return out

  B, T = block_rays, steps
  P = B * T
  rays = rays_ref[:, :]
  r_o, r_d = rays[:, 0:3], rays[:, 3:6]
  ts = ts_ref[:, :]
  ts_b = jnp.broadcast_to(ts, (B, T)) if ts.shape[0] == 1 else ts
  pts = (r_o[:, None, :] + ts_b[:, :, None] * r_d[:, None, :]
         ).reshape(P, 3)
  elaz = elaz_ref[:, 0:2]
  elaz_p = jnp.broadcast_to(elaz[:, None, :], (B, T, 2)).reshape(P, 2)

  density, rgb = _ae_chain_fwd(pts, elaz_p, wbs(E_LAYERS), wbs(D_LAYERS),
                               wbs(R_LAYERS), sigmoid_kind)
  weights, _, _, _, _ = _composite_fwd(density, r_d, dists_ref[:, :], B, T)
  _write_outputs(out_ref, rgb, weights, B, T, sky_white)


def _ae_bwd_kernel(rays_ref, elaz_ref, g_ref, ts_ref, dists_ref, *refs,
                   steps, block_rays, sigmoid_kind="thin",
                   sky_white=False, loss_scale=None):
  """refs = (*w_refs, *dw_refs) in `_flatten_params_ae` order.

  loss_scale: one-kernel train-step mode (render.py `_render_bwd_kernel`
  doc) — g_ref carries the target, refs trails a loss accumulator."""
  loss_ref = None
  if loss_scale is not None:
    loss_ref, refs = refs[-1], refs[:-1]
  wrefs = refs[:N_WS_AE]
  grefs = refs[N_WS_AE:]
  assert len(grefs) == N_WS_AE

  @pl.when(pl.program_id(0) == 0)
  def _zero():
    for r in grefs:
      r[...] = jnp.zeros(r.shape, r.dtype)
    if loss_ref is not None:
      loss_ref[...] = jnp.zeros(loss_ref.shape, loss_ref.dtype)

  B, T = block_rays, steps
  P = B * T
  OFF_E = 0
  OFF_D = 2 * (E_LAYERS + 2)
  OFF_R = OFF_D + 2 * (D_LAYERS + 2)

  def pair(base, k):
    return wrefs[base + 2 * k][...], wrefs[base + 2 * k + 1][...]

  def acc(base, k, dW, db):
    grefs[base + 2 * k][...] += dW
    grefs[base + 2 * k + 1][...] += db

  rays = rays_ref[:, :]
  r_o, r_d = rays[:, 0:3], rays[:, 3:6]
  ts = ts_ref[:, :]
  ts_b = jnp.broadcast_to(ts, (B, T)) if ts.shape[0] == 1 else ts
  pts = (r_o[:, None, :] + ts_b[:, :, None] * r_d[:, None, :]
         ).reshape(P, 3)
  elaz = elaz_ref[:, 0:2]
  elaz_p = jnp.broadcast_to(elaz[:, None, :], (B, T, 2)).reshape(P, 2)

  wbs_e = [pair(OFF_E, k) for k in range(E_LAYERS + 2)]
  wbs_d = [pair(OFF_D, k) for k in range(D_LAYERS + 2)]
  wbs_r = [pair(OFF_R, k) for k in range(R_LAYERS + 2)]

  # ---- forward recompute with stashes ----
  stash = {}
  density, rgb = _ae_chain_fwd(pts, elaz_p, wbs_e, wbs_d, wbs_r,
                               sigmoid_kind, stash=stash)
  weights, alpha, trans, one_m_alpha, dists = _composite_fwd(
      density, r_d, dists_ref[:, :], B, T)

  if loss_scale is None:
    g = g_ref[:, :]
  else:
    from .render import _loss_mode_cotangent
    g = _loss_mode_cotangent(loss_scale, rgb, weights, g_ref, loss_ref,
                             B, T, sky_white)

  # ---- backward: compositing → refl → density_tfm → normalize → enc ----
  drgb, ddensity = _composite_bwd(g, rgb, density, weights,
                                  alpha, trans, one_m_alpha, dists, B, T,
                                  sky_white)
  drgb_raw = drgb * stash["dact"]

  dr_in, r_grads = _mlp_bwd(drgb_raw, stash["r_zs"], stash["r_in"], wbs_r,
                            _sin30_act, _sin30_grad, R_LAYERS, R_HIDDEN)
  for k, (dW, db) in enumerate(r_grads):
    acc(OFF_R, k, dW, db)
  # r_in columns: pts (0:3) / elaz (3:5) carry no params; latent splits
  # into the normalized encoding and the density_tfm intermediates
  d_enc = dr_in[:, 5:5 + AE_ENC_SIZE]
  dfeats = dr_in[:, 5 + AE_ENC_SIZE:5 + AE_ENC_SIZE + INTERMEDIATE]

  d_dout = jnp.concatenate([ddensity, dfeats], axis=-1)    # [P, 33]
  d_encg, d_grads = _mlp_bwd(d_dout, stash["d_hs"], stash["enc_b"], wbs_d,
                             _leaky_act, _leaky_grad, D_LAYERS, D_HIDDEN)
  for k, (dW, db) in enumerate(d_grads):
    acc(OFF_D, k, dW, db)

  d_enc_raw = _normalize_bwd(d_enc + d_encg, stash["norm_res"])
  _, e_grads = _mlp_bwd(d_enc_raw, stash["e_hs"], stash["init_e"], wbs_e,
                        _leaky_act, _leaky_grad, E_LAYERS, E_HIDDEN)
  for k, (dW, db) in enumerate(e_grads):
    acc(OFF_E, k, dW, db)
  # posenc is closed-form and pts are leaves: d_init is discarded


def _flatten_params_ae(params) -> Sequence[jnp.ndarray]:
  """NeRFAE param pytree -> flat list in kernel consumption order."""
  p = params["params"]
  ws = []

  def add_mlp(m, n_layers):
    for name in (["layer_in"] + [f"layer_{i}" for i in range(n_layers)]
                 + ["layer_out"]):
      ws.append(m[name]["kernel"])
      ws.append(m[name]["bias"][None, :])

  add_mlp(p["encode"], E_LAYERS)
  add_mlp(p["density_tfm"], D_LAYERS)
  add_mlp(p["refl"]["mlp"], R_LAYERS)
  return ws


def _cast_ws(ws):
  return tuple(
      w.astype(jnp.bfloat16) if w.ndim >= 2 and w.shape[0] > 1 else w
      for w in ws)


def _common_specs(block_rays, ts, dists, steps):
  from .render import _ts_spec
  return [pl.BlockSpec((block_rays, 6), lambda i: (i, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((block_rays, 2), lambda i: (i, 0),
                       memory_space=pltpu.VMEM),
          _ts_spec(ts, steps, block_rays),
          _ts_spec(dists, steps, block_rays)]


def _ae_forward_call(ws, rays, elaz, ts, dists, *, steps, block_rays,
                     interpret, sigmoid_kind="thin", sky_white=False):
  N = rays.shape[0]
  assert N % block_rays == 0, (N, block_rays)
  kernel = functools.partial(_ae_kernel, steps=steps,
                             block_rays=block_rays,
                             sigmoid_kind=sigmoid_kind, sky_white=sky_white)
  in_specs = _common_specs(block_rays, ts, dists, steps)
  for w in ws:
    in_specs.append(pl.BlockSpec(
        w.shape, lambda i, nd=w.ndim: (0,) * nd, memory_space=pltpu.VMEM))
  return pl.pallas_call(
      kernel,
      grid=(N // block_rays,),
      in_specs=in_specs,
      out_specs=pl.BlockSpec((block_rays, 4), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct((N, 4), jnp.float32),
      interpret=interpret,
      compiler_params=pltpu.CompilerParams(
          vmem_limit_bytes=100 * 1024 * 1024),
  )(rays, elaz, ts, dists, *ws)


def _ae_backward_call(ws, rays, elaz, ts, dists, g, *, steps, block_rays,
                      interpret, sigmoid_kind="thin", sky_white=False,
                      loss_scale=None):
  N = rays.shape[0]
  assert N % block_rays == 0, (N, block_rays)
  kernel = functools.partial(_ae_bwd_kernel, steps=steps,
                             block_rays=block_rays,
                             sigmoid_kind=sigmoid_kind, sky_white=sky_white,
                             loss_scale=loss_scale)
  in_specs = _common_specs(block_rays, ts, dists, steps)
  in_specs.insert(2, pl.BlockSpec((block_rays, 4), lambda i: (i, 0),
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
      grid=(N // block_rays,),
      in_specs=in_specs,
      out_specs=out_specs,
      out_shape=out_shapes,
      interpret=interpret,
      compiler_params=pltpu.CompilerParams(
          vmem_limit_bytes=100 * 1024 * 1024),
  )(rays, elaz, g, ts, dists, *ws)


@functools.partial(jax.jit, static_argnames=("steps", "t_near", "t_far",
                                             "block_rays", "interpret",
                                             "sigmoid_kind", "sky_kind"))
def fused_ae_render(params, rays, *, steps: int = 64, t_near: float = 2.0,
                    t_far: float = 6.0,
                    block_rays: int = RENDER_BLOCK_RAYS,
                    interpret: bool = False, sigmoid_kind: str = "thin",
                    sky_kind: str = "black"):
  """Eval-mode fused NeRFAE render: rays [N, 6] -> [N, 4] (rgb ‖ acc)."""
  ws = _cast_ws(_flatten_params_ae(params))
  from ...ops.math import dir_to_elev_azim
  elaz = dir_to_elev_azim(rays[:, 3:6])
  ts = _linspace_ts(steps, t_near, t_far)
  dists = _dists_base(ts)
  return _ae_forward_call(ws, rays, elaz, ts, dists, steps=steps,
                          block_rays=block_rays, interpret=interpret,
                          sigmoid_kind=sigmoid_kind,
                          sky_white=sky_kind == "white")


@functools.lru_cache(maxsize=8)
def _make_diff_ae_render(steps, block_rays, bwd_block_rays, interpret,
                         sigmoid_kind="thin", sky_white=False):
  """Custom-VJP fused NeRFAE render: (ws, rays, elaz, ts, dists) ->
  [N, 4]; gradients flow to the weights only."""

  @jax.custom_vjp
  def render(ws, rays, elaz, ts, dists):
    return _ae_forward_call(_cast_ws(ws), rays, elaz, ts, dists,
                            steps=steps, block_rays=block_rays,
                            interpret=interpret, sigmoid_kind=sigmoid_kind,
                            sky_white=sky_white)

  def fwd(ws, rays, elaz, ts, dists):
    return render(ws, rays, elaz, ts, dists), (ws, rays, elaz, ts, dists)

  def bwd(res, g):
    ws, rays, elaz, ts, dists = res
    dws = _ae_backward_call(_cast_ws(ws), rays, elaz, ts, dists, g,
                            steps=steps, block_rays=bwd_block_rays,
                            interpret=interpret, sigmoid_kind=sigmoid_kind,
                            sky_white=sky_white)
    dws = tuple(d.astype(w.dtype) for d, w in zip(dws, ws))
    return (dws, jnp.zeros_like(rays), jnp.zeros_like(elaz),
            jnp.zeros_like(ts), jnp.zeros_like(dists))

  render.defvjp(fwd, bwd)
  return render


def fused_ae_render_train(params, rays, ts=None, *, steps: int = 64,
                          t_near: float = 2.0, t_far: float = 6.0,
                          block_rays: int = DEFAULT_BLOCK_RAYS,
                          bwd_block_rays: int = BWD_BLOCK_RAYS,
                          interpret: bool = False,
                          sigmoid_kind: str = "thin",
                          sky_kind: str = "black"):
  """Differentiable fused NeRFAE render: [N, 6] -> [N, 4] with weight
  grads via the custom-VJP backward kernel."""
  ws = tuple(_flatten_params_ae(params))
  from ...ops.math import dir_to_elev_azim
  elaz = dir_to_elev_azim(rays[:, 3:6])
  if ts is None:
    ts = _linspace_ts(steps, t_near, t_far)
  dists = _dists_base(ts)
  render = _make_diff_ae_render(steps, block_rays, bwd_block_rays,
                                interpret, sigmoid_kind,
                                sky_kind == "white")
  return render(ws, rays, elaz, ts, dists)


def fused_ae_render_train_sharded(
    params, rays, ts=None, *, mesh, axis: str = "data", steps: int = 64,
    t_near: float = 2.0, t_far: float = 6.0,
    block_rays: int = DEFAULT_BLOCK_RAYS,
    bwd_block_rays: int = BWD_BLOCK_RAYS, interpret: bool = False,
    sigmoid_kind: str = "thin", sky_kind: str = "black"):
  """Multi-chip fused NeRFAE training render: rays shard over the mesh's
  data axis, weights replicate, weight cotangents psum over ICI via
  shard_map's transpose. N must be a multiple of mesh.size * block_rays."""
  from jax.sharding import PartitionSpec as P
  try:
    from jax import shard_map  # jax >= 0.8
  except ImportError:
    from jax.experimental.shard_map import shard_map
  import inspect

  ws = tuple(_flatten_params_ae(params))
  from ...ops.math import dir_to_elev_azim
  elaz = dir_to_elev_azim(rays[:, 3:6])
  if ts is None:
    ts = _linspace_ts(steps, t_near, t_far)
  dists = _dists_base(ts)
  render = _make_diff_ae_render(steps, block_rays, bwd_block_rays,
                                interpret, sigmoid_kind,
                                sky_kind == "white")
  sig = inspect.signature(shard_map).parameters
  no_check = ({"check_vma": False} if "check_vma" in sig
              else {"check_rep": False})
  smapped = shard_map(
      render,
      mesh=mesh,
      in_specs=(P(), P(axis), P(axis), P(), P()),
      out_specs=P(axis),
      **no_check)
  return smapped(ws, rays, elaz, ts, dists)


def fused_ae_train_step(params, rays, target, ts=None, *, steps: int = 64,
                        t_near: float = 2.0, t_far: float = 6.0,
                        bwd_block_rays: int = BWD_BLOCK_RAYS,
                        interpret: bool = False,
                        sigmoid_kind: str = "thin",
                        sky_kind: str = "black"):
  """ONE-kernel fused L2 train step for NeRFAE (see render.py
  `fused_plain_cp_train_step`): the loss-mode backward kernel computes
  the plain-L2 loss and cotangent from its own forward recompute —
  no separate forward pass. Returns (loss, grads pytree)."""
  ws, unflat = jax.vjp(lambda p: tuple(_flatten_params_ae(p)), params)
  from ...ops.math import dir_to_elev_azim
  elaz = dir_to_elev_azim(rays[:, 3:6])
  if ts is None:
    ts = _linspace_ts(steps, t_near, t_far)
  dists = _dists_base(ts)
  N = rays.shape[0]
  scale = 1.0 / (N * 3)
  tgt = jnp.concatenate(
      [target.astype(jnp.float32), jnp.zeros((N, 1), jnp.float32)], axis=-1)
  outs = _ae_backward_call(_cast_ws(ws), rays, elaz, ts, dists, tgt,
                           steps=steps, block_rays=bwd_block_rays,
                           interpret=interpret, sigmoid_kind=sigmoid_kind,
                           sky_white=sky_kind == "white", loss_scale=scale)
  dws, loss_acc = outs[:-1], outs[-1]
  dws = tuple(d.astype(w.dtype) for d, w in zip(dws, ws))
  (dparams,) = unflat(dws)
  return loss_acc[0, 0], dparams  # scaled in-kernel


def fused_ae_train_step_sharded(
    params, rays, target, ts=None, *, mesh, axis: str = "data",
    steps: int = 64, t_near: float = 2.0, t_far: float = 6.0,
    bwd_block_rays: int = BWD_BLOCK_RAYS, interpret: bool = False,
    sigmoid_kind: str = "thin", sky_kind: str = "black"):
  """Multi-chip one-kernel NeRFAE train step: rays/targets shard over the
  data axis; per-shard loss and weight cotangents psum over ICI."""
  from jax.sharding import PartitionSpec as P
  try:
    from jax import shard_map  # jax >= 0.8
  except ImportError:
    from jax.experimental.shard_map import shard_map
  import inspect

  ws, unflat = jax.vjp(lambda p: tuple(_flatten_params_ae(p)), params)
  from ...ops.math import dir_to_elev_azim
  elaz = dir_to_elev_azim(rays[:, 3:6])
  if ts is None:
    ts = _linspace_ts(steps, t_near, t_far)
  dists = _dists_base(ts)
  N = rays.shape[0]
  scale = 1.0 / (N * 3)
  tgt = jnp.concatenate(
      [target.astype(jnp.float32), jnp.zeros((N, 1), jnp.float32)], axis=-1)

  def local(ws_, rays_, elaz_, ts_, dists_, tgt_):
    outs = _ae_backward_call(_cast_ws(ws_), rays_, elaz_, ts_, dists_,
                             tgt_, steps=steps,
                             block_rays=bwd_block_rays,
                             interpret=interpret,
                             sigmoid_kind=sigmoid_kind,
                             sky_white=sky_kind == "white",
                             loss_scale=scale)
    return tuple(jax.lax.psum(o, axis) for o in outs)

  sig = inspect.signature(shard_map).parameters
  no_check = ({"check_vma": False} if "check_vma" in sig
              else {"check_rep": False})
  smapped = shard_map(
      local, mesh=mesh,
      in_specs=(P(), P(axis), P(axis), P(), P(), P(axis)),
      out_specs=P(), **no_check)
  outs = smapped(ws, rays, elaz, ts, dists, tgt)
  dws, loss_acc = outs[:-1], outs[-1]
  dws = tuple(d.astype(w.dtype) for d, w in zip(dws, ws))
  (dparams,) = unflat(dws)
  return loss_acc[0, 0], dparams  # scaled in-kernel
