"""Static NeRF variants: TinyNeRF, PlainNeRF, NeRFAE, CoarseFineNeRF.

Capability parity:
  TinyNeRF        /root/reference/src/nerf.py:278-305
  PlainNeRF       /root/reference/src/nerf.py:310-361
  NeRFAE          /root/reference/src/nerf.py:766-840
  CoarseFineNeRF  /root/reference/src/nerf.py:526-581 (the reference's is
                  unfinished — exit() at :579; ours implements the intended
                  coarse→inverse-CDF-fine hierarchy, working).

All models expose `query(pts, view, latent, train)` (the point-field view
used by dynamic wrappers and the fused render kernels) alongside
`__call__(rays, ...)`.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn import HashEncoder, PositionalEncoder, SkipConnMLP
from ..ops import integrate, sampling
from ..refl import load_refl
from .base import NeRFBase, broadcast_latent, view_per_sample


def _fresh_enc(kw):
  """Clone an encoder module arriving via a kwargs dict: flax registers
  module instances living in dataclass fields as children of the PARENT
  (named `<field>_enc`), not of the MLP they're passed to — a fresh
  unbound clone created in setup nests under the MLP as intended."""
  enc = kw.get("enc")
  if isinstance(enc, nn.Module):
    kw = dict(kw, enc=enc.clone())
  return kw


class TinyNeRF(NeRFBase):
  """Single MLP -> (sigma, rgb); no view dependence.

  mlp_kwargs overrides the MLP architecture — the TPU default is a
  posenc'd 6×128; reference checkpoints import at the ref's native
  dims (src/nerf.py:286-290: enc=None, 6×256, xavier) via
  scripts/import_reference_ckpt.py."""
  mlp_kwargs: Any = None

  def setup(self):
    kw = dict(
        enc=PositionalEncoder(input_dims=3, max_freq_log2=6, num_freqs=8),
        num_layers=6, hidden_size=128)
    kw.update(self.mlp_kwargs or {})
    kw = _fresh_enc(kw)
    self.mlp = SkipConnMLP(
        in_size=3, out=1 + 3, latent_size=self.latent_size,
        dtype=self.dtype, **kw)

  def query(self, pts, view=None, latent=None, train: bool = False):
    out = self.mlp(pts, latent)
    density = self.add_density_noise(out[..., 0], train)
    rgb = self.rgb_act(out[..., 1:])
    return density, rgb

  def __call__(self, rays, times=None, latents=None, train: bool = False):
    pts, ts, r_o, r_d = self.sample_points(rays, train)
    lat = broadcast_latent(latents, pts.shape, self.latent_size)
    density, rgb = self.query(pts, latent=lat, train=train)
    return self.finish(density, rgb, ts, r_d, train)


class PlainNeRF(NeRFBase):
  """Density MLP emitting sigma + an intermediate feature; RGB from a
  pluggable reflectance model.

  enc_kind selects the spatial encoder: "cp" (TPU-native factorized
  feature volumes on the MXU — the fast default), "hash" (NGP-style
  gather grid, reference parity), "posenc" (frequency encoding); with
  mip set, IPE features replace the encoder entirely.
  """
  refl_kind: str = "view"
  refl_space: str = "identity"
  enc_kind: str = "cp"
  refl_kwargs: Any = None
  enc_kwargs: Any = None   # spatial-encoder overrides (e.g.
                           # {"table_size": 1 << 14} selects the
                           # TPU-fast one-hot hash kernel envelope,
                           # ops/pallas/hash_encode.py)
  mlp_kwargs: Any = None   # density-MLP architecture overrides (the
                           # reference-checkpoint importer uses the ref's
                           # native 4×256, src/nerf.py:320-324)

  def setup(self):
    # with mip, the density MLP consumes IPE features (width 2*3*16 = 96
    # for the default cone encoding) instead of encoded raw points
    if self.mip is not None:
      enc = None
    elif self.enc_kind == "hash":
      enc = HashEncoder(**(self.enc_kwargs or {}))
    elif self.enc_kwargs:
      raise NotImplementedError(
          f"enc_kwargs only configures enc_kind='hash', got "
          f"{self.enc_kind}")
    elif self.enc_kind == "ref-hash":
      # reference-exact hash grid (checkpoint transplant; see
      # nn.RefHashEncoder for why new models shouldn't use it)
      from ..nn import RefHashEncoder
      enc = RefHashEncoder()
    elif self.enc_kind == "cp":
      from ..nn import CPEncoder
      enc = CPEncoder(dtype=self.dtype)
    elif self.enc_kind == "posenc":
      enc = PositionalEncoder(input_dims=3, max_freq_log2=6, num_freqs=10)
    else:
      raise NotImplementedError(f"unknown enc kind {self.enc_kind}")
    mlp_kw = dict(num_layers=5, hidden_size=256)
    mlp_kw.update(self.mlp_kwargs or {})
    self.first = SkipConnMLP(
        in_size=3 if self.mip is None else 96,
        out=1 + self.intermediate_size,
        latent_size=self.latent_size,
        enc=enc, dtype=self.dtype,
        name="density_mlp", **mlp_kw)
    self.refl = load_refl(
        self.refl_kind,
        latent_size=self.intermediate_size + self.latent_size,
        act=self.sigmoid_kind, space=self.refl_space,
        **(self.refl_kwargs or {}))

  def query(self, pts, view=None, latent=None, train: bool = False,
            mip_feats=None):
    x = pts if mip_feats is None else mip_feats
    out = self.first(x, latent)
    density = self.add_density_noise(out[..., 0], train)
    feats = out[..., 1:]
    lat = feats if latent is None else jnp.concatenate([feats, latent], -1)
    rgb = self.refl(pts, view=view, latent=lat)
    return density, rgb

  def __call__(self, rays, times=None, latents=None, train: bool = False):
    pts, ts, r_o, r_d = self.sample_points(rays, train)
    lat = broadcast_latent(latents, pts.shape, self.latent_size)
    view = view_per_sample(r_d, self.steps)
    mip_feats = self.mip_encode(r_o, r_d, ts)
    density, rgb = self.query(pts, view=view, latent=lat, train=train,
                              mip_feats=mip_feats)
    return self.finish(density, rgb, ts, r_d, train)


class NeRFAE(NeRFBase):
  """Auto-encoded NeRF: points encode to a latent field; density and
  reflectance both read the latent (reference src/nerf.py:766-840)."""
  refl_kind: str = "view"
  encoding_size: int = 32
  normalize_latent: bool = True
  enc_mlp_kwargs: Any = None      # architecture overrides for checkpoint
  density_mlp_kwargs: Any = None  # import at the reference's native dims
  refl_kwargs: Any = None         # (ref src/nerf.py:784-793)

  def setup(self):
    ekw = dict(
        enc=PositionalEncoder(input_dims=3, max_freq_log2=6, num_freqs=8),
        num_layers=5, hidden_size=256)
    ekw.update(self.enc_mlp_kwargs or {})
    ekw = _fresh_enc(ekw)
    self.encoder = SkipConnMLP(
        in_size=3, out=self.encoding_size, latent_size=self.latent_size,
        dtype=self.dtype, name="encode", **ekw)
    dkw = dict(num_layers=4, hidden_size=128)
    dkw.update(self.density_mlp_kwargs or {})
    self.density_tfm = SkipConnMLP(
        in_size=self.encoding_size, out=1 + self.intermediate_size,
        dtype=self.dtype, name="density_tfm", **dkw)
    self.refl = load_refl(
        self.refl_kind,
        latent_size=self.encoding_size + self.intermediate_size,
        act=self.sigmoid_kind, **(self.refl_kwargs or {}))

  def encode(self, pts, latent=None, with_raw: bool = False):
    """Latent field at pts; with_raw also returns the PRE-normalization
    encoding (the reference computes its latent_l2 regularizer on that,
    ref src/nerf.py:808-812 — and under normalize_latent the raw norm is
    the quantity whose unbounded growth freezes the latent direction,
    the round-4 `ae` quality collapse; see BENCH_NOTES round-5 entry)."""
    raw = self.encoder(pts, latent)
    enc = raw
    if self.normalize_latent:
      enc = raw / jnp.maximum(
          jnp.linalg.norm(raw, axis=-1, keepdims=True), 1e-6)
    return (enc, raw) if with_raw else enc

  def encode_raw(self, pts):
    """PRE-normalization encoding (flax method target for the fused
    paths' point-sampled latent_l2 regularizer)."""
    return self.encoder(pts, None)

  def query_from_encoding(self, pts, enc, view=None, train: bool = False):
    out = self.density_tfm(enc)
    density = self.add_density_noise(out[..., 0], train)
    lat = jnp.concatenate([enc, out[..., 1:]], axis=-1)
    rgb = self.refl(pts, view=view, latent=lat)
    return density, rgb

  def query(self, pts, view=None, latent=None, train: bool = False):
    enc = self.encode(pts, latent)
    return self.query_from_encoding(pts, enc, view=view, train=train)

  def __call__(self, rays, times=None, latents=None, train: bool = False):
    pts, ts, r_o, r_d = self.sample_points(rays, train)
    lat = broadcast_latent(latents, pts.shape, self.latent_size)
    view = view_per_sample(r_d, self.steps)
    enc, enc_raw = self.encode(pts, lat, with_raw=True)
    density, rgb = self.query_from_encoding(pts, enc, view=view, train=train)
    out = self.finish(density, rgb, ts, r_d, train)
    # the reference's latent_l2 = mean over points of ||raw enc||²
    # (PRE-normalization, ref src/nerf.py:810-812). Round 4 computed it
    # on the normalized latent — a constant ≡ 1 under normalize_latent,
    # i.e. a silent no-op exactly where the penalty matters most.
    out["latent_l2"] = jnp.mean(jnp.sum(jnp.square(enc_raw), -1))
    return out


class CoarseFineNeRF(NeRFBase):
  """Hierarchical NeRF: a coarse uniform pass drives inverse-CDF
  importance sampling for the fine pass, with ONE shared field queried by
  both. Both images are returned; the training loss sums both (the
  intended behavior of the reference's unfinished version).

  enc_kind mirrors PlainNeRF ("hash" default for checkpoint continuity;
  "cp"/"posenc" available); with mip set, IPE features replace the
  encoder — `--model coarse_fine --mip cone` is the canonical "PlainNeRF
  with MipNeRF IPE + hierarchical fine sampling" recipe (BASELINE.json
  config #2), and the fused Pallas path covers it (ops/pallas/render.py
  fused_coarse_fine_train)."""
  refl_kind: str = "view"
  fine_steps: int = 64
  enc_kind: str = "hash"

  def setup(self):
    if self.mip is not None:
      enc = None
    elif self.enc_kind == "hash":
      enc = HashEncoder()
    elif self.enc_kind == "cp":
      from ..nn import CPEncoder
      enc = CPEncoder(dtype=self.dtype)
    elif self.enc_kind == "posenc":
      enc = PositionalEncoder(input_dims=3, max_freq_log2=6, num_freqs=10)
    else:
      raise NotImplementedError(f"unknown enc kind {self.enc_kind}")
    self.first = SkipConnMLP(
        in_size=3 if self.mip is None else 96,
        out=1 + self.intermediate_size,
        latent_size=self.latent_size, enc=enc,
        num_layers=5, hidden_size=256, dtype=self.dtype,
        name="density_mlp")
    self.refl = load_refl(
        self.refl_kind,
        latent_size=self.intermediate_size + self.latent_size,
        act=self.sigmoid_kind)

  def query(self, pts, view=None, latent=None, train: bool = False,
            mip_feats=None):
    x = pts if mip_feats is None else mip_feats
    out = self.first(x, latent)
    density = self.add_density_noise(out[..., 0], train)
    lat = (out[..., 1:] if latent is None
           else jnp.concatenate([out[..., 1:], latent], -1))
    rgb = self.refl(pts, view=view, latent=lat)
    return density, rgb

  def __call__(self, rays, times=None, latents=None, train: bool = False):
    pts, ts, r_o, r_d = self.sample_points(rays, train)
    lat = broadcast_latent(latents, pts.shape, self.latent_size)
    view = view_per_sample(r_d, self.steps)
    mip_feats = self.mip_encode(r_o, r_d, ts)
    density, rgb = self.query(pts, view=view, latent=lat, train=train,
                              mip_feats=mip_feats)
    coarse = self.finish(density, rgb, ts, r_d, train)

    # importance-sample fine ts from coarse weights (stop-grad: sample
    # placement is not differentiated, matching standard hierarchical NeRF)
    w = jax.lax.stop_gradient(coarse["weights"])
    ts_b = jnp.broadcast_to(ts, w.shape) if ts.ndim == 1 else ts
    key = self.make_rng("sampler") if train else None
    fine_ts = sampling.sample_pdf(ts_b, w, N=self.fine_steps, key=key)
    all_ts = sampling.merge_ts(ts_b, fine_ts)
    pts_f = (rays[..., None, :3]
             + all_ts[..., :, None] * rays[..., None, 3:])
    T_all = all_ts.shape[-1]
    view_f = view_per_sample(r_d, T_all)
    lat_f = broadcast_latent(latents, pts_f.shape, self.latent_size)
    mip_f = self.mip_encode(r_o, r_d, all_ts)
    density_f, rgb_f = self.query(pts_f, view=view_f, latent=lat_f,
                                  train=train, mip_feats=mip_f)
    fine = self.finish(density_f, rgb_f, all_ts, r_d, train)
    fine["coarse_rgb"] = coarse["rgb"]
    fine["coarse_weights"] = coarse["weights"]
    return fine
