#!/usr/bin/env python3
"""Import a PyTorch reference checkpoint into this framework.

The reference pickles whole torch modules (`torch.save(model, save)`,
reference runner.py:1221). This script loads one, transplants its
weights into the matching JAX model at the reference's native
architecture dims, and writes our structured checkpoint
(train/checkpoints.py msgpack + config sidecar). Load it through the
CLI with the matching model flags plus `--ref-compat`
(e.g. `--model plain --ref-compat --load out.ckpt`).

Supported model classes (transplant is exact; parity pinned by
tests/test_import_reference.py):
  * PlainNeRF       (ref src/nerf.py:310-361; hash enc via RefHashEncoder,
                     View refl via refl.View at 4x256 plain-sin)
  * NeRFAE          (ref src/nerf.py:766-840; Fourier encode MLP +
                     density transform + View refl)
(TinyNeRF and VolSDF cannot be imported because they cannot be SAVED:
both constructors crash upstream — CommonNeRF.set_sigmoid touches
`self.refl`, which TinyNeRF never sets (ref src/nerf.py:216-219, 285),
and VolSDF.__init__ reads the undefined name `with_transmission` (its
parameter is spelled `w_transmission`, ref src/nerf.py:875, 895) — so
no checkpoints of either exist to import. Pinned by tests.)

Usage:
  python scripts/import_reference_ckpt.py REF.pt OUT.ckpt [--verify]
         [--reference /root/reference]
"""
from __future__ import annotations

import argparse
import os
import sys
import types

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _stub_torch_env(ref_path: str):
  import torch
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
  if not torch.cuda.is_available():
    torch.nn.Module.cuda = lambda self, *a, **k: self
  sys.path.insert(0, ref_path)


def _lin(sd, name):
  import jax.numpy as jnp
  return {"kernel": jnp.asarray(sd[f"{name}.weight"].T),
          "bias": jnp.asarray(sd[f"{name}.bias"])}


def import_skipconn(mlp):
  """Torch SkipConnMLP -> our flax param subtree (+ arch kwargs)."""
  import jax.numpy as jnp
  from src import neural_blocks as rblocks
  sd = {k: v.detach().cpu().numpy() for k, v in mlp.state_dict().items()}
  p = {"layer_in": _lin(sd, "init"), "layer_out": _lin(sd, "out")}
  n_layers = len(mlp.layers)
  for i in range(n_layers):
    p[f"layer_{i}"] = _lin(sd, f"layers.{i}")
  kwargs = dict(num_layers=n_layers, hidden_size=mlp.init.out_features,
                skip=mlp.skip)
  enc = getattr(mlp, "enc", None)
  enc_kwargs = None
  if enc is None:
    kwargs["enc"] = None
  elif isinstance(enc, rblocks.FourierEncoder):
    from nerf_atlas_tpu.nn import FourierEncoder
    basis = enc.basis.detach().cpu().numpy()
    kwargs["enc"] = FourierEncoder(input_dims=basis.shape[0],
                                   freqs=basis.shape[1])
    p["enc"] = {"B": jnp.asarray(basis / (2 * np.pi))}
  elif isinstance(enc, rblocks.HashEncoder):
    from nerf_atlas_tpu.nn import RefHashEncoder
    emb = np.stack([e.weight.detach().cpu().numpy() for e in enc.embs])
    enc_kwargs = dict(levels=emb.shape[0], emb_size=emb.shape[1],
                      feat_size=emb.shape[2], low_reso=enc.low_reso,
                      high_reso=enc.high_reso,
                      include_input=bool(enc.include_input))
    kwargs["enc"] = RefHashEncoder(**enc_kwargs)
    p["enc"] = {"emb": jnp.asarray(emb.reshape(-1, emb.shape[-1]))}
  elif isinstance(enc, rblocks.PositionalEncoder):
    from nerf_atlas_tpu.nn import PositionalEncoder
    # param-free; reconstruct the band schedule from the stored bands
    # (the ref keeps only the materialized bands, not its ctor args)
    bands = enc.bands.detach().cpu().numpy()
    n = int(bands.shape[0])
    linear = n <= 2 or bool(
        np.allclose(np.diff(bands), bands[1] - bands[0], rtol=1e-4))
    kwargs["enc"] = PositionalEncoder(
        input_dims=int(enc.input_dims),
        min_freq_log2=0.0 if linear else float(np.log2(bands[0])),
        max_freq_log2=float(np.log2(bands[-1])),
        num_freqs=n, log_sampling=not linear)
  else:
    raise NotImplementedError(f"encoder {type(enc).__name__}")
  return p, kwargs, enc_kwargs


def _common_kwargs(ref):
  return dict(steps=int(ref.steps), t_near=float(ref.t_near),
              t_far=float(ref.t_far))


def import_model(ref):
  """Torch reference model -> (our model, params pytree, config dict)."""
  from nerf_atlas_tpu import models
  kind = type(ref).__name__
  if kind == "PlainNeRF":
    dp, dmlp_kw, enc_kw = import_skipconn(ref.first)
    rp, rmlp_kw, _ = import_skipconn(ref.refl.mlp)
    inter = int(ref.intermediate_size)
    model = models.PlainNeRF(
        enc_kind="ref-hash", intermediate_size=inter,
        mlp_kwargs={k: v for k, v in dmlp_kw.items() if k != "enc"},
        refl_kwargs=dict(hidden_size=rmlp_kw["hidden_size"],
                         num_layers=rmlp_kw["num_layers"], siren_w0=1.0),
        **_common_kwargs(ref))
    params = {"params": {"density_mlp": dp, "refl": {"mlp": rp}}}
    cfg = dict(model="plain", enc_kind="ref-hash", ref_compat=True,
               intermediate_size=inter, **_common_kwargs(ref))
  elif kind == "NeRFAE":
    ep, ekw, _ = import_skipconn(ref.encode)
    dp, dkw, _ = import_skipconn(ref.density_tform)
    rp, rkw, _ = import_skipconn(ref.refl.mlp)
    inter = int(ref.intermediate_size)
    model = models.NeRFAE(
        encoding_size=int(ref.encoding_size), intermediate_size=inter,
        normalize_latent=bool(ref.normalize_latent),
        enc_mlp_kwargs=ekw,
        density_mlp_kwargs={k: v for k, v in dkw.items() if k != "enc"},
        refl_kwargs=dict(hidden_size=rkw["hidden_size"],
                         num_layers=rkw["num_layers"], siren_w0=1.0),
        **_common_kwargs(ref))
    params = {"params": {"encode": ep, "density_tfm": dp,
                         "refl": {"mlp": rp}}}
    cfg = dict(model="ae", ref_compat=True,
               encoding_size=int(ref.encoding_size),
               normalize_latent=bool(ref.normalize_latent),
               intermediate_size=inter, **_common_kwargs(ref))
  else:
    raise NotImplementedError(
        f"reference model {kind} not supported for import yet "
        f"(supported: PlainNeRF, NeRFAE)")
  return model, params, cfg


def _check_tree(model, params):
  """Init a fresh tree and assert the imported one matches its shapes."""
  import jax
  import jax.numpy as jnp
  rays = jnp.concatenate(
      [jnp.zeros((4, 3)), jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (4, 1))],
      axis=-1)
  fresh = model.init({"params": jax.random.PRNGKey(0),
                      "sampler": jax.random.PRNGKey(1)}, rays, train=True)
  fresh_flat = dict(jax.tree_util.tree_leaves_with_path(fresh))
  got_flat = dict(jax.tree_util.tree_leaves_with_path(params))
  missing = set(fresh_flat) - set(got_flat)
  extra = set(got_flat) - set(fresh_flat)
  assert not missing and not extra, (
      f"tree mismatch: missing={sorted(map(str, missing))[:5]} "
      f"extra={sorted(map(str, extra))[:5]}")
  for k, v in got_flat.items():
    assert fresh_flat[k].shape == v.shape, (k, fresh_flat[k].shape, v.shape)


def verify(ref, model, params, n=128):
  """Eval both on the same rays; return max |Δrgb|."""
  import jax.numpy as jnp
  import torch
  ref.eval()
  g = torch.Generator().manual_seed(3)
  r_o = torch.zeros(n, 3)
  r_o[:, 2] = 3.5
  r_d = torch.randn(n, 3, generator=g) * 0.2
  r_d[:, 2] -= 1.0
  rays_t = torch.cat([r_o, r_d], dim=-1)
  with torch.no_grad():
    # the reference renders image-shaped ray grids [B, H, W, 6]
    ref_rgb = ref(rays_t.reshape(1, 8, -1, 6)).reshape(n, 3).numpy()
  ours = model.apply(params, jnp.asarray(rays_t.numpy()))["rgb"]
  return float(np.abs(np.asarray(ours) - ref_rgb).max())


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("ckpt", help="reference .pt (pickled torch module)")
  ap.add_argument("out", help="output checkpoint path")
  ap.add_argument("--reference", default="/root/reference")
  ap.add_argument("--verify", action="store_true",
                  help="compare eval forwards on seeded rays")
  args = ap.parse_args()

  import jax
  # transplant verification compares against f32 torch; default-precision
  # dots lower to bf16 on TPU and would fail the 1e-3 bar spuriously
  jax.config.update("jax_default_matmul_precision", "highest")
  _stub_torch_env(args.reference)
  import torch
  ref = torch.load(args.ckpt, map_location="cpu", weights_only=False)
  model, params, cfg = import_model(ref)
  _check_tree(model, params)
  if args.verify:
    delta = verify(ref, model, params)
    print(f"[import] eval forward max|Δrgb| = {delta:.2e}")
    assert delta < 1e-3, "imported model diverges from the reference"
  from nerf_atlas_tpu.train import checkpoints
  path = checkpoints.save(args.out, params, config=cfg)
  print(f"[import] {type(ref).__name__} -> {path} "
        f"({len(cfg)} config keys); load with the flags in the sidecar "
        f"+ --ref-compat")


if __name__ == "__main__":
  main()
