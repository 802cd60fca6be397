"""Reference-checkpoint import: torch module -> our params, exact forward.

Builds REAL reference models (torch, /root/reference on sys.path), saves
them the way the reference does (`torch.save(model, path)` — pickled
module, reference runner.py:1221), imports via
scripts/import_reference_ckpt.py, and asserts:
  * the eval forward matches the torch forward to f32 tolerance;
  * the written checkpoint grafts losslessly onto a runner-built
    `--ref-compat` model (zero skipped tensors).
Needs torch + the reference at test time, unlike the fixture-based
parity tests — hence its own module, marked slow.
"""
import importlib.util
import os

import numpy as np
import pytest

import runner  # OUR runner — bind before the fixture puts the
               # reference (which has its own runner.py) on sys.path

pytestmark = pytest.mark.slow  # torch + jit compiles

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def imp():
  spec = importlib.util.spec_from_file_location(
      "import_reference_ckpt",
      os.path.join(REPO, "scripts", "import_reference_ckpt.py"))
  mod = importlib.util.module_from_spec(spec)
  spec.loader.exec_module(mod)
  mod._stub_torch_env("/root/reference")
  return mod


def _roundtrip(imp, ref, tmp_path, runner_argv):
  import torch
  pt = str(tmp_path / "ref.pt")
  torch.save(ref, pt)
  ref2 = torch.load(pt, map_location="cpu", weights_only=False)
  model, params, cfg = imp.import_model(ref2)
  imp._check_tree(model, params)
  delta = imp.verify(ref2, model, params)
  assert delta < 1e-3, f"forward diverges: max|Δrgb|={delta:.2e}"

  # the written checkpoint grafts exactly onto the runner-built model
  from nerf_atlas_tpu.train import checkpoints
  out = checkpoints.save(str(tmp_path / "imported.ckpt"), params,
                         config=cfg)
  args = runner.arguments(runner_argv)
  built = runner.build_model(args, dynamic=False)
  import jax
  import jax.numpy as jnp
  rays = jnp.concatenate([jnp.zeros((4, 3)),
                          jnp.tile(jnp.array([[0, 0, -1.0]]), (4, 1))], -1)
  fresh = built.init({"params": jax.random.PRNGKey(0),
                      "sampler": jax.random.PRNGKey(1)}, rays, train=True)
  restored, info = checkpoints.restore_or_graft(out, fresh)
  assert not info["skipped"], info["skipped"]
  a = built.apply(restored, rays)["rgb"]
  b = model.apply(params, rays)["rgb"]
  np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
  return delta


def test_reference_tiny_is_unsaveable(imp):
  """Documents why TinyNeRF import is unsupported: the reference's own
  constructor crashes (CommonNeRF.set_sigmoid reads `self.refl`, which
  TinyNeRF never sets — ref src/nerf.py:216-219, 285), so no reference
  TinyNeRF checkpoint can exist."""
  from src import nerf as rnerf
  with pytest.raises(AttributeError):
    rnerf.TinyNeRF(steps=12, t_near=2.0, t_far=6.0)


def test_reference_volsdf_is_unsaveable(imp):
  """Same situation for VolSDF: its constructor reads the undefined name
  `with_transmission` (the parameter is `w_transmission`, ref
  src/nerf.py:875, 895) — no reference VolSDF checkpoint can exist."""
  from src import march as rmarch, nerf as rnerf, refl as rrefl
  from src import sdf as rsdf
  m = rsdf.MLP()
  s = rsdf.SDF(m, rrefl.View(out_features=3,
                             latent_size=m.intermediate_size),
               isect=rmarch.load_intersection_kind("bisect"),
               t_near=2.0, t_far=6.0)
  with pytest.raises(NameError):
    rnerf.VolSDF(s, steps=12, t_near=2.0, t_far=6.0)


def test_import_plain_hash(imp, tmp_path):
  from src import nerf as rnerf
  ref = rnerf.PlainNeRF(steps=12, t_near=2.0, t_far=6.0)
  _roundtrip(imp, ref, tmp_path,
             ["--model", "plain", "--ref-compat", "--steps", "12",
              "--near", "2", "--far", "6"])


def test_import_ae(imp, tmp_path):
  from src import nerf as rnerf
  ref = rnerf.NeRFAE(steps=12, t_near=2.0, t_far=6.0)
  _roundtrip(imp, ref, tmp_path,
             ["--model", "ae", "--ref-compat", "--steps", "12",
              "--near", "2", "--far", "6"])
