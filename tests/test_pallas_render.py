"""Fused Pallas render kernel vs the pure-JAX oracle (interpret mode)."""
import jax
import jax.numpy as jnp
import numpy as np

from nerf_atlas_tpu import models
from nerf_atlas_tpu.ops.pallas import fused_plain_cp_render


def test_fused_render_matches_oracle():
  model = models.PlainNeRF(steps=16, t_near=2.0, t_far=6.0, enc_kind="cp")
  n = 64
  key = jax.random.PRNGKey(0)
  r_o = jnp.tile(jnp.array([[0.0, 0, 3.5]]), (n, 1))
  r_d = jax.random.normal(key, (n, 3)) * 0.2 + jnp.array([0.0, 0, -1.0])
  rays = jnp.concatenate([r_o, r_d], -1)
  params = model.init({"params": jax.random.PRNGKey(0),
                       "sampler": jax.random.PRNGKey(1)}, rays, train=True)
  oracle = model.apply(params, rays)
  fused = fused_plain_cp_render(params, rays, steps=16, t_near=2.0,
                                t_far=6.0, block_rays=32, interpret=True)
  np.testing.assert_allclose(np.asarray(fused[:, :3]),
                             np.asarray(oracle["rgb"]), atol=2e-2)
  acc = oracle["weights"].sum(-1)
  np.testing.assert_allclose(np.asarray(fused[:, 3]), np.asarray(acc),
                             atol=2e-2)
