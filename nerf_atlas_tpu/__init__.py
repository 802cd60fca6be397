"""nerf_atlas_tpu — a TPU-native neural-rendering framework.

A ground-up JAX/XLA/Pallas re-design with the capabilities of the
`nerf_atlas` research framework (reference: JulianKnodt/nerf_atlas):
NeRF model zoo (static + dynamic), SDF shape models and surface
rendering, a reflectance/BRDF zoo with lights and learned occlusion,
MipNeRF IPE, voxel grids, Bezier-spline dynamics, and a flag-driven
training driver — rebuilt TPU-first:

- rays are flat `[N, 6]` tiles sharded over a `jax.sharding.Mesh`
  (data axis), not `[B,H,W]` crops pinned to one device;
- per-sample MLP evaluation is batched onto the MXU in bf16;
- transmittance compositing is an exclusive scan along the sample
  axis (Pallas kernel on the hot path, pure-XLA as oracle);
- everything is jit-compiled; no Python in the step loop.
"""

__version__ = "0.1.0"
