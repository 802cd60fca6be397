"""Core TPU render-math ops (pure JAX; Pallas fast paths in ops.pallas)."""

from . import bezier, grid, integrate, march, math, mip, rays, sampling, sh

__all__ = [
    "bezier", "grid", "integrate", "march", "math", "mip", "rays",
    "sampling", "sh",
]
