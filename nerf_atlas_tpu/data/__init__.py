"""Data layer: cameras (jittable pytrees) and dataset loaders.

Capability parity: /root/reference/src/cameras.py and src/loaders.py.
TPU-first: loaders return host-side numpy label arrays plus a device
camera pytree; the training driver samples flat ray batches (uniform
over all pixels of all views) rather than per-view crops, so every
step is one static-shape device batch.
"""
from . import cameras, loaders, sampler, synthetic
from .loaders import load

__all__ = ["cameras", "loaders", "sampler", "synthetic", "load"]
