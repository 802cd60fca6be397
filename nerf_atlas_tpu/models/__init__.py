"""Model zoo registries (the CLI contract, mirroring the reference's
`model_kinds` / `dyn_model_kinds` / `sdf_kinds` string registries:
/root/reference/src/nerf.py:1698-1720, src/sdf.py:308-316)."""
from .base import NeRFBase
from .nerf import CoarseFineNeRF, NeRFAE, PlainNeRF, TinyNeRF
from .sdf import SDF, SDF_KINDS, load_sdf_shape
from .volsdf import VolSDF
from .voxel import DynamicNeRFVoxel, NeRFVoxel, upsample_params

MODEL_KINDS = {
    "tiny": TinyNeRF,
    "plain": PlainNeRF,
    "ae": NeRFAE,
    "coarse_fine": CoarseFineNeRF,
    "volsdf": VolSDF,
    "sdf": SDF,
    "voxel": NeRFVoxel,
}

# the long tail registers lazily to keep import time low and avoid
# circular imports (extra.py imports MODEL_KINDS for canonical lookup)
from .extra import (BendyNeRF, HistogramNeRF, MPI, RecurrentNeRF, RigNeRF,
                    DynamicRigNeRF, SinglePixelNeRF, SplineNeRF)

MODEL_KINDS.update({
    "mpi": MPI,
    "rig": RigNeRF,
    "spline": SplineNeRF,
    "hist": HistogramNeRF,
    "bendy": BendyNeRF,
    "recurrent": RecurrentNeRF,
    "pixel-single": SinglePixelNeRF,
})

from .upsample import NeuralUpsampled
from .dyn import DYN_MODEL_KINDS, DynamicNeRF, DynamicNeRFAE, LongDynamicNeRF

DYN_MODEL_KINDS = dict(DYN_MODEL_KINDS)
DYN_MODEL_KINDS.update({
    "rig": DynamicRigNeRF,
    "voxel": DynamicNeRFVoxel,
})


def load_model(kind: str, **kwargs):
  ctor = MODEL_KINDS.get(kind)
  if ctor is None:
    raise NotImplementedError(f"unknown model kind {kind}")
  return ctor(**kwargs)


def load_dyn_model(kind: str, **kwargs):
  ctor = DYN_MODEL_KINDS.get(kind)
  if ctor is None:
    raise NotImplementedError(f"unknown dyn model kind {kind}")
  return ctor(**kwargs)


__all__ = [
    "NeRFBase", "TinyNeRF", "PlainNeRF", "NeRFAE", "CoarseFineNeRF",
    "VolSDF", "SDF", "SDF_KINDS", "MODEL_KINDS", "DYN_MODEL_KINDS",
    "load_model", "load_dyn_model", "load_sdf_shape", "NeRFVoxel",
    "DynamicNeRFVoxel", "upsample_params", "MPI", "RigNeRF",
    "DynamicRigNeRF", "SplineNeRF", "HistogramNeRF", "BendyNeRF",
    "RecurrentNeRF", "SinglePixelNeRF", "NeuralUpsampled", "DynamicNeRF", "DynamicNeRFAE",
    "LongDynamicNeRF",
]
