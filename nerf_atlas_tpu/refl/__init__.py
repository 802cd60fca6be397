"""Reflectance / shading stack: BRDF zoo, lights, occlusion, integrators.

Capability parity: /root/reference/src/refl.py, src/lights.py,
src/renderers.py. Every reflectance model maps flat per-sample inputs
(x, view, normal, light, latent) -> rgb, so the whole shading pass is one
MXU batch regardless of which BRDF is selected.
"""
from .brdf import (
    REFL_KINDS, AlternatingOptimization, Basic, CookTorrance, Diffuse,
    FourierBasis, LightAndRefl, PosLinearView, Positional, Rusin,
    SphericalHarmonic, View, ViewLight, WeightedChoice, load_refl,
    rusin_params,
)
from .lights import LIGHT_KINDS, Field, Point, load_light
from .occlusion import (
    OCC_KINDS, AllLearnedOcc, Direct, JointLearnedConstOcc,
    LearnedConstantSoftLighting, LearnedLighting, LightingWIsect,
    load_occlusion,
)

__all__ = [
    "REFL_KINDS", "load_refl", "View", "Positional", "ViewLight",
    "PosLinearView", "Basic", "Diffuse", "CookTorrance", "Rusin",
    "SphericalHarmonic", "FourierBasis", "WeightedChoice",
    "AlternatingOptimization", "LightAndRefl", "rusin_params",
    "LIGHT_KINDS", "Point", "Field", "load_light",
    "OCC_KINDS", "load_occlusion", "LightingWIsect", "LearnedLighting",
    "LearnedConstantSoftLighting", "AllLearnedOcc", "JointLearnedConstOcc",
    "Direct",
]
