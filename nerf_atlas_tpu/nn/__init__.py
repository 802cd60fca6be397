"""Neural building blocks (flax.linen modules), TPU-first.

Capability parity with the reference's src/neural_blocks.py, redesigned:
- compute dtype is configurable (bfloat16 on the MXU hot path, float32
  params) rather than implicit float32;
- the hash-grid encoder is device-agnostic (the reference hardcodes
  `.cuda()`, src/neural_blocks.py:144) and gathers all levels in one
  batched `take` so XLA emits a single fused gather;
- everything is a pure function of (params, inputs) — no hidden state.
"""
from .encoders import (
    CPEncoder,
    FourierEncoder,
    HashEncoder,
    LearnedFourierEncoder,
    NNEncoder,
    PositionalEncoder,
    RefHashEncoder,
)
from .mlp import SkipConnMLP
from .conv import Discriminator, SpatialEncoder, UpdateOperator, Upsampler
from .misc import (EncodedGRU, MonteCarloUncertainty, PointNet,
                   StyleLoss, gram_matrix)

__all__ = [
    "PositionalEncoder", "FourierEncoder", "LearnedFourierEncoder",
    "NNEncoder", "HashEncoder", "RefHashEncoder", "CPEncoder",
    "SkipConnMLP", "Upsampler",
    "SpatialEncoder", "Discriminator", "UpdateOperator", "EncodedGRU",
    "PointNet", "gram_matrix", "StyleLoss", "MonteCarloUncertainty",
]
