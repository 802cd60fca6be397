"""Utilities: hyper-parameter config files, profiling, plotting."""
from .hyper_config import HyperParameters, load_param_file
from .profiling import step_timer, trace

__all__ = ["HyperParameters", "load_param_file", "step_timer", "trace"]
