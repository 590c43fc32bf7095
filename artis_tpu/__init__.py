"""artis_tpu: a TPU-native Monte Carlo radiative-transfer engine.

A from-scratch JAX/XLA rebuild of the capabilities of ARTIS
(3D time-dependent special-relativistic MC radiative transfer for
supernova/kilonova ejecta): vectorised packet-megabatch transport,
segment-sum estimators, Bateman decay networks, LTE/grey plasma
updates, and spectrum/light-curve extraction — designed for SPMD
execution over TPU device meshes.
"""

import os as _os

if _os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
    # honour JAX_PLATFORMS=cpu explicitly: in this environment a
    # site hook pre-registers the tunneled TPU backend and the env
    # var alone does not stop jax from initialising (and hanging on)
    # it — the config update does
    import jax as _jax
    _jax.config.update("jax_platforms", "cpu")

from .config import SimConfig, read_input_txt
from .driver import Simulation
from .model import (Model, make_toy_1d_model, make_toy_3d_model,
                    model_2d_to_3d, read_1d_model, read_2d_model,
                    read_3d_model, read_abundances)

__version__ = "0.1.0"

__all__ = ["SimConfig", "read_input_txt", "Simulation", "Model",
           "make_toy_1d_model", "make_toy_3d_model", "model_2d_to_3d",
           "read_1d_model", "read_2d_model", "read_3d_model",
           "read_abundances", "__version__"]
