from .kernel import (TransportParams, make_planck_table, run_timestep,
                     run_timestep_chunk, zero_estimators)

__all__ = ["TransportParams", "make_planck_table", "run_timestep",
           "run_timestep_chunk", "zero_estimators"]
