from .velocity import (VelocityOutputs, velocity_step, velocity_step_jit,
                       make_sharded_velocity_step, example_inputs)

__all__ = ["VelocityOutputs", "velocity_step", "velocity_step_jit",
           "make_sharded_velocity_step", "example_inputs"]
