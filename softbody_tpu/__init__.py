"""softbody_tpu — a TPU-native 2D softbody simulation framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of the
WebGPU reference engine ``spsquared/softbody-webgpu`` (BeamNG-style
node/beam softbodies: particles with elastic collisions, spring+damper
beams with plastic deformation and strain breakage, a square world border,
user forces, snapshots and an editor).  See SURVEY.md for the layer map.
"""

from .config import (  # noqa: F401
    PhysicsConstants,
    StaticConfig,
    UserInput,
    DEFAULT_BOUNDS_SIZE,
    DEFAULT_PARTICLE_RADIUS,
    DEFAULT_SUBTICKS,
)
from .state import SimState, empty_state, state_from_numpy  # noqa: F401
from .ops import frame, frame_jit, substep  # noqa: F401

__version__ = "0.1.0"
