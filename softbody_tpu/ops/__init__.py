"""Physics ops: the compute tier of the TPU softbody engine
(≙ /root/reference/src/shaders/compute.wgsl)."""

from .step import frame, frame_jit, run_frames, substep  # noqa: F401
from .forces import accumulate_forces, beam_forces  # noqa: F401
from .collisions import build_grid, collision_terms  # noqa: F401
from .integrate import integrate_particles  # noqa: F401
from .incidence import build_incidence  # noqa: F401
