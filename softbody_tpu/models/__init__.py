"""Scene/model families (≙ the reference's default-state builder,
main.ts:188-253, plus the BASELINE.json benchmark configs)."""

from .lattice import add_rectangle, lattice_arrays, merge_scenes  # noqa: F401
from .lattice_dense import (  # noqa: F401
    cloth_lattice,
    lattice_to_simstate,
    make_lattice,
    tearing_cloth_lattice,
)
from .scenes import (  # noqa: F401
    SCENES,
    blob,
    cloth,
    default_scene,
    multi_blob,
    self_colliding_cloth,
    tearing_cloth,
)
