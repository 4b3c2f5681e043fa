"""Static and runtime configuration for the TPU softbody engine.

The reference splits configuration into three tiers
(see /root/reference/src — SURVEY.md §5 "Config / flag system"):

1. compile-time WGSL ``override`` constants (``compute.wgsl:1-3``:
   ``bounds_size``, ``particle_radius``, ``time_step``), specialized at
   pipeline creation (``engineWorker.ts:328-333``) — changing them requires
   engine re-creation (``main.ts:137-146``).
2. runtime-mutable physics constants living in the metadata buffer
   (``engineMapping.ts:289-308``).
3. per-frame user input (``engineMapping.ts:317-325``).

TPU mapping: tier 1 becomes :class:`StaticConfig` — static (hashable) jit
arguments baked into the compiled step.  Tier 2 becomes
:class:`PhysicsConstants` — a small pytree of f32 scalars traced as dynamic
arguments (no recompilation when they change).  Tier 3 becomes
:class:`UserInput`, likewise traced.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

# Default world geometry (engineWorker.ts:39-44).
DEFAULT_BOUNDS_SIZE = 1000.0
DEFAULT_PARTICLE_RADIUS = 10.0
DEFAULT_SUBTICKS = 64
DEFAULT_BLUR = 0.4
# Fixed-point force-accumulation scale (compute.wgsl:70).
PARTICLE_FORCE_SCALE = 65536.0
# Stress visualization scale (compute.wgsl:71): stress = force_mag / 20.
BEAM_STRESS_SCALE = 1.0 / 20.0


@dataclasses.dataclass(frozen=True)
class StaticConfig:
    """Compile-time engine configuration (hashable; static jit argument).

    ``bounds_size``, ``particle_radius`` and ``dt`` mirror the WGSL override
    constants (compute.wgsl:1-3).  ``subticks`` is the number of physics
    substeps per frame, forced even like the reference
    (engineWorker.ts:90: ``Math.ceil(opts.subticks / 2) * 2``).

    Additional TPU-only static knobs:

    - ``collision_mode``: ``"none"`` | ``"allpairs"`` (reference O(N²)
      semantics, compute.wgsl:144-170) | ``"grid"`` (spatial-hash broad
      phase; scalable replacement with identical pair math).
    - ``force_mode``: ``"segment"`` (f32 ``segment_sum`` scatter) |
      ``"quantized"`` (int32 fixed-point at scale 65536, bit-matching the
      reference's deterministic atomic trick, compute.wgsl:127-130) —
      either can run through a CSR incidence gather when the state carries
      one (see ops/incidence.py).
    - ``collision_tile``: j-tile length for the tiled all-pairs loop.
    - ``grid_cell_capacity``: max particles per hash cell (static shape).
    - ``use_pallas``: route hot ops through Pallas TPU kernels.
    """

    bounds_size: float = DEFAULT_BOUNDS_SIZE
    particle_radius: float = DEFAULT_PARTICLE_RADIUS
    subticks: int = DEFAULT_SUBTICKS
    collision_mode: str = "allpairs"
    force_mode: str = "quantized"
    collision_tile: int = 512
    grid_cell_capacity: int = 8
    # "window" broad phase: sorted-row window cap (see ops/collisions.py)
    window_rows: int = 2048
    use_pallas: bool = False

    def __post_init__(self) -> None:
        object.__setattr__(self, "subticks", max(2, -(-self.subticks // 2) * 2))
        if self.collision_mode not in ("none", "allpairs", "grid", "window"):
            raise ValueError(f"unknown collision_mode {self.collision_mode!r}")
        if self.force_mode not in ("segment", "quantized"):
            raise ValueError(f"unknown force_mode {self.force_mode!r}")

    @property
    def dt(self) -> float:
        """Substep timestep, ≙ override ``time_step = 1/subticks``
        (engineWorker.ts:331)."""
        return 1.0 / self.subticks


def _f32(x: Any) -> jax.Array:
    return jnp.asarray(x, dtype=jnp.float32)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PhysicsConstants:
    """Runtime-mutable physics constants (metadata buffer fields 48..80,
    engineMapping.ts:260, order: gravity.xy, borderElasticity,
    borderFriction, elasticity, friction, dragCoeff, dragExp).

    Defaults match ``engineMapping.ts:264-272`` / ``main.ts:34-42``.
    """

    gravity: jax.Array
    border_elasticity: jax.Array
    border_friction: jax.Array
    elasticity: jax.Array
    friction: jax.Array
    drag_coeff: jax.Array
    drag_exp: jax.Array

    @classmethod
    def default(cls) -> "PhysicsConstants":
        return cls(
            gravity=_f32([0.0, -0.5]),
            border_elasticity=_f32(0.5),
            border_friction=_f32(0.2),
            elasticity=_f32(0.5),
            friction=_f32(0.1),
            drag_coeff=_f32(0.001),
            drag_exp=_f32(2.0),
        )

    @classmethod
    def from_array(cls, arr: Any) -> "PhysicsConstants":
        """From the 8-f32 layout of the metadata buffer (engineMapping.ts:260)."""
        arr = _f32(arr)
        return cls(
            gravity=arr[0:2],
            border_elasticity=arr[2],
            border_friction=arr[3],
            elasticity=arr[4],
            friction=arr[5],
            drag_coeff=arr[6],
            drag_exp=arr[7],
        )

    def to_array(self) -> jax.Array:
        return jnp.concatenate(
            [
                self.gravity.reshape(2),
                jnp.stack(
                    [
                        self.border_elasticity,
                        self.border_friction,
                        self.elasticity,
                        self.friction,
                        self.drag_coeff,
                        self.drag_exp,
                    ]
                ),
            ]
        )


# Input clamping ranges from the reference's clamped-input framework
# (main.ts:92-133; createClampedInput calls at main.ts:120-132).
CLAMP_RANGES = {
    "particle_radius": (1.0, 500.0, 1.0),
    "subticks": (2, 256, 2),
    "keyboard_force": (0.1, 10.0, 0.1),
    "gravity_x": (-10.0, 10.0, 0.02),
    "gravity_y": (-10.0, 10.0, 0.02),
    "border_elasticity": (0.0, 1.0, 0.01),
    "border_friction": (0.0, 10.0, 0.01),
    "elasticity": (0.0, 1.0, 0.01),
    "friction": (0.0, 10.0, 0.01),
    "drag_coeff": (0.0, 2.0**32, 0.001),
    "drag_exp": (1.0, 4.0, 0.1),
    # editor beam settings (main.ts:298-303)
    "beam_spring": (0.0, 2000.0, 0.1),
    "beam_damp": (0.0, 2000.0, 0.1),
    "yield_strain": (0.0, 2000.0, 0.1),
    "strain_limit": (0.0, 2000.0, 0.1),
    "triangulation_distance": (0.0, 1000.0, 10.0),
    "snap_grid_size": (0.0, 100.0, 10.0),
}


def clamp_value(name: str, value: float) -> float:
    """Clamp + snap a configuration value to the reference UI's range/step
    (``updateClamps``, main.ts:93-106: round to step, then clamp)."""
    lo, hi, step = CLAMP_RANGES[name]
    import math

    v = round(float(value) / step) * step
    v = max(lo, min(hi, v))
    if math.isnan(v):
        v = 1.0  # main.ts:101: NaN → 1
    return v


def clamp_constants(consts: "PhysicsConstants") -> "PhysicsConstants":
    """Return a copy with every field clamped to the reference UI ranges."""
    import numpy as np

    g = np.asarray(consts.gravity)
    return PhysicsConstants(
        gravity=_f32([clamp_value("gravity_x", float(g[0])),
                      clamp_value("gravity_y", float(g[1]))]),
        border_elasticity=_f32(clamp_value("border_elasticity",
                                           float(consts.border_elasticity))),
        border_friction=_f32(clamp_value("border_friction",
                                         float(consts.border_friction))),
        elasticity=_f32(clamp_value("elasticity", float(consts.elasticity))),
        friction=_f32(clamp_value("friction", float(consts.friction))),
        drag_coeff=_f32(clamp_value("drag_coeff", float(consts.drag_coeff))),
        drag_exp=_f32(clamp_value("drag_exp", float(consts.drag_exp))),
    )


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class UserInput:
    """Per-frame user input block (metadata bytes 80..112,
    engineMapping.ts:317-325; consumed at compute.wgsl:177-181)."""

    user_strength: jax.Array
    mouse_active: jax.Array  # bool scalar (u32 flag in the reference)
    mouse_pos: jax.Array
    mouse_vel: jax.Array
    applied_force: jax.Array

    @classmethod
    def none(cls) -> "UserInput":
        return cls(
            user_strength=_f32(1.0),
            mouse_active=jnp.asarray(False),
            mouse_pos=_f32([0.0, 0.0]),
            mouse_vel=_f32([0.0, 0.0]),
            applied_force=_f32([0.0, 0.0]),
        )
