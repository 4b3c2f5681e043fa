"""World-parallel (dp) simulation: vmap the frame step over a batch of
independent worlds and shard the batch axis across the mesh.

This is the TPU-native "data parallel" axis from SURVEY.md §2.4 —
batched simulation of many scenes (ensemble runs, parameter sweeps,
benchmarking).  No cross-world communication exists, so XLA compiles to
fully independent per-device programs."""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import PhysicsConstants, StaticConfig, UserInput
from ..ops.step import frame
from ..state import SimState


def stack_states(states: Sequence[SimState]) -> SimState:
    """Stack same-capacity worlds along a new leading batch axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *states)


def unstack_states(batched: SimState) -> list:
    b = batched.pos.shape[0]
    return [jax.tree.map(lambda x: x[i], batched) for i in range(b)]


def batched_frame_fn(cfg: StaticConfig, mesh: Mesh, axis: str = "dp"):
    """Build a jitted batched frame step with the batch axis sharded over
    ``mesh[axis]``.  Constants/inputs may be per-world (leading batch dim)
    or shared — pass ``per_world=True`` accordingly."""

    batch_sharding = NamedSharding(mesh, P(axis))

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(states: SimState, consts: PhysicsConstants, uin: UserInput):
        states = jax.lax.with_sharding_constraint(states, batch_sharding)
        return jax.vmap(lambda s: frame(s, consts, uin, cfg))(states)

    return step


def device_put_batched(states: SimState, mesh: Mesh, axis: str = "dp") -> SimState:
    sharding = NamedSharding(mesh, P(axis))
    return jax.device_put(states, sharding)
