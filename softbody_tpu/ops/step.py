"""Full physics step: one substep ≙ one ``compute_update`` dispatch
(/root/reference/src/shaders/compute.wgsl:90-203); one frame ≙ the 64
substep dispatches encoded into a single command buffer per frame
(engineWorker.ts:646-665), realized as ``jax.lax.scan`` over substeps so
the whole frame is one XLA program with zero host round-trips.

The reference's particle double-buffering (bind groups A/B alternating,
engineWorker.ts:655-658, rationale comment :243-244) is inherent here: the
scan carry is the read buffer, the returned state the write buffer.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp

from ..config import PhysicsConstants, StaticConfig, UserInput
from ..state import SimState
from .collisions import collision_terms
from .forces import accumulate_forces, beam_forces
from .integrate import integrate_particles


def substep(
    state: SimState,
    consts: PhysicsConstants,
    uin: UserInput,
    cfg: StaticConfig,
) -> SimState:
    """One physics substep. Pure; both beam and particle passes read the
    incoming (previous-substep) state, matching the intended semantics of
    the single fused WGSL dispatch."""
    force_vec, beam_upd, _breaks = beam_forces(state, cfg)
    beam_force = accumulate_forces(state, force_vec, cfg)

    coll_dv, coll_da, coll_dy = collision_terms(
        state.pos, state.vel, state.particle_alive, consts, cfg
    )

    pos, vel, acc = integrate_particles(
        state.pos,
        state.vel,
        state.acc,
        state.particle_alive,
        state.particle_pinned,
        coll_dv,
        coll_da,
        coll_dy,
        beam_force,
        consts,
        uin,
        cfg,
    )

    return dataclasses.replace(
        state,
        pos=pos,
        vel=vel,
        acc=acc,
        **beam_upd,
    )


def frame(
    state: SimState,
    consts: PhysicsConstants,
    uin: UserInput,
    cfg: StaticConfig,
) -> SimState:
    """One frame = ``cfg.subticks`` substeps under ``lax.scan``."""

    def body(carry, _):
        return substep(carry, consts, uin, cfg), None

    out, _ = jax.lax.scan(body, state, None, length=cfg.subticks)
    return out


substep_jit = jax.jit(substep, static_argnames=("cfg",))


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnames=("state",))
def frame_jit(
    state: SimState,
    consts: PhysicsConstants,
    uin: UserInput,
    cfg: StaticConfig,
) -> SimState:
    """Jitted, state-donating frame step — the hot entry point used by the
    engine runtime. Donation gives in-place HBM reuse (the functional
    analog of the reference mutating its GPU buffers in place)."""
    return frame(state, consts, uin, cfg)


def run_frames(
    state: SimState,
    consts: PhysicsConstants,
    uin: UserInput,
    cfg: StaticConfig,
    num_frames: int,
) -> SimState:
    """Convenience driver for benchmarks/tests."""
    for _ in range(num_frames):
        state = frame_jit(state, consts, uin, cfg)
    return state
