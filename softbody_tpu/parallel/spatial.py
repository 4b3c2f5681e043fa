"""Spatial (sp) sharding: one world, particles and beams sharded into
index slabs across mesh devices with ``shard_map``.

Per-substep communication pattern (all over ICI):

1. ``all_gather`` of positions + velocities + alive over ``sp`` — every
   device sees the whole world's kinematic state (beams and collisions
   may reference any particle).
2. Local beam pass over the local beam slab; forces scattered into a
   full-length per-particle accumulator via ``segment_sum``.
3. ``psum`` of the accumulator over ``sp`` (equal/opposite endpoint
   forces may land on remote slabs), then each device slices its slab.
   With ``force_mode="quantized"`` the accumulator is int32 fixed-point,
   so the reduction is exactly associative — bit-identical to the
   reference's atomic i32 adds (compute.wgsl:68-70) at any device count.
4. Local collision pass: the query-subset collision kernels
   (ops/collisions.py ``query=``) evaluate only the local slab against
   the gathered world.
5. Local integration.

The CSR incidence gather is a single-device optimization; spatial mode
always routes force accumulation through segment_sum + psum.

Supports an optional leading batch ("dp") axis: batch sharded over
``dp``, particles/beams over ``sp`` — a full dp×sp 2-D parallelism.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..config import PARTICLE_FORCE_SCALE, PhysicsConstants, StaticConfig, UserInput
from ..ops.collisions import collision_terms
from ..ops.forces import _trunc_i32
from ..ops.integrate import integrate_particles
from ..state import SimState
from .mesh import pad_to_multiple


def pad_state_for_mesh(state: SimState, sp: int) -> SimState:
    """Pad particle/beam capacity to a multiple of the spatial axis size
    (dead padding lanes; physics is mask-invariant)."""
    n, m = state.max_particles, state.max_beams
    n2, m2 = pad_to_multiple(n, sp), pad_to_multiple(m, sp)
    if n2 == n and m2 == m:
        return _drop_incidence(state)

    def padp(x, fill=0):
        return jnp.pad(x, ((0, n2 - n),) + ((0, 0),) * (x.ndim - 1),
                       constant_values=fill)

    def padb(x, fill=0):
        return jnp.pad(x, ((0, m2 - m),) + ((0, 0),) * (x.ndim - 1),
                       constant_values=fill)

    return SimState(
        pos=padp(state.pos),
        vel=padp(state.vel),
        acc=padp(state.acc),
        particle_alive=padp(state.particle_alive),
        particle_pinned=padp(state.particle_pinned),
        beam_a=padb(state.beam_a),
        beam_b=padb(state.beam_b),
        beam_length=padb(state.beam_length, 1),
        beam_target_length=padb(state.beam_target_length, 1),
        beam_last_length=padb(state.beam_last_length, 1),
        beam_spring=padb(state.beam_spring),
        beam_damp=padb(state.beam_damp),
        beam_yield_strain=padb(state.beam_yield_strain, 1),
        beam_strain_limit=padb(state.beam_strain_limit, 1),
        beam_strain=padb(state.beam_strain),
        beam_stress=padb(state.beam_stress),
        beam_alive=padb(state.beam_alive),
    )


def _drop_incidence(state: SimState) -> SimState:
    if state.inc_beam is None:
        return state
    return dataclasses.replace(state, inc_beam=None, inc_sign=None)


def _local_substep(state: SimState, consts, uin, cfg: StaticConfig, axis: str):
    """Shard-local substep: ``state`` holds this device's particle/beam
    slabs; collectives over ``axis`` stitch the world together."""
    n_loc = state.pos.shape[0]
    me = jax.lax.axis_index(axis)
    offset = me * n_loc

    # (1) gather world kinematics
    pos_full = jax.lax.all_gather(state.pos, axis, tiled=True)
    vel_full = jax.lax.all_gather(state.vel, axis, tiled=True)
    alive_full = jax.lax.all_gather(state.particle_alive, axis, tiled=True)
    n = pos_full.shape[0]

    # (2) local beam pass (beam half of compute.wgsl:94-131 on the slab)
    a, b = state.beam_a, state.beam_b
    active = state.beam_alive & alive_full[a] & alive_full[b]
    diff = pos_full[b] - pos_full[a]
    raw_len = jnp.sqrt(jnp.sum(diff * diff, axis=-1))
    zero = raw_len == 0.0
    diff = jnp.where(zero[:, None], jnp.array([0.0, -1.0e-10], jnp.float32), diff)
    length_now = jnp.where(zero, jnp.float32(1.0e-10), raw_len)
    force_mag = (
        (state.beam_target_length - length_now) * state.beam_spring
        + (state.beam_last_length - length_now) * state.beam_damp
    )
    force_vec = force_mag[:, None] * (diff / length_now[:, None])
    strain = (length_now - state.beam_target_length) / state.beam_length
    yielded = jnp.abs(strain) > state.beam_yield_strain
    new_target = jnp.where(
        yielded,
        length_now - state.beam_yield_strain * state.beam_length * jnp.sign(strain),
        state.beam_target_length,
    )
    breaks = (
        jnp.abs(length_now - state.beam_length)
        > state.beam_length * state.beam_strain_limit
    )
    beam_upd = {
        "beam_target_length": jnp.where(active, new_target, state.beam_target_length),
        "beam_last_length": jnp.where(active, length_now, state.beam_last_length),
        "beam_stress": jnp.where(active, force_mag / 20.0, state.beam_stress),
        "beam_strain": jnp.where(
            active, jnp.abs(strain) / state.beam_yield_strain, state.beam_strain
        ),
        "beam_alive": state.beam_alive & ~(active & breaks),
    }
    force_vec = jnp.where(active[:, None], force_vec, 0.0)

    # (3) scatter + cross-device reduce of endpoint forces
    ids = jnp.concatenate([a, b])
    if cfg.force_mode == "quantized":
        qf = _trunc_i32(force_vec * jnp.float32(PARTICLE_FORCE_SCALE))
        vals = jnp.concatenate([-qf, qf])
        partial = jax.ops.segment_sum(vals, ids, num_segments=n)
        total = jax.lax.psum(partial, axis)
        beam_force_full = total.astype(jnp.float32) / jnp.float32(
            PARTICLE_FORCE_SCALE
        )
    else:
        vals = jnp.concatenate([-force_vec, force_vec])
        partial = jax.ops.segment_sum(vals, ids, num_segments=n)
        beam_force_full = jax.lax.psum(partial, axis)
    beam_force = jax.lax.dynamic_slice_in_dim(beam_force_full, offset, n_loc)

    # (4) local collision pass against the gathered world
    idx_q = offset + jnp.arange(n_loc, dtype=jnp.int32)
    pos_q = jax.lax.dynamic_slice_in_dim(pos_full, offset, n_loc)
    vel_q = jax.lax.dynamic_slice_in_dim(vel_full, offset, n_loc)
    alive_q = state.particle_alive
    coll_dv, coll_da, coll_dy = collision_terms(
        pos_full, vel_full, alive_full, consts, cfg,
        query=(pos_q, vel_q, alive_q, idx_q),
    )

    # (5) local integration (compute.wgsl:171-199)
    pos2, vel2, acc2 = integrate_particles(
        state.pos, state.vel, state.acc,
        state.particle_alive, state.particle_pinned,
        coll_dv, coll_da, coll_dy, beam_force,
        consts, uin, cfg,
    )
    return dataclasses.replace(
        state, pos=pos2, vel=vel2, acc=acc2, **beam_upd
    )


def spatial_frame_fn(
    cfg: StaticConfig,
    mesh: Mesh,
    *,
    sp_axis: str = "sp",
    dp_axis: Optional[str] = None,
    donate: bool = True,
):
    """Build a jitted frame step for a state sharded over ``mesh``.

    Expects particle/beam arrays sharded along their leading dim over
    ``sp_axis``.  With ``dp_axis`` set, the state carries a leading batch
    dim sharded over it (dp×sp).  Beam endpoint indices are global, so a
    beam may connect particles on different devices."""

    p_dims = (dp_axis, sp_axis) if dp_axis else (sp_axis,)
    # P(...) acts as a pytree prefix: applied to every state leaf, so the
    # (post-batch) leading dim of every array shards over sp.
    spec = P(*p_dims)

    def _frame_local(state, consts, uin):
        def body(carry, _):
            return _local_substep(carry, consts, uin, cfg, sp_axis), None

        out, _ = jax.lax.scan(body, state, None, length=cfg.subticks)
        return out

    def _frame_batched(state, consts, uin):
        if dp_axis:
            return jax.vmap(lambda s: _frame_local(s, consts, uin))(state)
        return _frame_local(state, consts, uin)

    sm = shard_map(
        _frame_batched,
        mesh=mesh,
        in_specs=(spec, P(), P()),
        out_specs=spec,
        check_vma=False,
    )
    if donate:
        return jax.jit(sm, donate_argnums=(0,))
    return jax.jit(sm)


def shard_state(state: SimState, mesh: Mesh, *, sp_axis: str = "sp",
                dp_axis: Optional[str] = None) -> SimState:
    """Place a (pre-padded) state onto the mesh with slab sharding."""
    p_dims = (dp_axis, sp_axis) if dp_axis else (sp_axis,)
    sharding = NamedSharding(mesh, P(*p_dims))
    return jax.device_put(_drop_incidence(state), sharding)
