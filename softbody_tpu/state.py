"""Simulation state pytree — the TPU-native equivalent of the reference's
GPU buffer plane (SURVEY.md §2.2; buffers created engineWorker.ts:136-176).

Mapping from reference buffers to HBM-resident arrays:

- ``particlesA/B`` (24 B stride: pos/vel/acc vec2<f32>, engineMapping.ts:103)
  → ``pos``, ``vel``, ``acc``: ``[N, 2] f32``.  The reference double-buffers
  particles so that all collision partners read a consistent prior substep
  (engineWorker.ts:243-244); here the functional ``lax.scan`` carry *is* the
  read buffer and the returned state *is* the write buffer — the same
  semantics for free.
- ``beams`` (40 B stride, engineMapping.ts:151) → the ``beam_*`` arrays,
  including the GPU-written ``strain``/``stress`` observability channels
  (compute.wgsl:122-124).
- ``mapping`` + ``deleteMappings`` bitmask (engineWorker.ts:170-174) →
  ``particle_alive``/``beam_alive`` masks.  The reference's deletion
  compaction is broken (compute.wgsl:220 "what the fuck is this doing"),
  so we implement the *intended* semantics — broken beams stop existing —
  with static-shape alive masks, which is also the XLA-friendly design.
- ``particleForces`` i32 accumulator (engineWorker.ts:165-169) → transient
  value inside the substep; never materialized in state.

Particle/beam indices are int32 (the u16 ID space of the reference,
engineMapping.ts:362, is a capacity bug we do not replicate).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SimState:
    """Softbody world state. All arrays are padded to static capacity
    ``max_particles`` / ``max_beams``; ``particle_alive`` / ``beam_alive``
    mark the live prefix (or any live subset — holes are allowed)."""

    # Particle plane [N, 2] f32 (+ [N] bool).
    pos: jax.Array
    vel: jax.Array
    acc: jax.Array
    particle_alive: jax.Array
    # Pinned (anchored) particles: participate in collisions and springs
    # but never move.  TPU-build extension (no reference equivalent;
    # required by BASELINE.json config 2 "pinned anchors").
    particle_pinned: jax.Array

    # Beam plane [M] (+ endpoint indices [M] i32).
    beam_a: jax.Array
    beam_b: jax.Array
    beam_length: jax.Array
    beam_target_length: jax.Array
    beam_last_length: jax.Array
    beam_spring: jax.Array
    beam_damp: jax.Array
    beam_yield_strain: jax.Array
    beam_strain_limit: jax.Array
    beam_strain: jax.Array
    beam_stress: jax.Array
    beam_alive: jax.Array

    # Optional CSR-style incidence for scatter-free force accumulation
    # (ops/incidence.py). [N, D] i32 beam index / i8 sign; None disables.
    inc_beam: Optional[jax.Array] = None
    inc_sign: Optional[jax.Array] = None

    @property
    def max_particles(self) -> int:
        return self.pos.shape[0]

    @property
    def max_beams(self) -> int:
        return self.beam_a.shape[0]

    @property
    def particle_count(self) -> jax.Array:
        """Live particle count (≙ metadata ``particle_i_c``,
        engineMapping.ts:275)."""
        return jnp.sum(self.particle_alive.astype(jnp.int32))

    @property
    def beam_count(self) -> jax.Array:
        return jnp.sum(self.beam_alive.astype(jnp.int32))


def empty_state(max_particles: int, max_beams: int) -> SimState:
    """Allocate a zeroed world with the given static capacities."""
    n, m = int(max_particles), int(max_beams)
    f32 = jnp.float32
    return SimState(
        pos=jnp.zeros((n, 2), f32),
        vel=jnp.zeros((n, 2), f32),
        acc=jnp.zeros((n, 2), f32),
        particle_alive=jnp.zeros((n,), bool),
        particle_pinned=jnp.zeros((n,), bool),
        beam_a=jnp.zeros((m,), jnp.int32),
        beam_b=jnp.zeros((m,), jnp.int32),
        beam_length=jnp.ones((m,), f32),
        beam_target_length=jnp.ones((m,), f32),
        beam_last_length=jnp.ones((m,), f32),
        beam_spring=jnp.zeros((m,), f32),
        beam_damp=jnp.zeros((m,), f32),
        beam_yield_strain=jnp.ones((m,), f32),
        beam_strain_limit=jnp.ones((m,), f32),
        beam_strain=jnp.zeros((m,), f32),
        beam_stress=jnp.zeros((m,), f32),
        beam_alive=jnp.zeros((m,), bool),
    )


def state_from_numpy(
    pos: np.ndarray,
    vel: Optional[np.ndarray] = None,
    *,
    beams: Optional[np.ndarray] = None,  # [M, 2] int endpoint indices
    beam_length: Optional[np.ndarray] = None,
    beam_spring: Optional[np.ndarray] = None,
    beam_damp: Optional[np.ndarray] = None,
    beam_yield_strain: Optional[np.ndarray] = None,
    beam_strain_limit: Optional[np.ndarray] = None,
    beam_target_length: Optional[np.ndarray] = None,
    beam_last_length: Optional[np.ndarray] = None,
    acc: Optional[np.ndarray] = None,
    pinned: Optional[np.ndarray] = None,
    max_particles: Optional[int] = None,
    max_beams: Optional[int] = None,
    build_incidence: bool = True,
) -> SimState:
    """Build a SimState from host arrays (the programmatic analog of
    ``BufferMapper.writeState``, engineMapping.ts:500-517).

    Beam ``length`` defaults to the rest distance between endpoints, like
    the editor finalizing a beam (editor.ts:330-333).
    """
    pos = np.asarray(pos, np.float32)
    n_live = pos.shape[0]
    vel = np.zeros_like(pos) if vel is None else np.asarray(vel, np.float32)
    acc = np.zeros_like(pos) if acc is None else np.asarray(acc, np.float32)
    pinned = (
        np.zeros((n_live,), bool) if pinned is None else np.asarray(pinned, bool)
    )
    if beams is None:
        beams = np.zeros((0, 2), np.int32)
    beams = np.asarray(beams, np.int32).reshape(-1, 2)
    m_live = beams.shape[0]

    if beam_length is None:
        if m_live:
            d = pos[beams[:, 0]] - pos[beams[:, 1]]
            beam_length = np.sqrt((d * d).sum(-1), dtype=np.float32)
        else:
            beam_length = np.zeros((0,), np.float32)
    beam_length = np.asarray(beam_length, np.float32)

    def fill(x, default):
        if x is None:
            return np.full((m_live,), default, np.float32)
        return np.broadcast_to(np.asarray(x, np.float32), (m_live,)).copy()

    beam_spring = fill(beam_spring, 1.0)
    beam_damp = fill(beam_damp, 0.0)
    beam_yield_strain = fill(beam_yield_strain, np.inf)
    beam_strain_limit = fill(beam_strain_limit, np.inf)
    beam_target_length = (
        beam_length.copy()
        if beam_target_length is None
        else np.asarray(beam_target_length, np.float32)
    )
    beam_last_length = (
        beam_length.copy()
        if beam_last_length is None
        else np.asarray(beam_last_length, np.float32)
    )

    n = int(max_particles) if max_particles is not None else n_live
    m = int(max_beams) if max_beams is not None else max(m_live, 1)
    if n < n_live or m < m_live:
        raise ValueError("capacity smaller than live count")
    n = max(n, 1)
    m = max(m, 1)

    def padp(x):
        out = np.zeros((n,) + x.shape[1:], x.dtype)
        out[:n_live] = x
        return jnp.asarray(out)

    def padb(x, fill_value=0):
        out = np.full((m,) + x.shape[1:], fill_value, x.dtype)
        out[:m_live] = x
        return jnp.asarray(out)

    state = SimState(
        pos=padp(pos),
        vel=padp(vel),
        acc=padp(acc),
        particle_alive=padp(np.ones((n_live,), bool)),
        particle_pinned=padp(pinned),
        beam_a=padb(beams[:, 0]),
        beam_b=padb(beams[:, 1]),
        beam_length=padb(beam_length, 1.0),
        beam_target_length=padb(beam_target_length, 1.0),
        beam_last_length=padb(beam_last_length, 1.0),
        beam_spring=padb(beam_spring),
        beam_damp=padb(beam_damp),
        beam_yield_strain=padb(beam_yield_strain, 1.0),
        beam_strain_limit=padb(beam_strain_limit, 1.0),
        beam_strain=padb(np.zeros((m_live,), np.float32)),
        beam_stress=padb(np.zeros((m_live,), np.float32)),
        beam_alive=padb(np.ones((m_live,), bool)),
    )
    if build_incidence and m_live:
        from .ops.incidence import build_incidence as _build

        # Host-side build from the padded numpy endpoint arrays (never read
        # device arrays back here — first D2H is very expensive on some
        # TPU transports).
        ba = np.zeros((m,), np.int32)
        bb = np.zeros((m,), np.int32)
        ba[:m_live] = beams[:, 0]
        bb[:m_live] = beams[:, 1]
        inc_beam, inc_sign = _build(ba[:m_live], bb[:m_live], n)
        state.inc_beam = jnp.asarray(inc_beam)
        state.inc_sign = jnp.asarray(inc_sign)
    return state
