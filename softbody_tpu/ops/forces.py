"""Beam (spring+damper) force pass — the vectorized TPU equivalent of the
beam half of ``compute_update`` (/root/reference/src/shaders/compute.wgsl:94-131).

Per live beam, reading the *previous substep* particle state:

- zero-length guard: ``diff ← (0, -1e-10)`` (compute.wgsl:104-107)
- ``force_mag = (target_len − len)·spring + (last_len − len)·damp`` (110)
- plastic yield: ``|strain| > yield_strain → target_len = len −
  yield_strain·length·sign(strain)`` (113-116)
- breakage mark when ``|len − length| > length·strain_break_limit`` (117-121)
- observability channels ``stress = force_mag/20``,
  ``strain = |strain|/yield_strain`` (122-124)
- equal/opposite endpoint forces, accumulated deterministically (127-130).

Deviation from the reference (intended-semantics fix, SURVEY.md §2.3.6):
a broken beam still applies force in the substep where it breaks (as in the
reference) but is dead from the *next* substep on, instead of surviving
until a buggy end-of-frame compaction pass.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..config import BEAM_STRESS_SCALE, PARTICLE_FORCE_SCALE, StaticConfig
from ..state import SimState


def beam_forces(state: SimState, cfg: StaticConfig):
    """Compute per-beam endpoint forces and updated beam state.

    Returns ``(force_vec [M,2] f32 — force applied to endpoint b; endpoint a
    receives the negation — , beam_updates dict, break_mask [M] bool)``.
    """
    pos = state.pos
    a, b = state.beam_a, state.beam_b
    # A beam is active only when it and both endpoints are alive.  (In the
    # reference a beam whose endpoint was deleted reads stale frozen data —
    # editor.ts:631-658 renders such beams as "invalid"; we inert them.)
    active = (
        state.beam_alive
        & state.particle_alive[a]
        & state.particle_alive[b]
    )

    diff = pos[b] - pos[a]
    raw_len = jnp.sqrt(jnp.sum(diff * diff, axis=-1))
    zero = raw_len == 0.0
    # compute.wgsl:104-107 — nudge to (0, -1e-10) to avoid 0/0.
    diff = jnp.where(
        zero[:, None],
        jnp.array([0.0, -1.0e-10], jnp.float32),
        diff,
    )
    length_now = jnp.where(zero, jnp.float32(1.0e-10), raw_len)

    force_mag = (
        (state.beam_target_length - length_now) * state.beam_spring
        + (state.beam_last_length - length_now) * state.beam_damp
    )
    # canonical f32 order shared by every engine path (oracle.py pins it):
    # (fmag·dd)·(1/ln) — the reciprocal form the stencil and fused Pallas
    # kernels use, so quantized beam forces are bit-identical across the
    # flat, stencil, planified, and directed engines.
    inv_len = 1.0 / length_now
    force_vec = (force_mag[:, None] * diff) * inv_len[:, None]

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

    upd = {
        "beam_target_length": jnp.where(active, new_target, state.beam_target_length),
        "beam_last_length": jnp.where(active, length_now, state.beam_last_length),
        "beam_stress": jnp.where(
            active, force_mag * jnp.float32(BEAM_STRESS_SCALE), state.beam_stress
        ),
        "beam_strain": jnp.where(
            active,
            jnp.abs(strain) / state.beam_yield_strain,
            state.beam_strain,
        ),
        "beam_alive": state.beam_alive & ~(active & breaks),
    }
    force_vec = jnp.where(active[:, None], force_vec, 0.0)
    return force_vec, upd, active & breaks


def accumulate_forces(
    state: SimState,
    force_vec: jax.Array,
    cfg: StaticConfig,
) -> jax.Array:
    """Accumulate beam endpoint forces into per-particle totals.

    ``force_mode="quantized"`` reproduces the reference's i32 fixed-point
    trick exactly: each contribution is truncated to int32 at scale 65536
    (WGSL ``i32()`` truncates toward zero, compute.wgsl:127-130) and summed
    in int32 (wrapping, like ``atomicAdd``), then rescaled.

    Uses the state's CSR incidence gather when present (TPU-friendly; no
    scatter), else ``segment_sum``.
    """
    n = state.max_particles
    if cfg.force_mode == "quantized":
        q = _trunc_i32(force_vec * jnp.float32(PARTICLE_FORCE_SCALE))
        if state.inc_beam is not None:
            contrib = q[state.inc_beam] * state.inc_sign[..., None].astype(jnp.int32)
            total = jnp.sum(contrib, axis=1, dtype=jnp.int32)
        else:
            ids = jnp.concatenate([state.beam_a, state.beam_b])
            vals = jnp.concatenate([-q, q])
            total = jax.ops.segment_sum(vals, ids, num_segments=n)
        return total.astype(jnp.float32) / jnp.float32(PARTICLE_FORCE_SCALE)
    else:
        if state.inc_beam is not None:
            contrib = (
                force_vec[state.inc_beam]
                * state.inc_sign[..., None].astype(jnp.float32)
            )
            return jnp.sum(contrib, axis=1)
        ids = jnp.concatenate([state.beam_a, state.beam_b])
        vals = jnp.concatenate([-force_vec, force_vec])
        return jax.ops.segment_sum(vals, ids, num_segments=n)


def _trunc_i32(x: jax.Array) -> jax.Array:
    """WGSL ``i32(f32)``: truncation toward zero, clamped at the i32 range."""
    return jnp.trunc(x).astype(jnp.int32)
