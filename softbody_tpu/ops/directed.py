"""Directed-CSR general-topology engine: the TPU-native fast path for
arbitrary beam graphs (editor scenes, blobs, triangulated disks) at
scale — BASELINE config 3's "arbitrary topology" capability.

The flat beam-list path (ops/forces.py + ops/incidence.py) costs, per
substep, TWO endpoint gathers over the beam list plus an incidence
gather per particle — ~1.6M gather rows at 100k particles / 400k beams
(~17 ms; TPU gathers are priced per row, ~90M rows/s).  This module
stores the topology DIRECTED: per-particle incidence slots ``[N, D]``
holding the partner index, the edge parameters, and a DUPLICATED copy of
the edge's mutable state (target/last length, alive).  Both twins of an
edge compute the identical update from identical operands (the same
trick as the fused lattice kernel's full-offset evaluation,
ops/pallas/fused_substep2.py) — so the only per-substep gather is ONE
``pos[partner]`` ([N·D rows, measured 4.9 ms at 100k), the force
accumulate is a free dense row-sum, and edge state updates are dense
[N, D] elementwise stores.

Exactness: with ``force_mode="quantized"`` the per-particle force totals
are BIT-IDENTICAL to the flat path (and therefore to the reference's
i32 atomic accumulation, compute.wgsl:68-70,127-130): per-slot
contributions are ``trunc(±f·65536)`` — WGSL ``i32()`` truncation
commutes with negation — summed in int32, which commutes.  Collision
and integration passes are shared with the flat path unchanged.

Reference semantics: compute.wgsl:96-131 (spring/damp force, plastic
yield, strain breakage), evaluated once per TWIN; the zero-length nudge
(compute.wgsl:104-107) is applied to the canonical a→b difference via a
per-slot sign so both twins see the reference's exact vector.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..config import (
    BEAM_STRESS_SCALE,
    PARTICLE_FORCE_SCALE,
    PhysicsConstants,
    StaticConfig,
    UserInput,
)
from ..state import SimState
from .collisions import collision_terms
from .integrate import integrate_particles


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class DirectedState:
    """Particle state + directed incidence tables.

    Every ``[N, D]`` table is slot-major; dead slots point at the owner
    itself with ``slot_alive=False`` and zeroed params.  ``slot_sign`` is
    +1 where the owner is the edge's ``a`` endpoint (canonical a→b diff =
    sign·(pos[partner] − pos[owner]))."""

    pos: jax.Array        # [N, 2] f32
    vel: jax.Array        # [N, 2] f32
    acc: jax.Array        # [N, 2] f32
    alive: jax.Array      # [N] bool
    pinned: jax.Array     # [N] bool
    partner: jax.Array    # [N, D] int32
    slot_sign: jax.Array  # [N, D] int8 (+1: owner is a; −1: owner is b)
    slot_alive: jax.Array # [N, D] bool
    spring: jax.Array     # [N, D] f32
    damp: jax.Array       # [N, D] f32
    yield_strain: jax.Array  # [N, D] f32
    strain_limit: jax.Array  # [N, D] f32
    length: jax.Array     # [N, D] f32 (rest length)
    target: jax.Array     # [N, D] f32 (mutable twin)
    last: jax.Array       # [N, D] f32 (mutable twin)
    strain: jax.Array     # [N, D] f32 (observability twin)
    stress: jax.Array     # [N, D] f32

    @property
    def n(self) -> int:
        return self.pos.shape[0]

    @property
    def degree(self) -> int:
        return self.partner.shape[1]


def build_directed(state: SimState, *, min_degree: int = 4,
                   pad_multiple: int = 4):
    """SimState → (DirectedState, slot_edge [N, D] int32) — the latter
    maps slots back to flat beam ids for extraction (−1 on dead slots).
    Host-side (NumPy)."""
    n = state.max_particles
    a = np.asarray(state.beam_a, np.int64)
    b = np.asarray(state.beam_b, np.int64)
    m = a.shape[0]
    owners = np.concatenate([a, b])
    partners = np.concatenate([b, a])
    signs = np.concatenate([np.full(m, 1, np.int8),
                            np.full(m, -1, np.int8)])
    edge_ids = np.concatenate([np.arange(m), np.arange(m)])

    order = np.argsort(owners, kind="stable")
    owners, partners = owners[order], partners[order]
    signs, edge_ids = signs[order], edge_ids[order]

    counts = np.bincount(owners, minlength=n)
    max_deg = int(counts.max()) if counts.size else 0
    d = max(min_degree, -(-max(max_deg, 1) // pad_multiple) * pad_multiple)

    partner = np.tile(np.arange(n, dtype=np.int32)[:, None], (1, d))
    slot_sign = np.zeros((n, d), np.int8)
    slot_edge = np.full((n, d), -1, np.int32)
    starts = np.concatenate([[0], np.cumsum(counts)])
    rank = np.arange(owners.shape[0]) - starts[owners]
    partner[owners, rank] = partners
    slot_sign[owners, rank] = signs
    slot_edge[owners, rank] = edge_ids

    def per_slot(flat, fill=0.0):
        out = np.full((n, d), fill, np.float32)
        out[owners, rank] = np.asarray(flat, np.float32)[edge_ids]
        return jnp.asarray(out)

    slot_alive = np.zeros((n, d), bool)
    slot_alive[owners, rank] = np.asarray(state.beam_alive)[edge_ids]

    ds = DirectedState(
        pos=state.pos, vel=state.vel, acc=state.acc,
        alive=state.particle_alive, pinned=state.particle_pinned,
        partner=jnp.asarray(partner),
        slot_sign=jnp.asarray(slot_sign),
        slot_alive=jnp.asarray(slot_alive),
        spring=per_slot(state.beam_spring),
        damp=per_slot(state.beam_damp),
        yield_strain=per_slot(state.beam_yield_strain, fill=np.inf),
        strain_limit=per_slot(state.beam_strain_limit, fill=np.inf),
        length=per_slot(state.beam_length, fill=1.0),
        target=per_slot(state.beam_target_length, fill=1.0),
        last=per_slot(state.beam_last_length, fill=1.0),
        strain=per_slot(state.beam_strain),
        stress=per_slot(state.beam_stress),
    )
    return ds, slot_edge


def directed_to_sim(ds: DirectedState, template: SimState,
                    slot_edge: np.ndarray) -> SimState:
    """Extraction: fold twin state back onto the flat beam list (either
    twin works — they are identical by construction; we take the a-side
    owner's)."""
    m = template.beam_a.shape[0]
    se = np.asarray(slot_edge)
    sign = np.asarray(ds.slot_sign)
    owner_a = (se >= 0) & (sign > 0)
    rows, cols = np.nonzero(owner_a)
    eids = se[rows, cols]

    def fold(table, base):
        out = np.asarray(base).copy()
        out[eids] = np.asarray(table)[rows, cols]
        return jnp.asarray(out)

    return dataclasses.replace(
        template,
        pos=ds.pos, vel=ds.vel, acc=ds.acc,
        particle_alive=ds.alive, particle_pinned=ds.pinned,
        beam_target_length=fold(ds.target, template.beam_target_length),
        beam_last_length=fold(ds.last, template.beam_last_length),
        beam_strain=fold(ds.strain, template.beam_strain),
        beam_stress=fold(ds.stress, template.beam_stress),
        beam_alive=fold(ds.slot_alive, template.beam_alive),
    )


def _trunc_i32(x: jax.Array) -> jax.Array:
    return jnp.trunc(x).astype(jnp.int32)


def directed_beam_pass(ds: DirectedState, cfg: StaticConfig):
    """Per-slot spring evaluation (compute.wgsl:96-131 semantics) +
    dense row-sum accumulate.  Returns (per-particle force [N, 2],
    table updates dict)."""
    p_part = ds.pos[ds.partner]                     # THE gather [N,D,2]
    alive_part = ds.alive[ds.partner]               # bundled row gather
    sgn = ds.slot_sign.astype(jnp.float32)[..., None]
    # canonical a→b difference (reference orientation), per twin
    diff = (p_part - ds.pos[:, None, :]) * sgn
    raw_len = jnp.sqrt(jnp.sum(diff * diff, axis=-1))
    zero = raw_len == 0.0
    diff = jnp.where(
        zero[..., None], jnp.array([0.0, -1.0e-10], jnp.float32), diff
    )
    length_now = jnp.where(zero, jnp.float32(1.0e-10), raw_len)

    active = ds.slot_alive & ds.alive[:, None] & alive_part
    fmag = (
        (ds.target - length_now) * ds.spring
        + (ds.last - length_now) * ds.damp
    )
    # force ON the b endpoint is +fmag·d̂ (ops/forces.py); the owner
    # receives ∓ according to which endpoint it is.  Same canonical f32
    # order as every other path — (fmag·dd)·(1/ln), then exact ±1 sign —
    # so quantized totals stay bit-identical to the flat path.
    inv_len = 1.0 / length_now[..., None]
    f_owner = (-sgn) * ((fmag[..., None] * diff) * inv_len)
    f_owner = jnp.where(active[..., None], f_owner, 0.0)

    strain = (length_now - ds.target) / ds.length
    yielded = jnp.abs(strain) > ds.yield_strain
    new_target = jnp.where(
        yielded,
        length_now - ds.yield_strain * ds.length * jnp.sign(strain),
        ds.target,
    )
    breaks = jnp.abs(length_now - ds.length) > ds.length * ds.strain_limit

    upd = {
        "target": jnp.where(active, new_target, ds.target),
        "last": jnp.where(active, length_now, ds.last),
        "strain": jnp.where(
            active, jnp.abs(strain) / ds.yield_strain, ds.strain
        ),
        "stress": jnp.where(
            active, fmag * jnp.float32(BEAM_STRESS_SCALE), ds.stress
        ),
        "slot_alive": ds.slot_alive & ~(active & breaks),
    }

    if cfg.force_mode == "quantized":
        q = _trunc_i32(f_owner * jnp.float32(PARTICLE_FORCE_SCALE))
        total = jnp.sum(q, axis=1, dtype=jnp.int32)
        force = total.astype(jnp.float32) / jnp.float32(
            PARTICLE_FORCE_SCALE
        )
    else:
        force = jnp.sum(f_owner, axis=1)
    return force, upd


def directed_substep(
    ds: DirectedState,
    consts: PhysicsConstants,
    uin: UserInput,
    cfg: StaticConfig,
) -> DirectedState:
    """One substep: directed beam pass + shared collision/integration."""
    beam_force, upd = directed_beam_pass(ds, cfg)
    coll_dv, coll_da, coll_dy = collision_terms(
        ds.pos, ds.vel, ds.alive, consts, cfg
    )
    pos, vel, acc = integrate_particles(
        ds.pos, ds.vel, ds.acc, ds.alive, ds.pinned,
        coll_dv, coll_da, coll_dy, beam_force, consts, uin, cfg,
    )
    return dataclasses.replace(ds, pos=pos, vel=vel, acc=acc, **upd)


@functools.partial(jax.jit, static_argnames=("cfg", "n_sub"),
                   donate_argnames=("ds",))
def directed_frame(ds: DirectedState, consts: PhysicsConstants,
                   uin: UserInput, cfg: StaticConfig,
                   n_sub: Optional[int] = None) -> DirectedState:
    """One frame = subticks substeps under lax.scan (≙ the 64 dispatches
    per command encoder, engineWorker.ts:655-661)."""
    def body(s, _):
        return directed_substep(s, consts, uin, cfg), None

    n = cfg.subticks if n_sub is None else n_sub
    out, _ = jax.lax.scan(body, ds, None, length=n)
    return out


directed_frame_jit = directed_frame
