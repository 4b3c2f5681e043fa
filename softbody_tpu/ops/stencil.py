"""Dense lattice (stencil) physics path — the TPU-native fast engine for
structured scenes.

Motivation (measured on v5e): XLA's TPU gather sustains only ~50M rows/s
and a 1M-element sort costs ~180 ms, so the general cell-list collision
path and index-gather beam pass are irregular-memory-bound three orders
of magnitude away from the 500 substeps/s @ 1M target.  But the headline
scenes are *lattices* (``addRectangle`` grids, main.ts:203-213; BASELINE
cloth/tearing configs): their beams connect constant index offsets.  On a
``[W, H]`` layout every physics term becomes a dense shift stencil:

- **springs**: 4 edge classes — vertical (0,1), horizontal (1,0),
  diagonal (1,1), anti-diagonal (1,-1) — exactly the reference lattice
  generator's beam set.  Force exchange is two masked rolls per class.
  With ``force_mode="quantized"`` the int32 accumulation is bit-identical
  to the general path (integer adds commute).
- **collisions**: particles that can touch a lattice node are (in
  non-folded configurations) its index-space neighbors; a stencil of
  offsets within Chebyshev radius ``collision_stencil`` applies the exact
  reference pair math (compute.wgsl:150-168) densely.  (Fold contacts
  between index-distant regions need the general grid path; see
  ``StaticConfig.collision_mode="grid"``.)
- **integration**: the flattened arrays reuse ``integrate_particles``
  verbatim — bit-identical border/drag/user-force semantics.

Everything is rolls, multiplies and masked adds: no gather, no scatter,
no sort — pure VPU streaming at HBM bandwidth.
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
from .integrate import integrate_particles


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class EdgeClass:
    """Per-edge-class state [W, H], stored at the lower-index endpoint
    (the edge at (x,y) connects to (x+dx, y+dy)).  Field meanings match
    the 40-byte beam record (engineMapping.ts:151)."""

    length: jax.Array
    target_length: jax.Array
    last_length: jax.Array
    spring: jax.Array
    damp: jax.Array
    yield_strain: jax.Array
    strain_limit: jax.Array
    strain: jax.Array
    stress: jax.Array
    alive: jax.Array


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class LatticeState:
    """Dense lattice world: particle grids [W, H(, 2)] + edge classes."""

    pos: jax.Array
    vel: jax.Array
    acc: jax.Array
    alive: jax.Array
    pinned: jax.Array
    edges: Tuple[EdgeClass, ...]

    @property
    def shape(self) -> Tuple[int, int]:
        return self.pos.shape[0], self.pos.shape[1]


# Edge-class offsets matching addRectangle (main.ts:208-211).
EDGE_OFFSETS: Tuple[Tuple[int, int], ...] = ((0, 1), (1, 0), (1, 1), (1, -1))


@dataclasses.dataclass(frozen=True)
class LatticeSpec:
    """Static lattice configuration (hashable jit argument).

    ``edge_offsets`` defaults to the reference lattice generator's four
    classes (main.ts:203-213); the planified general-topology path
    (ops/planify.py) passes the offset classes its embedder found."""

    width: int
    height: int
    # index-space Chebyshev radius of the dense collision stencil
    collision_stencil: int = 2
    edge_offsets: Tuple[Tuple[int, int], ...] = EDGE_OFFSETS

    @property
    def collision_offsets(self) -> Tuple[Tuple[int, int], ...]:
        s = self.collision_stencil
        return tuple(
            (dx, dy)
            for dx in range(-s, s + 1)
            for dy in range(-s, s + 1)
            if (dx, dy) != (0, 0)
        )

    @property
    def collision_half_offsets(self) -> Tuple[Tuple[int, int], ...]:
        """Half-plane offsets: each unordered pair once (the reference
        pair terms are exactly antisymmetric, so the mirrored offset's
        contribution is the negation — see _stencil_collisions)."""
        s = self.collision_stencil
        return tuple(
            (dx, dy)
            for dx in range(0, s + 1)
            for dy in range(-s, s + 1)
            if (dx, dy) != (0, 0) and (dx > 0 or dy > 0)
        )


def lattice_substep(
    state: LatticeState,
    consts: PhysicsConstants,
    uin: UserInput,
    spec: LatticeSpec,
    cfg: StaticConfig,
    lin_x_offset=0,
    update_observability: bool = True,
    far=None,
    ffspec=None,
    extra_force=None,
    far_delta=None,
) -> LatticeState:
    """One substep of the dense path (semantics of compute.wgsl:90-203).

    ``lin_x_offset``: global x-index of local column 0 — makes the
    coincident-nudge tiebreak (``sign(lin_i − lin_j)``) globally
    consistent under spatial sharding.

    ``update_observability``: the per-edge ``strain``/``stress`` channels
    exist purely for visualization (compute.wgsl:122-124 writes them every
    substep but only the frame's last values are ever rendered) — the
    frame loop skips these writes for all but the final substep.

    ``extra_force``: optional pre-accumulated ``(fx, fy)`` force planes
    (int32 at PARTICLE_FORCE_SCALE when quantized, else f32) merged into
    the beam accumulator BEFORE the fixed-point conversion — the
    planified path's exception-beam contributions, so the total stays
    a single commutative int sum (bit-identical to the reference's
    atomic accumulation, compute.wgsl:68-70).

    TPU shaping: all vector quantities are component-split to [W, H]
    planes internally (full lane utilization), neighbor access is
    zero-padded border + static slice."""
    w, h = spec.width, spec.height
    # spring stencil reach = the largest offset component in play
    pad = max(
        [1] + [max(abs(dx), abs(dy)) for dx, dy in spec.edge_offsets]
    )

    def padded(arr, fill=0.0):
        return jnp.pad(arr, pad, constant_values=fill)

    px = padded(state.pos[..., 0])
    py = padded(state.pos[..., 1])
    alive = state.alive
    alv = padded(alive, False)

    def sl(arr, dx, dy):
        return arr[pad + dx : pad + dx + w, pad + dy : pad + dy + h]

    c_px, c_py = sl(px, 0, 0), sl(py, 0, 0)

    quant = cfg.force_mode == "quantized"
    zdt = jnp.int32 if quant else jnp.float32
    fx_acc = jnp.zeros((w, h), zdt)
    fy_acc = jnp.zeros((w, h), zdt)

    def back(arr, dx, dy):
        # out[x+dx, y+dy] += arr[x, y]
        return jnp.pad(arr, pad)[pad - dx : pad - dx + w, pad - dy : pad - dy + h]

    if extra_force is not None:
        fx_acc = fx_acc + extra_force[0]
        fy_acc = fy_acc + extra_force[1]

    new_edges = []
    for (dx, dy), e in zip(spec.edge_offsets, state.edges):
        active = e.alive & sl(alv, 0, 0) & sl(alv, dx, dy)
        # (e.alive already excludes statically-invalid border edges)

        ddx = sl(px, dx, dy) - c_px
        ddy = sl(py, dx, dy) - c_py
        raw_len = jnp.sqrt(ddx * ddx + ddy * ddy)
        zero = raw_len == 0.0
        # zero-length guard (compute.wgsl:104-107): diff → (0, -1e-10)
        ddx = jnp.where(zero, 0.0, ddx)
        ddy = jnp.where(zero, jnp.float32(-1.0e-10), ddy)
        length_now = jnp.where(zero, jnp.float32(1.0e-10), raw_len)

        force_mag = (
            (e.target_length - length_now) * e.spring
            + (e.last_length - length_now) * e.damp
        )
        inv_len = 1.0 / length_now
        fvx = force_mag * ddx * inv_len
        fvy = force_mag * ddy * inv_len
        strain = (length_now - e.target_length) / e.length
        yielded = jnp.abs(strain) > e.yield_strain
        new_target = jnp.where(
            yielded,
            length_now - e.yield_strain * e.length * jnp.sign(strain),
            e.target_length,
        )
        breaks = jnp.abs(length_now - e.length) > e.length * e.strain_limit

        new_edges.append(
            EdgeClass(
                length=e.length,
                target_length=jnp.where(active, new_target, e.target_length),
                last_length=jnp.where(active, length_now, e.last_length),
                spring=e.spring,
                damp=e.damp,
                yield_strain=e.yield_strain,
                strain_limit=e.strain_limit,
                strain=(
                    jnp.where(active, jnp.abs(strain) / e.yield_strain, e.strain)
                    if update_observability else e.strain
                ),
                stress=(
                    jnp.where(
                        active,
                        force_mag * jnp.float32(BEAM_STRESS_SCALE),
                        e.stress,
                    )
                    if update_observability else e.stress
                ),
                alive=e.alive & ~(active & breaks),
            )
        )

        fvx = jnp.where(active, fvx, 0.0)
        fvy = jnp.where(active, fvy, 0.0)
        if quant:
            qx = jnp.trunc(fvx * jnp.float32(PARTICLE_FORCE_SCALE)).astype(jnp.int32)
            qy = jnp.trunc(fvy * jnp.float32(PARTICLE_FORCE_SCALE)).astype(jnp.int32)
            fx_acc = fx_acc - qx + back(qx, dx, dy)
            fy_acc = fy_acc - qy + back(qy, dx, dy)
        else:
            fx_acc = fx_acc - fvx + back(fvx, dx, dy)
            fy_acc = fy_acc - fvy + back(fvy, dx, dy)

    if quant:
        bfx = fx_acc.astype(jnp.float32) / jnp.float32(PARTICLE_FORCE_SCALE)
        bfy = fy_acc.astype(jnp.float32) / jnp.float32(PARTICLE_FORCE_SCALE)
    else:
        bfx, bfy = fx_acc, fy_acc

    # ---- dense collision stencil (exact pair math, compute.wgsl:150-168) ----
    if cfg.collision_mode == "none" or spec.collision_stencil == 0:
        dvx = dvy = dax = day = dyn = jnp.zeros((w, h), jnp.float32)
    elif cfg.use_pallas:
        from .pallas.collide_stencil import stencil_collisions_pallas

        dvx, dvy, dax, day, dyn = stencil_collisions_pallas(
            state.pos[..., 0], state.pos[..., 1],
            state.vel[..., 0], state.vel[..., 1],
            state.alive,
            jnp.float32(cfg.particle_radius),
            jnp.float32(cfg.dt),
            (consts.elasticity + 1.0) * 0.5,
            consts.friction,
            w=w, h=h, stencil=spec.collision_stencil,
            interpret=jax.default_backend() != "tpu",
        )
    else:
        dvx, dvy, dax, day, dyn = _stencil_collisions(
            state, consts, spec, cfg, lin_x_offset
        )

    # ---- far-field contacts (index-distant pairs) ----
    # ``far_delta``: precomputed ``[5, w, h]`` delta planes (dvx dvy dax
    # day dyn) from the v4 bucketed apply (ops/farfield4.py) — same pair
    # math as far_collision_terms, but the caller amortizes/buckets it.
    if far_delta is not None and cfg.collision_mode != "none":
        dvx = dvx + far_delta[0]
        dvy = dvy + far_delta[1]
        dax = dax + far_delta[2]
        day = day + far_delta[3]
        dyn = dyn + far_delta[4]
    if far is not None and cfg.collision_mode != "none":
        from .farfield import far_collision_terms

        fdvx, fdvy, fdax, fday, fdyn = far_collision_terms(
            state.pos[..., 0], state.pos[..., 1],
            state.vel[..., 0], state.vel[..., 1],
            state.alive, far,
            s=spec.collision_stencil, ff=ffspec,
            radius=cfg.particle_radius, dt=cfg.dt,
            ecoeff=(consts.elasticity + 1.0) * 0.5,
            friction=consts.friction,
            world_h=spec.height,
        )
        dvx = dvx + fdvx
        dvy = dvy + fdvy
        dax = dax + fdax
        day = day + fday
        dyn = dyn + fdyn

    # ---- integration (component twin of ops/integrate.py) ----
    pxn, pyn, vxn, vyn, axn, ayn = _integrate_components(
        state.pos[..., 0], state.pos[..., 1],
        state.vel[..., 0], state.vel[..., 1],
        state.acc[..., 0], state.acc[..., 1],
        alive, state.pinned,
        dvx, dvy, dax, day, dyn, bfx, bfy,
        consts, uin, cfg,
    )
    return dataclasses.replace(
        state,
        pos=jnp.stack([pxn, pyn], axis=-1),
        vel=jnp.stack([vxn, vyn], axis=-1),
        acc=jnp.stack([axn, ayn], axis=-1),
        edges=tuple(new_edges),
    )


def _integrate_components(
    px, py, vx, vy, ax, ay, alive, pinned,
    dvx, dvy, dax, day, dyn, bfx, bfy, consts, uin, cfg,
):
    """Component-split twin of :func:`..ops.integrate.integrate_particles`
    (same formulas, compute.wgsl:171-199)."""
    dt = jnp.float32(cfg.dt)
    r = jnp.float32(cfg.particle_radius)
    bounds = jnp.float32(cfg.bounds_size)

    p_x = px
    p_y = py + jnp.where(alive, dyn, 0.0)
    v_x = vx + dvx
    v_y = vy + dvy
    a_x = ax + dax + consts.gravity[0]
    a_y = ay + day + consts.gravity[1]

    speed = jnp.sqrt(v_x * v_x + v_y * v_y)
    moving = speed > 0.0
    inv_speed = 1.0 / jnp.where(moving, speed, 1.0)
    a_x = a_x - jnp.where(
        moving, consts.drag_coeff * jnp.abs(v_x) ** consts.drag_exp * v_x * inv_speed, 0.0
    )
    a_y = a_y - jnp.where(
        moving, consts.drag_coeff * jnp.abs(v_y) ** consts.drag_exp * v_y * inv_speed, 0.0
    )

    a_x = a_x + uin.applied_force[0] * uin.user_strength
    a_y = a_y + uin.applied_force[1] * uin.user_strength

    mdx = uin.mouse_pos[0] - p_x
    mdy = uin.mouse_pos[1] - p_y
    grabbed = uin.mouse_active & (jnp.sqrt(mdx * mdx + mdy * mdy) < r * 10.0)
    a_x = a_x + jnp.where(
        grabbed, (uin.mouse_vel[0] - v_x) * uin.user_strength - consts.gravity[0], 0.0
    )
    a_y = a_y + jnp.where(
        grabbed, (uin.mouse_vel[1] - v_y) * uin.user_strength - consts.gravity[1], 0.0
    )

    a_x = a_x + bfx
    a_y = a_y + bfy

    v_x = v_x + a_x * dt
    v_y = v_y + a_y * dt
    p_x = p_x + v_x * dt
    p_y = p_y + v_y * dt

    lo, hi = r, bounds - r
    cx_ = jnp.clip(p_x, lo, hi)
    cy_ = jnp.clip(p_y, lo, hi)
    hit_x = p_x != cx_
    hit_y = p_y != cy_
    be = consts.border_elasticity
    bf = consts.border_friction

    fric_y = jnp.sign(v_y) * bf * jnp.abs(v_x) * (1.0 + be)
    na_y = jnp.where(hit_x, 0.0 - jnp.minimum(0.0, fric_y), 0.0)
    nv_x = jnp.where(hit_x, v_x * -be, v_x)
    fric_x = jnp.sign(nv_x) * bf * jnp.abs(v_y) * (1.0 + be)
    na_x = jnp.where(hit_y, 0.0 - jnp.minimum(0.0, fric_x), 0.0)
    nv_y = jnp.where(hit_y, v_y * -be, v_y)

    keep = alive & ~pinned
    return (
        jnp.where(keep, cx_, px),
        jnp.where(keep, cy_, py),
        jnp.where(keep, nv_x, vx),
        jnp.where(keep, nv_y, vy),
        jnp.where(keep, na_x, ax),
        jnp.where(keep, na_y, ay),
    )


def _stencil_collisions(state, consts, spec, cfg, lin_x_offset=0):
    """Reference pair math over index-space neighbor offsets (dense).

    TPU shaping: component-split [W, H] planes (a trailing length-2 axis
    wastes vector lanes), zero-padded borders + static slices instead of
    rolls, and half-plane offsets — the pair terms are exactly
    antisymmetric (swap i↔j flips ``normal``/``rel_v`` and negates
    dv/da/dy), so each unordered pair is evaluated once and its
    contribution applied with ± to both endpoints."""
    w, h = spec.width, spec.height
    s = spec.collision_stencil
    r = jnp.float32(cfg.particle_radius)
    dt = jnp.float32(cfg.dt)
    ecoeff = (consts.elasticity + 1.0) * 0.5

    def padp(arr, fill=0.0):
        return jnp.pad(arr, s, constant_values=fill)

    px = padp(state.pos[..., 0])
    py = padp(state.pos[..., 1])
    vx = padp(state.vel[..., 0])
    vy = padp(state.vel[..., 1])
    alv = padp(state.alive, False)
    # linear index x*H + y (the coincident-nudge tiebreak, compute.wgsl:153)
    lin = (
        (jnp.arange(w, dtype=jnp.float32)[:, None] + lin_x_offset) * h
        + jnp.arange(h, dtype=jnp.float32)[None, :]
    )
    linp = padp(lin)

    def sl(arr, dx, dy):
        return arr[s + dx : s + dx + w, s + dy : s + dy + h]

    c_px, c_py = sl(px, 0, 0), sl(py, 0, 0)
    c_vx, c_vy = sl(vx, 0, 0), sl(vy, 0, 0)
    c_al = sl(alv, 0, 0)
    c_lin = sl(linp, 0, 0)

    dvx = jnp.zeros((w, h), jnp.float32)
    dvy = jnp.zeros((w, h), jnp.float32)
    dax = jnp.zeros((w, h), jnp.float32)
    day = jnp.zeros((w, h), jnp.float32)
    dyn = jnp.zeros((w, h), jnp.float32)

    def back(arr, dx, dy):
        # place an edge contribution at the partner endpoint:
        # out[x+dx, y+dy] += arr[x, y]
        return jnp.pad(arr, s)[s - dx : s - dx + w, s - dy : s - dy + h]

    for dx, dy in spec.collision_half_offsets:
        o_px, o_py = sl(px, dx, dy), sl(py, dx, dy)
        o_vx, o_vy = sl(vx, dx, dy), sl(vy, dx, dy)
        o_al = sl(alv, dx, dy)
        o_lin = sl(linp, dx, dy)
        valid = c_al & o_al

        ddx = o_px - c_px
        ddy = o_py - c_py
        dist2 = ddx * ddx + ddy * ddy
        dist = jnp.sqrt(dist2)
        coincident = valid & (dist == 0.0)
        overlap = valid & (dist > 0.0) & (dist < 2.0 * r)

        co = jnp.where(coincident, jnp.sign(c_lin - o_lin), 0.0)
        dyn = dyn + co - back(co, dx, dy)

        inv = jnp.where(overlap, 1.0 / jnp.where(overlap, dist, 1.0), 0.0)
        nx_, ny_ = ddx * inv, ddy * inv  # normal (zeroed when not overlapping)
        # tangent = (-ny, nx)
        rvx = c_vx - o_vx
        rvy = c_vy - o_vy
        imp_n = ecoeff * (rvx * nx_ + rvy * ny_)
        max_fric = imp_n * consts.friction
        imp_t = jnp.minimum(
            jnp.maximum(rvx * -ny_ + rvy * nx_, -max_fric), max_fric
        )
        pdvx = -(imp_n * nx_ + imp_t * -ny_)
        pdvy = -(imp_n * ny_ + imp_t * nx_)
        clip = (2.0 * r - dist) * 0.5 / (dt * dt)
        pdax = -nx_ * clip * jnp.where(overlap, 1.0, 0.0)
        pday = -ny_ * clip * jnp.where(overlap, 1.0, 0.0)
        pdvx = jnp.where(overlap, pdvx, 0.0)
        pdvy = jnp.where(overlap, pdvy, 0.0)

        dvx = dvx + pdvx - back(pdvx, dx, dy)
        dvy = dvy + pdvy - back(pdvy, dx, dy)
        dax = dax + pdax - back(pdax, dx, dy)
        day = day + pday - back(pday, dx, dy)

    return dvx, dvy, dax, day, dyn


def lattice_frame(
    state: LatticeState,
    consts: PhysicsConstants,
    uin: UserInput,
    spec: LatticeSpec,
    cfg: StaticConfig,
    n_sub: Optional[int] = None,
) -> LatticeState:
    # NOTE: an obs-skip variant (scan(subticks-1) without strain/stress
    # writes + one observing substep) measured SLOWER under donation —
    # the out-of-scan tail breaks XLA's buffer aliasing. Keep the single
    # scan; update_observability stays available for callers that build
    # their own loops.
    def body(carry, _):
        return lattice_substep(carry, consts, uin, spec, cfg), None

    n = cfg.subticks if n_sub is None else n_sub
    out, _ = jax.lax.scan(body, state, None, length=n)
    return out


lattice_frame_jit = jax.jit(
    lattice_frame,
    static_argnames=("spec", "cfg", "n_sub"),
    donate_argnames=("state",),
)


def lattice_frame_far(
    state: LatticeState,
    far,
    consts: PhysicsConstants,
    uin: UserInput,
    spec: LatticeSpec,
    cfg: StaticConfig,
    ffspec,
    n_sub: Optional[int] = None,
) -> LatticeState:
    """One frame with far-field contacts: the candidate list is fixed for
    the whole frame (Verlet-list validity is the caller's contract — see
    ops/farfield.py and LatticeBackend's rebuild trigger; the backend may
    run a frame as several shorter chunks via ``n_sub``)."""

    def body(carry, _):
        return (
            lattice_substep(carry, consts, uin, spec, cfg,
                            far=far, ffspec=ffspec),
            None,
        )

    n = cfg.subticks if n_sub is None else n_sub
    out, _ = jax.lax.scan(body, state, None, length=n)
    return out


lattice_frame_far_jit = jax.jit(
    lattice_frame_far,
    static_argnames=("spec", "cfg", "ffspec", "n_sub"),
    donate_argnames=("state",),
)

lattice_substep_jit = jax.jit(
    lattice_substep, static_argnames=("spec", "cfg", "ffspec")
)
