"""Dense-lattice scene builders + conversion to/from the general
SimState (for snapshots, viz, and parity tests).

The [W, H] layout flattens to linear index ``x*H + y`` — exactly the
particle ordering the reference's ``addRectangle`` produces
(main.ts:203-213), so converted scenes are index-compatible with the
general path."""

from __future__ import annotations

import math
from typing import Optional, Tuple

import numpy as np

import jax.numpy as jnp

from ..config import StaticConfig
from ..ops.stencil import EDGE_OFFSETS, EdgeClass, LatticeSpec, LatticeState
from ..state import SimState, state_from_numpy


def make_lattice(
    w: int,
    h: int,
    spacing: float,
    *,
    ox: float = 10.0,
    oy: float = 10.0,
    spring: float = 120.0,
    damp: float = 10.0,
    yield_strain: float = 0.2,
    strain_limit: float = 0.25,
    diagonals: bool = True,
    pinned_mask: Optional[np.ndarray] = None,
) -> LatticeState:
    xs = np.arange(w, dtype=np.float32) * spacing + ox
    ys = np.arange(h, dtype=np.float32) * spacing + oy
    pos = np.stack(np.meshgrid(xs, ys, indexing="ij"), axis=-1)
    f32 = np.float32

    def edge(dx: int, dy: int, active: bool) -> EdgeClass:
        rest = f32(spacing * math.hypot(dx, dy))
        length = np.full((w, h), rest, f32)
        x = np.arange(w)[:, None]
        y = np.arange(h)[None, :]
        valid = (
            (x + dx >= 0) & (x + dx < w) & (y + dy >= 0) & (y + dy < h)
        ) & active
        return EdgeClass(
            length=jnp.asarray(length),
            target_length=jnp.asarray(length),
            last_length=jnp.asarray(length),
            spring=jnp.full((w, h), spring, f32),
            damp=jnp.full((w, h), damp, f32),
            yield_strain=jnp.full((w, h), yield_strain, f32),
            strain_limit=jnp.full((w, h), strain_limit, f32),
            strain=jnp.zeros((w, h), f32),
            stress=jnp.zeros((w, h), f32),
            alive=jnp.asarray(np.broadcast_to(valid, (w, h)).copy()),
        )

    edges = tuple(
        edge(dx, dy, diagonals or (dx, dy) in ((0, 1), (1, 0)))
        for dx, dy in EDGE_OFFSETS
    )
    pinned = (
        np.zeros((w, h), bool) if pinned_mask is None else np.asarray(pinned_mask)
    )
    return LatticeState(
        pos=jnp.asarray(pos),
        vel=jnp.zeros((w, h, 2), f32),
        acc=jnp.zeros((w, h, 2), f32),
        alive=jnp.ones((w, h), bool),
        pinned=jnp.asarray(pinned),
        edges=edges,
    )


def tearing_cloth_lattice(
    n_particles: int = 1_000_000,
    spring: float = 200.0,
    damp: float = 10.0,
    strain_limit: float = 0.5,
    yield_strain: float = 0.3,
    collision_stencil: int = 2,
    pin_top: bool = False,
    fall_speed: float = 2.0,
    slits: int = 0,
) -> Tuple[LatticeState, LatticeSpec, StaticConfig, "PhysicsConstants"]:
    """BASELINE config 5 on the dense path: near-square lattice spanning
    the world, falling and tearing where it crumples on impact.

    ``pin_top=True`` hangs the sheet instead — with ~1000 rows the top
    tension exceeds any stable spring's strength, so it (correctly)
    disintegrates; the falling variant keeps tearing *ongoing* and is the
    benchmark default.

    ``slits > 0`` pre-perforates the sheet: that many vertical cuts,
    alternating from the bottom and top edges and spanning 85% of the
    height, so impact stress concentrates in the narrow bridges at the
    slit tips and tearing propagates from them under GENTLE dynamics —
    the un-slit sheet only tears once the whole-sheet crush reaches
    shock speeds (Δv ≈ r/dt from the penetration resolver), which is a
    far harsher contact regime than "cloth tearing".

    Returns ``(state, spec, cfg, consts)``: at this density the default
    world gravity (0.5/unit mass) statically crushes a 1000-row pile
    (bottom strain R·g/(k·spacing) ≈ 2.5 ≫ strain_limit), so the scene
    supplies gravity scaled with spacing — the same physics at a sane
    energy scale, keeping tearing partial instead of total."""
    side = int(math.sqrt(n_particles))
    w = h = side
    spacing = 980.0 / (side - 1)
    pinned = np.zeros((w, h), bool)
    if pin_top:
        pinned[:, h - 1] = True
    state = make_lattice(
        w, h, spacing, spring=spring, damp=damp,
        yield_strain=yield_strain, strain_limit=strain_limit,
        pinned_mask=pinned,
    )
    if slits > 0:
        import dataclasses
        import jax.numpy as jnp

        edges = list(state.edges)
        for si in range(slits):
            cx = (si + 1) * w // (slits + 1)  # cut between columns cx, cx+1
            from_bottom = si % 2 == 0
            lo, hi = (0, int(0.85 * h)) if from_bottom else (int(0.15 * h), h)
            for ci, (dx, dy) in enumerate(EDGE_OFFSETS):
                if dx == 0:
                    continue  # vertical edges don't cross a vertical cut
                e = edges[ci]
                al = np.asarray(e.alive).copy()
                al[cx, lo:hi] = False
                edges[ci] = dataclasses.replace(e, alive=jnp.asarray(al))
        state = dataclasses.replace(state, edges=tuple(edges))
    if not pin_top and fall_speed:
        import dataclasses
        import jax.numpy as jnp

        vel = np.zeros((w, h, 2), np.float32)
        vel[..., 1] = -fall_speed
        state = dataclasses.replace(state, vel=jnp.asarray(vel))
    spec = LatticeSpec(w, h, collision_stencil=collision_stencil)
    cfg = StaticConfig(
        subticks=64,
        collision_mode="allpairs",  # pair math enabled; stencil supplies pairs
        # contact radius 0.35x spacing: leaves ~30% compression headroom
        # before the stiff dt^-2 penetration term engages (0.45x left only
        # 10% and detonated the sheet on floor impact)
        particle_radius=spacing * 0.35,
    )
    from ..config import PhysicsConstants

    consts = PhysicsConstants.default()
    consts.gravity = jnp.asarray([0.0, -0.5 * spacing / 10.0], jnp.float32)
    return state, spec, cfg, consts


def cloth_lattice(
    w: int = 32,
    h: int = 32,
    spacing: float = 20.0,
    spring: float = 50.0,
    damp: float = 10.0,
    pin_top: bool = False,
    collision_stencil: int = 2,
) -> Tuple[LatticeState, LatticeSpec, StaticConfig]:
    ox = 500.0 - (w - 1) * spacing / 2
    oy = 980.0 - (h - 1) * spacing
    pinned = np.zeros((w, h), bool)
    if pin_top:
        pinned[:, h - 1] = True
    state = make_lattice(
        w, h, spacing, ox=ox, oy=oy, spring=spring, damp=damp,
        yield_strain=1.0, strain_limit=2.5, pinned_mask=pinned,
    )
    spec = LatticeSpec(w, h, collision_stencil=collision_stencil)
    cfg = StaticConfig(
        subticks=64, collision_mode="allpairs",
        particle_radius=min(10.0, spacing * 0.45),
    )
    return state, spec, cfg


def lattice_to_simstate(state: LatticeState, *, build_incidence: bool = True) -> SimState:
    """Flatten to the general SimState (linear index = x*H + y)."""
    w, h = state.shape
    n = w * h
    pos = np.asarray(state.pos).reshape(n, 2)
    vel = np.asarray(state.vel).reshape(n, 2)
    acc = np.asarray(state.acc).reshape(n, 2)
    pinned = np.asarray(state.pinned).reshape(n)
    alive = np.asarray(state.alive).reshape(n)

    beams = []
    props = {k: [] for k in ("length", "target", "last", "spring", "damp",
                             "yield", "limit", "strain", "stress", "alive")}
    x = np.arange(w)[:, None]
    y = np.arange(h)[None, :]
    lin = (x * h + y)
    for (dx, dy), e in zip(EDGE_OFFSETS, state.edges):
        valid = np.asarray(e.alive) & (
            (x + dx >= 0) & (x + dx < w) & (y + dy >= 0) & (y + dy < h)
        )
        idx = np.nonzero(valid.reshape(n))
        a = lin.reshape(n)[idx]
        b = a + dx * h + dy
        beams.append(np.stack([a, b], -1))
        sel = valid
        for key, arr in (
            ("length", e.length), ("target", e.target_length),
            ("last", e.last_length), ("spring", e.spring), ("damp", e.damp),
            ("yield", e.yield_strain), ("limit", e.strain_limit),
            ("strain", e.strain), ("stress", e.stress),
        ):
            props[key].append(np.asarray(arr)[sel])

    beams_np = (
        np.concatenate(beams).astype(np.int32)
        if beams else np.zeros((0, 2), np.int32)
    )

    def cat(k):
        return (
            np.concatenate(props[k]).astype(np.float32)
            if props[k] else np.zeros((0,), np.float32)
        )

    sim = state_from_numpy(
        pos, vel, acc=acc, pinned=pinned,
        beams=beams_np if len(beams_np) else None,
        beam_length=cat("length"),
        beam_spring=cat("spring"), beam_damp=cat("damp"),
        beam_yield_strain=cat("yield"), beam_strain_limit=cat("limit"),
        beam_target_length=cat("target"), beam_last_length=cat("last"),
        build_incidence=build_incidence,
    )
    if len(beams_np):
        m = sim.max_beams
        strain = np.zeros(m, np.float32)
        stress = np.zeros(m, np.float32)
        strain[: len(beams_np)] = cat("strain")
        stress[: len(beams_np)] = cat("stress")
        sim.beam_strain = jnp.asarray(strain)
        sim.beam_stress = jnp.asarray(stress)
    if not alive.all():
        sim.particle_alive = jnp.asarray(alive)
    return sim
