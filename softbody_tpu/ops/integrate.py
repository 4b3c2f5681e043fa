"""Body forces, semi-implicit Euler integration and border collision —
the tail of the particle half of ``compute_update``
(/root/reference/src/shaders/compute.wgsl:171-199).

Exact reference semantics preserved:

- gravity (172), componentwise power-law drag
  ``a −= c·pow(|v|, exp) ∘ v̂`` using the *post-collision* velocity
  (174-176), keyboard force (178), mouse grab cancelling gravity within
  ``10·r`` of the cursor (179-181);
- beam forces added via the fixed-point exchange (183-185);
- semi-implicit Euler ``v += a·dt; p += v·dt; a = 0`` (186-188);
- border clamp with velocity reflection ``v ∗= −border_elasticity`` and a
  cross-axis friction term written into the *carried-over* acceleration
  (189-199).  Note the carried ``a`` from border friction is real state:
  it is read back at the next substep (``particle.a`` lives in the 24-byte
  particle struct, engineMapping.ts:103).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import PhysicsConstants, StaticConfig, UserInput


def integrate_particles(
    pos: jax.Array,
    vel: jax.Array,
    acc: jax.Array,
    alive: jax.Array,
    pinned: jax.Array,
    coll_dv: jax.Array,
    coll_da: jax.Array,
    coll_dy: jax.Array,
    beam_force: jax.Array,
    consts: PhysicsConstants,
    uin: UserInput,
    cfg: StaticConfig,
):
    """Returns updated ``(pos, vel, acc)`` for all particles (dead lanes
    pass through unchanged)."""
    dt = jnp.float32(cfg.dt)
    r = jnp.float32(cfg.particle_radius)
    bounds = jnp.float32(cfg.bounds_size)

    # Coincident-particle nudge mutates p.y before any later use of p
    # (compute.wgsl:153; mouse distance at :179 sees the shifted p).
    p = pos.at[:, 1].add(jnp.where(alive, coll_dy, 0.0))
    v = vel + coll_dv
    a = acc + coll_da

    # Gravity (compute.wgsl:172).
    a = a + consts.gravity[None, :]

    # Drag (174-176): componentwise |v|^exp times normalized v.
    speed = jnp.sqrt(jnp.sum(v * v, axis=-1))
    moving = speed > 0.0
    # canonical f32 order shared with the stencil/fused kernels:
    # ((c·|v|^exp)·v)·(1/speed) — reciprocal-multiply, keeping every
    # engine path bit-identical under quantized forces (oracle.py pins it)
    inv_speed = 1.0 / jnp.where(moving, speed, 1.0)
    drag = (
        consts.drag_coeff
        * jnp.abs(v) ** consts.drag_exp
        * v
        * inv_speed[:, None]
    )
    a = a - jnp.where(moving[:, None], drag, 0.0)

    # User keyboard force (178).
    a = a + (uin.applied_force * uin.user_strength)[None, :]

    # Mouse grab (179-181): spring toward mouse velocity, gravity cancelled.
    mouse_d = jnp.sqrt(jnp.sum((uin.mouse_pos[None, :] - p) ** 2, axis=-1))
    grabbed = uin.mouse_active & (mouse_d < r * 10.0)
    grab_acc = (uin.mouse_vel[None, :] - v) * uin.user_strength - consts.gravity[None, :]
    a = a + jnp.where(grabbed[:, None], grab_acc, 0.0)

    # Beam forces (183-185) — already fixed-point rounded by the caller.
    a = a + beam_force

    # Semi-implicit Euler (186-188).
    v = v + a * dt
    p = p + v * dt
    a = jnp.zeros_like(a)

    # Border collision (189-199) — sequential x-then-y, exactly as WGSL.
    lo, hi = r, bounds - r
    clamped = jnp.clip(p, lo, hi)
    hit_x = p[:, 0] != clamped[:, 0]
    hit_y = p[:, 1] != clamped[:, 1]
    be = consts.border_elasticity
    bf = consts.border_friction

    # x-clamp branch (191-194): friction on a.y, reflect v.x.
    fric_y = jnp.sign(v[:, 1]) * bf * jnp.abs(v[:, 0]) * (1.0 + be)
    ay = jnp.where(hit_x, a[:, 1] - jnp.minimum(a[:, 1], fric_y), a[:, 1])
    vx = jnp.where(hit_x, v[:, 0] * -be, v[:, 0])

    # y-clamp branch (195-198): uses the possibly-flipped v.x.
    fric_x = jnp.sign(vx) * bf * jnp.abs(v[:, 1]) * (1.0 + be)
    ax = jnp.where(hit_y, a[:, 0] - jnp.minimum(a[:, 0], fric_x), a[:, 0])
    vy = jnp.where(hit_y, v[:, 1] * -be, v[:, 1])

    p = clamped
    v = jnp.stack([vx, vy], axis=-1)
    a = jnp.stack([ax, ay], axis=-1)

    # Dead lanes pass through; pinned particles exert forces but never move.
    keep = (alive & ~pinned)[:, None]
    return (
        jnp.where(keep, p, pos),
        jnp.where(keep, v, vel),
        jnp.where(keep, a, acc),
    )
