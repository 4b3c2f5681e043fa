"""Pure NumPy float32 oracle implementing the reference physics exactly
(/root/reference/src/shaders/compute.wgsl:90-203; spec in SURVEY.md §2.3).

This is the trajectory-matching ground truth for the JAX/TPU
implementation.  It is deliberately written formula-by-formula against the
WGSL source, in float32 throughout, with the same vectorized summation
order as the JAX ops (partner sums via np reductions).

State dict keys: pos/vel/acc [N,2] f32; alive [N] bool; beam arrays per
engineMapping.ts:151 plus alive mask.
"""

from __future__ import annotations

import numpy as np

F = np.float32
FORCE_SCALE = F(65536.0)
STRESS_SCALE = F(1.0 / 20.0)


def make_state(pos, vel=None, acc=None, beams=None, **beam_props):
    pos = np.asarray(pos, F)
    n = len(pos)
    beams = np.zeros((0, 2), np.int32) if beams is None else np.asarray(beams, np.int32)
    m = len(beams)
    if m:
        d = pos[beams[:, 0]] - pos[beams[:, 1]]
        length = np.sqrt((d * d).sum(-1)).astype(F)
    else:
        length = np.zeros(0, F)

    def get(name, default):
        v = beam_props.get(name)
        if v is None:
            return np.full(m, default, F)
        return np.broadcast_to(np.asarray(v, F), (m,)).astype(F).copy()

    return {
        "pos": pos.copy(),
        "vel": np.zeros_like(pos) if vel is None else np.asarray(vel, F).copy(),
        "acc": np.zeros_like(pos) if acc is None else np.asarray(acc, F).copy(),
        "alive": np.ones(n, bool),
        "beam_a": beams[:, 0].copy() if m else np.zeros(0, np.int32),
        "beam_b": beams[:, 1].copy() if m else np.zeros(0, np.int32),
        "length": beam_props.get("length", length).astype(F).copy(),
        "target": beam_props.get("target", length).astype(F).copy(),
        "last": beam_props.get("last", length).astype(F).copy(),
        "spring": get("spring", 1.0),
        "damp": get("damp", 0.0),
        "yield_strain": get("yield_strain", np.inf),
        "strain_limit": get("strain_limit", np.inf),
        "strain": np.zeros(m, F),
        "stress": np.zeros(m, F),
        "beam_alive": np.ones(m, bool),
    }


DEFAULT_CONSTS = {
    "gravity": np.array([0.0, -0.5], F),
    "border_elasticity": F(0.5),
    "border_friction": F(0.2),
    "elasticity": F(0.5),
    "friction": F(0.1),
    "drag_coeff": F(0.001),
    "drag_exp": F(2.0),
}

NO_INPUT = {
    "user_strength": F(1.0),
    "mouse_active": False,
    "mouse_pos": np.zeros(2, F),
    "mouse_vel": np.zeros(2, F),
    "applied_force": np.zeros(2, F),
}


def substep(
    s,
    consts=None,
    uin=None,
    *,
    dt,
    radius=10.0,
    bounds=1000.0,
    quantized=True,
    collisions=True,
):
    """One reference substep. Mutates nothing; returns a new state dict."""
    c = dict(DEFAULT_CONSTS, **(consts or {}))
    u = dict(NO_INPUT, **(uin or {}))
    dt, radius, bounds = F(dt), F(radius), F(bounds)
    s = {k: v.copy() if isinstance(v, np.ndarray) else v for k, v in s.items()}
    n = len(s["pos"])
    m = len(s["beam_a"])
    pos0, vel0, acc0 = s["pos"].copy(), s["vel"].copy(), s["acc"].copy()
    alive = s["alive"]

    # ---- Beam pass (compute.wgsl:94-131), reads pos0 ----
    forces_q = np.zeros((n, 2), np.int64)  # i32 accumulation (no wrap in tests)
    forces_f = np.zeros((n, 2), F)
    if m:
        a_idx, b_idx = s["beam_a"], s["beam_b"]
        b_active = s["beam_alive"] & alive[a_idx] & alive[b_idx]
        diff = (pos0[b_idx] - pos0[a_idx]).astype(F)
        raw = np.sqrt((diff * diff).sum(-1)).astype(F)
        zero = raw == 0
        diff[zero] = np.array([0.0, -1.0e-10], F)
        ln = np.where(zero, F(1.0e-10), raw).astype(F)
        fmag = ((s["target"] - ln) * s["spring"] + (s["last"] - ln) * s["damp"]).astype(F)
        # canonical f32 order across ALL engine paths: (fmag·dd)·(1/ln).
        # The reference's `force_mag * normalize(diff)` (compute.wgsl:111)
        # leaves the f32 association to the GPU driver; we pin the
        # reciprocal form because it is what the hot Pallas kernel and the
        # stencil path compute (one rcp + two mults beats two divides),
        # making stencil/planified/directed BIT-exact vs this oracle under
        # quantized forces instead of merely close.
        inv_ln = (F(1.0) / ln).astype(F)
        fvec = ((fmag[:, None] * diff) * inv_ln[:, None]).astype(F)
        strain = ((ln - s["target"]) / s["length"]).astype(F)
        yielded = np.abs(strain) > s["yield_strain"]
        new_target = (ln - s["yield_strain"] * s["length"] * np.sign(strain)).astype(F)
        breaks = np.abs(ln - s["length"]) > s["length"] * s["strain_limit"]

        upd = b_active
        s["target"] = np.where(upd & yielded, new_target, s["target"])
        s["stress"] = np.where(upd, fmag * STRESS_SCALE, s["stress"])
        s["strain"] = np.where(upd, np.abs(strain) / s["yield_strain"], s["strain"])
        s["last"] = np.where(upd, ln, s["last"])
        s["beam_alive"] = s["beam_alive"] & ~(upd & breaks)

        fvec = np.where(upd[:, None], fvec, F(0))
        if quantized:
            # f32 product then trunc — matches WGSL i32(force * 65536.0).
            q = np.trunc((fvec * FORCE_SCALE).astype(F)).astype(np.int64)
            np.add.at(forces_q, a_idx, -q)
            np.add.at(forces_q, b_idx, q)
        else:
            np.add.at(forces_f, a_idx, -fvec)
            np.add.at(forces_f, b_idx, fvec)

    if quantized:
        beam_force = (forces_q.astype(np.int32).astype(F) / FORCE_SCALE).astype(F)
    else:
        beam_force = forces_f

    # ---- Particle pass (compute.wgsl:133-202), reads pos0/vel0 ----
    p = pos0.copy()
    v = vel0.copy()
    a = acc0.copy()

    if collisions and n > 1:
        d = pos0[None, :, :] - pos0[:, None, :]  # [i, j, 2] = p_j - p_i
        dist = np.sqrt((d.astype(F) ** 2).sum(-1)).astype(F)
        pair = alive[:, None] & alive[None, :]
        np.fill_diagonal(pair, False)

        coincident = pair & (dist == 0)
        idx = np.arange(n, dtype=F)
        dy = np.where(coincident, np.sign(idx[:, None] - idx[None, :]), F(0))
        p[:, 1] += np.where(alive, dy.sum(1, dtype=F), F(0))

        overlap = pair & (dist > 0) & (dist < 2 * radius)
        safe = np.where(overlap, dist, F(1))
        normal = (d / safe[..., None]).astype(F)
        tangent = np.stack([-normal[..., 1], normal[..., 0]], -1)
        rel_v = (vel0[:, None, :] - vel0[None, :, :]).astype(F)
        ecoeff = F((c["elasticity"] + 1) / 2)
        imp_n = (ecoeff * (rel_v * normal).sum(-1)).astype(F)
        mf = (imp_n * c["friction"]).astype(F)
        imp_t = np.minimum(np.maximum((rel_v * tangent).sum(-1).astype(F), -mf), mf)
        dv = -(imp_n[..., None] * normal + imp_t[..., None] * tangent)
        clip = normal * ((2 * radius - dist) * F(0.5))[..., None]
        da = -clip / (dt * dt)
        ov = overlap[..., None]
        v += np.where(ov, dv, F(0)).sum(1, dtype=F) * alive[:, None]
        a += np.where(ov, da, F(0)).sum(1, dtype=F) * alive[:, None]

    # gravity
    a += c["gravity"][None, :]
    # drag (componentwise pow, normalize by speed)
    speed = np.sqrt((v * v).sum(-1)).astype(F)
    moving = speed > 0
    # canonical f32 order (matches the stencil + fused kernels):
    # ((c·|v|^exp)·v)·(1/speed) — reciprocal then multiply, not divide
    inv_speed = (F(1.0) / np.where(moving, speed, F(1))).astype(F)
    drag = ((c["drag_coeff"] * np.abs(v) ** c["drag_exp"] * v)
            * inv_speed[:, None]).astype(F)
    a -= np.where(moving[:, None], drag, F(0))
    # user force
    a += (np.asarray(u["applied_force"], F) * F(u["user_strength"]))[None, :]
    # mouse grab
    if u["mouse_active"]:
        md = np.sqrt(((np.asarray(u["mouse_pos"], F)[None, :] - p) ** 2).sum(-1)).astype(F)
        grabbed = md < radius * 10
        grab = (np.asarray(u["mouse_vel"], F)[None, :] - v) * F(u["user_strength"]) - c[
            "gravity"
        ][None, :]
        a += np.where(grabbed[:, None], grab, F(0))
    # beam forces
    a += beam_force
    # integrate
    v = (v + a * dt).astype(F)
    p = (p + v * dt).astype(F)
    a = np.zeros_like(a)
    # border
    lo, hi = radius, bounds - radius
    clamped = np.clip(p, lo, hi)
    hit_x = p[:, 0] != clamped[:, 0]
    hit_y = p[:, 1] != clamped[:, 1]
    be, bf = c["border_elasticity"], c["border_friction"]
    fric_y = (np.sign(v[:, 1]) * bf * np.abs(v[:, 0]) * (1 + be)).astype(F)
    a[:, 1] = np.where(hit_x, a[:, 1] - np.minimum(a[:, 1], fric_y), a[:, 1])
    v[:, 0] = np.where(hit_x, v[:, 0] * -be, v[:, 0])
    fric_x = (np.sign(v[:, 0]) * bf * np.abs(v[:, 1]) * (1 + be)).astype(F)
    a[:, 0] = np.where(hit_y, a[:, 0] - np.minimum(a[:, 0], fric_x), a[:, 0])
    v[:, 1] = np.where(hit_y, v[:, 1] * -be, v[:, 1])
    p = clamped.astype(F)

    keep = alive[:, None]
    s["pos"] = np.where(keep, p, pos0)
    s["vel"] = np.where(keep, v, vel0)
    s["acc"] = np.where(keep, a, acc0)
    return s


def run(s, steps, **kw):
    for _ in range(steps):
        s = substep(s, **kw)
    return s
