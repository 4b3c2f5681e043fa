"""Config-4 correctness: blob–blob contact with friction and restitution
(models/scenes.py::multi_blob) must match the NumPy oracle's all-pairs
reference semantics (compute.wgsl:144-170) — the grid broad phase is an
implementation detail, not a physics change."""

import math

import numpy as np
import pytest

import jax.numpy as jnp

from softbody_tpu import PhysicsConstants, StaticConfig, UserInput
from softbody_tpu.models import multi_blob
from softbody_tpu.models.scenes import _build, _disk_points, _triangulate
from softbody_tpu.ops.step import frame_jit, substep_jit

import oracle


def to_oracle(state):
    return {
        "pos": np.asarray(state.pos),
        "vel": np.asarray(state.vel),
        "acc": np.asarray(state.acc),
        "alive": np.asarray(state.particle_alive),
        "beam_a": np.asarray(state.beam_a),
        "beam_b": np.asarray(state.beam_b),
        "length": np.asarray(state.beam_length),
        "target": np.asarray(state.beam_target_length),
        "last": np.asarray(state.beam_last_length),
        "spring": np.asarray(state.beam_spring),
        "damp": np.asarray(state.beam_damp),
        "yield_strain": np.asarray(state.beam_yield_strain),
        "strain_limit": np.asarray(state.beam_strain_limit),
        "strain": np.asarray(state.beam_strain),
        "stress": np.asarray(state.beam_stress),
        "beam_alive": np.asarray(state.beam_alive),
    }


def two_blobs(gap=2.0, closing=30.0, spacing=18.0, radius=40.0):
    """Two triangulated disks on a collision course along x."""
    from softbody_tpu.models.scenes import merge_scenes

    scenes = []
    for k, cx in enumerate((300.0, 300.0 + 2 * radius + gap)):
        pos = _disk_points(cx, 500.0, radius, spacing)
        beams, lengths = _triangulate(pos, spacing * 1.6)
        m = beams.shape[0]
        props = {
            "spring": np.full(m, 120.0, np.float32),
            "damp": np.full(m, 15.0, np.float32),
            "yield_strain": np.full(m, 0.6, np.float32),
            "strain_limit": np.full(m, 3.0, np.float32),
        }
        scenes.append((pos, beams, lengths, props))
    merged = merge_scenes(*scenes)
    n0 = scenes[0][0].shape[0]
    pos = merged[0]
    vel = np.zeros_like(pos)
    vel[:n0, 0] = closing / 2
    vel[n0:, 0] = -closing / 2
    state = _build(*merged, vel=vel)
    return state, n0


@pytest.mark.parametrize("mode", ["allpairs", "grid"])
def test_blob_contact_matches_oracle(mode):
    state, n0 = two_blobs()
    cfg = StaticConfig(subticks=64, collision_mode=mode,
                       particle_radius=18.0 * 0.45,
                       grid_cell_capacity=8, force_mode="quantized")
    consts, uin = PhysicsConstants.default(), UserInput.none()
    s_np = to_oracle(state)
    for _ in range(24):
        state = substep_jit(state, consts, uin, cfg)
        s_np = oracle.substep(s_np, dt=cfg.dt,
                              radius=cfg.particle_radius, quantized=True)
    np.testing.assert_allclose(np.asarray(state.pos), s_np["pos"],
                               rtol=0, atol=2e-3)
    np.testing.assert_allclose(np.asarray(state.vel), s_np["vel"],
                               rtol=0, atol=2e-2)


def test_blob_restitution_and_friction_effects():
    """Restitution: higher elasticity → faster post-impact separation.
    Friction: a blob sliding along the floor decelerates horizontally
    faster with higher border friction."""
    import dataclasses

    state, n0 = two_blobs(closing=60.0)
    cfg = StaticConfig(subticks=64, collision_mode="grid",
                       particle_radius=18.0 * 0.45, grid_cell_capacity=8)
    uin = UserInput.none()

    def rel_speed_after(elasticity):
        consts = PhysicsConstants.default()
        consts = dataclasses.replace(
            consts, elasticity=jnp.float32(elasticity),
            gravity=jnp.zeros(2, jnp.float32))
        s = state
        for _ in range(40):
            s = substep_jit(s, consts, uin, cfg)
        v = np.asarray(s.vel)
        return float(v[n0:, 0].mean() - v[:n0, 0].mean())

    sep_bouncy = rel_speed_after(0.95)
    sep_dead = rel_speed_after(0.05)
    assert sep_bouncy > sep_dead

    def floor_slide_vx(border_friction):
        # border friction acts on impact (the cross-axis term scales
        # with |v_y|, compute.wgsl:192-196) and is one-sided by the
        # reference's ``−min(0, ·)`` quirk — it only decelerates motion
        # in the negative direction — so drop the blob onto the floor
        # sliding LEFT
        consts = dataclasses.replace(
            PhysicsConstants.default(),
            border_friction=jnp.float32(border_friction))
        pos = np.asarray(state.pos).copy()
        pos[:, 1] -= pos[:, 1].min() - cfg.particle_radius - 30.0
        vel = np.zeros_like(pos)
        vel[:, 0] = -50.0
        vel[:, 1] = -60.0
        s = dataclasses.replace(state, pos=jnp.asarray(pos),
                                vel=jnp.asarray(vel))
        for _ in range(64):
            s = substep_jit(s, consts, uin, cfg)
        return float(np.asarray(s.vel)[:, 0].mean())

    # friction decelerates the leftward slide: mean vx closer to zero
    # (margin ~0.75 at these speeds; the contact is one brief bounce)
    assert floor_slide_vx(0.8) > floor_slide_vx(0.0) + 0.3


def test_multi_blob_scene_shape():
    state, cfg = multi_blob(n_blobs=9, blob_radius=30.0)
    n = int(np.asarray(state.particle_alive).sum())
    m = int(np.asarray(state.beam_alive).sum())
    assert n > 9 * 8 and m > n  # triangulated disks: beams outnumber particles
    consts, uin = PhysicsConstants.default(), UserInput.none()
    out = frame_jit(state, consts, uin, cfg)
    assert bool(np.isfinite(np.asarray(out.pos)).all())
