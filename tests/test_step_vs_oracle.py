"""Golden trajectory tests: JAX implementation vs the NumPy oracle
(float32 reference semantics, SURVEY.md §2.3)."""

import numpy as np
import pytest

import jax.numpy as jnp

from softbody_tpu import PhysicsConstants, StaticConfig, UserInput, state_from_numpy
from softbody_tpu.ops.step import substep_jit as substep

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


def cloth_grid(w=8, h=8, d=25.0, ox=200.0, oy=400.0, spring=50.0, damp=10.0,
               yield_strain=1.0, strain_limit=2.5):
    """addRectangle-style lattice (main.ts:203-213): vertical, horizontal,
    and both diagonal beams."""
    pos = []
    beams = []
    lengths = []

    def bid(x, y):
        return x * h + y

    for x in range(w):
        for y in range(h):
            pos.append([ox + x * d, oy + y * d])
            b = bid(x, y)
            if y < h - 1:
                beams.append([b, b + 1]); lengths.append(d)
            if x < w - 1:
                beams.append([b, b + h]); lengths.append(d)
            if y < h - 1 and x < w - 1:
                beams.append([b, b + h + 1]); lengths.append(np.sqrt(2) * d)
            if y > 0 and x < w - 1:
                beams.append([b, b + h - 1]); lengths.append(np.sqrt(2) * d)
    return (
        np.array(pos, np.float32),
        np.array(beams, np.int32),
        np.array(lengths, np.float32),
        dict(spring=spring, damp=damp, yield_strain=yield_strain,
             strain_limit=strain_limit),
    )


def assert_close(s_jax, s_np, steps, atol):
    np.testing.assert_allclose(np.asarray(s_jax.pos), s_np["pos"], atol=atol,
                               err_msg=f"pos after {steps} substeps")
    np.testing.assert_allclose(np.asarray(s_jax.vel), s_np["vel"], atol=atol * 2,
                               err_msg=f"vel after {steps} substeps")
    m = len(s_np["beam_alive"])  # jax side may carry padding beams
    np.testing.assert_array_equal(
        np.asarray(s_jax.beam_alive)[:m], s_np["beam_alive"]
    )


@pytest.mark.parametrize("quantized", [True, False])
def test_cloth_trajectory_matches_oracle(quantized):
    """32 substeps of an 8×8 cloth under gravity: pointwise f32 match."""
    pos, beams, lengths, props = cloth_grid()
    cfg = StaticConfig(
        subticks=64,
        collision_mode="allpairs",
        force_mode="quantized" if quantized else "segment",
        collision_tile=32,
    )
    state = state_from_numpy(
        pos, beams=beams, beam_length=lengths,
        beam_spring=props["spring"], beam_damp=props["damp"],
        beam_yield_strain=props["yield_strain"],
        beam_strain_limit=props["strain_limit"],
        build_incidence=quantized,
    )
    c = PhysicsConstants.default()
    u = UserInput.none()
    s_np = oracle.make_state(pos, beams=beams, length=lengths,
                             spring=props["spring"], damp=props["damp"],
                             yield_strain=props["yield_strain"],
                             strain_limit=props["strain_limit"])
    s_jax = state
    steps = 32
    for i in range(steps):
        s_jax = substep(s_jax, c, u, cfg)
        s_np = oracle.substep(s_np, dt=cfg.dt, quantized=quantized)
    assert_close(s_jax, s_np, steps, atol=2e-3)


def test_collision_pair_vs_oracle():
    """Two approaching particles collide; impulse + penetration terms match."""
    pos = np.array([[480.0, 500.0], [515.0, 500.0]], np.float32)
    vel = np.array([[30.0, 2.0], [-30.0, -1.0]], np.float32)
    cfg = StaticConfig(subticks=64, collision_mode="allpairs", collision_tile=8)
    state = state_from_numpy(pos, vel=vel)
    c = PhysicsConstants.default()
    u = UserInput.none()
    s_np = oracle.make_state(pos, vel=vel)
    s_jax = state
    for _ in range(64):
        s_jax = substep(s_jax, c, u, cfg)
        s_np = oracle.substep(s_np, dt=cfg.dt)
    assert_close(s_jax, s_np, 64, atol=1e-3)


def test_coincident_particles_nudge():
    pos = np.array([[500.0, 500.0], [500.0, 500.0], [400.0, 400.0]], np.float32)
    cfg = StaticConfig(subticks=64, collision_mode="allpairs", collision_tile=4)
    state = state_from_numpy(pos)
    c = PhysicsConstants.default()
    u = UserInput.none()
    s = substep(state, c, u, cfg)
    s_np = oracle.substep(oracle.make_state(pos), dt=cfg.dt)
    np.testing.assert_allclose(np.asarray(s.pos), s_np["pos"], atol=1e-5)
    # particle 1 (higher index) nudged +y, particle 0 nudged -y
    assert float(s.pos[1, 1]) > float(s.pos[0, 1])


def test_breakage_trajectory_vs_oracle():
    """Beams past strain_limit break and stop applying force next substep."""
    pos = np.array([[300.0, 800.0], [420.0, 800.0]], np.float32)
    vel = np.array([[-80.0, 0.0], [80.0, 0.0]], np.float32)
    cfg = StaticConfig(subticks=64, collision_mode="allpairs", collision_tile=4)
    state = state_from_numpy(
        pos, vel=vel, beams=np.array([[0, 1]]),
        beam_spring=np.array([5.0], np.float32),
        beam_damp=np.array([1.0], np.float32),
        beam_yield_strain=np.array([10.0], np.float32),
        beam_strain_limit=np.array([0.3], np.float32),
    )
    c = PhysicsConstants.default()
    u = UserInput.none()
    s_np = oracle.make_state(
        pos, vel=vel, beams=np.array([[0, 1]]),
        spring=5.0, damp=1.0, yield_strain=10.0, strain_limit=0.3,
    )
    s_jax = state
    for i in range(128):
        s_jax = substep(s_jax, c, u, cfg)
        s_np = oracle.substep(s_np, dt=cfg.dt)
    assert not bool(np.asarray(s_jax.beam_alive)[0])
    assert_close(s_jax, s_np, 128, atol=2e-3)


def test_mouse_and_keyboard_vs_oracle():
    pos = np.array([[500.0, 500.0], [560.0, 520.0], [100.0, 100.0]], np.float32)
    cfg = StaticConfig(subticks=64, collision_mode="allpairs", collision_tile=4)
    state = state_from_numpy(pos)
    c = PhysicsConstants.default()
    u = UserInput.none()
    u.mouse_active = jnp.asarray(True)
    u.mouse_pos = jnp.asarray([520.0, 510.0], jnp.float32)
    u.mouse_vel = jnp.asarray([15.0, -3.0], jnp.float32)
    u.applied_force = jnp.asarray([0.5, 0.25], jnp.float32)
    u.user_strength = jnp.float32(2.0)
    uin_np = {
        "mouse_active": True,
        "mouse_pos": np.array([520.0, 510.0], np.float32),
        "mouse_vel": np.array([15.0, -3.0], np.float32),
        "applied_force": np.array([0.5, 0.25], np.float32),
        "user_strength": np.float32(2.0),
    }
    s_np = oracle.make_state(pos)
    s_jax = state
    for _ in range(32):
        s_jax = substep(s_jax, c, u, cfg)
        s_np = oracle.substep(s_np, uin=uin_np, dt=cfg.dt)
    assert_close(s_jax, s_np, 32, atol=1e-3)
