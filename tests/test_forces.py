"""Unit tests for individual force terms against closed-form physics
(the real test suite the reference never had — SURVEY.md §4)."""

import numpy as np
import pytest

import jax.numpy as jnp

from softbody_tpu import PhysicsConstants, StaticConfig, UserInput, state_from_numpy
from softbody_tpu.ops import frame
from softbody_tpu.ops.step import substep_jit as substep
from softbody_tpu.ops.forces import accumulate_forces, beam_forces


def consts_zero_g():
    c = PhysicsConstants.default()
    c.gravity = jnp.zeros(2, jnp.float32)
    c.drag_coeff = jnp.float32(0.0)
    return c


CFG = StaticConfig(subticks=64, collision_mode="none")


def test_free_fall():
    """v += g·dt each substep; closed-form sum."""
    cfg = CFG
    c = PhysicsConstants.default()
    c.drag_coeff = jnp.float32(0.0)
    state = state_from_numpy(np.array([[500.0, 900.0]]))
    u = UserInput.none()
    s = state
    for _ in range(32):
        s = substep(s, c, u, cfg)
    # after k substeps: v = k·g·dt, p = p0 + dt²·g·(1+...+k)
    k, dt, g = 32, cfg.dt, -0.5
    v_expect = k * g * dt
    p_expect = 900.0 + g * dt * dt * k * (k + 1) / 2
    np.testing.assert_allclose(float(s.vel[0, 1]), v_expect, rtol=1e-5)
    np.testing.assert_allclose(float(s.pos[0, 1]), p_expect, rtol=1e-5)


def test_spring_oscillator_period():
    """Single horizontal spring, no damping: period T = 2π√(m/k_eff).

    Two particles on a spring of stiffness s: each endpoint sees force
    s·Δx along the axis (compute.wgsl:110), so the symmetric mode has
    ω = √(2·s) (unit mass, dt per substep)."""
    spring = 10.0
    cfg = StaticConfig(subticks=256, collision_mode="none")
    c = consts_zero_g()
    rest = 100.0
    stretch = 5.0
    state = state_from_numpy(
        np.array([[400.0, 500.0], [400.0 + rest + stretch, 500.0]]),
        beams=np.array([[0, 1]]),
        beam_length=np.array([rest], np.float32),
        beam_spring=np.array([spring], np.float32),
        beam_damp=np.array([0.0], np.float32),
    )
    u = UserInput.none()
    omega = np.sqrt(2.0 * spring)
    period = 2 * np.pi / omega
    steps = int(round(period / cfg.dt))
    s = state
    for _ in range(steps):
        s = substep(s, c, u, cfg)
    # after one full period the stretch should be back near +5
    length = float(jnp.linalg.norm(s.pos[1] - s.pos[0]))
    assert abs(length - (rest + stretch)) < 0.2, length


def test_beam_force_direction_and_magnitude():
    state = state_from_numpy(
        np.array([[0.0, 0.0], [150.0, 0.0]]),
        beams=np.array([[0, 1]]),
        beam_length=np.array([100.0], np.float32),
        beam_spring=np.array([2.0], np.float32),
        beam_damp=np.array([0.0], np.float32),
        beam_target_length=np.array([100.0], np.float32),
        beam_last_length=np.array([150.0], np.float32),
    )
    fvec, upd, breaks = beam_forces(state, CFG)
    # force_mag = (100-150)*2 = -100, direction (1,0) → force on b = (-100, 0)
    np.testing.assert_allclose(np.asarray(fvec[0]), [-100.0, 0.0], atol=1e-4)
    total = accumulate_forces(state, fvec, CFG)
    np.testing.assert_allclose(np.asarray(total[0]), [100.0, 0.0], atol=1e-3)
    np.testing.assert_allclose(np.asarray(total[1]), [-100.0, 0.0], atol=1e-3)
    # stress = force_mag / 20
    np.testing.assert_allclose(float(upd["beam_stress"][0]), -5.0, atol=1e-5)


def test_damping_force():
    """Damping acts on rate of length change: (last - len)·damp."""
    state = state_from_numpy(
        np.array([[0.0, 0.0], [100.0, 0.0]]),
        beams=np.array([[0, 1]]),
        beam_length=np.array([100.0], np.float32),
        beam_spring=np.array([0.0], np.float32),
        beam_damp=np.array([3.0], np.float32),
        beam_last_length=np.array([110.0], np.float32),
    )
    fvec, _, _ = beam_forces(state, CFG)
    # (110 - 100)*3 = 30 along +x on endpoint b
    np.testing.assert_allclose(np.asarray(fvec[0]), [30.0, 0.0], atol=1e-4)


def test_plastic_yield():
    """|strain| beyond yield_strain pulls target_length toward current."""
    state = state_from_numpy(
        np.array([[0.0, 0.0], [130.0, 0.0]]),
        beams=np.array([[0, 1]]),
        beam_length=np.array([100.0], np.float32),
        beam_spring=np.array([1.0], np.float32),
        beam_yield_strain=np.array([0.2], np.float32),
        beam_target_length=np.array([100.0], np.float32),
    )
    _, upd, breaks = beam_forces(state, CFG)
    # strain = (130-100)/100 = 0.3 > 0.2 → target = 130 - 0.2*100 = 110
    np.testing.assert_allclose(float(upd["beam_target_length"][0]), 110.0, atol=1e-4)
    assert not bool(breaks[0])


def test_breakage():
    state = state_from_numpy(
        np.array([[0.0, 0.0], [200.0, 0.0]]),
        beams=np.array([[0, 1]]),
        beam_length=np.array([100.0], np.float32),
        beam_spring=np.array([1.0], np.float32),
        beam_strain_limit=np.array([0.5], np.float32),
    )
    fvec, upd, breaks = beam_forces(state, CFG)
    # |200-100| = 100 > 100*0.5 → break; force still applied this substep
    assert bool(breaks[0])
    assert not bool(upd["beam_alive"][0])
    assert float(jnp.abs(fvec).sum()) > 0.0


def test_zero_length_guard():
    """Coincident beam endpoints → diff nudged to (0, -1e-10)."""
    state = state_from_numpy(
        np.array([[50.0, 50.0], [50.0, 50.0]]),
        beams=np.array([[0, 1]]),
        beam_length=np.array([10.0], np.float32),
        beam_spring=np.array([1.0], np.float32),
    )
    fvec, _, _ = beam_forces(state, StaticConfig(collision_mode="none"))
    assert np.all(np.isfinite(np.asarray(fvec)))
    # force along (0,-1): magnitude (10 - 1e-10)*1 ≈ 10 pulling b down
    np.testing.assert_allclose(np.asarray(fvec[0]), [0.0, -10.0], atol=1e-4)


def test_drag_direction():
    """Drag opposes velocity, componentwise power law (compute.wgsl:174-176)."""
    cfg = StaticConfig(subticks=64, collision_mode="none")
    c = consts_zero_g()
    c.drag_coeff = jnp.float32(0.01)
    state = state_from_numpy(np.array([[500.0, 500.0]]), vel=np.array([[40.0, 30.0]]))
    s = substep(state, c, UserInput.none(), cfg)
    # a = -0.01 * (|v|^2 componentwise) * v_hat ; v=(40,30), |v|=50
    ax = -0.01 * 40**2 * (40 / 50)
    ay = -0.01 * 30**2 * (30 / 50)
    v_expect = np.array([40.0 + ax * cfg.dt, 30.0 + ay * cfg.dt])
    np.testing.assert_allclose(np.asarray(s.vel[0]), v_expect, rtol=1e-5)


def test_keyboard_force():
    cfg = StaticConfig(subticks=64, collision_mode="none")
    c = consts_zero_g()
    u = UserInput.none()
    u.applied_force = jnp.asarray([2.0, 0.0], jnp.float32)
    u.user_strength = jnp.float32(1.5)
    state = state_from_numpy(np.array([[500.0, 500.0]]))
    s = substep(state, c, u, cfg)
    np.testing.assert_allclose(float(s.vel[0, 0]), 3.0 * cfg.dt, rtol=1e-6)


def test_mouse_grab_cancels_gravity():
    cfg = StaticConfig(subticks=64, collision_mode="none")
    c = PhysicsConstants.default()
    c.drag_coeff = jnp.float32(0.0)
    u = UserInput.none()
    u.mouse_active = jnp.asarray(True)
    u.mouse_pos = jnp.asarray([500.0, 500.0], jnp.float32)
    state = state_from_numpy(np.array([[520.0, 500.0]]))  # within 10·r
    s = substep(state, c, u, cfg)
    # grab acc = (0 - v)*1 - g ; v=0 → a = -g; total = g + (-g) = 0
    np.testing.assert_allclose(np.asarray(s.vel[0]), [0.0, 0.0], atol=1e-7)


def test_border_bounce():
    """Velocity reflects scaled by -border_elasticity (compute.wgsl:193)."""
    cfg = StaticConfig(subticks=2, collision_mode="none")  # dt = 0.5
    c = consts_zero_g()
    state = state_from_numpy(np.array([[15.0, 500.0]]), vel=np.array([[-100.0, 0.0]]))
    s = substep(state, c, UserInput.none(), cfg)
    # p would be 15-50 = -35 → clamped to r=10, v.x *= -0.5 → +50
    np.testing.assert_allclose(float(s.pos[0, 0]), 10.0, atol=1e-6)
    np.testing.assert_allclose(float(s.vel[0, 0]), 50.0, rtol=1e-6)


def test_border_friction_acc_carryover():
    """Border friction writes into the carried acceleration state."""
    cfg = StaticConfig(subticks=2, collision_mode="none")
    c = consts_zero_g()
    state = state_from_numpy(
        np.array([[15.0, 500.0]]), vel=np.array([[-100.0, -8.0]])
    )
    s = substep(state, c, UserInput.none(), cfg)
    # hit x-border: a.y -= min(0, sign(v.y)*bf*|v.x|*(1+be))
    # v after integrate: (-100, -8); sign(v.y) = -1 → X = -0.2*100*1.5 = -30
    # a.y = 0 - min(0, -30) = 30
    np.testing.assert_allclose(float(s.acc[0, 1]), 30.0, rtol=1e-5)
    # and that acceleration participates in the next substep
    s2 = substep(s, c, UserInput.none(), cfg)
    assert float(s2.vel[0, 1]) > float(s.vel[0, 1])
