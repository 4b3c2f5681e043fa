"""Snapshot round-trip tests (≙ the subsystem at engineMapping.ts:377-430;
the u16-header overflow documented in SURVEY.md §3.3 is fixed by v1)."""

import numpy as np
import pytest

from softbody_tpu import PhysicsConstants, StaticConfig, UserInput, state_from_numpy
from softbody_tpu.models import cloth, default_scene
from softbody_tpu.ops.step import substep_jit
from softbody_tpu.snapshot import (
    SnapshotError,
    V0_MAX_PARTICLES,
    load_snapshot,
    save_snapshot,
)


def small_state():
    pos = np.array([[100.0, 200.0], [300.0, 400.0], [500.0, 600.0]], np.float32)
    vel = np.array([[1.0, -2.0], [3.0, 4.0], [0.0, 0.5]], np.float32)
    beams = np.array([[0, 1], [1, 2]], np.int32)
    return state_from_numpy(
        pos, vel, beams=beams,
        beam_spring=np.array([10.0, 20.0], np.float32),
        beam_damp=np.array([1.0, 2.0], np.float32),
        beam_yield_strain=np.array([0.5, 0.6], np.float32),
        beam_strain_limit=np.array([2.0, 3.0], np.float32),
    )


def assert_states_equal(s1, s2):
    for f in ("pos", "vel", "acc"):
        np.testing.assert_array_equal(np.asarray(getattr(s1, f)),
                                      np.asarray(getattr(s2, f)), err_msg=f)
    for f in ("beam_a", "beam_b", "beam_length", "beam_target_length",
              "beam_last_length", "beam_spring", "beam_damp",
              "beam_yield_strain", "beam_strain_limit", "beam_strain",
              "beam_stress"):
        np.testing.assert_array_equal(np.asarray(getattr(s1, f)),
                                      np.asarray(getattr(s2, f)), err_msg=f)


@pytest.mark.parametrize("fmt", ["v0", "v1"])
def test_roundtrip_exact(fmt):
    state = small_state()
    consts = PhysicsConstants.default()
    buf = save_snapshot(state, consts, format=fmt)
    state2, consts2 = load_snapshot(buf)
    assert_states_equal(state, state2)
    np.testing.assert_array_equal(np.asarray(consts.to_array()),
                                  np.asarray(consts2.to_array()))


def test_v0_reference_byte_layout():
    """Check the v0 header and strides byte-for-byte (engineMapping.ts:377-401)."""
    state = small_state()
    buf = save_snapshot(state, PhysicsConstants.default(), format="v0")
    header = np.frombuffer(buf, np.uint16, 6)
    pc, bc = 3, 2
    assert header[0] == 2 * pc          # particle mapping bytes
    assert header[1] == 24 * pc         # particle data bytes (stride 24)
    assert header[2] == 2 * bc          # beam mapping bytes
    assert header[3] == 40 * bc         # beam data bytes (stride 40)
    assert header[4] == 32              # metadata: 8×f32
    consts = np.frombuffer(buf, np.float32, 8, 12)
    assert consts[0] == 0.0 and consts[1] == -0.5  # gravity
    # first particle record: pos(100,200) vel(1,-2) acc(0,0)
    off = 12 + 32 + 2 * pc
    p0 = np.frombuffer(buf, np.float32, 6, off)
    np.testing.assert_array_equal(p0, [100.0, 200.0, 1.0, -2.0, 0.0, 0.0])
    # first beam record: u16 pair (0,1) then length...
    boff = off + 24 * pc + 2 * bc
    pair = np.frombuffer(buf, np.uint16, 2, boff)
    np.testing.assert_array_equal(pair, [0, 1])


def test_v0_capacity_refused():
    n = V0_MAX_PARTICLES + 1
    pos = np.random.uniform(50, 950, (n, 2)).astype(np.float32)
    state = state_from_numpy(pos)
    with pytest.raises(SnapshotError):
        save_snapshot(state, PhysicsConstants.default(), format="v0")
    # auto falls back to v1
    buf = save_snapshot(state, PhysicsConstants.default(), format="auto")
    assert buf[:4] == b"SBT1"
    state2, _ = load_snapshot(buf)
    np.testing.assert_array_equal(np.asarray(state2.pos), pos)


def test_load_capacity_check():
    state = small_state()
    buf = save_snapshot(state, PhysicsConstants.default())
    with pytest.raises(SnapshotError):
        load_snapshot(buf, max_particles=2)
    s2, _ = load_snapshot(buf, max_particles=64, max_beams=64)
    assert s2.max_particles == 64
    assert int(s2.particle_count) == 3


def test_snapshot_resumes_trajectory():
    """Checkpoint/resume: stepping a loaded snapshot must continue the
    trajectory identically (same f32 math, same state)."""
    state, _ = default_scene()
    cfg = StaticConfig(subticks=8, collision_mode="allpairs", collision_tile=128)
    consts = PhysicsConstants.default()
    uin = UserInput.none()
    for _ in range(4):
        state = substep_jit(state, consts, uin, cfg)
    buf = save_snapshot(state, consts)
    resumed, consts2 = load_snapshot(buf)
    a = substep_jit(state, consts, uin, cfg)
    b = substep_jit(resumed, consts2, uin, cfg)
    np.testing.assert_array_equal(np.asarray(a.pos), np.asarray(b.pos))
    np.testing.assert_array_equal(np.asarray(a.vel), np.asarray(b.vel))


def test_dead_beams_dropped_on_save():
    import jax.numpy as jnp
    state = small_state()
    state.beam_alive = jnp.asarray([True, False])
    buf = save_snapshot(state, PhysicsConstants.default())
    s2, _ = load_snapshot(buf)
    assert int(s2.beam_count) == 1
    np.testing.assert_array_equal(np.asarray(s2.beam_a)[:1], [0])
