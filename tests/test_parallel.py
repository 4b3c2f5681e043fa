"""Multi-device tests on the virtual 8-device CPU mesh: spatial sharding
must reproduce the single-device trajectory; batched dp must equal per-
world runs."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from softbody_tpu import PhysicsConstants, StaticConfig, UserInput
from softbody_tpu.models import cloth, default_scene
from softbody_tpu.ops.step import substep_jit
from softbody_tpu.parallel import (
    batched_frame_fn,
    device_put_batched,
    make_mesh,
    pad_state_for_mesh,
    shard_state,
    spatial_frame_fn,
    stack_states,
    unstack_states,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def small_cfg(**kw):
    base = dict(subticks=4, collision_mode="allpairs", collision_tile=64,
                force_mode="quantized")
    base.update(kw)
    return StaticConfig(**base)


def run_single(state, cfg, n_frames):
    consts, uin = PhysicsConstants.default(), UserInput.none()
    for _ in range(n_frames * cfg.subticks):
        state = substep_jit(state, consts, uin, cfg)
    return state


@pytest.mark.parametrize("collision", ["allpairs", "grid"])
def test_spatial_matches_single_device(collision):
    cfg = small_cfg(collision_mode=collision)
    state, _ = cloth(w=8, h=8, spacing=25.0)
    mesh = make_mesh(8, dp=1)

    padded = pad_state_for_mesh(state, sp=8)
    sharded = shard_state(padded, mesh)
    step = spatial_frame_fn(cfg, mesh, donate=False)
    consts, uin = PhysicsConstants.default(), UserInput.none()
    out = step(sharded, consts, uin)

    ref = run_single(pad_state_for_mesh(state, sp=8), cfg, 1)
    np.testing.assert_allclose(np.asarray(out.pos), np.asarray(ref.pos),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(out.vel), np.asarray(ref.vel),
                               atol=5e-4)
    np.testing.assert_array_equal(np.asarray(out.beam_alive),
                                  np.asarray(ref.beam_alive))


def test_spatial_quantized_forces_bit_exact():
    """int32 fixed-point forces make the psum exactly associative: the
    spatial beam-force accumulator must match single-device bitwise
    (same guarantee the reference gets from i32 atomics)."""
    cfg = small_cfg(collision_mode="none", subticks=2)
    state, _ = cloth(w=8, h=8, spacing=25.0)
    mesh = make_mesh(8, dp=1)
    padded = pad_state_for_mesh(state, sp=8)
    sharded = shard_state(padded, mesh)
    step = spatial_frame_fn(cfg, mesh, donate=False)
    consts, uin = PhysicsConstants.default(), UserInput.none()
    out = step(sharded, consts, uin)
    ref = run_single(pad_state_for_mesh(state, sp=8), cfg, 1)
    # no collisions → the only cross-particle coupling is the quantized
    # beam force; trajectories must agree to the last ulp
    np.testing.assert_array_equal(np.asarray(out.pos), np.asarray(ref.pos))
    np.testing.assert_array_equal(np.asarray(out.vel), np.asarray(ref.vel))


def test_batched_dp_matches_individual():
    cfg = small_cfg()
    s1, _ = cloth(w=6, h=6, spacing=25.0)
    s2, _ = cloth(w=6, h=6, spacing=30.0)
    states = stack_states([s1, s2, s1, s2])
    mesh = make_mesh(4, dp=4)
    states = device_put_batched(states, mesh)
    step = batched_frame_fn(cfg, mesh)
    consts, uin = PhysicsConstants.default(), UserInput.none()
    out = step(states, consts, uin)
    refs = [run_single(s, cfg, 1) for s in (s1, s2)]
    outs = unstack_states(out)
    np.testing.assert_allclose(np.asarray(outs[0].pos),
                               np.asarray(refs[0].pos), atol=1e-5)
    np.testing.assert_allclose(np.asarray(outs[1].pos),
                               np.asarray(refs[1].pos), atol=1e-5)
    np.testing.assert_allclose(np.asarray(outs[2].pos),
                               np.asarray(refs[0].pos), atol=1e-5)


def test_dp_times_sp_mesh():
    """2-D dp×sp: batch of worlds, each spatially sharded."""
    cfg = small_cfg(subticks=2)
    s1, _ = cloth(w=6, h=6, spacing=25.0)
    s2, _ = cloth(w=6, h=6, spacing=30.0)
    mesh = make_mesh(8, dp=2)  # 2 dp × 4 sp
    batched = stack_states([pad_state_for_mesh(s, sp=4) for s in (s1, s2)])
    sharded = shard_state(batched, mesh, dp_axis="dp")
    step = spatial_frame_fn(cfg, mesh, dp_axis="dp", donate=False)
    consts, uin = PhysicsConstants.default(), UserInput.none()
    out = step(sharded, consts, uin)
    refs = [run_single(pad_state_for_mesh(s, sp=4), cfg, 1) for s in (s1, s2)]
    outs = unstack_states(out)
    for got, ref in zip(outs, refs):
        np.testing.assert_allclose(np.asarray(got.pos), np.asarray(ref.pos),
                                   atol=2e-4)


def test_spatial_breakage_across_shards():
    """A beam whose endpoints live on different devices must still break
    and stop pulling."""
    pos = np.array([[300.0, 800.0], [700.0, 800.0]], np.float32)
    # pad to 8 particles so each device owns one
    pos = np.concatenate([pos, np.tile([[50.0, 50.0]], (6, 1))]).astype(np.float32)
    from softbody_tpu import state_from_numpy

    state = state_from_numpy(
        pos, vel=np.array([[-50.0, 0.0], [50.0, 0.0]] + [[0.0, 0.0]] * 6,
                          np.float32),
        beams=np.array([[0, 1]] * 8),  # 8 beams → one per shard
        beam_spring=np.array([0.04] * 8, np.float32),
        beam_strain_limit=np.array([0.2] * 8, np.float32),
        build_incidence=False,
    )
    cfg = small_cfg(collision_mode="none", subticks=8)
    mesh = make_mesh(8, dp=1)
    sharded = shard_state(pad_state_for_mesh(state, 8), mesh)
    step = spatial_frame_fn(cfg, mesh, donate=False)
    consts, uin = PhysicsConstants.default(), UserInput.none()
    out = step(sharded, consts, uin)
    for _ in range(3):
        out = step(out, consts, uin)
    assert not bool(np.asarray(out.beam_alive)[0])
