"""Golden test: the full reference default world (119 particles /
299 beams, main.ts:188-253) stepped against the NumPy oracle — the
strongest trajectory-parity evidence for the flagship scene."""

import numpy as np

from softbody_tpu import PhysicsConstants, StaticConfig, UserInput
from softbody_tpu.models import default_scene
from softbody_tpu.ops.step import substep_jit

import oracle


def test_default_world_trajectory_vs_oracle():
    state, _ = default_scene()
    cfg = StaticConfig(subticks=64, collision_mode="allpairs",
                       collision_tile=128, force_mode="quantized")
    consts, uin = PhysicsConstants.default(), UserInput.none()

    s_np = oracle.make_state(
        np.asarray(state.pos), vel=np.asarray(state.vel),
        beams=np.stack([np.asarray(state.beam_a), np.asarray(state.beam_b)], -1),
        length=np.asarray(state.beam_length),
        spring=np.asarray(state.beam_spring),
        damp=np.asarray(state.beam_damp),
        yield_strain=np.asarray(state.beam_yield_strain),
        strain_limit=np.asarray(state.beam_strain_limit),
    )
    s = state
    for i in range(24):
        s = substep_jit(s, consts, uin, cfg)
        s_np = oracle.substep(s_np, dt=cfg.dt)
    np.testing.assert_allclose(np.asarray(s.pos), s_np["pos"], atol=5e-3)
    np.testing.assert_allclose(np.asarray(s.vel), s_np["vel"], atol=1e-2)
    np.testing.assert_array_equal(
        np.asarray(s.beam_alive), s_np["beam_alive"]
    )
    # the default world starts with several soft bodies resting on the
    # floor; nothing should have broken this early
    assert bool(np.asarray(s.beam_alive).all())
