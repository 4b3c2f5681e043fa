"""PlanifiedBackend: engine-API route for arbitrary topologies on the
dense stencil path (backends.py ≙ the reference worker's single engine
serving any scene, engineWorker.ts:646-686)."""

import numpy as np

import jax.numpy as jnp

from softbody_tpu import PhysicsConstants, StaticConfig, UserInput
from softbody_tpu.engine.backends import PlanifiedBackend, SimBackend
from softbody_tpu.models import multi_blob


def test_planified_backend_roundtrip_and_step():
    state, cfg0 = multi_blob(n_blobs=4, blob_radius=30.0)
    cfg = StaticConfig(subticks=8, collision_mode="allpairs",
                       particle_radius=8.0, force_mode="quantized")
    consts, uin = PhysicsConstants.default(), UserInput.none()
    be = PlanifiedBackend(cfg)
    ps = be.pack_state(state)

    n0, m0 = be.counts(ps)
    assert n0 == int(np.asarray(state.particle_alive).sum())
    assert m0 == int(np.asarray(state.beam_alive).sum())

    for _ in range(2):
        ps = be.step(ps, consts, uin)
    pos, palive, ba, bb, balive, strain, stress = be.extract(ps)
    assert np.isfinite(np.asarray(pos)).all()
    assert np.asarray(palive).sum() == n0

    # parity with the flat SimBackend over the same frames (beam forces
    # bit-exact would need eager mode — see test_planify; here the jit
    # paths agree to tolerance over a short horizon)
    sb = SimBackend(cfg)
    ref = state
    for _ in range(2):
        ref = sb.step(ref, consts, uin)
    np.testing.assert_allclose(np.asarray(pos), np.asarray(ref.pos),
                               rtol=0, atol=5e-2)


def test_planified_backend_snapshot_and_corrupt():
    state, _ = multi_blob(n_blobs=2, blob_radius=25.0)
    cfg = StaticConfig(subticks=4, collision_mode="allpairs",
                       particle_radius=8.0, force_mode="quantized")
    consts, uin = PhysicsConstants.default(), UserInput.none()
    be = PlanifiedBackend(cfg)
    ps = be.pack_state(state)
    blob = be.save(ps, consts)
    got = be.load(blob)
    assert got is not None
    ps2, consts2 = got
    np.testing.assert_array_equal(
        np.asarray(be.unpack_state(ps2).pos), np.asarray(state.pos))

    rng = np.random.default_rng(0)
    ps3 = be.corrupt(ps2, rng)
    ps3 = be.step(ps3, consts, uin)
    pos, *_ = be.extract(ps3)
    assert np.asarray(pos).shape == np.asarray(state.pos).shape


def test_planified_backend_farfield_armed():
    """PlanifiedBackend(farfield=...) runs the fixed-cadence far frame
    and reports device-accumulated stats; physics stays finite and the
    reset-on-read contract holds."""
    from softbody_tpu.ops.farfield import FarFieldSpec

    state, _ = multi_blob(n_blobs=4, blob_radius=30.0)
    cfg = StaticConfig(subticks=8, collision_mode="allpairs",
                       particle_radius=8.0, force_mode="quantized")
    consts, uin = PhysicsConstants.default(), UserInput.none()
    ff = FarFieldSpec(max_pairs=128, max_tile_pairs=32, skin=10.0,
                      horizon=4)
    be = PlanifiedBackend(cfg, farfield=ff)
    ps = be.pack_state(state)
    for _ in range(2):
        ps = be.step(ps, consts, uin)
    pos = be.extract(ps)[0]
    assert np.isfinite(np.asarray(pos)).all()
    st = be.far_stats()
    assert st["far_rebuilds"] == 4, st   # 2 frames x (8 substeps / 4)
    assert st["far_overflow"] == 0, st
    assert be.far_stats() == {}          # accumulator resets on read
