"""Directed-CSR general-topology engine (ops/directed.py): bit-parity
with the flat beam-list path — which is itself oracle-tested against the
reference semantics (compute.wgsl:96-131) — plus breakage and
arbitrary-topology coverage."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from softbody_tpu import PhysicsConstants, StaticConfig, UserInput
from softbody_tpu.models import cloth, multi_blob
from softbody_tpu.ops.directed import (
    build_directed,
    directed_frame,
    directed_to_sim,
)
from softbody_tpu.ops.step import frame_jit


def run_both(state, cfg, frames=3, consts=None, eager=False):
    consts = consts or PhysicsConstants.default()
    uin = UserInput.none()
    ds, se = build_directed(state)
    ref = jax.tree_util.tree_map(jnp.array, state)
    if eager:
        # per-primitive execution: whole-program jit FMA-contracts the
        # shared f32 expressions differently for the two program shapes
        # (1-ulp diffs that violent scenes amplify through breakage
        # branches); eager mode tests the semantics, not the compiler
        from softbody_tpu.ops.directed import directed_substep
        from softbody_tpu.ops.step import substep

        for _ in range(frames * cfg.subticks):
            ref = substep(ref, consts, uin, cfg)
            ds = directed_substep(ds, consts, uin, cfg)
    else:
        for _ in range(frames):
            ref = frame_jit(ref, consts, uin, cfg)
            ds = directed_frame(ds, consts, uin, cfg)
    return directed_to_sim(ds, state, se), ref


@pytest.mark.parametrize("mode", ["allpairs", "grid", "window"])
def test_directed_bit_exact_vs_flat(mode):
    state, cfg = cloth(w=12, h=12, spacing=20.0)
    cfg = dataclasses.replace(cfg, subticks=8, collision_mode=mode,
                              force_mode="quantized")
    got, ref = run_both(state, cfg)
    np.testing.assert_array_equal(np.asarray(got.pos), np.asarray(ref.pos))
    np.testing.assert_array_equal(np.asarray(got.vel), np.asarray(ref.vel))
    np.testing.assert_array_equal(np.asarray(got.beam_alive),
                                  np.asarray(ref.beam_alive))
    np.testing.assert_array_equal(np.asarray(got.beam_target_length),
                                  np.asarray(ref.beam_target_length))


def test_directed_breakage_parity():
    """High-velocity chaos scene: the directed twins must break the same
    beams as the flat path.  Positions compare to tolerance, not bitwise:
    the plasticity update ``length − yield·length·sign`` FMA-contracts
    differently between the [M]-shaped flat program and the [N, D]
    directed program on CPU XLA (1-ulp target_length diffs at substep 1,
    measured; same artifact as test_fused_spatial.py's drag note) — the
    force *accumulation* itself is bit-exact (int32 sums)."""
    state, cfg = cloth(w=10, h=10, spacing=20.0)
    cfg = dataclasses.replace(cfg, subticks=8, collision_mode="allpairs",
                              force_mode="quantized")
    rng = np.random.default_rng(7)
    state = dataclasses.replace(
        state,
        vel=jnp.asarray(rng.normal(0, 80, np.asarray(state.vel).shape)
                        .astype(np.float32)),
        beam_strain_limit=jnp.full_like(state.beam_strain_limit, 0.3),
    )
    got, ref = run_both(state, cfg, frames=1, eager=True)
    m_ref = int(np.asarray(ref.beam_alive).sum())
    m0 = int(np.asarray(state.beam_alive).sum())
    assert m_ref < m0, "scene must actually break beams"
    np.testing.assert_array_equal(np.asarray(got.beam_alive),
                                  np.asarray(ref.beam_alive))
    # eager execution (see run_both) makes the paths bit-comparable even
    # through breakage branches
    np.testing.assert_array_equal(np.asarray(got.pos),
                                  np.asarray(ref.pos))
    np.testing.assert_allclose(np.asarray(got.beam_strain),
                               np.asarray(ref.beam_strain), rtol=0,
                               atol=1e-3)


def test_directed_arbitrary_topology_blobs():
    """Triangulated-disk blobs (non-lattice degree distribution): the
    directed tables must carry the irregular topology exactly."""
    state, cfg = multi_blob(n_blobs=4, blob_radius=30.0)
    cfg = dataclasses.replace(cfg, subticks=16, collision_mode="grid",
                              force_mode="quantized")
    got, ref = run_both(state, cfg, frames=2)
    np.testing.assert_array_equal(np.asarray(got.pos), np.asarray(ref.pos))
    np.testing.assert_array_equal(np.asarray(got.beam_alive),
                                  np.asarray(ref.beam_alive))


def test_directed_segment_mode_close():
    """force_mode="segment" (f32 sums): summation order differs between
    the directed row-sum and segment_sum, so expect allclose."""
    state, cfg = cloth(w=8, h=8, spacing=20.0)
    cfg = dataclasses.replace(cfg, subticks=8, collision_mode="allpairs",
                              force_mode="segment")
    got, ref = run_both(state, cfg, frames=2)
    np.testing.assert_allclose(np.asarray(got.pos), np.asarray(ref.pos),
                               rtol=0, atol=1e-3)
