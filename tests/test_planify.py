"""Planified general-topology engine (ops/planify.py): spatial
embedding of arbitrary beam graphs onto the dense stencil path.

Parity model: beam forces are bit-identical to the flat path under
``force_mode="quantized"`` (same trunc'd int contributions, commutative
int sum — compute.wgsl:68-70); collision sums differ only in f32
summation order, so positions are allclose, not bit-equal."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from softbody_tpu import PhysicsConstants, StaticConfig, UserInput
from softbody_tpu.models import cloth, multi_blob
from softbody_tpu.ops.planify import (
    planify,
    planified_frame,
    unplanify,
)
from softbody_tpu.ops.step import frame


def run_flat(state, cfg, consts, uin, frames):
    step = jax.jit(lambda s: frame(s, consts, uin, cfg))
    for _ in range(frames):
        state = step(state)
    return state


def test_planify_roundtrip():
    """planify → unplanify with no stepping is the identity on every
    carried field."""
    state, cfg = cloth(w=12, h=12, spacing=20.0)
    ps, spec, aux = planify(state)
    got = unplanify(ps, state, aux)
    np.testing.assert_array_equal(np.asarray(got.pos),
                                  np.asarray(state.pos))
    np.testing.assert_array_equal(np.asarray(got.vel),
                                  np.asarray(state.vel))
    np.testing.assert_array_equal(np.asarray(got.particle_alive),
                                  np.asarray(state.particle_alive))
    np.testing.assert_array_equal(np.asarray(got.beam_alive),
                                  np.asarray(state.beam_alive))
    np.testing.assert_array_equal(np.asarray(got.beam_target_length),
                                  np.asarray(state.beam_target_length))


def test_planify_embedding_quality():
    """Mesh-local graphs must embed almost entirely into dense offset
    classes — the whole point of the layout."""
    for build in (lambda: cloth(w=16, h=16, spacing=20.0),
                  lambda: multi_blob(n_blobs=4, blob_radius=30.0)):
        state, _cfg = build()
        ps, spec, aux = planify(state)
        m_alive = int(np.asarray(state.beam_alive).sum())
        n_exc = aux.n_exceptions
        assert n_exc <= 0.1 * m_alive, (
            f"embedding pushed {n_exc}/{m_alive} beams to exceptions")
        assert len(spec.edge_offsets) <= 49


def test_planified_matches_flat_cloth_beams_bitexact():
    """Falling cloth, beams only (collision off), 8 EAGER substeps: the
    planified path's beam forces are BIT-IDENTICAL to the flat path
    under quantized force mode (same trunc'd int contributions,
    commutative int sum — the module's parity model), so positions
    match exactly.

    Eager (per-primitive) execution on purpose: under whole-program jit
    CPU XLA FMA-contracts the shared f32 expressions differently for the
    [M]-flat and [W,H]-plane program shapes (1-ulp fmag diffs → whole
    force quanta after trunc), which tests the compiler, not the
    embedding.  The jitted-path agreement is covered to tolerance by the
    collisions test below."""
    from softbody_tpu.ops.planify import planified_substep
    from softbody_tpu.ops.step import substep

    state, _ = cloth(w=12, h=12, spacing=20.0)
    cfg = StaticConfig(subticks=8, collision_mode="none",
                       particle_radius=9.0, force_mode="quantized")
    consts, uin = PhysicsConstants.default(), UserInput.none()
    rng = np.random.default_rng(3)
    state = dataclasses.replace(
        state,
        vel=jnp.asarray(rng.normal(0, 10, np.asarray(state.vel).shape)
                        .astype(np.float32)),
    )

    ps, spec, aux = planify(state, collision_stencil=4)
    ref = state
    for _ in range(8):
        ref = substep(ref, consts, uin, cfg)
        ps = planified_substep(ps, consts, uin, spec, cfg)
    got = unplanify(ps, state, aux)

    np.testing.assert_array_equal(np.asarray(got.beam_alive),
                                  np.asarray(ref.beam_alive))
    np.testing.assert_array_equal(np.asarray(got.pos),
                                  np.asarray(ref.pos))
    np.testing.assert_array_equal(np.asarray(got.beam_last_length),
                                  np.asarray(ref.beam_last_length))


def test_planified_matches_flat_cloth_collisions():
    """With all-pairs contact on, collision sums differ only in f32
    summation order — allclose over a short horizon (order noise
    amplifies chaotically through contact, so long-horizon trajectories
    legitimately diverge; the bit-exact check lives in the beams-only
    test above).  Short horizon: jit FMA-contraction quanta flips (see
    above) plus contact chaos amplify beyond any fixed tolerance within
    a few substeps."""
    state, _ = cloth(w=12, h=12, spacing=20.0)
    cfg = StaticConfig(subticks=2, collision_mode="allpairs",
                       particle_radius=9.0, force_mode="quantized")
    consts, uin = PhysicsConstants.default(), UserInput.none()
    rng = np.random.default_rng(3)
    state = dataclasses.replace(
        state,
        vel=jnp.asarray(rng.normal(0, 10, np.asarray(state.vel).shape)
                        .astype(np.float32)),
    )

    ref = run_flat(state, cfg, consts, uin, frames=1)

    ps, spec, aux = planify(state, collision_stencil=4)
    ps = planified_frame(ps, consts, uin, spec, cfg)
    got = unplanify(ps, state, aux)

    np.testing.assert_array_equal(np.asarray(got.beam_alive),
                                  np.asarray(ref.beam_alive))
    np.testing.assert_allclose(np.asarray(got.pos), np.asarray(ref.pos),
                               rtol=0, atol=2e-3)
    np.testing.assert_allclose(np.asarray(got.beam_last_length),
                               np.asarray(ref.beam_last_length),
                               rtol=0, atol=2e-3)


def test_planified_matches_flat_blobs():
    """Triangulated-disk blobs (irregular degrees, arbitrary topology):
    parity vs flat, exceptions included."""
    state, _ = multi_blob(n_blobs=4, blob_radius=30.0)
    cfg = StaticConfig(subticks=8, collision_mode="allpairs",
                       particle_radius=8.0, force_mode="quantized")
    consts, uin = PhysicsConstants.default(), UserInput.none()

    ref = run_flat(state, cfg, consts, uin, frames=2)

    ps, spec, aux = planify(state, collision_stencil=4)
    for _ in range(2):
        ps = planified_frame(ps, consts, uin, spec, cfg)
    got = unplanify(ps, state, aux)

    np.testing.assert_array_equal(np.asarray(got.beam_alive),
                                  np.asarray(ref.beam_alive))
    np.testing.assert_allclose(np.asarray(got.pos), np.asarray(ref.pos),
                               rtol=0, atol=2e-3)


def test_planified_exception_breakage():
    """A deliberately long (non-embeddable) beam must break through the
    exception path and surface in extraction, with reference breakage
    semantics (compute.wgsl:117-121)."""
    from softbody_tpu.models.scenes import _build

    pos = np.array([[100.0, 500.0], [900.0, 500.0],
                    [100.0, 520.0], [900.0, 520.0]], np.float32)
    beams = np.array([[0, 1], [2, 3], [0, 2], [1, 3]], np.int32)
    lengths = np.linalg.norm(pos[beams[:, 0]] - pos[beams[:, 1]],
                             axis=1).astype(np.float32)
    props = {
        "spring": np.full(4, 1.0, np.float32),
        "damp": np.full(4, 0.1, np.float32),
        "yield_strain": np.full(4, 10.0, np.float32),
        "strain_limit": np.full(4, 0.01, np.float32),
    }
    state = _build(pos, beams, lengths, props)
    # pull the two sides apart: the two long horizontal beams must snap
    vel = np.zeros_like(np.asarray(state.vel))
    vel[0] = vel[2] = (-50.0, 0.0)
    vel[1] = vel[3] = (50.0, 0.0)
    state = dataclasses.replace(state, vel=jnp.asarray(vel))
    cfg = StaticConfig(subticks=8, collision_mode="none",
                       particle_radius=5.0, force_mode="quantized")
    consts, uin = PhysicsConstants.default(), UserInput.none()

    # dense_reach=1 forces the 800-unit horizontal beams out of the
    # dense classes (4 particles embed into adjacent columns, so the
    # default reach would absorb them) — the point here is to exercise
    # the exception path end-to-end
    ps, spec, aux = planify(state, dense_reach=1)
    assert aux.n_exceptions >= 2, "long beams should not embed densely"
    ps = planified_frame(ps, consts, uin, spec, cfg)
    got = unplanify(ps, state, aux)
    ba = np.asarray(got.beam_alive)[:4]
    assert not ba[0] and not ba[1], f"long beams did not break: {ba}"
    assert ba[2] and ba[3], f"short beams broke spuriously: {ba}"


def test_planified_far_field_restores_post_embedding_fold_contact():
    """Contacts that DEVELOP after the pack-time embedding can be
    index-distant in the embedded plane (the reference's O(N²) loop sees
    them, compute.wgsl:144-170; the stencil alone cannot).
    planified_frame_far must recover the flat-engine trajectory on a
    strip whose left end has folded over its right end; the stencil-only
    frame must miss the contact (the test's teeth)."""
    from softbody_tpu.models.scenes import _build
    from softbody_tpu.ops.farfield import FarFieldSpec
    from softbody_tpu.ops.planify import planified_frame_far

    # flat horizontal strip, 24 columns x 2 rows, spacing 12
    nx, ny, sp = 24, 2, 12.0
    pos = np.array([[100.0 + i * sp, 500.0 + j * sp]
                    for i in range(nx) for j in range(ny)], np.float32)
    beams = []
    for i in range(nx):
        for j in range(ny):
            p = i * ny + j
            if i + 1 < nx:
                beams.append([p, p + ny])
            if j + 1 < ny:
                beams.append([p, p + 1])
    beams = np.asarray(beams, np.int32)
    lengths = np.linalg.norm(pos[beams[:, 0]] - pos[beams[:, 1]],
                             axis=1).astype(np.float32)
    m = len(beams)
    props = {
        "spring": np.full(m, 50.0, np.float32),
        "damp": np.full(m, 5.0, np.float32),
        "yield_strain": np.full(m, 10.0, np.float32),
        "strain_limit": np.full(m, 10.0, np.float32),
    }
    s_pack = _build(pos, beams, lengths, props)

    # embed the FLAT strip (this is the state the layout knows about);
    # far-armed embeddings need chunk-grid-aligned plane dims (16)
    ps, spec, aux = planify(s_pack, collision_stencil=3,
                            chunk_multiple=16)

    # then the world moves on: the left third folds over onto the right
    # third — spatially touching, embedding-distant (~16 columns apart)
    pos2 = pos.copy()
    vel2 = np.zeros_like(pos)
    fold = nx // 3
    for i in range(fold):
        for j in range(ny):
            p = i * ny + j
            # mirror the left end over the right end, one diameter above
            pos2[p, 0] = pos[(nx - 1 - i) * ny + j, 0]
            pos2[p, 1] = 500.0 + j * sp + 2.5 * 4.0 + 6.0
            vel2[p, 1] = -40.0  # approaching fast: contact this frame
    s_now = _build(pos2, beams, lengths, props)
    s_now = dataclasses.replace(s_now, vel=jnp.asarray(vel2))

    cfg = StaticConfig(subticks=4, collision_mode="allpairs",
                       particle_radius=4.0, force_mode="quantized")
    consts, uin = PhysicsConstants.default(), UserInput.none()

    ref = run_flat(s_now, cfg, consts, uin, frames=1)

    # transplant the evolved positions/velocities into the OLD embedding
    # (planify(s_now) would re-embed and hide the index distance)
    def planes_from_flat(flat_xy):
        out = np.zeros((aux.width * aux.height, 2), np.float32)
        out[aux.cell_of] = flat_xy
        return jnp.asarray(out.reshape(aux.width, aux.height, 2))

    def evolved_ps():
        # fresh buffers each run: the frame fns donate their input
        base = jax.tree_util.tree_map(jnp.copy, ps)
        lat = dataclasses.replace(base.lat, pos=planes_from_flat(pos2),
                                  vel=planes_from_flat(vel2))
        return dataclasses.replace(base, lat=lat)

    ps2 = evolved_ps()

    ff = FarFieldSpec(max_pairs=256, max_tile_pairs=64,
                      skin=1.5 * sp, horizon=2)
    got_far, st = planified_frame_far(ps2, consts, uin, spec, cfg, ff)
    st = np.asarray(st)
    assert st[1] > 0, f"no far pairs found on the fold: {st}"
    assert st[2] == 0, f"capacity overflowed: {st}"
    far_state = unplanify(got_far, s_pack, aux)
    np.testing.assert_allclose(np.asarray(far_state.pos),
                               np.asarray(ref.pos), rtol=0, atol=2e-3)

    # teeth: the stencil-only frame misses the fold contact entirely
    got_near = unplanify(
        planified_frame(evolved_ps(), consts, uin, spec, cfg),
        s_pack, aux)
    miss = np.abs(np.asarray(got_near.pos) - np.asarray(ref.pos)).max()
    assert miss > 1.0, (
        f"stencil-only unexpectedly matched (max diff {miss}) — the "
        "fold is not embedding-distant, test geometry broken")
