"""Sharded fused kernel **v2** (parallel/fused_spatial2.py):

- near-field: bit-parity with the single-device v2 kernel (VERDICT r2
  item 5 — the sharded path must run the headline kernel);
- far-field: a fold spanning a device-slab boundary must match the
  single-device far path (VERDICT r2 item 4; reference bar: the O(N²)
  loop sees the whole world, compute.wgsl:144-170).
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from softbody_tpu import PhysicsConstants, StaticConfig, UserInput
from softbody_tpu.models import cloth_lattice, make_lattice
from softbody_tpu.ops.farfield import FarFieldSpec
from softbody_tpu.ops.stencil import LatticeSpec
from softbody_tpu.ops.pallas.fused_substep2 import (
    fused_frame2,
    fused_frame2_far,
    pack_lattice2,
    rebuild_far_list_packed2,
    unpack_lattice2,
)
from softbody_tpu.parallel import make_mesh
from softbody_tpu.parallel.fused_spatial2 import (
    fused_spatial2_frame_fn,
    pack_lattice2_sharded,
    shard_stacks2,
    unpack_lattice2_sharded,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 4, reason="needs 4 virtual devices"
)

RADIUS = 4.0
SPACING = 10.0


def scene(w, h, spacing=16.0, seed=3):
    ls, spec, _ = cloth_lattice(w=w, h=h, spacing=spacing, spring=8.0)
    rng = np.random.default_rng(seed)
    ls = dataclasses.replace(
        ls,
        pos=ls.pos + jnp.asarray(rng.uniform(-2, 2, (w, h, 2)).astype(np.float32)),
        vel=jnp.asarray(rng.normal(0, 10, (w, h, 2)).astype(np.float32)),
    )
    return ls


def boundary_fold(w=32, h=8, gap=6.0):
    """A strip folded back on itself ALONG X so layer contacts span
    every device-slab boundary of a 4-way x-sharding: columns i and
    w−1−i overlap spatially while living on different devices."""
    ls = make_lattice(w, h, SPACING, spring=0.0, damp=0.0,
                      yield_strain=10.0, strain_limit=100.0)
    half = w // 2
    pos = np.zeros((w, h, 2), np.float32)
    for i in range(w):
        y_row = 300.0 if i < half else 300.0 + gap
        xi = i if i < half else (w - 1 - i)
        xoff = 0.0 if i < half else SPACING * 0.5
        pos[i, :, 0] = 100.0 + xi * SPACING + xoff
        pos[i, :, 1] = y_row + np.arange(h) * SPACING * 3.0
    vel = np.zeros((w, h, 2), np.float32)
    vel[:half, :, 1] = 1.5
    vel[half:, :, 1] = -1.5
    return dataclasses.replace(
        ls, pos=jnp.asarray(pos), vel=jnp.asarray(vel)
    )


def run_sharded(ls, spec, cfg, consts, uin, n_dev=4, ffspec=None,
                rebuild_every=1, tile_w=8):
    mesh = make_mesh(n_dev, dp=1)
    hot_sh, obs_sh, immut_sh, ec, w_loc = pack_lattice2_sharded(
        ls, n_dev, tile_w=tile_w
    )
    hot_sh, obs_sh, immut_sh = shard_stacks2(hot_sh, obs_sh, immut_sh, mesh)
    step = fused_spatial2_frame_fn(
        spec, cfg, mesh, tile_w=tile_w, donate=False, interpret=True,
        ffspec=ffspec, rebuild_every=rebuild_every,
    )
    hot_sh, obs_sh = step(hot_sh, obs_sh, immut_sh, ec, consts, uin)
    return unpack_lattice2_sharded(hot_sh, obs_sh, ls, n_dev, w_loc)


@pytest.mark.parametrize("stencil", [0, 2])
def test_sharded_v2_matches_single_device(stencil):
    w, h = 32, 12
    ls = scene(w, h)
    spec = LatticeSpec(w, h, collision_stencil=stencil)
    cfg = StaticConfig(
        subticks=4, particle_radius=9.0,
        collision_mode="allpairs" if stencil else "none",
    )
    consts = dataclasses.replace(
        PhysicsConstants.default(), drag_coeff=jnp.float32(0.0)
    )
    uin = UserInput.none()

    hot, obs, immut, ec = pack_lattice2(ls, tile_w=8)
    hot, obs = fused_frame2(hot, obs, immut, ec, consts, uin, spec, cfg,
                            tile_w=8, interpret=True)
    ref = unpack_lattice2(hot, obs, ls)

    got = run_sharded(ls, spec, cfg, consts, uin)

    if stencil == 0:
        np.testing.assert_array_equal(np.asarray(got.pos), np.asarray(ref.pos))
        np.testing.assert_array_equal(np.asarray(got.vel), np.asarray(ref.vel))
    else:
        # CPU XLA FMA contraction differs between program shapes (see
        # test_fused_spatial.py's bit-exactness notes); on hardware the
        # Mosaic kernel binary is identical in both programs.  Contact
        # chaos amplifies the ulp seeds — a few elements reach ~1e-2
        # over 16 substeps (rel ~6e-5)
        np.testing.assert_allclose(np.asarray(got.pos), np.asarray(ref.pos),
                                   rtol=1e-4, atol=2e-2)
        np.testing.assert_allclose(np.asarray(got.vel), np.asarray(ref.vel),
                                   rtol=1e-4, atol=5e-2)
    for eo, er in zip(got.edges, ref.edges):
        np.testing.assert_array_equal(np.asarray(eo.alive),
                                      np.asarray(er.alive))
        np.testing.assert_allclose(np.asarray(eo.strain),
                                   np.asarray(er.strain), rtol=0, atol=1e-3)


def test_sharded_v2_far_fold_across_boundary():
    """The boundary-spanning fold: sharded global far-field must match
    the single-device far path (same per-substep rebuild cadence)."""
    w, h = 32, 8
    ls = boundary_fold(w, h)
    spec = LatticeSpec(w, h, collision_stencil=2)
    cfg = StaticConfig(subticks=4, collision_mode="allpairs",
                       particle_radius=RADIUS, force_mode="quantized")
    ff = FarFieldSpec(max_pairs=128, max_tile_pairs=32, skin=4.0,
                      horizon=8)
    consts = dataclasses.replace(
        PhysicsConstants.default(), drag_coeff=jnp.float32(0.0)
    )
    uin = UserInput.none()

    # single-device reference: rebuild every substep, fused v2 far frame
    hot, obs, immut, ec = pack_lattice2(ls, tile_w=8)
    for i in range(cfg.subticks):
        fl = rebuild_far_list_packed2(hot, immut, s=2, ff=ff,
                                      radius=RADIUS)
        assert i > 0 or int(fl.n_pairs) > 0, "fold must produce candidates"
        hot, obs = fused_frame2_far(
            hot, obs, immut, ec, fl, consts, uin, spec, cfg, ff,
            tile_w=8, interpret=True, n_sub=1,
            observe=(i == cfg.subticks - 1),
        )
    ref = unpack_lattice2(hot, obs, ls)

    got = run_sharded(ls, spec, cfg, consts, uin, ffspec=ff,
                      rebuild_every=1)

    np.testing.assert_allclose(np.asarray(got.pos), np.asarray(ref.pos),
                               rtol=0, atol=5e-3)
    np.testing.assert_allclose(np.asarray(got.vel), np.asarray(ref.vel),
                               rtol=0, atol=5e-2)

    # and the contact really happened: top layer held above bottom
    pos = np.asarray(got.pos)
    y_bottom = pos[: w // 2, :, 1]
    y_top = pos[w // 2 :, :, 1]
    assert float(np.median(y_top - y_bottom[::-1])) > 0.0


def test_sharded_v2_far_longer_cadence_stays_sound():
    """rebuild_every=4 with an extrusion horizon covering the cadence:
    contacts still resolve (no tunnelling through the fold)."""
    w, h = 32, 8
    ls = boundary_fold(w, h)
    spec = LatticeSpec(w, h, collision_stencil=2)
    cfg = StaticConfig(subticks=8, collision_mode="allpairs",
                       particle_radius=RADIUS, force_mode="quantized")
    ff = FarFieldSpec(max_pairs=128, max_tile_pairs=32, skin=4.0,
                      horizon=8)
    consts = PhysicsConstants.default()
    uin = UserInput.none()
    got = run_sharded(ls, spec, cfg, consts, uin, ffspec=ff,
                      rebuild_every=4)
    pos = np.asarray(got.pos)
    assert np.isfinite(pos).all()
    y_bottom = pos[: w // 2, :, 1]
    y_top = pos[w // 2 :, :, 1]
    assert float(np.median(y_top - y_bottom[::-1])) > 0.0
