"""Far-field v4 (ops/farfield4.py + fused_frame4): mirror-table apply
parity with the round-2 windowed apply, and the fixed-cadence frame's
physics parity with the trigger-based v2 auto frame on a fold."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from softbody_tpu import PhysicsConstants, StaticConfig, UserInput
from softbody_tpu.ops.stencil import LatticeSpec
from softbody_tpu.ops.farfield import (
    FarFieldSpec,
    empty_far_list,
    far_collision_terms,
    rebuild_far_list_planes,
)
from softbody_tpu.ops.farfield4 import (
    bucketed_far_delta_planes,
    far_terms_from_mirror,
    mirror_table,
    unmirror_table,
)
from softbody_tpu.ops.pallas.fused_substep2 import (
    fused_frame2_auto,
    fused_frame4,
    pack_lattice2,
    unpack_lattice2,
)

from test_farfield import hairpin

RADIUS = 4.0
FF = FarFieldSpec(max_pairs=64, max_tile_pairs=32, skin=4.0, horizon=8)
CFG = StaticConfig(subticks=8, collision_mode="allpairs",
                   particle_radius=RADIUS, force_mode="quantized")


def _fold_planes(w=32, h=32, seed=1):
    rng = np.random.default_rng(seed)
    px = np.abs(np.arange(w)[:, None] * 3.0 - 40.0) + 0.05 * rng.random(
        (w, h))
    px = np.broadcast_to(px, (w, h)).astype(np.float32).copy()
    py = (np.arange(h)[None, :] * 3.0 + 10.0
          + 0.05 * rng.random((w, h))).astype(np.float32)
    vx = rng.normal(0, 1, (w, h)).astype(np.float32)
    vy = rng.normal(0, 1, (w, h)).astype(np.float32)
    alive = np.ones((w, h), bool)
    alive[5, :4] = False
    return tuple(jnp.asarray(a) for a in (px, py, vx, vy, alive))


def test_mirror_roundtrip():
    rng = np.random.default_rng(0)
    planes = jnp.asarray(rng.normal(size=(5, 24, 40)).astype(np.float32))
    tab = mirror_table(planes)
    assert tab.shape == (2 * 6, 640)  # 2 lane blocks × 6 record columns
    back = unmirror_table(tab, w=24, h=40)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(planes))


def test_mirror_apply_matches_windowed_apply():
    """far_terms_from_mirror must reproduce far_collision_terms (the
    round-2 element-windowed apply) on a folded sheet — same pair math,
    different gather/scatter route, so equal up to f32 sum order at
    chunks shared by several pairs."""
    px, py, vx, vy, alive = _fold_planes()
    w, h = px.shape
    ff = FarFieldSpec(max_pairs=128, max_tile_pairs=32, skin=2.0,
                      horizon=8)
    fl = rebuild_far_list_planes(px, py, alive, s=2, ff=ff, radius=1.5,
                                 vx=vx, vy=vy, dt=1 / 64)
    assert int(fl.n_pairs) > 0
    ref = far_collision_terms(px, py, vx, vy, alive, fl, s=2, ff=ff,
                              radius=1.5, dt=1 / 64, ecoeff=0.75,
                              friction=0.1, world_h=h)
    tab = mirror_table(
        jnp.stack([px, py, vx, vy, alive.astype(jnp.float32)]))
    dtab = far_terms_from_mirror(tab, fl, s=2, ff=ff, radius=1.5,
                                 dt=1 / 64, ecoeff=0.75, friction=0.1,
                                 w=w, h=h)
    got = unmirror_table(dtab, w=w, h=h)
    for i in range(5):
        np.testing.assert_allclose(np.asarray(got[i]),
                                   np.asarray(ref[i]), rtol=0,
                                   atol=1e-5)


def test_bucketed_apply_zero_when_empty():
    px, py, vx, vy, alive = _fold_planes()
    w, h = px.shape
    fl = empty_far_list(w, h, FF)
    hotlike = jnp.stack([px, py, vx, vy])
    out = bucketed_far_delta_planes(hotlike, alive.astype(jnp.float32),
                                    fl, s=2, ff=FF, radius=1.5,
                                    dt=1 / 64, ecoeff=0.75, friction=0.1,
                                    w=w, h=h, buckets=(16,))
    assert float(jnp.abs(out).max()) == 0.0


def test_v4_frame_matches_v2_auto_on_fold():
    """Two frames of the folded strip: the v4 fixed-cadence frame must
    reproduce the v2 trigger-based auto frame's physics — with cadence =
    1 frame both paths rebuild from the same states, so candidate lists
    cover the same interacting pairs and forces agree to f32 sum order."""
    ls = hairpin()
    w, h = ls.shape
    spec = LatticeSpec(w, h, collision_stencil=2)
    consts, uin = PhysicsConstants.default(), UserInput.none()
    outs = {}
    for name in ("v2", "v4"):
        hot, obs, immut, ec = pack_lattice2(ls, tile_w=8)
        st = None
        if name == "v2":
            fl = empty_far_list(hot.shape[1], hot.shape[2], FF)
            for _ in range(2):
                hot, obs, fl, st = fused_frame2_auto(
                    hot, obs, immut, ec, fl, consts, uin, spec, CFG,
                    FF, tile_w=8, interpret=True)
            st = np.asarray(st)
        else:
            for _ in range(2):
                hot, obs, st = fused_frame4(
                    hot, obs, immut, ec, consts, uin, spec, CFG, FF,
                    tile_w=8, interpret=True, buckets=(16,))
            st = np.asarray(st)
        got = unpack_lattice2(hot, obs, ls)
        outs[name] = (np.asarray(got.pos), np.asarray(got.vel), st)
    assert np.isfinite(outs["v4"][0]).all()
    assert outs["v4"][2][0] == 1, "one rebuild per cadence block"
    assert outs["v4"][2][1] > 0, "v4 found no far pairs on the fold"
    assert outs["v4"][2][2] == 0, "capacity must not overflow here"
    np.testing.assert_allclose(outs["v4"][0], outs["v2"][0],
                               rtol=0, atol=5e-3)
    np.testing.assert_allclose(outs["v4"][1], outs["v2"][1],
                               rtol=0, atol=5e-2)


def test_v4_flat_cloth_no_pairs():
    """A flat falling cloth must produce zero candidate pairs (annulus
    and tiles see no index-distant proximity) and still step finitely."""
    from softbody_tpu.models import cloth_lattice

    ls, spec, cfg0 = cloth_lattice(w=32, h=24, spacing=12.0)
    cfg = dataclasses.replace(cfg0, subticks=8, particle_radius=4.0)
    consts, uin = PhysicsConstants.default(), UserInput.none()
    hot, obs, immut, ec = pack_lattice2(ls, tile_w=8)
    ffl = FarFieldSpec(max_pairs=64, max_tile_pairs=32, skin=4.0,
                       horizon=4)
    hot, obs, st = fused_frame4(hot, obs, immut, ec, consts, uin, spec,
                                cfg, ffl, tile_w=8, interpret=True,
                                buckets=(16,))
    st = np.asarray(st)
    got = unpack_lattice2(hot, obs, ls)
    assert np.isfinite(np.asarray(got.pos)).all()
    assert st[0] == 2, "8 substeps at cadence 4 = 2 rebuilds"
    assert st[1] == 0, f"flat cloth produced far pairs: {st}"


def test_narrow_apply_matches_mirror_apply():
    """The mirror-free narrow-row apply must reproduce the mirror-table
    apply (same pair math, different gather/scatter route)."""
    from softbody_tpu.ops.farfield4 import far_delta_planes_narrow

    px, py, vx, vy, alive = _fold_planes()
    w, h = px.shape
    ff = FarFieldSpec(max_pairs=128, max_tile_pairs=32, skin=2.0,
                      horizon=8)
    fl = rebuild_far_list_planes(px, py, alive, s=2, ff=ff, radius=1.5,
                                 vx=vx, vy=vy, dt=1 / 64)
    assert int(fl.n_pairs) > 0
    planes5 = jnp.stack([px, py, vx, vy, alive.astype(jnp.float32)])
    tab = mirror_table(planes5)
    dtab = far_terms_from_mirror(tab, fl, s=2, ff=ff, radius=1.5,
                                 dt=1 / 64, ecoeff=0.75, friction=0.1,
                                 w=w, h=h)
    ref = unmirror_table(dtab, w=w, h=h)
    got = far_delta_planes_narrow(planes5, fl, s=2, ff=ff, radius=1.5,
                                  dt=1 / 64, ecoeff=0.75, friction=0.1,
                                  w=w, h=h)
    for i in range(5):
        np.testing.assert_allclose(np.asarray(got[i]),
                                   np.asarray(ref[i]), rtol=0,
                                   atol=1e-5)


def test_backend_far_buckets_override():
    """FusedLatticeBackend(far_buckets=...) must plumb a custom apply
    bucket ladder into fused_frame4 and produce the same physics as the
    default ladder (bucket choice only changes the crop capacity the
    apply runs at, never which valid pairs contribute)."""
    from softbody_tpu.engine.backends import FusedLatticeBackend

    ls = hairpin()
    w, h = ls.shape
    spec = LatticeSpec(w, h, collision_stencil=2)
    consts, uin = PhysicsConstants.default(), UserInput.none()
    outs = {}
    for name, bk in (("default", None), ("single", (16,))):
        backend = FusedLatticeBackend(spec, CFG, farfield=FF, tile_w=8,
                                      far_buckets=bk)
        st = backend.pack_state(ls)
        st = backend.step(st, consts, uin)
        got = backend.unpack_state(st)
        stats = backend.far_stats()
        assert stats["far_pairs"] > 0, f"{name}: no far pairs on fold"
        outs[name] = np.asarray(got.pos)
        assert np.isfinite(outs[name]).all()
    np.testing.assert_allclose(outs["single"], outs["default"],
                               rtol=0, atol=1e-4)


def test_activation_schedule_conservative_under_linear_motion():
    """pair_activation's per-substep active prefix must cover every pair
    the full apply finds to contribute, at every substep of the cadence
    block.  Positions evolve EXACTLY linearly (p += v·dt), which is
    inside the schedule's contract (zero deviation from the linear
    reference), so the gated apply must equal the full apply at every
    substep — not just approximately cover it."""
    from softbody_tpu.ops.farfield import rebuild_far_list_planes_active
    from softbody_tpu.ops.farfield4 import far_delta_planes_narrow

    px, py, vx, vy, alive = _fold_planes(seed=3)
    # amplify approach speeds so some pairs activate mid-block
    vx, vy = vx * 40.0, vy * 40.0
    w, h = px.shape
    ff = FarFieldSpec(max_pairs=128, max_tile_pairs=32, skin=2.0,
                      horizon=8)
    R, dt = 8, 1 / 64
    fl, n_act = rebuild_far_list_planes_active(
        px, py, alive, s=2, ff=ff, radius=1.5, vx=vx, vy=vy, dt=dt, R=R)
    n_act = np.asarray(n_act)
    assert int(fl.n_pairs) > 0
    assert (np.diff(n_act) >= 0).all(), "active counts must be monotone"
    assert n_act[-1] <= int(fl.n_pairs)
    kw = dict(s=2, ff=ff, radius=1.5, dt=dt, ecoeff=0.75, friction=0.1,
              w=w, h=h)
    k = fl.capacity
    for s in range(R):
        planes5 = jnp.stack([px + vx * (dt * s), py + vy * (dt * s),
                             vx, vy, alive.astype(jnp.float32)])
        full = far_delta_planes_narrow(planes5, fl, **kw)
        fl_s = dataclasses.replace(
            fl, n_pairs=jnp.int32(n_act[s]),
            valid=fl.valid & (jnp.arange(k) < n_act[s]))
        gated = far_delta_planes_narrow(planes5, fl_s, **kw)
        np.testing.assert_allclose(np.asarray(gated), np.asarray(full),
                                   rtol=0, atol=1e-5,
                                   err_msg=f"substep {s}: gated apply "
                                   f"lost contributions "
                                   f"(n_act={n_act[s]}/{int(fl.n_pairs)})")


def test_v4_frame_activation_on_off_parity():
    """fused_frame4 with the activation schedule must reproduce the
    ungated frame bit-for-bit up to f32 scatter order (gated pairs
    contribute exactly zero) on the folding hairpin."""
    ls = hairpin()
    w, h = ls.shape
    spec = LatticeSpec(w, h, collision_stencil=2)
    consts, uin = PhysicsConstants.default(), UserInput.none()
    outs = {}
    for act in (False, True):
        hot, obs, immut, ec = pack_lattice2(ls, tile_w=8)
        for _ in range(2):
            hot, obs, st = fused_frame4(
                hot, obs, immut, ec, consts, uin, spec, CFG, FF,
                tile_w=8, interpret=True, buckets=(4, 16),
                activation=act)
        got = unpack_lattice2(hot, obs, ls)
        outs[act] = (np.asarray(got.pos), np.asarray(got.vel),
                     np.asarray(st))
    assert outs[True][2][1] > 0, "no far pairs on the fold"
    np.testing.assert_allclose(outs[True][0], outs[False][0],
                               rtol=0, atol=1e-4)
    np.testing.assert_allclose(outs[True][1], outs[False][1],
                               rtol=0, atol=1e-3)


def test_v4_overflow_accounted():
    """With a deliberately tiny pair capacity the fold must report
    nonzero overflow through the frame stats (the reference never drops
    a pair, compute.wgsl:144-170 — so dropped candidates MUST be
    visible, VERDICT r2 #2)."""
    ls = hairpin()
    w, h = ls.shape
    spec = LatticeSpec(w, h, collision_stencil=2)
    consts, uin = PhysicsConstants.default(), UserInput.none()
    tiny = FarFieldSpec(max_pairs=4, max_tile_pairs=4, skin=4.0,
                        horizon=8)
    hot, obs, immut, ec = pack_lattice2(ls, tile_w=8)
    hot, obs, st = fused_frame4(hot, obs, immut, ec, consts, uin, spec,
                                CFG, tiny, tile_w=8, interpret=True,
                                buckets=(4,))
    st = np.asarray(st)
    assert st[1] == 4, f"capacity should saturate: {st}"
    assert st[2] > 0, f"dropped candidates must be counted: {st}"


def test_mirror_mb128_matches_mb32():
    """The 128-lane record variant (coarse+fine two-stage selects) must
    reproduce the 32-lane apply bit-for-bit: only the gather/select
    routing differs, every arithmetic path sees identical operands."""
    px, py, vx, vy, alive = _fold_planes()
    w, h = px.shape
    ff = FarFieldSpec(max_pairs=128, max_tile_pairs=32, skin=2.0,
                      horizon=8)
    fl = rebuild_far_list_planes(px, py, alive, s=2, ff=ff, radius=1.5,
                                 vx=vx, vy=vy, dt=1 / 64)
    assert int(fl.n_pairs) > 0
    planes = jnp.stack([px, py, vx, vy, alive.astype(jnp.float32)])

    def via(mb):
        tab = mirror_table(planes, mb=mb)
        back = unmirror_table(tab, w=w, h=h, mb=mb)
        np.testing.assert_array_equal(np.asarray(back),
                                      np.asarray(planes))
        dtab = far_terms_from_mirror(tab, fl, s=2, ff=ff, radius=1.5,
                                     dt=1 / 64, ecoeff=0.75,
                                     friction=0.1, w=w, h=h, mb=mb)
        return np.asarray(unmirror_table(dtab, w=w, h=h, mb=mb))

    np.testing.assert_array_equal(via(128), via(32))


def test_backend_far_mb128_frame_parity():
    """fused_frame4 with far_mb=128 equals far_mb=32 on a folding scene
    (allclose: the scatter-add into a different record partition can
    reassociate f32 sums at chunks shared by several pairs)."""
    from softbody_tpu.models import tearing_cloth_lattice
    from softbody_tpu.engine.backends import FusedLatticeBackend
    from softbody_tpu import PhysicsConstants, UserInput

    lstate, spec, cfg, consts = tearing_cloth_lattice(
        n_particles=32 * 32, spring=2.0, damp=0.2, fall_speed=10.0,
        slits=2, strain_limit=0.22, yield_strain=0.18)
    w, _h = lstate.shape
    spacing = 980.0 / (w - 1)
    ff = FarFieldSpec(max_pairs=512, max_tile_pairs=128,
                      skin=0.75 * spacing, horizon=8)
    uin = UserInput.none()
    outs = []
    for mb in (32, 128):
        backend = FusedLatticeBackend(spec, cfg, farfield=ff, tile_w=8,
                                      far_mb=mb)
        state = backend.pack_state(lstate)
        for _ in range(3):
            state = backend.step(state, consts, uin)
        ext = backend.extract(state)
        outs.append(np.asarray(ext[0]))
    np.testing.assert_allclose(outs[0], outs[1], rtol=0, atol=1e-4)


def test_mirror_mbout128_matches_mb32():
    """Hybrid apply (gather at mb=32, delta scatter at mb_out=128) must
    reproduce the pure-32 delta planes bit-for-bit."""
    px, py, vx, vy, alive = _fold_planes()
    w, h = px.shape
    ff = FarFieldSpec(max_pairs=128, max_tile_pairs=32, skin=2.0,
                      horizon=8)
    fl = rebuild_far_list_planes(px, py, alive, s=2, ff=ff, radius=1.5,
                                 vx=vx, vy=vy, dt=1 / 64)
    assert int(fl.n_pairs) > 0
    planes = jnp.stack([px, py, vx, vy, alive.astype(jnp.float32)])
    tab = mirror_table(planes, mb=32)
    kwargs = dict(s=2, ff=ff, radius=1.5, dt=1 / 64, ecoeff=0.75,
                  friction=0.1, w=w, h=h)
    d32 = unmirror_table(
        far_terms_from_mirror(tab, fl, mb=32, **kwargs), w=w, h=h,
        mb=32)
    dh = unmirror_table(
        far_terms_from_mirror(tab, fl, mb=32, mb_out=128, **kwargs),
        w=w, h=h, mb=128)
    np.testing.assert_array_equal(np.asarray(dh), np.asarray(d32))


def test_frame4_kernel_detect_matches_xla_detect():
    """fused_frame4 detect_mode="kernel" (side-output detection at
    cadence boundaries, no trigger machinery) must match the XLA
    detection path on a folding/tearing scene.  Lists may order pairs
    differently (f32 scatter order at shared chunks), so trajectories
    compare with allclose; the side-vs-XLA detection itself is
    parity-exact (raw_planes_from_side ∘ kernel_side_from_planes ==
    raw_chunk_planes, tested in test_fused3).

    Runs in a SUBPROCESS: the kdetect frame is the largest compiled
    graph in the suite (~100k StableHLO lines, two Mosaic bodies) and
    reproducibly segfaults the CPU XLA compiler when compiled late in
    a long-lived pytest process (heap-state-dependent compiler bug —
    the same program compiles fine in a fresh process; a 128 MB stack
    did not help)."""
    import subprocess
    import sys

    driver = r"""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from softbody_tpu.models import tearing_cloth_lattice
from softbody_tpu.engine.backends import FusedLatticeBackend
from softbody_tpu.ops.farfield import FarFieldSpec
from softbody_tpu import UserInput

lstate, spec, cfg, consts = tearing_cloth_lattice(
    n_particles=32 * 32, spring=2.0, damp=0.2, fall_speed=10.0,
    slits=2, strain_limit=0.22, yield_strain=0.18)
w, _h = lstate.shape
spacing = 980.0 / (w - 1)
ff = FarFieldSpec(max_pairs=512, max_tile_pairs=128,
                  skin=0.75 * spacing, horizon=8)
uin = UserInput.none()
outs, stats = [], []
for mode in ("xla", "kernel"):
    backend = FusedLatticeBackend(spec, cfg, farfield=ff, tile_w=8,
                                  far_detect=mode)
    state = backend.pack_state(lstate)
    for _ in range(3):
        state = backend.step(state, consts, uin)
    stats.append(backend.far_stats())
    ext = backend.extract(state)
    outs.append(np.asarray(ext[0]))
# same rebuild cadence; kernel-side detection is 1 substep staler
# with a +1-substep extrusion window, so pair counts may differ
# slightly but never drop candidates (superset-sound)
assert stats[1]["far_rebuilds"] == stats[0]["far_rebuilds"], stats
assert stats[1]["far_overflow"] == 0, stats
np.testing.assert_allclose(outs[0], outs[1], rtol=0, atol=1e-4)
print("KDETECT_PARITY_OK")
"""
    import os

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run([sys.executable, "-c", driver], cwd=repo,
                       env=env, capture_output=True, text=True,
                       timeout=1800)
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])
    assert "KDETECT_PARITY_OK" in r.stdout, r.stdout[-2000:]


@pytest.mark.parametrize("extra", [("lanecut",), ("inbuf3",),
                                   ("outfull",), ("lanecut", "inbuf3"),
                                   ("kmirror",), ("lanecut", "kmirror"),
                                   ("krec",), ("lanecut", "krec"),
                                   ("ealpack",), ("lanecut", "ealpack"),
                                   ("lanecut", "krec", "ealpack")])
def test_pipeline_layout_kvars_bit_exact(extra):
    """Layout/pipeline kernel variants must be BIT-exact vs the default
    path: "lanecut" (no bottom lane pad; −dy halos via zero-filled
    rotations), "inbuf3" (3-deep input buffering), "outfull"
    (full-lane-row output DMA), "kmirror" (kernel-produced far-apply
    mirror records — a pure relayout of the same state, gathered by the
    same apply) change only where bytes live / when DMAs issue, never a
    computed value.  Far-armed v4 frame on a folding scene."""
    from softbody_tpu.models import tearing_cloth_lattice
    from softbody_tpu.engine.backends import FusedLatticeBackend

    lstate, spec, cfg, consts = tearing_cloth_lattice(
        n_particles=32 * 32, spring=2.0, damp=0.2, fall_speed=10.0,
        slits=2, strain_limit=0.22, yield_strain=0.18)
    w, _h = lstate.shape
    spacing = 980.0 / (w - 1)
    ff = FarFieldSpec(max_pairs=512, max_tile_pairs=128,
                      skin=0.75 * spacing, horizon=8)
    uin = UserInput.none()
    base = ("rollgroup", "rsqrt", "dexp2")
    outs = []
    for kv in (base, base + extra):
        backend = FusedLatticeBackend(spec, cfg, farfield=ff, tile_w=8,
                                      kernel_variants=kv)
        state = backend.pack_state(lstate)
        for _ in range(3):
            state = backend.step(state, consts, uin)
        out = backend.unpack_state(state)
        outs.append(out)
    for a, b in zip(jax.tree_util.tree_leaves(outs[0]),
                    jax.tree_util.tree_leaves(outs[1])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_krec_dropped_for_small_bucket_ladders():
    """krec skips the narrow small-bucket apply variant, which would
    change the f32 collision scatter-add ORDER for ladders containing a
    bucket ≤ 256 — the backend drops krec (keeping kmirror) there so
    its bit-exactness contract holds for every ladder (ADVICE r4)."""
    from softbody_tpu.models import tearing_cloth_lattice
    from softbody_tpu.engine.backends import FusedLatticeBackend

    _lstate, spec, cfg, _consts = tearing_cloth_lattice(
        n_particles=16 * 16)
    ff = FarFieldSpec(max_pairs=512, max_tile_pairs=128, skin=4.0,
                      horizon=8)
    kv = ("rollgroup", "lanecut", "kmirror", "krec")
    small = FusedLatticeBackend(spec, cfg, farfield=ff, tile_w=8,
                                kernel_variants=kv,
                                far_buckets=(256, 512))
    assert "krec" not in small.kvar and "kmirror" in small.kvar
    ok = FusedLatticeBackend(spec, cfg, farfield=ff, tile_w=8,
                             kernel_variants=kv, far_buckets=(512,))
    assert "krec" in ok.kvar


def test_thin_sublane_halo_rejected():
    """Mosaic pins HBM sublane DMA offsets to multiples of 8, so a
    thin sublane halo (the measured "padw4" dead end — bench_sweep r4)
    must be rejected up front with a clear error, not die in the
    remote compiler."""
    from softbody_tpu.ops.pallas.fused_substep2 import (
        fused_substep2_call, pack_lattice2)
    from softbody_tpu.models import tearing_cloth_lattice

    lstate, _spec, _cfg, _consts = tearing_cloth_lattice(
        n_particles=16 * 16)
    hot, _obs, immut, _ec = pack_lattice2(lstate, tile_w=8, pad_w=4)
    cvec = jnp.zeros(40, jnp.float32)
    with pytest.raises(ValueError, match="multiple of 8"):
        fused_substep2_call(hot, immut, cvec, w=16, h=128, stencil=2,
                            quantized=True, tile_w=8, interpret=True,
                            pad_w=4)
