"""Incidence-gather force accumulation must equal segment-sum scatter, and
the quantized mode must be exactly order-independent (the property the
reference buys with i32 atomics, compute.wgsl:68-70)."""

import numpy as np

import jax.numpy as jnp

from softbody_tpu import StaticConfig, state_from_numpy
from softbody_tpu.ops.forces import accumulate_forces, beam_forces
from softbody_tpu.ops.incidence import build_incidence


def lattice(n_side=6, d=30.0):
    pos = []
    beams = []
    for x in range(n_side):
        for y in range(n_side):
            pos.append([100 + x * d, 100 + y * d])
            b = x * n_side + y
            if y < n_side - 1:
                beams.append([b, b + 1])
            if x < n_side - 1:
                beams.append([b, b + n_side])
    return np.array(pos, np.float32), np.array(beams, np.int32)


def test_incidence_table_structure():
    pos, beams = lattice()
    inc_beam, inc_sign = build_incidence(beams[:, 0], beams[:, 1], len(pos))
    # every beam appears exactly twice (once per endpoint, opposite signs)
    m = len(beams)
    counts = np.zeros(m, int)
    sign_sums = np.zeros(m, int)
    for i in range(inc_beam.shape[0]):
        for k in range(inc_beam.shape[1]):
            if inc_sign[i, k] != 0:
                counts[inc_beam[i, k]] += 1
                sign_sums[inc_beam[i, k]] += inc_sign[i, k]
                assert beams[inc_beam[i, k], 0 if inc_sign[i, k] < 0 else 1] == i
    assert (counts == 2).all()
    assert (sign_sums == 0).all()


def test_incidence_matches_segment_sum():
    pos, beams = lattice()
    rng = np.random.default_rng(0)
    pos = pos + rng.normal(0, 5, pos.shape).astype(np.float32)
    for mode in ("segment", "quantized"):
        cfg = StaticConfig(force_mode=mode)
        s_inc = state_from_numpy(pos, beams=beams, beam_spring=25.0,
                                 build_incidence=True)
        s_seg = state_from_numpy(pos, beams=beams, beam_spring=25.0,
                                 build_incidence=False)
        fvec, _, _ = beam_forces(s_inc, cfg)
        f_inc = accumulate_forces(s_inc, fvec, cfg)
        f_seg = accumulate_forces(s_seg, fvec, cfg)
        np.testing.assert_allclose(np.asarray(f_inc), np.asarray(f_seg),
                                   atol=1e-4, err_msg=mode)


def test_quantized_exactly_permutation_invariant():
    """Shuffling beam order must give bit-identical quantized force sums."""
    pos, beams = lattice()
    rng = np.random.default_rng(1)
    pos = pos + rng.normal(0, 4, pos.shape).astype(np.float32)
    cfg = StaticConfig(force_mode="quantized")

    perm = rng.permutation(len(beams))
    s1 = state_from_numpy(pos, beams=beams, beam_spring=13.7, build_incidence=True)
    s2 = state_from_numpy(pos, beams=beams[perm], beam_spring=13.7,
                          build_incidence=True)
    f1 = accumulate_forces(s1, beam_forces(s1, cfg)[0], cfg)
    f2 = accumulate_forces(s2, beam_forces(s2, cfg)[0], cfg)
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))
