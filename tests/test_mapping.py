"""SceneRegistry (CPU object registry) tests — add/remove/adjacency/IDs
(≙ BufferMapper behavior, engineMapping.ts:432-495)."""

import numpy as np

from softbody_tpu.mapping import BeamObj, ParticleObj, SceneRegistry, Vec2


def test_add_remove_and_adjacency():
    reg = SceneRegistry()
    assert reg.add_particle(ParticleObj(0, Vec2(10, 20)))
    assert reg.add_particle(ParticleObj(1, Vec2(30, 40)))
    assert not reg.add_particle(ParticleObj(1, Vec2(0, 0)))  # duplicate id
    assert reg.add_beam(BeamObj(0, 0, 1, length=25.0, spring=5.0))
    assert {b.id for b in reg.connected_beams(0)} == {0}
    assert {b.id for b in reg.connected_beams(1)} == {0}
    assert reg.remove_beam(0)
    assert not reg.remove_beam(0)
    assert reg.connected_beams(0) == set()
    assert reg.remove_particle(1)
    assert reg.particle_count == 1


def test_first_empty_ids():
    reg = SceneRegistry()
    for i in range(3):
        reg.add_particle(ParticleObj(i, Vec2()))
    assert reg.first_empty_particle_id == 3
    reg.remove_particle(1)
    assert reg.first_empty_particle_id == 1
    assert reg.first_empty_beam_id == 0


def test_capacity_limits():
    reg = SceneRegistry(max_particles=2, max_beams=1)
    assert reg.add_particle(ParticleObj(0, Vec2()))
    assert reg.add_particle(ParticleObj(1, Vec2()))
    assert not reg.add_particle(ParticleObj(2, Vec2()))
    assert reg.first_empty_particle_id == -1
    assert reg.add_beam(BeamObj(0, 0, 1, length=1.0))
    assert not reg.add_beam(BeamObj(1, 0, 1, length=1.0))


def test_state_roundtrip():
    reg = SceneRegistry()
    reg.add_particle(ParticleObj(0, Vec2(100, 100), Vec2(1, 2)))
    reg.add_particle(ParticleObj(5, Vec2(200, 150)))  # sparse ids ok
    reg.add_beam(BeamObj(3, 0, 5, length=111.8, spring=7.0, damp=0.5,
                         yield_strain=0.3, strain_limit=1.5))
    state = reg.to_state()
    assert int(state.particle_count) == 2
    assert int(state.beam_count) == 1

    reg2 = SceneRegistry()
    reg2.load_state(state)
    assert reg2.particle_count == 2
    assert reg2.beam_count == 1
    b = reg2.beams[0]
    assert abs(b.length - 111.8) < 1e-4
    assert b.spring == 7.0
    # beam endpoints remapped to dense ids but still connect the same points
    pa, pb = reg2.find_particle(b.a), reg2.find_particle(b.b)
    assert {(round(pa.position.x), round(pa.position.y)),
            (round(pb.position.x), round(pb.position.y))} == {(100, 100), (200, 150)}


def test_snapshot_save_load_via_registry():
    reg = SceneRegistry()
    reg.add_particle(ParticleObj(0, Vec2(50, 60)))
    reg.add_particle(ParticleObj(1, Vec2(70, 80), Vec2(-1, 1)))
    reg.add_beam(BeamObj(0, 0, 1, length=28.28, spring=3.0))
    buf = reg.save()
    reg2 = SceneRegistry()
    assert reg2.load(buf)
    assert reg2.particle_count == 2 and reg2.beam_count == 1
    assert abs(reg2.find_particle(1).velocity.x - (-1)) < 1e-6

    small = SceneRegistry(max_particles=1)
    assert not small.load(buf)  # too big → False like engineMapping.ts:418


def test_dangling_beam_dropped_on_flatten():
    reg = SceneRegistry()
    reg.add_particle(ParticleObj(0, Vec2(1, 1)))
    reg.add_particle(ParticleObj(1, Vec2(2, 2)))
    reg.add_beam(BeamObj(0, 0, 1, length=1.4))
    reg.remove_particle(1)  # beam 0 now dangling ("invalid beam")
    a = reg.to_arrays()
    assert a["beams"].shape[0] == 0


def test_turn_direction():
    p, q = Vec2(0, 0), Vec2(10, 0)
    assert Vec2.turn_direction(p, q, Vec2(5, 5)) != Vec2.turn_direction(p, q, Vec2(5, -5))
    assert Vec2.turn_direction(p, q, Vec2(5, 0)) == 0
