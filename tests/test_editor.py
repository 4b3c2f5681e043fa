"""Editor tests: action state machine, hit testing, selection, snapping,
auto-triangulation, painting — semantics of editor.ts."""

import numpy as np

from softbody_tpu.editor import BeamSettings, SoftbodyEditor
from softbody_tpu.mapping import BeamObj, ParticleObj, SceneRegistry, Vec2


def editor_with(mode="particle", **particles):
    ed = SoftbodyEditor()
    ed.set_edit_mode(mode)
    for pid, (x, y) in particles.items():
        ed.registry.add_particle(ParticleObj(int(pid), Vec2(x, y)))
    return ed


def test_add_particle_with_fling():
    ed = editor_with("particle")
    ed.pointer_down(Vec2(200, 300))
    ed.pointer_up(Vec2(240, 330))  # drag sets velocity (editor.ts:310-313)
    assert ed.registry.particle_count == 1
    p = ed.registry.particles[0]
    assert (p.position.x, p.position.y) == (200, 300)
    assert (p.velocity.x, p.velocity.y) == (40, 30)


def test_add_particle_snap_to_grid():
    ed = editor_with("particle")
    ed.snap_grid_size = 50.0
    ed.pointer_down(Vec2(173, 281))
    ed.pointer_up(Vec2(173, 281))
    p = ed.registry.particles[0]
    # snapped to r + k·g grid: 10 + k*50
    assert (p.position.x - 10) % 50 == 0
    assert (p.position.y - 10) % 50 == 0


def test_move_particle():
    ed = editor_with("particle", **{"0": (300, 300)})
    ed.pointer_down(Vec2(302, 301))  # within hit margin of particle 0
    ed.pointer_move(Vec2(350, 340))
    ed.pointer_up(Vec2(350, 340))
    p = ed.registry.find_particle(0)
    assert abs(p.position.x - 348) < 1e-6  # original + drag delta
    assert abs(p.position.y - 339) < 1e-6
    assert ed.registry.particle_count == 1  # no accidental add


def test_delete_particle_removes_connected_beams():
    ed = editor_with("particle", **{"0": (300, 300), "1": (400, 300)})
    ed.registry.add_beam(BeamObj(0, 0, 1, length=100.0))
    ed.delete_mode = True
    ed.pointer_down(Vec2(300, 300))
    ed.pointer_up(Vec2(300, 300))
    assert ed.registry.particle_count == 1
    assert ed.registry.beam_count == 0


def test_add_beam_between_existing_particles():
    ed = editor_with("beam", **{"0": (300, 300), "1": (420, 300)})
    ed.beam_settings = BeamSettings(spring=7.0, damp=3.0, yield_strain=0.4,
                                    strain_limit=1.5)
    ed.pointer_down(Vec2(301, 300))   # start on particle 0
    ed.pointer_move(Vec2(419, 301))   # drag to particle 1
    ed.pointer_up(Vec2(419, 301))
    assert ed.registry.particle_count == 2  # endpoint merged, not added
    assert ed.registry.beam_count == 1
    b = ed.registry.beams[0]
    assert {b.a, b.b} == {0, 1}
    assert abs(b.length - 120.0) < 1.0
    assert b.spring == 7.0 and b.damp == 3.0


def test_add_beam_in_empty_space_creates_two_particles():
    ed = editor_with("beam")
    ed.pointer_down(Vec2(500, 500))
    ed.pointer_move(Vec2(600, 500))
    ed.pointer_up(Vec2(600, 500))
    assert ed.registry.particle_count == 2
    assert ed.registry.beam_count == 1
    assert abs(ed.registry.beams[0].length - 100.0) < 1e-3


def test_paint_beam_settings():
    ed = editor_with("beam", **{"0": (300, 300), "1": (500, 300)})
    ed.registry.add_beam(BeamObj(0, 0, 1, length=200.0, spring=1.0))
    ed.beam_settings = BeamSettings(spring=99.0, damp=9.0, yield_strain=0.9,
                                    strain_limit=2.0)
    ed.force_add_mode = False
    ed.pointer_down(Vec2(400, 301))  # hover over the beam midpoint
    ed.pointer_up(Vec2(400, 301))
    assert ed.registry.beams[0].spring == 99.0


def test_rect_select_particles_and_group_move():
    ed = editor_with(
        "particle", **{"0": (200, 200), "1": (250, 250), "2": (800, 800)}
    )
    ed.select_mode = True
    ed.pointer_down(Vec2(150, 150))
    ed.pointer_move(Vec2(300, 300))
    ed.pointer_up(Vec2(300, 300))
    ed.select_mode = False
    assert {p.id for p in ed.selected_particles} == {0, 1}
    # group move by grabbing a selected particle
    ed.pointer_down(Vec2(200, 200))
    ed.pointer_move(Vec2(220, 210))
    ed.pointer_up(Vec2(220, 210))
    assert abs(ed.registry.find_particle(1).position.x - 270) < 1e-6
    assert abs(ed.registry.find_particle(2).position.x - 800) < 1e-6


def test_rect_select_beams_by_intersection():
    """A beam crossing the box with both endpoints outside must select
    (segment-rect intersection, editor.ts:413-432)."""
    ed = editor_with("beam", **{"0": (100, 500), "1": (900, 500)})
    ed.registry.add_beam(BeamObj(0, 0, 1, length=800.0))
    ed.select_mode = True
    ed.pointer_down(Vec2(450, 400))
    ed.pointer_move(Vec2(550, 600))
    ed.pointer_up(Vec2(550, 600))
    assert len(ed.selected_beams) == 1


def test_delete_selected_via_key():
    ed = editor_with("particle", **{"0": (200, 200), "1": (210, 210)})
    ed.select_mode = True
    ed.pointer_down(Vec2(150, 150))
    ed.pointer_move(Vec2(300, 300))
    ed.pointer_up(Vec2(300, 300))
    ed.select_mode = False
    ed.key("delete")
    assert ed.registry.particle_count == 0


def test_reset_beam_rest_state_key_r():
    ed = editor_with("beam", **{"0": (300, 300), "1": (500, 300)})
    b = BeamObj(0, 0, 1, length=150.0, target_length=170.0, last_length=160.0)
    ed.registry.add_beam(b)
    ed.selected_beams = {b}
    ed.key("r")
    assert b.length == 200.0
    assert b.target_length == 200.0


def test_auto_triangulation():
    ed = editor_with("beam", **{"0": (300, 300), "1": (360, 300), "2": (330, 350)})
    ed.auto_triangulate_distance = 100.0
    ed.force_add_mode = True  # endpoint stays a fresh particle
    ed.pointer_down(Vec2(330, 320))
    ed.pointer_move(Vec2(330, 320))
    ed.pointer_up(Vec2(330, 320))
    # new beam + triangulated beams to all 3 nearby particles (0 is beam.a;
    # targets exclude a and the endpoint itself)
    assert ed.registry.beam_count >= 3


def test_camera_zoom_clamped():
    ed = SoftbodyEditor()
    ed.zoom(100.0)
    assert ed.camera.s == 10.0
    ed.zoom(0.001)
    assert ed.camera.s == 1.0
    ed.pan(Vec2(500, 500))
    assert ed.camera.p.x == 0.0  # clamped: zoom 1 shows the whole world


def test_editor_engine_roundtrip():
    """Edit → save → engine-ready state → back (the mode-switch loop,
    SURVEY.md §3.5)."""
    from softbody_tpu.snapshot import load_snapshot

    ed = editor_with("beam", **{"0": (300, 500), "1": (420, 500)})
    ed.pointer_down(Vec2(301, 500))
    ed.pointer_move(Vec2(419, 500))
    ed.pointer_up(Vec2(419, 500))
    buf = ed.save()
    state, consts = load_snapshot(buf)
    assert int(state.particle_count) == 2
    assert int(state.beam_count) == 1

    ed2 = SoftbodyEditor()
    assert ed2.load(buf)
    assert ed2.registry.beam_count == 1


def test_render_overlay_visuals():
    """Visual feedback layer (≙ drawFrame, editor.ts:575-854): snap grid,
    red velocity vectors, dashed-magenta invalid beams, selection
    outlines, HUD text — asserted on rendered fixtures."""
    ed = SoftbodyEditor()
    ed.set_edit_mode("particle")
    reg = ed.registry
    reg.add_particle(ParticleObj(0, Vec2(200, 500), Vec2(150, 0)))
    reg.add_particle(ParticleObj(1, Vec2(600, 500)))
    reg.add_beam(BeamObj(10, 0, 1))
    # dangling beam: endpoint 99 doesn't exist → dashed magenta
    reg.add_beam(BeamObj(11, 1, 99))
    ed.selected_particles = {reg.find_particle(1)}
    ed.snap_grid_size = 100.0

    img = ed.render(resolution=256)
    assert img.shape == (256, 256, 3)
    flat = img.reshape(-1, 3)
    # magenta pixels from the invalid beam
    assert ((flat[:, 0] > 200) & (flat[:, 1] < 60) & (flat[:, 2] > 200)).any()
    # pure red pixels from the velocity vector
    assert ((flat[:, 0] > 200) & (flat[:, 1] < 60) & (flat[:, 2] < 60)).any()
    # cyan selection outline
    assert ((flat[:, 0] < 60) & (flat[:, 1] > 200) & (flat[:, 2] > 200)).any()
    # snap grid gray
    assert (flat == (85, 85, 85)).all(-1).any()
    # HUD text pixels present (white, top rows)
    top = img[:24].reshape(-1, 3)
    assert (top == (255, 255, 255)).all(-1).any()

    # overlay off → none of the overlay colors
    img2 = ed.render(resolution=256, overlay=False)
    flat2 = img2.reshape(-1, 3)
    assert not ((flat2[:, 0] > 200) & (flat2[:, 1] < 60) & (flat2[:, 2] > 200)).any()
    assert not (flat2 == (85, 85, 85)).all(-1).any()


def test_draw_text_and_line_primitives():
    from softbody_tpu.viz import draw_line, draw_text

    img = np.zeros((64, 64, 3), np.uint8)
    draw_text(img, (2, 2), "AB 12:", (255, 255, 255), scale=1)
    assert (img == 255).any()
    img2 = np.zeros((64, 64, 3), np.uint8)
    draw_line(img2, (0, 0), (63, 63), (0, 255, 0))
    assert (img2[32, 32] == (0, 255, 0)).all()
    img3 = np.zeros((64, 64, 3), np.uint8)
    draw_line(img3, (0, 32), (63, 32), (255, 255, 255), dash=(6, 6))
    row = img3[32, :, 0]
    assert row.any() and not row.all()  # dashed: gaps exist
