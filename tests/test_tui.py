"""Terminal viewer (tui.py): headless rasterizer + ANSI encoding + a
non-interactive play() smoke test over a live engine."""

import io

import numpy as np

from softbody_tpu.tui import frame_to_ansi, rasterize, stress_rgb


def packet_arrays():
    pos = np.array([[100.0, 100.0], [900.0, 900.0], [500.0, 500.0]],
                   np.float32)
    alive = np.array([True, True, False])
    beam_a = np.array([0], np.int32)
    beam_b = np.array([1], np.int32)
    beam_alive = np.array([True])
    strain = np.array([0.0], np.float32)
    stress = np.array([0.0], np.float32)
    return pos, alive, beam_a, beam_b, beam_alive, strain, stress


def test_rasterize_draws_particles_beams_cursor():
    img = rasterize(*packet_arrays(), 80, 40,
                    cursor=(500.0, 500.0), grabbing=False)
    assert img.shape == (40, 80, 3)
    # particle pixels (world y flipped): (100,100) → lower-left region
    assert (img[int(40 - 1 - 100 * 40 / 1000), int(100 * 80 / 1000)]
            == (230, 230, 230)).all()
    # dead particle at center is not drawn white, but the cursor cross is
    assert (img == (255, 255, 0)).all(-1).any()
    # the beam leaves colored pixels between the endpoints
    assert (img.sum(-1) > 0).sum() > 10


def test_stress_rgb_law():
    # unstressed: white-ish (r=1,g=1,b=1); compressed (stress −1): r=0
    c = stress_rgb(np.array([0.0, -1.0, 1.0]), np.array([0.0, 0.0, 1.0]))
    assert (c[0] == (255, 255, 255)).all()
    assert c[1][0] == 0 and c[1][1] == 255
    assert c[2][1] == 0 and c[2][2] == 0


def test_frame_to_ansi_half_blocks():
    img = np.zeros((4, 3, 3), np.uint8)
    img[0, :, 0] = 255  # top row red
    s = frame_to_ansi(img)
    lines = s.split("\n")
    assert len(lines) == 2  # 4 pixel rows → 2 text rows
    assert "▀" in lines[0]
    assert "38;2;255;0;0" in lines[0]
    assert s.endswith("\x1b[0m")


def test_play_smoke_headless():
    """Non-interactive play(): drives a real engine for ~1 second and
    emits ANSI frames with a HUD."""
    from softbody_tpu.engine.engine import Engine
    from softbody_tpu.engine.protocol import EngineOptions
    from softbody_tpu.models import SCENES
    from softbody_tpu.tui import play

    state, cfg = SCENES["cloth"](w=6, h=6)
    eng = Engine(state, options=EngineOptions(
        subticks=8, particle_radius=cfg.particle_radius,
        collision_mode="grid",
    ))
    buf = io.StringIO()
    try:
        play(eng, fps=10.0, duration=1.2, out=buf)
    finally:
        eng.destroy()
    s = buf.getvalue()
    assert "▀" in s
    assert "substeps/s" in s
    assert "\x1b[?25h" in s  # cursor restored on exit
