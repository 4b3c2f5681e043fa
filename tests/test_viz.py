"""Renderer tests: SDF particles, stress/strain beam colors, trails
(≙ render.wgsl semantics)."""

import numpy as np

import jax.numpy as jnp

from softbody_tpu import StaticConfig, state_from_numpy
from softbody_tpu.viz import render_frame, render_state, save_png


def render(pos, beams=None, res=64, radius=6.0, bounds=100.0, **kw):
    state = state_from_numpy(
        np.asarray(pos, np.float32),
        beams=None if beams is None else np.asarray(beams, np.int32),
        beam_spring=1.0,
    )
    cfg = StaticConfig(bounds_size=bounds, particle_radius=radius,
                       collision_mode="none")
    return np.asarray(render_state(state, cfg, resolution=res, **kw))


def test_particle_sdf_fill_and_outline():
    img = render([[50.0, 50.0]])
    cx = cy = 32  # world (50,50) → pixel center (y flipped symmetric)
    center = img[cy, cx]
    # fill color (0, 0.35, 0.5) — render.wgsl:42 premultiplied
    np.testing.assert_allclose(center, [0.0, 0.35, 0.5], atol=0.02)
    # a white outline ring surrounds the fill (0.8r..r, render.wgsl:44)
    whites = (img > 0.95).all(-1)
    assert whites.any()
    ys, xs = np.nonzero(whites)
    d = np.hypot(ys - cy + 0.0, xs - cx + 0.0)
    # ring radius between 0.8r and r in pixels (r = 6 world = 3.84 px)
    assert d.min() > 2.0 and d.max() < 5.0
    # background black
    assert img[2, 2].max() == 0.0


def test_beam_stress_colors():
    """stress→R/G, strain→B (render.wgsl:82)."""
    import jax

    pos = jnp.asarray([[20.0, 50.0], [80.0, 50.0]], jnp.float32)
    args = dict(
        resolution=64, bounds_size=100.0, particle_radius=3.0,
    )

    def img_for(stress, strain):
        return np.asarray(render_frame(
            pos, jnp.ones(2, bool),
            jnp.asarray([0]), jnp.asarray([1]), jnp.ones(1, bool),
            jnp.asarray([strain], jnp.float32),
            jnp.asarray([stress], jnp.float32), **args,
        ))

    mid = (32, 32)
    neutral = img_for(0.0, 0.0)[mid]
    np.testing.assert_allclose(neutral, [1.0, 1.0, 1.0], atol=0.05)
    compressed = img_for(1.0, 0.0)[mid]   # stress +1 → red stays 1, green 0
    np.testing.assert_allclose(compressed, [1.0, 0.0, 1.0], atol=0.05)
    stretched = img_for(-1.0, 0.0)[mid]   # stress −1 → red 0, green 1
    np.testing.assert_allclose(stretched, [0.0, 1.0, 1.0], atol=0.05)
    strained = img_for(0.0, 1.0)[mid]     # |strain| 1 → blue 0
    np.testing.assert_allclose(strained, [1.0, 1.0, 0.0], atol=0.05)


def test_trail_compositing():
    img1 = render([[50.0, 50.0]])
    moved = render([[20.0, 20.0]], prev_frame=jnp.asarray(img1))
    # ghost of the old particle's fill (blue 0.5) at 60% brightness
    # (alpha-0.4 clear): 0.5 * 0.6 = 0.3
    old = moved[32, 32]
    assert 0.25 < old.max() < 0.36
    # fresh particle fully bright where drawn
    assert moved[:, :, 2].max() > 0.45


def test_dead_particles_not_drawn():
    import jax

    state = state_from_numpy(np.array([[50.0, 50.0]], np.float32))
    state.particle_alive = jnp.zeros(1, bool)
    cfg = StaticConfig(bounds_size=100.0, particle_radius=6.0,
                       collision_mode="none")
    img = np.asarray(render_state(state, cfg, resolution=64))
    assert img.max() == 0.0


def test_png_roundtrip(tmp_path):
    img = render([[30.0, 70.0], [70.0, 30.0]], beams=[[0, 1]])
    path = str(tmp_path / "f.png")
    save_png(path, img)
    data = open(path, "rb").read()
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    assert len(data) > 100
