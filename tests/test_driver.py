"""Render-driver tests: pass loop, adaptive refinement, checkpoint/resume
exactness, PNM round trip, hash stability."""

import os

import numpy as np
import pytest

from actinon_tpu.acn.interp import run_source
from actinon_tpu.render import image as aimg
from actinon_tpu.render.driver import render_scene
from actinon_tpu.scene.objects import Plane, Scene, Sphere, apply_material, v3


def small_scene(cycles=1, direct=4, path=0):
    sc = Scene()
    cfg = sc.cfg
    cfg.image_width, cfg.image_height = 24, 18
    cfg.trace_depth = 6
    cfg.direct_samples = direct
    cfg.path_samples = path
    cfg.gradient_cycles = cycles
    cfg.gradient_samples = 2
    cfg.gradient_threshold = 0.05
    cfg.camera_position = (0.0, -8.0, 3.0)
    cfg.camera_view_direction = (0.0, 8.0, -2.0)
    cfg.camera_top_direction = (0.0, 0.0, 1.0)
    cfg.background_color = (0.1, 0.12, 0.2)
    lamp = Sphere(0.5)
    lamp.prp.radiance = 25.0
    lamp.move(v3(2, -1, 5))
    sc.push(lamp)
    sc.push(Plane())
    ball = Sphere(1.0)
    apply_material(ball, "glass")
    ball.move(v3(-0.8, 0, 1.2))
    sc.push(ball)
    return sc


def test_render_deterministic(tmp_path):
    out1 = str(tmp_path / "a.pnm")
    out2 = str(tmp_path / "b.pnm")
    img1 = render_scene(small_scene(), out1, force=True, dtype=np.float64,
                        verbose=False)
    img2 = render_scene(small_scene(), out2, force=True, dtype=np.float64,
                        verbose=False)
    np.testing.assert_array_equal(img1, img2)
    h1 = aimg.image_hash(aimg.pack_cps(img1))
    h2 = aimg.image_hash(aimg.pack_cps(img2))
    assert h1 == h2


def test_pnm_roundtrip(tmp_path):
    out = str(tmp_path / "x.pnm")
    img = render_scene(small_scene(cycles=0), out, force=True,
                       dtype=np.float64, verbose=False)
    back = aimg.read_pnm(out)
    assert back.shape == img.shape
    assert np.abs(back - np.clip(img, 0, 1)).max() < 1.0 / 255


def test_adaptive_pass_adds_weight(tmp_path):
    """Gradient passes concentrate extra samples at high-variance pixels."""
    sc = small_scene(cycles=2)
    out = str(tmp_path / "x.pnm")
    img = render_scene(sc, out, force=True, dtype=np.float64, verbose=False)
    assert np.isfinite(img).all()


def test_resume_exactness(tmp_path):
    """A checkpoint written after pass 0 resumes to the same image as an
    uninterrupted render (resume-exact accumulation + LCG state)."""
    out_full = str(tmp_path / "full.pnm")
    full = render_scene(small_scene(cycles=2), out_full, force=True,
                        dtype=np.float64, verbose=False)

    # interrupted run: cycle 0 only, then craft the checkpoint a clean
    # between-pass SIGINT would leave (cycle 0 merged, about to start
    # cycle 1; pass 0 is one weight-1 sample per pixel, so its
    # accumulator equals the rendered image)
    out_part = str(tmp_path / "part.pnm")
    part0 = render_scene(small_scene(cycles=2), out_part, force=True,
                         dtype=np.float64, verbose=False, max_cycles=0)
    li = aimg.LumImage(24, 18)
    li.clr = part0.copy()
    li.weight = np.ones((18, 24))
    li.gradient_cycle = 1
    li.rval = np.uint64(21943294)
    li.save(out_part + ".tmp.lum_image.npz")
    resumed = render_scene(small_scene(cycles=2), out_part, force=True,
                           recover=True, dtype=np.float64, verbose=False)
    np.testing.assert_allclose(resumed, full, atol=1e-12)


def test_acn_create_image_end_to_end(tmp_path):
    """Script -> scene -> render through the interpreter hook."""
    out = str(tmp_path / "scripted.pnm")
    src = f"""
    def scene = scene_s;
    scene.image_width = 16; scene.image_height = 12;
    scene.trace_depth = 4; scene.direct_samples = 3;
    scene.gradient_cycles = 0;
    scene.camera_position = vec(0,-6,2);
    scene.camera_view_direction = vec(0,6,-1);
    scene.camera_top_direction = vec(0,0,1);
    def lamp = create_sphere(0.5) + vec(0,0,6);
    lamp.set_radiance( 20 );
    scene.push( lamp );
    scene.push( create_plane() );
    scene.create_image( "{out}" );
    """
    run_source(src, render_fn=lambda sc, fn: render_scene(
        sc, fn, force=True, dtype=np.float64, verbose=False))
    assert os.path.exists(out)
    img = aimg.read_pnm(out)
    assert img.shape == (12, 16, 3)
    assert img.max() > 0.05   # lamp lights the floor


def test_interactive_prompts(tmp_path, monkeypatch):
    """Reference prompt parity (src/scene.c:1036-1097): on a terminal
    the driver asks before overwriting output / using a checkpoint;
    declining the overwrite keeps the hard error."""
    from actinon_tpu.render import driver as drv

    out = str(tmp_path / "p.pnm")
    render_scene(small_scene(cycles=0), out, force=True,
                 dtype=np.float64, verbose=False)
    assert os.path.exists(out)

    # non-interactive: existing output still raises
    monkeypatch.setattr(drv, "_interactive", lambda: False)
    with pytest.raises(FileExistsError):
        render_scene(small_scene(cycles=0), out, dtype=np.float64,
                     verbose=False)

    # interactive decline -> error; accept -> rerender
    monkeypatch.setattr(drv, "_interactive", lambda: True)
    monkeypatch.setattr(drv, "_ask", lambda q: False)
    with pytest.raises(FileExistsError):
        render_scene(small_scene(cycles=0), out, dtype=np.float64,
                     verbose=False)
    monkeypatch.setattr(drv, "_ask", lambda q: True)
    img = render_scene(small_scene(cycles=0), out, dtype=np.float64,
                       verbose=False)
    assert img.shape[2] == 3

    # recovery prompt: a checkpoint + declined recovery renders fresh,
    # accepted recovery resumes (no error, checkpoint consumed)
    import actinon_tpu.render.image as ai
    lum = ai.LumImage(small_scene().cfg.image_width,
                      small_scene().cfg.image_height)
    tmp_file = out + ".tmp.lum_image.npz"
    lum.save(tmp_file)
    asked = []
    monkeypatch.setattr(drv, "_ask",
                        lambda q: asked.append(q) or ("Recovery" in q))
    render_scene(small_scene(cycles=0), out, dtype=np.float64,
                 verbose=False)
    assert any("Recovery" in q for q in asked)
    assert not os.path.exists(tmp_file)
