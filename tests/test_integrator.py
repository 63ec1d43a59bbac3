"""Wavefront integrator vs. the recursive scene_s_lum oracle.

Both run over the same device tracer and the same counter RNG, so
per-sample radiance must agree to float tolerance — validating the
recursion->wavefront flattening (SURVEY.md section 7 'hard parts' #2).
"""

import numpy as np
import pytest

from actinon_tpu.render.driver import camera_rays
from actinon_tpu.render.integrator import Integrator, RayQueue
from actinon_tpu.render.reference_oracle import RecursiveOracle
from actinon_tpu.render.tracer import Tracer
from actinon_tpu.scene import ir as sir
from actinon_tpu.scene.objects import (
    Neg, PairInside, Plane, Scene, Sphere, TxmChess, apply_material, v3,
)


def make_scene(glass=True, mirror=False, chess=False, path_samples=0,
               direct_samples=6, depth=8, sigma=0.0):
    sc = Scene()
    cfg = sc.cfg
    cfg.image_width, cfg.image_height = 8, 6
    cfg.trace_depth = depth
    cfg.direct_samples = direct_samples
    cfg.path_samples = path_samples
    cfg.camera_position = (0.0, -8.0, 3.0)
    cfg.camera_view_direction = (0.0, 8.0, -2.0)
    cfg.camera_top_direction = (0.0, 0.0, 1.0)
    cfg.camera_focal_length = 1.2
    cfg.background_color = (0.1, 0.12, 0.2)

    lamp = Sphere(0.5)
    lamp.prp.radiance = 25.0
    lamp.move(v3(2, -1, 5))
    sc.push(lamp)

    floor = Plane()
    floor.prp.sigma = sigma
    if chess:
        floor.prp.texture = TxmChess((0.1, 0.1, 0.1), (0.9, 0.9, 0.8), 1.0)
    sc.push(floor)

    if glass:
        ball = Sphere(1.0)
        apply_material(ball, "glass")
        ball.move(v3(-0.8, 0, 1.2))
        sc.push(ball)
    if mirror:
        m = Sphere(1.0)
        apply_material(m, "mirror")
        m.move(v3(1.5, 1.5, 1.0))
        sc.push(m)
    return sc


def run_both(sc, n_max=12, seed=3):
    ir = sir.compile_scene(sc)
    tr = Tracer(ir, dtype=np.float64)
    integ = Integrator(tr, batch=64)
    oracle = RecursiveOracle(integ)

    cfg = sc.cfg
    rng = np.random.default_rng(seed)
    pos = np.stack([rng.uniform(0, cfg.image_width, n_max),
                    rng.uniform(0, cfg.image_height, n_max)], -1)
    p, d = camera_rays(ir, pos, np.float64)

    primary = RayQueue(p, d, np.ones(len(p)), np.ones((len(p), 3)),
                       np.full(len(p), cfg.trace_depth, np.int32),
                       np.arange(len(p), dtype=np.int32))
    wavefront = integ.run(primary, len(p))

    want = np.stack([oracle.sample(p[i], d[i]) for i in range(len(p))])
    return wavefront, want


@pytest.mark.parametrize("name,kw", [
    ("diffuse_only", dict(glass=False)),
    ("glass", dict(glass=True)),
    ("mirror", dict(glass=False, mirror=True)),
    ("glass_mirror_chess", dict(glass=True, mirror=True, chess=True)),
    ("oren_nayar", dict(glass=False, sigma=0.29)),
    ("path_traced", dict(glass=False, path_samples=4, depth=12)),
    ("glass_path", dict(glass=True, path_samples=3, depth=12)),
])
def test_wavefront_matches_recursion(name, kw):
    sc = make_scene(**kw)
    got, want = run_both(sc)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-9,
                               err_msg=name)


def test_emitter_direct_view():
    """Primary ray straight at the lamp sees radiance/r^2 falloff."""
    sc = make_scene(glass=False)
    ir = sir.compile_scene(sc)
    tr = Tracer(ir, dtype=np.float64)
    integ = Integrator(tr, batch=16)

    lamp_pos = np.array([2.0, -1.0, 5.0])
    p = np.asarray([ir.cam_pos], np.float64)
    d = lamp_pos - ir.cam_pos
    d = np.asarray([d / np.linalg.norm(d)], np.float64)
    primary = RayQueue(p, d, np.ones(1), np.ones((1, 3)),
                       np.full(1, 8, np.int32), np.zeros(1, np.int32))
    got = integ.run(primary, 1)[0]
    # emitter falloff is radiance / |hit - center|^2 = radiance / radius^2
    # (reference src/scene.c:434-436)
    expect = 0.7 * 25.0 / 0.5 ** 2   # default gray 0.7 color
    np.testing.assert_allclose(got, expect, rtol=1e-3)


@pytest.mark.parametrize("kind", ["ellipsoid", "csg"])
def test_non_sphere_emitter(kind):
    """NEE intersects the TRUE light geometry (obj_ray_hit(light_src),
    reference src/scene.c:564) — an ellipsoid / CSG emitter, not its
    envelope sphere: wavefront == recursion, and the result differs from
    an envelope-sphere light of the same radiance."""
    from actinon_tpu.scene.objects import Envelope, Squaroid
    sc = make_scene(glass=False)
    sc.light.elements.clear()

    if kind == "ellipsoid":
        lamp = Squaroid.ellipsoid(1.2, 0.4, 0.4)
    else:
        lamp = PairInside(Sphere(0.9), Neg(Sphere(0.55)))
    lamp.prp.radiance = 25.0
    lamp.set_envelope(Envelope((0, 0, 0), 1.3))
    lamp.move(v3(2, -1, 5))
    sc.push(lamp)

    got, want = run_both(sc, n_max=10)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-9)
    assert np.isfinite(got).all() and (got >= 0).all()

    # interior-vs-true-geometry sanity: replacing the true hit with the
    # envelope sphere must change the direct lighting (the round-1
    # deviation this test guards against)
    ir = sir.compile_scene(sc)
    tr = Tracer(ir, dtype=np.float64)
    integ = Integrator(tr, batch=64)
    # pretend the light is an exact sphere of its envelope
    integ.l_sphere_exact[0] = True
    cfg = sc.cfg
    rng = np.random.default_rng(3)
    pos = np.stack([rng.uniform(0, cfg.image_width, 10),
                    rng.uniform(0, cfg.image_height, 10)], -1)
    p, d = camera_rays(ir, pos, np.float64)
    primary = RayQueue(p, d, np.ones(len(p)), np.ones((len(p), 3)),
                       np.full(len(p), cfg.trace_depth, np.int32),
                       np.arange(len(p), dtype=np.int32))
    sphere_approx = integ.run(primary, len(p))
    assert not np.allclose(sphere_approx, got, rtol=1e-3)


def test_plane_emitter():
    """A half-space emitter uses the plane fov cone (obj_plane_s_fov,
    reference src/objects.c:520-526) and true plane intersection."""
    sc = make_scene(glass=False)
    sc.light.elements.clear()
    lamp = Plane()          # z<=0 half-space, normal +z
    lamp.prp.radiance = 4.0
    # ceiling half-space z>=12 glowing downward (normal flipped to -z)
    lamp.rotate(np.asarray(
        [[1, 0, 0], [0, -1, 0], [0, 0, -1]], np.float64))
    lamp.move(v3(0, 0, 12.0))
    sc.push(lamp)
    got, want = run_both(sc, n_max=8)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-9)


def test_csg_scene_end_to_end():
    """Glass shell (CSG) with refraction + NEE: wavefront == recursion."""
    sc = make_scene(glass=False)
    shell = PairInside(Sphere(1.0), Neg(Sphere(0.85)))
    apply_material(shell, "glass")
    shell.move(v3(0, 0, 1.5))
    sc.push(shell)
    got, want = run_both(sc, n_max=8)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-9)
