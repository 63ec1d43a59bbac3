"""Unit tests for the host-side object model: primitives, CSG semantics,
envelopes, materials (actinon_tpu.scene.objects)."""

import math

import numpy as np
import pytest

from actinon_tpu.scene.objects import (
    INF, ArrS, Compound, Envelope, MapS, Neg, PairInside, PairOutside, Plane,
    ScaleWrap, Scene, Sphere, Squaroid, apply_material, envelope_of_pair,
    estimate_envelope, make_torus, rot_z, v3,
)


def ez():
    return v3(0, 0, 1)


# ---------------------------------------------------------------------------
# primitives


def test_sphere_hit():
    s = Sphere(1.0)
    s.move(v3(0, 0, 5))
    a, n = s.ray_hit(v3(0, 0, 0), ez())
    assert abs(a - 4.0) < 1e-5
    np.testing.assert_allclose(n, [0, 0, -1], atol=1e-9)
    # miss
    a, n = s.ray_hit(v3(3, 0, 0), ez())
    assert a == INF


def test_sphere_exit_root_from_inside():
    s = Sphere(2.0)
    a, n = s.ray_hit(v3(0, 0, 0), ez())
    assert abs(a - 2.0) < 1e-5
    np.testing.assert_allclose(n, [0, 0, 1], atol=1e-9)


def test_sphere_side():
    s = Sphere(1.0)
    assert s.side(v3(0, 0, 0)) == -1
    assert s.side(v3(2, 0, 0)) == 1


def test_plane_hit_side():
    p = Plane()  # half-space below z=0, normal +z
    a, n = p.ray_hit(v3(0, 0, 1), v3(0, 0, -1))
    assert abs(a - 1.0) < 1e-5
    np.testing.assert_allclose(n, [0, 0, 1])
    assert p.side(v3(0, 0, 1)) == 1
    assert p.side(v3(0, 0, -1)) == -1
    # parallel ray misses
    a, _ = p.ray_hit(v3(0, 0, 1), v3(1, 0, 0))
    assert a == INF


def test_plane_rotated():
    p = Plane()
    p.rotate(rot_z(math.pi / 2) @ np.array([[0.0, 0, 1], [0, 1, 0], [-1, 0, 0]]))
    # normal now rotated: originally +z; after frame rotation normal = rax[2]
    nor = p.prp.rax[2]
    assert abs(float(nor @ nor) - 1.0) < 1e-9


def test_squaroid_ellipsoid_hit():
    e = Squaroid.ellipsoid(2.0, 1.0, 1.0)
    a, n = e.ray_hit(v3(-5, 0, 0), v3(1, 0, 0))
    assert abs(a - 3.0) < 1e-4
    np.testing.assert_allclose(n, [-1, 0, 0], atol=1e-9)
    assert e.side(v3(0, 0, 0)) == -1
    assert e.side(v3(0, 2, 0)) == 1


def test_squaroid_cylinder_infinite_z():
    c = Squaroid.cylinder(1.0, 1.0)
    a, n = c.ray_hit(v3(-5, 0, 3), v3(1, 0, 0))
    assert abs(a - 4.0) < 1e-4
    assert c.side(v3(0, 0, 100)) == -1


def test_squaroid_scale_rule():
    """scale multiplies r by fac^2 (reference src/objects.c:744-752)."""
    e = Squaroid.ellipsoid(1.0, 1.0, 1.0)
    e.scale(2.0)
    a, _ = e.ray_hit(v3(-5, 0, 0), v3(1, 0, 0))
    assert abs(a - 3.0) < 1e-4


def test_torus_hit():
    t = make_torus(2.0, 0.5)  # major 2, minor 0.5 in xy plane
    a, n = t.ray_hit(v3(-5, 0, 0), v3(1, 0, 0))
    assert abs(a - 2.5) < 1e-3
    np.testing.assert_allclose(n, [-1, 0, 0], atol=1e-3)
    assert t.side(v3(2, 0, 0)) == -1
    # quirk parity: the reference SDF degenerates on the z-axis and reports
    # "inside" there (reference src/distance.c:83-91); match it.
    assert t.side(v3(0, 0, 0)) == -1
    assert t.side(v3(0, 0, 2)) == 1
    assert t.side(v3(1.2, 0, 0)) == 1


# ---------------------------------------------------------------------------
# CSG


def test_pair_inside_intersection():
    s1 = Sphere(1.0)
    s2 = Sphere(1.0)
    s2.move(v3(1, 0, 0))
    lens = PairInside(s1, s2)
    # from left: first surface of the lens is s2's left cap at x=0
    a, n = lens.ray_hit(v3(-5, 0, 0), v3(1, 0, 0))
    assert abs(a - 5.0) < 1e-4
    assert lens.side(v3(0.5, 0, 0)) == -1
    assert lens.side(v3(-0.5, 0, 0)) == 1      # inside s1 only
    assert lens.side(v3(3, 0, 0)) == 1


def test_pair_outside_union():
    s1 = Sphere(1.0)
    s2 = Sphere(1.0)
    s2.move(v3(1, 0, 0))
    u = PairOutside(s1, s2)
    a, _ = u.ray_hit(v3(-5, 0, 0), v3(1, 0, 0))
    assert abs(a - 4.0) < 1e-4
    assert u.side(v3(-0.5, 0, 0)) == -1
    assert u.side(v3(1.5, 0, 0)) == -1
    assert u.side(v3(3, 0, 0)) == 1
    # ray passes through the union: exit at x=2
    ex = u.ray_exit(v3(-0.5, 0, 0), v3(1, 0, 0))
    assert abs(ex - 2.5) < 1e-3


def test_neg_complement():
    s = Sphere(1.0)
    n = Neg(s)
    assert n.side(v3(0, 0, 0)) == 1
    assert n.side(v3(2, 0, 0)) == -1
    a, nor = n.ray_hit(v3(-5, 0, 0), v3(1, 0, 0))
    assert abs(a - 4.0) < 1e-4
    np.testing.assert_allclose(nor, [1, 0, 0], atol=1e-9)  # flipped


def test_csg_subtract_bowl():
    """sphere & !inner_sphere — the wine-glass bowl pattern
    (src_acn/wine_glass.acn)."""
    outer = Sphere(1.0)
    inner = Sphere(0.9)
    bowl = PairInside(outer, Neg(inner))
    a, _ = bowl.ray_hit(v3(-5, 0, 0), v3(1, 0, 0))
    assert abs(a - 4.0) < 1e-4
    assert bowl.side(v3(0.95, 0, 0)) == -1   # in the shell
    assert bowl.side(v3(0, 0, 0)) == 1       # hollow center
    # from center outward: hit the inner surface of the shell
    a, nor = bowl.ray_hit(v3(0, 0, 0), v3(1, 0, 0))
    assert abs(a - 0.9) < 1e-4
    np.testing.assert_allclose(nor, [-1, 0, 0], atol=1e-9)


def test_scale_wrap_anisotropic():
    s = Sphere(1.0)
    w = ScaleWrap(s, v3(2, 1, 1))
    a, n = w.ray_hit(v3(-5, 0, 0), v3(1, 0, 0))
    assert abs(a - 3.0) < 1e-4
    np.testing.assert_allclose(n, [-1, 0, 0], atol=1e-6)
    a, n = w.ray_hit(v3(0, -5, 0), v3(0, 1, 0))
    assert abs(a - 4.0) < 1e-4
    assert w.side(v3(1.5, 0, 0)) == -1
    assert w.side(v3(0, 1.5, 0)) == 1


# ---------------------------------------------------------------------------
# envelopes


def test_envelope_of_pair_merge():
    e1 = Envelope(v3(0, 0, 0), 1.0)
    e2 = Envelope(v3(4, 0, 0), 1.0)
    m = envelope_of_pair(e1, e2)
    np.testing.assert_allclose(m.pos, [2, 0, 0], atol=1e-12)
    assert abs(m.radius - 3.0) < 1e-12
    # smaller inside bigger: keep bigger
    e3 = Envelope(v3(0.1, 0, 0), 0.2)
    big = Envelope(v3(0, 0, 0), 2.0)
    m2 = envelope_of_pair(big, e3)
    assert abs(m2.radius - 2.0) < 1e-12


def test_estimate_envelope_sphere_like():
    s1 = Sphere(1.0)
    s2 = Sphere(1.0)
    s2.move(v3(0.5, 0, 0))
    u = PairOutside(s1, s2)
    env = estimate_envelope(u, samples=500)
    # must enclose the union [-1, 1.5] x [-1,1]^2
    for probe in ([-1, 0, 0], [1.5, 0, 0], [0, 1, 0], [0, 0, -1]):
        d = np.linalg.norm(np.array(probe, float) - env.pos)
        assert d <= env.radius + 1e-6, probe
    assert env.radius < 3.0  # reasonably tight


def test_envelope_culling_in_obj():
    s = Sphere(1.0)
    s.set_envelope(Envelope(v3(0, 0, 0), 1.05))
    a, _ = s.ray_hit(v3(-5, 0, 0), v3(1, 0, 0))
    assert abs(a - 4.0) < 1e-4
    a, _ = s.ray_hit(v3(-5, 3, 0), v3(1, 0, 0))
    assert a == INF


# ---------------------------------------------------------------------------
# compound / containers


def test_compound_nearest_hit():
    c = Compound()
    s1 = Sphere(1.0); s1.move(v3(0, 0, 5))
    s2 = Sphere(1.0); s2.move(v3(0, 0, 10))
    c.push(s1); c.push(s2)
    a, n, h = c.ray_hit(v3(0, 0, 0), ez())
    assert abs(a - 4.0) < 1e-4


def test_compound_push_flattening():
    inner = Compound()
    inner.push(Sphere(1.0))
    outer = Compound()
    outer.push(inner)   # no envelope -> flattened
    assert outer.size() == 1
    inner2 = Compound()
    inner2.push(Sphere(1.0))
    inner2.set_auto_envelope()
    outer.push(inner2)  # enveloped -> nested
    assert outer.size() == 2
    assert len(outer.leaf_objects()) == 2


def test_arr_composites():
    a = ArrS()
    for x in (-1.0, 0.0, 1.0):
        s = Sphere(1.0)
        s.move(v3(x, 0, 0))
        a.push(s)
    u = a.create_outside_composite()
    assert u.side(v3(-1.5, 0, 0)) == -1
    assert u.side(v3(1.8, 0, 0)) == -1
    assert u.side(v3(3.5, 0, 0)) == 1
    hit, _ = u.ray_hit(v3(-5, 0, 0), v3(1, 0, 0))
    assert abs(hit - 3.0) < 1e-4


def test_scene_push_routing():
    sc = Scene()
    lamp = Sphere(1.0)
    lamp.prp.radiance = 25.0
    wall = Plane()
    sc.push(lamp)
    sc.push(wall)
    assert sc.light.size() == 1
    assert sc.matter.size() == 1


def test_materials():
    s = Sphere(1.0)
    apply_material(s, "glass")
    assert s.prp.refractive_index == 1.46
    np.testing.assert_allclose(s.prp.transparency, [0.8, 0.9, 0.9])
    apply_material(s, "gold")
    np.testing.assert_allclose(s.prp.color, [0.83, 0.69, 0.22])
    assert s.prp.chromatic_reflectivity == 1.0
    with pytest.raises(KeyError):
        apply_material(s, "adamantium")


def test_transform_recursion():
    pair = PairInside(Sphere(1.0), Sphere(1.0))
    pair.move(v3(1, 2, 3))
    np.testing.assert_allclose(pair.o1.prp.pos, [1, 2, 3])
    np.testing.assert_allclose(pair.o2.prp.pos, [1, 2, 3])
    pair.scale(2.0)
    np.testing.assert_allclose(pair.prp.pos, [2, 4, 6])
    assert pair.o1.radius == 2.0
