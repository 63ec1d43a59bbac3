"""Consistency of the vectorized (numpy batch) hit/side paths against the
scalar oracle methods, over randomized rays and a zoo of composite objects."""

import numpy as np
import pytest

from actinon_tpu.scene.objects import (
    INF, Envelope, Neg, PairInside, PairOutside, Plane, ScaleWrap, Sphere,
    Squaroid, make_torus, ray_exit_b, rot_y, rot_z, v3,
)


def ray_batch(n=200, seed=0, spread=4.0):
    r = np.random.default_rng(seed)
    p = r.uniform(-spread, spread, size=(n, 3))
    d = r.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return p, d


def zoo():
    s = Sphere(1.3)
    s.move(v3(0.5, 0, 0))

    pl = Plane()
    pl.rotate(rot_y(0.4))
    pl.move(v3(0, 0, -1))

    e = Squaroid.ellipsoid(2.0, 1.0, 1.5)
    e.rotate(rot_z(0.3))

    cyl = Squaroid.cylinder(1.0, 0.8)

    t = make_torus(2.0, 0.5)

    lens = PairInside(Sphere(1.5), _moved(Sphere(1.5), v3(1, 0, 0)))
    shell = PairInside(Sphere(1.5), Neg(Sphere(1.2)))
    uni = PairOutside(_moved(Sphere(1.0), v3(-1, 0, 0)),
                      _moved(Sphere(1.0), v3(1, 0, 0)))
    sw = ScaleWrap(Sphere(1.0), v3(2.0, 1.0, 0.5))

    enveloped = Sphere(1.0)
    enveloped.set_envelope(Envelope(v3(0, 0, 0), 1.1))

    return {
        "sphere": s, "plane": pl, "ellipsoid": e, "cylinder": cyl,
        "torus": t, "lens": lens, "shell": shell, "union": uni,
        "scalewrap": sw, "enveloped": enveloped,
    }


def _moved(o, vec):
    o.move(vec)
    return o


@pytest.mark.parametrize("name", list(zoo().keys()))
def test_batch_matches_scalar_hit(name):
    obj = zoo()[name]
    p, d = ray_batch(seed=hash(name) % 1000)
    a_b, n_b = obj.ray_hit_b(p, d)
    for i in range(len(p)):
        a_s, n_s = obj.ray_hit(p[i], d[i])
        if a_s == INF:
            assert not np.isfinite(a_b[i]), f"ray {i}: scalar miss, batch hit"
        else:
            assert np.isfinite(a_b[i]), f"ray {i}: scalar hit, batch miss"
            assert abs(a_b[i] - a_s) < 1e-9, f"ray {i}"
            np.testing.assert_allclose(n_b[i], n_s, atol=1e-9)


@pytest.mark.parametrize("name", list(zoo().keys()))
def test_batch_matches_scalar_side(name):
    obj = zoo()[name]
    p, _ = ray_batch(seed=hash(name) % 1000 + 1)
    s_b = obj.side_b(p)
    for i in range(len(p)):
        assert s_b[i] == obj.side(p[i]), f"point {i}: {p[i]}"


def test_ray_exit_batch_matches_scalar():
    obj = PairOutside(_moved(Sphere(1.0), v3(-0.5, 0, 0)),
                      _moved(Sphere(1.0), v3(0.5, 0, 0)))
    p, d = ray_batch(n=100, seed=42, spread=2.0)
    a_b = ray_exit_b(obj, p, d)
    for i in range(len(p)):
        a_s = obj.ray_exit(p[i], d[i])
        if a_s == INF:
            assert not np.isfinite(a_b[i]), f"ray {i}"
        else:
            assert abs(a_b[i] - a_s) < 1e-6, f"ray {i}"
