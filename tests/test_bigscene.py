"""A/B: the table-driven big-scene traversal kernel
(pallas_bigscene.py, interpret mode) vs the chunked XLA path on a
synthetic many-sphere scene.

The kernel reorders leaves (Morton blocks) and factors the hit math per
(ray-tile x leaf-block), so agreement is f32-tolerance, not bitwise;
winner identity must agree wherever the top-2 distances are separated."""

import numpy as np
import pytest
import jax

from actinon_tpu.scene import ir as sir
from actinon_tpu.scene.objects import Scene, Sphere, v3
from actinon_tpu.render.tracer import Tracer


def _many_sphere_scene(n=600, seed=3):
    rng = np.random.default_rng(seed)
    sc = Scene()
    light = Sphere(0.4)
    light.move(v3(0, 0, 15))
    light.prp.radiance = 50.0
    sc.push(light)
    centers = rng.uniform(-8, 8, (n, 3))
    radii = rng.uniform(0.15, 0.5, n)
    for c, r in zip(centers, radii):
        s = Sphere(float(r))
        s.move(v3(*c))
        sc.push(s)
    return sir.compile_scene(sc)


def _rays(n=800, seed=1):
    rng = np.random.default_rng(seed)
    p = rng.uniform(-10, 10, (n, 3)).astype(np.float32)
    d = rng.normal(0, 1, (n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return p, d


@pytest.fixture(scope="module")
def tracers():
    ir = _many_sphere_scene()
    tr_k = Tracer(ir, dtype=np.float32)
    tr_k.use_bigscene_interpret = True
    assert tr_k._bigscene_ok(), "kernel gate must fire on this scene"
    tr_x = Tracer(ir, dtype=np.float32)
    tr_x.use_pallas = False
    assert not tr_x._bigscene_ok()
    return tr_k, tr_x


def test_bigscene_nearest(tracers):
    tr_k, tr_x = tracers
    p, d = _rays()
    t_k, nor_k, oid_k, sign_k = map(np.asarray,
                                    tr_k.nearest(p, d, rng_rough=False))
    t_x, nor_x, oid_x, sign_x = map(np.asarray,
                                    tr_x.nearest(p, d, rng_rough=False))
    fin = np.isfinite(t_x)
    assert fin.any() and (~fin).any()
    assert (np.isfinite(t_k) == fin).mean() > 0.999
    both = fin & np.isfinite(t_k)
    np.testing.assert_allclose(t_k[both], t_x[both], rtol=2e-4, atol=2e-4)
    # winner identity agrees away from near-ties
    assert (oid_k[both] == oid_x[both]).mean() > 0.995
    same = both & (oid_k == oid_x)
    np.testing.assert_allclose(nor_k[same], nor_x[same], rtol=0,
                               atol=5e-3)


def test_bigscene_trans_hit(tracers):
    tr_k, tr_x = tracers
    p, d = _rays(seed=4)
    t_k, nor_k, en_k, ex_k = map(np.asarray, jax.device_get(
        tr_k.trans_hit(p, d)))
    t_x, nor_x, en_x, ex_x = map(np.asarray, jax.device_get(
        tr_x.trans_hit(p, d)))
    both = np.isfinite(t_x) & np.isfinite(t_k)
    assert both.any()
    np.testing.assert_allclose(t_k[both], t_x[both], rtol=2e-4, atol=2e-4)
    agree = (en_k == en_x) & (ex_k == ex_x)
    assert agree[both].mean() > 0.995


def test_bigscene_coherent_tile(tracers):
    """A COHERENT ray tile — every ray of the 256-ray kernel tile
    approaching the scene from far outside along the same axis (a
    camera-tile shape).  Round-5 regression: the block-cull's sign was
    inverted on the center-minus-origin convention, so such tiles
    skipped every block ahead of them (no ray 'moving away or inside'
    fired the tile gate) and reported all-miss; incoherent random rays
    masked it."""
    tr_k, tr_x = tracers
    n = 512
    xs = np.linspace(-8, 8, n).astype(np.float32)
    p = np.stack([xs, np.full(n, -30.0, np.float32),
                  np.zeros(n, np.float32)], axis=-1)
    d = np.tile(np.asarray([[0.0, 1.0, 0.0]], np.float32), (n, 1))
    t_k, _, oid_k, _ = map(np.asarray, tr_k.nearest(p, d, rng_rough=False))
    t_x, _, oid_x, _ = map(np.asarray, tr_x.nearest(p, d, rng_rough=False))
    fin = np.isfinite(t_x)
    assert fin.mean() > 0.3, "tile must actually face the sphere cloud"
    assert (np.isfinite(t_k) == fin).all()
    np.testing.assert_allclose(t_k[fin], t_x[fin], rtol=2e-4, atol=2e-4)
    assert (oid_k[fin] == oid_x[fin]).mean() > 0.995
    limit = np.full(n, 60.0, np.float32)
    b_k = np.asarray(tr_k.shadow_blocked(p, d, limit))
    b_x = np.asarray(tr_x.shadow_blocked(p, d, limit))
    assert (b_k == b_x).all()


def test_bigscene_shadow(tracers):
    tr_k, tr_x = tracers
    p, d = _rays(seed=7)
    limit = np.random.default_rng(9).uniform(0.5, 20.0,
                                             len(p)).astype(np.float32)
    b_k = np.asarray(tr_k.shadow_blocked(p, d, limit))
    b_x = np.asarray(tr_x.shadow_blocked(p, d, limit))
    assert b_x.any() and (~b_x).any()
    assert (b_k == b_x).mean() > 0.999
