"""A/B: the packed members-on-lanes scene kernel (pallas_scene.py,
interpret mode) vs the XLA tracer paths.

Covers the kernel's four shape families — singles (per-family root
policy), standalone SDF objects (single bidirectional march), SDF solo
clusters (march + crossing-parity walk), and all-analytic composite
groups — through the tracer's public queries (nearest / nearest2 /
trans_hit / mixed lane-matter / shadow), so the winner-code decode and
downstream merge are exercised too.

The kernel reorders the candidate merge (lanes vs XLA column order) and
refactors the f32 math per tile, so agreement is f32-tolerance with
winner identity asserted away from near-ties (same contract as
tests/test_bigscene.py)."""

import math

import numpy as np
import pytest
import jax

from actinon_tpu.scene import ir as sir
from actinon_tpu.scene.objects import (
    Neg, PairInside, PairOutside, Plane, Scene, Sphere, Squaroid,
    make_torus, rot_x, rot_y, v3,
)
from actinon_tpu.render.tracer import Tracer


def _mixed_scene():
    """Every shape family: singles of all three analytic families, a
    2-member analytic composite group, a 3-member SDF solo cluster, a
    standalone torus, and two sphere lights."""
    sc = Scene()
    for k, z in ((0, 8.0), (1, -8.0)):
        light = Sphere(0.4)
        light.move(v3(1.0 * k, 0, z))
        light.prp.radiance = 30.0
        sc.push(light)
    floor = Plane()
    floor.move(v3(0, 0, -2.5))
    sc.push(floor)
    ball = Sphere(0.8)
    ball.move(v3(4.5, 1.0, 0))
    sc.push(ball)
    ell = Squaroid.ellipsoid(1.2, 0.7, 0.5)
    ell.rotate(rot_x(0.4))
    ell.move(v3(-4.5, -1.0, 0.5))
    sc.push(ell)
    # analytic composite group: two shifted copies of sphere ∩ ¬sphere
    for k in range(2):
        comp = PairInside(Sphere(1.0), Neg(Sphere(0.6)))
        comp.move(v3(2.5 * k - 1.0, 3.0, 0.2 * k))
        comp.set_auto_envelope()
        sc.push(comp)
    # SDF solo cluster: three (torus ∪ sphere) ∩ ¬sphere shells
    for k in range(3):
        t = make_torus(1.4, 0.4)
        comp = PairInside(PairOutside(t, Sphere(0.7)), Neg(Sphere(0.3)))
        comp.rotate(rot_y(2 * math.pi * k / 9))
        comp.move(v3(3.0 * k - 3.0, -3.5, 0.3 * k))
        comp.set_auto_envelope()
        sc.push(comp)
    # standalone torus
    t = make_torus(1.1, 0.3)
    t.rotate(rot_x(0.9))
    t.move(v3(0, 0.5, 3.0))
    sc.push(t)
    return sir.compile_scene(sc)


def _rays(n=512, seed=1):
    rng = np.random.default_rng(seed)
    p = rng.uniform(-7, 7, (n, 3)).astype(np.float32)
    d = rng.normal(0, 1, (n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return p, d


@pytest.fixture(scope="module")
def tracers():
    ir = _mixed_scene()
    tr_k = Tracer(ir, dtype=np.float32)
    tr_k.use_scene_interpret = True
    assert tr_k._scene_ok()
    stf, stm, top2, anyhit = tr_k._scene_kernels()
    # every family must be on the table
    kinds = {sh.kind for sh in stf.shapes}
    assert kinds == {"singles", "sdfsingle", "cluster"}
    assert top2 is not None and anyhit is not None
    assert not stf.rest_groups and not stf.rest_solos
    tr_x = Tracer(ir, dtype=np.float32)
    tr_x.use_pallas = False
    assert not tr_x._scene_ok()
    return tr_k, tr_x


def _cmp_hits(out_k, out_x, atol_t=2e-4, oid_rate=0.99):
    t_k, nor_k, oid_k, sign_k = map(np.asarray, out_k)
    t_x, nor_x, oid_x, sign_x = map(np.asarray, out_x)
    fin = np.isfinite(t_x)
    assert fin.any() and (~fin).any()
    assert (np.isfinite(t_k) == fin).mean() > 0.998
    both = fin & np.isfinite(t_k)
    np.testing.assert_allclose(t_k[both], t_x[both], rtol=2e-4,
                               atol=atol_t)
    assert (oid_k[both] == oid_x[both]).mean() > oid_rate
    same = both & (oid_k == oid_x)
    np.testing.assert_allclose(nor_k[same], nor_x[same], rtol=0,
                               atol=5e-3)
    assert (sign_k[same] == sign_x[same]).mean() > 0.999


def test_scene_nearest(tracers):
    tr_k, tr_x = tracers
    p, d = _rays()
    _cmp_hits(tr_k.nearest(p, d, rng_rough=False),
              tr_x.nearest(p, d, rng_rough=False))


def test_scene_nearest_matter_only(tracers):
    tr_k, tr_x = tracers
    p, d = _rays(seed=3)
    out_k = tr_k.nearest(p, d, matter_only=True, rng_rough=False)
    out_x = tr_x.nearest(p, d, matter_only=True, rng_rough=False)
    _cmp_hits(out_k, out_x)
    # no light may ever win a matter-only query
    lights = np.flatnonzero(tr_x.is_light)
    assert not np.isin(np.asarray(out_k[2]), lights).any()


def test_scene_trans_hit(tracers):
    tr_k, tr_x = tracers
    p, d = _rays(seed=5)
    o_k = [np.asarray(x) for x in jax.device_get(tr_k.trans_hit(p, d))]
    o_x = [np.asarray(x) for x in jax.device_get(tr_x.trans_hit(p, d))]
    both = np.isfinite(o_x[0]) & np.isfinite(o_k[0])
    assert both.any()
    np.testing.assert_allclose(o_k[0][both], o_x[0][both], rtol=2e-4,
                               atol=2e-4)
    agree = (o_k[2] == o_x[2]) & (o_k[3] == o_x[3])
    assert agree[both].mean() > 0.99


def test_scene_mixed_lane_matter(tracers):
    tr_k, tr_x = tracers
    p, d = _rays(seed=7)
    mask = np.arange(len(p)) % 2 == 0
    o_k = [np.asarray(x) for x in
           jax.device_get(tr_k.trans_hit_mixed(p, d, mask))]
    o_x = [np.asarray(x) for x in
           jax.device_get(tr_x.trans_hit_mixed(p, d, mask))]
    both = np.isfinite(o_x[0]) & np.isfinite(o_k[0])
    assert both.any()
    np.testing.assert_allclose(o_k[0][both], o_x[0][both], rtol=2e-4,
                               atol=2e-4)
    # path lanes must never enter/exit a light object
    lights = np.flatnonzero(tr_x.is_light)
    for o in (o_k, o_x):
        assert not np.isin(o[2][mask], lights).any()
        assert not np.isin(o[3][mask], lights).any()


def test_scene_shadow(tracers):
    tr_k, tr_x = tracers
    assert tr_k._prefer_scene_shadow()
    p, d = _rays(seed=9)
    limit = np.random.default_rng(11).uniform(
        0.2, 15.0, len(p)).astype(np.float32)
    b_k = np.asarray(tr_k.shadow_blocked(p, d, limit))
    b_x = np.asarray(tr_x.shadow_blocked(p, d, limit))
    assert b_x.any() and (~b_x).any()
    assert (b_k == b_x).mean() > 0.998


def test_scene_coherent_tile(tracers):
    """A coherent camera-style tile (shared direction) — the block-cull
    regression shape (see test_bigscene.py::test_bigscene_coherent_tile)."""
    tr_k, tr_x = tracers
    n = 256
    xs = np.linspace(-6, 6, n).astype(np.float32)
    p = np.stack([xs, np.full(n, -20.0, np.float32),
                  np.zeros(n, np.float32)], -1)
    d = np.tile(np.asarray([[0, 1, 0]], np.float32), (n, 1))
    t_k, _, oid_k, _ = map(np.asarray, tr_k.nearest(p, d,
                                                    rng_rough=False))
    t_x, _, oid_x, _ = map(np.asarray, tr_x.nearest(p, d,
                                                    rng_rough=False))
    fin = np.isfinite(t_x)
    assert fin.mean() > 0.2
    assert (np.isfinite(t_k) == fin).all()
    both = fin & np.isfinite(t_k)
    np.testing.assert_allclose(t_k[both], t_x[both], rtol=2e-4,
                               atol=2e-4)
    assert (oid_k[both] == oid_x[both]).mean() > 0.99


def test_object_hit_kernel(tracers):
    """A/B: the straight-line single-object hit kernel (the NEE light
    intersection) vs the XLA object_hit_t, for a single-leaf object, an
    analytic composite, and an SDF object (kernel declines -> XLA)."""
    tr_k, tr_x = tracers
    p, d = _rays(n=300, seed=13)
    comp_oid = next(o.oid if hasattr(o, "oid") else i
                    for i, o in enumerate(tr_x.ir.objects)
                    if not o.single_leaf)
    sdf_oid = tr_x.sdf_singles[0][1]
    single_oid = int(tr_x.tab.oid[tr_x.single_rows[0]])
    for oid in (single_oid, comp_oid, sdf_oid):
        a_k = np.asarray(tr_k.object_hit_t(oid, p, d))
        a_x = np.asarray(tr_x.object_hit_t(oid, p, d))
        both = np.isfinite(a_x) & np.isfinite(a_k)
        assert (np.isfinite(a_k) == np.isfinite(a_x)).mean() > 0.995
        if both.any():
            np.testing.assert_allclose(a_k[both], a_x[both], rtol=2e-4,
                                       atol=2e-4)
    assert tr_k._objhit_k[sdf_oid] is None     # SDF: XLA fallback
