"""A/B regression: the scanned solo-cluster path vs the unrolled
per-composite path (round-3 advisor finding: _solo_scan_hit /
_solo_scan_shadow had no dedicated coverage).

Builds a cluster of shape-identical SDF-containing CSG composites
(torus∩sphere shells at different positions/orientations) and asserts
that the cluster scan (one lax.scan body per SHAPE) agrees exactly with
the unrolled path (one body per COMPOSITE), for nearest hits, the top-2
transition query, shadow any-hit, and gradients through the nearest
distance.  The unrolled path is forced by monkeypatching the cluster
partition into singletons on a second Tracer."""

import math

import numpy as np
import pytest
import jax

from actinon_tpu.scene import ir as sir
from actinon_tpu.scene.objects import (
    Neg, PairInside, PairOutside, Scene, Sphere, make_torus, rot_y, v3,
)
from actinon_tpu.render.tracer import Tracer


def _cluster_scene(n=3):
    """n shape-identical composites: (torus ∪ sphere) ∩ ¬inner-sphere,
    each rotated/moved differently, plus one light."""
    sc = Scene()
    light = Sphere(0.3)
    light.move(v3(0, 0, 8))
    light.prp.radiance = 25.0
    sc.push(light)
    for k in range(n):
        t = make_torus(1.6, 0.45)
        comp = PairInside(PairOutside(t, Sphere(0.8)),
                          Neg(Sphere(0.35)))
        comp.rotate(rot_y(2 * math.pi * k / max(n, 1) / 3))
        comp.move(v3(3.0 * k - 3.0, 0.4 * k, 0))
        comp.set_auto_envelope()
        sc.push(comp)
    return sc


def _rays(n=400, seed=2):
    r = np.random.default_rng(seed)
    p = r.uniform(-6, 6, size=(n, 3))
    d = r.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return p, d


def _tracers():
    ir = sir.compile_scene(_cluster_scene())
    tr_scan = Tracer(ir, dtype=np.float64)
    assert any(len(cl) >= 2 for cl in tr_scan._solo_clusters()), \
        "scene must produce a scannable cluster"
    tr_unroll = Tracer(ir, dtype=np.float64)
    # singleton clusters -> every composite takes the unrolled path
    tr_unroll._solo_cl = [[c] for c in tr_unroll.comp_solo]
    return tr_scan, tr_unroll


def test_scan_vs_unrolled_nearest_and_trans():
    tr_s, tr_u = _tracers()
    p, d = _rays()
    t_s, nor_s, oid_s, sign_s = map(np.asarray, tr_s.nearest_jit(p, d))
    t_u, nor_u, oid_u, sign_u = map(np.asarray, tr_u.nearest_jit(p, d))
    np.testing.assert_array_equal(oid_s, oid_u)
    np.testing.assert_array_equal(sign_s, sign_u)
    # the scanned body batches member parameters on a leading axis, so
    # contraction order differs from the unrolled form by last-ulp f64;
    # the SDF march's fixed-point termination amplifies those ulps to
    # ~1e-10 in the marched hit distance (both answers are inside the
    # march tolerance band)
    np.testing.assert_allclose(t_s, t_u, rtol=1e-7, atol=1e-8)
    np.testing.assert_allclose(nor_s, nor_u, rtol=1e-7, atol=1e-8)

    out_s = jax.device_get(tr_s.trans_hit(p, d))
    out_u = jax.device_get(tr_u.trans_hit(p, d))
    for a, b in zip(out_s, out_u):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-7, atol=1e-8)


def test_scan_vs_unrolled_shadow():
    tr_s, tr_u = _tracers()
    p, d = _rays(seed=5)
    limit = np.random.default_rng(7).uniform(0.1, 12.0, len(p))
    b_s = np.asarray(tr_s.shadow_blocked(p, d, limit))
    b_u = np.asarray(tr_u.shadow_blocked(p, d, limit))
    assert b_s.any() and (~b_s).any(), "degenerate shadow coverage"
    np.testing.assert_array_equal(b_s, b_u)


def test_scan_vs_unrolled_grad():
    tr_s, tr_u = _tracers()
    # diff mode: bounded differentiable SDF march (the production
    # gradient path, render/diff.py:249)
    tr_s.diff = True
    tr_u.diff = True
    p, d = _rays(n=64, seed=9)

    def mean_t(tr, pp):
        t, _, _, _ = tr.nearest(pp, d, matter_only=True, rng_rough=False)
        return jax.numpy.where(jax.numpy.isfinite(t), t, 0.0).sum()

    g_s = np.asarray(jax.grad(lambda pp: mean_t(tr_s, pp))(p))
    g_u = np.asarray(jax.grad(lambda pp: mean_t(tr_u, pp))(p))
    assert np.abs(g_s).max() > 0
    np.testing.assert_allclose(g_s, g_u, rtol=1e-12, atol=1e-12)


def test_pair_compact_vs_scan_shadow(monkeypatch):
    """A/B: the gate-compacted (ray, member) pair shadow equals the
    member-scanned form bit-exactly, including when the live pair count
    overflows capacity (the lax.cond fallback)."""
    monkeypatch.setenv("ACTINON_PAIR_COMPACT", "1")
    tr_s, _ = _tracers()
    cl = [c for c in tr_s._solo_clusters() if len(c) >= 2]
    cl = [c for c in cl if tr_s._pairs_ok(c)]
    assert cl, "scene must produce a pair-compactable cluster " \
        "(members need envelopes)"
    p, d = _rays(n=256, seed=11)
    limit = np.random.default_rng(13).uniform(0.1, 12.0, len(p))
    tabs = tr_s._assemble()
    for c in cl:
        dense = np.asarray(tr_s._solo_scan_shadow(c, tabs, p, d, limit))
        comp = np.asarray(tr_s._solo_pairs_shadow(c, tabs, p, d, limit))
        assert dense.any(), "degenerate: no blocked rays"
        np.testing.assert_array_equal(comp, dense)
    # whole-query equivalence under jit (the production entry)
    b_pair = np.asarray(jax.jit(tr_s.shadow_blocked)(p, d, limit))
    monkeypatch.setenv("ACTINON_PAIR_COMPACT", "0")
    tr_u = _tracers()[0]
    b_scan = np.asarray(jax.jit(tr_u.shadow_blocked)(p, d, limit))
    np.testing.assert_array_equal(b_pair, b_scan)


def test_pair_compact_overflow_fallback(monkeypatch):
    """Force a 1-slot capacity so every batch overflows: the cond must
    take the dense branch and stay exact."""
    import actinon_tpu.render.tracer as T
    monkeypatch.setenv("ACTINON_PAIR_COMPACT", "1")
    monkeypatch.setattr(T, "PAIR_K", 0, raising=True)
    tr, _ = _tracers()
    cl = [c for c in tr._solo_clusters()
          if len(c) >= 2 and tr._pairs_ok(c)]
    assert cl
    p, d = _rays(n=128, seed=17)
    limit = np.full(len(p), 8.0)
    tabs = tr._assemble()
    for c in cl:
        comp = np.asarray(tr._solo_pairs_shadow(c, tabs, p, d, limit))
        dense = np.asarray(tr._solo_scan_shadow(c, tabs, p, d, limit))
        np.testing.assert_array_equal(comp, dense)
    # the nearest-side dense fallback (_solo_pairs_hit's top-2
    # reduction of the scanned columns) must agree with the compacted
    # form taken at full capacity (round-4 advisor finding: the hit-side
    # cond had no overflow coverage)
    for c in cl:
        lo = [np.asarray(x) for x in
              tr._solo_pairs_hit(c, tabs, p, d)]       # PAIR_K=0: dense
        monkeypatch.setattr(T, "PAIR_K", 64, raising=True)
        hi = [np.asarray(x) for x in
              tr._solo_pairs_hit(c, tabs, p, d)]       # all pairs live
        monkeypatch.setattr(T, "PAIR_K", 0, raising=True)
        # same ulp band as the scan-vs-unroll tests: per-pair vs
        # per-member batching reorders the f64 contraction
        for a, b in zip(lo, hi):
            np.testing.assert_allclose(a, b, rtol=1e-7, atol=1e-8)


def test_pair_compact_vs_scan_nearest(monkeypatch):
    """A/B: pair-compacted cluster top-2 columns vs the member-scanned
    columns through the full nearest / transition query.

    _pairs_ok reads ACTINON_PAIR_COMPACT at TRACE time (inside
    nearest/trans_hit), not at Tracer construction — the env var must be
    flipped around every query call or both tracers silently take the
    same path (round-4 advisor finding: the A/B was comparing the
    compacted path to itself)."""
    monkeypatch.setenv("ACTINON_PAIR_COMPACT", "0")
    tr_scan, _ = _tracers()
    tr_pair, _ = _tracers()
    monkeypatch.setenv("ACTINON_PAIR_COMPACT", "1")
    assert any(tr_pair._pairs_ok(c) for c in tr_pair._solo_clusters())
    p, d = _rays(n=300, seed=21)
    monkeypatch.setenv("ACTINON_PAIR_COMPACT", "0")
    assert not tr_scan._pairs_ok(tr_scan._solo_clusters()[0])
    o_s = [np.asarray(x) for x in
           tr_scan.nearest(p, d, matter_only=False, rng_rough=False)]
    monkeypatch.setenv("ACTINON_PAIR_COMPACT", "1")
    assert tr_pair._pairs_ok(tr_pair._solo_clusters()[0])
    o_p = [np.asarray(x) for x in
           tr_pair.nearest(p, d, matter_only=False, rng_rough=False)]
    np.testing.assert_array_equal(o_s[2], o_p[2])        # oid
    np.testing.assert_array_equal(o_s[3], o_p[3])        # sign
    np.testing.assert_allclose(o_s[0], o_p[0], rtol=1e-7, atol=1e-8)
    np.testing.assert_allclose(o_s[1], o_p[1], rtol=1e-7, atol=1e-8)
    monkeypatch.setenv("ACTINON_PAIR_COMPACT", "0")
    t_s = [np.asarray(x) for x in tr_scan.trans_hit(p, d)]
    monkeypatch.setenv("ACTINON_PAIR_COMPACT", "1")
    t_p = [np.asarray(x) for x in tr_pair.trans_hit(p, d)]
    for a, b in zip(t_s, t_p):
        np.testing.assert_allclose(a, b, rtol=1e-7, atol=1e-8)
