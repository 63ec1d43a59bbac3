"""Differentiable path: jax.grad vs central finite differences.

The diff renderer freezes its randomness in counters (sample_id, depth)
so the estimator is a smooth function of the scene parameters wherever no
visibility boundary is crossed; central differences must then match the
AD gradient (SURVEY.md section 7 step 6).
"""

import numpy as np
import pytest
import jax

from actinon_tpu.render.diff import DiffRenderer
from actinon_tpu.render.integrator import Integrator
from actinon_tpu.render.tracer import Tracer
from actinon_tpu.scene import ir as sir
from actinon_tpu.scene.objects import (
    PairInside, Plane, Scene, Sphere, apply_material, v3,
)


@pytest.fixture(autouse=True)
def _clear_jax_caches_per_test():
    """XLA:CPU segfaults inside backend_compile_and_load once enough
    compilations accumulate in one process (see conftest.py); this
    module compiles the heaviest programs in the suite (value_and_grad
    over multi-bounce replay chains), so it drops the caches after
    EVERY test, not just at the module boundary."""
    yield
    jax.clear_caches()


def make_scene(glass=False, lens=False, path_samples=0, direct_samples=4,
               depth=6, sigma=0.0):
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
    sc.push(floor)

    ball = Sphere(1.0)
    if glass:
        apply_material(ball, "glass")
    ball.move(v3(-0.8, 0, 1.2))
    sc.push(ball)

    if lens:
        # CSG lens: intersection of two offset spheres
        a = Sphere(1.4)
        a.move(v3(2.0, 1.0, 0.4))
        b = Sphere(1.4)
        b.move(v3(2.0, 1.0, 1.6))
        sc.push(PairInside(a, b))
    return sc


def setup(sc, n=24, seed=0, sel_mode="uniform"):
    # uniform branch selection: theta-independent probabilities make the
    # realized estimator FD-differentiable (see diff.py sel_mode)
    ir = sir.compile_scene(sc)
    tr = Tracer(ir, dtype=np.float64)
    integ = Integrator(tr, batch=n)
    dr = DiffRenderer(integ, sel_mode=sel_mode)
    rng = np.random.default_rng(seed)
    pos = np.stack([rng.uniform(0, sc.cfg.image_width, n),
                    rng.uniform(0, sc.cfg.image_height, n)], -1)
    q0 = dr.primary(pos)
    return dr, q0


def fd_check(dr, q0, leaf_path, flat_idx, delta, rtol, atol=1e-9):
    """Compare one AD gradient entry against central FD of the loss."""
    params = dr.params()
    loss_fn = lambda ps: dr.render_loss(ps, q0)
    val, grads = jax.value_and_grad(loss_fn)(params)

    group, key = leaf_path
    leaf = np.asarray(params[group][key], np.float64)
    g_ad = float(np.asarray(grads[group][key]).reshape(-1)[flat_idx])

    def eval_at(eps):
        pert = leaf.reshape(-1).copy()
        pert[flat_idx] += eps
        ps = {g: dict(v) for g, v in params.items()}
        ps[group][key] = pert.reshape(leaf.shape)
        return float(loss_fn(ps))

    g_fd = (eval_at(delta) - eval_at(-delta)) / (2 * delta)
    assert np.isfinite(val)
    assert abs(g_ad - g_fd) <= atol + rtol * max(abs(g_ad), abs(g_fd)), \
        (key, flat_idx, g_ad, g_fd)
    return g_ad, g_fd


class TestMaterialGrads:
    def test_light_radiance(self):
        dr, q0 = setup(make_scene())
        g_ad, g_fd = fd_check(dr, q0, ("mat", "l_rad"), 0, 1e-3, 1e-5)
        assert g_ad > 0   # brighter light -> brighter image

    def test_albedo(self):
        dr, q0 = setup(make_scene())
        # floor (object 1) green channel
        g_ad, _ = fd_check(dr, q0, ("mat", "m_color"), 1 * 3 + 1, 1e-4,
                           1e-4)
        assert g_ad > 0

    def test_background(self):
        dr, q0 = setup(make_scene())
        fd_check(dr, q0, ("mat", "background"), 2, 1e-4, 1e-5)

    def test_light_position(self):
        dr, q0 = setup(make_scene())
        fd_check(dr, q0, ("mat", "l_pos"), 2, 1e-4, 5e-3)

    def test_diffuse_weight(self):
        # the sample count floor(direct_samples * intensity * diffuse)
        # (reference src/scene.c:553-554) is a step function of the
        # diffuse weight: perturb away from an integer boundary
        sc = make_scene()
        sc.matter.elements[0].prp.diffuse_reflectivity = 0.7
        dr, q0 = setup(sc)
        fd_check(dr, q0, ("mat", "m_diffuse"), 1, 1e-4, 5e-3)


class TestRefractionGrads:
    def test_refractive_index(self):
        dr, q0 = setup(make_scene(glass=True), n=32, seed=1)
        # glass ball is object 2
        fd_check(dr, q0, ("mat", "m_rix"), 2, 1e-5, 2e-2)

    def test_transparency(self):
        dr, q0 = setup(make_scene(glass=True), n=32, seed=1)
        fd_check(dr, q0, ("mat", "m_transp"), 2 * 3 + 0, 1e-5, 2e-2)


class TestGeometryGrads:
    def test_sphere_radius(self):
        dr, q0 = setup(make_scene())
        # sphere table: lamp is row 0, diffuse ball row 1 (matter order)
        fd_check(dr, q0, ("geom", "sph_r"), 1, 1e-5, 2e-2)

    def test_sphere_center(self):
        dr, q0 = setup(make_scene())
        fd_check(dr, q0, ("geom", "sph_c"), 1 * 3 + 2, 1e-5, 2e-2)

    def test_plane_offset(self):
        dr, q0 = setup(make_scene())
        fd_check(dr, q0, ("geom", "pla_k"), 0, 1e-5, 2e-2)

    def test_csg_leaf_radius(self):
        dr, q0 = setup(make_scene(lens=True), n=32, seed=2)
        params = dr.params()
        assert "c0_l0_r" in params["geom"]
        fd_check(dr, q0, ("geom", "c0_l0_r"), 0, 1e-5, 3e-2)


class TestPathTracing:
    def test_path_albedo_grad(self):
        sc = make_scene(path_samples=2, depth=14, sigma=0.29)
        dr, q0 = setup(sc, n=24, seed=3)
        fd_check(dr, q0, ("mat", "m_color"), 1 * 3 + 0, 1e-4, 5e-3)


def test_radiance_matches_forward_expectation():
    """With a single active branch chain (no branching), the stochastic
    path replay must agree with the wavefront integrator exactly when both
    use counter seeding."""
    from actinon_tpu.render.integrator import RayQueue

    sc = make_scene()   # diffuse only: no specular children at all
    ir = sir.compile_scene(sc)
    tr = Tracer(ir, dtype=np.float64)
    integ = Integrator(tr, batch=64)
    dr = DiffRenderer(integ)

    rng = np.random.default_rng(5)
    n = 32
    pos = np.stack([rng.uniform(0, sc.cfg.image_width, n),
                    rng.uniform(0, sc.cfg.image_height, n)], -1)
    q0 = dr.primary(pos)
    rad = np.asarray(dr.radiance(dr.params(), q0))

    integ.seed_mode = "counter"
    integ._step_normal = jax.jit(
        lambda q: integ._step(q, path_ray=False))
    from actinon_tpu.render.driver import camera_rays
    p, d = camera_rays(ir, pos, np.float64)
    primary = RayQueue(p, d, np.ones(n, np.float64),
                       np.ones((n, 3), np.float64),
                       np.full(n, sc.cfg.trace_depth, np.int32),
                       np.arange(n, dtype=np.int32))
    integ.device_drain = False
    acc = integ.run(primary, n)
    np.testing.assert_allclose(rad, acc, rtol=1e-8, atol=1e-10)


class TestEdgeAwareVisibility:
    """Silhouette boundary term (integrator._nee_edge_terms): occluder
    geometry gradients across shadow edges.  The shading rays are
    injected below the occluder so primaries never hit it: the ONLY
    dependence of the image on the occluder center is the moving shadow
    edge, which interior-only AD reports as (near-)zero and the
    edge-aware estimator must recover (matching central FD)."""

    N = 512

    @staticmethod
    def _scene():
        sc = Scene()
        cfg = sc.cfg
        cfg.image_width, cfg.image_height = 8, 6
        cfg.trace_depth = 3
        cfg.direct_samples = 64
        cfg.path_samples = 0
        cfg.background_color = (0.0, 0.0, 0.0)

        lamp = Sphere(0.5)
        lamp.prp.radiance = 25.0
        lamp.move(v3(0, 0, 5))
        sc.push(lamp)

        floor = Plane()                       # z = 0, normal +z
        floor.prp.fresnel_reflectivity = 0.0  # pure diffuse
        sc.push(floor)

        occ = Sphere(0.6)                     # between floor and lamp
        occ.prp.fresnel_reflectivity = 0.0
        occ.move(v3(0.8, 0.0, 2.0))
        sc.push(occ)
        return sc

    def _setup(self, edge_aware, seed=11):
        import jax.numpy as jnp
        sc = self._scene()
        ir = sir.compile_scene(sc)
        n = self.N
        tr = Tracer(ir, dtype=np.float64)
        integ = Integrator(tr, batch=n)
        dr = DiffRenderer(integ, sel_mode="uniform", edge_aware=edge_aware)
        # downward rays over the penumbra band, started below the occluder
        rng = np.random.default_rng(seed)
        px = rng.uniform(-0.3, 0.5, n)
        py = rng.uniform(-0.4, 0.4, n)
        p = np.stack([px, py, np.full(n, 0.5)], -1)
        d = np.tile(np.array([0.0, 0.0, -1.0]), (n, 1))
        q0 = {
            "p": jnp.asarray(p), "d": jnp.asarray(d),
            "intensity": jnp.ones((n,), np.float64),
            "tint": jnp.ones((n, 3), np.float64),
            "depth": jnp.full((n,), sc.cfg.trace_depth, np.int32),
            "sample_id": jnp.arange(n, dtype=np.int32),
            "is_path": jnp.zeros((n,), bool),
        }
        return dr, q0

    def _grads(self, edge_aware, delta=2e-2):
        dr, q0 = self._setup(edge_aware)
        params = dr.params()
        loss_fn = lambda ps: dr.render_loss(ps, q0)
        val, grads = jax.value_and_grad(loss_fn)(params)
        # occluder = sphere-table row 1 (lamp row 0); x component
        g_ad = float(np.asarray(grads["geom"]["sph_c"]).reshape(-1)[3 + 0])

        leaf = np.asarray(params["geom"]["sph_c"], np.float64)

        def eval_at(eps):
            pert = leaf.reshape(-1).copy()
            pert[3 + 0] += eps
            ps = {g: dict(v) for g, v in params.items()}
            ps["geom"]["sph_c"] = pert.reshape(leaf.shape)
            return float(loss_fn(ps))

        g_fd = (eval_at(delta) - eval_at(-delta)) / (2 * delta)
        return val, g_ad, g_fd

    def test_edge_term_matches_fd(self):
        val, g_ad, g_fd = self._grads(edge_aware=True)
        assert np.isfinite(val)
        # shadow-edge derivative is macroscopic; MC/quadrature noise
        # bounds the agreement
        assert abs(g_fd) > 1e-3
        assert abs(g_ad - g_fd) <= 0.25 * abs(g_fd), (g_ad, g_fd)

    def test_interior_only_gradient_is_wrong(self):
        _, g_ad, g_fd = self._grads(edge_aware=False)
        # interior-only AD misses the shadow-edge derivative entirely
        assert abs(g_ad - g_fd) > 0.5 * abs(g_fd), (g_ad, g_fd)


class TestEdgeAwarePlaneAndCSG:
    """Generalized silhouette boundary terms: a half-space occluder whose
    boundary cuts the light sphere (the discontinuity curve is the
    plane∩light rim circle) and a CSG intersection occluder (leaf-sphere
    silhouette arcs masked by the composite's actual blocking jump)."""

    N = 512

    @staticmethod
    def _scene_plane():
        sc = Scene()
        cfg = sc.cfg
        cfg.image_width, cfg.image_height = 8, 6
        cfg.trace_depth = 3
        cfg.direct_samples = 64
        cfg.path_samples = 0
        cfg.background_color = (0.0, 0.0, 0.0)

        lamp = Sphere(0.5)
        lamp.prp.radiance = 25.0
        lamp.move(v3(0, 0, 5))
        sc.push(lamp)

        floor = Plane()
        floor.prp.fresnel_reflectivity = 0.0
        sc.push(floor)

        # vertical half-space, solid x > 0.2: its boundary plane cuts the
        # lamp sphere (x in [-0.5, 0.5]), so the rim circle is the only
        # way the image depends on the plane offset
        occ = Plane()
        occ.prp.fresnel_reflectivity = 0.0
        occ.prp.rax = np.array([[0., 1., 0.], [0., 0., 1.], [-1., 0., 0.]])
        occ.move(v3(0.2, 0, 0))
        sc.push(occ)
        return sc

    @staticmethod
    def _scene_csg():
        sc = Scene()
        cfg = sc.cfg
        cfg.image_width, cfg.image_height = 8, 6
        cfg.trace_depth = 3
        cfg.direct_samples = 64
        cfg.path_samples = 0
        cfg.background_color = (0.0, 0.0, 0.0)

        lamp = Sphere(0.5)
        lamp.prp.radiance = 25.0
        lamp.move(v3(0, 0, 5))
        sc.push(lamp)

        floor = Plane()
        floor.prp.fresnel_reflectivity = 0.0
        sc.push(floor)

        a = Sphere(0.6)
        a.move(v3(0.7, 0.0, 2.0))
        b = Sphere(0.6)
        b.move(v3(1.0, 0.0, 2.0))
        lens = PairInside(a, b)
        lens.prp.fresnel_reflectivity = 0.0
        sc.push(lens)
        return sc

    def _grads(self, sc, pick, edge_aware=True, band=(-0.4, 0.4)):
        import jax.numpy as jnp
        ir = sir.compile_scene(sc)
        n = self.N
        tr = Tracer(ir, dtype=np.float64)
        integ = Integrator(tr, batch=n)
        dr = DiffRenderer(integ, sel_mode="uniform", edge_aware=edge_aware)
        rng = np.random.default_rng(13)
        px = rng.uniform(band[0], band[1], n)
        py = rng.uniform(-0.4, 0.4, n)
        p = np.stack([px, py, np.full(n, 0.5)], -1)
        d = np.tile(np.array([0.0, 0.0, -1.0]), (n, 1))
        q0 = {
            "p": jnp.asarray(p), "d": jnp.asarray(d),
            "intensity": jnp.ones((n,), np.float64),
            "tint": jnp.ones((n, 3), np.float64),
            "depth": jnp.full((n,), sc.cfg.trace_depth, np.int32),
            "sample_id": jnp.arange(n, dtype=np.int32),
            "is_path": jnp.zeros((n,), bool),
        }
        params = dr.params()
        loss_fn = lambda ps: dr.render_loss(ps, q0)
        val, grads = jax.value_and_grad(loss_fn)(params)
        key, flat_idx = pick
        g_ad = float(np.asarray(grads["geom"][key]).reshape(-1)[flat_idx])

        leaf = np.asarray(params["geom"][key], np.float64)
        delta = 2e-2

        def eval_at(eps):
            pert = leaf.reshape(-1).copy()
            pert[flat_idx] += eps
            ps = {g: dict(v) for g, v in params.items()}
            ps["geom"][key] = pert.reshape(leaf.shape)
            return float(loss_fn(ps))

        g_fd = (eval_at(delta) - eval_at(-delta)) / (2 * delta)
        return val, g_ad, g_fd

    def test_plane_offset_edge_matches_fd(self):
        # occluder plane is pla row 1 (floor is row 0); param k
        val, g_ad, g_fd = self._grads(self._scene_plane(), ("pla_k", 1),
                                      band=(-0.5, 0.1))
        assert np.isfinite(val)
        assert abs(g_fd) > 1e-3
        assert abs(g_ad - g_fd) <= 0.3 * abs(g_fd), (g_ad, g_fd)

    def test_csg_sphere_leaf_edge_matches_fd(self):
        # the lens's LEFT edge (the one the shadow rays graze) is leaf
        # B's surface: perturb c0_l1_c x (leaf A owns the far edge and
        # correctly yields ~zero FD from this band)
        val, g_ad, g_fd = self._grads(self._scene_csg(), ("c0_l1_c", 0),
                                      band=(0.1, 0.9))
        assert np.isfinite(val)
        assert abs(g_fd) > 1e-3
        assert abs(g_ad - g_fd) <= 0.3 * abs(g_fd), (g_ad, g_fd)


class TestEdgeAwareQuadricAndLight:
    """Round-4 extensions of the silhouette boundary term: quadric
    occluders (ellipsoid via the unit-izing affine map, cylinder via its
    tangent generator lines) and edge terms against a NON-sphere light
    (ellipsoid emitter, detached true-geometry light hit)."""

    N = 512

    @staticmethod
    def _base():
        from actinon_tpu.scene.objects import Squaroid
        sc = Scene()
        cfg = sc.cfg
        cfg.image_width, cfg.image_height = 8, 6
        cfg.trace_depth = 3
        cfg.direct_samples = 64
        cfg.path_samples = 0
        cfg.background_color = (0.0, 0.0, 0.0)

        floor = Plane()
        floor.prp.fresnel_reflectivity = 0.0
        sc.push(floor)
        return sc, Squaroid

    def _scene_ellipsoid(self):
        sc, Squaroid = self._base()
        lamp = Sphere(0.5)
        lamp.prp.radiance = 25.0
        lamp.move(v3(0, 0, 5))
        sc.push(lamp)

        occ = Squaroid.ellipsoid(0.7, 0.4, 0.3)
        occ.prp.fresnel_reflectivity = 0.0
        occ.move(v3(0.8, 0.0, 2.0))
        sc.push(occ)
        return sc

    def _scene_cylinder(self):
        sc, Squaroid = self._base()
        lamp = Sphere(0.5)
        lamp.prp.radiance = 25.0
        lamp.move(v3(0, 0, 5))
        sc.push(lamp)

        # cylinder along y (horizontal) above the shadow band: its two
        # silhouette generator lines are the only moving shadow edges
        occ = Squaroid.cylinder(0.35, 0.35)
        occ.prp.fresnel_reflectivity = 0.0
        from actinon_tpu.scene.objects import rot_x
        import math
        occ.rotate(rot_x(math.pi / 2))
        occ.move(v3(0.8, 0.0, 2.0))
        sc.push(occ)
        return sc

    def _scene_ellipsoid_light(self):
        from actinon_tpu.scene.objects import estimate_envelope
        sc, Squaroid = self._base()
        lamp = Squaroid.ellipsoid(0.55, 0.45, 0.35)
        lamp.prp.radiance = 25.0
        lamp.move(v3(0, 0, 5))
        lamp.prp.envelope = estimate_envelope(lamp)
        sc.push(lamp)

        occ = Sphere(0.6)
        occ.prp.fresnel_reflectivity = 0.0
        occ.move(v3(0.8, 0.0, 2.0))
        sc.push(occ)
        return sc

    def _grads(self, sc, pick, band, delta=2e-2):
        import jax.numpy as jnp
        ir = sir.compile_scene(sc)
        n = self.N
        tr = Tracer(ir, dtype=np.float64)
        integ = Integrator(tr, batch=n)
        dr = DiffRenderer(integ, sel_mode="uniform", edge_aware=True)
        rng = np.random.default_rng(17)
        px = rng.uniform(band[0], band[1], n)
        py = rng.uniform(-0.4, 0.4, n)
        p = np.stack([px, py, np.full(n, 0.5)], -1)
        d = np.tile(np.array([0.0, 0.0, -1.0]), (n, 1))
        q0 = {
            "p": jnp.asarray(p), "d": jnp.asarray(d),
            "intensity": jnp.ones((n,), np.float64),
            "tint": jnp.ones((n, 3), np.float64),
            "depth": jnp.full((n,), sc.cfg.trace_depth, np.int32),
            "sample_id": jnp.arange(n, dtype=np.int32),
            "is_path": jnp.zeros((n,), bool),
        }
        params = dr.params()
        loss_fn = lambda ps: dr.render_loss(ps, q0)
        val, grads = jax.value_and_grad(loss_fn)(params)
        key, flat_idx = pick
        g_ad = float(np.asarray(grads["geom"][key]).reshape(-1)[flat_idx])

        leaf = np.asarray(params["geom"][key], np.float64)

        def eval_at(eps):
            pert = leaf.reshape(-1).copy()
            pert[flat_idx] += eps
            ps = {g: dict(v) for g, v in params.items()}
            ps["geom"][key] = pert.reshape(leaf.shape)
            return float(loss_fn(ps))

        g_fd = (eval_at(delta) - eval_at(-delta)) / (2 * delta)
        return val, g_ad, g_fd

    def test_ellipsoid_occluder_edge_matches_fd(self):
        # the occluder is the only quadric: qua_m0 x component moves its
        # shadow edge (m0 = M @ (-pos): x entry of row 0)
        val, g_ad, g_fd = self._grads(self._scene_ellipsoid(),
                                      ("qua_m0", 0), band=(-0.2, 0.6))
        assert np.isfinite(val)
        assert abs(g_fd) > 1e-3
        assert abs(g_ad - g_fd) <= 0.3 * abs(g_fd), (g_ad, g_fd)

    def test_cylinder_occluder_edge_matches_fd(self):
        val, g_ad, g_fd = self._grads(self._scene_cylinder(),
                                      ("qua_m0", 0), band=(-0.2, 0.6))
        assert np.isfinite(val)
        assert abs(g_fd) > 1e-3
        assert abs(g_ad - g_fd) <= 0.3 * abs(g_fd), (g_ad, g_fd)

    def test_sphere_edge_vs_ellipsoid_light_matches_fd(self):
        import os
        import subprocess
        import sys
        if os.environ.get("ACTINON_EDGE_CHILD"):
            # occluder sphere is sph row 0 (the light is a quadric)
            val, g_ad, g_fd = self._grads(self._scene_ellipsoid_light(),
                                          ("sph_c", 0), band=(-0.3, 0.5))
            assert np.isfinite(val)
            assert abs(g_fd) > 1e-3
            assert abs(g_ad - g_fd) <= 0.35 * abs(g_fd), (g_ad, g_fd)
            return
        # XLA:CPU deterministically SEGFAULTS compiling this test's VJP
        # when the rest of this file's compilations ran in the same
        # process (reproduced at jax 0.8.x: backend_compile_and_load
        # crashes; standalone the same program compiles and passes every
        # time).  Run it in a fresh interpreter until the upstream
        # compiler bug is fixed.
        env = dict(os.environ)
        env["ACTINON_EDGE_CHILD"] = "1"
        r = subprocess.run(
            [sys.executable, "-m", "pytest",
             __file__ + "::TestEdgeAwareQuadricAndLight::"
             "test_sphere_edge_vs_ellipsoid_light_matches_fd",
             "-q", "-p", "no:cacheprovider"],
            env=env, capture_output=True, text=True, timeout=900)
        assert r.returncode == 0, (r.stdout[-1500:], r.stderr[-800:])


def test_edge_coverage_warning():
    """Diff-mode scenes with uncovered occluder classes (SDF, cone)
    must surface an EdgeCoverageWarning; fully covered scenes must not
    (round-4 verdict next #8)."""
    import warnings
    from actinon_tpu.render.diff import (EdgeCoverageWarning,
                                         edge_coverage_gaps)
    from actinon_tpu.scene.objects import Squaroid, make_torus

    sc = make_scene()
    t = make_torus(1.2, 0.3)
    t.move(v3(4.0, 2.0, 1.0))
    sc.push(t)
    cone = Squaroid.cone(1.0, 1.0, 1.0)
    cone.move(v3(-4.0, 2.0, 1.0))
    sc.push(cone)
    integ = Integrator(Tracer(sir.compile_scene(sc), dtype=np.float64),
                       batch=64)
    gaps = edge_coverage_gaps(integ.tr)
    assert "SDF object" in gaps
    assert "cone/hyperboloid quadric" in gaps
    with pytest.warns(EdgeCoverageWarning):
        DiffRenderer(integ, edge_aware=True)

    sc2 = make_scene(lens=True)
    integ2 = Integrator(Tracer(sir.compile_scene(sc2), dtype=np.float64),
                        batch=64)
    assert not edge_coverage_gaps(integ2.tr)
    with warnings.catch_warnings():
        warnings.simplefilter("error", EdgeCoverageWarning)
        DiffRenderer(integ2, edge_aware=True)


class TestSdfGrads:
    """Implicit-function gradients through standalone SDF objects
    (round-4 verdict next #6): the march stays a detached root-finder,
    but the converged offset carries dt*/dθ = -(∂f/∂θ)/(∂f/∂t)."""

    def _scene_torus(self):
        # the torus must not touch the other objects: intersecting
        # surfaces create coincident-hit argmin ties that flip under FD
        # perturbation (a genuine discontinuity, not a gradient error)
        from actinon_tpu.scene.objects import make_torus, rot_x
        sc = make_scene()
        t = make_torus(0.7, 0.2)
        t.rotate(rot_x(1.1))
        t.move(v3(1.4, 0.8, 1.9))
        sc.push(t)
        return sc

    # seed 6 is a pixel set whose rays actually shade the torus (the
    # 8x6 image shows it in few pixels; other seeds miss it entirely
    # and would make the FD checks vacuous 0 == 0 comparisons).  FD
    # delta is 1e-6: at 1e-5 the perturbation crosses a shadow-edge
    # visibility boundary (boolean flip, a genuine discontinuity) and
    # central differences measure the jump instead of the slope

    def test_sdf_params_exported(self):
        dr, q0 = setup(self._scene_torus(), n=24, seed=6)
        g = dr.params()["geom"]
        assert "sdfs0_m" in g and "sdfs0_m0" in g and "sdfs0_prm" in g

    def test_torus_ex_radius(self):
        # prm = ex_radius / ring_radius (unit-ring local frame)
        dr, q0 = setup(self._scene_torus(), n=32, seed=6)
        g_ad, _ = fd_check(dr, q0, ("geom", "sdfs0_prm"), 0, 1e-6, 3e-2)
        assert g_ad != 0

    def test_torus_translate(self):
        # m0 shifts the local frame: the world-space translation
        dr, q0 = setup(self._scene_torus(), n=32, seed=6)
        g_ad, _ = fd_check(dr, q0, ("geom", "sdfs0_m0"), 2, 1e-6, 3e-2)
        assert g_ad != 0

    def test_torus_frame(self):
        # one rotation/scale entry of the local frame matrix
        dr, q0 = setup(self._scene_torus(), n=32, seed=6)
        g_ad, _ = fd_check(dr, q0, ("geom", "sdfs0_m"), 4, 1e-6, 3e-2)
        assert g_ad != 0
