"""Pallas kernels vs the XLA tracer (interpret mode on CPU).

The fused kernels bake the same unified-leaf math (tracer.py) into
straight-line VPU code; these tests check exact agreement on randomized
rays over the corpus scenes with analytic geometry."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from actinon_tpu.acn.interp import run_file
from actinon_tpu.render.tracer import Tracer
from actinon_tpu.render import pallas_kernels as pk
from actinon_tpu.scene import ir as sir

SCENES = ["wine_glass.acn", "primitives.acn", "diamond.acn"]


def _load(name):
    captured = []
    run_file(f"/root/reference/src_acn/{name}",
             render_fn=lambda sc, fn: captured.append(sc.clone()),
             args=["-f"])
    return sir.compile_scene(captured[0])


def _rays(ir, n, seed=0):
    rng = np.random.default_rng(seed)
    lo = np.array([-15.0, -15.0, -15.0])
    hi = np.array([15.0, 15.0, 15.0])
    p = rng.uniform(lo, hi, (n, 3)).astype(np.float32)
    d = rng.normal(0, 1, (n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(p), jnp.asarray(d)


@pytest.mark.parametrize("scene", SCENES)
def test_shadow_kernel_matches_xla(scene):
    ir = _load(scene)
    tr = Tracer(ir, dtype=np.float32)
    p, d = _rays(ir, 512)
    limit = jnp.asarray(
        np.random.default_rng(1).uniform(0.1, 30.0, 512).astype(np.float32))

    fn, rest = pk.build_shadow_kernel(tr, interpret=True)
    got = np.asarray(fn(p, d, limit))
    if rest or tr.sdf_singles:
        tabs = tr._assemble()
        extra = jnp.zeros(512, bool)
        for comp in rest:
            extra = extra | tr._shadow_composite(comp, tabs, p, d, limit)
        for lf, oid, env_c, env_r, light in tr.sdf_singles:
            if light:
                continue
            a, _ = tr._hit_sdf_leaf(lf, env_c, env_r, p, d)
            extra = extra | (a <= limit)
        got = got | np.asarray(extra)

    want = np.asarray(tr.shadow_blocked(p, d, limit))
    agree = (got == want).mean()
    # eps-boundary rays may classify differently in fused fp order;
    # demand near-exact agreement
    assert agree >= 0.998, f"{scene}: agreement {agree}"


def test_nee_kernel_unsupported_scene_falls_back():
    """diamond.acn's 56-plane CSG exceeds MAX_COMP_COLS: the NEE kernel
    must decline (integrator._nee then runs the XLA path, which the
    integrator oracle tests cover)."""
    from actinon_tpu.render.integrator import Integrator

    ir = _load("diamond.acn")
    ir.cfg.direct_samples = 6
    integ = Integrator(Tracer(ir, dtype=np.float32), batch=256)
    assert pk.build_nee_kernel(integ, interpret=True) is None


@pytest.mark.parametrize("scene", ["wine_glass.acn"])
def test_nee_kernel_matches_xla(scene):
    """The fused NEE kernel reproduces integrator._nee (both f32)."""
    from actinon_tpu.render.integrator import Integrator

    ir = _load(scene)
    # cap the per-light sample count: interpret-mode Pallas statically
    # unrolls direct_cap draws, and the scene's own config (wine_glass:
    # 200) would take >10 min — the kernel math is identical at 6
    ir.cfg.direct_samples = 6
    tr = Tracer(ir, dtype=np.float32)
    integ = Integrator(tr, batch=256)
    kfn = pk.build_nee_kernel(integ, interpret=True)
    assert kfn is not None

    B = 256
    rng = np.random.default_rng(7)
    pos = rng.uniform(-6, 6, (B, 3)).astype(np.float32)
    sd = rng.normal(0, 1, (B, 3)).astype(np.float32)
    sd /= np.linalg.norm(sd, axis=-1, keepdims=True)
    di = rng.uniform(0, 1.2, B).astype(np.float32)
    gate = rng.uniform(0, 1, B) > 0.3
    theta_i = rng.uniform(0, np.pi * 0.999, B).astype(np.float32)
    sigma = rng.uniform(0, 0.4, B).astype(np.float32)
    sig2 = sigma * sigma
    on_a = np.where(sigma > 0, 1.0 - 0.5 * sig2 / (sig2 + 0.33),
                    1.0).astype(np.float32)
    on_b = np.where(sigma > 0, 0.45 * sig2 / (sig2 + 0.09),
                    0.0).astype(np.float32)
    prj = rng.normal(0, 1, (B, 3)).astype(np.float32)
    prj /= np.linalg.norm(prj, axis=-1, keepdims=True)
    rv = rng.integers(0, 2 ** 32, B, dtype=np.uint32)
    ns = np.minimum(np.maximum(
        (integ.direct_cap * di).astype(np.int32), 1), integ.direct_cap)

    got = np.asarray(kfn(
        jnp.asarray(pos), jnp.asarray(sd),
        jnp.asarray(np.where(gate, di, 0.0).astype(np.float32)),
        jnp.asarray(np.cos(theta_i)), jnp.asarray(on_a), jnp.asarray(on_b),
        jnp.asarray(prj), jnp.asarray(rv), jnp.asarray(ns)))
    want = np.asarray(integ._nee(
        jnp.asarray(pos), jnp.asarray(sd), jnp.asarray(di),
        jnp.asarray(gate), jnp.asarray(theta_i), jnp.asarray(on_a),
        jnp.asarray(on_b), jnp.asarray(prj), jnp.asarray(rv)))
    want = np.where(gate[:, None], want, 0.0)

    # knife-edge shadow/fov lanes may flip under fused fp order: demand
    # near-exact agreement on the overwhelming majority
    rel = np.abs(got - want) / (np.abs(want) + 1e-4)
    frac = (rel.max(axis=1) < 1e-2).mean()
    assert frac >= 0.99, f"{scene}: only {frac} of lanes agree"


def test_coverage_split():
    ir = _load("wine_glass.acn")
    tr = Tracer(ir, dtype=np.float32)
    singles, comps, rest = pk.kernel_coverage(tr, matter_only=True)
    # wine_glass: floor plane single + two analytic composites
    assert len(singles) == 1
    assert len(comps) == 2
    assert not rest
