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


def test_coverage_split():
    ir = _load("wine_glass.acn")
    tr = Tracer(ir, dtype=np.float32)
    singles, comps, rest = pk.kernel_coverage(tr, matter_only=True)
    # wine_glass: floor plane single + two analytic composites
    assert len(singles) == 1
    assert len(comps) == 2
    assert not rest
