"""Sharded production drain vs the single-device drain (8-device virtual
CPU mesh via conftest).  The shard_map drain must reproduce the
single-device render exactly (disjoint per-sample accumulation; only the
pmax loop condition crosses devices)."""

import numpy as np
import pytest

from actinon_tpu.acn.interp import run_file
from actinon_tpu.parallel.mesh import make_mesh, ShardedIntegrator
from actinon_tpu.render.integrator import Integrator
from actinon_tpu.render.tracer import Tracer
from actinon_tpu.scene import ir as sir


def _scene(width=20, height=16, direct=3, depth=6):
    captured = []
    run_file("/root/reference/src_acn/wine_glass.acn",
             render_fn=lambda sc, fn: captured.append(sc.clone()),
             args=["-f"])
    sc = captured[0]
    sc.cfg.image_width, sc.cfg.image_height = width, height
    sc.cfg.direct_samples = direct
    sc.cfg.path_samples = 0
    sc.cfg.trace_depth = depth
    return sir.compile_scene(sc)


def test_sharded_drain_matches_single_device():
    import jax
    ir = _scene()
    n = min(8, len(jax.devices()))
    mesh = make_mesh(n)
    sh = ShardedIntegrator(Tracer(ir, dtype=np.float32), mesh,
                           batch=n * 256)

    cfg = ir.cfg
    ys, xs = np.mgrid[0:cfg.image_height, 0:cfg.image_width]
    pos = np.stack([xs.reshape(-1) + 0.5, ys.reshape(-1) + 0.5],
                   -1).astype(np.float64)
    acc_sh = sh.run_samples(pos)

    single = Integrator(Tracer(ir, dtype=np.float32), batch=1 << 10)
    acc_1 = single.run_device(None, len(pos), pos_xy=pos)

    assert np.abs(acc_sh - acc_1).max() < 2e-5
    assert sh.last_balance is not None and 0 < sh.last_balance <= 1.0
    # the queue math must never drop rays on this workload
    assert np.isfinite(acc_sh).all()


def test_sharded_drain_nondivisible_n():
    """Sample counts not divisible by the device count pad with dead
    samples that must contribute exactly zero."""
    import jax
    ir = _scene(width=7, height=5)
    n = min(8, len(jax.devices()))
    mesh = make_mesh(n)
    sh = ShardedIntegrator(Tracer(ir, dtype=np.float32), mesh,
                           batch=n * 64)
    cfg = ir.cfg
    ys, xs = np.mgrid[0:cfg.image_height, 0:cfg.image_width]
    pos = np.stack([xs.reshape(-1) + 0.5, ys.reshape(-1) + 0.5],
                   -1).astype(np.float64)
    assert len(pos) % n != 0
    acc_sh = sh.run_samples(pos)
    single = Integrator(Tracer(ir, dtype=np.float32), batch=1 << 9)
    acc_1 = single.run_device(None, len(pos), pos_xy=pos)
    assert np.abs(acc_sh - acc_1).max() < 2e-5
