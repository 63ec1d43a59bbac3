"""Benchmark: forward (and forward+backward) rendering throughput on one
chip across the five BASELINE workloads.

Headline metric: ray-segment queries per second on wine_glass.acn.  A
"query" is one full-scene ray traversal lane actually computed on the
device: per wavefront step each live ray costs 1 transition trace + 1
coincident-surface pass + n_lights*direct_samples NEE light/shadow
traversals (identical accounting to the reference's recursive calls into
compound_s_ray_hit/ray_trans_hit, reference src/scene.c:420-667).

vs_baseline: ratio against the same workload executed by this
framework's own CPU path on this host (the C reference cannot be built
here -- its foundation library `beth` is not vendored, SURVEY.md
"external dependency caveat"), measured once and pinned below.

The `extra` field carries the secondary metrics:
  * per-scene forward queries/s for primitives, many_spheres, diamond,
    hanging_lamp (the remaining BASELINE.json configs)
  * fwd+bwd lane-bounces/s on wine_glass through
    DiffRenderer.value_and_grad (the differentiable path)

Run with --cpu-pin to re-measure the CPU baseline on this host
(python bench.py --cpu-pin).  Run with --quick for the headline metric
only.

Prints ONE json line.
"""

import json
import sys
import time

import numpy as np

# Pinned CPU-host throughput of this same benchmark (measured with
# python bench.py --cpu-pin on this machine, f32, device-resident drain,
# 2026-08-20): queries/s, per timed pass only (warmup excluded).
CPU_BASELINE_QPS = 2.28e6

SCENES = {
    # scene file: (width, height, direct, path, depth)
    "wine_glass": (200, 150, 10, 0, 25),
    "primitives": (200, 150, 10, 0, 11),
    "many_spheres": (160, 120, 10, 0, 11),
    "diamond": (160, 120, 10, 0, 25),
    "hanging_lamp": (160, 120, 6, 0, 25),
}


def _load(name, cfg5):
    from actinon_tpu.acn.interp import run_file

    captured = []
    run_file(f"/root/reference/src_acn/{name}.acn",
             render_fn=lambda sc, fn: captured.append(sc.clone()),
             args=["-f"])
    sc = captured[0]
    w, h, direct, path, depth = cfg5
    sc.cfg.image_width, sc.cfg.image_height = w, h
    sc.cfg.direct_samples = direct
    sc.cfg.path_samples = path
    sc.cfg.trace_depth = depth
    return sc


def _bench_forward(name, cfg5, batch=1 << 15):
    from actinon_tpu.render.integrator import Integrator
    from actinon_tpu.render.tracer import Tracer
    from actinon_tpu.scene import ir as sir

    sc = _load(name, cfg5)
    cfg = sc.cfg
    ir = sir.compile_scene(sc)
    integ = Integrator(Tracer(ir, dtype=np.float32), batch=batch)

    ys, xs = np.mgrid[0:cfg.image_height, 0:cfg.image_width]
    base = np.stack([xs.reshape(-1) + 0.5, ys.reshape(-1) + 0.5],
                    -1).astype(np.float64)

    # distinct subpixel positions per pass: the device tunnel memoizes
    # executions on identical inputs, so a repeated identical pass would
    # not measure real work
    integ.run_samples(base)            # warmup/compile
    integ.rays_traced = 0
    t0 = time.time()
    integ.run_samples(base + 1e-4)
    dt = time.time() - t0
    return integ.rays_traced / dt


def _bench_fwd_bwd(batch=1 << 13):
    """Forward+backward lane-bounces/s on wine_glass through the
    stochastic-replay differentiable integrator (render/diff.py)."""
    import jax
    from actinon_tpu.render.diff import DiffRenderer
    from actinon_tpu.render.integrator import Integrator
    from actinon_tpu.render.tracer import Tracer
    from actinon_tpu.scene import ir as sir

    sc = _load("wine_glass", SCENES["wine_glass"])
    ir = sir.compile_scene(sc)
    integ = Integrator(Tracer(ir, dtype=np.float32), batch=batch)
    dr = DiffRenderer(integ)

    cfg = ir.cfg
    rng = np.random.default_rng(3)
    pos = np.stack([rng.uniform(0, cfg.image_width, batch),
                    rng.uniform(0, cfg.image_height, batch)], -1)
    q0 = dr.primary(pos)
    params = dr.params()

    f = jax.jit(jax.value_and_grad(
        lambda ps: dr.render_loss(ps, q0)))
    val, grads = f(params)
    jax.block_until_ready((val, grads))    # warmup/compile
    t0 = time.time()
    val, grads = f(params)
    jax.block_until_ready((val, grads))
    dt = time.time() - t0
    # each of n_steps scan bounces traces every lane once (trans hit)
    # plus the per-bounce NEE block; count lane-bounces
    per_lane = dr.n_steps
    return batch * per_lane / dt


def main():
    cpu_pin = "--cpu-pin" in sys.argv
    quick = "--quick" in sys.argv
    if cpu_pin:
        import jax
        jax.config.update("jax_platforms", "cpu")

    qps = _bench_forward("wine_glass", SCENES["wine_glass"])
    if cpu_pin:
        print(json.dumps({"metric": "cpu_pin_wine_glass",
                          "value": round(qps, 1), "unit": "queries/s"}))
        return

    extra = {}
    if not quick:
        for name in ("primitives", "many_spheres", "diamond",
                     "hanging_lamp"):
            try:
                extra[f"{name}_qps"] = round(
                    _bench_forward(name, SCENES[name]), 1)
            except Exception as e:          # keep the headline alive
                extra[f"{name}_qps"] = f"error: {type(e).__name__}: {e}"
        try:
            extra["wine_glass_fwd_bwd_lane_bounces_per_s"] = round(
                _bench_fwd_bwd(), 1)
        except Exception as e:
            extra["wine_glass_fwd_bwd_lane_bounces_per_s"] = \
                f"error: {type(e).__name__}: {e}"

    print(json.dumps({
        "metric": "wine_glass_ray_queries_per_s_chip",
        "value": round(qps, 1),
        "unit": "queries/s",
        "vs_baseline": round(qps / CPU_BASELINE_QPS, 3),
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
