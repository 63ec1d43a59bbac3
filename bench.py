"""Benchmark: wine_glass.acn forward rendering throughput on one chip.

Metric: ray-segment queries per second.  A "query" is one full-scene
ray traversal lane actually computed on the device: per wavefront step
each live ray costs 1 transition trace + 1 coincident-surface pass +
n_lights*direct_samples NEE light/shadow traversals (identical
accounting to the reference's recursive calls into
compound_s_ray_hit/ray_trans_hit, reference src/scene.c:420-667).

vs_baseline: ratio against the same workload executed by this
framework's own CPU path on this host (the C reference cannot be built
here -- its foundation library `beth` is not vendored, SURVEY.md
"external dependency caveat"), measured once and pinned below.

Run with --cpu-pin to re-measure the CPU baseline on this host
(JAX_PLATFORMS=cpu python bench.py --cpu-pin).

Prints ONE json line.
"""

import json
import os
import sys
import time

import numpy as np

# Pinned CPU-host throughput of this same benchmark (measured with
# JAX_PLATFORMS=cpu python bench.py --cpu-pin on this machine, f32,
# device-resident drain, 2026-08-20): queries/s, per timed pass only
# (warmup excluded from the query count).
CPU_BASELINE_QPS = 2.28e6

CONFIG = dict(width=200, height=150, direct=10, path=0, depth=25)


def main():
    cpu_pin = "--cpu-pin" in sys.argv
    if cpu_pin:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from actinon_tpu.acn.interp import run_file
    from actinon_tpu.render.integrator import Integrator
    from actinon_tpu.render.tracer import Tracer
    from actinon_tpu.scene import ir as sir

    captured = []
    run_file("/root/reference/src_acn/wine_glass.acn",
             render_fn=lambda sc, fn: captured.append(sc.clone()),
             args=["-f"])
    sc = captured[0]
    sc.cfg.image_width = CONFIG["width"]
    sc.cfg.image_height = CONFIG["height"]
    sc.cfg.direct_samples = CONFIG["direct"]
    sc.cfg.path_samples = CONFIG["path"]
    sc.cfg.trace_depth = CONFIG["depth"]
    cfg = sc.cfg

    ir = sir.compile_scene(sc)
    tracer = Tracer(ir, dtype=np.float32)
    integ = Integrator(tracer, batch=1 << 15)

    ys, xs = np.mgrid[0:cfg.image_height, 0:cfg.image_width]
    base = np.stack([xs.reshape(-1) + 0.5, ys.reshape(-1) + 0.5],
                    -1).astype(np.float64)

    def one_pass(jit_eps):
        # distinct subpixel positions per pass: the device tunnel memoizes
        # executions on identical inputs, so a repeated identical pass
        # would not measure real work
        return integ.run_samples(base + jit_eps)

    one_pass(0.0)                   # warmup/compile
    integ.rays_traced = 0
    t0 = time.time()
    one_pass(1e-4)
    dt = time.time() - t0
    qps = integ.rays_traced / dt

    print(json.dumps({
        "metric": "wine_glass_ray_queries_per_s_chip",
        "value": round(qps, 1),
        "unit": "queries/s",
        "vs_baseline": round(qps / CPU_BASELINE_QPS, 3),
    }))


if __name__ == "__main__":
    main()
