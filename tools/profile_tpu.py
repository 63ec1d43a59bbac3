"""Component-level timing of the production drain on real TPU.

Round-3 verdict #4: utilization is ~0.01% of bf16 peak / 5% of HBM —
find where the time goes.  jax.profiler traces may not survive the axon
tunnel, so this measures the drain's constituent device programs
directly at the bench batch size:

  * trans_hit (the XLA top-2 scene traversal)
  * the fused Pallas NEE block (shadow+light sampling)
  * the full _step (trans + NEE + shading + child emission)
  * one full drain trip (step + compaction + queue update)
  * the end-to-end drain (adds host chunking + dispatch)

Usage: python tools/profile_tpu.py [scene] [batch_log2]
"""
import os
import sys
import time

# repo root on the path (bench.py lives there); PYTHONPATH is NOT used —
# on this image it breaks the TPU plugin registration
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    # force a value fetch: the tunnel defers execution until data is read
    np.asarray(jax.tree.leaves(out)[0])
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(out)
        np.asarray(jax.tree.leaves(out)[0])
        ts.append(time.time() - t0)
    return min(ts)


def main():
    scene = sys.argv[1] if len(sys.argv) > 1 else "wine_glass"
    blog = int(sys.argv[2]) if len(sys.argv) > 2 else 15
    import bench
    from actinon_tpu import compile_cache
    compile_cache.enable()
    B = 1 << blog
    integ = bench._integrator(scene, bench.SCENES[scene], B)
    tr = integ.tr
    dt = integ.dtype
    print(f"scene={scene} B={B} leaves={len(tr.tab)} "
          f"composites={len(tr.composites)} lights={integ.n_lights} "
          f"direct_cap={integ.direct_cap}")

    rng = np.random.default_rng(0)
    p = jnp.asarray(rng.uniform(-5, 5, (B, 3)).astype(dt))
    d = rng.normal(0, 1, (B, 3)).astype(dt)
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    lim = jnp.asarray(rng.uniform(0.5, 20, B).astype(dt))

    t_trans = timeit(jax.jit(tr.trans_hit), p, d)
    print(f"trans_hit:        {t_trans*1e3:8.2f} ms  "
          f"({B/t_trans/1e6:.2f}M lanes/s)")

    t_shadow = timeit(jax.jit(tr.shadow_blocked), p, d, lim)
    print(f"shadow_blocked:   {t_shadow*1e3:8.2f} ms")

    kfn = integ._nee_kernel_fn()
    sd = -d
    di = jnp.ones((B,), dt)
    ct = jnp.asarray(rng.uniform(0, 1, B).astype(dt))
    ona = jnp.ones((B,), dt)
    onb = jnp.zeros((B,), dt)
    rv = jnp.asarray(rng.integers(0, 2**32, B, dtype=np.uint32))
    ns = jnp.full((B,), integ.direct_cap, jnp.int32)
    if kfn is not None:
        t_nee = timeit(jax.jit(kfn), p, sd, di, ct, ona, onb, d, rv, ns)
        print(f"nee kernel:       {t_nee*1e3:8.2f} ms  "
              f"({B*integ.direct_cap*integ.n_lights/t_nee/1e6:.1f}M "
              f"samples/s)")
    else:
        gate = jnp.ones((B,), bool)
        th = jnp.arccos(ct)
        t_nee = timeit(jax.jit(lambda *a: integ._nee(*a)),
                       p, sd, di, gate, th, ona, onb, d, rv)
        print(f"nee XLA:          {t_nee*1e3:8.2f} ms")

    q = dict(p=p, d=d, intensity=jnp.ones((B,), dt),
             tint=jnp.ones((B, 3), dt),
             depth=jnp.full((B,), integ.cfg.trace_depth, jnp.int32),
             sample_id=jnp.arange(B, dtype=jnp.int32))
    t_step = timeit(jax.jit(lambda q: integ._step(q, path_ray=False)), q)
    print(f"full _step:       {t_step*1e3:8.2f} ms "
          f"(trans {t_trans/t_step:.0%}, nee {t_nee/t_step:.0%})")

    # end-to-end drain at bench shape
    cfg = integ.cfg
    ys, xs = np.mgrid[0:cfg.image_height, 0:cfg.image_width]
    base = np.stack([xs.reshape(-1) + 0.5, ys.reshape(-1) + 0.5],
                    -1).astype(np.float64)
    integ.run_samples(base)
    integ.rays_traced = 0
    t0 = time.time()
    integ.run_samples(base + 1e-4)
    dt_all = time.time() - t0
    lanes = integ.rays_traced / integ.per_lane_queries
    print(f"drain end-to-end: {dt_all*1e3:8.0f} ms, "
          f"{integ.rays_traced/dt_all/1e6:.2f}M q/s, "
          f"{lanes/dt_all/1e6:.2f}M lanes/s, trips={integ.last_trips}")
    print(f"  -> per-trip avg {dt_all/max(integ.last_trips,1)*1e3:.1f} ms "
          f"vs full-step {t_step*1e3:.1f} ms")


if __name__ == "__main__":
    main()
