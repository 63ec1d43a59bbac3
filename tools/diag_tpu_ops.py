"""Diagnose TPU-side numeric divergence between Pallas (Mosaic) and XLA.

Round-3 verdict: the fused NEE kernel agrees with the XLA path on only
71.6% of rays on real TPU while the shadow kernel agrees 100%.  Both
paths are the same jnp math, so divergence must come from ops whose
lowering differs between Mosaic and XLA:tpu — transcendentals (sin/cos),
rsqrt, or the XLA path's einsum (which may run on the MXU in reduced
precision).  This script measures each suspect in isolation on the real
chip.
"""
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pallas_unary(fn, x):
    def kernel(x_r, o_r):
        o_r[:] = fn(x_r[:])
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)


def ulp_diff(a, b):
    ai = a.view(np.int32).astype(np.int64)
    bi = b.view(np.int32).astype(np.int64)
    return np.abs(ai - bi)


def main():
    print("backend:", jax.default_backend())
    rng = np.random.default_rng(0)
    n = 32 * 128
    shape = (32, 128)

    # --- elementary ops: Mosaic vs XLA
    xs = {
        "sin[0,2pi]": rng.uniform(0, 2 * np.pi, shape).astype(np.float32),
        "cos[0,2pi]": rng.uniform(0, 2 * np.pi, shape).astype(np.float32),
        "sqrt(0,100]": rng.uniform(1e-6, 100, shape).astype(np.float32),
        "rsqrt(0,100]": rng.uniform(1e-6, 100, shape).astype(np.float32),
        "exp[-10,3]": rng.uniform(-10, 3, shape).astype(np.float32),
    }
    fns = {
        "sin[0,2pi]": jnp.sin, "cos[0,2pi]": jnp.cos,
        "sqrt(0,100]": jnp.sqrt, "rsqrt(0,100]": jax.lax.rsqrt,
        "exp[-10,3]": jnp.exp,
    }
    for name, x in xs.items():
        fn = fns[name]
        xj = jnp.asarray(x)
        got = np.asarray(pallas_unary(fn, xj))
        want = np.asarray(jax.jit(fn)(xj))
        ud = ulp_diff(got, want)
        print(f"{name:14s} bit-equal={float((ud == 0).mean()):.4f} "
              f"max_ulp={int(ud.max())} mean_ulp={float(ud.mean()):.3f}")

    # --- division and fma-sensitive compound exprs
    a = rng.uniform(-2, 2, shape).astype(np.float32)
    b = rng.uniform(0.1, 2, shape).astype(np.float32)
    c = rng.uniform(-2, 2, shape).astype(np.float32)
    for name, fn, args in [
        ("div", lambda a, b: a / b, (a, b)),
        ("mul_add", lambda a, b, c: a * b + c, (a, b, c)),
    ]:
        ja = [jnp.asarray(v) for v in args]

        def kernel(*refs):
            out = refs[-1]
            out[:] = fn(*[r[:] for r in refs[:-1]])
        got = np.asarray(pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(shape, np.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(args),
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(*ja))
        want = np.asarray(jax.jit(fn)(*ja))
        ud = ulp_diff(got, want)
        print(f"{name:14s} bit-equal={float((ud == 0).mean()):.4f} "
              f"max_ulp={int(ud.max())}")

    # --- einsum precision: [B,3,3] frame @ [B,S,3] dirs, XLA default vs
    # explicit elementwise f32 (f64 numpy as truth)
    B, S = 1024, 8
    fr = rng.normal(0, 1, (B, 3, 3)).astype(np.float32)
    lo = rng.normal(0, 1, (B, S, 3)).astype(np.float32)
    want64 = np.einsum("bij,bsj->bsi", fr.astype(np.float64),
                       lo.astype(np.float64))

    got_ein = np.asarray(jax.jit(
        lambda f, l: jnp.einsum("bij,bsj->bsi", f, l))(fr, lo))

    def explicit(f, l):
        return jnp.stack(
            [sum(f[:, None, i, j] * l[:, :, j] for j in range(3))
             for i in range(3)], axis=-1)
    got_exp = np.asarray(jax.jit(explicit)(fr, lo))
    for name, got in [("einsum_default", got_ein), ("explicit", got_exp)]:
        rel = np.abs(got - want64) / (np.abs(want64) + 1e-6)
        print(f"{name:14s} max_rel={rel.max():.3e} mean_rel={rel.mean():.3e}")


if __name__ == "__main__":
    main()
