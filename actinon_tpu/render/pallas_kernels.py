"""Pallas TPU kernels for the hot traversal queries.

The XLA tracer (tracer.py) materializes [R, L]-shaped intermediates in
HBM for every ray-times-leaf quantity; at wavefront batch sizes that is
bandwidth-bound at ~200 GB/s over dozens of arrays.  These kernels fuse
the whole traversal into straight-line VPU code over [ROWS, 128] ray
tiles: scene geometry is baked in as immediate constants (the kernel is
generated per scene, exactly like a jit specialization), so the only HBM
traffic is the ray state itself (~50 B/ray).

Kernels:
  * build_shadow_kernel — any-hit query over the matter scene
    (compound_s_ray_hit(matter) > a, reference src/scene.c:571)
  * build_nee_kernel — the WHOLE per-light next-event-estimation loop
    (reference src/scene.c:542-578): counter-RNG cap sampling, the
    cone frame, true light-geometry intersection, Oren-Nayar weighting,
    the in-loop shadow test and the 2*cap/n estimator sum — per sample,
    entirely in VMEM (the XLA path materializes ~6 [B,S,3] HBM arrays)

Same math as tracer.Tracer / integrator._nee, verified against them by
tests/test_pallas.py.  Kernels are used only on the non-differentiable
fast path (no traced overrides, no AD); the XLA path remains the
reference implementation and the CPU/diff fallback.
"""

from __future__ import annotations

import math
from functools import partial
from typing import List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from actinon_tpu.scene import ir as sir

INF = jnp.inf
ROWS = 32                 # sublane rows per grid step (ROWS*128 rays)
MAX_COMP_COLS = 64        # composite size cap for the unrolled parity walk


def _pl():
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    return pl, pltpu


def _out_struct(shape, dtype, like):
    """ShapeDtypeStruct matching `like`'s varying-axes type: under
    shard_map (per-device drain, parallel/mesh.py) pallas_call outputs
    must declare their mesh variance explicitly."""
    vma = getattr(jax.typeof(like), "vma", None)
    if vma:
        return jax.ShapeDtypeStruct(shape, dtype, vma=vma)
    return jax.ShapeDtypeStruct(shape, dtype)


# ---------------------------------------------------------------------------
# per-leaf straight-line math with python-constant parameters


def _leaf_pl_dl(px, py, pz, dx, dy, dz, M, m0):
    """y = M x + m0 component-wise with immediate constants; skips exact
    zeros at trace time."""
    def row(i, vx, vy, vz, add):
        out = None
        for coef, v in ((M[i][0], vx), (M[i][1], vy), (M[i][2], vz)):
            if coef != 0.0:
                term = coef * v
                out = term if out is None else out + term
        if add != 0.0 or out is None:
            out = add + out if out is not None else add + (vx * 0.0)
        return out
    plv = [row(i, px, py, pz, m0[i]) for i in range(3)]
    dlv = [row(i, dx, dy, dz, 0.0) for i in range(3)]
    return plv, dlv


def _dot_const(c, v):
    """sum_i c_i v_i with python-constant c, skipping zeros."""
    out = None
    for ci, vi in zip(c, v):
        if ci != 0.0:
            term = ci * vi if ci != 1.0 else vi
            out = term if out is None else out + term
    return out


def _leaf_quads(px, py, pz, dx, dy, dz, leaf):
    """(A, B, C) of the leaf's quadratic along the ray; A is None when the
    leaf is linear (plane)."""
    M, m0, c2, c1, rr = leaf["M"], leaf["m0"], leaf["c2"], leaf["c1"], \
        leaf["rr"]
    plv, dlv = _leaf_pl_dl(px, py, pz, dx, dy, dz, M, m0)
    lin = all(x == 0.0 for x in c2)
    A = None if lin else _dot_const(c2, [d * d for d in dlv])
    B = None
    if not lin:
        B = 2.0 * _dot_const(c2, [a * b for a, b in zip(dlv, plv)])
    b1 = _dot_const(c1, dlv)
    if b1 is not None:
        B = b1 if B is None else B + b1
    C = _dot_const(c2, [a * a for a in plv])
    c1p = _dot_const(c1, plv)
    if c1p is not None:
        C = c1p if C is None else C + c1p
    if rr != 0.0:
        C = rr if C is None else C + rr
    if C is None:
        C = px * 0.0
    return A, B, C


def _stable_roots(A, B, C):
    """Both roots, cancellation-stable (same math as tracer._roots);
    returns (t0, t1, s, q, ok)."""
    safe_A = jnp.where(A != 0, A, 1.0)
    s = (B * 0.5) / safe_A
    q = C / safe_A
    disc = s * s - q
    ok = (A != 0) & (disc >= 0)
    root = jnp.sqrt(jnp.where(ok & (disc > 0), disc, 1.0))
    root = jnp.where(ok & (disc > 0), root, 0.0)
    ta = -s - root
    tb = -s + root
    t0 = jnp.where(s < 0,
                   jnp.where(jnp.abs(tb) > 0,
                             q / jnp.where(jnp.abs(tb) > 0, tb, 1.0), ta),
                   ta)
    t1 = jnp.where(s > 0,
                   jnp.where(jnp.abs(ta) > 0,
                             q / jnp.where(jnp.abs(ta) > 0, ta, 1.0), tb),
                   tb)
    return (jnp.where(ok, t0, INF), jnp.where(ok, t1, INF), s, q, ok)


def _lin_root(B, C):
    nz = B != 0
    return jnp.where(nz, -C / jnp.where(nz, B, 1.0), INF)


def _leaf_crossings(px, py, pz, dx, dy, dz, leaf):
    """Surface crossings of one leaf (1 col for planes, 2 otherwise) plus
    the origin inside bit (C <= 0)."""
    A, B, C = _leaf_quads(px, py, pz, dx, dy, dz, leaf)
    inside = C <= 0
    if A is None:                       # statically linear (plane)
        if B is None:
            return [jnp.full_like(px, INF)], inside
        return [_lin_root(B, C)], inside
    if B is None:
        B = px * 0.0
    t0, t1, _, _, _ = _stable_roots(A, B, C)
    # runtime-degenerate quadric (ray parallel to a cylinder axis etc.):
    # fall back to the linear root, matching tracer._roots
    lin = A == 0
    t0 = jnp.where(lin, _lin_root(B, C), t0)
    t1 = jnp.where(lin, INF, t1)
    return [t0, t1], inside


def _leaf_first_hit(px, py, pz, dx, dy, dz, leaf, eps):
    """Family root policy (same as tracer._policy) with the family known
    statically."""
    A, B, C = _leaf_quads(px, py, pz, dx, dy, dz, leaf)
    kind = leaf["kind"]
    if kind == sir.PLANE:
        nz = B != 0
        t = jnp.where(nz, -C / jnp.where(nz, B, 1.0), INF)
        return jnp.where(t > 0, t - eps, INF)
    if B is None:
        B = px * 0.0
    t0, t1, s, q, ok = _stable_roots(A, B, C)
    if kind == sir.SPHERE:
        entering = (s < 0) & (q > 0)
        exiting = (s < 0) | (q < 0)
        a = jnp.where(entering, t0, jnp.where(exiting, t1, INF))
        return jnp.where(ok, a - eps, INF)
    lin = A == 0
    t0 = jnp.where(lin, _lin_root(B, C), t0)
    t1 = jnp.where(lin, INF, t1)
    a = jnp.where(t0 >= 0, t0, jnp.where(t1 >= 0, t1, INF))
    return jnp.where(jnp.isfinite(a), a - eps, INF)


def _env_gate(px, py, pz, dx, dy, dz, env_c, env_r):
    """Envelope-sphere hit-exists test with constant center/radius."""
    ex = px - env_c[0]
    ey = py - env_c[1]
    ez = pz - env_c[2]
    s = ex * dx + ey * dy + ez * dz
    q = ex * ex + ey * ey + ez * ez - env_r * env_r
    return (s * s - q >= 0) & ((s < 0) | (q < 0))


def _tree_eval(tree, bits):
    if tree[0] == "leaf":
        return bits[tree[1]]
    if tree[0] == "and":
        return _tree_eval(tree[1], bits) & _tree_eval(tree[2], bits)
    if tree[0] == "or":
        return _tree_eval(tree[1], bits) | _tree_eval(tree[2], bits)
    if tree[0] == "not":
        return ~_tree_eval(tree[1], bits)
    raise ValueError(tree)


# ---------------------------------------------------------------------------
# scene digest: python-constant geometry for codegen


def _leaf_const(tab, row):
    return dict(
        M=[[float(tab.M[row][i][j]) for j in range(3)] for i in range(3)],
        m0=[float(x) for x in tab.m0[row]],
        c2=[float(x) for x in tab.c2[row]],
        c1=[float(x) for x in tab.c1[row]],
        rr=float(tab.rr[row]),
        kind=int(tab.kind[row]),
        neg=bool(tab.neg[row]),
        oid=int(tab.oid[row]),
        env_c=[float(x) for x in tab.env_c[row]],
        env_r=float(tab.env_r[row]),
    )


def kernel_coverage(tracer, matter_only):
    """(singles, comps) the kernel can cover; the tracer handles the rest
    (SDF marches, oversized composites) on its XLA path."""
    tab = tracer.tab
    singles = []
    for row in tracer.single_rows:
        if matter_only and tab.is_light[row]:
            continue
        singles.append(_leaf_const(tab, row))
    comps = []
    rest = []
    for comp in tracer.composites:
        if matter_only and comp.is_light:
            continue
        n_analytic = sum(1 for r in comp.rows if r >= 0)
        if any(lf is not None for lf in comp.sdf_leaves) \
                or 2 * n_analytic > MAX_COMP_COLS:
            rest.append(comp)
            continue
        comps.append(dict(
            tree=comp.tree,
            leaves=[_leaf_const(tab, r) if r >= 0 else None
                    for r in comp.rows],
            env_c=[float(x) for x in comp.env_c] if comp.env_c is not None
            else None,
            env_r=float(comp.env_r),
            oid=comp.oid))
    return singles, comps, rest


def _comp_boundary(px, py, pz, dx, dy, dz, comp, eps):
    """Nearest boundary flip of one composite: crossing-parity walk fully
    unrolled over immediate-constant leaves.  Returns (t_raw [.,128],
    leaf_onehot list) with t_raw the un-backed crossing offset."""
    cross = []          # flat crossing vectors
    col_leaf = []       # owning local leaf per column
    inside = []
    for li, leaf in enumerate(comp["leaves"]):
        cs, ins = _leaf_crossings(px, py, pz, dx, dy, dz, leaf)
        for c in cs:
            cross.append(jnp.where(c > 0, c, INF))
            col_leaf.append(li)
        inside.append(ins)
    NC = len(cross)
    Lc = len(comp["leaves"])

    best = jnp.full_like(px, INF)
    best_leaf = [jnp.zeros_like(px, dtype=jnp.bool_) for _ in range(Lc)]
    for j in range(NC):
        tj = cross[j]
        vj = jnp.isfinite(tj)
        # per-leaf parity strictly-before / at-or-before t_j
        pa = [None] * Lc
        pb = [None] * Lc
        for c in range(NC):
            li = col_leaf[c]
            vc = jnp.isfinite(cross[c])
            xa = (cross[c] <= tj) & vc
            xb = (cross[c] < tj) & vc
            pa[li] = xa if pa[li] is None else pa[li] ^ xa
            pb[li] = xb if pb[li] is None else pb[li] ^ xb
        ba = [inside[li] ^ pa[li] for li in range(Lc)]
        bb = [inside[li] ^ pb[li] for li in range(Lc)]
        flip = (_tree_eval(comp["tree"], ba)
                != _tree_eval(comp["tree"], bb)) & vj
        win = flip & (tj < best)
        best = jnp.where(win, tj, best)
        for li in range(Lc):
            best_leaf[li] = jnp.where(win, li == col_leaf[j],
                                      best_leaf[li])
    if comp["env_c"] is not None and comp["env_r"] > 0:
        gate = _env_gate(px, py, pz, dx, dy, dz, comp["env_c"],
                         comp["env_r"])
        best = jnp.where(gate, best, INF)
    return best, best_leaf


# ---------------------------------------------------------------------------
# shadow any-hit kernel


def build_shadow_kernel(tracer, interpret=False):
    """fn(p [N,3], d [N,3], limit [N]) -> blocked bool [N] over the
    kernel-coverable scene subset (singles + small analytic composites,
    matter only).  `interpret=True` runs the kernel on CPU for tests."""
    pl, pltpu = _pl()
    singles, comps, rest = kernel_coverage(tracer, matter_only=True)
    eps = float(tracer.eps)

    def kernel(px_r, py_r, pz_r, dx_r, dy_r, dz_r, lim_r, out_r):
        px, py, pz = px_r[:], py_r[:], pz_r[:]
        dx, dy, dz = dx_r[:], dy_r[:], dz_r[:]
        lim = lim_r[:]
        blocked = jnp.zeros_like(px, dtype=jnp.bool_)
        for leaf in singles:
            a = _leaf_first_hit(px, py, pz, dx, dy, dz, leaf, eps)
            if leaf["env_r"] > 0:
                g = _env_gate(px, py, pz, dx, dy, dz, leaf["env_c"],
                              leaf["env_r"])
                a = jnp.where(g, a, INF)
            blocked = blocked | (a <= lim)
        for comp in comps:
            t_raw, _ = _comp_boundary(px, py, pz, dx, dy, dz, comp, eps)
            blocked = blocked | (jnp.isfinite(t_raw)
                                 & (t_raw - eps <= lim))
        out_r[:] = blocked.astype(jnp.float32)

    tile = ROWS * 128

    def fn(p, d, limit):
        N = p.shape[0]
        Np = -(-N // tile) * tile
        pad = Np - N
        f32 = jnp.float32

        def prep(v):
            return jnp.pad(v.astype(f32), (0, pad)).reshape(-1, 128)

        args = [prep(p[:, 0]), prep(p[:, 1]), prep(p[:, 2]),
                prep(d[:, 0]), prep(d[:, 1]), prep(d[:, 2]),
                prep(jnp.where(jnp.isfinite(limit), limit,
                               jnp.float32(3e38)))]
        nt = Np // 128
        spec = pl.BlockSpec((ROWS, 128), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            kernel,
            grid=(nt // ROWS,),
            in_specs=[spec] * 7,
            out_specs=spec,
            out_shape=_out_struct((nt, 128), f32, args[0]),
            interpret=interpret,
        )(*args)
        return out.reshape(-1)[:N] > 0

    return fn, rest


# ---------------------------------------------------------------------------
# fused NEE kernel (reference src/scene.c:542-578)


_M1 = np.uint32(0x85EBCA6B)
_M2 = np.uint32(0xC2B2AE35)
_GOLDEN = np.uint32(0x9E3779B9)


def _fmix32_np(h):
    """murmur3 finalizer on a PYTHON-constant uint32 (rng._fmix32)."""
    h = np.uint32(h)
    with np.errstate(over="ignore"):
        h = h ^ (h >> np.uint32(16))
        h = h * _M1
        h = h ^ (h >> np.uint32(13))
        h = h * _M2
        h = h ^ (h >> np.uint32(16))
    return h


def _fmix32_t(h):
    """murmur3 finalizer on a uint32 tile (rng._fmix32)."""
    h = h ^ (h >> np.uint32(16))
    h = h * _M1
    h = h ^ (h >> np.uint32(13))
    h = h * _M2
    h = h ^ (h >> np.uint32(16))
    return h


def _uniform_t(rv, counter):
    """rng.uniform with a python-constant counter: the counter half of the
    mix collapses to one immediate constant."""
    with np.errstate(over="ignore"):
        c = _fmix32_np(np.uint32(counter) * _GOLDEN + np.uint32(1))
    bits = _fmix32_t(rv ^ c)
    # Mosaic has no uint32->f32 cast; >>8 leaves 24 bits, so the value is
    # exactly representable after a sign-safe route through int32
    return (bits >> np.uint32(8)).astype(jnp.int32).astype(
        jnp.float32) * np.float32(1.0 / (1 << 24))


def _uniform_traced(rv, counter):
    """rng.uniform with a TRACED uint32 counter (the in-loop form of
    _uniform_t; identical bits to rng.uniform — pure integer ops)."""
    c = _fmix32_t(counter * _GOLDEN + np.uint32(1))
    bits = _fmix32_t(rv ^ c)
    return (bits >> np.uint32(8)).astype(jnp.int32).astype(
        jnp.float32) * np.float32(1.0 / (1 << 24))


def _norm3_t(x, y, z):
    ln2 = x * x + y * y + z * z
    pos = ln2 > 0
    inv = jax.lax.rsqrt(jnp.where(pos, ln2, 1.0))
    inv = jnp.where(pos, inv, 1.0)
    return x * inv, y * inv, z * inv


def _light_coverage(integ):
    """Per-light python-constant sampling/hit descriptors, or None when a
    light cannot run in-kernel (SDF emitters)."""
    tracer = integ.tr
    tab = tracer.tab
    out = []
    for li in range(integ.n_lights):
        oid = integ.l_oid[li]
        rows = np.flatnonzero((tab.oid == oid) & tab.single)
        hit = None
        if len(rows):
            hit = ("leaf", _leaf_const(tab, int(rows[0])))
        else:
            for comp in tracer.composites:
                if comp.oid != oid:
                    continue
                n_analytic = sum(1 for r in comp.rows if r >= 0)
                if any(lf is not None for lf in comp.sdf_leaves) \
                        or 2 * n_analytic > MAX_COMP_COLS:
                    return None
                hit = ("comp", dict(
                    tree=comp.tree,
                    leaves=[_leaf_const(tab, r) for r in comp.rows],
                    env_c=[float(x) for x in comp.env_c]
                    if comp.env_c is not None else None,
                    env_r=float(comp.env_r), oid=comp.oid))
        if hit is None:
            return None          # SDF emitter: XLA fallback
        out.append(dict(
            fov=integ.l_fov[li],
            plane_n=None if integ.l_plane_n[li] is None
            else [float(x) for x in integ.l_plane_n[li]],
            cone_pos=[float(x) for x in integ.l_cone_pos[li]],
            pos=[float(x) for x in integ.l_pos[li]],
            radius=float(integ.l_radius[li]),
            rad=float(integ.l_rad[li]),
            color=[float(x) for x in integ.l_color[li]],
            hit=hit))
    return out


def build_nee_kernel(integ, interpret=False):
    """fn(pos [B,3], surf_d [B,3], di [B] (pre-gated), cos_ti [B],
    on_a [B], on_b [B], ray_prj [B,3], rv [B] uint32, ns [B] int32)
    -> lum [B,3], or None when the scene cannot run in-kernel.

    One straight-line pass per [ROWS,128] tile: per light, per sample —
    counter-RNG cap sample in the cone frame, true light-geometry hit,
    Oren-Nayar reweighting (trig-free: sin/tan of the acos'd angles are
    rewritten in terms of the cosines), matter shadow any-hit, estimator
    accumulation (reference src/scene.c:542-578)."""
    pl, pltpu = _pl()
    tracer = integ.tr
    singles, comps, rest = kernel_coverage(tracer, matter_only=True)
    if rest or any(not light for *_, light in tracer.sdf_singles):
        return None              # matter outside kernel coverage
    lights = _light_coverage(integ)
    if lights is None or not lights:
        return None
    eps = float(tracer.eps)
    S = int(integ.direct_cap)
    f3_mag = np.float32(1e30)

    def light_hit(px, py, pz, dx, dy, dz, hit):
        kind, desc = hit
        if kind == "leaf":
            a = _leaf_first_hit(px, py, pz, dx, dy, dz, desc, eps)
            if desc["env_r"] > 0:
                g = _env_gate(px, py, pz, dx, dy, dz, desc["env_c"],
                              desc["env_r"])
                a = jnp.where(g, a, INF)
            return a
        t_raw, _ = _comp_boundary(px, py, pz, dx, dy, dz, desc, eps)
        return jnp.where(jnp.isfinite(t_raw), t_raw - eps, INF)

    def shadow_blocked(px, py, pz, dx, dy, dz, lim):
        blocked = None
        for leaf in singles:
            a = _leaf_first_hit(px, py, pz, dx, dy, dz, leaf, eps)
            if leaf["env_r"] > 0:
                g = _env_gate(px, py, pz, dx, dy, dz, leaf["env_c"],
                              leaf["env_r"])
                a = jnp.where(g, a, INF)
            b = a <= lim
            blocked = b if blocked is None else blocked | b
        for comp in comps:
            t_raw, _ = _comp_boundary(px, py, pz, dx, dy, dz, comp, eps)
            b = jnp.isfinite(t_raw) & (t_raw - eps <= lim)
            blocked = b if blocked is None else blocked | b
        if blocked is None:
            blocked = px > INF
        return blocked

    def kernel(px_r, py_r, pz_r, sx_r, sy_r, sz_r, di_r, ct_r, oa_r, ob_r,
               qx_r, qy_r, qz_r, rv_r, ns_r, or_r, og_r, ob_out_r):
        px, py, pz = px_r[:], py_r[:], pz_r[:]
        sx, sy, sz = sx_r[:], sy_r[:], sz_r[:]
        di, cos_ti = di_r[:], ct_r[:]
        on_a, on_b = oa_r[:], ob_r[:]
        qx, qy, qz = qx_r[:], qy_r[:], qz_r[:]
        rv = rv_r[:]
        ns_f = ns_r[:]
        has_ob = on_b > 0
        # sin(theta_i) etc. via cosines (theta_i in [0, pi])
        lum = [jnp.zeros_like(px) for _ in range(3)]

        for li, lt in enumerate(lights):
            # --- fov cone (obj_fov): sphere/envelope cone
            # (reference src/objects.c:619-637, 70-88) or plane half-space
            # (reference src/objects.c:520-526)
            if lt["fov"] == "plane":
                n = lt["plane_n"]
                fx = jnp.full_like(px, -n[0])
                fy = jnp.full_like(px, -n[1])
                fz = jnp.full_like(px, -n[2])
                dside = ((lt["pos"][0] - px) * (-n[0])
                         + (lt["pos"][1] - py) * (-n[1])
                         + (lt["pos"][2] - pz) * (-n[2]))
                cos_rs = jnp.where(dside > 0, 0.0, 1.0)
            else:
                cp = lt["cone_pos"]
                ex, ey, ez = cp[0] - px, cp[1] - py, cp[2] - pz
                dist2 = ex * ex + ey * ey + ez * ez
                fx, fy, fz = _norm3_t(ex, ey, ez)
                r2 = lt["radius"] * lt["radius"]
                q = 1.0 - r2 / jnp.where(dist2 > 0, dist2, 1.0)
                cos_rs = jnp.where(
                    dist2 > r2,
                    jnp.sqrt(jnp.where(q > 0, q, 0.0)), -1.0)
            cyl = 1.0 - cos_rs

            # --- transposed(con_z(fov_d)) frame (reference
            # src/vectors.h:165-175, 315-322): columns mx, my, mz=fov_d
            xx, yy, zz = fx * fx, fy * fy, fz * fz
            exm = ((xx <= yy) & (xx <= zz)).astype(px.dtype)
            eym = jnp.where((yy <= xx) & (yy <= zz), 1.0 - exm, 0.0)
            ezm = jnp.maximum(1.0 - exm - eym, 0.0)
            cdot = exm * fx + eym * fy + ezm * fz
            mxx, mxy, mxz = _norm3_t(exm - fx * cdot, eym - fy * cdot,
                                     ezm - fz * cdot)
            myx = fy * mxz - fz * mxy
            myy = fz * mxx - fx * mxz
            myz = fx * mxy - fy * mxx

            lp = lt["pos"]

            def one_sample(ctr, jf, acc):
                u1 = _uniform_traced(rv, ctr)
                u2 = _uniform_traced(rv, ctr + np.uint32(1))
                phi = np.float32(2.0 * math.pi) * u1
                z = 1.0 - u2 * cyl
                sc2 = 1.0 - z * z
                sc = jnp.sqrt(jnp.where(sc2 > 0, sc2, 0.0))
                lx = jnp.sin(phi) * sc
                ly = jnp.cos(phi) * sc
                dx = mxx * lx + myx * ly + fx * z
                dy = mxy * lx + myy * ly + fy * z
                dz = mxz * lx + myz * ly + fz * z
                w = dx * sx + dy * sy + dz * sz

                a = light_hit(px, py, pz, dx, dy, dz, lt["hit"])
                fin = jnp.isfinite(a)
                ok = (jf < ns_f) & (w > 0) & fin

                # Oren-Nayar (reference src/scene.c:394-416), trig-free:
                # theta_r = acos(w), sin(max(ti,tr)) = sqrt(1-min(cti,w)^2),
                # tan(min(ti,tr)) = sqrt(1-c^2)/c with c = max(cti,w)
                # (cos is decreasing on [0,pi]; clamp matches pi/2-1e-6)
                wc = jnp.clip(w, -1.0, 1.0)
                prx, pry, prz = _norm3_t(dx - sx * w, dy - sy * w,
                                         dz - sz * w)
                cos_phi = -(prx * qx + pry * qy + prz * qz)
                cmin = jnp.minimum(cos_ti, wc)
                sin_max = jnp.sqrt(jnp.maximum(1.0 - cmin * cmin, 0.0))
                cmax = jnp.maximum(jnp.maximum(cos_ti, wc),
                                   np.float32(1e-6))
                tan_min = jnp.sqrt(
                    jnp.maximum(1.0 - cmax * cmax, 0.0)) / cmax
                w_on = w * (on_a + on_b * jnp.maximum(cos_phi, 0.0)
                            * sin_max * tan_min)
                w = jnp.where(has_ob, w_on, w)

                lim = jnp.where(fin, a, 0.0)
                blocked = shadow_blocked(px, py, pz, dx, dy, dz, lim)
                ok = ok & ~blocked

                a_safe = jnp.where(fin, a, 0.0)
                hx = px + dx * a_safe - lp[0]
                hy = py + dy * a_safe - lp[1]
                hz = pz + dz * a_safe - lp[2]
                dsq = hx * hx + hy * hy + hz * hz
                loc = jnp.where(dsq > 0,
                                lt["rad"] / jnp.where(dsq > 0, dsq, 1.0),
                                f3_mag)
                return acc + jnp.where(ok, loc * w * di, 0.0)

            # small sample counts (draft configs) unroll fully — the
            # straight-line form schedules best — while large counts
            # (wine_glass ships direct=200; the full unroll faulted the
            # TPU worker, round-3 verdict missing #1) run a fori_loop
            # over 8-sample unrolled blocks: bounded code size with
            # enough ILP per iteration
            if S <= 16:
                acc = jnp.zeros_like(px)
                for j in range(S):
                    acc = one_sample(np.uint32(4 * (li * S + j)),
                                     np.float32(j), acc)
            else:
                U = 8
                nblk = -(-S // U)

                def blk_body(b, acc):
                    j0 = b * U
                    for k in range(U):
                        j = j0 + k
                        ctr = (np.uint32(4 * li * S)
                               + np.uint32(4) * j.astype(jnp.uint32))
                        acc = one_sample(ctr, j.astype(jnp.float32), acc)
                    return acc

                acc = jax.lax.fori_loop(0, nblk, blk_body,
                                        jnp.zeros_like(px))
            fac = 2.0 * cyl / ns_f
            for ch in range(3):
                lum[ch] = lum[ch] + acc * (np.float32(lt["color"][ch])
                                           * fac)

        or_r[:] = lum[0]
        og_r[:] = lum[1]
        ob_out_r[:] = lum[2]

    tile = ROWS * 128

    def fn(pos, surf_d, di, cos_ti, on_a, on_b, ray_prj, rv, ns):
        B = pos.shape[0]
        Np = -(-B // tile) * tile
        pad = Np - B
        f32 = jnp.float32

        def prep(v, dtp=f32):
            return jnp.pad(v.astype(dtp), (0, pad)).reshape(-1, 128)

        args = [prep(pos[:, 0]), prep(pos[:, 1]), prep(pos[:, 2]),
                prep(surf_d[:, 0]), prep(surf_d[:, 1]), prep(surf_d[:, 2]),
                prep(di), prep(cos_ti), prep(on_a), prep(on_b),
                prep(ray_prj[:, 0]), prep(ray_prj[:, 1]),
                prep(ray_prj[:, 2]),
                prep(rv, jnp.uint32),
                prep(ns.astype(f32))]
        nt = Np // 128
        spec = pl.BlockSpec((ROWS, 128), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            kernel,
            grid=(nt // ROWS,),
            in_specs=[spec] * 15,
            out_specs=[spec] * 3,
            out_shape=[_out_struct((nt, 128), f32, args[0])] * 3,
            interpret=interpret,
        )(*args)
        return jnp.stack([o.reshape(-1)[:B] for o in out], axis=-1)

    return fn


# ---------------------------------------------------------------------------
# single-object first-hit kernel (NEE light-geometry intersection)


def build_object_hit_kernel(tracer, oid, interpret=False):
    """fn(p [N,3], d [N,3]) -> a [N] (eps-backed first hit of ONE object,
    INF on miss) — the NEE light intersection (obj_ray_hit(light_src),
    reference src/scene.c:564) as straight-line codegen.  Returns None
    when the object is not analytic or too large for the unrolled walk
    (SDF emitters keep the XLA march)."""
    pl, pltpu = _pl()
    tab = tracer.tab
    eps = float(tracer.eps)
    rows = np.flatnonzero((tab.oid == oid) & tab.single)
    desc = None
    if len(rows):
        desc = ("leaf", _leaf_const(tab, int(rows[0])))
    else:
        for comp in tracer.composites:
            if comp.oid != oid:
                continue
            n_analytic = sum(1 for r in comp.rows if r >= 0)
            if any(lf is not None for lf in comp.sdf_leaves) \
                    or 2 * n_analytic > MAX_COMP_COLS:
                return None
            desc = ("comp", dict(
                tree=comp.tree,
                leaves=[_leaf_const(tab, r) for r in comp.rows],
                env_c=[float(x) for x in comp.env_c]
                if comp.env_c is not None else None,
                env_r=float(comp.env_r), oid=comp.oid))
            break
    if desc is None:
        return None

    def kernel(px_r, py_r, pz_r, dx_r, dy_r, dz_r, out_r):
        px, py, pz = px_r[:], py_r[:], pz_r[:]
        dx, dy, dz = dx_r[:], dy_r[:], dz_r[:]
        kind, dd = desc
        if kind == "leaf":
            a = _leaf_first_hit(px, py, pz, dx, dy, dz, dd, eps)
            if dd["env_r"] > 0:
                g = _env_gate(px, py, pz, dx, dy, dz, dd["env_c"],
                              dd["env_r"])
                a = jnp.where(g, a, INF)
        else:
            t_raw, _ = _comp_boundary(px, py, pz, dx, dy, dz, dd, eps)
            a = jnp.where(jnp.isfinite(t_raw), t_raw - eps, INF)
        out_r[:] = jnp.where(jnp.isfinite(a), a, 3e38)

    tile = ROWS * 128

    def fn(p, d):
        N = p.shape[0]
        Np = -(-N // tile) * tile
        pad = Np - N
        f32 = jnp.float32

        def prep(v):
            return jnp.pad(v.astype(f32), (0, pad)).reshape(-1, 128)

        args = [prep(p[:, 0]), prep(p[:, 1]), prep(p[:, 2]),
                prep(d[:, 0]), prep(d[:, 1]), prep(d[:, 2])]
        nt = Np // 128
        spec = pl.BlockSpec((ROWS, 128), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            kernel,
            grid=(nt // ROWS,),
            in_specs=[spec] * 6,
            out_specs=spec,
            out_shape=_out_struct((nt, 128), f32, args[0]),
            interpret=interpret,
        )(*args)
        a = out.reshape(-1)[:N]
        return jnp.where(a >= 3e38, INF, a)

    return fn
