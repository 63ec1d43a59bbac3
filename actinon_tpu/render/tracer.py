"""Vectorized ray-scene intersection over the compiled Scene IR.

TPU-native replacement for the reference hit stack
(compound_s_ray_hit / compound_s_ray_trans_hit -> obj_ray_hit -> per-type
vtable hits, reference src/compound.c:215-299, src/objects.c:245-310):

  * All single-leaf objects of one analytic family are intersected with one
    vectorized expression over struct-of-arrays tables ([R,S] etc.); the
    sphere table is processed in chunks with a running top-2 so scenes like
    many_spheres.acn (32k spheres) never materialize [R,S].
  * Composite (CSG) objects run a *sorted crossing walk*: all leaf-surface
    crossings along the ray are enumerated analytically, sorted by t, and
    the composite's inside/outside predicate is evaluated after every
    crossing in one fully vectorized pass (crossing parity per leaf, XOR
    with the origin-side bits, static unroll of the tree program).  The
    first predicate flip is the boundary.  This replaces the reference's
    recursive pair-marching (reference src/objects.c:1052-1094) with
    straight-line, divergence-free XLA code — no `lax.while_loop`, which
    also makes the walk reverse-mode differentiable.
  * Every scene traversal computes the nearest AND second-nearest hit in
    the same pass (top-2 merge over candidate groups), so the media
    transition query (coincident-surface resolution, reference
    src/compound.c:246-299) costs one traversal, not two.
  * The scene structure is static at trace time, so every per-object loop
    here unrolls into straight-line XLA; there is no dynamic dispatch.

Differentiable path: all geometry tables are read through `self._t(...)`,
which substitutes traced arrays from `self.ovr` when present — gradients
w.r.t. sphere centers/radii, plane/quadric parameters then flow through
the analytic hit formulas (implicit-function differentiation is free
because the hit distance is in closed form).  `self.diff = True` switches
the SDF march to a fixed-trip scan.

All functions take/return jnp arrays shaped [R] / [R,3] and are meant to be
called inside a jitted integrator.
"""

from __future__ import annotations

import math
from typing import List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from actinon_tpu.scene import ir as sir

INF = jnp.inf
SPHERE_CHUNK = 2048


def _norm3(v):
    # zero-input and sqrt(0) cotangents are masked so reverse-mode AD
    # never produces 0*inf = NaN (see diff.py)
    ln2 = jnp.sum(v * v, axis=-1, keepdims=True)
    pos = ln2 > 0
    ln = jnp.sqrt(jnp.where(pos, ln2, 1.0))
    return jnp.where(pos, v / ln, v)


def _dot(a, b):
    return jnp.sum(a * b, axis=-1)


def safe_sqrt(x):
    """sqrt with a zero (sub)gradient at x <= 0: under reverse-mode AD the
    `where`-selected-out branch still back-propagates 1/(2*sqrt(0)) = inf,
    and 0 * inf = NaN poisons the whole gradient.  Masking the *input*
    kills the inf at its source."""
    pos = x > 0
    return jnp.where(pos, jnp.sqrt(jnp.where(pos, x, 1.0)), 0.0)


def safe_acos(x):
    """arccos with clamped input and finite gradient at |x| >= 1."""
    inside = jnp.abs(x) < 1.0
    xin = jnp.where(inside, x, 0.0)
    return jnp.where(inside, jnp.arccos(xin),
                     jnp.where(x >= 1.0, 0.0, np.pi))


def safe_asin(x):
    """arcsin with clamped input and finite gradient at |x| >= 1."""
    inside = jnp.abs(x) < 1.0
    xin = jnp.where(inside, x, 0.0)
    return jnp.where(inside, jnp.arcsin(xin),
                     jnp.where(x >= 1.0, np.pi / 2, -np.pi / 2))


class _Tables:
    """Per-family SoA tables for single-leaf objects (numpy, cast at use)."""

    def __init__(self, dtype):
        self.dtype = dtype
        self.sph = dict(c=[], r=[], oid=[], env_c=[], env_r=[], neg=[])
        self.pla = dict(n=[], k=[], oid=[], env_c=[], env_r=[], neg=[])
        self.qua = dict(m=[], m0=[], coef=[], r=[], oid=[], env_c=[],
                        env_r=[], neg=[])
        self.sdf = []        # list of (leaf, oid) - static loop
        self.composites = []  # list of (ObjIR, oid)

    def add(self, obj: sir.ObjIR, oid: int):
        if obj.single_leaf:
            lf = obj.leaves[0]
            env_c = obj.env_c if obj.env_c is not None else np.zeros(3)
            env_r = obj.env_r if obj.env_c is not None else -1.0
            if lf.family == sir.SPHERE and not lf.neg:
                t = self.sph
                t["c"].append(lf.c); t["r"].append(lf.r); t["oid"].append(oid)
                t["env_c"].append(env_c); t["env_r"].append(env_r)
                return
            if lf.family == sir.PLANE and not lf.neg:
                t = self.pla
                t["n"].append(lf.n); t["k"].append(lf.k); t["oid"].append(oid)
                t["env_c"].append(env_c); t["env_r"].append(env_r)
                return
            if lf.family == sir.QUADRIC and not lf.neg:
                t = self.qua
                t["m"].append(lf.m); t["m0"].append(lf.m0)
                t["coef"].append(lf.coef); t["r"].append(lf.r)
                t["oid"].append(oid)
                t["env_c"].append(env_c); t["env_r"].append(env_r)
                return
            if lf.family == sir.SDF:
                self.sdf.append((lf, oid, env_c, env_r))
                return
        self.composites.append((obj, oid))

    def finalize(self):
        dt = self.dtype
        for t in (self.sph, self.pla, self.qua):
            for k in list(t):
                if k == "oid":
                    t[k] = np.asarray(t[k], np.int32)
                elif k == "neg":
                    continue
                else:
                    t[k] = np.asarray(t[k], dt) if len(t[k]) else \
                        np.zeros((0,) + np.shape(t[k])[1:], dt)


# ---------------------------------------------------------------------------
# leaf math (reference src/gmath.h analytic hits, stable quadratic forms)


def _sphere_roots(c, r, p, d):
    """Both crossings of |x-c|=r along p+td; [..] broadcast.  Returns
    (t0, t1) with NaN->inf where no intersection."""
    pp = p - c
    s = _dot(pp, d)
    q = _dot(pp, pp) - r * r
    disc = s * s - q
    ok = disc >= 0
    root = safe_sqrt(jnp.where(ok, disc, 0.0))
    # stable: t0 = -s - root, t1 = -s + root, computed cancellation-free
    ta = -s - root
    tb = -s + root
    tb_nz = jnp.abs(tb) > 0
    ta_nz = jnp.abs(ta) > 0
    t0 = jnp.where(s < 0, jnp.where(tb_nz, q / jnp.where(tb_nz, tb, 1.0),
                                    ta), ta)
    t1 = jnp.where(s > 0, jnp.where(ta_nz, q / jnp.where(ta_nz, ta, 1.0),
                                    tb), tb)
    return (jnp.where(ok, t0, INF), jnp.where(ok, t1, INF))


def _sphere_first_hit(c, r, p, d, eps):
    """Reference sphere_ray_hit semantics (src/gmath.h:64-85): entry root
    when outside+approaching, exit root when inside or behind-center."""
    pp = p - c
    s = _dot(pp, d)
    q = _dot(pp, pp) - r * r
    disc = s * s - q
    ok = disc >= 0
    root = safe_sqrt(jnp.where(ok, disc, 0.0))
    entering = (s < 0) & (q > 0)
    exiting = (s < 0) | (q < 0)
    a = jnp.where(entering, -s - root, jnp.where(exiting, -s + root, INF))
    return jnp.where(ok, a - eps, INF)


def _env_gate(env_c, env_r, p, d):
    """Envelope culling mask (envelope_s_ray_hits, reference
    src/objects.c:90-96): True = keep."""
    t0 = _sphere_first_hit(env_c, env_r, p, d, 0.0)
    return (env_r <= 0) | jnp.isfinite(t0)


def _quadric_setup(m, m0, coef, p, d):
    """pl/dl + quadratic coefficients; m:[...,3,3], p/d:[...,3]."""
    pl = jnp.einsum("...ij,...j->...i", m, p) + m0
    dl = jnp.einsum("...ij,...j->...i", m, d)
    f = jnp.sum(coef * dl * dl, -1)
    fs = jnp.sum(coef * dl * pl, -1)
    fq = jnp.sum(coef * pl * pl, -1)
    return pl, dl, f, fs, fq


def _quadric_roots(f, fs, fq, r):
    """Both real roots of f t^2 + 2 fs t + (fq + r) = 0, INF where none.
    Handles the degenerate linear case (f == 0)."""
    c0 = fq + r
    safe_f = jnp.where(f != 0, f, 1.0)
    s = fs / safe_f
    q = c0 / safe_f
    disc = s * s - q
    ok = disc >= 0
    root = safe_sqrt(jnp.where(ok, disc, 0.0))
    ta = -s - root
    tb = -s + root
    tb_nz = jnp.abs(tb) > 0
    ta_nz = jnp.abs(ta) > 0
    t0 = jnp.where(s < 0, jnp.where(tb_nz, q / jnp.where(tb_nz, tb, 1.0),
                                    ta), ta)
    t1 = jnp.where(s > 0, jnp.where(ta_nz, q / jnp.where(ta_nz, ta, 1.0),
                                    tb), tb)
    t0 = jnp.where(ok, t0, INF)
    t1 = jnp.where(ok, t1, INF)
    # linear: t = -c0 / (2 fs)
    safe_fs = jnp.where(fs != 0, fs, 1.0)
    tl = jnp.where(fs != 0, -c0 / (2 * safe_fs), INF)
    quad = f != 0
    return (jnp.where(quad, t0, tl), jnp.where(quad, t1, INF))


def _first_pos(t0, t1, eps):
    """Reference squaroid root choice (src/objects.c:791-801): smaller
    non-negative root, eps-backed."""
    a = jnp.where(t0 >= 0, t0, jnp.where(t1 >= 0, t1, INF))
    return jnp.where(jnp.isfinite(a), a - eps, INF)


def _sdf_eval(kind, param, pos):
    """Vectorized SDF (reference src/distance.c); pos [...,3]."""
    if kind == sir.SDF_SPHERE:
        return jnp.sqrt(jnp.sum(pos * pos, -1)) - 1.0
    if kind == sir.SDF_TORUS:
        x, y = pos[..., 0], pos[..., 1]
        f = jnp.sqrt(x * x + y * y)
        f_inv = jnp.where(f > 0, 1.0 / jnp.where(f > 0, f, 1.0), 1.0)
        xu, yu = x * f_inv, y * f_inv
        return jnp.sqrt((xu - x) ** 2 + (yu - y) ** 2 + pos[..., 2] ** 2) \
            - param
    raise ValueError(kind)


def _top2_cols(a):
    """Smallest and second-smallest over the last axis of a [R, K] array
    (K >= 1 static).  Returns (vals [R,2], idx [R,2]); missing columns are
    (INF, 0).  Two argmin passes — NOT lax.top_k, which lowers to a full
    sort on TPU and is an order of magnitude slower."""
    R, K = a.shape
    i1 = jnp.argmin(a, axis=1).astype(jnp.int32)
    t1 = jnp.min(a, axis=1)
    cols = jnp.arange(K, dtype=jnp.int32)
    a2 = jnp.where(cols[None, :] == i1[:, None], INF, a)
    i2 = jnp.argmin(a2, axis=1).astype(jnp.int32)
    t2 = jnp.min(a2, axis=1)
    return jnp.stack([t1, t2], axis=1), jnp.stack([i1, i2], axis=1)


# ---------------------------------------------------------------------------


class Tracer:
    """Per-scene tracer: builds the SoA tables once, exposes vectorized
    nearest / transition / shadow queries."""

    def __init__(self, ir: sir.SceneIR, dtype=jnp.float32, eps=None):
        self.ir = ir
        self.dtype = np.dtype(dtype)
        self.eps = eps if eps is not None else \
            (1e-6 if self.dtype == np.float64 else 1e-4)
        # differentiable-path hooks: `ovr` maps table names to traced
        # arrays replacing the baked constants (geometry gradients then
        # flow through the analytic hit formulas); `diff` switches the
        # data-dependent SDF `lax.while_loop` to a fixed-trip scan, which
        # is reverse-mode differentiable (while_loop is not).
        self.ovr = {}
        self.diff = False

        self.n_obj = len(ir.objects)
        self.is_light = np.array([o.is_light for o in ir.objects], bool)
        self.roughness = np.array([o.roughness for o in ir.objects],
                                  self.dtype)

        tb = _Tables(self.dtype)
        for oid, obj in enumerate(ir.objects):
            tb.add(obj, oid)
        tb.finalize()
        self.tb = tb

        # jitted entry points for direct (non-integrator) use; the
        # integrator calls the raw methods inside its own jit instead
        self.nearest_jit = jax.jit(
            lambda p, d: self.nearest(p, d, matter_only=False))
        self.nearest_matter_jit = jax.jit(
            lambda p, d: self.nearest(p, d, matter_only=True))
        self.trans_hit_jit = jax.jit(self.trans_hit)
        self.shadow_t_jit = jax.jit(self.shadow_t)

    # -- differentiable table access ----------------------------------------

    def _t(self, name, value):
        """Table read with optional traced override."""
        o = self.ovr.get(name)
        return jnp.asarray(o if o is not None else value)

    def geom_params(self):
        """Export the differentiable geometry tables as a dict pytree whose
        keys match the `ovr` names.  SDF leaves are excluded (their march
        is not differentiated; see _hit_sdf_leaf)."""
        p = {}
        if len(self.tb.sph["oid"]):
            p["sph_c"] = self.tb.sph["c"]
            p["sph_r"] = self.tb.sph["r"]
        if len(self.tb.pla["oid"]):
            p["pla_n"] = self.tb.pla["n"]
            p["pla_k"] = self.tb.pla["k"]
        if len(self.tb.qua["oid"]):
            p["qua_m"] = self.tb.qua["m"]
            p["qua_m0"] = self.tb.qua["m0"]
            p["qua_coef"] = self.tb.qua["coef"]
            p["qua_r"] = self.tb.qua["r"]
        for ci, (obj, oid) in enumerate(self.tb.composites):
            for li, lf in enumerate(obj.leaves):
                pre = f"c{ci}_l{li}_"
                if lf.family == sir.PLANE:
                    p[pre + "n"] = lf.n.astype(self.dtype)
                    p[pre + "k"] = np.asarray(lf.k, self.dtype)
                elif lf.family == sir.SPHERE:
                    p[pre + "c"] = lf.c.astype(self.dtype)
                    p[pre + "r"] = np.asarray(lf.r, self.dtype)
                elif lf.family == sir.QUADRIC:
                    p[pre + "m"] = lf.m.astype(self.dtype)
                    p[pre + "m0"] = lf.m0.astype(self.dtype)
                    p[pre + "coef"] = lf.coef.astype(self.dtype)
                    p[pre + "r"] = np.asarray(lf.r, self.dtype)
        return {k: jnp.asarray(np.asarray(v, self.dtype)) for k, v in
                p.items()}

    # -- candidate groups ----------------------------------------------------
    # Each group yields (t [R,k], nor [R,k,3], oid [R,k], sign [R,k]) with
    # k in {1, 2}; the final merge takes the global top-2 over all groups.

    def _sphere_group(self, p, d, matter_only):
        """Top-2 hits over the sphere table, chunked running merge."""
        t = self.tb.sph
        S = len(t["oid"])
        if S == 0:
            return None
        dt = self.dtype
        R = p.shape[0]
        c = self._t("sph_c", t["c"])
        r = self._t("sph_r", t["r"])
        ec = jnp.asarray(t["env_c"]); er = jnp.asarray(t["env_r"])
        light = jnp.asarray(self.is_light[t["oid"]])
        tab_oid = jnp.asarray(t["oid"])

        def chunk_hits(c_k, r_k, ec_k, er_k, light_k, alive_k):
            a = _sphere_first_hit(c_k[None, :, :], r_k[None, :],
                                  p[:, None, :], d[:, None, :], self.eps)
            gate = _env_gate(ec_k[None, :, :], er_k[None, :],
                             p[:, None, :], d[:, None, :])
            a = jnp.where(gate & alive_k[None, :], a, INF)
            if matter_only:
                a = jnp.where(light_k[None, :], INF, a)
            return a

        if S <= SPHERE_CHUNK:
            a = chunk_hits(c, r, ec, er, light,
                           jnp.ones((S,), bool))
            t2, idx2 = _top2_cols(a)
        else:
            pad = (-S) % SPHERE_CHUNK
            cp = jnp.concatenate([c, jnp.zeros((pad, 3), dt)])
            rp = jnp.concatenate([r, jnp.full((pad,), 1.0, dt)])
            ecp = jnp.concatenate([ec, jnp.zeros((pad, 3), dt)])
            erp = jnp.concatenate([er, jnp.full((pad,), -1.0, dt)])
            lp = jnp.concatenate([light, jnp.ones((pad,), bool)])
            ap = jnp.concatenate([jnp.ones((S,), bool),
                                  jnp.zeros((pad,), bool)])
            nch = (S + pad) // SPHERE_CHUNK
            xs = (cp.reshape(nch, SPHERE_CHUNK, 3),
                  rp.reshape(nch, SPHERE_CHUNK),
                  ecp.reshape(nch, SPHERE_CHUNK, 3),
                  erp.reshape(nch, SPHERE_CHUNK),
                  lp.reshape(nch, SPHERE_CHUNK),
                  ap.reshape(nch, SPHERE_CHUNK))

            def body(carry, x):
                best_t, best_i, base = carry
                ck, rk, eck, erk, lk, ak = x
                a = chunk_hits(ck, rk, eck, erk, lk, ak)
                tk, ik = _top2_cols(a)
                ik = ik.astype(jnp.int32) + base
                cand_t = jnp.concatenate([best_t, tk], axis=1)
                cand_i = jnp.concatenate([best_i, ik], axis=1)
                merged_t, sel = _top2_cols(cand_t)
                return (merged_t,
                        jnp.take_along_axis(cand_i, sel, axis=1),
                        base + SPHERE_CHUNK), None

            init = (jnp.full((R, 2), INF, dt),
                    jnp.zeros((R, 2), jnp.int32), jnp.int32(0))
            (t2, idx2, _), _ = jax.lax.scan(body, init, xs)

        idx2 = idx2.astype(jnp.int32)
        cg = c[idx2]                                   # [R,2,3]
        s = _dot(p[:, None, :] - cg, d[:, None, :])
        sign = jnp.where(s + t2 > 0, 1.0, -1.0).astype(dt)
        t_safe = jnp.where(jnp.isfinite(t2), t2, 0.0)
        nor = _norm3(p[:, None, :] + d[:, None, :] * t_safe[..., None] - cg)
        return t2, nor, tab_oid[idx2], sign

    def _plane_group(self, p, d, matter_only):
        t = self.tb.pla
        P = len(t["oid"])
        if P == 0:
            return None
        dt = self.dtype
        n = self._t("pla_n", t["n"])
        k = self._t("pla_k", t["k"])
        div = jnp.einsum("rj,pj->rp", d, n)
        num = -(jnp.einsum("rj,pj->rp", p, n) + k[None, :])
        offs = num / jnp.where(div != 0, div, 1.0)
        a = jnp.where((div != 0) & (offs > 0), offs - self.eps, INF)
        gate = _env_gate(jnp.asarray(t["env_c"])[None, :, :],
                         jnp.asarray(t["env_r"])[None, :],
                         p[:, None, :], d[:, None, :])
        a = jnp.where(gate, a, INF)
        if matter_only:
            light = jnp.asarray(self.is_light[t["oid"]])
            a = jnp.where(light[None, :], INF, a)
        t2, idx2 = _top2_cols(a)
        sign_all = jnp.where(div > 0, 1.0, -1.0).astype(dt)
        sign = jnp.take_along_axis(sign_all, idx2, axis=1)
        nor = n[idx2]
        oid = jnp.asarray(t["oid"])[idx2]
        return t2, nor, oid, sign

    def _quadric_group(self, p, d, matter_only):
        t = self.tb.qua
        Q = len(t["oid"])
        if Q == 0:
            return None
        dt = self.dtype
        m = self._t("qua_m", t["m"])
        m0 = self._t("qua_m0", t["m0"])
        coef = self._t("qua_coef", t["coef"])
        r = self._t("qua_r", t["r"])
        pl, dl, f, fs, fq = _quadric_setup(
            m[None], m0[None], coef[None], p[:, None, :], d[:, None, :])
        t0, t1 = _quadric_roots(f, fs, fq, r[None, :])
        a = _first_pos(t0, t1, self.eps)
        gate = _env_gate(jnp.asarray(t["env_c"])[None, :, :],
                         jnp.asarray(t["env_r"])[None, :],
                         p[:, None, :], d[:, None, :])
        a = jnp.where(gate, a, INF)
        if matter_only:
            light = jnp.asarray(self.is_light[t["oid"]])
            a = jnp.where(light[None, :], INF, a)
        t2, idx2 = _top2_cols(a)
        mg = m[idx2]; m0g = m0[idx2]; coefg = coef[idx2]
        t_safe = jnp.where(jnp.isfinite(t2), t2, 0.0)
        x = p[:, None, :] + d[:, None, :] * t_safe[..., None]
        xl = jnp.einsum("rkij,rkj->rki", mg, x) + m0g
        grad = jnp.einsum("rki,rkij->rkj", coefg * xl, mg)
        nor = _norm3(grad)
        sgn = _dot(grad, d[:, None, :])
        sign = jnp.where(sgn > 0, 1.0, -1.0).astype(dt)
        oid = jnp.asarray(t["oid"])[idx2]
        return t2, nor, oid, sign

    def _hit_sdf_leaf(self, lf: sir.Leaf, env_c, env_r, p, d):
        """Bounded bidirectional sphere march in the leaf's local frame
        (reference src/objects.c:903-959).  Not differentiated (the march
        is an iterative root-finder); in diff mode inputs are detached."""
        dt = self.dtype
        if self.diff:
            p = jax.lax.stop_gradient(p)
            d = jax.lax.stop_gradient(d)
        R = p.shape[0]
        m = jnp.asarray(lf.m.astype(dt)); m0 = jnp.asarray(lf.m0.astype(dt))
        # envelope-clipped entry (world space)
        if env_r > 0:
            ec = jnp.asarray(env_c.astype(dt))
            outside = _dot(p - ec, p - ec) > env_r * env_r
            t_env = _sphere_first_hit(ec, jnp.asarray(dt.type(env_r)), p, d,
                                      0.0)
            dead = outside & ~jnp.isfinite(t_env)
            offs0 = jnp.where(outside & jnp.isfinite(t_env), t_env, 0.0)
        else:
            dead = jnp.zeros((R,), bool)
            offs0 = jnp.zeros((R,), dt)
        p0 = p + d * offs0[:, None]
        pl = jnp.einsum("ij,rj->ri", m, p0) + m0
        dl0 = jnp.einsum("ij,rj->ri", m, d)
        dn = jnp.sqrt(jnp.sum(dl0 * dl0, -1))
        dl = dl0 / jnp.where(dn > 0, dn, 1.0)[:, None]

        eps = self.eps
        dist0 = _sdf_eval(lf.sdf_kind, lf.sdf_param, pl)
        forward = dist0 > 0

        def body(carry):
            i, offs1, dist, active = carry
            step = jnp.where(forward, dist + eps, -(dist - eps))
            offs1 = jnp.where(active, offs1 + step, offs1)
            dnew = _sdf_eval(lf.sdf_kind, lf.sdf_param,
                             pl + dl * offs1[:, None])
            dist = jnp.where(active, dnew, dist)
            crossed = jnp.where(forward, (dist < 0) | (dist > 1e30),
                                (dist > 0) | (dist < -1e30))
            return i + 1, offs1, dist, active & ~crossed

        init = (jnp.int32(0), jnp.zeros((R,), dt), dist0, ~dead)
        if self.diff:
            def sbody(carry, _):
                return body(carry), None
            (_, offs1, dist, _), _ = jax.lax.scan(sbody, init, None,
                                                  length=lf.cycles)
        else:
            def cond(carry):
                i, _, _, active = carry
                return (i < lf.cycles) & jnp.any(active)
            _, offs1, dist, _ = jax.lax.while_loop(cond, body, init)

        hit = (~dead) & (jnp.abs(dist) <= eps)
        q = pl + dl * offs1[:, None]
        d0 = _sdf_eval(lf.sdf_kind, lf.sdf_param, q)
        ex = jnp.asarray(np.eye(3, dtype=dt))
        grad = jnp.stack([
            (_sdf_eval(lf.sdf_kind, lf.sdf_param, q + ex[i] * eps) - d0) / eps
            for i in range(3)], axis=-1)
        nw = jnp.einsum("ri,ij->rj", grad, m)
        nor = _norm3(nw)
        if lf.neg:
            nor = -nor
        a = jnp.where(hit, offs0 + offs1 / jnp.where(dn > 0, dn, 1.0)
                      - self.eps, INF)
        return a, nor

    # -- composite objects -------------------------------------------------

    def _leaf_inside(self, lf: sir.Leaf, x, key=None):
        """inside predicate (side == -1) of one leaf at points x [R,3]."""
        g = (lambda f, v: self._t(key + f, v)) if key else \
            (lambda f, v: jnp.asarray(v))
        if lf.family == sir.PLANE:
            n = g("n", lf.n.astype(self.dtype))
            k = g("k", np.asarray(lf.k, self.dtype))
            return _dot(x, n) + k <= 0
        if lf.family == sir.SPHERE:
            c = g("c", lf.c.astype(self.dtype))
            r = g("r", np.asarray(lf.r, self.dtype))
            return _dot(x - c, x - c) <= r * r
        if lf.family == sir.QUADRIC:
            m = g("m", lf.m.astype(self.dtype))
            m0 = g("m0", lf.m0.astype(self.dtype))
            coef = g("coef", lf.coef.astype(self.dtype))
            r = g("r", np.asarray(lf.r, self.dtype))
            xl = jnp.einsum("ij,rj->ri", m, x) + m0
            return jnp.sum(coef * xl * xl, -1) + r <= 0
        if lf.family == sir.SDF:
            m = jnp.asarray(lf.m.astype(self.dtype))
            m0 = jnp.asarray(lf.m0.astype(self.dtype))
            xl = jnp.einsum("ij,rj->ri", m, x) + m0
            return _sdf_eval(lf.sdf_kind, lf.sdf_param, xl) <= 0
        raise ValueError(lf.family)

    def _leaf_crossings(self, lf: sir.Leaf, p, d, key=None):
        """All surface crossings of one leaf along p+td, as a [R, k] array
        (k in {1, 2}); non-crossings are INF."""
        g = (lambda f, v: self._t(key + f, v)) if key else \
            (lambda f, v: jnp.asarray(v))
        if lf.family == sir.PLANE:
            n = g("n", lf.n.astype(self.dtype))
            k = g("k", np.asarray(lf.k, self.dtype))
            div = _dot(d, n)
            num = -(_dot(p, n) + k)
            t = jnp.where(div != 0, num / jnp.where(div != 0, div, 1.0), INF)
            return t[:, None]
        if lf.family == sir.SPHERE:
            c = g("c", lf.c.astype(self.dtype))
            r = g("r", np.asarray(lf.r, self.dtype))
            t0, t1 = _sphere_roots(c, r, p, d)
            return jnp.stack([t0, t1], axis=-1)
        if lf.family == sir.QUADRIC:
            m = g("m", lf.m.astype(self.dtype))
            m0 = g("m0", lf.m0.astype(self.dtype))
            coef = g("coef", lf.coef.astype(self.dtype))
            r = g("r", np.asarray(lf.r, self.dtype))
            pl, dl, f, fs, fq = _quadric_setup(m, m0, coef, p, d)
            t0, t1 = _quadric_roots(f, fs, fq, r)
            return jnp.stack([t0, t1], axis=-1)
        if lf.family == sir.SDF:
            raise NotImplementedError(
                "SDF leaves inside CSG composites are not supported yet")
        raise ValueError(lf.family)

    def _leaf_normal(self, lf: sir.Leaf, x, key=None):
        """Geometric normal of a leaf at surface points x [R,3], with the
        Neg-ancestor flip baked in."""
        g = (lambda f, v: self._t(key + f, v)) if key else \
            (lambda f, v: jnp.asarray(v))
        if lf.family == sir.PLANE:
            n = g("n", lf.n.astype(self.dtype))
            out = jnp.broadcast_to(n, x.shape)
        elif lf.family == sir.SPHERE:
            c = g("c", lf.c.astype(self.dtype))
            out = _norm3(x - c)
        elif lf.family == sir.QUADRIC:
            m = g("m", lf.m.astype(self.dtype))
            m0 = g("m0", lf.m0.astype(self.dtype))
            coef = g("coef", lf.coef.astype(self.dtype))
            xl = jnp.einsum("ij,rj->ri", m, x) + m0
            out = _norm3(jnp.einsum("ri,ij->rj", coef * xl, m))
        else:
            raise ValueError(lf.family)
        return -out if lf.neg else out

    @staticmethod
    def _tree_eval(tree, bits):
        """Static unroll of the CSG tree program over per-leaf inside bits
        (bits[..., L] bool, leaf axis last)."""
        if tree[0] == "leaf":
            return bits[..., tree[1]]
        if tree[0] == "and":
            return Tracer._tree_eval(tree[1], bits) \
                & Tracer._tree_eval(tree[2], bits)
        if tree[0] == "or":
            return Tracer._tree_eval(tree[1], bits) \
                | Tracer._tree_eval(tree[2], bits)
        if tree[0] == "not":
            return ~Tracer._tree_eval(tree[1], bits)
        raise ValueError(tree)

    def _hit_composite(self, obj: sir.ObjIR, p, d, ci=None):
        """Crossing-parity walk, fully vectorized and sort-free: for every
        forward leaf crossing j, the composite's inside bits just before
        and just after t_j are the origin-side bits XOR the parity of each
        leaf's crossings at t < t_j (resp. t <= t_j).  A crossing is the
        boundary iff the tree value differs across it; the hit is the
        minimum such t.  Coincident crossings are evaluated jointly on
        both sides, reproducing the reference's eps-shell behavior
        (reference src/objects.c:1052-1094).  No sort, no while_loop —
        pure compare/XOR/min VPU code, reverse-mode differentiable.
        Returns (t[R] eps-backed, nor[R,3])."""
        R = p.shape[0]
        dt = self.dtype
        L = len(obj.leaves)
        keys = [f"c{ci}_l{li}_" if ci is not None else None
                for li in range(L)]
        cross_per_leaf = [self._leaf_crossings(lf, p, d, key=keys[li])
                          for li, lf in enumerate(obj.leaves)]
        crossings = jnp.concatenate(cross_per_leaf, axis=-1)
        cols_of_leaf = []
        leaf_of_col = []
        c0 = 0
        for li, lf in enumerate(obj.leaves):
            k = 1 if lf.family == sir.PLANE else 2
            cols_of_leaf.append(list(range(c0, c0 + k)))
            leaf_of_col += [li] * k
            c0 += k
        leaf_of_col = np.array(leaf_of_col, np.int32)
        NC = crossings.shape[-1]
        # only forward crossings count
        crossings = jnp.where(crossings > 0, crossings, INF)
        valid = jnp.isfinite(crossings)

        # per-leaf crossing parity before/after each candidate crossing j:
        # leaf l contributes <= 2 columns, so the parity is one or two
        # broadcast compares + XOR per leaf — [R, NC] each
        par_after, par_before = [], []
        for cs in cols_of_leaf:
            pa = jnp.zeros((R, NC), bool)
            pb = jnp.zeros((R, NC), bool)
            for c in cs:
                tc = crossings[:, c:c + 1]
                vc = valid[:, c:c + 1]
                pa = pa ^ ((tc <= crossings) & vc)
                pb = pb ^ ((tc < crossings) & vc)
            par_after.append(pa)
            par_before.append(pb)
        par_after = jnp.stack(par_after, axis=-1)    # [R, NC, L]
        par_before = jnp.stack(par_before, axis=-1)

        bits0 = jnp.stack(
            [self._leaf_inside(lf, p, key=keys[li])
             for li, lf in enumerate(obj.leaves)], axis=-1)  # [R, L]

        val_after = self._tree_eval(obj.tree, bits0[:, None, :] ^ par_after)
        val_before = self._tree_eval(obj.tree,
                                     bits0[:, None, :] ^ par_before)
        flip = (val_after != val_before) & valid             # [R, NC]

        tcand = jnp.where(flip, crossings, INF)
        j = jnp.argmin(tcand, axis=1)
        hit_t = jnp.min(tcand, axis=1)
        has = jnp.isfinite(hit_t)
        hit_leaf = jnp.where(has, jnp.asarray(leaf_of_col)[j], -1)

        # envelope culling (object-level)
        if obj.env_c is not None and obj.env_r > 0:
            gate = _env_gate(jnp.asarray(obj.env_c.astype(dt)),
                             dt.type(obj.env_r), p, d)
            hit_t = jnp.where(gate, hit_t, INF)

        # normal of the winning leaf
        hx = p + d * jnp.where(jnp.isfinite(hit_t), hit_t, 0.0)[:, None]
        nor = jnp.zeros((R, 3), dt)
        for li, lf in enumerate(obj.leaves):
            mask = hit_leaf == li
            nl = self._leaf_normal(lf, hx, key=keys[li])
            nor = jnp.where(mask[:, None], nl, nor)
        return jnp.where(jnp.isfinite(hit_t), hit_t - self.eps, INF), nor

    # -- public queries ----------------------------------------------------

    def _groups(self, p, d, matter_only):
        """All candidate groups as (t [R,k], nor [R,k,3], oid [R,k],
        sign [R,k]) tuples."""
        dt = self.dtype
        R = p.shape[0]
        out = []
        for fam in (self._sphere_group, self._plane_group,
                    self._quadric_group):
            g = fam(p, d, matter_only)
            if g is not None:
                out.append(g)

        for lf, oid, env_c, env_r in self.tb.sdf:
            if matter_only and self.is_light[oid]:
                continue
            a, nor = self._hit_sdf_leaf(lf, env_c, env_r, p, d)
            sign = jnp.where(_dot(nor, d) > 0, 1.0, -1.0).astype(dt)
            out.append((a[:, None], nor[:, None, :],
                        jnp.full((R, 1), oid, jnp.int32), sign[:, None]))

        for ci, (obj, oid) in enumerate(self.tb.composites):
            if matter_only and self.is_light[oid]:
                continue
            a, nor = self._hit_composite(obj, p, d, ci=ci)
            sign = jnp.where(_dot(nor, d) > 0, 1.0, -1.0).astype(dt)
            out.append((a[:, None], nor[:, None, :],
                        jnp.full((R, 1), oid, jnp.int32), sign[:, None]))
        return out

    def nearest2(self, p, d, matter_only=False, rng_rough=True):
        """Nearest AND second-nearest hit over the whole scene, one pass.
        Returns (t1, nor1, oid1, sign1, t2, nor2, oid2, sign2); oid=-1 and
        nor=0 where miss.  The second hit is the coincident-surface
        candidate for media-transition resolution (reference
        src/compound.c:246-299)."""
        dt = self.dtype
        p = jnp.asarray(p, dt)
        d = jnp.asarray(d, dt)
        R = p.shape[0]

        groups = self._groups(p, d, matter_only)
        if not groups:
            z1 = jnp.full((R,), INF, dt)
            z3 = jnp.zeros((R, 3), dt)
            zi = jnp.full((R,), -1, jnp.int32)
            zs = jnp.zeros((R,), dt)
            return z1, z3, zi, zs, z1, z3, zi, zs

        T = jnp.concatenate([g[0] for g in groups], axis=1)      # [R, E]
        NOR = jnp.concatenate([g[1] for g in groups], axis=1)    # [R, E, 3]
        OID = jnp.concatenate([g[2] for g in groups], axis=1)
        SGN = jnp.concatenate([g[3] for g in groups], axis=1)

        t2v, sel = _top2_cols(T)                                  # [R, 2]
        nor = jnp.take_along_axis(NOR, sel[..., None], axis=1)
        oid = jnp.take_along_axis(OID, sel, axis=1)
        sgn = jnp.take_along_axis(SGN, sel, axis=1)

        fin = jnp.isfinite(t2v)
        nor = jnp.where(fin[..., None], nor, 0.0)
        oid = jnp.where(fin, oid, -1)
        sgn = jnp.where(fin, sgn, 0.0)

        nor1 = nor[:, 0, :]
        if rng_rough and np.any(self.roughness > 0):
            nor1 = self._perturb(nor1, p, d, t2v[:, 0], oid[:, 0])

        return (t2v[:, 0], nor1, oid[:, 0], sgn[:, 0],
                t2v[:, 1], nor[:, 1, :], oid[:, 1], sgn[:, 1])

    def nearest(self, p, d, matter_only=False, rng_rough=True):
        """Nearest hit over the whole scene.
        Returns (t[R], nor[R,3], oid[R], sign[R]; oid=-1 where miss)."""
        dt = self.dtype
        p = jnp.asarray(p, dt)
        d = jnp.asarray(d, dt)
        R = p.shape[0]

        groups = self._groups(p, d, matter_only)
        if not groups:
            return (jnp.full((R,), INF, dt), jnp.zeros((R, 3), dt),
                    jnp.full((R,), -1, jnp.int32), jnp.zeros((R,), dt))

        T = jnp.concatenate([g[0] for g in groups], axis=1)
        NOR = jnp.concatenate([g[1] for g in groups], axis=1)
        OID = jnp.concatenate([g[2] for g in groups], axis=1)
        SGN = jnp.concatenate([g[3] for g in groups], axis=1)

        sel = jnp.argmin(T, axis=1)
        t_min = jnp.min(T, axis=1)
        nor = jnp.take_along_axis(NOR, sel[:, None, None], axis=1)[:, 0, :]
        oid = jnp.take_along_axis(OID, sel[:, None], axis=1)[:, 0]
        sign = jnp.take_along_axis(SGN, sel[:, None], axis=1)[:, 0]

        fin = jnp.isfinite(t_min)
        nor = jnp.where(fin[:, None], nor, 0.0)
        oid = jnp.where(fin, oid, -1)
        sign = jnp.where(fin, sign, 0.0)

        if rng_rough and np.any(self.roughness > 0):
            nor = self._perturb(nor, p, d, t_min, oid)

        return t_min, nor, oid, sign

    def _perturb(self, nor, p, d, t, oid):
        """Surface-roughness normal perturbation (reference
        src/objects.c:261-284): per-component log-shaped bump seeded from
        the hit position."""
        from actinon_tpu import rng as argn
        rough = jnp.asarray(self.roughness)[jnp.maximum(oid, 0)]
        t_safe = jnp.where(jnp.isfinite(t), t, 0.0)
        hp = p + d * t_safe[:, None]
        seed = argn.seed_from_v3(hp, 1246)
        f = jnp.stack([argn.uniform_signed(seed, k, self.dtype) * 0.99
                       for k in range(3)], axis=-1)
        bump = jnp.log((1.0 - f) / (1.0 + f))
        new = _norm3(nor + rough[:, None] * bump)
        use = (rough > 0)[:, None] & jnp.isfinite(t)[:, None]
        return jnp.where(use, new, nor)

    # -- transition query (media boundaries) -------------------------------

    def _trans_from_pair(self, hits):
        """Assemble transition data from a nearest2 result: a second object
        whose hit lies within eps of the minimum fills the other role (the
        glass/wine media-transition case, reference src/compound.c:284-297)."""
        t, nor, oid, sign, t2, nor2, oid2, sign2 = hits
        exiting = sign > 0
        exit_nor = jnp.where(exiting[:, None], nor, -nor)
        enter = jnp.where(~exiting & (oid >= 0), oid, -1)
        exit_ = jnp.where(exiting & (oid >= 0), oid, -1)
        close = jnp.isfinite(t) & jnp.isfinite(t2) & (jnp.abs(t2 - t)
                                                      < 2 * self.eps)
        exiting2 = sign2 > 0
        enter = jnp.where(close & ~exiting2 & (enter < 0), oid2, enter)
        exit_ = jnp.where(close & exiting2 & (exit_ < 0), oid2, exit_)
        return t, exit_nor, enter, exit_

    def trans_hit(self, p, d):
        """scene_s_trans_hit + compound_s_ray_trans_hit semantics
        (reference src/scene.c:362-382, src/compound.c:246-299):
        nearest hit over light+matter with coincident-surface resolution,
        computed in a single scene traversal.
        Returns (t, exit_nor [anti-ray], enter_oid, exit_oid)."""
        return self._trans_from_pair(self.nearest2(p, d, matter_only=False))

    def trans_hit_matter(self, p, d):
        """Transition hit over the matter compound only — the path-ray
        trace (reference src/scene.c:607 uses
        compound_s_ray_trans_hit(scene->matter, ...))."""
        return self._trans_from_pair(self.nearest2(p, d, matter_only=True))

    def shadow_nearest_t(self, p, d):
        """Nearest matter hit distance (the NEE shadow test uses
        compound_s_ray_hit(matter) > a, reference src/scene.c:571).
        Normals are irrelevant to the comparison, so roughness is skipped."""
        t, _, _, _ = self.nearest(p, d, matter_only=True, rng_rough=False)
        return t

    def shadow_t(self, p, d):
        return self.shadow_nearest_t(p, d)
