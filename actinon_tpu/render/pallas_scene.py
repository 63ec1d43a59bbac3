"""Table-driven Pallas traversal kernels for composite-heavy scenes.

The round-4 artifact's worst number was hanging_lamp at 38.7k queries/s:
its 76 SDF solo composites evaluate as gate-compacted XLA march loops
whose every step is a handful of elementwise HLO ops over HBM-resident
pair arrays — latency-bound, ~2 orders of magnitude below the other
scenes (round-4 verdict #1, the builder's own named-but-unbuilt fix).

This module is the grouped-composite analog of pallas_bigscene.py:
shape-identical composites put their MEMBERS ON LANES.  One scene packs
into a single VMEM-resident parameter table of [rows, 128] f32 blocks —
one 128-lane block family per composite *shape* (same CSG tree, same
analytic/SDF slot pattern, the clustering key of
tracer._shape_clusters) — and rays stream through in [TR, 1] sublane
tiles.  Every (ray-tile x member-block) pair then evaluates as straight
[TR, 128] VPU tiles:

  * analytic slots: the unified generalized-quadric root math of
    tracer._quads/_roots with per-lane parameters read from the table,
  * SDF slots: the bounded bidirectional sphere march of
    tracer._sdf_march (reference src/objects.c:903-959), all 128
    members marching together in VMEM scratch, envelope-clipped per
    lane, early-exiting per tile via pl.when(any(active)),
  * the CSG boundary: the crossing-parity walk of tracer._walk
    (reference pair-marching src/objects.c:1052-1094) — as a sorted
    incremental toggle sweep (Batcher network over the shape's static
    crossing columns, then one in-order pass where each crossing flips
    its leaf's inside bit) when that is statically cheaper, else the
    per-candidate pairwise-parity unroll; both are parity-exact,
  * a running global top-2 across every lane of every shape (the merge
    of pallas_bigscene.build_top2_kernel), winners identified by a
    packed (shape, member, leaf) code that the tracer decodes outside
    the kernel to unified-table rows / object ids / SDF normals.

Singles (one-leaf objects) ride the same table as a trivial shape with
the per-family root policy (tracer._policy) selected by a per-lane kind
row; standalone SDF objects mirror tracer._hit_sdf_leaf (single
bidirectional march, not the crossing walk).  Per-block bounding
spheres (merged member envelopes, SMEM) let a whole ray tile skip a
block — the TPU-native form of the reference's author-defined
bounding-sphere hierarchy (compound_s_ray_hit envelope early-outs,
reference src/compound.c:215-244).

Oversized composites (crossing count > NC_CAP) stay on the tracer's
XLA paths and merge with the kernel's top-2 downstream, exactly like
pallas_bigscene's leftovers.  Kernels apply only on the plain f32
forward path (no traced overrides, no AD); the XLA tracer remains the
reference implementation, the CPU/diff fallback, and the A/B oracle
(tests/test_pallas_scene.py).
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from actinon_tpu.scene import ir as sir

INF = jnp.inf
F32_BIG = np.float32(3e38)
TR = 256          # rays per tile (sublane dimension)
LB = 128          # members per block (lane dimension)
NC_CAP = 64       # max crossing columns per shape (walk is O(NC^2))
LC_CAP = 32       # max leaves per shape


def _pl():
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    return pl, pltpu


def _out_struct(shape, dtype, like):
    """Match `like`'s mesh variance (shard_map drains)."""
    vma = getattr(jax.typeof(like), "vma", None)
    if vma:
        return jax.ShapeDtypeStruct(shape, dtype, vma=vma)
    return jax.ShapeDtypeStruct(shape, dtype)


# ---------------------------------------------------------------------------
# table build


class _Shape:
    """One lane-major shape family: static structure + per-member
    parameter lanes + host-side reconstruction tables."""

    __slots__ = ("kind", "tree", "Lc", "an_slots", "sdf_slots", "M",
                 "n_blocks", "row_off", "rows_per_block", "bid0",
                 "rows_flat", "oid", "sdf_m", "sdf_m0", "sdf_prm",
                 "sdf_neg", "shape_id", "has_light", "_lanes", "_envs")

    def __init__(self, kind, tree, Lc, an_slots, sdf_slots, M):
        self.kind = kind              # 'singles' | 'cluster' | 'sdfsingle'
        self.tree = tree
        self.Lc = Lc
        self.an_slots = an_slots      # local leaf idx of analytic slots
        self.sdf_slots = sdf_slots    # [(li, sdf_kind, cycles, neg)]
        self.M = M
        self.n_blocks = -(-M // LB)
        self.rows_flat = None         # np [Mpad*Lc] int32 (unified rows)
        self.oid = None               # np [Mpad] int32
        self.sdf_m = {}               # li -> np [Mpad,3,3]
        self.sdf_m0 = {}
        self.sdf_prm = {}
        self.sdf_neg = {}
        self.has_light = False

    @property
    def mpad(self):
        return self.n_blocks * LB


def _an_rows(tab, row):
    """The 20 per-lane parameter values of one unified-table row."""
    return ([float(tab.M[row][i][j]) for i in range(3) for j in range(3)]
            + [float(x) for x in tab.m0[row]]
            + [float(x) for x in tab.c2[row]]
            + [float(x) for x in tab.c1[row]]
            + [float(tab.rr[row]), float(tab.kind[row])])


HDR = 6                  # alive, is_light, env c (3), env r
AN_ROWS = 20             # M 9, m0 3, c2 3, c1 3, rr 1, kind 1
SDF_ROWS = 13            # m 9, m0 3, param 1


def _merge_bound(b1, b2):
    if b1 is None or b2 is None:
        return None
    c1, r1 = b1
    c2, r2 = b2
    d = float(np.linalg.norm(c2 - c1))
    if d + r2 <= r1:
        return b1
    if d + r1 <= r2:
        return b2
    r = 0.5 * (d + r1 + r2)
    c = c1 + (c2 - c1) * ((r - r1) / d if d > 0 else 0.0)
    return (c, r)


class SceneTable:
    """Packed per-scene parameter table + shape specs + leftovers.

    matter_only=True builds the shadow table (light members dropped,
    reference src/scene.c:571 traces the matter compound only)."""

    def __init__(self, tracer, matter_only: bool,
                 exclude_rows: Optional[np.ndarray] = None):
        self.eps = np.float32(tracer.eps)
        self.matter_only = matter_only
        tab = tracer.tab
        shapes: List[_Shape] = []
        # leftovers the tracer must still evaluate on its XLA paths
        self.rest_groups: List[list] = []
        self.rest_solos: List = []
        self.covered_solo_ids: set = set()
        self.covered_sdf_idx: set = set()
        self.covered_single_rows = np.zeros((0,), np.int32)

        # -- singles ------------------------------------------------------
        rows = tracer.single_rows
        if matter_only and len(rows):
            rows = rows[~tab.is_light[rows]]
        if exclude_rows is not None and len(exclude_rows) and len(rows):
            rows = np.setdiff1d(rows, exclude_rows)
        members_s = []
        for r in rows:
            members_s.append(dict(
                env_c=tab.env_c[r], env_r=float(tab.env_r[r]),
                light=bool(tab.is_light[r]), an=[_an_rows(tab, int(r))],
                sdf=[], rows=[int(r)], oid=int(tab.oid[r])))
        if members_s:
            sh = _Shape("singles", None, 1, [0], [], len(members_s))
            self._fill(sh, members_s)
            shapes.append(sh)
            self.covered_single_rows = np.asarray(rows, np.int32)

        # -- standalone SDF objects (tracer._hit_sdf_leaf semantics) ------
        by_key: Dict = {}
        for si, (lf, oid, env_c, env_r, light) in enumerate(
                tracer.sdf_singles):
            if matter_only and light:
                continue
            key = (lf.sdf_kind, int(lf.cycles), bool(lf.neg))
            by_key.setdefault(key, []).append((si, lf, oid, env_c, env_r,
                                               light))
            self.covered_sdf_idx.add(si)
        for (kind, cycles, neg), ms in by_key.items():
            members = []
            for si, lf, oid, env_c, env_r, light in ms:
                members.append(dict(
                    env_c=np.asarray(env_c if env_c is not None
                                     else np.zeros(3)),
                    env_r=float(env_r if env_c is not None else -1.0),
                    light=light, an=[],
                    sdf=[(np.asarray(lf.m, np.float32),
                          np.asarray(lf.m0, np.float32),
                          float(lf.sdf_param))],
                    rows=[-1], oid=oid))
            sh = _Shape("sdfsingle", ("leaf", 0), 1, [],
                        [(0, kind, cycles, neg)], len(members))
            self._fill(sh, members)
            shapes.append(sh)

        # -- solo clusters (analytic + SDF composites) --------------------
        for cluster in tracer._solo_clusters():
            proto = cluster[0]
            if matter_only and proto.is_light:
                continue
            n_an = sum(1 for r in proto.rows if r >= 0)
            sslots = [(li, lf.sdf_kind, int(lf.cycles), bool(lf.neg))
                      for li, lf in enumerate(proto.sdf_leaves)
                      if lf is not None]
            nc = 2 * n_an + 4 * len(sslots)
            if nc > NC_CAP or len(proto.rows) > LC_CAP:
                self.rest_solos.extend(cluster)
                continue
            an_slots = [li for li, r in enumerate(proto.rows) if r >= 0]
            members = []
            for c in cluster:
                members.append(dict(
                    env_c=np.asarray(c.env_c if c.env_c is not None
                                     else np.zeros(3)),
                    env_r=float(c.env_r if c.env_c is not None else -1.0),
                    light=c.is_light,
                    an=[_an_rows(tab, c.rows[li]) for li in an_slots],
                    sdf=[(np.asarray(c.sdf_leaves[li].m, np.float32),
                          np.asarray(c.sdf_leaves[li].m0, np.float32),
                          float(c.sdf_leaves[li].sdf_param))
                         for li, *_ in sslots],
                    rows=list(c.rows), oid=c.oid))
            sh = _Shape("cluster", proto.tree, len(proto.rows),
                        an_slots, sslots, len(members))
            self._fill(sh, members)
            shapes.append(sh)
            self.covered_solo_ids.update(id(c) for c in cluster)

        # -- all-analytic composite groups --------------------------------
        for members_g in tracer.comp_groups:
            mf = [c for c in members_g
                  if not (matter_only and c.is_light)]
            if not mf:
                continue
            proto = mf[0]
            Lc = len(proto.rows)
            # singleton analytic composites with a large crossing count
            # stay on the XLA poly walk: they dominate the unrolled
            # parity-walk compile cost (NC^2 tile ops) while occupying
            # one lane, and _group_hit is already matmul-shaped for them
            if 2 * Lc > NC_CAP or Lc > LC_CAP \
                    or (len(mf) == 1 and 2 * Lc > 24):
                self.rest_groups.append(mf)
                continue
            members = []
            for c in mf:
                members.append(dict(
                    env_c=np.asarray(c.env_c if c.env_c is not None
                                     else np.zeros(3)),
                    env_r=float(c.env_r if c.env_c is not None else -1.0),
                    light=c.is_light,
                    an=[_an_rows(tab, r) for r in c.rows],
                    sdf=[], rows=list(c.rows), oid=c.oid))
            sh = _Shape("cluster", proto.tree, Lc, list(range(Lc)), [],
                        len(members))
            self._fill(sh, members)
            shapes.append(sh)

        # leftovers: uncovered sdf singles under matter_only are handled
        # by the caller re-checking tracer.sdf_singles lights
        self.shapes = shapes
        self._pack()

    def _fill(self, sh: _Shape, members):
        """Populate a shape's lane data + reconstruction tables from the
        per-member dicts."""
        Mpad = sh.mpad
        lanes = np.zeros((Mpad, HDR + AN_ROWS * len(sh.an_slots)
                          + SDF_ROWS * len(sh.sdf_slots)), np.float32)
        rows_flat = np.full((Mpad * sh.Lc,), -1, np.int32)
        oid = np.full((Mpad,), -1, np.int32)
        env_list = []
        for mi, m in enumerate(members):
            r = 0
            lanes[mi, 0] = 1.0
            lanes[mi, 1] = 1.0 if m["light"] else 0.0
            lanes[mi, 2:5] = m["env_c"]
            lanes[mi, 5] = m["env_r"]
            r = HDR
            for an in m["an"]:
                lanes[mi, r:r + AN_ROWS] = an
                r += AN_ROWS
            for mm, mm0, prm in m["sdf"]:
                lanes[mi, r:r + 9] = np.asarray(mm, np.float32).reshape(9)
                lanes[mi, r + 9:r + 12] = mm0
                lanes[mi, r + 12] = prm
                r += SDF_ROWS
            rows_flat[mi * sh.Lc:(mi + 1) * sh.Lc] = m["rows"]
            oid[mi] = m["oid"]
            sh.has_light = sh.has_light or m["light"]
            env_list.append((m["env_c"], m["env_r"]))
        sh.rows_flat = rows_flat
        sh.oid = oid
        for k, (li, *_rest) in enumerate(sh.sdf_slots):
            m_s = np.zeros((Mpad, 3, 3), np.float32)
            m0_s = np.zeros((Mpad, 3), np.float32)
            p_s = np.zeros((Mpad,), np.float32)
            for mi, m in enumerate(members):
                mm, mm0, prm = m["sdf"][k]
                m_s[mi] = mm
                m0_s[mi] = mm0
                p_s[mi] = prm
            sh.sdf_m[li] = m_s
            sh.sdf_m0[li] = m0_s
            sh.sdf_prm[li] = p_s
            sh.sdf_neg[li] = sh.sdf_slots[k][3]
        sh._lanes = lanes          # type: ignore[attr-defined]
        sh._envs = env_list        # type: ignore[attr-defined]

    def _pack(self):
        """Concatenate all shape blocks into ONE [TOT, 128] table plus
        per-block bounding spheres [NB, 8]."""
        rows = []
        bounds = []
        off = 0
        bid = 0
        for sid, sh in enumerate(self.shapes):
            sh.shape_id = sid
            sh.row_off = off
            n_feat = (HDR + AN_ROWS * len(sh.an_slots)
                      + SDF_ROWS * len(sh.sdf_slots))
            sh.rows_per_block = n_feat
            sh.bid0 = bid
            lanes = sh._lanes                       # [Mpad, n_feat]
            for b in range(sh.n_blocks):
                blk = lanes[b * LB:(b + 1) * LB].T  # [n_feat, 128]
                rows.append(blk)
                # block bound: merged member envelopes; unbounded when
                # any live member lacks one (r2 = -1 -> never skip)
                bound = None
                ok = True
                for mi in range(b * LB, min((b + 1) * LB, sh.M)):
                    ec, er = sh._envs[mi]
                    if er <= 0:
                        ok = False
                        break
                    bb = (np.asarray(ec, np.float64), float(er))
                    bound = bb if bound is None else _merge_bound(bound, bb)
                brow = np.zeros((8,), np.float32)
                if ok and bound is not None:
                    brow[0:3] = bound[0]
                    brow[3] = (bound[1] + 2.0 * float(self.eps)) ** 2
                else:
                    brow[3] = -1.0
                bounds.append(brow)
                bid += 1
            off += sh.n_blocks * n_feat
            del sh._lanes, sh._envs
        self.table = (np.concatenate(rows, axis=0) if rows
                      else np.zeros((1, LB), np.float32))
        self.bounds = (np.stack(bounds) if bounds
                       else np.zeros((1, 8), np.float32))

    @property
    def n_shapes(self):
        return len(self.shapes)


# ---------------------------------------------------------------------------
# in-kernel math (mirrors tracer._quads/_roots/_policy/_sdf_march exactly)


def _quad_lane(px, py, pz, dx, dy, dz, P):
    """(A, B, C) of the generalized quadric along the ray; P = 20 table
    rows [1,128] (tracer._quads with per-lane parameters)."""
    plv = [P[3 * i + 0] * px + P[3 * i + 1] * py + P[3 * i + 2] * pz
           + P[9 + i] for i in range(3)]
    dlv = [P[3 * i + 0] * dx + P[3 * i + 1] * dy + P[3 * i + 2] * dz
           for i in range(3)]
    c2 = P[12:15]
    c1 = P[15:18]
    rr = P[18]
    A = sum(c2[i] * dlv[i] * dlv[i] for i in range(3))
    B = (2.0 * sum(c2[i] * dlv[i] * plv[i] for i in range(3))
         + sum(c1[i] * dlv[i] for i in range(3)))
    C = (sum(c2[i] * plv[i] * plv[i] for i in range(3))
         + sum(c1[i] * plv[i] for i in range(3)) + rr)
    return A, B, C


def _roots_lane(A, B, C):
    """Both roots, INF-padded; exactly tracer._roots."""
    is_quad = A != 0
    safe_A = jnp.where(is_quad, A, 1.0)
    s = (B * 0.5) / safe_A
    q = C / safe_A
    disc = s * s - q
    ok = is_quad & (disc >= 0)
    root = jnp.sqrt(jnp.where(ok, disc, 0.0))
    ta = -s - root
    tb = -s + root
    tb_nz = jnp.abs(tb) > 0
    ta_nz = jnp.abs(ta) > 0
    t0 = jnp.where(s < 0, jnp.where(tb_nz, q / jnp.where(tb_nz, tb, 1.0),
                                    ta), ta)
    t1 = jnp.where(s > 0, jnp.where(ta_nz, q / jnp.where(ta_nz, ta, 1.0),
                                    tb), tb)
    lin_nz = B != 0
    t_lin = jnp.where(lin_nz, -C / jnp.where(lin_nz, B, 1.0), INF)
    t0u = jnp.where(is_quad, jnp.where(ok, t0, INF), t_lin)
    t1u = jnp.where(is_quad, jnp.where(ok, t1, INF), INF)
    return t0u, t1u, s, q, ok, is_quad


def _policy_lane(kind_row, t0u, t1u, s, q, ok, eps):
    """Family root policy with a per-lane kind row (tracer._policy)."""
    is_pl = kind_row == float(sir.PLANE)
    is_sp = kind_row == float(sir.SPHERE)
    a_pl = jnp.where(t0u > 0, t0u - eps, INF)
    entering = (s < 0) & (q > 0)
    exiting = (s < 0) | (q < 0)
    a_sp = jnp.where(entering, t0u, jnp.where(exiting, t1u, INF))
    a_sp = jnp.where(ok, a_sp - eps, INF)
    a_qu = jnp.where(t0u >= 0, t0u, jnp.where(t1u >= 0, t1u, INF))
    a_qu = jnp.where(jnp.isfinite(a_qu), a_qu - eps, INF)
    return jnp.where(is_pl, a_pl, jnp.where(is_sp, a_sp, a_qu))


def _env_interval_lane(px, py, pz, dx, dy, dz, ecx, ecy, ecz, er):
    """(gate, t_in, t_out) of per-lane envelope spheres
    (tracer._env_interval); er <= 0 lanes gate True with the full line."""
    ex = px - ecx
    ey = py - ecy
    ez = pz - ecz
    s = ex * dx + ey * dy + ez * dz
    q = ex * ex + ey * ey + ez * ez - er * er
    disc = s * s - q
    hit = (disc >= 0) & ((s < 0) | (q < 0))
    no_env = er <= 0
    gate = no_env | hit
    root = jnp.sqrt(jnp.where(disc > 0, disc, 0.0))
    t_in = jnp.where(no_env, 0.0, jnp.maximum(-s - root, 0.0))
    t_out = jnp.where(no_env, F32_BIG, -s + root)
    return gate, t_in, t_out


def _sdf_eval_lane(kind, prm, x, y, z):
    """tracer._sdf_eval on coordinate tiles."""
    if kind == sir.SDF_SPHERE:
        return jnp.sqrt(x * x + y * y + z * z) - 1.0
    if kind == sir.SDF_TORUS:
        f = jnp.sqrt(x * x + y * y)
        f_inv = jnp.where(f > 0, 1.0 / jnp.where(f > 0, f, 1.0), 1.0)
        xu = x * f_inv
        yu = y * f_inv
        return jnp.sqrt((xu - x) ** 2 + (yu - y) ** 2 + z * z) - prm
    raise ValueError(kind)


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


def _tree_nodes(tree):
    if tree[0] == "leaf":
        return 1
    if tree[0] == "not":
        return 1 + _tree_nodes(tree[1])
    return 1 + _tree_nodes(tree[1]) + _tree_nodes(tree[2])


def _sort_network(n):
    """Batcher odd-even mergesort comparator pairs for n inputs (the
    power-of-2 network pruned of comparators that touch +INF-padded
    slots — exact for ascending sorts because a comparator whose upper
    index is padding never moves anything)."""
    pairs = []
    p = 1
    while p < n:
        k = p
        while k >= 1:
            for j in range(k % p, n - k, 2 * k):
                for i in range(min(k, n - j - k)):
                    if (i + j) // (p * 2) == (i + j + k) // (p * 2):
                        pairs.append((i + j, i + j + k))
            k >>= 1
        p <<= 1
    return pairs


# ---------------------------------------------------------------------------
# kernel builder


def build_kernels(st: SceneTable, interpret=False):
    """(top2_fn, anyhit_fn) over the packed table.

    top2_fn(p [N,3], d [N,3], lane_matter [N] f32) ->
        (t [N,2] eps-backed candidates, code [N,2] int32)
    with code = (shape_id << 24) | (member << 8) | leaf_loc, code -1 on
    miss.  lane_matter lanes ignore light members (the mixed-wavefront
    masking of tracer.trans_hit_mixed).

    anyhit_fn(p, d, limit [N]) -> blocked [N] bool (the matter shadow
    any-hit; build from a matter_only table)."""
    pl, pltpu = _pl()
    eps = st.eps
    eps4 = np.float32(4.0 * float(eps))
    slack = np.float32(8.0 * float(eps))
    # march acceptance shell (tracer.MARCH_ACCEPT rationale)
    from actinon_tpu.render.tracer import MARCH_ACCEPT
    accept = np.float32(MARCH_ACCEPT * float(eps))

    # adaptive ray-tile size (shadows the module TR inside this builder):
    # the sorted toggle walk keeps ~(2NC + Lc) [TR, 128] values live at
    # once, and Mosaic's scoped-VMEM stack is ~16 MB — scenes whose
    # largest shape would blow that at 256-ray tiles drop to 128
    # (TR=256 was worth only ~1.5% on hanging_lamp, PROFILE_r05).
    peak_tiles = 12
    for sh in st.shapes:
        if sh.kind != "cluster":
            continue
        nc = 2 * len(sh.an_slots) + 4 * len(sh.sdf_slots)
        nodes = _tree_nodes(sh.tree)
        srt = 5 * len(_sort_network(nc)) + nc * (2 * sh.Lc + nodes + 7)
        nc2 = 6 * nc * nc + 2 * nc * (sh.Lc + nodes)
        live = (2 * nc + sh.Lc + 12) if srt < nc2 \
            else (nc + 2 * sh.Lc + 12)
        peak_tiles = max(peak_tiles, live)
    TR = 256 if peak_tiles * 256 * LB * 4 < 11 * (1 << 20) else 128

    def shape_boundary(sh: _Shape, b, tab_ref, px, py, pz, dx, dy, dz,
                       mo_s, md_s, ma_s, sa_s, lim=None):
        """(a [TR,128] eps-backed env-gated, leaf_loc int32 [TR,128],
        light [1,128]) of one shape block.  mo/md/ma are the shared
        march scratch refs (offset, dist, active).

        lim ([TR,1], any-hit query only) additionally bails marches past
        the per-ray shadow limit: crossings beyond it are rejected by
        the caller's `<= lim` test anyway, and NEE shadow rays are SHORT
        (bounded by the light hit; 0 where the light sample missed), so
        limit-bailed lanes skip most of their march budget."""
        base = sh.row_off + b * sh.rows_per_block
        row = lambda i: tab_ref[base + i:base + i + 1, :]
        alive = row(0)
        light = row(1)
        gate, t_in_raw, t_out_raw = _env_interval_lane(
            px, py, pz, dx, dy, dz, row(2), row(3), row(4), row(5))
        gate = gate & (alive > 0)
        # slack applies to the CLUSTER clip only (tracer._solo_body_core
        # / _composite_crossings); the standalone-SDF path clips at the
        # raw envelope entry (tracer._hit_sdf_leaf)
        t_in = jnp.maximum(t_in_raw - slack, 0.0)
        t_out = t_out_raw + slack

        def sdf_local(off):
            """(pl*, dl* unit, dn) of sdf slot at feature offset off."""
            m = [row(off + i) for i in range(9)]
            m0 = [row(off + 9 + i) for i in range(3)]
            plv = [m[3 * i] * px + m[3 * i + 1] * py + m[3 * i + 2] * pz
                   + m0[i] for i in range(3)]
            dl0 = [m[3 * i] * dx + m[3 * i + 1] * dy + m[3 * i + 2] * dz
                   for i in range(3)]
            dn2 = dl0[0] ** 2 + dl0[1] ** 2 + dl0[2] ** 2
            dn = jnp.sqrt(dn2)
            inv = jnp.where(dn > 0, 1.0 / jnp.where(dn > 0, dn, 1.0), 1.0)
            dl = [v * inv for v in dl0]
            return plv, dl, dn

        def march(kind, cycles, prm, plv, dl, offs0, dead, stop_total):
            """tracer._sdf_march on tiles; returns (offs_l, dist).

            stop_total (local units, or None) bails lanes whose total
            offset passes the envelope exit: any crossing out there is
            rejected by the caller's stop test anyway, and a bailed lane
            ends with |dist| > accept (same miss verdict as marching the
            full 200 cycles) — miss lanes otherwise march their
            exponentially growing steps all the way to the 1e30 ceiling
            and dominate the tile's trip count."""
            p0 = [plv[i] + dl[i] * offs0 for i in range(3)]
            dist0 = _sdf_eval_lane(kind, prm, *p0)
            forward = dist0 > 0
            mo_s[:] = jnp.zeros((TR, LB), jnp.float32)
            md_s[:] = jnp.broadcast_to(dist0, (TR, LB))
            ma_s[:] = jnp.broadcast_to(jnp.where(dead, 0.0, 1.0),
                                       (TR, LB))

            # U masked steps per fori iteration: the scalar loop + the
            # any-reduce are the dominant cost once lanes converge (the
            # table kernel runs ~30 marches x 200 cycles per tile, and
            # per-iteration overhead alone was ~0.4 s per 32k-ray query).
            # The active flag lives in SMEM (sa_s): skipped iterations
            # then cost a scalar read + branch instead of a [TR, LB]
            # VMEM reduction.
            U = 8
            sa_s[0] = jnp.any(~dead).astype(jnp.float32)

            def body(i, carry):
                @pl.when(sa_s[0] > 0)
                def _():
                    act = ma_s[:] > 0
                    dist = md_s[:]
                    offs1 = mo_s[:]
                    for _k in range(U):
                        if cycles % U and _k:
                            # exact trip-count parity with the XLA
                            # march when U does not divide cycles
                            act = act & (i * U + _k < cycles)
                        step = jnp.where(forward, dist + eps,
                                         -(dist - eps))
                        offs1 = jnp.where(act, offs1 + step, offs1)
                        dnew = _sdf_eval_lane(
                            kind, prm,
                            p0[0] + dl[0] * offs1,
                            p0[1] + dl[1] * offs1,
                            p0[2] + dl[2] * offs1)
                        dist = jnp.where(act, dnew, dist)
                        # select-on-bool lowers to an unsupported
                        # i8->i1 truncation in Mosaic; logical ops
                        crossed = (forward
                                   & ((dist < 0) | (dist > 1e30))) \
                            | (~forward
                               & ((dist > 0) | (dist < -1e30)))
                        if stop_total is not None:
                            crossed = crossed \
                                | (offs0 + offs1 > stop_total)
                        act = act & ~crossed
                    mo_s[:] = offs1
                    md_s[:] = dist
                    ma_s[:] = jnp.where(act, 1.0, 0.0)
                    sa_s[0] = jnp.any(act).astype(jnp.float32)
                return carry

            jax.lax.fori_loop(0, -(-cycles // U), body, 0)
            return offs0 + mo_s[:], md_s[:]

        if sh.kind == "singles":
            P = [row(HDR + i) for i in range(AN_ROWS)]
            A, B, C = _quad_lane(px, py, pz, dx, dy, dz, P)
            t0u, t1u, s, q, ok, _ = _roots_lane(A, B, C)
            a = _policy_lane(P[19], t0u, t1u, s, q, ok, eps)
            a = jnp.where(gate, a, INF)
            return a, jnp.zeros(a.shape, jnp.int32), light

        if sh.kind == "sdfsingle":
            # tracer._hit_sdf_leaf: envelope-clipped entry, ONE
            # bidirectional march, |dist| <= eps accepts
            li, kind, cycles, neg = sh.sdf_slots[0]
            off = HDR
            plv, dl, dn = sdf_local(off)
            prm = row(off + 12)
            dead = ~gate
            # world start at envelope entry (outside-only), local units
            offs0 = t_in_raw * dn
            stop_w = t_out_raw + slack
            if lim is not None:
                stop_w = jnp.minimum(stop_w, lim + slack)
            offs_l, dist = march(kind, cycles, prm, plv, dl, offs0, dead,
                                 stop_w * dn)
            hit = gate & (jnp.abs(dist) <= accept)
            dn_inv = jnp.where(dn > 0, 1.0 / jnp.where(dn > 0, dn, 1.0),
                               1.0)
            a = jnp.where(hit, offs_l * dn_inv - eps, INF)
            return a, jnp.zeros(a.shape, jnp.int32), light

        # -- cluster: crossings + parity walk -----------------------------
        cross = []
        col_leaf = []
        inside = [None] * sh.Lc
        off = HDR
        for k, li in enumerate(sh.an_slots):
            P = [row(off + i) for i in range(AN_ROWS)]
            off += AN_ROWS
            A, B, C = _quad_lane(px, py, pz, dx, dy, dz, P)
            t0u, t1u, _, _, _, _ = _roots_lane(A, B, C)
            cross.append(jnp.where(t0u > 0, t0u, INF))
            col_leaf.append(li)
            cross.append(jnp.where(t1u > 0, t1u, INF))
            col_leaf.append(li)
            inside[li] = C <= 0
        for k, (li, kind, cycles, neg) in enumerate(sh.sdf_slots):
            plv, dl, dn = sdf_local(off)
            prm = row(off + 12)
            off += SDF_ROWS
            dn_safe = jnp.where(dn > 0, dn, 1.0)
            dn_inv = 1.0 / dn_safe
            # tracer._sdf_crossings: 4 sequential marches clipped to the
            # envelope interval
            offs = t_in * dn
            dead = ~gate
            t_stop = t_out if lim is None \
                else jnp.minimum(t_out, lim + slack)
            stop_l = t_stop * dn
            for _c in range(4):
                offs_l, dist = march(kind, cycles, prm, plv, dl, offs,
                                     dead, stop_l)
                hit = (~dead) & (jnp.abs(dist) <= accept) \
                    & (offs_l <= stop_l)
                t_world = jnp.where(hit & (offs_l > 0), offs_l * dn_inv,
                                    INF)
                cross.append(t_world)
                col_leaf.append(li)
                dead = dead | ~hit
                offs = offs_l + eps4
            # origin inside-ness at the TRUE ray origin
            pq = [plv[i] for i in range(3)]
            inside[li] = _sdf_eval_lane(kind, prm, *pq) <= 0

        NC = len(cross)
        nodes = _tree_nodes(sh.tree)
        pairs = _sort_network(NC)
        # tile-op estimates of the two walk formulations; pick the
        # cheaper one statically (both are parity-exact, see below)
        cost_sorted = 5 * len(pairs) + NC * (2 * sh.Lc + nodes + 7)
        cost_nc2 = 6 * NC * NC + 2 * NC * (sh.Lc + nodes)
        if cost_sorted < cost_nc2:
            # -- sorted incremental toggle walk --------------------------
            # Sort the NC crossing columns ascending per lane (Batcher
            # network; INF = invalid sorts last), then sweep once: each
            # crossing TOGGLES its leaf's inside bit — identical to the
            # pairwise crossing-parity state (state after t = inside0 ^
            # count(crossings <= t)), at O(NC log^2 NC) compare-exchanges
            # instead of O(NC^2) pair compares.  Coincident crossings
            # (equal t) flip JOINTLY exactly like the XLA walk's <=/<
            # pair: the flip test fires only where a tie run ends
            # (t_j != t_{j+1}), comparing against the tree state from
            # before the run; toggles commute, so the within-run apply
            # order the network leaves is irrelevant.  Winner-leaf
            # attribution inside a cross-leaf tie run takes the run's
            # LAST column (the XLA argmin takes the first) — same
            # accepted tie-order caveat as the pair-compacted merge
            # (tracer._pair_compact_on policy note).
            t_s = list(cross)
            lf_s = [jnp.full((TR, LB), int(li), jnp.int32)
                    for li in col_leaf]
            for i, j in pairs:
                swap = t_s[i] > t_s[j]
                t_s[i], t_s[j] = (jnp.where(swap, t_s[j], t_s[i]),
                                  jnp.where(swap, t_s[i], t_s[j]))
                lf_s[i], lf_s[j] = (jnp.where(swap, lf_s[j], lf_s[i]),
                                    jnp.where(swap, lf_s[i], lf_s[j]))
            state = [inside[li] for li in range(sh.Lc)]
            v_run = _tree_eval(sh.tree, state)
            found = jnp.zeros((TR, LB), bool)
            best = jnp.full((TR, LB), INF, jnp.float32)
            best_leaf = jnp.zeros((TR, LB), jnp.int32)
            for j in range(NC):
                for li in range(sh.Lc):
                    state[li] = state[li] ^ (lf_s[j] == li)
                v_new = _tree_eval(sh.tree, state)
                t_next = t_s[j + 1] if j + 1 < NC else INF
                run_end = t_s[j] != t_next     # False for INF (invalid)
                flip = run_end & (v_new ^ v_run)
                win = flip & ~found
                found = found | flip
                best = jnp.where(win, t_s[j], best)
                best_leaf = jnp.where(win, lf_s[j], best_leaf)
                # select-on-bool lowers to an unsupported i8->i1
                # truncation in Mosaic; logical ops
                v_run = (v_run & ~run_end) | (v_new & run_end)
        else:
            # -- per-candidate pairwise parity walk ----------------------
            best = jnp.full((TR, LB), INF, jnp.float32)
            best_leaf = jnp.zeros((TR, LB), jnp.int32)
            for j in range(NC):
                tj = cross[j]
                vj = tj < F32_BIG
                pa = [None] * sh.Lc
                pb = [None] * sh.Lc
                for c in range(NC):
                    li = col_leaf[c]
                    vc = cross[c] < F32_BIG
                    xa = (cross[c] <= tj) & vc
                    xb = (cross[c] < tj) & vc
                    pa[li] = xa if pa[li] is None else pa[li] ^ xa
                    pb[li] = xb if pb[li] is None else pb[li] ^ xb
                ba = [inside[li] ^ (pa[li] if pa[li] is not None
                                    else jnp.zeros_like(vj))
                      for li in range(sh.Lc)]
                bb = [inside[li] ^ (pb[li] if pb[li] is not None
                                    else jnp.zeros_like(vj))
                      for li in range(sh.Lc)]
                flip = (_tree_eval(sh.tree, ba)
                        != _tree_eval(sh.tree, bb)) & vj
                win = flip & (tj < best)
                best = jnp.where(win, tj, best)
                best_leaf = jnp.where(win, col_leaf[j], best_leaf)
        a = jnp.where(gate & (best < F32_BIG), best - eps, INF)
        return a, best_leaf, light

    def block_cull(bounds_ref, bid, px, py, pz, dx, dy, dz,
                   lim=None, bl=None):
        """Any ray in the tile can touch the block bound (r2 < 0 means
        unbounded: always process).  For the any-hit query (lim/bl
        given) the test is limit-aware: a block only matters to rays
        that are still unblocked AND whose bound ENTRY lies within
        their shadow limit (pallas_bigscene anyhit cull)."""
        r2 = bounds_ref[bid, 3]
        ex = bounds_ref[bid, 0] - px
        ey = bounds_ref[bid, 1] - py
        ez = bounds_ref[bid, 2] - pz
        s = ex * dx + ey * dy + ez * dz
        q = ex * ex + ey * ey + ez * ez - r2
        disc = s * s - q
        hit = (disc >= 0) & ((s > 0) | (q < 0))
        if lim is None:
            return (r2 < 0) | jnp.any(hit)
        te = jnp.maximum(s - jnp.sqrt(jnp.where(disc >= 0, disc, 0.0)),
                         0.0)
        want = hit & (te <= lim) & (bl == 0.0)
        return (r2 < 0) | jnp.any(want)

    lanes_iota = None  # built inside kernels

    # -- top-2 kernel ------------------------------------------------------

    def kernel_top2(bounds_ref, tab_ref, px_r, py_r, pz_r, dx_r, dy_r,
                    dz_r, lm_r, t1_o, t2_o, c1_o, c2_o,
                    t1_s, t2_s, c1_s, c2_s, mo_s, md_s, ma_s,
                    sa_s):
        px, py, pz = px_r[:], py_r[:], pz_r[:]
        dx, dy, dz = dx_r[:], dy_r[:], dz_r[:]
        lm = lm_r[:]
        t1_s[:] = jnp.full((TR, 1), INF, jnp.float32)
        t2_s[:] = jnp.full((TR, 1), INF, jnp.float32)
        c1_s[:] = jnp.full((TR, 1), -1, jnp.int32)
        c2_s[:] = jnp.full((TR, 1), -1, jnp.int32)
        lanes = jax.lax.broadcasted_iota(jnp.int32, (TR, LB), 1)

        for sh in st.shapes:
            for b in range(sh.n_blocks):
                @pl.when(block_cull(bounds_ref, sh.bid0 + b,
                                    px, py, pz, dx, dy, dz))
                def _(sh=sh, b=b):
                    a, leaf_loc, light = shape_boundary(
                        sh, b, tab_ref, px, py, pz, dx, dy, dz,
                        mo_s, md_s, ma_s, sa_s)
                    if sh.has_light:
                        a = jnp.where((light > 0) & (lm > 0), INF, a)
                    code = ((sh.shape_id << 24)
                            | ((b * LB + lanes) << 8) | leaf_loc)
                    b1 = jnp.min(a, axis=1, keepdims=True)

                    @pl.when(jnp.any(b1 < t2_s[:]))
                    def _():
                        bi1 = jnp.argmin(a, axis=1).astype(
                            jnp.int32)[:, None]
                        g1 = jnp.sum(jnp.where(lanes == bi1, code, 0),
                                     axis=1, keepdims=True)
                        a2 = jnp.where(lanes == bi1, INF, a)
                        b2 = jnp.min(a2, axis=1, keepdims=True)
                        bi2 = jnp.argmin(a2, axis=1).astype(
                            jnp.int32)[:, None]
                        g2 = jnp.sum(jnp.where(lanes == bi2, code, 0),
                                     axis=1, keepdims=True)
                        t1, t2 = t1_s[:], t2_s[:]
                        i1, i2 = c1_s[:], c2_s[:]
                        lo_t = jnp.minimum(t1, b1)
                        lo_i = jnp.where(b1 < t1, g1, i1)
                        hi_t = jnp.maximum(t1, b1)
                        hi_i = jnp.where(b1 < t1, i1, g1)
                        w2 = jnp.minimum(t2, b2)
                        w2i = jnp.where(b2 < t2, g2, i2)
                        t1_s[:] = lo_t
                        c1_s[:] = lo_i
                        t2_s[:] = jnp.minimum(hi_t, w2)
                        c2_s[:] = jnp.where(hi_t <= w2, hi_i, w2i)

        fin1 = jnp.isfinite(t1_s[:])
        fin2 = jnp.isfinite(t2_s[:])
        t1_o[:] = t1_s[:]
        t2_o[:] = t2_s[:]
        c1_o[:] = jnp.where(fin1, c1_s[:], -1)
        c2_o[:] = jnp.where(fin2, c2_s[:], -1)

    # -- any-hit kernel ----------------------------------------------------

    def kernel_anyhit(bounds_ref, tab_ref, px_r, py_r, pz_r, dx_r, dy_r,
                      dz_r, lim_r, out_r, bl_s, mo_s, md_s, ma_s,
                      sa_s):
        px, py, pz = px_r[:], py_r[:], pz_r[:]
        dx, dy, dz = dx_r[:], dy_r[:], dz_r[:]
        lim = lim_r[:]
        bl_s[:] = jnp.zeros((TR, 1), jnp.float32)

        for sh in st.shapes:
            for b in range(sh.n_blocks):
                @pl.when(block_cull(bounds_ref, sh.bid0 + b,
                                    px, py, pz, dx, dy, dz,
                                    lim=lim, bl=bl_s[:]))
                def _(sh=sh, b=b):
                    a, _, _ = shape_boundary(
                        sh, b, tab_ref, px, py, pz, dx, dy, dz,
                        mo_s, md_s, ma_s, sa_s, lim=lim)
                    hit = jnp.min(a, axis=1, keepdims=True) <= lim
                    bl_s[:] = jnp.maximum(bl_s[:], hit.astype(jnp.float32))
        out_r[:] = bl_s[:]

    # -- host wrappers -----------------------------------------------------

    bounds_np = st.bounds
    table_np = st.table

    def _prep(v, pad):
        return jnp.pad(v.astype(jnp.float32), (0, pad))[:, None]

    def top2_fn(p, d, lane_matter):
        bounds = jnp.asarray(bounds_np)
        table = jnp.asarray(table_np)
        N = p.shape[0]
        Np = -(-N // TR) * TR
        pad = Np - N
        rays = [_prep(p[:, 0], pad), _prep(p[:, 1], pad),
                _prep(p[:, 2], pad), _prep(d[:, 0], pad),
                _prep(d[:, 1], pad), _prep(d[:, 2], pad),
                _prep(lane_matter, pad)]
        ray_spec = pl.BlockSpec((TR, 1), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            kernel_top2,
            grid=(Np // TR,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)]
            + [ray_spec] * 7,
            out_specs=[ray_spec] * 4,
            out_shape=[_out_struct((Np, 1), jnp.float32, p)] * 2
            + [_out_struct((Np, 1), jnp.int32, p)] * 2,
            scratch_shapes=[pltpu.VMEM((TR, 1), jnp.float32)] * 2
            + [pltpu.VMEM((TR, 1), jnp.int32)] * 2
            + [pltpu.VMEM((TR, LB), jnp.float32)] * 3
            + [pltpu.SMEM((1,), jnp.float32)],
            interpret=interpret,
        )(bounds, table, *rays)
        t12 = jnp.concatenate([out[0][:N], out[1][:N]], axis=1)
        c12 = jnp.concatenate([out[2][:N], out[3][:N]], axis=1)
        return t12, c12

    def anyhit_fn(p, d, limit):
        bounds = jnp.asarray(bounds_np)
        table = jnp.asarray(table_np)
        N = p.shape[0]
        Np = -(-N // TR) * TR
        pad = Np - N
        rays = [_prep(p[:, 0], pad), _prep(p[:, 1], pad),
                _prep(p[:, 2], pad), _prep(d[:, 0], pad),
                _prep(d[:, 1], pad), _prep(d[:, 2], pad),
                _prep(jnp.where(jnp.isfinite(limit), limit, F32_BIG),
                      pad)]
        ray_spec = pl.BlockSpec((TR, 1), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            kernel_anyhit,
            grid=(Np // TR,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)]
            + [ray_spec] * 7,
            out_specs=ray_spec,
            out_shape=_out_struct((Np, 1), jnp.float32, p),
            scratch_shapes=[pltpu.VMEM((TR, 1), jnp.float32)]
            + [pltpu.VMEM((TR, LB), jnp.float32)] * 3
            + [pltpu.SMEM((1,), jnp.float32)],
            interpret=interpret,
        )(bounds, table, *rays)
        return out[:N, 0] > 0

    return top2_fn, anyhit_fn
