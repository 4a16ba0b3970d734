"""4-wide BVH traversal kernel — fewer, fatter pops for the tile-synchronous walk.

Capability anchor: replaces the same ordered descent as the binary kernels
(``/root/reference/src/bounding_volume_hierarchy.cpp:572-595``); output contract
is identical (oracle: t, slot, u, v / any-hit).

Why (measured round-2 facts, BENCH_NOTES.md): pops are *scalar/reduction*-bound
— 8-row tiles have 5x less vector work yet lose to 64-row tiles, and leaf-56 >
28 > 14 because wider leaves trade pops for dense vector sweeps.  The binary
kernel pays per pop: a redundant self re-slab (children were already tested at
push time), an any() reduce, and two child slab+reduce pairs — all to descend
ONE level.  This kernel restructures the tree so one pop descends TWO levels:

- **BVH4 nodes**: the binary tree is collapsed host-side (each node's 4
  grandchildren become direct children).  One node row carries all four
  children's boxes + pre-encoded stack entries, so a pop is: one row read,
  4 slab tests (pure vector), 4 masked-min reduces, a 4-element scalar
  sorting network, and up to 4 pushes — per TWO binary levels.
- **No popped-node re-slab**: children are tested exactly once, at push time.
  The lost t-bound pruning is recovered cheaply: each push records the child's
  tile-min entry t in a parallel scalar stack, and a pop is skipped when that
  entry t exceeds a scalar upper bound of the tile's current-best t
  (recomputed by one max-reduce after each leaf sweep — leaf sweeps are where
  t improves).
- **Leaves are not re-pushed through node rows**: a leaf child's (row_first,
  n_rows) is packed into its stack entry directly (negative encoding), so a
  leaf pop goes straight to the Möller–Trumbore row sweep.

Triangle rows are the SAME packed layout as the binary kernels
(ops/pallas_bvh.py::pack_bvh_rows) — only the node table changes.

Encodings (float32-exact: all magnitudes < 2^24):
  internal child -> enc = node4 id
  leaf child     -> enc = -(row_first * 64 + n_rows) - 1   (n_rows < 64)
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..scene.types import Scene
from .bvh import _SLAB_EPS, build_bvh
from .intersect import MISS, Hit
from .pallas_bvh import (MAX_STACK, TRIS_PER_ROW, PackedBVH, _default_interpret,
                         _soft_sample_ray, _sphere_merge, pack_bvh_rows)
from .pallas_kernels import (MAX_FUSED_LIGHTS, RAY_COLS, RAY_ROWS, SHADOW_EPS,
                             _gauss3_from_bits, _mt_tile, _pack_rays)

_BIG = 3.4e38
_ENC_LEAF_SHIFT = 64  # n_rows packs into the low 6 bits of the leaf encoding
NODE4_LANES = 28  # 24 box lanes + 4 encoded child entries (7 lanes per child)

# Compare-exchange networks (standard ascending networks; the max-first cswap
# flips every comparator, yielding a DESCENDING sort so the nearest child is
# pushed last / popped first).  8 = Batcher odd-even mergesort, 19 comparators.
_SORT_NET = {
    2: [(0, 1)],
    4: [(0, 1), (2, 3), (0, 2), (1, 3), (1, 2)],
    8: [(0, 1), (2, 3), (4, 5), (6, 7), (0, 2), (1, 3), (4, 6), (5, 7),
        (1, 2), (5, 6), (0, 4), (1, 5), (2, 6), (3, 7), (2, 4), (3, 5),
        (1, 2), (3, 4), (5, 6)],
}


class PackedBVH4(NamedTuple):
    """Kernel-ready wide node table + the binary kernels' triangle rows.

    ``width`` is the node fan-out (4 = two collapsed binary levels per pop,
    8 = three).  The name predates the 8-wide option; layout per row is
    width boxes (6 lanes each) followed by width encoded child entries."""

    nodes4: jax.Array  # [Nw, 7 * width] f32
    tri_rows: jax.Array  # [R, 126] f32 (pack_bvh_rows layout)
    slot_to_prim: jax.Array  # [R * 14] i32
    root_enc: int  # static: stack seed (root node id, or leaf encoding)
    num_nodes: int
    width: int = 4


jax.tree_util.register_pytree_node(
    PackedBVH4,
    lambda p: ((p.nodes4, p.tri_rows, p.slot_to_prim),
               (p.root_enc, p.num_nodes, p.width)),
    lambda aux, ch: PackedBVH4(*ch, root_enc=aux[0], num_nodes=aux[1],
                               width=aux[2] if len(aux) > 2 else 4),
)


def collapse_bvhw(packed: PackedBVH, width: int = 4) -> PackedBVH4:
    """Host-side collapse of the packed binary tree into width-wide nodes
    (width binary levels merged per node: 4 -> 2 levels, 8 -> 3)."""
    assert width in (4, 8)
    levels = {4: 2, 8: 3}[width]
    lanes = 7 * width
    nodes = np.asarray(packed.nodes)
    left = nodes[:, 6].astype(np.int64)
    right = nodes[:, 7].astype(np.int64)
    row_first = nodes[:, 8].astype(np.int64)
    n_rows = nodes[:, 9].astype(np.int64)
    is_leaf = nodes[:, 10] > 0.5
    lo = nodes[:, 0:3]
    hi = nodes[:, 3:6]
    assert int(n_rows.max(initial=0)) < _ENC_LEAF_SHIFT, "leaf too tall to encode"

    def leaf_enc(b):
        e = -(row_first[b] * _ENC_LEAF_SHIFT + n_rows[b]) - 1
        assert -e < (1 << 24), "leaf encoding exceeds float32-exact range"
        return float(e)

    def collect(b, depth):
        """Descend up to ``depth`` binary levels; emit (lo, hi, enc) entries."""
        b = int(b)
        if is_leaf[b]:
            return [(lo[b], hi[b], leaf_enc(b))]
        if depth == 0:
            return [(lo[b], hi[b], ("node", b))]
        return (collect(left[b], depth - 1)
                + collect(right[b], depth - 1))

    rows = []  # each: list of (lo, hi, enc) with ("node", id) placeholders
    idw_of = {}  # binary node id -> wide row index (internal nodes only)

    def emit(b):
        """Create the wide row for internal binary node b; returns its id."""
        if b in idw_of:
            return idw_of[b]
        my = len(rows)
        idw_of[b] = my
        children = (collect(left[b], levels - 1)
                    + collect(right[b], levels - 1))
        assert len(children) <= width
        rows.append(children)
        return my

    # Root handling: a leaf root never touches the node table.
    if is_leaf[0]:
        root_enc = leaf_enc(0)
        nw = 1
        table = np.full((1, lanes), np.nan, np.float32)
        table[:, 6 * width:] = 0.0
    else:
        # Iterative BFS emit (recursion depth could hit Python limits).
        emit(0)
        i = 0
        while i < len(rows):
            for c in rows[i]:
                if isinstance(c[2], tuple):
                    emit(c[2][1])
            i += 1
        nw = len(rows)
        assert nw < (1 << 24)
        # Stack-occupancy bound (ADVICE r4): each internal pop removes one
        # entry and pushes up to ``width``, so a root-to-leaf descent holds at
        # most (width-1) * depth + 1 live entries.  The kernels share a
        # MAX_STACK-sized SMEM scratch sized for the narrower fan-outs; a
        # deep unbalanced tree collapsed at width 8 could overflow it and
        # silently corrupt traversal — refuse at build time instead.
        depth_w = np.zeros(nw, np.int64)
        for my, children in enumerate(rows):
            for c in children:
                if isinstance(c[2], tuple):
                    depth_w[idw_of[c[2][1]]] = depth_w[my] + 1
        need = (width - 1) * (int(depth_w.max(initial=0)) + 1) + 1
        if need > MAX_STACK:
            raise ValueError(
                f"collapsed width-{width} tree depth "
                f"{int(depth_w.max(initial=0)) + 1} needs a {need}-entry "
                f"traversal stack > MAX_STACK={MAX_STACK}; rebuild with a "
                f"narrower width (bvh_wide='4') or wider leaves")
        table = np.zeros((nw, lanes), np.float32)
        # Empty child slots carry NaN boxes: every slab comparison is false, so
        # they can never be visited.  (An "inverted" lo > hi box does NOT work:
        # the slab test's per-axis min/max un-inverts it into an
        # everything-box — measured as an infinite traversal loop.)
        for c in range(width):
            table[:, 6 * c:6 * c + 6] = np.nan
        for my, children in enumerate(rows):
            for c, (clo, chi, enc) in enumerate(children):
                table[my, 6 * c:6 * c + 3] = clo
                table[my, 6 * c + 3:6 * c + 6] = chi
                if isinstance(enc, tuple):
                    enc = float(idw_of[enc[1]])
                table[my, 6 * width + c] = enc
        root_enc = 0.0

    return PackedBVH4(
        nodes4=jnp.asarray(table),
        tri_rows=packed.tri_rows,
        slot_to_prim=packed.slot_to_prim,
        root_enc=float(root_enc),
        num_nodes=nw,
        width=width,
    )


def collapse_bvh4(packed: PackedBVH) -> PackedBVH4:
    return collapse_bvhw(packed, width=4)


def build_packed_bvh4(scene: Scene, max_leaf: int, builder: str = "median",
                      width: int = 4):
    """Host build: binary BVH -> packed rows -> width-wide collapse."""
    bvh = build_bvh(scene, max_leaf=max_leaf, builder=builder)
    return bvh, collapse_bvhw(pack_bvh_rows(bvh), width=width)


def _slab4(ox, oy, oz, ix, iy, iz, row, c):
    """Slab test of child c's box (static lanes 6c..6c+6) against the tile."""
    b = 6 * c
    t0x = (row[b + 0] - ox) * ix
    t1x = (row[b + 3] - ox) * ix
    t0y = (row[b + 1] - oy) * iy
    t1y = (row[b + 4] - oy) * iy
    t0z = (row[b + 2] - oz) * iz
    t1z = (row[b + 5] - oz) * iz
    tin = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                      jnp.minimum(t0z, t1z))
    tout = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                       jnp.maximum(t0z, t1z))
    pad = _SLAB_EPS * (1.0 + jnp.abs(tout))
    hit = (tin <= tout + pad) & (tout >= -pad)
    return tin, hit


def _internal_pushes(stack_ref, tstack_ref, nodes4_ref, enc, sp, t_best,
                     rayvars, width: int, vred_ref=None, sort: bool = True):
    """Shared internal-node pop: ``width`` slab tests + masked-min reduces, a
    compare-exchange network on (tin, enc) pairs (DESCENDING tin, so the
    nearest child is pushed last / popped first), then guarded pushes.
    Returns the updated stack pointer.

    ``vred_ref`` (round-5 'batched' pop variant, VERDICT r4 item 1): a
    [8, 128] VMEM scratch routing all ``width`` cross-lane reductions through
    ONE vector->memory crossing — each child's masked tin reduces to a
    [1, 128] sublane partial (pure vector work), the stacked partials take a
    single lane-reduce + one store, and the scalar unit reads the ``width``
    results back with plain loads, instead of issuing ``width`` serialized
    full-tile reduce->scalar crossings (~0.104 us each, r4_results.jsonl
    loopcost3).  ``sort=False`` additionally drops the compare-exchange
    network (children push in static reverse order; the stale-entry t-bound
    check at pop time absorbs mis-ordering at the cost of extra pops)."""
    ox, oy, oz, dx, dy, dz, ix, iy, iz, t0 = rayvars
    row = nodes4_ref[enc.astype(jnp.int32)]
    tpad = _SLAB_EPS * (1.0 + jnp.abs(t_best))
    bound = t_best + tpad
    ts = []
    if vred_ref is not None:
        parts = []
        for ci in range(width):
            tin, hit = _slab4(ox, oy, oz, ix, iy, iz, row, ci)
            hit = hit & (tin <= bound)
            masked = jnp.where(hit, tin, _BIG)
            parts.append(jnp.min(masked, axis=0, keepdims=True))  # [1, 128]
        while len(parts) < 8:
            parts.append(jnp.full((1, RAY_COLS), _BIG, jnp.float32))
        buf = jnp.concatenate(parts, axis=0)  # [8, 128]
        red = jnp.min(buf, axis=1, keepdims=True)  # [8, 1] lane reduce
        vred_ref[...] = jnp.broadcast_to(red, (8, RAY_COLS))
        ts = [vred_ref[ci, 0] for ci in range(width)]
    else:
        for ci in range(width):
            tin, hit = _slab4(ox, oy, oz, ix, iy, iz, row, ci)
            hit = hit & (tin <= bound)
            ts.append(jnp.min(jnp.where(hit, tin, _BIG)))
    es = [row[6 * width + c] for c in range(width)]

    if sort:
        def cswap(ta, ea, tb, eb):
            sw = ta < tb
            return (jnp.where(sw, tb, ta), jnp.where(sw, eb, ea),
                    jnp.where(sw, ta, tb), jnp.where(sw, ea, eb))

        for a, b in _SORT_NET[width]:
            ts[a], es[a], ts[b], es[b] = cswap(ts[a], es[a], ts[b], es[b])
    else:
        ts = ts[::-1]
        es = es[::-1]

    for tv, ev in zip(ts, es):
        stack_ref[sp] = ev
        tstack_ref[sp] = tv
        sp = sp + jnp.where(tv < _BIG, 1, 0)
    return sp


def _pop_step4(stack_ref, tstack_ref, nodes4_ref, tris_ref, rv, state,
               any_hit: bool, width: int = 4, vred_ref=None,
               sort: bool = True):
    """One guarded pop of one tile's wide traversal.

    ``rv`` = (ox, oy, oz, dx, dy, dz, ix, iy, iz, t0) ray-tile vectors;
    ``state`` = (sp, t_best, slot, u, v, done, t_ub).  Shared by the
    single-stack loop and the interleaved dual-stack loop: an exhausted or
    finished stack takes the scalar-only skip branch with ``sp`` unchanged,
    so interleaving imbalanced tiles costs only dead scalar pops."""
    ox, oy, oz, dx, dy, dz, ix, iy, iz, t0 = rv
    sp, t_best, slot, u, v, done, t_ub = state
    live = (sp > 0) & jnp.logical_not(done)
    spm = jnp.maximum(sp - 1, 0)
    enc = stack_ref[spm]
    tin_pushed = tstack_ref[spm]
    sp = jnp.where(live, spm, sp)

    # 0 = no-op (stack empty / tile done / stale entry: pushed entry t already
    # beyond the tile's best), 1 = internal node, 2 = leaf sweep.
    kind = jnp.where(jnp.logical_not(live) | (tin_pushed > t_ub), 0,
                     jnp.where(enc >= 0, 1, 2))

    def skip_fn(args):
        return args

    def internal_fn(args):
        sp, t_best, slot, u, v, done, t_ub = args
        sp = _internal_pushes(stack_ref, tstack_ref, nodes4_ref, enc, sp,
                              t_best, rv, width, vred_ref=vred_ref,
                              sort=sort)
        return sp, t_best, slot, u, v, done, t_ub

    def leaf_fn(args):
        sp, t_best, slot, u, v, done, t_ub = args
        code = (-enc - 1.0).astype(jnp.int32)
        row_first = code // _ENC_LEAF_SHIFT
        n_rows = code - row_first * _ENC_LEAF_SHIFT

        def row_body(r, lc):
            t_b, sl, uu, vv = lc
            trow = tris_ref[row_first + r]
            for k in range(TRIS_PER_ROW):
                tri = [trow[9 * k + j] for j in range(9)]
                t, u_, v_, ok = _mt_tile(ox, oy, oz, dx, dy, dz, tri)
                closer = ok & (t < t_b)
                slot_k = (row_first + r) * TRIS_PER_ROW + k
                t_b = jnp.where(closer, t, t_b)
                sl = jnp.where(closer, slot_k, sl)
                uu = jnp.where(closer, u_, uu)
                vv = jnp.where(closer, v_, vv)
            return t_b, sl, uu, vv

        t_best, slot, u, v = jax.lax.fori_loop(
            0, n_rows, row_body, (t_best, slot, u, v))
        if any_hit:
            done = jnp.all((slot >= 0) | (t0 < 0.0))
        # Refresh the scalar prune bound (t only improves in leaf sweeps).
        pad_ub = _SLAB_EPS * (1.0 + jnp.abs(t_best))
        t_ub = jnp.max(t_best + pad_ub)
        return sp, t_best, slot, u, v, done, t_ub

    return jax.lax.switch(kind, [skip_fn, internal_fn, leaf_fn],
                          (sp, t_best, slot, u, v, done, t_ub))


def _rayvars(ox, oy, oz, dx, dy, dz, t0):
    return (ox, oy, oz, dx, dy, dz, 1.0 / dx, 1.0 / dy, 1.0 / dz, t0)


def _init_state4(t0):
    return (
        jnp.int32(1),
        t0,
        jnp.full(t0.shape, -1, jnp.int32),
        jnp.zeros(t0.shape, jnp.float32),
        jnp.zeros(t0.shape, jnp.float32),
        jnp.bool_(False),
        jnp.float32(_BIG),
    )


def _traverse4_vmem(stack_ref, tstack_ref, nodes4_ref, tris_ref,
                    ox, oy, oz, dx, dy, dz, t0, root_enc: float,
                    any_hit: bool, width: int = 4, vred_ref=None,
                    sort: bool = True):
    """Tile-synchronous 4-wide traversal (see module docstring).  Same return
    contract as pallas_bvh._traverse_vmem: (t_best, slot, u, v)."""
    rv = _rayvars(ox, oy, oz, dx, dy, dz, t0)

    stack_ref[0] = jnp.float32(root_enc)
    tstack_ref[0] = jnp.float32(-_BIG)

    def cond(c):
        sp, t_best, slot, u, v, done, t_ub = c
        return (sp > 0) & jnp.logical_not(done)

    def body(c):
        return _pop_step4(stack_ref, tstack_ref, nodes4_ref, tris_ref, rv, c,
                          any_hit, width, vred_ref=vred_ref, sort=sort)

    out = jax.lax.while_loop(cond, body, _init_state4(t0))
    return out[1], out[2], out[3], out[4]


def _traverse4_vmem_xn(stacks, nodes4_ref, tris_ref, rvs_list,
                       root_enc: float, any_hit: bool, width: int = 4,
                       pop: str = "base"):
    """Interleaved multi-stack traversal: N INDEPENDENT sub-tiles walk the
    tree in one fused while-loop, one pop each per iteration.

    Why: pops are scalar/reduction-bound (BENCH_NOTES round-2 facts — 8-row
    tiles have 5x less vector work yet lose), and each pop's chain
    (scalar read -> vector slab -> cross-lane min -> scalar sort -> push)
    serializes the scalar and vector units.  Independent chains let the
    compiler overlap one tile's scalar pop/sort with another's vector
    slab/MT work — and make SMALLER tiles (less tile-union divergence)
    affordable, since their extra pops ride in the hidden scalar slots.
    Returns a list of (t, slot, u, v) per sub-tile."""
    nway = len(rvs_list)
    batched = "batched" in pop
    sort = "nosort" not in pop
    vreds = stacks[2 * nway:] if batched else [None] * nway
    for k in range(nway):
        stacks[2 * k][0] = jnp.float32(root_enc)
        stacks[2 * k + 1][0] = jnp.float32(-_BIG)

    def cond(states):
        live = None
        for s in states:
            l = (s[0] > 0) & jnp.logical_not(s[5])
            live = l if live is None else (live | l)
        return live

    def body(states):
        return tuple(
            _pop_step4(stacks[2 * k], stacks[2 * k + 1], nodes4_ref,
                       tris_ref, rvs_list[k], states[k], any_hit, width,
                       vred_ref=vreds[k], sort=sort)
            for k in range(nway)
        )

    out = jax.lax.while_loop(
        cond, body, tuple(_init_state4(rv[-1]) for rv in rvs_list))
    return [(s[1], s[2], s[3], s[4]) for s in out]


def _bvh4_kernel(ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                 tmax_ref, nodes4_ref, tris_ref, t_ref, slot_ref,
                 u_ref, v_ref, *scratch, root_enc: float, any_hit: bool,
                 width: int = 4, pop: str = "base"):
    stack_ref, tstack_ref = scratch[0], scratch[1]
    vred_ref = scratch[2] if "batched" in pop else None
    t_best, slot, u, v = _traverse4_vmem(
        stack_ref, tstack_ref, nodes4_ref, tris_ref,
        ox_ref[0], oy_ref[0], oz_ref[0], dx_ref[0], dy_ref[0], dz_ref[0],
        tmax_ref[0], root_enc, any_hit=any_hit, width=width,
        vred_ref=vred_ref, sort="nosort" not in pop,
    )
    t_ref[0] = t_best
    slot_ref[0] = slot
    u_ref[0] = u
    v_ref[0] = v


def _split_rows(a, nway):
    h = a.shape[0] // nway
    return [a[k * h:(k + 1) * h] for k in range(nway)]


def _bvh4_kernel_xn(ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                    tmax_ref, nodes4_ref, tris_ref, t_ref, slot_ref,
                    u_ref, v_ref, *stacks, root_enc: float, any_hit: bool,
                    width: int = 4, pop: str = "base"):
    """Interleaved variant: the tile's row bands traverse as N independent
    stacks in one fused loop (see _traverse4_vmem_xn)."""
    nway = len(stacks) // (3 if "batched" in pop else 2)
    parts = [_split_rows(r[0], nway)
             for r in (ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                       tmax_ref)]
    rvs = [_rayvars(*(p[k] for p in parts)) for k in range(nway)]
    outs = _traverse4_vmem_xn(stacks, nodes4_ref, tris_ref, rvs,
                              root_enc, any_hit, width, pop=pop)
    t_ref[0] = jnp.concatenate([o[0] for o in outs], axis=0)
    slot_ref[0] = jnp.concatenate([o[1] for o in outs], axis=0)
    u_ref[0] = jnp.concatenate([o[2] for o in outs], axis=0)
    v_ref[0] = jnp.concatenate([o[3] for o in outs], axis=0)


def _bvh4_bounce_kernel_xn(ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                           tmax_ref, nodes4_ref, tris_ref, lights_ref,
                           t_ref, slot_ref, u_ref, v_ref, shadow_ref,
                           *stacks, root_enc: float, num_lights: int,
                           width: int = 4, pop: str = "base"):
    """Interleaved fused bounce: closest-hit then per-light shadow any-hit,
    each as an N-stack interleaved walk over the tile's row bands."""
    nway = len(stacks) // (3 if "batched" in pop else 2)
    parts = [_split_rows(r[0], nway)
             for r in (ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                       tmax_ref)]
    rvs = [_rayvars(*(p[k] for p in parts)) for k in range(nway)]
    closest = _traverse4_vmem_xn(stacks, nodes4_ref, tris_ref, rvs,
                                 root_enc, any_hit=False, width=width,
                                 pop=pop)

    hits = [sl >= 0 for (_, sl, _, _) in closest]
    pos = []
    for k, (t, sl, _, _) in enumerate(closest):
        th = jnp.where(hits[k], t, 0.0)
        ox_k, oy_k, oz_k = parts[0][k], parts[1][k], parts[2][k]
        dx_k, dy_k, dz_k = parts[3][k], parts[4][k], parts[5][k]
        pos.append((ox_k + dx_k * th, oy_k + dy_k * th, oz_k + dz_k * th))

    bits = [jnp.zeros(p[0].shape, jnp.int32) for p in pos]
    for li in range(num_lights):
        lrow = lights_ref[li]

        def shadow_rv(px, py, pz, hit):
            tx, ty, tz = lrow[0] - px, lrow[1] - py, lrow[2] - pz
            dist = jnp.sqrt(tx * tx + ty * ty + tz * tz)
            inv = 1.0 / jnp.maximum(dist, 1e-20)
            sdx, sdy, sdz = tx * inv, ty * inv, tz * inv
            sox = px + SHADOW_EPS * sdx
            soy = py + SHADOW_EPS * sdy
            soz = pz + SHADOW_EPS * sdz
            tmax_l = jnp.where(hit, dist - SHADOW_EPS, -1.0)
            return _rayvars(sox, soy, soz, sdx, sdy, sdz, tmax_l)

        shadow = _traverse4_vmem_xn(
            stacks, nodes4_ref, tris_ref,
            [shadow_rv(*pos[k], hits[k]) for k in range(nway)],
            root_enc, any_hit=True, width=width, pop=pop)
        for k in range(nway):
            bits[k] = bits[k] | ((shadow[k][1] >= 0).astype(jnp.int32) << li)

    t_ref[0] = jnp.concatenate([o[0] for o in closest], axis=0)
    slot_ref[0] = jnp.concatenate([o[1] for o in closest], axis=0)
    u_ref[0] = jnp.concatenate([o[2] for o in closest], axis=0)
    v_ref[0] = jnp.concatenate([o[3] for o in closest], axis=0)
    shadow_ref[0] = jnp.concatenate(bits, axis=0)


def _bvh4_bounce_kernel(ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                        tmax_ref, nodes4_ref, tris_ref, lights_ref,
                        t_ref, slot_ref, u_ref, v_ref, shadow_ref,
                        *scratch, root_enc: float, num_lights: int,
                        width: int = 4, pop: str = "base"):
    """Fused bounce (closest + per-point-light shadow any-hit) over the 4-wide
    tree; same contract as pallas_bvh._bvh_bounce_kernel."""
    stack_ref, tstack_ref = scratch[0], scratch[1]
    vred_ref = scratch[2] if "batched" in pop else None
    sort = "nosort" not in pop
    ox, oy, oz = ox_ref[0], oy_ref[0], oz_ref[0]
    dx, dy, dz = dx_ref[0], dy_ref[0], dz_ref[0]

    t_best, slot, u, v = _traverse4_vmem(
        stack_ref, tstack_ref, nodes4_ref, tris_ref, ox, oy, oz, dx, dy, dz,
        tmax_ref[0], root_enc, any_hit=False, width=width,
        vred_ref=vred_ref, sort=sort,
    )

    hit = slot >= 0
    t_hit = jnp.where(hit, t_best, 0.0)
    px = ox + dx * t_hit
    py = oy + dy * t_hit
    pz = oz + dz * t_hit

    shadow_bits = jnp.zeros(ox.shape, jnp.int32)
    for li in range(num_lights):
        lrow = lights_ref[li]
        tx = lrow[0] - px
        ty = lrow[1] - py
        tz = lrow[2] - pz
        dist = jnp.sqrt(tx * tx + ty * ty + tz * tz)
        inv = 1.0 / jnp.maximum(dist, 1e-20)
        sdx, sdy, sdz = tx * inv, ty * inv, tz * inv
        sox = px + SHADOW_EPS * sdx
        soy = py + SHADOW_EPS * sdy
        soz = pz + SHADOW_EPS * sdz
        tmax_l = jnp.where(hit, dist - SHADOW_EPS, -1.0)
        _, slot_s, _, _ = _traverse4_vmem(
            stack_ref, tstack_ref, nodes4_ref, tris_ref,
            sox, soy, soz, sdx, sdy, sdz, tmax_l, root_enc, any_hit=True,
            width=width, vred_ref=vred_ref, sort=sort,
        )
        shadow_bits = shadow_bits | ((slot_s >= 0).astype(jnp.int32) << li)

    t_ref[0] = t_best
    slot_ref[0] = slot
    u_ref[0] = u
    v_ref[0] = v
    shadow_ref[0] = shadow_bits


def _stack_scratch(interleave: int, pop: str = "base"):
    scratch = [pltpu.SMEM((MAX_STACK,), jnp.float32)
               for _ in range(2 * interleave)]
    if "batched" in pop:
        # One [8, 128] VMEM reduction buffer per band (see _internal_pushes).
        scratch += [pltpu.VMEM((8, RAY_COLS), jnp.float32)
                    for _ in range(interleave)]
    return scratch


@functools.partial(jax.jit,
                   static_argnames=("root_enc", "any_hit", "interpret",
                                    "interleave", "width", "pop"))
def _bvh4_call(rays6, tmax_tiles, nodes4, tri_rows, root_enc,
               any_hit=False, interpret=False, interleave=1, width=4,
               pop="base"):
    g, rows = rays6[0].shape[0], rays6[0].shape[1]
    base = _bvh4_kernel if interleave == 1 else _bvh4_kernel_xn
    kernel = functools.partial(base, root_enc=root_enc, any_hit=any_hit,
                               width=width, pop=pop)
    ray_spec = lambda: pl.BlockSpec((1, rows, RAY_COLS), lambda i: (i, 0, 0),
                                    memory_space=pltpu.VMEM)
    out_shape = [
        jax.ShapeDtypeStruct((g, rows, RAY_COLS), jnp.float32),
        jax.ShapeDtypeStruct((g, rows, RAY_COLS), jnp.int32),
        jax.ShapeDtypeStruct((g, rows, RAY_COLS), jnp.float32),
        jax.ShapeDtypeStruct((g, rows, RAY_COLS), jnp.float32),
    ]
    return pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=[ray_spec() for _ in range(7)] + [
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[ray_spec() for _ in range(4)],
        out_shape=out_shape,
        scratch_shapes=_stack_scratch(interleave, pop),
        interpret=interpret,
    )(*rays6, tmax_tiles, nodes4, tri_rows)


def _run4(packed: PackedBVH4, origins, dirs, t_max, any_hit, interpret,
          tile_rows: int = RAY_ROWS, interleave: int = 1, pop: str = "base"):
    origins = jax.lax.stop_gradient(origins)
    dirs = jax.lax.stop_gradient(dirs)
    rays, n, g = _pack_rays(origins, dirs, rows=tile_rows)
    if t_max is None:
        tm = jnp.full((n,), jnp.inf, jnp.float32)
    else:
        tm = jnp.broadcast_to(jax.lax.stop_gradient(t_max), (n,)).astype(jnp.float32)
    tm_tiles = jnp.pad(tm, (0, g * tile_rows * RAY_COLS - n), constant_values=-1.0)
    tm_tiles = tm_tiles.reshape(g, tile_rows, RAY_COLS)
    t, slot, u, v = _bvh4_call(rays, tm_tiles, packed.nodes4, packed.tri_rows,
                               packed.root_enc, any_hit=any_hit,
                               interpret=interpret, interleave=interleave,
                               width=packed.width, pop=pop)
    flat = lambda a: a.reshape(-1)[:n]
    return flat(t), flat(slot), flat(u), flat(v), n


def intersect_pallas_bvh4(scene: Scene, packed: PackedBVH4, origins, dirs,
                          t_max=None, interpret: bool | None = None,
                          tile_rows: int = RAY_ROWS, interleave: int = 1,
                          pop: str = "base") -> Hit:
    """Closest-hit through the 4-wide kernel (+ jnp sphere tail)."""
    if interpret is None:
        interpret = _default_interpret()
    t, slot, u, v, n = _run4(packed, origins, dirs, t_max, False, interpret,
                             tile_rows=tile_rows, interleave=interleave,
                             pop=pop)
    prim = jnp.where(slot >= 0, packed.slot_to_prim[jnp.maximum(slot, 0)], MISS)
    best = Hit(t=jnp.where(slot >= 0, t, jnp.inf), prim_id=prim, u=u, v=v)
    return _sphere_merge(scene, origins, dirs, best)


def occluded_pallas_bvh4(scene: Scene, packed: PackedBVH4, origins, dirs, t_max,
                         interpret: bool | None = None,
                         tile_rows: int = RAY_ROWS, interleave: int = 1,
                         pop: str = "base"):
    """Any-hit through the 4-wide kernel."""
    if interpret is None:
        interpret = _default_interpret()
    from .intersect import intersect_spheres_one

    t, slot, _, _, n = _run4(packed, origins, dirs, t_max, True, interpret,
                             tile_rows=tile_rows, interleave=interleave,
                             pop=pop)
    blocked = slot >= 0
    num_spheres = scene.spheres.radius.shape[0]
    if num_spheres > 0:
        tm = jnp.broadcast_to(t_max, (origins.shape[0],)).astype(jnp.float32)
        t_s, valid_s = jax.vmap(
            lambda c, r: intersect_spheres_one(origins, dirs, c, r),
            in_axes=(0, 0), out_axes=(0, 0),
        )(scene.spheres.center, scene.spheres.radius)
        blocked = blocked | jnp.any(valid_s & (t_s < tm[None, :]), axis=0)
    return blocked


@functools.partial(jax.jit, static_argnames=("root_enc", "interpret",
                                             "interleave", "width",
                                             "num_lights", "pop"))
def _bvh4_bounce_call(rays6, tmax_tiles, nodes4, tri_rows, lights, root_enc,
                      interpret=False, interleave=1, width=4,
                      num_lights=None, pop="base"):
    g, rows = rays6[0].shape[0], rays6[0].shape[1]
    if num_lights is None:
        num_lights = lights.shape[0]
    base = (_bvh4_bounce_kernel if interleave == 1
            else _bvh4_bounce_kernel_xn)
    kernel = functools.partial(base, root_enc=root_enc,
                               num_lights=num_lights, width=width, pop=pop)
    ray_spec = lambda: pl.BlockSpec((1, rows, RAY_COLS), lambda i: (i, 0, 0),
                                    memory_space=pltpu.VMEM)
    out_shape = [
        jax.ShapeDtypeStruct((g, rows, RAY_COLS), jnp.float32),
        jax.ShapeDtypeStruct((g, rows, RAY_COLS), jnp.int32),
        jax.ShapeDtypeStruct((g, rows, RAY_COLS), jnp.float32),
        jax.ShapeDtypeStruct((g, rows, RAY_COLS), jnp.float32),
        jax.ShapeDtypeStruct((g, rows, RAY_COLS), jnp.int32),
    ]
    return pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=[ray_spec() for _ in range(7)] + [
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[ray_spec() for _ in range(5)],
        out_shape=out_shape,
        scratch_shapes=_stack_scratch(interleave, pop),
        interpret=interpret,
    )(*rays6, tmax_tiles, nodes4, tri_rows, lights)


# ---------------------------------------------------------------------------
# Cone-coherent soft-shadow sampler over the 4-wide tree: same layout and
# contract as pallas_bvh's cone sampler (lanes = pixels, rows = samples, one
# any-hit traversal per tile) but with the 4-wide pop (half the scalar-bound
# pops).  Lets spherical-light scenes keep the BVH4 backend for primary rays
# too, instead of falling back to the binary table (make_backend).
# ---------------------------------------------------------------------------


def _soft4_cone_prng_kernel(seed_ref, px_ref, py_ref, pz_ref, vmask_ref,
                            nodes4_ref, tris_ref, light_ref, cnt_ref,
                            *scratch, num_samples, rows, root_enc, width=4,
                            pop="base", interleave=1):
    """interleave > 1 splits each pass's sample rows into independent bands
    traversing in ONE fused loop (_traverse4_vmem_xn) — the same
    pop-latency-hiding structure as the primary kernels' row bands; every
    band shares the 128 pixels but owns its sample batch and stack."""
    il = interleave
    pltpu.prng_seed(seed_ref[0],
                    seed_ref[1] ^ (pl.program_id(0) * jnp.int32(-1640531527)))
    shape = (rows, RAY_COLS)
    band = rows // il
    bshape = (band, RAY_COLS)
    bro = lambda ref: jnp.broadcast_to(ref[0][0:1, :], bshape)
    px, py, pz = bro(px_ref), bro(py_ref), bro(pz_ref)
    vm = jnp.broadcast_to(vmask_ref[0][0:1, :], bshape)
    lrow = light_ref[0]
    lx, ly, lz, lr = lrow[0], lrow[1], lrow[2], lrow[3]

    row_id = jax.lax.broadcasted_iota(jnp.int32, bshape, 0)
    passes = -(-num_samples // rows)
    cnt = jnp.zeros(bshape, jnp.int32)
    for p in range(passes):
        rvs, masks = [], []
        for k in range(il):
            off = p * rows + k * band
            smask = ((row_id + off < num_samples) & (vm > 0)).astype(jnp.int32)
            b0 = pltpu.prng_random_bits(bshape)
            b1 = pltpu.prng_random_bits(bshape)
            b2 = pltpu.prng_random_bits(bshape)
            b3 = pltpu.prng_random_bits(bshape)
            gx, gy, gz = _gauss3_from_bits(b0, b1, b2, b3)
            sox, soy, soz, sdx, sdy, sdz, tmax = _soft_sample_ray(
                px, py, pz, gx, gy, gz, lx, ly, lz, lr, smask)
            rvs.append(_rayvars(sox, soy, soz, sdx, sdy, sdz, tmax))
            masks.append(smask)
        outs = _traverse4_vmem_xn(list(scratch), nodes4_ref, tris_ref, rvs,
                                  root_enc, any_hit=True, width=width,
                                  pop=pop)
        for k in range(il):
            cnt = cnt + jnp.where((outs[k][1] < 0) & (masks[k] > 0), 1, 0)
    total = jnp.sum(cnt, axis=0, keepdims=True)  # (1, 128) per-pixel counts
    cnt_ref[0] = jnp.broadcast_to(total, (8, RAY_COLS))


def _soft4_cone_table_kernel(gauss_ref, px_ref, py_ref, pz_ref, vmask_ref,
                             nodes4_ref, tris_ref, light_ref, cnt_ref,
                             *scratch, num_samples, rows, root_enc, width=4,
                             pop="base", interleave=1):
    """Table variant (CPU interpret tests): precomputed Gaussians.  Unlike
    the PRNG variant, interleave here only REGROUPS the same samples into
    bands, so counts are identical across interleave settings (tested)."""
    if interleave > 1:
        il = interleave
        band = rows // il
        bshape = (band, RAY_COLS)
        bro = lambda ref: jnp.broadcast_to(ref[0][0:1, :], bshape)
        px, py, pz = bro(px_ref), bro(py_ref), bro(pz_ref)
        vm = jnp.broadcast_to(vmask_ref[0][0:1, :], bshape)
        lrow = light_ref[0]
        lx, ly, lz, lr = lrow[0], lrow[1], lrow[2], lrow[3]
        row_id = jax.lax.broadcasted_iota(jnp.int32, bshape, 0)
        passes = -(-num_samples // rows)
        cnt = jnp.zeros(bshape, jnp.int32)
        for p in range(passes):
            rvs, masks = [], []
            for k in range(il):
                off = p * rows + k * band
                smask = ((row_id + off < num_samples)
                         & (vm > 0)).astype(jnp.int32)
                sl = slice(k * band, (k + 1) * band)
                gx = gauss_ref[0, p, 0][sl]
                gy = gauss_ref[0, p, 1][sl]
                gz = gauss_ref[0, p, 2][sl]
                sox, soy, soz, sdx, sdy, sdz, tmax = _soft_sample_ray(
                    px, py, pz, gx, gy, gz, lx, ly, lz, lr, smask)
                rvs.append(_rayvars(sox, soy, soz, sdx, sdy, sdz, tmax))
                masks.append(smask)
            outs = _traverse4_vmem_xn(list(scratch), nodes4_ref, tris_ref,
                                      rvs, root_enc, any_hit=True,
                                      width=width, pop=pop)
            for k in range(il):
                cnt = cnt + jnp.where((outs[k][1] < 0) & (masks[k] > 0), 1, 0)
        total = jnp.sum(cnt, axis=0, keepdims=True)
        cnt_ref[0] = jnp.broadcast_to(total, (8, RAY_COLS))
        return
    stack_ref, tstack_ref = scratch[0], scratch[1]
    vred_ref = scratch[2] if "batched" in pop else None
    shape = (rows, RAY_COLS)
    bro = lambda ref: jnp.broadcast_to(ref[0][0:1, :], shape)
    px, py, pz = bro(px_ref), bro(py_ref), bro(pz_ref)
    vm = jnp.broadcast_to(vmask_ref[0][0:1, :], shape)
    lrow = light_ref[0]
    lx, ly, lz, lr = lrow[0], lrow[1], lrow[2], lrow[3]

    row_id = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    passes = -(-num_samples // rows)
    cnt = jnp.zeros(shape, jnp.int32)
    for p in range(passes):
        smask = ((row_id + p * rows < num_samples) & (vm > 0)).astype(jnp.int32)
        gx = gauss_ref[0, p, 0]
        gy = gauss_ref[0, p, 1]
        gz = gauss_ref[0, p, 2]
        sox, soy, soz, sdx, sdy, sdz, tmax = _soft_sample_ray(
            px, py, pz, gx, gy, gz, lx, ly, lz, lr, smask)
        _, slot, _, _ = _traverse4_vmem(
            stack_ref, tstack_ref, nodes4_ref, tris_ref,
            sox, soy, soz, sdx, sdy, sdz, tmax, root_enc, any_hit=True,
            width=width, vred_ref=vred_ref, sort="nosort" not in pop)
        cnt = cnt + jnp.where((slot < 0) & (smask > 0), 1, 0)
    total = jnp.sum(cnt, axis=0, keepdims=True)
    cnt_ref[0] = jnp.broadcast_to(total, (8, RAY_COLS))


def _pix_spec4():
    return pl.BlockSpec((1, 8, RAY_COLS), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)


@functools.partial(jax.jit, static_argnames=("num_samples", "rows",
                                             "root_enc", "interpret",
                                             "width", "pop", "interleave"))
def _soft4_cone_prng_call(pix4, light_row, seeds, nodes4, tri_rows,
                          num_samples, rows, root_enc, interpret=False,
                          width=4, pop="base", interleave=1):
    g = pix4[0].shape[0]
    kernel = functools.partial(_soft4_cone_prng_kernel,
                               num_samples=num_samples, rows=rows,
                               root_enc=root_enc, width=width, pop=pop,
                               interleave=interleave)
    return pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] +
                 [_pix_spec4() for _ in range(4)] + [
            pl.BlockSpec(memory_space=pltpu.VMEM),  # nodes4
            pl.BlockSpec(memory_space=pltpu.VMEM),  # tri rows
            pl.BlockSpec(memory_space=pltpu.VMEM),  # light row [1, 4]
        ],
        out_specs=_pix_spec4(),
        out_shape=jax.ShapeDtypeStruct((g, 8, RAY_COLS), jnp.int32),
        scratch_shapes=_stack_scratch(interleave, pop),
        interpret=interpret,
    )(seeds, *pix4, nodes4, tri_rows, light_row)


@functools.partial(jax.jit, static_argnames=("num_samples", "rows",
                                             "root_enc", "interpret",
                                             "width", "pop", "interleave"))
def _soft4_cone_table_call(pix4, light_row, gauss, nodes4, tri_rows,
                           num_samples, rows, root_enc, interpret=True,
                           width=4, pop="base", interleave=1):
    g = pix4[0].shape[0]
    passes = gauss.shape[1]
    kernel = functools.partial(_soft4_cone_table_kernel,
                               num_samples=num_samples, rows=rows,
                               root_enc=root_enc, width=width, pop=pop,
                               interleave=interleave)
    return pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=[pl.BlockSpec((1, passes, 3, rows, RAY_COLS),
                               lambda i: (i, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM)] +
                 [_pix_spec4() for _ in range(4)] + [
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=_pix_spec4(),
        out_shape=jax.ShapeDtypeStruct((g, 8, RAY_COLS), jnp.int32),
        scratch_shapes=_stack_scratch(interleave, pop),
        interpret=interpret,
    )(gauss, *pix4, nodes4, tri_rows, light_row)


def soft_shadow_counts_pallas_bvh4_cone(scene: Scene, packed: PackedBVH4,
                                        positions, light_pos, light_radius,
                                        key, num_samples: int,
                                        interpret: bool | None = None,
                                        gauss=None,
                                        sample_rows: int | None = None,
                                        pop: str = "base",
                                        interleave: int = 1):
    """Cone-coherent visible-sample counts over the 4-wide tree; same [N]
    float32 contract as pallas_bvh.soft_shadow_counts_pallas_bvh_cone."""
    from .pallas_bvh import (_cone_light_row, _cone_pack_gauss,
                             _cone_pack_pixels)
    from .pallas_kernels import _key_seeds

    if interpret is None:
        interpret = _default_interpret()
    if sample_rows is None:
        # Bands must stay 8-sublane aligned; round the sample rows up to a
        # multiple of 8 * interleave (masked tail rows draw but don't count).
        sample_rows = -(-num_samples // (8 * interleave)) * 8 * interleave
    positions = jax.lax.stop_gradient(positions)
    pix4, n, g, pad = _cone_pack_pixels(positions)
    light_row = _cone_light_row(light_pos, light_radius)

    if gauss is None:
        if interpret:
            raise NotImplementedError(
                "soft-shadow PRNG kernel has no CPU interpretation; pass "
                "gauss= for the table variant or run on TPU")
        cnt = _soft4_cone_prng_call(pix4, light_row, _key_seeds(key),
                                    packed.nodes4, packed.tri_rows,
                                    num_samples, sample_rows,
                                    packed.root_enc, interpret=False,
                                    width=packed.width, pop=pop,
                                    interleave=interleave)
    else:
        if gauss.shape[0] != num_samples:
            raise ValueError(
                f"gauss has {gauss.shape[0]} samples along axis 0 but "
                f"num_samples={num_samples}; they must match")
        gp = _cone_pack_gauss(gauss, num_samples, sample_rows, g, pad)
        cnt = _soft4_cone_table_call(pix4, light_row, gp,
                                     packed.nodes4, packed.tri_rows,
                                     num_samples, sample_rows,
                                     packed.root_enc, interpret=interpret,
                                     width=packed.width, pop=pop,
                                     interleave=interleave)
    return cnt[:, 0, :].reshape(-1)[:n].astype(jnp.float32)


# ---------------------------------------------------------------------------
# HBM-streaming 4-wide variant (VERDICT r3 item 2): the binary HBM kernel's
# per-leaf DMA pipeline grafted onto the 4-wide pop.  Nodes stay in VMEM
# (512 B/row after lane padding — and a 4-wide row covers TWO binary levels,
# so the same byte budget reaches twice the scene size or uses narrower
# leaves); triangle rows stream from HBM into a double-buffered scratch, the
# next leaf's DMA issued before the pending leaf's Möller–Trumbore sweep so
# the copy rides under compute.  The interleaved multi-stack loop gives each
# row band its OWN buffer+semaphore pair: one band's DMA wait overlaps the
# other band's slab/MT vector work — exactly the stall the binary kernel's
# pops eat (BENCH_NOTES "Known levers").
# Capability anchor: same ordered descent as
# /root/reference/src/bounding_volume_hierarchy.cpp:572-595.
# ---------------------------------------------------------------------------


class HBMBVH4(NamedTuple):
    """Wide node table (VMEM-sized) + HBM-resident triangle rows."""

    nodes4: jax.Array  # [Nw, 7 * width] f32 (VMEM)
    tri_rows: jax.Array  # [R + leaf_rows, 128] f32 (HBM; lane/tail-padded)
    slot_to_prim: jax.Array  # [R * 14] i32 (-1 on padding)
    root_enc: float
    num_nodes: int
    leaf_rows: int  # fixed DMA block height; every leaf has <= this many rows
    width: int = 4


jax.tree_util.register_pytree_node(
    HBMBVH4,
    lambda p: ((p.nodes4, p.tri_rows, p.slot_to_prim),
               (p.root_enc, p.num_nodes, p.leaf_rows, p.width)),
    lambda aux, ch: HBMBVH4(*ch, root_enc=aux[0], num_nodes=aux[1],
                            leaf_rows=aux[2],
                            width=aux[3] if len(aux) > 3 else 4),
)


def build_hbm_bvh4(scene: Scene, leaf_rows: int | None = None,
                   builder: str = "median", width: int = 4,
                   tri_dtype=jnp.float32):
    """Host-side build+collapse+pack for the HBM-streaming 4-wide kernel.

    Picks the NARROWEST leaf width whose collapsed node table fits the
    binary variant's byte budget (pallas_bvh.HBM_NODE_BYTES_BUDGET) — the
    4-wide collapse roughly halves the node count, so this usually lands one
    or two widths below the binary kernel's choose_leaf_rows, cutting the
    per-leaf DMA volume accordingly."""
    from .pallas_bvh import HBM_NODE_BYTES_BUDGET

    explicit = leaf_rows is not None
    candidates = ((leaf_rows,) if explicit else (1, 2, 4, 8, 16, 32))
    last = None
    for rows in candidates:
        bvh = build_bvh(scene, max_leaf=rows * TRIS_PER_ROW, builder=builder)
        packed4 = collapse_bvhw(pack_bvh_rows(bvh), width=width)
        last = (bvh, packed4, rows)
        if explicit:  # caller owns the VMEM trade (A/B probes)
            break
        if packed4.nodes4.shape[0] * 512 <= HBM_NODE_BYTES_BUDGET:
            break
    else:
        raise ValueError(
            f"{scene.num_triangles} triangles exceed the HBM4 node budget "
            f"even at 32-row leaves; shard the scene instead "
            f"(parallel/geometry.py)")
    bvh, packed4, rows = last
    # tri_dtype=bfloat16 halves the per-leaf DMA bytes (the streamed scenes
    # are bandwidth-bound); MT accumulates in f32 after an in-register cast,
    # but the GEOMETRY is quantized (~0.4% rel) — silhouette/t precision
    # must be A/B'd before any auto flips (scripts/tpu_r4b.py bf16).
    tri_rows = jnp.pad(packed4.tri_rows,
                       ((0, rows), (0, 128 - TRIS_PER_ROW * 9)))
    tri_rows = tri_rows.astype(tri_dtype)
    return bvh, HBMBVH4(
        nodes4=packed4.nodes4,
        tri_rows=tri_rows,
        slot_to_prim=packed4.slot_to_prim,
        root_enc=packed4.root_enc,
        num_nodes=packed4.num_nodes,
        leaf_rows=rows,
        width=width,
    )


def supports_pallas_bvh4_hbm(scene: Scene) -> bool:
    """Conservative gate mirroring the binary variant's: if the binary node
    table fits at some leaf width, the collapsed one fits at the same width."""
    from .pallas_bvh import supports_pallas_bvh_hbm

    return supports_pallas_bvh_hbm(scene)


def _hbm_state4(t0):
    """_init_state4 + the DMA pipeline's pending-leaf registers
    (p_valid, p_row, p_rows, p_slot)."""
    return _init_state4(t0) + (jnp.int32(0), jnp.int32(0), jnp.int32(0),
                               jnp.int32(0))


def _pop_step4_hbm(stack_ref, tstack_ref, nodes4_ref, tris_hbm_ref, tri_buf,
                   dma_sem, rv, state, any_hit: bool, leaf_rows: int,
                   width: int = 4, vred_ref=None, sort: bool = True):
    """One guarded pop of one band's HBM-streaming 4-wide traversal.

    Pipeline identical to pallas_bvh._traverse_hbm: one leaf in flight while
    internal nodes pop; a leaf pop first starts the NEW leaf's DMA (into the
    other scratch slot), then waits+sweeps the pending one.  An exhausted
    stack with a pending leaf drains it; an exhausted idle band takes the
    scalar-only skip branch, so interleaving imbalanced bands costs only
    dead pops."""
    ox, oy, oz, dx, dy, dz, ix, iy, iz, t0 = rv
    (sp, t_best, slot, u, v, done, t_ub,
     p_valid, p_row, p_rows, p_slot) = state
    live = (sp > 0) & jnp.logical_not(done)
    spm = jnp.maximum(sp - 1, 0)
    enc = stack_ref[spm]
    tin_pushed = tstack_ref[spm]
    sp = jnp.where(live, spm, sp)

    def start_dma(row_first, buf_slot):
        return pltpu.make_async_copy(
            tris_hbm_ref.at[pl.ds(row_first, leaf_rows)],
            tri_buf.at[buf_slot], dma_sem.at[buf_slot],
        )

    def sweep_pending(carry, base_row, n_rows, buf_slot):
        def row_body(r, lc):
            t_b, sl, uu, vv = lc
            trow = tri_buf[buf_slot, r].astype(jnp.float32)
            for k in range(TRIS_PER_ROW):
                tri = [trow[9 * k + j] for j in range(9)]
                t, u_, v_, ok = _mt_tile(ox, oy, oz, dx, dy, dz, tri)
                closer = ok & (t < t_b)
                slot_k = (base_row + r) * TRIS_PER_ROW + k
                t_b = jnp.where(closer, t, t_b)
                sl = jnp.where(closer, slot_k, sl)
                uu = jnp.where(closer, u_, uu)
                vv = jnp.where(closer, v_, vv)
            return t_b, sl, uu, vv

        return jax.lax.fori_loop(0, n_rows, row_body, carry)

    # 0 = no-op (idle band / stale entry), 1 = internal, 2 = leaf,
    # 3 = drain pending (stack exhausted or tile done with a DMA in flight —
    # an unwaited DMA must not outlive the kernel).
    kind = jnp.where(jnp.logical_not(live) | (tin_pushed > t_ub), 0,
                     jnp.where(enc >= 0, 1, 2))
    kind = jnp.where(jnp.logical_not(live) & (p_valid > 0), 3, kind)

    def skip_fn(args):
        return args

    def internal_fn(args):
        (sp, t_best, slot, u, v, done, t_ub,
         p_valid, p_row, p_rows, p_slot) = args
        sp = _internal_pushes(stack_ref, tstack_ref, nodes4_ref, enc, sp,
                              t_best, rv, width, vred_ref=vred_ref,
                              sort=sort)
        return (sp, t_best, slot, u, v, done, t_ub,
                p_valid, p_row, p_rows, p_slot)

    def leaf_fn(args):
        (sp, t_best, slot, u, v, done, t_ub,
         p_valid, p_row, p_rows, p_slot) = args
        code = (-enc - 1.0).astype(jnp.int32)
        row_first = code // _ENC_LEAF_SHIFT
        n_rows = code - row_first * _ENC_LEAF_SHIFT
        new_slot = 1 - p_slot

        start_dma(row_first, new_slot).start()

        def retire(carry):
            t_b, sl, uu, vv = carry
            start_dma(p_row, p_slot).wait()
            return sweep_pending(carry, p_row, p_rows, p_slot)

        t_best, slot, u, v = jax.lax.cond(
            p_valid > 0, retire, lambda c: c, (t_best, slot, u, v))
        if any_hit:
            done = done | jnp.all((slot >= 0) | (t0 < 0.0))
        pad_ub = _SLAB_EPS * (1.0 + jnp.abs(t_best))
        t_ub = jnp.max(t_best + pad_ub)
        return (sp, t_best, slot, u, v, done, t_ub,
                jnp.int32(1), row_first, n_rows, new_slot)

    def drain_fn(args):
        (sp, t_best, slot, u, v, done, t_ub,
         p_valid, p_row, p_rows, p_slot) = args
        start_dma(p_row, p_slot).wait()
        t_best, slot, u, v = sweep_pending((t_best, slot, u, v),
                                           p_row, p_rows, p_slot)
        if any_hit:
            done = done | jnp.all((slot >= 0) | (t0 < 0.0))
        pad_ub = _SLAB_EPS * (1.0 + jnp.abs(t_best))
        t_ub = jnp.max(t_best + pad_ub)
        return (sp, t_best, slot, u, v, done, t_ub,
                jnp.int32(0), p_row, p_rows, p_slot)

    return jax.lax.switch(kind, [skip_fn, internal_fn, leaf_fn, drain_fn],
                          (sp, t_best, slot, u, v, done, t_ub,
                           p_valid, p_row, p_rows, p_slot))


def _traverse4_hbm_xn(stacks, bufs, sems, nodes4_ref, tris_hbm_ref, rvs_list,
                      root_enc: float, any_hit: bool, leaf_rows: int,
                      width: int = 4, vreds=None, sort: bool = True):
    """Interleaved multi-band HBM-streaming traversal: each band owns a
    (stack, tstack, tri_buf, sem) set and walks independently in one fused
    loop.  Returns a list of (t, slot, u, v) per band."""
    nway = len(rvs_list)
    if vreds is None:
        vreds = [None] * nway
    for k in range(nway):
        stacks[2 * k][0] = jnp.float32(root_enc)
        stacks[2 * k + 1][0] = jnp.float32(-_BIG)

    def cond(states):
        live = None
        for s in states:
            l = ((s[0] > 0) & jnp.logical_not(s[5])) | (s[7] > 0)
            live = l if live is None else (live | l)
        return live

    def body(states):
        return tuple(
            _pop_step4_hbm(stacks[2 * k], stacks[2 * k + 1], nodes4_ref,
                           tris_hbm_ref, bufs[k], sems[k], rvs_list[k],
                           states[k], any_hit, leaf_rows, width,
                           vred_ref=vreds[k], sort=sort)
            for k in range(nway)
        )

    out = jax.lax.while_loop(
        cond, body, tuple(_hbm_state4(rv[-1]) for rv in rvs_list))
    return [(s[1], s[2], s[3], s[4]) for s in out]


def _bvh4_hbm_kernel_xn(ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                        tmax_ref, nodes4_ref, tris_hbm_ref, t_ref, slot_ref,
                        u_ref, v_ref, *scratch, root_enc: float, any_hit: bool,
                        leaf_rows: int, interleave: int, width: int = 4,
                        pop: str = "base"):
    nway = interleave
    stacks = scratch[:2 * nway]
    bufs = scratch[2 * nway:3 * nway]
    sems = scratch[3 * nway:4 * nway]
    vreds = (scratch[4 * nway:5 * nway] if "batched" in pop
             else [None] * nway)
    sort = "nosort" not in pop
    parts = [_split_rows(r[0], nway)
             for r in (ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                       tmax_ref)]
    rvs = [_rayvars(*(p[k] for p in parts)) for k in range(nway)]
    outs = _traverse4_hbm_xn(stacks, bufs, sems, nodes4_ref, tris_hbm_ref,
                             rvs, root_enc, any_hit, leaf_rows, width,
                             vreds=vreds, sort=sort)
    t_ref[0] = jnp.concatenate([o[0] for o in outs], axis=0)
    slot_ref[0] = jnp.concatenate([o[1] for o in outs], axis=0)
    u_ref[0] = jnp.concatenate([o[2] for o in outs], axis=0)
    v_ref[0] = jnp.concatenate([o[3] for o in outs], axis=0)


def _bvh4_hbm_bounce_kernel_xn(ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                               tmax_ref, nodes4_ref, tris_hbm_ref, lights_ref,
                               t_ref, slot_ref, u_ref, v_ref, shadow_ref,
                               *scratch, root_enc: float, num_lights: int,
                               leaf_rows: int, interleave: int,
                               width: int = 4, pop: str = "base"):
    """Interleaved fused bounce over the HBM-streaming 4-wide tree: closest
    hit then per-light shadow any-hit, sharing each band's scratch (the DMA
    pipeline fully drains between traversals — cond holds until p_valid
    clears)."""
    nway = interleave
    stacks = scratch[:2 * nway]
    bufs = scratch[2 * nway:3 * nway]
    sems = scratch[3 * nway:4 * nway]
    vreds = (scratch[4 * nway:5 * nway] if "batched" in pop
             else [None] * nway)
    sort = "nosort" not in pop
    parts = [_split_rows(r[0], nway)
             for r in (ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                       tmax_ref)]
    rvs = [_rayvars(*(p[k] for p in parts)) for k in range(nway)]
    closest = _traverse4_hbm_xn(stacks, bufs, sems, nodes4_ref, tris_hbm_ref,
                                rvs, root_enc, any_hit=False,
                                leaf_rows=leaf_rows, width=width,
                                vreds=vreds, sort=sort)

    hits = [sl >= 0 for (_, sl, _, _) in closest]
    pos = []
    for k, (t, sl, _, _) in enumerate(closest):
        th = jnp.where(hits[k], t, 0.0)
        ox_k, oy_k, oz_k = parts[0][k], parts[1][k], parts[2][k]
        dx_k, dy_k, dz_k = parts[3][k], parts[4][k], parts[5][k]
        pos.append((ox_k + dx_k * th, oy_k + dy_k * th, oz_k + dz_k * th))

    bits = [jnp.zeros(p[0].shape, jnp.int32) for p in pos]
    for li in range(num_lights):
        lrow = lights_ref[li]

        def shadow_rv(px, py, pz, hit):
            tx, ty, tz = lrow[0] - px, lrow[1] - py, lrow[2] - pz
            dist = jnp.sqrt(tx * tx + ty * ty + tz * tz)
            inv = 1.0 / jnp.maximum(dist, 1e-20)
            sdx, sdy, sdz = tx * inv, ty * inv, tz * inv
            sox = px + SHADOW_EPS * sdx
            soy = py + SHADOW_EPS * sdy
            soz = pz + SHADOW_EPS * sdz
            tmax_l = jnp.where(hit, dist - SHADOW_EPS, -1.0)
            return _rayvars(sox, soy, soz, sdx, sdy, sdz, tmax_l)

        shadow = _traverse4_hbm_xn(
            stacks, bufs, sems, nodes4_ref, tris_hbm_ref,
            [shadow_rv(*pos[k], hits[k]) for k in range(nway)],
            root_enc, any_hit=True, leaf_rows=leaf_rows, width=width,
            vreds=vreds, sort=sort)
        for k in range(nway):
            bits[k] = bits[k] | ((shadow[k][1] >= 0).astype(jnp.int32) << li)

    t_ref[0] = jnp.concatenate([o[0] for o in closest], axis=0)
    slot_ref[0] = jnp.concatenate([o[1] for o in closest], axis=0)
    u_ref[0] = jnp.concatenate([o[2] for o in closest], axis=0)
    v_ref[0] = jnp.concatenate([o[3] for o in closest], axis=0)
    shadow_ref[0] = jnp.concatenate(bits, axis=0)


def _hbm4_scratch(interleave: int, leaf_rows: int, dtype=jnp.float32,
                  pop: str = "base"):
    scratch = (_stack_scratch(interleave)
               + [pltpu.VMEM((2, leaf_rows, 128), dtype)
                  for _ in range(interleave)]
               + [pltpu.SemaphoreType.DMA((2,)) for _ in range(interleave)])
    if "batched" in pop:
        scratch += [pltpu.VMEM((8, RAY_COLS), jnp.float32)
                    for _ in range(interleave)]
    return scratch


@functools.partial(jax.jit,
                   static_argnames=("root_enc", "any_hit", "leaf_rows",
                                    "interpret", "interleave", "width",
                                    "pop"))
def _bvh4_hbm_call(rays6, tmax_tiles, nodes4, tri_rows, root_enc,
                   any_hit=False, leaf_rows=4, interpret=False, interleave=1,
                   width=4, pop="base"):
    g, rows = rays6[0].shape[0], rays6[0].shape[1]
    kernel = functools.partial(_bvh4_hbm_kernel_xn, root_enc=root_enc,
                               any_hit=any_hit, leaf_rows=leaf_rows,
                               interleave=interleave, width=width, pop=pop)
    ray_spec = lambda: pl.BlockSpec((1, rows, RAY_COLS), lambda i: (i, 0, 0),
                                    memory_space=pltpu.VMEM)
    out_shape = [
        jax.ShapeDtypeStruct((g, rows, RAY_COLS), jnp.float32),
        jax.ShapeDtypeStruct((g, rows, RAY_COLS), jnp.int32),
        jax.ShapeDtypeStruct((g, rows, RAY_COLS), jnp.float32),
        jax.ShapeDtypeStruct((g, rows, RAY_COLS), jnp.float32),
    ]
    return pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=[ray_spec() for _ in range(7)] + [
            pl.BlockSpec(memory_space=pltpu.VMEM),  # nodes4
            pl.BlockSpec(memory_space=pl.ANY),      # tri rows (HBM)
        ],
        out_specs=[ray_spec() for _ in range(4)],
        out_shape=out_shape,
        scratch_shapes=_hbm4_scratch(interleave, leaf_rows, tri_rows.dtype,
                                     pop),
        interpret=interpret,
    )(*rays6, tmax_tiles, nodes4, tri_rows)


@functools.partial(jax.jit,
                   static_argnames=("root_enc", "leaf_rows", "interpret",
                                    "interleave", "width", "num_lights",
                                    "pop"))
def _bvh4_hbm_bounce_call(rays6, tmax_tiles, nodes4, tri_rows, lights,
                          root_enc, leaf_rows=4, interpret=False,
                          interleave=1, width=4, num_lights=None,
                          pop="base"):
    g, rows = rays6[0].shape[0], rays6[0].shape[1]
    if num_lights is None:
        num_lights = lights.shape[0]
    kernel = functools.partial(_bvh4_hbm_bounce_kernel_xn, root_enc=root_enc,
                               num_lights=num_lights,
                               leaf_rows=leaf_rows, interleave=interleave,
                               width=width, pop=pop)
    ray_spec = lambda: pl.BlockSpec((1, rows, RAY_COLS), lambda i: (i, 0, 0),
                                    memory_space=pltpu.VMEM)
    out_shape = [
        jax.ShapeDtypeStruct((g, rows, RAY_COLS), jnp.float32),
        jax.ShapeDtypeStruct((g, rows, RAY_COLS), jnp.int32),
        jax.ShapeDtypeStruct((g, rows, RAY_COLS), jnp.float32),
        jax.ShapeDtypeStruct((g, rows, RAY_COLS), jnp.float32),
        jax.ShapeDtypeStruct((g, rows, RAY_COLS), jnp.int32),
    ]
    return pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=[ray_spec() for _ in range(7)] + [
            pl.BlockSpec(memory_space=pltpu.VMEM),  # nodes4
            pl.BlockSpec(memory_space=pl.ANY),      # tri rows (HBM)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # lights [L, 3]
        ],
        out_specs=[ray_spec() for _ in range(5)],
        out_shape=out_shape,
        scratch_shapes=_hbm4_scratch(interleave, leaf_rows, tri_rows.dtype,
                                     pop),
        interpret=interpret,
    )(*rays6, tmax_tiles, nodes4, tri_rows, lights)


def _run4_hbm(packed: HBMBVH4, origins, dirs, t_max, any_hit, interpret,
              tile_rows: int, interleave: int, pop: str = "base"):
    origins = jax.lax.stop_gradient(origins)
    dirs = jax.lax.stop_gradient(dirs)
    rays, n, g = _pack_rays(origins, dirs, rows=tile_rows)
    if t_max is None:
        tm = jnp.full((n,), jnp.inf, jnp.float32)
    else:
        tm = jnp.broadcast_to(jax.lax.stop_gradient(t_max),
                              (n,)).astype(jnp.float32)
    tm_tiles = jnp.pad(tm, (0, g * tile_rows * RAY_COLS - n),
                       constant_values=-1.0)
    tm_tiles = tm_tiles.reshape(g, tile_rows, RAY_COLS)
    t, slot, u, v = _bvh4_hbm_call(rays, tm_tiles, packed.nodes4,
                                   packed.tri_rows, packed.root_enc,
                                   any_hit=any_hit,
                                   leaf_rows=packed.leaf_rows,
                                   interpret=interpret, interleave=interleave,
                                   width=packed.width, pop=pop)
    flat = lambda a: a.reshape(-1)[:n]
    return flat(t), flat(slot), flat(u), flat(v), n


def intersect_pallas_bvh4_hbm(scene: Scene, packed: HBMBVH4, origins, dirs,
                              t_max=None, interpret: bool | None = None,
                              tile_rows: int = RAY_ROWS,
                              interleave: int = 1, pop: str = "base") -> Hit:
    """Closest-hit through the HBM-streaming 4-wide kernel (+ jnp spheres)."""
    if interpret is None:
        interpret = _default_interpret()
    t, slot, u, v, n = _run4_hbm(packed, origins, dirs, t_max, False,
                                 interpret, tile_rows, interleave, pop=pop)
    prim = jnp.where(slot >= 0, packed.slot_to_prim[jnp.maximum(slot, 0)],
                     MISS)
    best = Hit(t=jnp.where(slot >= 0, t, jnp.inf), prim_id=prim, u=u, v=v)
    return _sphere_merge(scene, origins, dirs, best)


def occluded_pallas_bvh4_hbm(scene: Scene, packed: HBMBVH4, origins, dirs,
                             t_max, interpret: bool | None = None,
                             tile_rows: int = RAY_ROWS, interleave: int = 1,
                             pop: str = "base"):
    """Any-hit through the HBM-streaming 4-wide kernel."""
    if interpret is None:
        interpret = _default_interpret()
    from .intersect import intersect_spheres_one

    t, slot, _, _, n = _run4_hbm(packed, origins, dirs, t_max, True,
                                 interpret, tile_rows, interleave, pop=pop)
    blocked = slot >= 0
    num_spheres = scene.spheres.radius.shape[0]
    if num_spheres > 0:
        tm = jnp.broadcast_to(t_max, (origins.shape[0],)).astype(jnp.float32)
        t_s, valid_s = jax.vmap(
            lambda c, r: intersect_spheres_one(origins, dirs, c, r),
            in_axes=(0, 0), out_axes=(0, 0),
        )(scene.spheres.center, scene.spheres.radius)
        blocked = blocked | jnp.any(valid_s & (t_s < tm[None, :]), axis=0)
    return blocked


def supports_fused_bounce_bvh4_hbm(scene: Scene) -> bool:
    num_pl = scene.point_lights.position.shape[0]
    num_sph = scene.spherical_lights.position.shape[0]
    return (
        supports_pallas_bvh4_hbm(scene)
        and scene.spheres.radius.shape[0] == 0
        and num_pl <= MAX_FUSED_LIGHTS
        and 0 < num_pl + num_sph
    )


def bounce_pallas_bvh4_hbm(scene: Scene, packed: HBMBVH4, origins, dirs,
                           interpret: bool | None = None,
                           tile_rows: int = RAY_ROWS, live=None,
                           interleave: int = 1, pop: str = "base"):
    """Fused closest-hit + per-point-light shadow query, HBM-streaming 4-wide
    variant.  Same (Hit, shadow_bits) contract as bounce_pallas_bvh_hbm."""
    if interpret is None:
        interpret = _default_interpret()
    origins = jax.lax.stop_gradient(origins)
    dirs = jax.lax.stop_gradient(dirs)
    rays, n, g = _pack_rays(origins, dirs, rows=tile_rows)
    if live is None:
        tm = jnp.full((n,), jnp.inf, jnp.float32)
    else:
        tm = jnp.where(jax.lax.stop_gradient(live), jnp.inf, -1.0)
    tm_tiles = jnp.pad(tm, (0, g * tile_rows * RAY_COLS - n),
                       constant_values=-1.0)
    tm_tiles = tm_tiles.reshape(g, tile_rows, RAY_COLS)
    from .pallas_kernels import _light_table

    lights, num_lights = _light_table(scene)
    t, slot, u, v, bits = _bvh4_hbm_bounce_call(
        rays, tm_tiles, packed.nodes4, packed.tri_rows, lights,
        packed.root_enc, leaf_rows=packed.leaf_rows, interpret=interpret,
        interleave=interleave, width=packed.width, num_lights=num_lights,
        pop=pop)
    flat = lambda a: a.reshape(-1)[:n]
    t, slot, u, v, bits = flat(t), flat(slot), flat(u), flat(v), flat(bits)
    prim = jnp.where(slot >= 0, packed.slot_to_prim[jnp.maximum(slot, 0)],
                     MISS)
    hit = Hit(t=jnp.where(slot >= 0, t, jnp.inf), prim_id=prim, u=u, v=v)
    return hit, bits


def supports_fused_bounce_bvh4(scene: Scene) -> bool:
    from .pallas_bvh import supports_pallas_bvh

    num_pl = scene.point_lights.position.shape[0]
    num_sph = scene.spherical_lights.position.shape[0]
    return (
        supports_pallas_bvh(scene)
        and scene.spheres.radius.shape[0] == 0
        and num_pl <= MAX_FUSED_LIGHTS
        and 0 < num_pl + num_sph
    )


def bounce_pallas_bvh4(scene: Scene, packed: PackedBVH4, origins, dirs,
                       interpret: bool | None = None,
                       tile_rows: int = RAY_ROWS, live=None,
                       interleave: int = 1, pop: str = "base"):
    """Fused closest-hit + per-point-light shadow query over the 4-wide tree.
    Same (Hit, shadow_bits) contract as pallas_bvh.bounce_pallas_bvh."""
    if interpret is None:
        interpret = _default_interpret()
    origins = jax.lax.stop_gradient(origins)
    dirs = jax.lax.stop_gradient(dirs)
    rays, n, g = _pack_rays(origins, dirs, rows=tile_rows)
    if live is None:
        tm = jnp.full((n,), jnp.inf, jnp.float32)
    else:
        tm = jnp.where(jax.lax.stop_gradient(live), jnp.inf, -1.0)
    tm_tiles = jnp.pad(tm, (0, g * tile_rows * RAY_COLS - n), constant_values=-1.0)
    tm_tiles = tm_tiles.reshape(g, tile_rows, RAY_COLS)
    from .pallas_kernels import _light_table

    lights, num_lights = _light_table(scene)
    t, slot, u, v, bits = _bvh4_bounce_call(
        rays, tm_tiles, packed.nodes4, packed.tri_rows, lights,
        packed.root_enc, interpret=interpret, interleave=interleave,
        width=packed.width, num_lights=num_lights, pop=pop)
    flat = lambda a: a.reshape(-1)[:n]
    t, slot, u, v, bits = flat(t), flat(slot), flat(u), flat(v), flat(bits)
    prim = jnp.where(slot >= 0, packed.slot_to_prim[jnp.maximum(slot, 0)], MISS)
    hit = Hit(t=jnp.where(slot >= 0, t, jnp.inf), prim_id=prim, u=u, v=v)
    return hit, bits
