"""Pallas tile-synchronous BVH traversal — the hot kernel for large scenes.

Reference capability: the recursive ordered BVH descent
(``/root/reference/src/bounding_volume_hierarchy.cpp:535-881``) — the reference's
single hottest loop.

TPU-native design (this is *not* a port of the recursion): one grid program owns a
coherent tile of RAY_TILE rays ((64,128) VPU registers).  The whole tile walks the
tree in lockstep with a single scalar stack in SMEM: a node is visited iff *any*
ray in the tile hits its AABB below its current-best t.  Child visit order is
chosen once per tile by the minimum entry-t over the hitting rays — the vector
analogue of the reference's near-to-far ordering (bvh.cpp:572-595).

Memory layout (the part that makes this compile *and* fit):

- Mosaic only supports dynamic indexing on the *sublane* (row) dimension of a VMEM
  ref, and pads the lane (last) dimension to 128.  So every table is row-indexed
  by node/row id with all per-row payload packed into lanes:

  * ``nodes [Nn, 12]`` f32 rows: lo.xyz, hi.xyz, left, right, leaf_row_first,
    leaf_row_count, childL?  — integer fields stored as exact small floats
    (< 2^24) and cast back in-kernel.
  * ``tri_rows [R, 126]`` f32 rows: 14 triangles x 9 coords per row.  Leaves are
    padded to whole rows with degenerate (all-zero) triangles, which can never
    pass Moller-Trumbore (det == 0).  This packs ~36 B/triangle instead of the
    512 B/triangle a naive [T, 9] row layout pads to — the difference between a
    dragon-sized scene fitting in VMEM or not.

- The packed layout is precomputed host-side at BVH build time
  (``pack_bvh_rows``) and carried as device arrays.

Capacity: nodes + tri rows must fit in ~12 MB of VMEM => ~200K triangles with
16-triangle leaves; beyond that the jnp while-loop traversal (ops/bvh.py) takes
over until an HBM-resident DMA variant lands.
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
from .bvh import BVH, _SLAB_EPS, build_bvh
from .intersect import MISS, Hit, intersect_spheres_one
from .pallas_kernels import (MAX_FUSED_LIGHTS, RAY_COLS, RAY_ROWS, RAY_TILE,
                             SHADOW_EPS, _gauss3_from_bits, _key_seeds,
                             _mt_tile, _pack_rays)

MAX_STACK = 64
TRIS_PER_ROW = 14  # 14 * 9 = 126 lanes used of 128
PALLAS_BVH_MAX_LEAF = 14  # one full row per leaf by default
VMEM_MAX_TRIS = 200_000
# HBM-resident variant: only the node table must fit in VMEM (512 B/node row);
# triangles stream in per-leaf via async DMA.  Budget ~6 MB of VMEM for nodes.
HBM_NODE_BYTES_BUDGET = 6 * 1024 * 1024
# Largest scene the HBM variant covers: node budget / 512 B = max 2*leaves nodes,
# each leaf at most 32 rows * 14 tris at the widest leaf setting.
HBM_MAX_TRIS = (HBM_NODE_BYTES_BUDGET // 512 // 2) * 32 * TRIS_PER_ROW


class PackedBVH(NamedTuple):
    """Host-packed, kernel-ready layout (see module docstring)."""

    nodes: jax.Array  # [Nn, 12] f32
    tri_rows: jax.Array  # [R, 126] f32
    slot_to_prim: jax.Array  # [R * 14] i32 (-1 on padding)
    num_nodes: int


def _pack_flatten(p: PackedBVH):
    return (p.nodes, p.tri_rows, p.slot_to_prim), p.num_nodes


jax.tree_util.register_pytree_node(
    PackedBVH, _pack_flatten, lambda aux, ch: PackedBVH(*ch, num_nodes=aux)
)


def pack_bvh_rows(bvh: BVH) -> PackedBVH:
    """Host-side repack of a flat BVH into the kernel layout."""
    node_lo = np.asarray(bvh.node_lo)
    node_hi = np.asarray(bvh.node_hi)
    left = np.asarray(bvh.left)
    right = np.asarray(bvh.right)
    first = np.asarray(bvh.first)
    count = np.asarray(bvh.count)
    order = np.asarray(bvh.tri_order)
    tv = np.concatenate(
        [np.asarray(bvh.tv0), np.asarray(bvh.tv1), np.asarray(bvh.tv2)], axis=1
    )  # [T, 9] in reordered slot order

    nn = left.shape[0]
    leaf = count > 0
    n_rows_per = np.where(leaf, -(-count // TRIS_PER_ROW), 0)
    row_first = np.zeros(nn, np.int64)
    row_first[leaf] = np.cumsum(n_rows_per[leaf]) - n_rows_per[leaf]
    total_rows = int(n_rows_per.sum())

    tri_rows = np.zeros((max(total_rows, 1), TRIS_PER_ROW * 9), np.float32)
    slot_to_prim = np.full((max(total_rows, 1) * TRIS_PER_ROW,), -1, np.int32)
    for ni in np.where(leaf)[0]:
        f, c, rf = int(first[ni]), int(count[ni]), int(row_first[ni])
        block = tv[f:f + c]  # [c, 9]
        nrow = int(n_rows_per[ni])
        padded = np.zeros((nrow * TRIS_PER_ROW, 9), np.float32)
        padded[:c] = block
        tri_rows[rf:rf + nrow] = padded.reshape(nrow, TRIS_PER_ROW * 9)
        slot_to_prim[rf * TRIS_PER_ROW:rf * TRIS_PER_ROW + c] = order[f:f + c]

    # All integer payloads < 2^24, stored as exact floats.
    nodes = np.zeros((nn, 12), np.float32)
    nodes[:, 0:3] = node_lo
    nodes[:, 3:6] = node_hi
    nodes[:, 6] = np.maximum(left, 0)
    nodes[:, 7] = np.maximum(right, 0)
    nodes[:, 8] = row_first
    nodes[:, 9] = n_rows_per
    nodes[:, 10] = leaf.astype(np.float32)
    assert nn < (1 << 24) and total_rows * TRIS_PER_ROW < (1 << 24)

    return PackedBVH(
        nodes=jnp.asarray(nodes),
        tri_rows=jnp.asarray(tri_rows),
        slot_to_prim=jnp.asarray(slot_to_prim),
        num_nodes=nn,
    )


def build_packed_bvh(scene: Scene, max_leaf: int = PALLAS_BVH_MAX_LEAF,
                     builder: str = "median"):
    """Build a BVH tuned for the Pallas kernel (full-row leaves) + its packing."""
    bvh = build_bvh(scene, max_leaf=max_leaf, builder=builder)
    return bvh, pack_bvh_rows(bvh)


def _slab_tile(ox, oy, oz, ix, iy, iz, lo0, lo1, lo2, hi0, hi1, hi2):
    """Per-ray slab test of one AABB (6 scalars) against the ray tile."""
    t0x = (lo0 - ox) * ix
    t1x = (hi0 - ox) * ix
    t0y = (lo1 - oy) * iy
    t1y = (hi1 - oy) * iy
    t0z = (lo2 - oz) * iz
    t1z = (hi2 - oz) * iz
    tin = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                      jnp.minimum(t0z, t1z))
    tout = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                       jnp.maximum(t0z, t1z))
    pad = _SLAB_EPS * (1.0 + jnp.abs(tout))
    hit = (tin <= tout + pad) & (tout >= -pad)
    return tin, hit


def _traverse_vmem(stack_ref, nodes_ref, tris_ref, ox, oy, oz, dx, dy, dz,
                   t0, any_hit: bool):
    """Tile-synchronous traversal over the all-VMEM packed tree.

    Reusable inside a kernel body (the fused bounce kernel runs it once for the
    closest hit and once per light for shadow any-hits, sharing one SMEM stack).
    Returns (t_best, slot, u, v) tiles; slot == -1 where the ray missed.
    """
    ix, iy, iz = 1.0 / dx, 1.0 / dy, 1.0 / dz

    stack_ref[0] = jnp.int32(0)

    def cond(c):
        sp, t_best, slot, u, v, done = c
        return (sp > 0) & jnp.logical_not(done)

    def body(c):
        sp, t_best, slot, u, v, done = c
        sp = sp - 1
        ni = stack_ref[sp]
        row = nodes_ref[ni]  # (12,) vector; static lane extracts below
        tin, hit = _slab_tile(ox, oy, oz, ix, iy, iz,
                              row[0], row[1], row[2], row[3], row[4], row[5])
        tpad = _SLAB_EPS * (1.0 + jnp.abs(t_best))
        hit = hit & (tin <= t_best + tpad)
        visit = jnp.any(hit)

        is_leaf = row[10] > 0.5
        row_first = row[8].astype(jnp.int32)
        n_rows = row[9].astype(jnp.int32)

        # --- leaf: loop whole 14-triangle rows (padding tris are degenerate) ---
        def leaf_fn(carry):
            def row_body(r, lc):
                t_b, sl, uu, vv = lc
                trow = tris_ref[row_first + r]  # (126,) vector
                for k in range(TRIS_PER_ROW):
                    tri = [trow[9 * k + j] for j in range(9)]
                    t, u_, v_, valid = _mt_tile(ox, oy, oz, dx, dy, dz, tri)
                    closer = valid & (t < t_b)
                    slot_k = (row_first + r) * TRIS_PER_ROW + k
                    t_b = jnp.where(closer, t, t_b)
                    sl = jnp.where(closer, slot_k, sl)
                    uu = jnp.where(closer, u_, uu)
                    vv = jnp.where(closer, v_, vv)
                return t_b, sl, uu, vv

            return jax.lax.fori_loop(0, n_rows, row_body, carry)

        do_leaf = visit & is_leaf
        t_best, slot, u, v = jax.lax.cond(
            do_leaf, leaf_fn, lambda carry: carry, (t_best, slot, u, v)
        )
        if any_hit:
            # Early exit once every live ray is occluded (padded rays carry
            # t_max < 0 and can never record a hit, so they are exempted).
            done = done | jnp.all((slot >= 0) | (t0 < 0.0))

        # --- internal: test both children, push far then near ---
        li = row[6].astype(jnp.int32)
        ri = row[7].astype(jnp.int32)
        do_int = visit & jnp.logical_not(is_leaf)
        lrow = nodes_ref[li]
        rrow = nodes_ref[ri]
        tl, hl = _slab_tile(ox, oy, oz, ix, iy, iz,
                            lrow[0], lrow[1], lrow[2], lrow[3], lrow[4], lrow[5])
        tr, hr = _slab_tile(ox, oy, oz, ix, iy, iz,
                            rrow[0], rrow[1], rrow[2], rrow[3], rrow[4], rrow[5])
        tpad2 = _SLAB_EPS * (1.0 + jnp.abs(t_best))
        hl = hl & (tl <= t_best + tpad2)
        hr = hr & (tr <= t_best + tpad2)
        # One min-reduce per child answers both "any ray hits" (min < big)
        # and the near/far ordering — 2 cross-lane reductions instead of 4
        # (hit => finite tin: |d| = 1 gives every reachable box a finite
        # entry t, so min == big iff no lane hit).
        big = jnp.float32(3.4e38)
        min_tl = jnp.min(jnp.where(hl, tl, big))
        min_tr = jnp.min(jnp.where(hr, tr, big))
        any_l = do_int & (min_tl < big)
        any_r = do_int & (min_tr < big)
        left_near = min_tl <= min_tr
        near_i = jnp.where(left_near, li, ri)
        far_i = jnp.where(left_near, ri, li)
        near_any = jnp.where(left_near, any_l, any_r)
        far_any = jnp.where(left_near, any_r, any_l)
        stack_ref[sp] = far_i
        sp = sp + jnp.where(far_any, 1, 0)
        stack_ref[sp] = jnp.where(near_any, near_i, stack_ref[sp])
        sp = sp + jnp.where(near_any, 1, 0)

        return sp, t_best, slot, u, v, done

    init = (
        jnp.int32(1),
        t0,
        jnp.full(ox.shape, -1, jnp.int32),
        jnp.zeros(ox.shape, jnp.float32),
        jnp.zeros(ox.shape, jnp.float32),
        jnp.bool_(False),
    )
    _, t_best, slot, u, v, _ = jax.lax.while_loop(cond, body, init)
    return t_best, slot, u, v


def _bvh_kernel(ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                tmax_ref, nodes_ref, tris_ref, t_ref, slot_ref,
                u_ref, v_ref, stack_ref, *, any_hit: bool):
    t_best, slot, u, v = _traverse_vmem(
        stack_ref, nodes_ref, tris_ref,
        ox_ref[0], oy_ref[0], oz_ref[0], dx_ref[0], dy_ref[0], dz_ref[0],
        tmax_ref[0], any_hit=any_hit,
    )
    t_ref[0] = t_best
    slot_ref[0] = slot
    u_ref[0] = u
    v_ref[0] = v


def _bvh_bounce_kernel(ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                       tmax_ref, nodes_ref, tris_ref, lights_ref,
                       t_ref, slot_ref, u_ref, v_ref, shadow_ref, stack_ref,
                       *, num_lights: int):
    """Fused bounce through the VMEM BVH: one closest-hit traversal plus a
    shadow any-hit traversal per point light, sharing the tile and SMEM stack.
    Same contract as the brute ``_bounce_kernel`` (pallas_kernels.py): bit l of
    the int32 shadow tile marks light l occluded (pointInShadow,
    main.cpp:104-135); bits are only meaningful where the ray hit."""
    ox, oy, oz = ox_ref[0], oy_ref[0], oz_ref[0]
    dx, dy, dz = dx_ref[0], dy_ref[0], dz_ref[0]

    t_best, slot, u, v = _traverse_vmem(
        stack_ref, nodes_ref, tris_ref, ox, oy, oz, dx, dy, dz,
        tmax_ref[0], any_hit=False,
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
        # Missed pixels carry t_max < 0: the root slab test rejects them and the
        # any-hit early exit treats them as done, so they add no traversal work.
        tmax_l = jnp.where(hit, dist - SHADOW_EPS, -1.0)
        _, slot_s, _, _ = _traverse_vmem(
            stack_ref, nodes_ref, tris_ref, sox, soy, soz, sdx, sdy, sdz,
            tmax_l, any_hit=True,
        )
        shadow_bits = shadow_bits | ((slot_s >= 0).astype(jnp.int32) << li)

    t_ref[0] = t_best
    slot_ref[0] = slot
    u_ref[0] = u
    v_ref[0] = v
    shadow_ref[0] = shadow_bits


@functools.partial(jax.jit, static_argnames=("any_hit", "interpret"))
def _bvh_call(rays6, tmax_tiles, nodes, tri_rows, any_hit=False, interpret=False):
    g, rows = rays6[0].shape[0], rays6[0].shape[1]
    kernel = functools.partial(_bvh_kernel, any_hit=any_hit)
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
        scratch_shapes=[pltpu.SMEM((MAX_STACK,), jnp.int32)],
        interpret=interpret,
    )(*rays6, tmax_tiles, nodes, tri_rows)


def _default_interpret() -> bool:
    return jax.default_backend() not in ("tpu",)


def supports_pallas_bvh(scene: Scene) -> bool:
    return 0 < scene.num_triangles <= VMEM_MAX_TRIS


def _run(scene: Scene, packed: PackedBVH, origins, dirs, t_max, any_hit,
         interpret, tile_rows: int = RAY_ROWS):
    origins = jax.lax.stop_gradient(origins)
    dirs = jax.lax.stop_gradient(dirs)
    rays, n, g = _pack_rays(origins, dirs, rows=tile_rows)
    if t_max is None:
        tm = jnp.full((n,), jnp.inf, jnp.float32)
    else:
        tm = jnp.broadcast_to(jax.lax.stop_gradient(t_max), (n,)).astype(jnp.float32)
    tm_tiles = jnp.pad(tm, (0, g * tile_rows * RAY_COLS - n), constant_values=-1.0)
    tm_tiles = tm_tiles.reshape(g, tile_rows, RAY_COLS)
    t, slot, u, v = _bvh_call(rays, tm_tiles, packed.nodes, packed.tri_rows,
                              any_hit=any_hit, interpret=interpret)
    flat = lambda a: a.reshape(-1)[:n]
    return flat(t), flat(slot), flat(u), flat(v), n


def _sphere_merge(scene: Scene, origins, dirs, best: Hit) -> Hit:
    num_tris = scene.num_triangles
    num_spheres = scene.spheres.radius.shape[0]
    if num_spheres == 0:
        return best
    t_s, valid_s = jax.vmap(
        lambda c, r: intersect_spheres_one(origins, dirs, c, r),
        in_axes=(0, 0), out_axes=(0, 0),
    )(scene.spheres.center, scene.spheres.radius)
    t_s = jnp.where(valid_s, t_s, jnp.inf)
    s = jnp.argmin(t_s, axis=0)
    cols = jnp.arange(origins.shape[0])
    t_best_s = t_s[s, cols]
    closer = t_best_s < best.t
    return Hit(
        t=jnp.where(closer, t_best_s, best.t),
        prim_id=jnp.where(closer, num_tris + s.astype(jnp.int32), best.prim_id),
        u=jnp.where(closer, 0.0, best.u),
        v=jnp.where(closer, 0.0, best.v),
    )


def intersect_pallas_bvh(scene: Scene, packed: PackedBVH, origins, dirs,
                         t_max=None, interpret: bool | None = None,
                         tile_rows: int = RAY_ROWS) -> Hit:
    """Closest-hit through the Pallas tile-synchronous BVH kernel (+ jnp spheres,
    like the reference's bvh.intersect sphere tail, bvh.cpp:878-879)."""
    if interpret is None:
        interpret = _default_interpret()
    t, slot, u, v, n = _run(scene, packed, origins, dirs, t_max, False, interpret,
                            tile_rows=tile_rows)
    prim = jnp.where(slot >= 0, packed.slot_to_prim[jnp.maximum(slot, 0)], MISS)
    best = Hit(t=jnp.where(slot >= 0, t, jnp.inf), prim_id=prim, u=u, v=v)
    return _sphere_merge(scene, origins, dirs, best)


def occluded_pallas_bvh(scene: Scene, packed: PackedBVH, origins, dirs, t_max,
                        interpret: bool | None = None,
                        tile_rows: int = RAY_ROWS):
    """Any-hit via the BVH kernel."""
    if interpret is None:
        interpret = _default_interpret()
    t, slot, _, _, n = _run(scene, packed, origins, dirs, t_max, True, interpret,
                            tile_rows=tile_rows)
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


@functools.partial(jax.jit, static_argnames=("interpret", "num_lights"))
def _bvh_bounce_call(rays6, tmax_tiles, nodes, tri_rows, lights, interpret=False,
                     num_lights=None):
    g, rows = rays6[0].shape[0], rays6[0].shape[1]
    if num_lights is None:
        num_lights = lights.shape[0]
    kernel = functools.partial(_bvh_bounce_kernel, num_lights=num_lights)
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
            pl.BlockSpec(memory_space=pltpu.VMEM),  # nodes
            pl.BlockSpec(memory_space=pltpu.VMEM),  # tri rows
            pl.BlockSpec(memory_space=pltpu.VMEM),  # light positions [L, 3]
        ],
        out_specs=[ray_spec() for _ in range(5)],
        out_shape=out_shape,
        scratch_shapes=[pltpu.SMEM((MAX_STACK,), jnp.int32)],
        interpret=interpret,
    )(*rays6, tmax_tiles, nodes, tri_rows, lights)


def supports_fused_bounce_bvh(scene: Scene) -> bool:
    """Fused BVH bounce: VMEM-resident scene, point lights, no sphere primitives
    (spheres would need merging inside the kernel; spherical *lights* are fine —
    their soft shadows go through the separate any-hit oracle)."""
    num_pl = scene.point_lights.position.shape[0]
    num_sph = scene.spherical_lights.position.shape[0]
    return (
        supports_pallas_bvh(scene)
        and scene.spheres.radius.shape[0] == 0
        and num_pl <= MAX_FUSED_LIGHTS
        and 0 < num_pl + num_sph
    )


def bounce_pallas_bvh(scene: Scene, packed: PackedBVH, origins, dirs,
                      interpret: bool | None = None,
                      tile_rows: int = RAY_ROWS, live=None):
    """Fused closest-hit + per-point-light shadow query through the BVH.

    Returns (Hit, shadow_bits [N] int32), the same contract as the brute
    ``bounce_pallas`` (pallas_kernels.py) — one kernel instead of
    1 + num_lights dispatches, and no [N]-ray HBM round trips between them.
    ``live`` marks deactivated bounce rays dead (t_max < 0) like padding.
    """
    if interpret is None:
        interpret = _default_interpret()
    origins = jax.lax.stop_gradient(origins)
    dirs = jax.lax.stop_gradient(dirs)
    rays, n, g = _pack_rays(origins, dirs, rows=tile_rows)
    # Padding rays carry t_max < 0: the slab test rejects them everywhere, so
    # they add no traversal work and are exempt from the any-hit early exit.
    if live is None:
        tm = jnp.full((n,), jnp.inf, jnp.float32)
    else:
        tm = jnp.where(jax.lax.stop_gradient(live), jnp.inf, -1.0)
    tm_tiles = jnp.pad(tm, (0, g * tile_rows * RAY_COLS - n), constant_values=-1.0)
    tm_tiles = tm_tiles.reshape(g, tile_rows, RAY_COLS)
    from .pallas_kernels import _light_table

    lights, num_lights = _light_table(scene)
    t, slot, u, v, bits = _bvh_bounce_call(
        rays, tm_tiles, packed.nodes, packed.tri_rows, lights,
        interpret=interpret, num_lights=num_lights)
    flat = lambda a: a.reshape(-1)[:n]
    t, slot, u, v, bits = flat(t), flat(slot), flat(u), flat(v), flat(bits)
    prim = jnp.where(slot >= 0, packed.slot_to_prim[jnp.maximum(slot, 0)], MISS)
    hit = Hit(t=jnp.where(slot >= 0, t, jnp.inf), prim_id=prim, u=u, v=v)
    return hit, bits


# ---------------------------------------------------------------------------
# HBM-resident variant: triangles stream in per leaf via async DMA.
#
# The VMEM kernel above holds the whole packed scene on-chip, capping it at
# ~200K triangles.  Past that, only the *node table* stays in VMEM (512 B per
# node row after lane padding); the triangle rows live in HBM (memory_space
# ANY) and each leaf visit DMAs a fixed-size block of ``leaf_rows`` rows into a
# double-buffered VMEM scratch.  The DMA for the next leaf is issued before the
# previous leaf's Moller-Trumbore sweep runs, so the copy rides under compute.
# Wider leaves (more rows per leaf) shrink the node table; ``choose_leaf_rows``
# picks the narrowest width whose node table fits the VMEM budget.
# ---------------------------------------------------------------------------


class HBMBVH(NamedTuple):
    """Packed BVH with HBM-resident triangle rows (nodes stay VMEM-sized)."""

    nodes: jax.Array  # [Nn, 12] f32 (VMEM)
    tri_rows: jax.Array  # [R + leaf_rows, 128] f32 (HBM; lane- and tail-padded)
    slot_to_prim: jax.Array  # [R * 14] i32 (-1 on padding)
    num_nodes: int
    leaf_rows: int  # fixed DMA block height; every leaf has <= this many rows


jax.tree_util.register_pytree_node(
    HBMBVH,
    lambda p: ((p.nodes, p.tri_rows, p.slot_to_prim), (p.num_nodes, p.leaf_rows)),
    lambda aux, ch: HBMBVH(*ch, num_nodes=aux[0], leaf_rows=aux[1]),
)


def choose_leaf_rows(num_tris: int) -> int:
    """Narrowest leaf width (in 14-tri rows) whose node table fits the budget."""
    for rows in (2, 4, 8, 16, 32):
        max_leaf = rows * TRIS_PER_ROW
        # Complete binary tree over ceil(T / max_leaf) leaves, 512 B per node.
        n_leaves = -(-num_tris // max_leaf)
        if (2 * n_leaves) * 512 <= HBM_NODE_BYTES_BUDGET:
            return rows
    raise ValueError(
        f"{num_tris} triangles exceed the HBM-variant node budget even at "
        f"32-row leaves; shard the scene instead"
    )


def build_hbm_bvh(scene: Scene, leaf_rows: int | None = None,
                  builder: str = "median"):
    """Host-side build+pack for the HBM-resident kernel."""
    if leaf_rows is None:
        leaf_rows = choose_leaf_rows(scene.num_triangles)
    bvh = build_bvh(scene, max_leaf=leaf_rows * TRIS_PER_ROW, builder=builder)
    packed = pack_bvh_rows(bvh)
    # Pad lanes 126 -> 128 (Mosaic DMA slices must be lane-tile aligned) and
    # tail-pad so a fixed-size DMA starting at any leaf's first row stays in
    # bounds (over-read rows beyond the leaf are never processed).
    tri_rows = jnp.pad(packed.tri_rows,
                       ((0, leaf_rows), (0, 128 - TRIS_PER_ROW * 9)))
    return bvh, HBMBVH(
        nodes=packed.nodes,
        tri_rows=tri_rows,
        slot_to_prim=packed.slot_to_prim,
        num_nodes=packed.num_nodes,
        leaf_rows=leaf_rows,
    )


def _traverse_hbm(stack_ref, nodes_ref, tris_hbm_ref, tri_buf, dma_sem,
                  ox, oy, oz, dx, dy, dz, t0,
                  any_hit: bool, leaf_rows: int):
    """HBM-streaming traversal, reusable inside a kernel body (the fused bounce
    kernel runs it once for the closest hit and once per light for shadow
    any-hits, sharing the SMEM stack, the double-buffered triangle scratch, and
    the DMA semaphores — all fully drained between calls).
    Returns (t_best, slot, u, v) tiles; slot == -1 where the ray missed."""
    ix, iy, iz = 1.0 / dx, 1.0 / dy, 1.0 / dz

    stack_ref[0] = jnp.int32(0)

    def start_leaf_dma(row_first, slot):
        return pltpu.make_async_copy(
            tris_hbm_ref.at[pl.ds(row_first, leaf_rows)],
            tri_buf.at[slot], dma_sem.at[slot],
        )

    def process_leaf(carry, base_row, n_rows, slot):
        """MT-sweep the ``n_rows`` valid rows sitting in tri_buf[slot]."""
        def row_body(r, lc):
            t_b, sl, uu, vv = lc
            trow = tri_buf[slot, r]  # (126,) vector; dynamic sublane index
            for k in range(TRIS_PER_ROW):
                tri = [trow[9 * k + j] for j in range(9)]
                t, u_, v_, valid = _mt_tile(ox, oy, oz, dx, dy, dz, tri)
                closer = valid & (t < t_b)
                slot_k = (base_row + r) * TRIS_PER_ROW + k
                t_b = jnp.where(closer, t, t_b)
                sl = jnp.where(closer, slot_k, sl)
                uu = jnp.where(closer, u_, uu)
                vv = jnp.where(closer, v_, vv)
            return t_b, sl, uu, vv

        return jax.lax.fori_loop(0, n_rows, row_body, carry)

    # Pipeline state: one leaf in flight (being DMA'd) while internal nodes are
    # tested; its MT sweep runs when the *next* leaf is found (whose DMA is
    # started first, into the other slot) or when the stack drains.
    def cond(c):
        sp, t_best, slot, u, v, done, p_valid, p_row, p_rows, p_slot = c
        # Keep iterating while there is a pending leaf DMA even once ``done``
        # fires — an unwaited DMA must not outlive the kernel.
        return ((sp > 0) & jnp.logical_not(done)) | (p_valid > 0)

    def body(c):
        sp, t_best, slot, u, v, done, p_valid, p_row, p_rows, p_slot = c

        def drain(args):
            """Stack empty: finish the pending leaf."""
            sp, t_best, slot, u, v, done, p_valid, p_row, p_rows, p_slot = args
            pltpu.make_async_copy(
                tris_hbm_ref.at[pl.ds(p_row, leaf_rows)],
                tri_buf.at[p_slot], dma_sem.at[p_slot],
            ).wait()
            t_best, slot, u, v = process_leaf((t_best, slot, u, v),
                                              p_row, p_rows, p_slot)
            return (sp, t_best, slot, u, v, done,
                    jnp.int32(0), p_row, p_rows, p_slot)

        def step(args):
            sp, t_best, slot, u, v, done, p_valid, p_row, p_rows, p_slot = args
            sp = sp - 1
            ni = stack_ref[sp]
            row = nodes_ref[ni]
            tin, hit = _slab_tile(ox, oy, oz, ix, iy, iz,
                                  row[0], row[1], row[2], row[3], row[4], row[5])
            tpad = _SLAB_EPS * (1.0 + jnp.abs(t_best))
            hit = hit & (tin <= t_best + tpad)
            visit = jnp.any(hit)

            is_leaf = row[10] > 0.5
            row_first = row[8].astype(jnp.int32)
            n_rows = row[9].astype(jnp.int32)

            # --- leaf: start its DMA now, then retire the pending leaf ---
            do_leaf = visit & is_leaf
            new_slot = 1 - p_slot

            @pl.when(do_leaf)
            def _():
                start_leaf_dma(row_first, new_slot).start()

            def retire(carry):
                t_b, sl, uu, vv = carry
                pltpu.make_async_copy(
                    tris_hbm_ref.at[pl.ds(p_row, leaf_rows)],
                    tri_buf.at[p_slot], dma_sem.at[p_slot],
                ).wait()
                return process_leaf(carry, p_row, p_rows, p_slot)

            t_best, slot, u, v = jax.lax.cond(
                do_leaf & (p_valid > 0), retire, lambda carry: carry,
                (t_best, slot, u, v),
            )
            p_valid = jnp.where(do_leaf, 1, p_valid)
            p_row = jnp.where(do_leaf, row_first, p_row)
            p_rows = jnp.where(do_leaf, n_rows, p_rows)
            p_slot = jnp.where(do_leaf, new_slot, p_slot)

            if any_hit:
                done = done | jnp.all((slot >= 0) | (t0 < 0.0))

            # --- internal: test both children, push far then near ---
            li = row[6].astype(jnp.int32)
            ri = row[7].astype(jnp.int32)
            do_int = visit & jnp.logical_not(is_leaf)
            lrow = nodes_ref[li]
            rrow = nodes_ref[ri]
            tl, hl = _slab_tile(ox, oy, oz, ix, iy, iz,
                                lrow[0], lrow[1], lrow[2], lrow[3], lrow[4], lrow[5])
            tr, hr = _slab_tile(ox, oy, oz, ix, iy, iz,
                                rrow[0], rrow[1], rrow[2], rrow[3], rrow[4], rrow[5])
            tpad2 = _SLAB_EPS * (1.0 + jnp.abs(t_best))
            hl = hl & (tl <= t_best + tpad2)
            hr = hr & (tr <= t_best + tpad2)
            # Same min-trick as _traverse_vmem: 2 reductions, not 4.
            big = jnp.float32(3.4e38)
            min_tl = jnp.min(jnp.where(hl, tl, big))
            min_tr = jnp.min(jnp.where(hr, tr, big))
            any_l = do_int & (min_tl < big)
            any_r = do_int & (min_tr < big)
            left_near = min_tl <= min_tr
            near_i = jnp.where(left_near, li, ri)
            far_i = jnp.where(left_near, ri, li)
            near_any = jnp.where(left_near, any_l, any_r)
            far_any = jnp.where(left_near, any_r, any_l)
            stack_ref[sp] = far_i
            sp = sp + jnp.where(far_any, 1, 0)
            stack_ref[sp] = jnp.where(near_any, near_i, stack_ref[sp])
            sp = sp + jnp.where(near_any, 1, 0)

            return (sp, t_best, slot, u, v, done,
                    p_valid, p_row, p_rows, p_slot)

        return jax.lax.cond((sp > 0) & jnp.logical_not(done), step, drain, c)

    init = (
        jnp.int32(1),
        t0,
        jnp.full(ox.shape, -1, jnp.int32),
        jnp.zeros(ox.shape, jnp.float32),
        jnp.zeros(ox.shape, jnp.float32),
        jnp.bool_(False),
        jnp.int32(0), jnp.int32(0), jnp.int32(0), jnp.int32(0),
    )
    out = jax.lax.while_loop(cond, body, init)
    return out[1], out[2], out[3], out[4]


def _bvh_hbm_kernel(ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                    tmax_ref, nodes_ref, tris_hbm_ref, t_ref, slot_ref,
                    u_ref, v_ref, stack_ref, tri_buf, dma_sem,
                    *, any_hit: bool, leaf_rows: int):
    t_best, slot, u, v = _traverse_hbm(
        stack_ref, nodes_ref, tris_hbm_ref, tri_buf, dma_sem,
        ox_ref[0], oy_ref[0], oz_ref[0], dx_ref[0], dy_ref[0], dz_ref[0],
        tmax_ref[0], any_hit=any_hit, leaf_rows=leaf_rows,
    )
    t_ref[0] = t_best
    slot_ref[0] = slot
    u_ref[0] = u
    v_ref[0] = v


def _bvh_hbm_bounce_kernel(ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                           tmax_ref, nodes_ref, tris_hbm_ref, lights_ref,
                           t_ref, slot_ref, u_ref, v_ref, shadow_ref,
                           stack_ref, tri_buf, dma_sem,
                           *, num_lights: int, leaf_rows: int):
    """Fused bounce through the HBM-streaming BVH: closest-hit traversal plus a
    shadow any-hit traversal per point light.  Same contract as the VMEM
    ``_bvh_bounce_kernel``."""
    ox, oy, oz = ox_ref[0], oy_ref[0], oz_ref[0]
    dx, dy, dz = dx_ref[0], dy_ref[0], dz_ref[0]

    t_best, slot, u, v = _traverse_hbm(
        stack_ref, nodes_ref, tris_hbm_ref, tri_buf, dma_sem,
        ox, oy, oz, dx, dy, dz, tmax_ref[0],
        any_hit=False, leaf_rows=leaf_rows,
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
        _, slot_s, _, _ = _traverse_hbm(
            stack_ref, nodes_ref, tris_hbm_ref, tri_buf, dma_sem,
            sox, soy, soz, sdx, sdy, sdz, tmax_l,
            any_hit=True, leaf_rows=leaf_rows,
        )
        shadow_bits = shadow_bits | ((slot_s >= 0).astype(jnp.int32) << li)

    t_ref[0] = t_best
    slot_ref[0] = slot
    u_ref[0] = u
    v_ref[0] = v
    shadow_ref[0] = shadow_bits


@functools.partial(jax.jit,
                   static_argnames=("any_hit", "leaf_rows", "interpret"))
def _bvh_hbm_call(rays6, tmax_tiles, nodes, tri_rows, any_hit=False,
                  leaf_rows=4, interpret=False):
    g, rows = rays6[0].shape[0], rays6[0].shape[1]
    kernel = functools.partial(_bvh_hbm_kernel, any_hit=any_hit,
                               leaf_rows=leaf_rows)
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
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[ray_spec() for _ in range(4)],
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.SMEM((MAX_STACK,), jnp.int32),
            pltpu.VMEM((2, leaf_rows, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(*rays6, tmax_tiles, nodes, tri_rows)


def supports_pallas_bvh_hbm(scene: Scene) -> bool:
    if scene.num_triangles <= 0:
        return False
    try:
        choose_leaf_rows(scene.num_triangles)
        return True
    except ValueError:
        return False


def _run_hbm(scene: Scene, packed: HBMBVH, origins, dirs, t_max, any_hit,
             interpret, tile_rows: int = RAY_ROWS):
    origins = jax.lax.stop_gradient(origins)
    dirs = jax.lax.stop_gradient(dirs)
    rays, n, g = _pack_rays(origins, dirs, rows=tile_rows)
    if t_max is None:
        tm = jnp.full((n,), jnp.inf, jnp.float32)
    else:
        tm = jnp.broadcast_to(jax.lax.stop_gradient(t_max), (n,)).astype(jnp.float32)
    tm_tiles = jnp.pad(tm, (0, g * tile_rows * RAY_COLS - n), constant_values=-1.0)
    tm_tiles = tm_tiles.reshape(g, tile_rows, RAY_COLS)
    t, slot, u, v = _bvh_hbm_call(rays, tm_tiles, packed.nodes, packed.tri_rows,
                                  any_hit=any_hit, leaf_rows=packed.leaf_rows,
                                  interpret=interpret)
    flat = lambda a: a.reshape(-1)[:n]
    return flat(t), flat(slot), flat(u), flat(v), n


def intersect_pallas_bvh_hbm(scene: Scene, packed: HBMBVH, origins, dirs,
                             t_max=None, interpret: bool | None = None,
                             tile_rows: int = RAY_ROWS) -> Hit:
    """Closest-hit through the HBM-streaming BVH kernel (+ jnp spheres)."""
    if interpret is None:
        interpret = _default_interpret()
    t, slot, u, v, n = _run_hbm(scene, packed, origins, dirs, t_max, False,
                                interpret, tile_rows=tile_rows)
    prim = jnp.where(slot >= 0, packed.slot_to_prim[jnp.maximum(slot, 0)], MISS)
    best = Hit(t=jnp.where(slot >= 0, t, jnp.inf), prim_id=prim, u=u, v=v)
    return _sphere_merge(scene, origins, dirs, best)


def occluded_pallas_bvh_hbm(scene: Scene, packed: HBMBVH, origins, dirs, t_max,
                            interpret: bool | None = None,
                            tile_rows: int = RAY_ROWS):
    """Any-hit via the HBM-streaming BVH kernel."""
    if interpret is None:
        interpret = _default_interpret()
    t, slot, _, _, n = _run_hbm(scene, packed, origins, dirs, t_max, True,
                                interpret, tile_rows=tile_rows)
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


@functools.partial(jax.jit, static_argnames=("leaf_rows", "interpret",
                                             "num_lights"))
def _bvh_hbm_bounce_call(rays6, tmax_tiles, nodes, tri_rows, lights,
                         leaf_rows=4, interpret=False, num_lights=None):
    g, rows = rays6[0].shape[0], rays6[0].shape[1]
    if num_lights is None:
        num_lights = lights.shape[0]
    kernel = functools.partial(_bvh_hbm_bounce_kernel,
                               num_lights=num_lights, leaf_rows=leaf_rows)
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
            pl.BlockSpec(memory_space=pltpu.VMEM),  # nodes
            pl.BlockSpec(memory_space=pl.ANY),      # tri rows (HBM)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # light positions [L, 3]
        ],
        out_specs=[ray_spec() for _ in range(5)],
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.SMEM((MAX_STACK,), jnp.int32),
            pltpu.VMEM((2, leaf_rows, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(*rays6, tmax_tiles, nodes, tri_rows, lights)


def supports_fused_bounce_bvh_hbm(scene: Scene) -> bool:
    """Fused HBM bounce: streaming-capable scene, no spheres; spherical-only
    scenes qualify with zero point lights (empty shadow-bit loop)."""
    num_pl = scene.point_lights.position.shape[0]
    num_sph = scene.spherical_lights.position.shape[0]
    return (
        supports_pallas_bvh_hbm(scene)
        and scene.spheres.radius.shape[0] == 0
        and num_pl <= MAX_FUSED_LIGHTS
        and 0 < num_pl + num_sph
    )


def bounce_pallas_bvh_hbm(scene: Scene, packed: HBMBVH, origins, dirs,
                          interpret: bool | None = None,
                          tile_rows: int = RAY_ROWS, live=None):
    """Fused closest-hit + per-point-light shadow query, HBM-streaming variant.
    Same (Hit, shadow_bits) contract as ``bounce_pallas_bvh``."""
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
    t, slot, u, v, bits = _bvh_hbm_bounce_call(
        rays, tm_tiles, packed.nodes, packed.tri_rows, lights,
        leaf_rows=packed.leaf_rows, interpret=interpret,
        num_lights=num_lights)
    flat = lambda a: a.reshape(-1)[:n]
    t, slot, u, v, bits = flat(t), flat(slot), flat(u), flat(v), flat(bits)
    prim = jnp.where(slot >= 0, packed.slot_to_prim[jnp.maximum(slot, 0)], MISS)
    hit = Hit(t=jnp.where(slot >= 0, t, jnp.inf), prim_id=prim, u=u, v=v)
    return hit, bits


# ---------------------------------------------------------------------------
# In-kernel soft shadows over the VMEM BVH (VERDICT r1 item 4): the 200-sample
# spherical-light visibility sweep (main.cpp:166-218) with each sample's
# shadow ray resolved by an any-hit *traversal* instead of the brute sampler's
# unrolled triangle sweep (ops/pallas_kernels.py caps at 256 triangles).
# Sample directions come from the TPU hardware PRNG exactly like the brute
# variant; the table variant injects precomputed Gaussians for CPU
# interpret-mode testing.  Same oracle contract: counts are discrete
# visibility fractions, non-differentiable by design.
# ---------------------------------------------------------------------------


def _soft_sample_ray(px, py, pz, gx, gy, gz, lx, ly, lz, lr, vmask):
    """Gaussian draw -> unit vector -> point on the light sphere -> shadow ray
    (origin, dir, t_max); op order mirrors pallas_kernels._soft_visible_tile
    / shading.direct_spherical_lights.  Padding rays (vmask == 0) get
    t_max = -1: the root slab test rejects them, so they add no traversal
    work and are exempt from the any-hit early exit."""
    gn = jnp.sqrt(gx * gx + gy * gy + gz * gz)
    inv = 1.0 / jnp.maximum(gn, 1e-20)
    sx = lx + lr * (gx * inv)
    sy = ly + lr * (gy * inv)
    sz = lz + lr * (gz * inv)
    tx, ty, tz = sx - px, sy - py, sz - pz
    dist = jnp.sqrt(tx * tx + ty * ty + tz * tz)
    invd = 1.0 / jnp.maximum(dist, 1e-20)
    sdx, sdy, sdz = tx * invd, ty * invd, tz * invd
    sox = px + SHADOW_EPS * sdx
    soy = py + SHADOW_EPS * sdy
    soz = pz + SHADOW_EPS * sdz
    ex, ey, ez = sx - sox, sy - soy, sz - soz
    tmax = jnp.sqrt(ex * ex + ey * ey + ez * ez)
    tmax = jnp.where(vmask > 0, tmax, -1.0)
    return sox, soy, soz, sdx, sdy, sdz, tmax


def _soft_bvh_prng_kernel(seed_ref, px_ref, py_ref, pz_ref, vmask_ref,
                          nodes_ref, tris_ref, light_ref, cnt_ref, stack_ref,
                          *, num_samples):
    pltpu.prng_seed(seed_ref[0],
                    seed_ref[1] ^ (pl.program_id(0) * jnp.int32(-1640531527)))
    px, py, pz = px_ref[0], py_ref[0], pz_ref[0]
    vmask = vmask_ref[0]
    lrow = light_ref[0]
    lx, ly, lz, lr = lrow[0], lrow[1], lrow[2], lrow[3]

    def body(_, cnt):
        b0 = pltpu.prng_random_bits(px.shape)
        b1 = pltpu.prng_random_bits(px.shape)
        b2 = pltpu.prng_random_bits(px.shape)
        b3 = pltpu.prng_random_bits(px.shape)
        gx, gy, gz = _gauss3_from_bits(b0, b1, b2, b3)
        sox, soy, soz, sdx, sdy, sdz, tmax = _soft_sample_ray(
            px, py, pz, gx, gy, gz, lx, ly, lz, lr, vmask)
        _, slot, _, _ = _traverse_vmem(
            stack_ref, nodes_ref, tris_ref, sox, soy, soz, sdx, sdy, sdz,
            tmax, any_hit=True)
        return cnt + jnp.where((slot < 0) & (vmask > 0), 1, 0)

    cnt = jax.lax.fori_loop(0, num_samples, body,
                            jnp.zeros(px.shape, jnp.int32))
    cnt_ref[0] = cnt


def _soft_bvh_table_kernel(gauss_ref, px_ref, py_ref, pz_ref, vmask_ref,
                           nodes_ref, tris_ref, light_ref, cnt_ref, stack_ref,
                           *, num_samples):
    """Table variant (CPU interpret-mode tests): Gaussians precomputed with
    jax.random so the geometry/occlusion logic can be pinned to the XLA path
    with identical samples (the hardware PRNG has no CPU interpretation)."""
    px, py, pz = px_ref[0], py_ref[0], pz_ref[0]
    vmask = vmask_ref[0]
    lrow = light_ref[0]
    lx, ly, lz, lr = lrow[0], lrow[1], lrow[2], lrow[3]
    cnt = jnp.zeros(px.shape, jnp.int32)
    for si in range(num_samples):
        gx = gauss_ref[0, si, 0]
        gy = gauss_ref[0, si, 1]
        gz = gauss_ref[0, si, 2]
        sox, soy, soz, sdx, sdy, sdz, tmax = _soft_sample_ray(
            px, py, pz, gx, gy, gz, lx, ly, lz, lr, vmask)
        _, slot, _, _ = _traverse_vmem(
            stack_ref, nodes_ref, tris_ref, sox, soy, soz, sdx, sdy, sdz,
            tmax, any_hit=True)
        cnt = cnt + jnp.where((slot < 0) & (vmask > 0), 1, 0)
    cnt_ref[0] = cnt


@functools.partial(jax.jit, static_argnames=("num_samples", "interpret"))
def _soft_bvh_prng_call(pos3, vmask_tiles, light_row, seeds, nodes, tri_rows,
                        num_samples, interpret=False):
    g, rows = pos3[0].shape[0], pos3[0].shape[1]
    kernel = functools.partial(_soft_bvh_prng_kernel, num_samples=num_samples)
    ray_spec = lambda: pl.BlockSpec((1, rows, RAY_COLS), lambda i: (i, 0, 0),
                                    memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] +
                 [ray_spec() for _ in range(4)] + [
            pl.BlockSpec(memory_space=pltpu.VMEM),  # nodes
            pl.BlockSpec(memory_space=pltpu.VMEM),  # tri rows
            pl.BlockSpec(memory_space=pltpu.VMEM),  # light row [1, 4]
        ],
        out_specs=ray_spec(),
        out_shape=jax.ShapeDtypeStruct((g, rows, RAY_COLS), jnp.int32),
        scratch_shapes=[pltpu.SMEM((MAX_STACK,), jnp.int32)],
        interpret=interpret,
    )(seeds, *pos3, vmask_tiles, nodes, tri_rows, light_row)


@functools.partial(jax.jit, static_argnames=("num_samples", "interpret"))
def _soft_bvh_table_call(pos3, vmask_tiles, light_row, gauss, nodes, tri_rows,
                         num_samples, interpret=True):
    g, rows = pos3[0].shape[0], pos3[0].shape[1]
    kernel = functools.partial(_soft_bvh_table_kernel, num_samples=num_samples)
    ray_spec = lambda: pl.BlockSpec((1, rows, RAY_COLS), lambda i: (i, 0, 0),
                                    memory_space=pltpu.VMEM)
    s = gauss.shape[1]
    return pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=[pl.BlockSpec((1, s, 3, rows, RAY_COLS),
                               lambda i: (i, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM)] +
                 [ray_spec() for _ in range(4)] + [
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=ray_spec(),
        out_shape=jax.ShapeDtypeStruct((g, rows, RAY_COLS), jnp.int32),
        scratch_shapes=[pltpu.SMEM((MAX_STACK,), jnp.int32)],
        interpret=interpret,
    )(gauss, *pos3, vmask_tiles, nodes, tri_rows, light_row)


def _soft_bvh_cone_prng_kernel(seed_ref, px_ref, py_ref, pz_ref, vmask_ref,
                               nodes_ref, tris_ref, light_ref, cnt_ref,
                               stack_ref, *, num_samples, rows):
    """Cone-coherent sampler: tile LANES are pixels, tile ROWS are samples.

    The per-sample sampler (``_soft_bvh_prng_kernel``) re-traverses the tree
    once per sample — 200 traversals per tile — even though all samples of a
    pixel share an origin and a narrow direction cone toward the light
    (main.cpp:166-218).  Here one (rows x 128) tile holds 128 pixels x
    ``rows`` of their samples, so ONE any-hit traversal serves every lane:
    the tile-union a node pays is the union of 128 adjacent pixels' light
    cones instead of the whole image's, and each tile runs
    ceil(num_samples / rows) traversals instead of num_samples.

    Pixel data arrives in the standard 128-lane layout — blocks (1, 8, 128)
    with row 0 meaningful, broadcast down the sample rows in-register (a
    (1, 128) -> (rows, 128) sublane broadcast; small-lane blocks would
    violate Mosaic's 128-lane DMA alignment).  Output: counts in row 0 of an
    (8, 128) tile.
    """
    pltpu.prng_seed(seed_ref[0],
                    seed_ref[1] ^ (pl.program_id(0) * jnp.int32(-1640531527)))
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
        b0 = pltpu.prng_random_bits(shape)
        b1 = pltpu.prng_random_bits(shape)
        b2 = pltpu.prng_random_bits(shape)
        b3 = pltpu.prng_random_bits(shape)
        gx, gy, gz = _gauss3_from_bits(b0, b1, b2, b3)
        sox, soy, soz, sdx, sdy, sdz, tmax = _soft_sample_ray(
            px, py, pz, gx, gy, gz, lx, ly, lz, lr, smask)
        _, slot, _, _ = _traverse_vmem(
            stack_ref, nodes_ref, tris_ref, sox, soy, soz, sdx, sdy, sdz,
            tmax, any_hit=True)
        cnt = cnt + jnp.where((slot < 0) & (smask > 0), 1, 0)
    total = jnp.sum(cnt, axis=0, keepdims=True)  # (1, 128) per-pixel counts
    cnt_ref[0] = jnp.broadcast_to(total, (8, RAY_COLS))


def _soft_bvh_cone_table_kernel(gauss_ref, px_ref, py_ref, pz_ref, vmask_ref,
                                nodes_ref, tris_ref, light_ref, cnt_ref,
                                stack_ref, *, num_samples, rows):
    """Table variant of the cone-coherent sampler (CPU interpret tests):
    Gaussians precomputed with jax.random, block (1, passes, 3, rows, 128)."""
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
        _, slot, _, _ = _traverse_vmem(
            stack_ref, nodes_ref, tris_ref, sox, soy, soz, sdx, sdy, sdz,
            tmax, any_hit=True)
        cnt = cnt + jnp.where((slot < 0) & (smask > 0), 1, 0)
    total = jnp.sum(cnt, axis=0, keepdims=True)
    cnt_ref[0] = jnp.broadcast_to(total, (8, RAY_COLS))


def _pix_spec():
    return pl.BlockSpec((1, 8, RAY_COLS), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)


@functools.partial(jax.jit, static_argnames=("num_samples", "rows",
                                             "interpret"))
def _soft_bvh_cone_prng_call(pix4, light_row, seeds, nodes, tri_rows,
                             num_samples, rows, interpret=False):
    g = pix4[0].shape[0]
    kernel = functools.partial(_soft_bvh_cone_prng_kernel,
                               num_samples=num_samples, rows=rows)
    return pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] +
                 [_pix_spec() for _ in range(4)] + [
            pl.BlockSpec(memory_space=pltpu.VMEM),  # nodes
            pl.BlockSpec(memory_space=pltpu.VMEM),  # tri rows
            pl.BlockSpec(memory_space=pltpu.VMEM),  # light row [1, 4]
        ],
        out_specs=_pix_spec(),
        out_shape=jax.ShapeDtypeStruct((g, 8, RAY_COLS), jnp.int32),
        scratch_shapes=[pltpu.SMEM((MAX_STACK,), jnp.int32)],
        interpret=interpret,
    )(seeds, *pix4, nodes, tri_rows, light_row)


@functools.partial(jax.jit, static_argnames=("num_samples", "rows",
                                             "interpret"))
def _soft_bvh_cone_table_call(pix4, light_row, gauss, nodes, tri_rows,
                              num_samples, rows, interpret=True):
    g = pix4[0].shape[0]
    passes = gauss.shape[1]
    kernel = functools.partial(_soft_bvh_cone_table_kernel,
                               num_samples=num_samples, rows=rows)
    return pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=[pl.BlockSpec((1, passes, 3, rows, RAY_COLS),
                               lambda i: (i, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM)] +
                 [_pix_spec() for _ in range(4)] + [
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=_pix_spec(),
        out_shape=jax.ShapeDtypeStruct((g, 8, RAY_COLS), jnp.int32),
        scratch_shapes=[pltpu.SMEM((MAX_STACK,), jnp.int32)],
        interpret=interpret,
    )(gauss, *pix4, nodes, tri_rows, light_row)


def _cone_pack_pixels(positions):
    """[N,3] hit positions -> ((px,py,pz,vmask) [G,8,128] tiles, n, g, pad):
    the cone samplers' pixel layout (row 0 meaningful, 128-lane aligned)."""
    n = positions.shape[0]
    pad = (-n) % RAY_COLS
    p = jnp.pad(positions, ((0, pad), (0, 0)))
    g = (n + pad) // RAY_COLS

    def pix(comp):
        r = comp.reshape(g, 1, RAY_COLS)
        return jnp.pad(r, ((0, 0), (0, 7), (0, 0)))

    pix4 = (pix(p[:, 0]), pix(p[:, 1]), pix(p[:, 2]),
            pix(jnp.pad(jnp.ones((n,), jnp.int32), (0, pad))))
    return pix4, n, g, pad


def _cone_pack_gauss(gauss, num_samples, sample_rows, g, pad):
    """[S,N,3] precomputed Gaussians -> [G, passes, 3, rows, 128] table:
    sample p*rows + r of pixel g*128 + l lands at [g, p, :, r, l]."""
    passes = -(-num_samples // sample_rows)
    gp = jnp.pad(gauss, ((0, passes * sample_rows - num_samples),
                         (0, pad), (0, 0)))
    gp = gp.reshape(passes, sample_rows, g, RAY_COLS, 3)
    return jnp.transpose(gp, (2, 0, 4, 1, 3))


def _cone_light_row(light_pos, light_radius):
    light_row = jnp.concatenate(
        [jnp.asarray(light_pos, jnp.float32).reshape(3),
         jnp.asarray(light_radius, jnp.float32).reshape(1)]
    )[None, :]
    return jax.lax.stop_gradient(light_row)


def soft_shadow_counts_pallas_bvh_cone(scene: Scene, packed: PackedBVH,
                                       positions, light_pos, light_radius,
                                       key, num_samples: int,
                                       interpret: bool | None = None,
                                       gauss=None,
                                       sample_rows: int | None = None):
    """Cone-coherent visible-sample counts (see _soft_bvh_cone_prng_kernel):
    same [N] float32 contract as ``soft_shadow_counts_pallas_bvh`` but one
    traversal serves 128 pixels x ``sample_rows`` samples.  ``sample_rows``
    defaults to all samples in one pass (rounded up to a sublane multiple)."""
    if interpret is None:
        interpret = _default_interpret()
    if sample_rows is None:
        sample_rows = -(-num_samples // 8) * 8
    positions = jax.lax.stop_gradient(positions)
    pix4, n, g, pad = _cone_pack_pixels(positions)
    light_row = _cone_light_row(light_pos, light_radius)

    if gauss is None:
        if interpret:
            raise NotImplementedError(
                "soft-shadow PRNG kernel has no CPU interpretation; pass "
                "gauss= for the table variant or run on TPU")
        cnt = _soft_bvh_cone_prng_call(pix4, light_row, _key_seeds(key),
                                       packed.nodes, packed.tri_rows,
                                       num_samples, sample_rows,
                                       interpret=False)
    else:
        if gauss.shape[0] != num_samples:
            raise ValueError(
                f"gauss has {gauss.shape[0]} samples along axis 0 but "
                f"num_samples={num_samples}; they must match")
        gp = _cone_pack_gauss(gauss, num_samples, sample_rows, g, pad)
        cnt = _soft_bvh_cone_table_call(pix4, light_row, gp,
                                        packed.nodes, packed.tri_rows,
                                        num_samples, sample_rows,
                                        interpret=interpret)
    return cnt[:, 0, :].reshape(-1)[:n].astype(jnp.float32)


def supports_soft_shadow_kernel_bvh(scene: Scene) -> bool:
    """BVH-traversal sampler: any VMEM-resident all-triangle scene with
    spherical lights (the brute sampler caps at 256 unrolled triangles)."""
    return (
        supports_pallas_bvh(scene)
        and scene.spheres.radius.shape[0] == 0
        and scene.spherical_lights.position.shape[0] > 0
    )


def soft_shadow_counts_pallas_bvh(scene: Scene, packed: PackedBVH, positions,
                                  light_pos, light_radius, key,
                                  num_samples: int,
                                  interpret: bool | None = None, gauss=None,
                                  tile_rows: int = RAY_ROWS):
    """Visible-sample counts for one spherical light -> [N] float32 in
    [0, num_samples], resolved by in-kernel any-hit BVH traversals.  Same
    contract as pallas_kernels.soft_shadow_counts_pallas."""
    if interpret is None:
        interpret = _default_interpret()
    positions = jax.lax.stop_gradient(positions)
    n = positions.shape[0]
    tile = tile_rows * RAY_COLS
    pad = (-n) % tile
    p = jnp.pad(positions, ((0, pad), (0, 0)))
    g = (n + pad) // tile
    shape = (g, tile_rows, RAY_COLS)
    pos3 = tuple(p[:, i].reshape(shape) for i in range(3))
    vmask = jnp.pad(jnp.ones((n,), jnp.int32), (0, pad)).reshape(shape)
    light_row = jnp.concatenate(
        [jnp.asarray(light_pos, jnp.float32).reshape(3),
         jnp.asarray(light_radius, jnp.float32).reshape(1)]
    )[None, :]
    light_row = jax.lax.stop_gradient(light_row)

    if gauss is None:
        if interpret:
            raise NotImplementedError(
                "soft-shadow PRNG kernel has no CPU interpretation; pass "
                "gauss= for the table variant or run on TPU")
        cnt = _soft_bvh_prng_call(pos3, vmask, light_row, _key_seeds(key),
                                  packed.nodes, packed.tri_rows, num_samples,
                                  interpret=False)
    else:
        if gauss.shape[0] != num_samples:
            raise ValueError(
                f"gauss has {gauss.shape[0]} samples along axis 0 but "
                f"num_samples={num_samples}; they must match")
        gp = jnp.pad(gauss, ((0, 0), (0, pad), (0, 0)))
        gp = gp.reshape(num_samples, g, tile_rows, RAY_COLS, 3)
        gp = jnp.transpose(gp, (1, 0, 4, 2, 3))  # [g, S, 3, rows, cols]
        cnt = _soft_bvh_table_call(pos3, vmask, light_row, gp, packed.nodes,
                                   packed.tri_rows, num_samples,
                                   interpret=interpret)
    return cnt.reshape(-1)[:n].astype(jnp.float32)
