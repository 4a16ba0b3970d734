"""Pallas tile-synchronous BVH traversal — the hot kernel for large scenes.

Reference capability: the recursive ordered BVH descent
(``/root/reference/src/bounding_volume_hierarchy.cpp:535-881``) — the reference's
single hottest loop.

TPU-native design (this is *not* a port of the recursion): one grid program owns a
coherent tile of 1024 rays ((8,128) VPU registers).  The whole tile walks the tree
in lockstep with a single scalar stack in SMEM: a node is visited iff *any* ray in
the tile hits its AABB below its current-best t (a conservative tile-frustum test
evaluated exactly, per ray, on the VPU).  Leaf triangle tests broadcast each
triangle from VMEM over the tile exactly like the brute-force kernel.  Child visit
order is chosen once per tile by comparing the minimum entry-t over the hitting
rays — the vector analogue of the reference's near-to-far ordering
(bvh.cpp:572-595).

Coherent primary/shadow tiles visit close to the per-ray-optimal node set; the
worst case (fully incoherent tile) degrades toward brute force over the leaves hit
by any ray, never worse than the brute kernel by more than the node tests.

Tree + triangles live in VMEM (flattened SoA packed into two tables), which bounds
supported scene size to ~100K triangles per kernel instance; larger scenes fall
back to the jnp while-loop traversal (ops/bvh.py) until the HBM-resident DMA
variant lands.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..scene.types import Scene
from .bvh import BVH, _SLAB_EPS
from .intersect import MISS, Hit, intersect_spheres_one
from .pallas_kernels import (RAY_COLS, RAY_ROWS, RAY_TILE, _mt_tile, _pack_rays)

MAX_STACK = 64
# VMEM budget gate: nodes (8 f32) + tris (9 f32) must fit comfortably in ~16 MB.
VMEM_MAX_TRIS = 120_000


def _slab_tile(ox, oy, oz, ix, iy, iz, lo0, lo1, lo2, hi0, hi1, hi2):
    """Per-ray slab test of one AABB (6 scalars) against the (8,128) tile."""
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


def _bvh_kernel(rays_ref, tmax_ref, nodesf_ref, nodesi_ref, tris_ref,
                t_ref, slot_ref, u_ref, v_ref, stack_ref, *, any_hit: bool):
    """Component-major tables (lane dim = node/tri index, so VMEM does not pad a
    small trailing dim to 128 lanes): nodesf [6, Nn] (lo xyz, hi xyz) f32;
    nodesi [4, Nn] (left, right, first, count) i32; tris [9, T] f32;
    stack: SMEM [MAX_STACK] i32.
    """
    ox, oy, oz = rays_ref[0, 0], rays_ref[0, 1], rays_ref[0, 2]
    dx, dy, dz = rays_ref[0, 3], rays_ref[0, 4], rays_ref[0, 5]
    ix, iy, iz = 1.0 / dx, 1.0 / dy, 1.0 / dz
    t0 = tmax_ref[0]

    stack_ref[0] = jnp.int32(0)

    def node_aabb(ni):
        return (nodesf_ref[0, ni], nodesf_ref[1, ni], nodesf_ref[2, ni],
                nodesf_ref[3, ni], nodesf_ref[4, ni], nodesf_ref[5, ni])

    def cond(c):
        sp, t_best, slot, u, v, done = c
        return (sp > 0) & jnp.logical_not(done)

    def body(c):
        sp, t_best, slot, u, v, done = c
        sp = sp - 1
        ni = stack_ref[sp]
        lo0, lo1, lo2, hi0, hi1, hi2 = node_aabb(ni)
        tin, hit = _slab_tile(ox, oy, oz, ix, iy, iz, lo0, lo1, lo2, hi0, hi1, hi2)
        tpad = _SLAB_EPS * (1.0 + jnp.abs(t_best))
        hit = hit & (tin <= t_best + tpad)
        visit = jnp.any(hit)

        cnt = nodesi_ref[3, ni]
        first = nodesi_ref[2, ni]
        is_leaf = cnt > 0

        # --- leaf path: dynamic-count triangle loop, masked by the tile visit ---
        def leaf_fn(carry):
            def tri_body(k, lc):
                t_b, sl, uu, vv = lc
                idx = first + k
                tri = [tris_ref[j, idx] for j in range(9)]
                t, u_, v_, valid = _mt_tile(ox, oy, oz, dx, dy, dz, tri)
                closer = valid & (t < t_b)
                return (
                    jnp.where(closer, t, t_b),
                    jnp.where(closer, first + k, sl),
                    jnp.where(closer, u_, uu),
                    jnp.where(closer, v_, vv),
                )

            return jax.lax.fori_loop(0, cnt, tri_body, carry)

        do_leaf = visit & is_leaf
        t_best, slot, u, v = jax.lax.cond(
            do_leaf, leaf_fn, lambda carry: carry, (t_best, slot, u, v)
        )
        if any_hit:
            done = done | jnp.all(slot >= 0)

        # --- internal path: test both children, push far then near ---
        li = nodesi_ref[0, ni]
        ri = nodesi_ref[1, ni]
        do_int = visit & jnp.logical_not(is_leaf)
        l_lo0, l_lo1, l_lo2, l_hi0, l_hi1, l_hi2 = node_aabb(jnp.maximum(li, 0))
        r_lo0, r_lo1, r_lo2, r_hi0, r_hi1, r_hi2 = node_aabb(jnp.maximum(ri, 0))
        tl, hl = _slab_tile(ox, oy, oz, ix, iy, iz, l_lo0, l_lo1, l_lo2,
                            l_hi0, l_hi1, l_hi2)
        tr, hr = _slab_tile(ox, oy, oz, ix, iy, iz, r_lo0, r_lo1, r_lo2,
                            r_hi0, r_hi1, r_hi2)
        tpad2 = _SLAB_EPS * (1.0 + jnp.abs(t_best))
        hl = hl & (tl <= t_best + tpad2)
        hr = hr & (tr <= t_best + tpad2)
        any_l = do_int & jnp.any(hl)
        any_r = do_int & jnp.any(hr)
        # Tile-level near/far: min entry-t over the hitting rays.
        big = jnp.float32(3.4e38)
        min_tl = jnp.min(jnp.where(hl, tl, big))
        min_tr = jnp.min(jnp.where(hr, tr, big))
        left_near = min_tl <= min_tr
        near_i = jnp.where(left_near, li, ri)
        far_i = jnp.where(left_near, ri, li)
        near_any = jnp.where(left_near, any_l, any_r)
        far_any = jnp.where(left_near, any_r, any_l)
        # Unconditional writes + conditional sp increments (same scheme as the jnp
        # traversal): far first so near pops first.
        stack_ref[sp] = far_i
        sp = sp + jnp.where(far_any, 1, 0)
        stack_ref[sp] = jnp.where(near_any, near_i, stack_ref[sp])
        sp = sp + jnp.where(near_any, 1, 0)

        return sp, t_best, slot, u, v, done

    init = (
        jnp.int32(1),
        t0,
        jnp.full((RAY_ROWS, RAY_COLS), -1, jnp.int32),
        jnp.zeros((RAY_ROWS, RAY_COLS), jnp.float32),
        jnp.zeros((RAY_ROWS, RAY_COLS), jnp.float32),
        jnp.bool_(False),
    )
    _, t_best, slot, u, v, _ = jax.lax.while_loop(cond, body, init)
    t_ref[0] = t_best
    slot_ref[0] = slot
    u_ref[0] = u
    v_ref[0] = v


def _pack_tree(bvh: BVH):
    nodesf = jnp.concatenate([bvh.node_lo, bvh.node_hi], axis=1).T  # [6, Nn]
    nodesi = jnp.stack([bvh.left, bvh.right, bvh.first, bvh.count], axis=0)  # [4,Nn]
    tris = jnp.concatenate([bvh.tv0, bvh.tv1, bvh.tv2], axis=1).T  # [9, T]
    return nodesf, nodesi, tris


@functools.partial(jax.jit, static_argnames=("any_hit", "interpret"))
def _bvh_call(rays, tmax_tiles, nodesf, nodesi, tris, any_hit=False,
              interpret=False):
    g = rays.shape[0]
    kernel = functools.partial(_bvh_kernel, any_hit=any_hit)
    tile = lambda i: (i, 0, 0)
    out_shape = [
        jax.ShapeDtypeStruct((g, RAY_ROWS, RAY_COLS), jnp.float32),
        jax.ShapeDtypeStruct((g, RAY_ROWS, RAY_COLS), jnp.int32),
        jax.ShapeDtypeStruct((g, RAY_ROWS, RAY_COLS), jnp.float32),
        jax.ShapeDtypeStruct((g, RAY_ROWS, RAY_COLS), jnp.float32),
    ]
    return pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=[
            pl.BlockSpec((1, 6, RAY_ROWS, RAY_COLS), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RAY_ROWS, RAY_COLS), tile, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, RAY_ROWS, RAY_COLS), tile, memory_space=pltpu.VMEM)
        ] * 4,
        out_shape=out_shape,
        scratch_shapes=[pltpu.SMEM((MAX_STACK,), jnp.int32)],
        interpret=interpret,
    )(rays, tmax_tiles, nodesf, nodesi, tris)


def _default_interpret() -> bool:
    return jax.default_backend() not in ("tpu",)


def supports_pallas_bvh(scene: Scene) -> bool:
    return 0 < scene.num_triangles <= VMEM_MAX_TRIS


def intersect_pallas_bvh(scene: Scene, bvh: BVH, origins, dirs, t_max=None,
                         interpret: bool | None = None) -> Hit:
    """Closest-hit through the Pallas tile-synchronous BVH kernel (+ jnp spheres)."""
    if interpret is None:
        interpret = _default_interpret()
    origins = jax.lax.stop_gradient(origins)
    dirs = jax.lax.stop_gradient(dirs)
    num_tris = scene.num_triangles
    rays, n, g = _pack_rays(origins, dirs)
    if t_max is None:
        tm = jnp.full((n,), jnp.inf, jnp.float32)
    else:
        tm = jnp.broadcast_to(t_max, (n,)).astype(jnp.float32)
    tm_tiles = jnp.pad(tm, (0, g * RAY_TILE - n), constant_values=-1.0)
    tm_tiles = tm_tiles.reshape(g, RAY_ROWS, RAY_COLS)
    nodesf, nodesi, tris = _pack_tree(bvh)
    t, slot, u, v = _bvh_call(rays, tm_tiles, nodesf, nodesi, tris,
                              any_hit=False, interpret=interpret)
    flat = lambda a: a.reshape(-1)[:n]
    t, slot, u, v = flat(t), flat(slot), flat(u), flat(v)
    prim = jnp.where(slot >= 0, bvh.tri_order[jnp.maximum(slot, 0)], MISS)
    best = Hit(t=jnp.where(slot >= 0, t, jnp.inf), prim_id=prim, u=u, v=v)

    num_spheres = scene.spheres.radius.shape[0]
    if num_spheres > 0:
        t_s, valid_s = jax.vmap(
            lambda c, r: intersect_spheres_one(origins, dirs, c, r),
            in_axes=(0, 0), out_axes=(0, 0),
        )(scene.spheres.center, scene.spheres.radius)
        t_s = jnp.where(valid_s, t_s, jnp.inf)
        s = jnp.argmin(t_s, axis=0)
        cols = jnp.arange(n)
        t_best_s = t_s[s, cols]
        closer = t_best_s < best.t
        best = Hit(
            t=jnp.where(closer, t_best_s, best.t),
            prim_id=jnp.where(closer, num_tris + s.astype(jnp.int32), best.prim_id),
            u=jnp.where(closer, 0.0, best.u),
            v=jnp.where(closer, 0.0, best.v),
        )
    return best


def occluded_pallas_bvh(scene: Scene, bvh: BVH, origins, dirs, t_max,
                        interpret: bool | None = None):
    """Any-hit via the BVH kernel (early-exits once the whole tile is occluded)."""
    if interpret is None:
        interpret = _default_interpret()
    origins = jax.lax.stop_gradient(origins)
    dirs = jax.lax.stop_gradient(dirs)
    t_max = jax.lax.stop_gradient(t_max)
    num_tris = scene.num_triangles
    rays, n, g = _pack_rays(origins, dirs)
    tm = jnp.broadcast_to(t_max, (n,)).astype(jnp.float32)
    tm_tiles = jnp.pad(tm, (0, g * RAY_TILE - n), constant_values=-1.0)
    tm_tiles = tm_tiles.reshape(g, RAY_ROWS, RAY_COLS)
    nodesf, nodesi, tris = _pack_tree(bvh)
    t, slot, _, _ = _bvh_call(rays, tm_tiles, nodesf, nodesi, tris,
                              any_hit=True, interpret=interpret)
    blocked = (slot.reshape(-1)[:n] >= 0)

    num_spheres = scene.spheres.radius.shape[0]
    if num_spheres > 0:
        t_s, valid_s = jax.vmap(
            lambda c, r: intersect_spheres_one(origins, dirs, c, r),
            in_axes=(0, 0), out_axes=(0, 0),
        )(scene.spheres.center, scene.spheres.radius)
        blocked = blocked | jnp.any(valid_s & (t_s < tm[None, :]), axis=0)
    return blocked
