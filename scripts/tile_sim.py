#!/usr/bin/env python
"""Simulate the tile-synchronous BVH traversal's *work* on CPU.

Replays the exact kernel descent rule (ops/pallas_bvh.py::_traverse_vmem —
a node is visited iff any ray in the tile slab-hits it under its current
best t, near-child-first ordering) over sampled ray tiles with numpy, and
counts internal-node pops and leaf rows swept per tile.  This is the
divergence-waste measurement that roofline_table.py's per-ray stats cannot
see, and it prices kernel variants (ordering, tile size, leaf width) without
a 5-10 min TPU compile each.

    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python scripts/tile_sim.py teacup
"""
import json
import sys

import numpy as np

sys.path.insert(0, ".")

import cg_raytracer_tpu as cgrt
from cg_raytracer_tpu.models.whitted import _ray_order_perm
from cg_raytracer_tpu.ops.bvh import build_bvh
from cg_raytracer_tpu.ops.camera import generate_rays
from cg_raytracer_tpu.ops.pallas_bvh import TRIS_PER_ROW, pack_bvh_rows

SLAB_EPS = 1e-5


def tile_traverse_counts(nodes, tri_rows, o, d, t0):
    """One tile's synchronous traversal; returns (pops, internal, leaf_rows,
    mt_tests).  o, d: [n, 3]; t0: [n]."""
    inv = 1.0 / d
    lo, hi = nodes[:, 0:3], nodes[:, 3:6]
    left = nodes[:, 6].astype(np.int64)
    right = nodes[:, 7].astype(np.int64)
    row_first = nodes[:, 8].astype(np.int64)
    n_rows = nodes[:, 9].astype(np.int64)
    is_leaf = nodes[:, 10] > 0.5

    def slab(ni, t_best):
        t0s = (lo[ni] - o) * inv
        t1s = (hi[ni] - o) * inv
        tin = np.minimum(t0s, t1s).max(axis=1)
        tout = np.maximum(t0s, t1s).min(axis=1)
        pad = SLAB_EPS * (1.0 + np.abs(tout))
        hit = (tin <= tout + pad) & (tout >= -pad)
        tpad = SLAB_EPS * (1.0 + np.abs(t_best))
        hit &= tin <= t_best + tpad
        return tin, hit

    t_best = t0.copy()
    stack = [0]
    pops = internal = leaf_rows = mt = 0
    while stack:
        ni = stack.pop()
        pops += 1
        _, hit = slab(ni, t_best)
        if not hit.any():
            continue
        if is_leaf[ni]:
            rf, nr = row_first[ni], n_rows[ni]
            leaf_rows += int(nr)
            mt += int(nr) * TRIS_PER_ROW
            # Moller-Trumbore over the rows, updating t_best (closest-hit).
            block = tri_rows[rf:rf + nr].reshape(-1, 9)  # [nr*14, 9]
            v0, e1, e2 = block[:, 0:3], block[:, 3:6] - block[:, 0:3], block[:, 6:9] - block[:, 0:3]
            p = np.cross(d[:, None, :], e2[None])
            det = (e1[None] * p).sum(-1)
            ok = np.abs(det) > 1e-9
            invd = np.where(ok, 1.0 / np.where(det == 0, 1, det), 0.0)
            tv = o[:, None, :] - v0[None]
            u = (tv * p).sum(-1) * invd
            q = np.cross(tv, e1[None])
            v = (d[:, None, :] * q).sum(-1) * invd
            t = (e2[None] * q).sum(-1) * invd
            valid = ok & (u >= -1e-6) & (v >= -1e-6) & (u + v <= 1 + 1e-6) & (t >= 0)
            t = np.where(valid, t, np.inf)
            t_best = np.minimum(t_best, t.min(axis=1))
        else:
            internal += 1
            li, ri = left[ni], right[ni]
            tl, hl = slab(li, t_best)
            tr, hr = slab(ri, t_best)
            big = 3.4e38
            mtl = np.where(hl, tl, big).min()
            mtr = np.where(hr, tr, big).min()
            near, far = (li, ri) if mtl <= mtr else (ri, li)
            nh, fh = (hl, hr) if mtl <= mtr else (hr, hl)
            if fh.any():
                stack.append(far)
            if nh.any():
                stack.append(near)
    return pops, internal, leaf_rows, mt


def main():
    scene_name = sys.argv[1] if len(sys.argv) > 1 else "teacup"
    max_leaf = int(sys.argv[2]) if len(sys.argv) > 2 else TRIS_PER_ROW
    scn = cgrt.load_scene(scene_name)
    bvh = build_bvh(scn, max_leaf=max_leaf)
    packed = pack_bvh_rows(bvh)
    nodes = np.asarray(packed.nodes)
    tri_rows = np.asarray(packed.tri_rows)

    h = w = 800
    o, d = map(np.asarray, generate_rays(cgrt.Camera.default(), h, w))

    n_sample_tiles = 12
    for rows in (8, 16, 64, 128):
        tile = rows * 128
        for order in ("raster", "blocked", "morton"):
            if order == "raster":
                oo, dd = o, d
            else:
                perm, _ = _ray_order_perm(h, w, order, rows)
                oo, dd = o[perm], d[perm]
            n_tiles = (h * w) // tile
            picks = np.linspace(0, n_tiles - 1, n_sample_tiles).astype(int)
            tot = np.zeros(4, np.float64)
            for ti in picks:
                s = slice(ti * tile, (ti + 1) * tile)
                t0 = np.full(tile, np.inf, np.float32)
                tot += tile_traverse_counts(nodes, tri_rows, oo[s], dd[s], t0)
            mean = tot / n_sample_tiles
            # Work model per ray: vector flops from roofline constants.
            from cg_raytracer_tpu.utils.roofline import (INTERNAL_VISIT_FLOPS,
                                                         MT_FLOPS)
            flops_per_ray = (mean[1] * INTERNAL_VISIT_FLOPS
                             + mean[3] * (MT_FLOPS + 6))
            print(json.dumps({
                "scene": scene_name, "max_leaf": max_leaf, "tile_rows": rows,
                "order": order, "mean_pops": round(mean[0], 1),
                "mean_internal": round(mean[1], 1),
                "mean_leaf_rows": round(mean[2], 1),
                "mt_tests_per_tile": round(mean[3], 1),
                "tile_flops_per_ray": round(flops_per_ray, 1),
            }), flush=True)


if __name__ == "__main__":
    main()
