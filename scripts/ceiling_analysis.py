#!/usr/bin/env python
"""Tile-synchronous traversal ceiling analysis (round 4, VERDICT item 4).

Decomposes the measured frame times of the VMEM wide-kernel scenes into
  (a) the tile-union VECTOR floor — the slab/MT flops a tile-synchronous
      descent must execute given measured tile-union visit counts (includes
      ALL divergence waste), for every phase: primary, per-light shadow,
      bounce-1, bounce-1 shadow;
  (b) the residual = per-"event" overhead, where an event is one pop or one
      leaf-row sweep iteration (serialized scalar reads, cross-lane
      reductions, sort/push chains, loop/branch control).

Replays the exact kernel descent rule on CPU (scripts/tile_sim.py) over the
real ray/shadow/bounce distributions.  CPU-only:

    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python scripts/ceiling_analysis.py

Round-4 findings (800^2, shipped autos — leaf 56 SAH, morton, rows 32):

  teacup: vector floor ~12 ms of 64.1 measured; dragon: ~6.6 of 37.9.
  ~80% of frame time is per-event overhead at ~2-3 us (~3-4K cycles) per
  event across ~17-21K events/frame.  The knob family is at a measured
  local optimum across five axes (tile rows 16/32/64, width 2/4/8,
  interleave 1/2/4, leaf 14/28/56/112, builder median/SAH — r3/r4 ledgers);
  the width-8 probe shows per-level sort/reduce work dominates and scales
  with width (r4_results.jsonl wide8: teacup 68.6, dragon 38.5 — losses).
  Conclusion: further VMEM-scene gains need per-event cost reduction
  (fewer serialized reductions per pop) or a per-lane traversal, which
  Mosaic cannot express (dynamic indexing legalizes on sublanes only) —
  not more knob-turning.
"""
import json
import sys

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

import jax.numpy as jnp

import cg_raytracer_tpu as cgrt
from cg_raytracer_tpu.models.whitted import (REFLECT_EPS, _ray_order_perm,
                                             make_backend)
from cg_raytracer_tpu.ops.bvh import build_bvh
from cg_raytracer_tpu.ops.camera import generate_rays
from cg_raytracer_tpu.ops.intersect import reconstruct_hit
from cg_raytracer_tpu.ops.linalg import reflect, safe_normalize
from cg_raytracer_tpu.ops.pallas_bvh import pack_bvh_rows
from cg_raytracer_tpu.utils.roofline import (INTERNAL_VISIT_FLOPS, MT_FLOPS,
                                             V5E)
from tile_sim import tile_traverse_counts

np.seterr(all="ignore")

# Measured 800^2 fwd steady at the shipped autos (BENCH_NOTES r3/r4).
MEASURED_MS = {"teacup": 64.1, "dragon": 37.9}
ROWS = 32


def phase_totals(nodes, tri_rows, oo, dd, t0, n_pick=10):
    """Frame totals (pops, internal, leaf_rows, mt_tests) from sampled tiles."""
    tile = ROWS * 128
    n_tiles = oo.shape[0] // tile
    picks = np.linspace(0, n_tiles - 1, min(n_pick, n_tiles)).astype(int)
    tot = np.zeros(4)
    for ti in picks:
        s = slice(ti * tile, (ti + 1) * tile)
        tot += tile_traverse_counts(nodes, tri_rows, oo[s], dd[s], t0[s])
    return tot / len(picks) * n_tiles


def analyze(name):
    scn = cgrt.load_scene(name)
    bvh = build_bvh(scn, max_leaf=56, builder="sah")
    packed = pack_bvh_rows(bvh)
    nodes = np.asarray(packed.nodes)
    tri_rows = np.asarray(packed.tri_rows)
    h = w = 800
    rays = h * w
    o, d = map(np.asarray, generate_rays(cgrt.Camera.default(), h, w))
    perm, _ = _ray_order_perm(h, w, "morton", ROWS)
    o, d = o[perm], d[perm]

    be = make_backend(scn, cgrt.RenderConfig(width=w, height=h, backend="bvh"))
    hit = be.closest(jnp.asarray(o), jnp.asarray(d))
    surf = reconstruct_hit(scn, jnp.asarray(o), jnp.asarray(d), hit)
    valid = np.asarray(surf.valid)
    pos = np.asarray(surf.position)
    nrm = np.asarray(surf.normal)
    ks = np.asarray(surf.ks)
    lpos = np.asarray(scn.point_lights.position[0])
    n_lights = scn.point_lights.position.shape[0]

    phases = {}
    inf = np.full(rays, np.inf, np.float32)
    phases["primary"] = phase_totals(nodes, tri_rows, o, d, inf)

    def shadow_phase(p, v):
        to_l = lpos - p
        ldir = np.asarray(safe_normalize(jnp.asarray(to_l)))
        so = (p + 1e-3 * ldir).astype(np.float32)
        tm = np.where(v, np.linalg.norm(to_l, axis=-1) - 1e-3,
                      -1.0).astype(np.float32)
        return phase_totals(nodes, tri_rows, so, ldir, tm)

    phases["shadow0"] = n_lights * shadow_phase(pos, valid)

    refl = np.asarray(safe_normalize(reflect(jnp.asarray(d), jnp.asarray(nrm))))
    active = valid & (ks > 0.01).any(-1)
    if active.any():
        lo_s = np.asarray(scn.vertices).min(0)
        hi_s = np.asarray(scn.vertices).max(0)
        park = hi_s + (hi_s - lo_s) + 1.0
        o1 = np.where(active[:, None], pos + REFLECT_EPS * refl,
                      park).astype(np.float32)
        d1 = np.where(active[:, None], refl,
                      np.array([1., 0., 0.], np.float32)).astype(np.float32)
        t1 = np.where(active, np.inf, -1.0).astype(np.float32)
        phases["bounce1"] = phase_totals(nodes, tri_rows, o1, d1, t1)
        hit1 = be.closest(jnp.asarray(o1), jnp.asarray(d1))
        surf1 = reconstruct_hit(scn, jnp.asarray(o1), jnp.asarray(d1), hit1)
        v1 = np.asarray(surf1.valid) & active
        phases["shadow1"] = n_lights * shadow_phase(
            np.asarray(surf1.position), v1)

    tile = ROWS * 128
    total = sum(phases.values())
    pops, internal, leaf_rows, mt = total
    vec_flops = (internal * INTERNAL_VISIT_FLOPS + mt * (MT_FLOPS + 6)) * tile
    vec_ms = vec_flops / V5E.vpu_flops * 1e3
    out = {
        "scene": name, "rows": ROWS,
        "frame_pops": round(pops), "frame_leaf_rows": round(leaf_rows),
        "vector_floor_ms": round(vec_ms, 2),
    }
    for k, v in phases.items():
        pf = (v[1] * INTERNAL_VISIT_FLOPS + v[3] * (MT_FLOPS + 6)) * tile
        out[f"{k}_vector_ms"] = round(pf / V5E.vpu_flops * 1e3, 2)
    if name in MEASURED_MS:
        m = MEASURED_MS[name]
        events = pops + leaf_rows
        out["measured_ms"] = m
        out["residual_ms"] = round(m - vec_ms, 1)
        out["residual_pct"] = round(100 * (m - vec_ms) / m, 1)
        out["us_per_event"] = round((m - vec_ms) / events * 1e3, 2)
    return out


def main():
    for name in MEASURED_MS:
        print(json.dumps(analyze(name)), flush=True)


if __name__ == "__main__":
    main()
