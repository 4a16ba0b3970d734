#!/usr/bin/env python
"""Roofline fractions for the reference-Table-2 scenes (VERDICT r1 item 2).

For each scene: count the useful per-ray work (closed form for brute-sweep
scenes; measured per-ray traversal statistics for BVH scenes, sampled over the
actual primary rays AND the actual first-bounce shadow rays), convert to an
ideal v5e frame time via utils/roofline.py, and divide by the measured
steady-state times from BENCH_NOTES.md.

Runs entirely on CPU:
    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python scripts/roofline_table.py
"""
import dataclasses
import json
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from cg_raytracer_tpu import Camera, RenderConfig, load_scene
from cg_raytracer_tpu.models.whitted import effective_max_depth, make_backend
from cg_raytracer_tpu.ops import shading
from cg_raytracer_tpu.ops.bvh import build_bvh
from cg_raytracer_tpu.ops.camera import generate_rays
from cg_raytracer_tpu.ops.intersect import intersect_brute, reconstruct_hit
from cg_raytracer_tpu.ops.linalg import norm, safe_normalize
from cg_raytracer_tpu.utils import roofline as rl

WIDTH = HEIGHT = 800
SAMPLE_STRIDE = 4  # visit stats from every 4th ray (40K of 640K)

# Measured steady-state ms/frame at 800x800 fwd (BENCH_NOTES round-3
# Table 2 repro).
MEASURED_MS = {
    "cornell_box": 4.46,
    "cornell_box_spherical_light": 152.2,
    "monkey": 33.3,
    "dragon": 34.2,
    "teacup": 61.2,
    "donut": 82.0,
    # r4 cone-sampler auto at the final autos (scripts/r4_results.jsonl
    # cone_ab: 4-wide cone tree 615.6 ms vs binary 779.2).
    "monkey_spherical_light": 615.6,
}


def scene_work(name: str):
    scn = load_scene(name)
    cfg = RenderConfig(width=WIDTH, height=HEIGHT)
    bounces = effective_max_depth(scn, cfg)
    n_pl = scn.point_lights.position.shape[0]
    n_sl = scn.spherical_lights.position.shape[0]
    rays = WIDTH * HEIGHT
    T = scn.num_triangles

    cam = Camera.default(aspect=1.0)
    origins, dirs = generate_rays(cam, HEIGHT, WIDTH)

    if T <= cfg.pallas_brute_max_tris:
        fl = rl.brute_flops_per_ray(T, n_pl, bounces)
        if n_sl:
            fl += bounces * n_sl * rl.soft_shadow_flops_per_ray(
                T, cfg.soft_shadow_samples)
        stats = None
    else:
        # Measured traversal stats on sampled primary + first-bounce shadow rays.
        o_s, d_s = origins[::SAMPLE_STRIDE], dirs[::SAMPLE_STRIDE]
        bvh = build_bvh(scn)
        prim = rl.bvh_visit_stats(bvh, o_s, d_s)
        hit = intersect_brute(scn, o_s, d_s) if T <= 4096 else None
        # Shadow rays: from reconstructed hit points toward light 0.
        backend = make_backend(scn, dataclasses.replace(cfg, backend="bvh"))
        h = backend.closest(o_s, d_s)
        surf = reconstruct_hit(scn, o_s, d_s, h)
        lpos = (scn.point_lights.position[0] if n_pl
                else scn.spherical_lights.position[0])
        to_l = lpos - surf.position
        ldir = safe_normalize(to_l)
        so = surf.position + shading.SHADOW_EPS * ldir
        tmaxs = norm(to_l) - shading.SHADOW_EPS
        valid = surf.valid
        sh = rl.bvh_visit_stats(bvh, so[valid], ldir[valid], t_max=tmaxs[valid])
        stats = {"primary": prim, "shadow": sh}
        fl = rl.bvh_flops_per_ray(
            prim["mean_internal_visits"], prim["mean_leaf_rows"],
            num_lights=n_pl, bounces=bounces,
            shadow_internal_visits=sh["mean_internal_visits"],
            shadow_leaf_rows=sh["mean_leaf_rows"])
        if n_sl:
            # Spherical light over a BVH scene: 200 per-sample any-hit
            # traversals, parameterized by the measured shadow visit stats.
            fl += bounces * n_sl * rl.soft_shadow_bvh_flops_per_ray(
                sh["mean_internal_visits"], sh["mean_leaf_rows"],
                cfg.soft_shadow_samples)

    byts = rl.bytes_per_ray(n_pl + n_sl, bounces)
    ideal, bound = rl.roofline_seconds(rays * fl, rays * byts)
    out = {
        "scene": name, "tris": T, "bounces": bounces,
        "flops_per_ray": round(fl), "gflops_frame": round(rays * fl / 1e9, 2),
        "ideal_ms": round(ideal * 1e3, 3), "bound": bound,
    }
    if name in MEASURED_MS:
        out["measured_ms"] = MEASURED_MS[name]
        out["pct_of_roofline"] = round(100 * ideal * 1e3 / MEASURED_MS[name], 1)
    if stats:
        out["visits"] = {k: {kk: round(vv, 2) for kk, vv in v.items()}
                         for k, v in stats.items()}
    return out


def main():
    scenes = ["cornell_box", "cornell_box_spherical_light", "monkey",
              "dragon", "teacup", "donut", "monkey_spherical_light"]
    for name in scenes:
        print(json.dumps(scene_work(name)))


if __name__ == "__main__":
    main()
