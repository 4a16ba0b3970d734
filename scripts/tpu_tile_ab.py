#!/usr/bin/env python
"""A/B the tile-synchronous BVH kernel's ray-tile height and ray ordering on
real TPU (VERDICT r1 item 3).

The roofline analysis (scripts/roofline_table.py) shows mesh scenes at 0.8-4.3%
of the per-ray compute ceiling: a node is visited by the whole tile if any ray
wants it, so a 64x128-ray tile spanning 10 full image rows descends almost the
whole tree on thin-shell geometry (teacup).  Two levers, both bitwise-invariant
on the image: smaller tiles (fewer rays per lockstep group) and blocked ray
ordering (each tile = a compact pixel rectangle).

Measures steady-state ms/frame (8 frames per dispatch) per variant.  Expect
~5-10 min of remote compile per NEW (scene x variant) combination; results are
appended as JSON lines to ab_results.jsonl so partial runs survive.
"""
import json
import sys

sys.path.insert(0, ".")


def main():
    from cg_raytracer_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from cg_raytracer_tpu.utils.bench import run_bench

    scenes = sys.argv[1].split(",") if len(sys.argv) > 1 else ["teacup", "dragon"]
    # Sweeps 1-2 (recorded in ab_results.jsonl / BENCH_NOTES): 64-row tiles
    # beat 8/16/128/256; morton beats blocked beats raster.  Sweep 3: leaf
    # width at the 64/morton winner, after the per-pop reduction cut.
    variants = [
        (64, "morton", 14),
        (64, "morton", 28),
        (64, "morton", 56),
    ]
    out = open("ab_results.jsonl", "a")
    for scene in scenes:
        for rows, order, leaf in variants:
            try:
                r = run_bench(scene=scene, width=800, height=800,
                              include_bwd=False, iters=3,
                              cfg_overrides={"bvh_tile_rows": rows,
                                             "ray_order": order,
                                             "pallas_bvh_max_leaf": leaf})
                rec = {"scene": scene, "tile_rows": rows, "order": order,
                       "max_leaf": leaf,
                       "ms_steady": round(r["seconds_per_frame"] * 1e3, 2),
                       "rays_per_s": round(r["value"] / 1e6, 1)}
            except Exception as e:  # record and continue the sweep
                rec = {"scene": scene, "tile_rows": rows, "order": order,
                       "max_leaf": leaf, "error": repr(e)[:200]}
            print(json.dumps(rec), flush=True)
            out.write(json.dumps(rec) + "\n")
            out.flush()


if __name__ == "__main__":
    main()
