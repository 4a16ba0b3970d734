"""Follow-up A/B: 4-wide BVH x tile height x leaf width.

Round-2 found 8-row tiles have 5x less tile-union vector work yet LOSE on
hardware because per-pop scalar overhead dominates below 64 rows
(BENCH_NOTES.md).  The 4-wide kernel halves per-level scalar cost, which may
move that crossover: re-sweep tile height (and leaf width) on the BVH4 path.

Appends to scripts/r3_results.jsonl.
"""
import json
import os
import sys

RESULTS = os.path.join(os.path.dirname(__file__), "r3_results.jsonl")


def log(**rec):
    with open(RESULTS, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def main():
    from cg_raytracer_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from cg_raytracer_tpu.utils.bench import run_bench

    scenes = sys.argv[1:] or ["teacup", "dragon"]
    for scene in scenes:
        for rows in (8, 16, 32, 64):
            r = run_bench(scene, 800, 800, include_bwd=False, iters=3,
                          frames_per_call=4,
                          cfg_overrides={"bvh_wide": "4",
                                         "bvh_tile_rows": rows})
            log(stage="bvh4_tiles", scene=scene, rows=rows,
                ms=round(r["seconds_per_frame"] * 1e3, 2))
        for leaf in (28, 112):
            r = run_bench(scene, 800, 800, include_bwd=False, iters=3,
                          frames_per_call=4,
                          cfg_overrides={"bvh_wide": "4",
                                         "pallas_bvh_max_leaf": leaf})
            log(stage="bvh4_leaf", scene=scene, leaf=leaf,
                ms=round(r["seconds_per_frame"] * 1e3, 2))


if __name__ == "__main__":
    main()
