"""Interleaved dual-stack A/B for the 4-wide VMEM BVH kernel (real chip;
appends to scripts/r3_results.jsonl).

Sweep: interleave {1,2} x tile_rows {32, 64, 128} on teacup/dragon/monkey,
800^2 fwd steady.  Hypothesis (BENCH_NOTES round-2 facts): pops are
scalar/reduction-bound, so a second independent stack hides pop latency under
the other half-tile's vector work AND makes smaller tiles (less tile-union
divergence) affordable.

Usage: python scripts/tpu_il_ab.py [scene ...]
"""
import json
import os
import sys
import time

RESULTS = os.path.join(os.path.dirname(__file__), "r3_results.jsonl")


def log(**rec):
    with open(RESULTS, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def main():
    from cg_raytracer_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from cg_raytracer_tpu.utils.bench import run_bench

    scenes = sys.argv[1:] or ["teacup", "dragon", "monkey"]
    log(stage="il_ab", what="START")
    t0 = time.time()
    for scene in scenes:
        for rows in (64, 32, 128):
            for il in ("1", "2"):
                if il == "2" and rows < 16:
                    continue
                try:
                    r = run_bench(scene, 800, 800, include_bwd=False, iters=3,
                                  frames_per_call=4,
                                  cfg_overrides={"bvh_interleave": il,
                                                 "bvh_tile_rows": rows})
                    log(stage="il_ab", scene=scene, interleave=il,
                        tile_rows=rows,
                        ms=round(r["seconds_per_frame"] * 1e3, 2))
                except Exception as e:
                    log(stage="il_ab", scene=scene, interleave=il,
                        tile_rows=rows, error=repr(e)[:300])
    log(stage="il_ab", what="DONE", wall_s=round(time.time() - t0, 1))

    # BVH4-cone soft shadows: with soft_shadow_tile auto now 'cone', the wide
    # backend keeps BVH4 for primaries AND runs the 4-wide cone sampler.
    log(stage="soft4_ab", what="START")
    t0 = time.time()
    for wide in ("2", "4"):
        try:
            r = run_bench("monkey_spherical_light", 800, 800,
                          include_bwd=False, iters=3, frames_per_call=2,
                          cfg_overrides={"bvh_wide": wide})
            log(stage="soft4_ab", scene="monkey_spherical_light", wide=wide,
                ms=round(r["seconds_per_frame"] * 1e3, 1))
        except Exception as e:
            log(stage="soft4_ab", wide=wide, error=repr(e)[:300])
    log(stage="soft4_ab", what="DONE", wall_s=round(time.time() - t0, 1))


if __name__ == "__main__":
    main()
