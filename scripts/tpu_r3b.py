"""Round-3 sweep B (real chip; appends to scripts/r3_results.jsonl).

Stages:
  headline  fwd+bwd 1024^2 cornell: baseline / two-phase / two-phase+shade-kernel
  tiles     deeper interleave sweep: rows16/il2, rows16/il4, rows32/il4
  soft4     monkey_spherical_light with the (fixed) wide+cone auto routing

Usage: python scripts/tpu_r3b.py [stage ...]
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


def stage_headline():
    from cg_raytracer_tpu.utils.bench import run_bench

    for name, ov in (
        ("baseline", None),
        ("two_phase", {"grad_two_phase": "on", "shade_kernel": "off"}),
        ("two_phase+shade_kernel", {"grad_two_phase": "on",
                                    "shade_kernel": "on"}),
    ):
        r = run_bench("cornell_box", 1024, 1024, include_bwd=True, iters=5,
                      cfg_overrides=ov)
        log(stage="headline", what=name,
            ms=round(r["seconds_per_frame"] * 1e3, 2),
            rays_per_s=round(r["value"] / 1e6, 2))


def stage_tiles():
    from cg_raytracer_tpu.utils.bench import run_bench

    for scene in ("teacup", "dragon"):
        for rows, il in ((16, "2"), (16, "4"), (32, "4")):
            try:
                r = run_bench(scene, 800, 800, include_bwd=False, iters=3,
                              frames_per_call=4,
                              cfg_overrides={"bvh_interleave": il,
                                             "bvh_tile_rows": rows})
                log(stage="il_ab", scene=scene, interleave=il, tile_rows=rows,
                    ms=round(r["seconds_per_frame"] * 1e3, 2))
            except Exception as e:
                log(stage="il_ab", scene=scene, interleave=il, tile_rows=rows,
                    error=repr(e)[:300])


def stage_soft4():
    from cg_raytracer_tpu.utils.bench import run_bench

    # Pure auto: bvh_wide 4 + cone sampler on the 4-wide tree (build_accel
    # now packs BVH4 for spherical scenes when the cone sampler is selected).
    r = run_bench("monkey_spherical_light", 800, 800, include_bwd=False,
                  iters=3, frames_per_call=2)
    log(stage="soft4_ab", scene="monkey_spherical_light", wide="4-auto",
        ms=round(r["seconds_per_frame"] * 1e3, 1))


STAGES = {"headline": stage_headline, "tiles": stage_tiles,
          "soft4": stage_soft4}


def main():
    from cg_raytracer_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    names = sys.argv[1:] or list(STAGES)
    for name in names:
        t0 = time.time()
        log(stage=name, what="START")
        try:
            STAGES[name]()
            log(stage=name, what="DONE", wall_s=round(time.time() - t0, 1))
        except Exception as e:
            log(stage=name, what="ERROR", error=repr(e)[:500])


if __name__ == "__main__":
    main()
