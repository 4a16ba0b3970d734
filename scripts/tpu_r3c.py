"""Round-3 sweep C (real chip; appends to scripts/r3_results.jsonl).

Stages:
  headline2  fwd+bwd 1024^2 cornell with the bounce_refl record kernel
             (two-phase + shade kernel + in-kernel reflection records)
  cone_tree  soft-shadow tree A/B: leaf {14, 56} x builder {median, sah}
             through the 4-wide cone sampler (monkey_spherical_light)
  leaf_ab    primary-kernel leaf width at the new autos (il2/rows32):
             max_leaf {28, 112} vs the 56 default on teacup/dragon

Usage: python scripts/tpu_r3c.py [stage ...]
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


def stage_headline2():
    from cg_raytracer_tpu.utils.bench import run_bench

    r = run_bench("cornell_box", 1024, 1024, include_bwd=True, iters=5,
                  cfg_overrides={"grad_two_phase": "on", "shade_kernel": "on"})
    log(stage="headline", what="two_phase+shade_kernel+bounce_refl",
        ms=round(r["seconds_per_frame"] * 1e3, 2),
        rays_per_s=round(r["value"] / 1e6, 2))


def stage_cone_tree():
    from cg_raytracer_tpu.utils.bench import run_bench

    for leaf in (14, 56):
        for builder in ("median", "sah"):
            try:
                r = run_bench("monkey_spherical_light", 800, 800,
                              include_bwd=False, iters=3, frames_per_call=2,
                              cfg_overrides={"soft_bvh_max_leaf": leaf,
                                             "soft_bvh_builder": builder})
                log(stage="cone_tree", leaf=leaf, builder=builder,
                    ms=round(r["seconds_per_frame"] * 1e3, 1))
            except Exception as e:
                log(stage="cone_tree", leaf=leaf, builder=builder,
                    error=repr(e)[:300])


def stage_leaf_ab():
    from cg_raytracer_tpu.utils.bench import run_bench

    for scene in ("teacup", "dragon"):
        for leaf in (28, 112):
            try:
                r = run_bench(scene, 800, 800, include_bwd=False, iters=3,
                              frames_per_call=4,
                              cfg_overrides={"pallas_bvh_max_leaf": leaf})
                log(stage="leaf_ab", scene=scene, leaf=leaf,
                    ms=round(r["seconds_per_frame"] * 1e3, 2))
            except Exception as e:
                log(stage="leaf_ab", scene=scene, leaf=leaf,
                    error=repr(e)[:300])


STAGES = {"headline2": stage_headline2, "cone_tree": stage_cone_tree,
          "leaf_ab": stage_leaf_ab}


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
