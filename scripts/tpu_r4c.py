"""Round-4 sweep C (real chip; appends to scripts/r4_results.jsonl).

Follow-ups to sweep A's findings:
  headline_rec  the recorded-rays fast path (two_phase_rays auto selection)
                should recover the r3 7.69 ms material-contract headline the
                exact-ray threading spent ~1 ms on.
  shade_ab      teacup regressed under the pregathered kernel (92.6 vs 81.0
                one-phase) — suspected relayout overhead; A/B the 'direct'
                tiled gather (no transposes) vs 'rows' on teacup + monkey
                fwd+bwd, deciding the shade_kernel/shade_gather autos.

Usage: python scripts/tpu_r4c.py [stage ...]
"""
import json
import os
import sys
import time

RESULTS = os.path.join(os.path.dirname(__file__), "r4_results.jsonl")


def log(**rec):
    with open(RESULTS, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def _bwd(scene, ov, w=800, iters=3, frames=4, vtx=False):
    from cg_raytracer_tpu.utils.bench import run_bench

    r = run_bench(scene, w, w, include_bwd=True, iters=iters,
                  frames_per_call=frames, cfg_overrides=ov,
                  include_vertex_params=vtx)
    return round(r["seconds_per_frame"] * 1e3, 2), round(r["value"] / 1e6, 2)


def stage_headline_rec():
    # Pure auto (run_bench selects two-phase + recorded rays for material
    # params) — the production material-contract headline.
    ms, mr = _bwd("cornell_box", None, w=1024, iters=5, frames=8)
    log(stage="headline_rec", what="auto/materials(recorded)", ms=ms,
        mrays_per_s=mr)


def stage_shade_ab():
    for scene in ("teacup", "monkey", "dragon"):
        for what, ov in (
            ("kernel/direct", {"grad_two_phase": "on", "shade_kernel": "on",
                               "shade_gather": "direct"}),
            ("kernel/rows", {"grad_two_phase": "on", "shade_kernel": "on",
                             "shade_gather": "rows"}),
        ):
            try:
                ms, mr = _bwd(scene, ov)
                log(stage="shade_ab", scene=scene, what=what, ms=ms,
                    mrays_per_s=mr)
            except Exception as e:
                log(stage="shade_ab", scene=scene, what=what,
                    error=repr(e)[:300])
    # Vertex-contract mesh row under the direct gather (sweep A measured the
    # rows variant implicitly): monkey 1024^2 full params.
    try:
        ms, mr = _bwd("monkey",
                      {"grad_two_phase": "on", "shade_kernel": "on"},
                      w=1024, vtx=True)
        log(stage="shade_ab", scene="monkey", what="kernel/direct/full1024",
            ms=ms, mrays_per_s=mr)
    except Exception as e:
        log(stage="shade_ab", scene="monkey", what="kernel/direct/full1024",
            error=repr(e)[:300])


STAGES = {"headline_rec": stage_headline_rec, "shade_ab": stage_shade_ab}


def main():
    from cg_raytracer_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    for name in (sys.argv[1:] or list(STAGES)):
        t0 = time.time()
        log(stage=name, what="START")
        try:
            STAGES[name]()
            log(stage=name, what="DONE", wall_s=round(time.time() - t0, 1))
        except Exception as e:
            log(stage=name, what="ERROR", error=repr(e)[:500])


if __name__ == "__main__":
    main()
