"""Round-4 sweep A (real chip; appends to scripts/r4_results.jsonl).

Stages (ordered most-important-first; each compilation costs 5-10 min through
the remote-compile tunnel, so rows within a stage share shapes where possible):

  headline   fwd+bwd 1024^2 cornell: two-phase+kernel under the material
             contract (r3 continuity) AND the full materials+vertices
             contract (VERDICT r3 item 3), plus the one-phase full-contract
             reference.
  mesh1024   monkey + dragon 1024^2 fwd+bwd: one-phase XLA chain baseline
             (did not exist — VERDICT item 1/5) vs two-phase + pregathered
             shade kernel; monkey also under the vertex contract.
  table_bwd  every mesh Table-2 scene 800^2 fwd+bwd: chain vs two-phase vs
             two-phase+kernel (the 6-row fwd+bwd column, VERDICT item 5).
  cone_ab    re-run of the errored r3 soft4 A/B: binary vs 4-wide cone tree
             at the final autos (VERDICT item 7).
  spherical  cornell_box_spherical_light 800^2 fwd+bwd (XLA sample scan;
             completes the Table-2 fwd+bwd coverage).

Usage: python scripts/tpu_r4a.py [stage ...]
"""
import json
import os
import sys
import time

RESULTS = os.path.join(os.path.dirname(__file__), "r4_results.jsonl")

ONE_PHASE = {"grad_two_phase": "off", "shade_kernel": "off"}
TWO_PHASE = {"grad_two_phase": "on", "shade_kernel": "off"}
TWO_KERNEL = {"grad_two_phase": "on", "shade_kernel": "on"}


def log(**rec):
    with open(RESULTS, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def _row(stage, scene, what, r, **extra):
    log(stage=stage, scene=scene, what=what,
        ms=round(r["seconds_per_frame"] * 1e3, 2),
        mrays_per_s=round(r["value"] / 1e6, 2), **extra)


def stage_headline():
    from cg_raytracer_tpu.utils.bench import run_bench

    for what, ov, vtx in (
        ("two_phase+kernel/materials", TWO_KERNEL, False),
        ("two_phase+kernel/full", TWO_KERNEL, True),
        ("one_phase/full", ONE_PHASE, True),
    ):
        r = run_bench("cornell_box", 1024, 1024, include_bwd=True, iters=5,
                      cfg_overrides=ov, include_vertex_params=vtx)
        _row("headline", "cornell_box", what, r)


def stage_mesh1024():
    from cg_raytracer_tpu.utils.bench import run_bench

    for scene in ("monkey", "dragon"):
        for what, ov, vtx in (
            ("one_phase/materials", ONE_PHASE, False),
            ("two_phase+kernel/materials", TWO_KERNEL, False),
        ):
            r = run_bench(scene, 1024, 1024, include_bwd=True, iters=3,
                          frames_per_call=4, cfg_overrides=ov,
                          include_vertex_params=vtx)
            _row("mesh1024", scene, what, r)
    # One mesh vertex-contract row (accel fixed; grads flow through the
    # differentiable reconstruct + reflected-ray chain).
    r = run_bench("monkey", 1024, 1024, include_bwd=True, iters=3,
                  frames_per_call=4, cfg_overrides=TWO_KERNEL,
                  include_vertex_params=True)
    _row("mesh1024", "monkey", "two_phase+kernel/full", r)


def stage_table_bwd():
    from cg_raytracer_tpu.utils.bench import run_bench

    for scene in ("monkey", "dragon", "teacup", "donut"):
        for what, ov in (
            ("one_phase", ONE_PHASE),
            ("two_phase", TWO_PHASE),
            ("two_phase+kernel", TWO_KERNEL),
        ):
            try:
                r = run_bench(scene, 800, 800, include_bwd=True, iters=3,
                              frames_per_call=4, cfg_overrides=ov)
                _row("table_bwd", scene, what, r)
            except Exception as e:
                log(stage="table_bwd", scene=scene, what=what,
                    error=repr(e)[:300])


def stage_cone_ab():
    from cg_raytracer_tpu.utils.bench import run_bench

    for what, ov in (
        ("cone/wide4", None),  # final autos: 4-wide tree + cone sampler
        ("cone/binary", {"bvh_wide": "2"}),
    ):
        try:
            r = run_bench("monkey_spherical_light", 800, 800,
                          include_bwd=False, iters=3, frames_per_call=2,
                          cfg_overrides=ov)
            _row("cone_ab", "monkey_spherical_light", what, r)
        except Exception as e:
            log(stage="cone_ab", what=what, error=repr(e)[:300])


def stage_spherical():
    from cg_raytracer_tpu.utils.bench import run_bench

    r = run_bench("cornell_box_spherical_light", 800, 800, include_bwd=True,
                  iters=2, frames_per_call=2, cfg_overrides=ONE_PHASE)
    _row("spherical", "cornell_box_spherical_light", "one_phase", r)


STAGES = {"headline": stage_headline, "mesh1024": stage_mesh1024,
          "table_bwd": stage_table_bwd, "cone_ab": stage_cone_ab,
          "spherical": stage_spherical}


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
