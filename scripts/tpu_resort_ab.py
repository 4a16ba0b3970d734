#!/usr/bin/env python
"""A/B the between-bounce ray re-sort on real TPU (VERDICT r1 item 3, round-2
follow-up).

Primary rays are morton-grouped, but rays reflected off curved geometry
(teacup bounce 2) scatter across the image: a tile's rays then want disjoint
subtrees and the tile-synchronous kernel visits the union.  bounce_resort
re-sorts bounce>=1 rays by hit-position morton code ('pos'; 'posdir' adds the
direction octant) and parks deactivated rays outside the scene so all-dead
tiles exit after one pop.  Cost: one argsort + a handful of [N]-gathers per
bounce, in-graph.

Appends JSON lines to ab_results.jsonl (partial runs survive).
"""
import json
import sys

sys.path.insert(0, ".")


def main():
    from cg_raytracer_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from cg_raytracer_tpu.utils.bench import run_bench

    scenes = sys.argv[1].split(",") if len(sys.argv) > 1 else ["teacup", "monkey"]
    modes = sys.argv[2].split(",") if len(sys.argv) > 2 else ["off", "park", "pos", "posdir"]
    out = open("ab_results.jsonl", "a")
    for scene in scenes:
        for mode in modes:
            try:
                r = run_bench(scene=scene, width=800, height=800,
                              include_bwd=False, iters=3,
                              cfg_overrides={"bounce_resort": mode})
                rec = {"sweep": "bounce_resort", "scene": scene, "mode": mode,
                       "ms_steady": round(r["seconds_per_frame"] * 1e3, 2),
                       "rays_per_s": round(r["value"] / 1e6, 1)}
            except Exception as e:
                rec = {"sweep": "bounce_resort", "scene": scene, "mode": mode,
                       "error": repr(e)[:200]}
            print(json.dumps(rec), flush=True)
            out.write(json.dumps(rec) + "\n")
            out.flush()


if __name__ == "__main__":
    main()
