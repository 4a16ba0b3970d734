"""Round-4 sweep D (real chip; appends to scripts/r4_results.jsonl).

  donut2   push the sweep-B trend (32 -> 16 rows helped the HBM4 kernel):
           rows8 il1; retry the transiently-errored il2/rows32 cell; and an
           image-parity check of the new auto candidate at 800^2.
  bf16b    retry the bf16 stage once to separate a deterministic Mosaic
           rejection (bf16 DMA sublane tiling) from a transient tunnel 500.

Usage: python scripts/tpu_r4d.py [stage ...]
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


def _fwd(scene, ov, iters=3, frames=4):
    from cg_raytracer_tpu.utils.bench import run_bench

    r = run_bench(scene, 800, 800, include_bwd=False, iters=iters,
                  frames_per_call=frames, cfg_overrides=ov)
    return round(r["seconds_per_frame"] * 1e3, 2)


def stage_donut2():
    for what, ov in (
        ("hbm4/il1/rows8", {"bvh_wide_hbm": "4", "bvh_interleave": "1",
                            "bvh_tile_rows": 8}),
        ("hbm4/il2/rows32", {"bvh_wide_hbm": "4", "bvh_interleave": "2",
                             "bvh_tile_rows": 32}),
        ("hbm4/il2/rows48", {"bvh_wide_hbm": "4", "bvh_interleave": "2",
                             "bvh_tile_rows": 48}),
    ):
        try:
            log(stage="donut2", what=what, ms=_fwd("donut", ov))
        except Exception as e:
            log(stage="donut2", what=what, error=repr(e)[:300])
    # Image parity of the auto candidate vs the binary kernel at full res.
    import numpy as np

    import cg_raytracer_tpu as cgrt
    from cg_raytracer_tpu.models.whitted import render_image
    from cg_raytracer_tpu.ops.pallas_bvh import build_hbm_bvh
    from cg_raytracer_tpu.ops.pallas_bvh4 import build_hbm_bvh4

    scene = cgrt.load_scene("donut")
    cam = cgrt.Camera.default()
    cfg2 = cgrt.RenderConfig(width=800, height=800, backend="pallas",
                             forward_only=True, bvh_wide_hbm="2")
    cfg4 = cgrt.RenderConfig(width=800, height=800, backend="pallas",
                             forward_only=True, bvh_wide_hbm="4",
                             bvh_tile_rows=16, bvh_interleave="1")
    _, h2 = build_hbm_bvh(scene)
    _, h4 = build_hbm_bvh4(scene)
    img2 = np.asarray(render_image(scene, cam, cfg2, bvh=h2))
    img4 = np.asarray(render_image(scene, cam, cfg4, bvh=h4))
    bad = float((np.abs(img2 - img4).max(-1) > 1e-3).mean())
    log(stage="donut2", what="parity800", frac_pixels_diff=bad)


def stage_bf16b():
    import jax.numpy as jnp
    import numpy as np

    import cg_raytracer_tpu as cgrt
    from cg_raytracer_tpu.models.whitted import render_image
    from cg_raytracer_tpu.ops.pallas_bvh4 import build_hbm_bvh4

    scene = cgrt.load_scene("donut")
    cam = cgrt.Camera.default()
    cfg = cgrt.RenderConfig(width=128, height=128, backend="pallas",
                            forward_only=True, bvh_wide_hbm="4")
    _, h16 = build_hbm_bvh4(scene, tri_dtype=jnp.bfloat16)
    try:
        img16 = np.asarray(render_image(scene, cam, cfg, bvh=h16))
        log(stage="bf16b", what="compiled", mean=float(img16.mean()))
    except Exception as e:
        log(stage="bf16b", what="rejected", error=repr(e)[:600])


STAGES = {"donut2": stage_donut2, "bf16b": stage_bf16b}


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
