"""Round-4 sweep B (real chip; appends to scripts/r4_results.jsonl).

Stages:
  donut   HBM-streaming wide A/B (VERDICT r3 item 2): binary auto vs the
          4-wide DMA-pipelined kernel at interleave 1/2, tile rows 16/32,
          800^2 fwd steady.  Includes a full-res image-parity check.
  bf16    bf16 triangle rows for the HBM4 kernel (VERDICT item 6): time +
          hit-precision impact (pixel diff fraction vs f32).
  wide8   teacup/dragon 800^2 fwd with bvh_wide='8' vs the '4' auto
          (VERDICT item 4 structural lever).

Usage: python scripts/tpu_r4b.py [stage ...]
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


def stage_donut():
    # Reference point: current auto (binary HBM, rows 32) — r3 measured 82.0.
    log(stage="donut", what="binary/rows32",
        ms=_fwd("donut", {"bvh_wide_hbm": "2"}))
    for il in ("1", "2"):
        for rows in (32, 16):
            try:
                ms = _fwd("donut", {"bvh_wide_hbm": "4", "bvh_interleave": il,
                                    "bvh_tile_rows": rows})
                log(stage="donut", what=f"hbm4/il{il}/rows{rows}", ms=ms)
            except Exception as e:
                log(stage="donut", what=f"hbm4/il{il}/rows{rows}",
                    error=repr(e)[:300])


def stage_bf16():
    import dataclasses

    import numpy as np

    import cg_raytracer_tpu as cgrt
    from cg_raytracer_tpu.models.whitted import render_image
    from cg_raytracer_tpu.ops.pallas_bvh4 import build_hbm_bvh4
    from cg_raytracer_tpu.utils.bench import time_fn

    import jax
    import jax.numpy as jnp

    scene = cgrt.load_scene("donut")
    cam = cgrt.Camera.default()
    cfg = cgrt.RenderConfig(width=800, height=800, backend="pallas",
                            forward_only=True, bvh_wide_hbm="4")
    _, h32 = build_hbm_bvh4(scene)
    _, h16 = build_hbm_bvh4(scene, tri_dtype=jnp.bfloat16)

    def frame(bvh, cam_):
        return render_image(scene, cam_, cfg, bvh=bvh)

    def steady(bvh):
        # Same frames-per-call discipline as run_bench: 4 camera-jittered
        # frames scanned in ONE dispatch, median over iters, divided by 4.
        @jax.jit
        def f(keys):
            def one(c, k):
                eps = jax.random.uniform(k, (3,), jnp.float32, -1e-4, 1e-4)
                cam2 = dataclasses.replace(cam, look_at=cam.look_at + eps)
                return c + jnp.mean(frame(bvh, cam2)), None

            return jax.lax.scan(one, jnp.float32(0), keys)[0]

        keys = jax.random.split(jax.random.PRNGKey(0), 4)
        return time_fn(f, keys, iters=3) / 4 * 1e3

    try:
        img16 = np.asarray(frame(h16, cam))
        img32 = np.asarray(frame(h32, cam))
        diff = np.abs(img16 - img32).max(-1)
        log(stage="bf16", what="parity",
            frac_pixels_gt_1e3=float((diff > 1e-3).mean()),
            frac_pixels_gt_5e2=float((diff > 5e-2).mean()),
            max_diff=float(diff.max()))
        log(stage="bf16", what="time", f32_ms=round(steady(h32), 2),
            bf16_ms=round(steady(h16), 2))
    except Exception as e:
        log(stage="bf16", error=repr(e)[:500])


def stage_wide8():
    for scene in ("teacup", "dragon"):
        for what, ov in (
            ("w8/rows32/il2", {"bvh_wide": "8"}),
            ("w8/rows16/il2", {"bvh_wide": "8", "bvh_tile_rows": 16}),
            ("w8/rows16/il4", {"bvh_wide": "8", "bvh_tile_rows": 16,
                               "bvh_interleave": "4"}),
        ):
            try:
                log(stage="wide8", scene=scene, what=what,
                    ms=_fwd(scene, ov))
            except Exception as e:
                log(stage="wide8", scene=scene, what=what,
                    error=repr(e)[:300])


STAGES = {"donut": stage_donut, "bf16": stage_bf16, "wide8": stage_wide8}


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
