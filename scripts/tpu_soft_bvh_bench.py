#!/usr/bin/env python
"""Benchmark the BVH-traversal in-kernel soft-shadow sampler (VERDICT r1
item 4): monkey under one spherical light (968 tris — past the brute
sampler's 256-triangle unroll cap), 800x800, 200 samples/pixel-light.

Compares the chunked XLA sample scan (soft_shadow_kernel='off') against the
in-kernel BVH sampler ('on'), steady-state ms/frame.  Also validates the two
paths agree at the binomial noise floor (different but statistically
equivalent sample streams).
"""
import json
import sys

sys.path.insert(0, ".")


def main():
    from cg_raytracer_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import numpy as np

    import cg_raytracer_tpu as cgrt
    from cg_raytracer_tpu.utils.bench import run_bench

    out = {}
    for mode in ("off", "on"):
        r = run_bench(scene="monkey_spherical_light", width=800, height=800,
                      include_bwd=False, iters=3,
                      cfg_overrides={"soft_shadow_kernel": mode})
        out[mode] = round(r["seconds_per_frame"] * 1e3, 2)
        print(json.dumps({"soft_shadow_kernel": mode, "ms_steady": out[mode]}),
              flush=True)
    print(json.dumps({"speedup_kernel_vs_scan": round(out["off"] / out["on"], 2)}))

    # Agreement check at small size: mean delta at the binomial noise floor.
    scn = cgrt.load_scene("monkey_spherical_light")
    cam = cgrt.Camera.default()
    imgs = {}
    for mode in ("off", "on"):
        cfg = cgrt.RenderConfig(width=128, height=128, soft_shadow_kernel=mode)
        imgs[mode] = np.asarray(cgrt.render(scn, cam, cfg))
        jax.block_until_ready(imgs[mode])
    d = np.abs(imgs["on"] - imgs["off"])
    print(json.dumps({"mean_abs_delta": float(d.mean()),
                      "max_abs_delta": float(d.max()),
                      "pixels_gt_0.15": int((d.max(axis=-1) > 0.15).sum())}))


if __name__ == "__main__":
    main()
