#!/usr/bin/env python
"""Validate + time the HBM-streaming Pallas BVH kernel on real TPU.

Checks the compiled kernel (not interpret mode) against the brute-force oracle
on the monkey scene, then times full 800x800 renders of the Table 2 custom
scenes: teacup (48K tris, all-VMEM kernel) and donut (320K tris, HBM kernel).
Prints one JSON line per check.
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from cg_raytracer_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import cg_raytracer_tpu as cgrt
    from cg_raytracer_tpu.models.whitted import build_accel
    from cg_raytracer_tpu.ops import camera as cam_ops
    from cg_raytracer_tpu.ops.intersect import intersect_brute
    from cg_raytracer_tpu.ops.pallas_bvh import (build_hbm_bvh,
                                                 intersect_pallas_bvh_hbm)

    print(json.dumps({"devices": [str(d) for d in jax.devices()]}), flush=True)
    cam = cgrt.Camera.default()

    # --- correctness: compiled HBM kernel vs brute oracle, monkey ---
    scene = cgrt.load_scene("monkey")
    _, hbvh = build_hbm_bvh(scene, leaf_rows=2)
    o, d = cam_ops.generate_rays(cam, 64, 64)
    hb = intersect_brute(scene, o, d)
    hp = intersect_pallas_bvh_hbm(scene, hbvh, o, d, interpret=False)
    jax.block_until_ready(hp.t)
    tb = np.where(np.isinf(np.asarray(hb.t)), 1e9, np.asarray(hb.t))
    tp = np.where(np.isinf(np.asarray(hp.t)), 1e9, np.asarray(hp.t))
    match = float(np.isclose(tb, tp, atol=1e-4).mean())
    print(json.dumps({"check": "hbm_vs_brute_monkey", "t_match": match,
                      "prim_match": float(
                          (np.asarray(hb.prim_id) == np.asarray(hp.prim_id)).mean())}),
          flush=True)

    # --- timing: Table 2 custom scenes, 800x800 forward ---
    for name, ref_ms in (("teacup", 430.0), ("donut", 6500.0)):
        scene = cgrt.load_scene(name)
        cfg = cgrt.RenderConfig(width=800, height=800, backend="pallas")
        accel = build_accel(scene, cfg)
        img = cgrt.render(scene, cam, cfg, bvh=accel)
        jax.block_until_ready(img)
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            img = cgrt.render(scene, cam, cfg, bvh=accel)
            jax.block_until_ready(img)
            ts.append(time.perf_counter() - t0)
        ms = float(np.median(ts)) * 1e3
        print(json.dumps({"scene": name, "tris": scene.num_triangles,
                          "accel": type(accel).__name__, "ms": round(ms, 2),
                          "mean_brightness": round(float(np.asarray(img).mean()), 6),
                          "speedup_vs_reference": round(ref_ms / ms, 2)}),
              flush=True)


if __name__ == "__main__":
    main()
