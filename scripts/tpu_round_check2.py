#!/usr/bin/env python
"""Round-closing TPU batch, take 2: donut via auto routing (HBM kernel + fused
bounce) and the headline bench with the frames-per-call methodology."""
import json
import time

import jax
import numpy as np


def main():
    from cg_raytracer_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import cg_raytracer_tpu as cgrt
    from cg_raytracer_tpu.utils.bench import run_bench

    cam = cgrt.Camera.default()
    scene = cgrt.load_scene("donut")
    cfg = cgrt.RenderConfig(width=800, height=800)
    assert cfg.resolve_backend(scene.num_triangles) == "pallas"
    img = cgrt.render(scene, cam, cfg)
    jax.block_until_ready(img)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        img = cgrt.render(scene, cam, cfg)
        jax.block_until_ready(img)
        ts.append(time.perf_counter() - t0)
    ms = sorted(ts)[1] * 1e3
    print(json.dumps({"scene": "donut", "tris": scene.num_triangles,
                      "ms": round(ms, 2),
                      "mean_brightness": round(float(np.asarray(img).mean()), 6),
                      "speedup_vs_reference": round(6500.0 / ms, 2)}), flush=True)

    result = run_bench(scene="cornell_box", width=1024, height=1024,
                       include_bwd=True, iters=3)
    print(json.dumps({"metric": result["metric"], "value": result["value"],
                      "unit": result["unit"],
                      "vs_baseline": result["vs_baseline"]}), flush=True)


if __name__ == "__main__":
    main()
