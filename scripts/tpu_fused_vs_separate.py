#!/usr/bin/env python
"""A/B the fused BVH bounce kernel vs separate closest+any-hit dispatches on TPU.

The fused kernel replaces 1 + num_lights dispatches with one kernel containing
1 + num_lights sequential traversals.  This measures whether that actually wins
(HBM round-trip savings) or loses (instruction/register pressure) per scene.
Also retries the donut full render with the accel memo in place.
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def med_time(fn, *args, iters=5):
    jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def main():
    from cg_raytracer_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import cg_raytracer_tpu as cgrt
    from cg_raytracer_tpu.models.whitted import build_accel
    from cg_raytracer_tpu.ops import camera as cam_ops
    from cg_raytracer_tpu.ops.pallas_bvh import (bounce_pallas_bvh,
                                                 build_packed_bvh,
                                                 intersect_pallas_bvh,
                                                 occluded_pallas_bvh)

    cam = cgrt.Camera.default()

    for name in ("monkey", "teacup"):
        scene = cgrt.load_scene(name)
        _, packed = build_packed_bvh(scene)
        o, d = cam_ops.generate_rays(cam, 1024, 1024)
        L = scene.point_lights.position.shape[0]

        @jax.jit
        def separate(o, d):
            hit = intersect_pallas_bvh(scene, packed, o, d)
            t_hit = jnp.where(jnp.isfinite(hit.t), hit.t, 0.0)
            pos = o + t_hit[:, None] * d
            bits = jnp.zeros(o.shape[0], jnp.int32)
            for li in range(L):
                to_l = scene.point_lights.position[li] - pos
                dist = jnp.linalg.norm(to_l, axis=-1)
                ldir = to_l / jnp.maximum(dist, 1e-20)[:, None]
                blocked = occluded_pallas_bvh(
                    scene, packed, pos + 1e-3 * ldir, ldir, dist - 1e-3)
                bits = bits | (blocked.astype(jnp.int32) << li)
            return hit.t, hit.prim_id, bits

        @jax.jit
        def fused(o, d):
            hit, bits = bounce_pallas_bvh(scene, packed, o, d)
            return hit.t, hit.prim_id, bits

        t_sep = med_time(separate, o, d)
        t_fus = med_time(fused, o, d)
        # Sanity: same prim ids.
        ps = np.asarray(separate(o, d)[1])
        pf = np.asarray(fused(o, d)[1])
        print(json.dumps({"scene": name, "tris": scene.num_triangles,
                          "lights": L,
                          "separate_ms": round(t_sep * 1e3, 2),
                          "fused_ms": round(t_fus * 1e3, 2),
                          "fused_speedup": round(t_sep / t_fus, 3),
                          "prim_agree": float((ps == pf).mean())}), flush=True)

    # Donut full-render retry (accel memoized now; HBM kernel, no fused bounce).
    scene = cgrt.load_scene("donut")
    cfg = cgrt.RenderConfig(width=800, height=800, backend="pallas")
    accel = build_accel(scene, cfg)
    t = med_time(lambda: cgrt.render(scene, cam, cfg, bvh=accel), iters=5)
    print(json.dumps({"scene": "donut", "ms": round(t * 1e3, 2),
                      "speedup_vs_reference": round(6500.0 / (t * 1e3), 2)}),
          flush=True)


if __name__ == "__main__":
    main()
