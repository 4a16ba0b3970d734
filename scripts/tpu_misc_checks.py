#!/usr/bin/env python
"""Misc TPU validation: grad-vs-finite-difference on real hardware, and the
jnp while-loop BVH fault probe (does ray_chunk avoid the 320K-tri device
error?)."""
import json

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from cg_raytracer_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import cg_raytracer_tpu as cgrt

    cam = cgrt.Camera.default()

    # --- grad vs finite differences on TPU (tests run this on CPU only) ---
    scene = cgrt.load_scene("cornell_box")
    cfg = cgrt.RenderConfig(width=64, height=64)

    import dataclasses

    def loss(kd):
        mats = dataclasses.replace(scene.materials, kd=kd)
        s = dataclasses.replace(scene, materials=mats)
        return jnp.mean(cgrt.render(s, cam, cfg, jit=False))

    kd = scene.materials.kd
    g = jax.jit(jax.grad(loss))(kd)
    jax.block_until_ready(g)
    eps = 1e-3
    idx = (2, 1)
    e = jnp.zeros_like(kd).at[idx].set(eps)
    fd = (loss(kd + e) - loss(kd - e)) / (2 * eps)
    rel = abs(float(g[idx]) - float(fd)) / max(abs(float(fd)), 1e-12)
    print(json.dumps({"check": "tpu_grad_vs_fd", "grad": float(g[idx]),
                      "fd": float(fd), "rel_err": round(rel, 6)}), flush=True)

    # --- jnp bvh fault probe: 320K tris, chunked rays ---
    donut = cgrt.load_scene("donut")
    for chunk in (65536,):
        cfg2 = cgrt.RenderConfig(width=256, height=256, backend="bvh",
                                 ray_chunk=chunk)
        try:
            img = cgrt.render(donut, cam, cfg2)
            jax.block_until_ready(img)
            ok = bool(np.isfinite(np.asarray(img)).all())
            print(json.dumps({"check": "jnp_bvh_chunked", "rays": 256 * 256,
                              "ray_chunk": chunk, "ok": ok,
                              "mean": round(float(np.asarray(img).mean()), 6)}),
                  flush=True)
        except Exception as exc:  # device errors surface here
            print(json.dumps({"check": "jnp_bvh_chunked", "ray_chunk": chunk,
                              "error": str(exc)[:200]}), flush=True)


if __name__ == "__main__":
    main()
