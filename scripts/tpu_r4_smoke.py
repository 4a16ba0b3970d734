"""Round-4 TPU smoke: compile + correctness of the new paths on the real chip
BEFORE the long measurement batch (a Mosaic legalization failure here costs
minutes; mid-batch it costs the batch).

  shade   pregathered shade kernel: monkey 128^2 fwd+bwd two-phase+kernel,
          image + material/vertex grads vs the one-phase XLA chain.
  hbm4    HBM-streaming 4-wide kernel: donut 128^2 forward, image parity vs
          the binary HBM kernel (bitwise-identical expected up to tie-breaks).

Usage: python scripts/tpu_r4_smoke.py [shade|hbm4 ...]
"""
import json
import os
import sys
import time

RESULTS = os.path.join(os.path.dirname(__file__), "r4_results.jsonl")


def log(**rec):
    rec = {"stage": "smoke", **rec}
    with open(RESULTS, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def stage_shade():
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    import cg_raytracer_tpu as cgrt
    from cg_raytracer_tpu.models.whitted import build_accel, make_backend, \
        render_image
    from cg_raytracer_tpu.optim.inverse import (apply_material_params,
                                                material_params)

    scene = cgrt.load_scene("monkey")
    cam = cgrt.Camera.default()
    key = jax.random.PRNGKey(0)
    cfg0 = cgrt.RenderConfig(width=128, height=128, backend="pallas",
                             grad_two_phase="off", shade_kernel="off")
    cfgk = dataclasses.replace(cfg0, grad_two_phase="on", shade_kernel="on")
    bvh = build_accel(scene, cfg0)
    params = material_params(scene)
    params["vertices"] = scene.vertices

    def loss(params_, cfg):
        s = apply_material_params(scene, params_)
        s = dataclasses.replace(s, vertices=params_["vertices"])
        be = make_backend(s, cfg, bvh=bvh)
        img = render_image(s, cam, cfg, backend=be, key=key)
        return jnp.mean(img), img

    f0 = jax.jit(jax.value_and_grad(lambda p: loss(p, cfg0), has_aux=True))
    fk = jax.jit(jax.value_and_grad(lambda p: loss(p, cfgk), has_aux=True))
    (l0, img0), g0 = f0(params)
    (lk, imgk), gk = fk(params)
    img_d = float(jnp.abs(img0 - imgk).max())
    rows = {}
    for k in params:
        a, b = np.asarray(g0[k]), np.asarray(gk[k])
        denom = max(1e-12, float(np.abs(a).max()))
        rows[k] = round(float(np.abs(a - b).max()) / denom, 6)
    log(what="shade", loss0=float(l0), lossk=float(lk), img_max_d=img_d,
        grad_rel_d=rows)


def stage_hbm4():
    import numpy as np

    import cg_raytracer_tpu as cgrt
    from cg_raytracer_tpu.models.whitted import render_image
    from cg_raytracer_tpu.ops.pallas_bvh import build_hbm_bvh
    from cg_raytracer_tpu.ops.pallas_bvh4 import build_hbm_bvh4

    scene = cgrt.load_scene("donut")
    cam = cgrt.Camera.default()
    cfg = cgrt.RenderConfig(width=128, height=128, backend="pallas",
                            forward_only=True)
    _, h2 = build_hbm_bvh(scene)
    t0 = time.time()
    _, h4 = build_hbm_bvh4(scene)
    build_s = time.time() - t0
    img2 = np.asarray(render_image(scene, cam, cfg, bvh=h2))
    img4 = np.asarray(render_image(scene, cam, cfg, bvh=h4))
    bad = float((np.abs(img2 - img4).max(-1) > 1e-3).mean())
    log(what="hbm4", leaf_rows=h4.leaf_rows, n4=int(h4.num_nodes),
        build_s=round(build_s, 1), frac_pixels_diff=bad)


STAGES = {"shade": stage_shade, "hbm4": stage_hbm4}


def main():
    from cg_raytracer_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    for name in (sys.argv[1:] or list(STAGES)):
        t0 = time.time()
        log(what=f"{name} START")
        try:
            STAGES[name]()
            log(what=f"{name} DONE", wall_s=round(time.time() - t0, 1))
        except Exception as e:
            log(what=f"{name} ERROR", error=repr(e)[:500])


if __name__ == "__main__":
    main()
