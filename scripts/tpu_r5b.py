"""Round-5 sweep B (real chip; appends to scripts/r5_results.jsonl).

Stages:
  invrend  flagship end-to-end inverse-rendering run on TPU (VERDICT r4
           item 7): optimize monkey materials + VERTICES against a target
           render for K steps under the full-gradient contract, recording
           the loss curve + ms/step to scripts/invrend_curve.jsonl.
           The capability anchor is the reference's hand-driven light
           editor (/root/reference/src/main.cpp:812-876) — here the editor
           is gradient descent.
  effects  AA / bloom / motion-blur cost factors on TPU (VERDICT item 8)
           vs the reference's 4x / one-pass / 16x (report.pdf §7):
           cornell_box 800^2 fwd steady with each effect toggled.

Usage: python scripts/tpu_r5b.py [stage ...]
"""
import json
import os
import sys
import time

RESULTS = os.path.join(os.path.dirname(__file__), "r5_results.jsonl")
CURVE = os.path.join(os.path.dirname(__file__), "invrend_curve.jsonl")


def log(**rec):
    with open(RESULTS, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def stage_invrend():
    import dataclasses

    import numpy as np

    import jax
    import jax.numpy as jnp

    import cg_raytracer_tpu as cgrt
    from cg_raytracer_tpu.optim.inverse import (apply_material_params,
                                                material_params, optimize)

    scene = cgrt.load_scene("monkey")
    cam = cgrt.Camera.default()
    cfg = cgrt.RenderConfig(width=512, height=512, backend="pallas")

    # Target: the true scene.  Start: materials perturbed + vertices noised.
    target = cgrt.render(scene, cam, cfg)
    rng = np.random.default_rng(0)
    mats0 = dataclasses.replace(
        scene.materials,
        kd=jnp.clip(scene.materials.kd * 0.4 + 0.3, 0.0, 1.0),
        ks=scene.materials.ks * 0.5,
    )
    v0 = jnp.asarray(
        np.asarray(scene.vertices)
        + rng.normal(scale=1e-3, size=scene.vertices.shape).astype(np.float32))
    start = dataclasses.replace(scene, materials=mats0, vertices=v0)

    def params_fn(s):
        p = material_params(s)
        p["vertices"] = s.vertices
        return p

    def apply_fn(s, p):
        s = apply_material_params(s, p)
        return dataclasses.replace(s, vertices=p["vertices"])

    # Adam moves every param ~learning_rate per step regardless of grad
    # scale, and vertices live at ~1e-3 perturbation scale — keep the rate
    # below that or the geometry overshoots (the first flight diverged at
    # 5e-3).
    steps = 240
    t0 = time.perf_counter()
    params, losses = optimize(
        start, cam, target, cfg, steps=steps, learning_rate=3e-4,
        params=params_fn(start), apply_params=apply_fn,
        log_jsonl=CURVE, log_every=20, steps_per_call=8)
    wall = time.perf_counter() - t0
    log(stage="invrend", steps=steps, wall_s=round(wall, 2),
        ms_per_step=round(wall / steps * 1e3, 2),
        loss_first=round(float(losses[0]), 6),
        loss_last=round(float(losses[-1]), 6),
        loss_ratio=round(float(losses[-1] / max(losses[0], 1e-12)), 4))


def stage_effects():
    from cg_raytracer_tpu.utils.bench import run_bench

    def fwd(ov, frames=4):
        r = run_bench("cornell_box", 800, 800, include_bwd=False, iters=3,
                      frames_per_call=frames, cfg_overrides=ov)
        return round(r["seconds_per_frame"] * 1e3, 2)

    base = fwd({})
    log(stage="effects", what="base", ms=base)
    aa = fwd({"anti_aliasing": True})
    log(stage="effects", what="aa", ms=aa,
        factor=round(aa / base, 2), reference_factor=4.0)
    bloom = fwd({"bloom": True})
    log(stage="effects", what="bloom", ms=bloom,
        factor=round(bloom / base, 2), reference_factor="one extra pass")
    # Motion blur scans 16 full renders; drop frames_per_call so the
    # per-dispatch amortization stays comparable per FRAME.
    blur = fwd({"motion_blur": True}, frames=1)
    base1 = fwd({}, frames=1)
    log(stage="effects", what="motion_blur", ms=blur, base_f1=base1,
        factor=round(blur / base1, 2), reference_factor=16.0)


STAGES = {"invrend": stage_invrend, "effects": stage_effects}


def main():
    from cg_raytracer_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    for name in (sys.argv[1:] or list(STAGES)):
        print(f"=== stage {name} ===", flush=True)
        t0 = time.perf_counter()
        try:
            STAGES[name]()
        except Exception as e:
            log(stage=name, fatal=repr(e)[:500])
        print(f"=== {name} done in {time.perf_counter() - t0:.1f}s ===",
              flush=True)


if __name__ == "__main__":
    main()
