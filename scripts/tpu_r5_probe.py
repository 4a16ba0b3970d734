"""Probe: which param group diverges in the TPU inverse-rendering run."""
import dataclasses, json, time
import numpy as np
import jax, jax.numpy as jnp
import cg_raytracer_tpu as cgrt
from cg_raytracer_tpu.optim.inverse import (apply_material_params,
                                            material_params, optimize)
from cg_raytracer_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()
scene = cgrt.load_scene("monkey")
cam = cgrt.Camera.default()
cfg = cgrt.RenderConfig(width=256, height=256, backend="pallas")
target = cgrt.render(scene, cam, cfg)
rng = np.random.default_rng(0)
mats0 = dataclasses.replace(
    scene.materials,
    kd=jnp.clip(scene.materials.kd * 0.4 + 0.3, 0.0, 1.0),
    ks=scene.materials.ks * 0.5)
v0 = jnp.asarray(np.asarray(scene.vertices)
                 + rng.normal(scale=1e-3, size=scene.vertices.shape).astype(np.float32))

def run(tag, start, params, apply_fn, lr, steps=24):
    p, losses = optimize(start, cam, target, cfg, steps=steps, learning_rate=lr,
                         params=params, apply_params=apply_fn, log_every=0,
                         steps_per_call=8)
    print(json.dumps({"tag": tag, "first": float(losses[0]),
                      "mid": float(losses[len(losses)//2]),
                      "last": float(losses[-1])}), flush=True)

# materials only, materials start perturbed
s_m = dataclasses.replace(scene, materials=mats0)
run("materials_only", s_m, material_params(s_m), apply_material_params, 3e-4)

# vertices only, vertices perturbed
s_v = dataclasses.replace(scene, vertices=v0)
run("vertices_only", s_v, {"vertices": s_v.vertices},
    lambda s, p: dataclasses.replace(s, vertices=p["vertices"]), 3e-4)

# vertices only with one-phase gradients (bypass two-phase+kernel)
cfg = dataclasses.replace(cfg, grad_two_phase="off", shade_kernel="off")
target = cgrt.render(scene, cam, cfg)
run("vertices_one_phase", s_v, {"vertices": s_v.vertices},
    lambda s, p: dataclasses.replace(s, vertices=p["vertices"]), 3e-4)
