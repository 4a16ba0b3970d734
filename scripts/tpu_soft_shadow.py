"""On-TPU validation + timing for the in-kernel soft-shadow sampler.

Runs (one process, batched — compiles are the dominant cost through the
remote-compile tunnel):
1. cornell_box_spherical_light 800x800 render with the Pallas soft-shadow
   kernel ON vs OFF (XLA chunked scan): statistical agreement (the streams
   differ by design, so compare image means / per-pixel deltas against the
   200-sample binomial noise floor).
2. Determinism: kernel-ON render twice with the same key -> bitwise equal.
3. Steady-state timing of the kernel-ON path (frames-per-call scan), to set
   against the recorded 426 ms/frame XLA-path number (BENCH_NOTES.md).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import cg_raytracer_tpu as cgrt
from cg_raytracer_tpu.utils.bench import run_bench
from cg_raytracer_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

SCENE = "cornell_box_spherical_light"
W = H = 800


def log(**kw):
    print(json.dumps(kw), flush=True)


log(stage="start", device=str(jax.devices()[0]))

scene = cgrt.load_scene(SCENE)
cam = cgrt.Camera.default(aspect=W / H)
cfg_off = cgrt.RenderConfig(width=W, height=H, soft_shadow_kernel="off")
cfg_on = cgrt.RenderConfig(width=W, height=H, soft_shadow_kernel="on")
key = jax.random.PRNGKey(0)

t0 = time.perf_counter()
img_off = np.asarray(jax.block_until_ready(cgrt.render(scene, cam, cfg_off, key=key)))
log(stage="render_off", secs=round(time.perf_counter() - t0, 1),
    mean=float(img_off.mean()))

t0 = time.perf_counter()
img_on = np.asarray(jax.block_until_ready(cgrt.render(scene, cam, cfg_on, key=key)))
log(stage="render_on", secs=round(time.perf_counter() - t0, 1),
    mean=float(img_on.mean()))

# --- statistical agreement ----------------------------------------------
diff = np.abs(img_on - img_off).max(axis=-1)
# Penumbra-noise floor: visibility fraction sigma <= sqrt(.25/200) ~= 0.035;
# shaded contribution scales that by (diffuse+specular) <= O(1).
log(stage="agreement",
    mean_img_on=float(img_on.mean()), mean_img_off=float(img_off.mean()),
    mean_abs_diff=float(np.abs(img_on - img_off).mean()),
    p99_diff=float(np.percentile(diff, 99)), max_diff=float(diff.max()),
    frac_above_0p15=float((diff > 0.15).mean()))

# --- determinism ----------------------------------------------------------
img_on2 = np.asarray(jax.block_until_ready(cgrt.render(scene, cam, cfg_on, key=key)))
log(stage="determinism", bitwise_equal=bool((img_on == img_on2).all()))

# key sensitivity: a different key must give a different penumbra
img_on3 = np.asarray(jax.block_until_ready(
    cgrt.render(scene, cam, cfg_on, key=jax.random.PRNGKey(123))))
log(stage="key_sensitivity", differs=bool((img_on != img_on3).any()),
    mean_abs_diff=float(np.abs(img_on - img_on3).mean()))

# --- steady-state timing --------------------------------------------------
r = run_bench(scene=SCENE, width=W, height=H, include_bwd=False,
              frames_per_call=4, iters=3,
              cfg_overrides={"soft_shadow_kernel": "on"})
log(stage="steady_on", ms_per_frame=round(r["seconds_per_frame"] * 1e3, 1),
    rays_per_s=r["value"], vs_baseline=r["vs_baseline"])

log(stage="done")
