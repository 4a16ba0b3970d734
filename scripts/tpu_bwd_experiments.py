#!/usr/bin/env python
"""Backward-pass experiments on the headline config (cornell 1024^2, fwd+bwd).

The backward adds ~68% over forward (BENCH_NOTES).  For a memory-bound
workload, rematerialization can beat reading stored activations back from HBM.
Times three variants of the train step, 8 scanned frames per dispatch:
  base    — value_and_grad of the plain render loss
  remat   — render_image wrapped in jax.checkpoint (recompute in the bwd)
  remat_dots — checkpoint with the dots-saveable policy (keeps matmul outputs)
"""
import json
import time

import jax
import jax.numpy as jnp


def med_time(fn, *args, iters=3):
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
    from cg_raytracer_tpu.models.whitted import make_backend, render_image
    from cg_raytracer_tpu.optim.inverse import (apply_material_params,
                                                material_params)

    scene = cgrt.load_scene("cornell_box")
    cfg = cgrt.RenderConfig(width=1024, height=1024)
    camera = cgrt.Camera.default(aspect=1.0)
    params = material_params(scene)
    keys = jax.random.split(jax.random.PRNGKey(0), 8)

    def render_fn(params_, key_):
        scn = apply_material_params(scene, params_)
        be = make_backend(scn, cfg)
        return render_image(scn, camera, cfg, backend=be, key=key_)

    def make_steps(wrap):
        def loss(params_, key_):
            return jnp.mean(wrap(render_fn)(params_, key_))

        @jax.jit
        def steps(params_, keys_):
            def one(c, k):
                l, g = jax.value_and_grad(loss)(params_, k)
                return c + l, g

            return jax.lax.scan(one, jnp.float32(0.0), keys_)

        return steps

    variants = {
        "base": lambda f: f,
        "remat": jax.checkpoint,
        "remat_dots": lambda f: jax.checkpoint(
            f, policy=jax.checkpoint_policies.dots_saveable),
    }
    for name, wrap in variants.items():
        t = med_time(make_steps(wrap), params, keys) / 8
        print(json.dumps({"variant": name, "ms_per_frame": round(t * 1e3, 2),
                          "rays_per_s": round(1024 * 1024 / t)}), flush=True)


if __name__ == "__main__":
    main()
