"""Round-4 sweep E: donut HBM4 leaf_rows=1 probe (narrower leaves = less DMA
per leaf; the auto builder stops at 2 because leaf-1's node table exceeds the
6 MB budget — this probes whether paying ~8 MB of VMEM wins).

Usage: python scripts/tpu_r4e.py
"""
import json
import os

RESULTS = os.path.join(os.path.dirname(__file__), "r4_results.jsonl")


def log(**rec):
    with open(RESULTS, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def main():
    from cg_raytracer_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import dataclasses

    import jax
    import jax.numpy as jnp

    import cg_raytracer_tpu as cgrt
    from cg_raytracer_tpu.models.whitted import render_image
    from cg_raytracer_tpu.ops.pallas_bvh4 import build_hbm_bvh4
    from cg_raytracer_tpu.utils.bench import time_fn

    scene = cgrt.load_scene("donut")
    cam = cgrt.Camera.default()
    cfg = cgrt.RenderConfig(width=800, height=800, backend="pallas",
                            forward_only=True, bvh_wide_hbm="4")
    try:
        _, h1 = build_hbm_bvh4(scene, leaf_rows=1)
        log(stage="donut3", what="leaf1_build", n4=int(h1.num_nodes),
            node_mb=round(h1.num_nodes * 512 / 1e6, 2))

        @jax.jit
        def f(keys):
            def one(c, k):
                eps = jax.random.uniform(k, (3,), jnp.float32, -1e-4, 1e-4)
                cam2 = dataclasses.replace(cam, look_at=cam.look_at + eps)
                return c + jnp.mean(render_image(scene, cam2, cfg, bvh=h1)), None

            return jax.lax.scan(one, jnp.float32(0), keys)[0]

        keys = jax.random.split(jax.random.PRNGKey(0), 4)
        ms = time_fn(f, keys, iters=3) / 4 * 1e3
        log(stage="donut3", what="hbm4/il2/rows32/leaf1", ms=round(ms, 2))
    except Exception as e:
        log(stage="donut3", error=repr(e)[:400])


if __name__ == "__main__":
    main()
