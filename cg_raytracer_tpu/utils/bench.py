"""Benchmark harness.

Reference baseline: report.pdf Table 2 (BASELINE.md) — Cornell box point-light
800x800 in 168 ms => ~3.8 M primary rays/s on a 2020 CPU.  The north-star metric
(BASELINE.json) is primary rays/s/chip for a *forward+backward* Cornell render at
1024^2; ``vs_baseline`` divides by the reference's forward-only 3.8e6.
"""
from __future__ import annotations

import time
from typing import Optional

import jax
import jax.numpy as jnp

BASELINE_RAYS_PER_S = 3.8e6  # Cornell/point, report.pdf Table 2 (BASELINE.md)


def time_fn(fn, *args, iters: int = 5, warmup: int = 2):
    """Median steady-state wall time (median, not min: the async dispatch path has
    produced spuriously tiny outliers through the remote-device tunnel)."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


def run_bench(scene: str = "cornell_box", width: int = 1024, height: int = 1024,
              backend: str = "auto", include_bwd: bool = True, iters: int = 5,
              max_depth: int = 2, data_dir: Optional[str] = None) -> dict:
    from .. import Camera, RenderConfig, load_scene
    from ..models.whitted import build_accel, make_backend, needs_bvh, render_image
    from ..optim.inverse import apply_material_params, material_params

    import dataclasses

    from ..models.whitted import effective_max_depth

    scn = load_scene(scene, data_dir=data_dir)
    cfg = RenderConfig(width=width, height=height, max_depth=max_depth,
                       backend=backend)
    cfg = dataclasses.replace(cfg, max_depth=effective_max_depth(scn, cfg))
    camera = Camera.default(aspect=width / height)
    key = jax.random.PRNGKey(0)
    bvh = build_accel(scn, cfg) if needs_bvh(cfg, scn.num_triangles) else None

    if include_bwd:
        params = material_params(scn)

        def loss_fn(params_, scn_, cam_, key_):
            scn_p = apply_material_params(scn_, params_)
            be = make_backend(scn_p, cfg, bvh=bvh)
            img = render_image(scn_p, cam_, cfg, backend=be, key=key_)
            return jnp.mean(img)

        grad_fn = jax.jit(jax.value_and_grad(loss_fn))
        best = time_fn(grad_fn, params, scn, camera, key, iters=iters)
        mode = "fwd+bwd"
    else:
        def fwd(scn_, cam_, key_):
            be = make_backend(scn_, cfg, bvh=bvh)
            return render_image(scn_, cam_, cfg, backend=be, key=key_)

        fwd_j = jax.jit(fwd)
        best = time_fn(fwd_j, scn, camera, key, iters=iters)
        mode = "fwd"

    rays = width * height
    rays_per_s = rays / best
    return {
        "metric": f"primary rays/s/chip {mode} ({scene} {width}x{height}, "
                  f"{scn.num_triangles} tris)",
        "value": rays_per_s,
        "unit": "rays/s",
        "vs_baseline": rays_per_s / BASELINE_RAYS_PER_S,
        "seconds_per_frame": best,
        "device": str(jax.devices()[0]),
    }
