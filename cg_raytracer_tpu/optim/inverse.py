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

from ..parallel.sharding import make_train_step
from ..scene.types import Camera, PointLights, Scene
from ..utils.config import RenderConfig


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
):
    """Run the inverse-rendering loop; returns (params, losses)."""
    if params is None:
        params = material_params(scene)
    if key is None:
        key = jax.random.PRNGKey(0)
    target = jnp.asarray(target, jnp.float32)

    optimizer = optax.adam(learning_rate)
    opt_state = optimizer.init(params)
    # Host-built BVH over the *initial* geometry; fine for material/light
    # optimization (the oracle only depends on geometry).  For vertex optimization
    # use backend='brute' so the acceleration structure never goes stale.
    from ..models.whitted import build_accel, needs_bvh

    bvh = build_accel(scene, cfg) if needs_bvh(cfg, scene.num_triangles) else None
    step_fn = make_train_step(cfg, optimizer, apply_params, mesh=mesh, bvh=bvh)

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

        for i in range(start, steps):
            t0 = _time.perf_counter()
            params, opt_state, loss = step_fn(
                params, opt_state, scene, camera, target, jax.random.fold_in(key, i)
            )
            loss_f = float(loss)
            losses.append(loss_f)
            if logger:
                grad_norm = float(
                    jnp.sqrt(sum(jnp.sum(jnp.square(p)) for p in jax.tree.leaves(params)))
                )
                logger.log(step=i, loss=loss_f, param_norm=grad_norm,
                           step_seconds=_time.perf_counter() - t0,
                           rays_per_s=cfg.width * cfg.height / max(_time.perf_counter() - t0, 1e-9))
            if log_every and (i % log_every == 0 or i == steps - 1):
                log_fn(f"step {i}: loss {loss_f:.6e}")
            if checkpoint_path and checkpoint_every and (i + 1) % checkpoint_every == 0:
                save_checkpoint(checkpoint_path, i + 1, params, opt_state)
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
