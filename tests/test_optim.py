"""Inverse-rendering loop: convergence + checkpoint/resume determinism."""
import dataclasses
import os

import jax
import numpy as np

import cg_raytracer_tpu as cgrt
from cg_raytracer_tpu.models.whitted import render_image
from cg_raytracer_tpu.optim.inverse import (apply_material_params,
                                            load_checkpoint, material_params,
                                            optimize, save_checkpoint)

CFG = cgrt.RenderConfig(width=24, height=24)


def test_optimize_recovers_kd(scenes):
    # Render a target with known kd, perturb, optimize back (BASELINE config 4 in
    # miniature).
    scene = scenes("cube")
    cam = cgrt.Camera.default()
    target = np.asarray(render_image(scene, cam, CFG, key=jax.random.PRNGKey(0)))

    import jax.numpy as jnp

    mats = dataclasses.replace(scene.materials,
                               kd=scene.materials.kd * 0.3 + 0.2)
    perturbed = dataclasses.replace(scene, materials=mats)
    params, losses = optimize(perturbed, cam, target, CFG, steps=60,
                              learning_rate=5e-2, log_every=0)
    assert losses[-1] < losses[0] * 0.15
    # Optimized render approaches the target.
    final = np.asarray(render_image(apply_material_params(perturbed, params), cam,
                                    CFG, key=jax.random.PRNGKey(0)))
    assert np.abs(final - target).mean() < 0.02


def test_checkpoint_roundtrip(tmp_path, scenes):
    import optax

    scene = scenes("cube")
    params = material_params(scene)
    opt_state = optax.adam(1e-2).init(params)
    path = str(tmp_path / "ckpt.npz")
    save_checkpoint(path, 17, params, opt_state)
    step, p2, o2 = load_checkpoint(path, params, opt_state)
    assert step == 17
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(opt_state), jax.tree.leaves(o2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_resume_is_deterministic(tmp_path, scenes):
    scene = scenes("cube")
    cam = cgrt.Camera.default()
    target = np.zeros((CFG.height, CFG.width, 3), np.float32)
    ck = str(tmp_path / "resume.npz")

    # Full run.
    p_full, _ = optimize(scene, cam, target, CFG, steps=8, log_every=0,
                         checkpoint_path=None)
    # Split run: 4 steps (checkpointed), then resume to 8.
    optimize(scene, cam, target, CFG, steps=4, log_every=0,
             checkpoint_path=ck, checkpoint_every=4, resume=False)
    p_resumed, _ = optimize(scene, cam, target, CFG, steps=8, log_every=0,
                            checkpoint_path=ck, checkpoint_every=100, resume=True)
    for a, b in zip(jax.tree.leaves(p_full), jax.tree.leaves(p_resumed)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_optimize_jsonl_logging(tmp_path, scenes):
    import json

    scene = scenes("cube")
    cam = cgrt.Camera.default()
    target = np.zeros((CFG.height, CFG.width, 3), np.float32)
    log = str(tmp_path / "steps.jsonl")
    optimize(scene, cam, target, CFG, steps=3, log_every=0, log_jsonl=log)
    lines = [json.loads(l) for l in open(log)]
    assert len(lines) == 3
    assert {"step", "loss", "step_seconds", "rays_per_s"} <= set(lines[0])
