"""Forward-only trace megakernel vs the jnp bounce loop (VERDICT r1 item 5).

The kernel (ops/pallas_kernels.py::trace_pallas) re-implements the whole
trace_rays + reconstruct_hit + direct_point_lights pipeline in-register; these
tests pin it to the jnp path in interpret mode (bit-compatible kernels on CPU,
CLAUDE.md) with a tolerance for edge-pixel tie-breaks per the oracle contract.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cg_raytracer_tpu import Camera, RenderConfig, load_scene, render
from cg_raytracer_tpu.models.whitted import make_backend
from cg_raytracer_tpu.ops.pallas_kernels import (supports_trace_kernel,
                                                 trace_pallas)


def _compare(scene_name, quirks=False, size=48):
    scn = load_scene(scene_name)
    assert supports_trace_kernel(scn)
    cam = Camera.default(aspect=1.0)
    base_cfg = RenderConfig(width=size, height=size, backend="pallas",
                            reference_quirks=quirks)
    ref = render(scn, cam, base_cfg)
    fwd = render(scn, cam, dataclasses.replace(base_cfg, forward_only=True))
    diff = np.abs(np.asarray(ref) - np.asarray(fwd)).max(axis=-1)
    # Same oracle contract as cross-backend tests: tie-breaks on coincident-t
    # edges may differ on <0.5% of pixels; everything else matches tightly.
    frac_off = float((diff > 1e-4).mean())
    assert frac_off < 0.005, f"{frac_off:.4%} pixels differ"
    return ref, fwd


def test_trace_kernel_matches_jnp_cornell():
    _compare("cornell_box")


def test_trace_kernel_matches_jnp_cornell_quirks():
    # reference_quirks flips the reflection continue-test to ks.z only; the
    # kernel takes the same static flag.
    _compare("cornell_box", quirks=True)


def test_trace_kernel_matches_jnp_two_lights():
    # 'cube' preset carries two point lights -> exercises the per-light loop.
    scn = load_scene("cube")
    if not supports_trace_kernel(scn):
        pytest.skip("cube preset not kernel-eligible")
    _compare("cube")


def test_trace_kernel_depth_one():
    scn = load_scene("cornell_box")
    cam = Camera.default(aspect=1.0)
    cfg = RenderConfig(width=32, height=32, backend="pallas", max_depth=1)
    ref = render(scn, cam, cfg)
    fwd = render(scn, cam, dataclasses.replace(cfg, forward_only=True))
    diff = np.abs(np.asarray(ref) - np.asarray(fwd)).max(axis=-1)
    assert float((diff > 1e-4).mean()) < 0.005


def test_forward_only_backend_exposes_trace():
    scn = load_scene("cornell_box")
    cfg = RenderConfig(backend="pallas", forward_only=True)
    assert make_backend(scn, cfg).trace is not None
    assert make_backend(scn, dataclasses.replace(cfg, forward_only=False)).trace is None


def test_forward_only_grad_raises():
    # The guard must fail loudly, not silently return zero grads.
    scn = load_scene("cornell_box")
    cam = Camera.default(aspect=1.0)
    cfg = RenderConfig(width=8, height=8, backend="pallas", forward_only=True)

    def loss(kd):
        mats = dataclasses.replace(scn.materials, kd=kd)
        scn2 = dataclasses.replace(scn, materials=mats)
        return jnp.mean(render(scn2, cam, cfg, jit=False))

    with pytest.raises(NotImplementedError, match="forward_only"):
        jax.grad(loss)(scn.materials.kd)


def test_trace_kernel_ineligible_scenes():
    # Spherical-light scenes keep the sampler path.
    assert not supports_trace_kernel(load_scene("cornell_box_spherical_light"))


def test_trace_kernel_matches_jnp_spheres():
    # All-sphere scene: in-kernel quadric intersection + geometric normals.
    scn = load_scene("spheres")
    assert supports_trace_kernel(scn)
    _compare("spheres")


def test_trace_kernel_matches_jnp_mixed_tris_and_spheres():
    # Mixed triangle + sphere scene (no preset has one): cube mesh + two
    # spheres, one of which shadows the other — exercises the sphere branch
    # of the closest sweep, the attribute merge, and sphere occlusion.
    import jax.numpy as jnp

    from cg_raytracer_tpu.scene.loader import load_obj
    from cg_raytracer_tpu.scene.presets import default_data_dir
    from cg_raytracer_tpu.scene.types import PointLights, Spheres, make_scene
    import os

    meshes = load_obj(os.path.join(default_data_dir(), "cube.obj"))
    spheres = Spheres(
        center=jnp.asarray([[1.5, 0.5, 0.0], [-1.5, -0.5, 0.5]], jnp.float32),
        radius=jnp.asarray([0.5, 0.4], jnp.float32),
        kd=jnp.asarray([[0.8, 0.1, 0.1], [0.1, 0.1, 0.8]], jnp.float32),
        ks=jnp.asarray([[0.2, 0.2, 0.2], [0.0, 0.0, 0.0]], jnp.float32),
        shininess=jnp.asarray([8.0, 1.0], jnp.float32),
    )
    scn = make_scene(meshes, spheres=spheres,
                     point_lights=PointLights.of(((-1, 1, -1), (1.0, 1.0, 1.0))))
    assert supports_trace_kernel(scn)
    cam = Camera.default(aspect=1.0)
    cfg = RenderConfig(width=48, height=48, backend="pallas")
    ref = render(scn, cam, cfg)
    fwd = render(scn, cam, dataclasses.replace(cfg, forward_only=True))
    diff = np.abs(np.asarray(ref) - np.asarray(fwd)).max(axis=-1)
    assert float((diff > 1e-4).mean()) < 0.005
    # The spheres must actually appear in the kernel render.
    assert np.asarray(fwd)[..., 0].max() > 0.05
