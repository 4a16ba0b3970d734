"""Fused differentiable shade kernel (ops/pallas_shade.py): forward parity
with the XLA reconstruct+shade chain, and custom-VJP gradient parity for
materials, lights, and geometry tables.

Capability anchor: the shading math being differentiated is
/root/reference/src/main.cpp:61-135 over ray_tracing.cpp:94-106."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import cg_raytracer_tpu as cgrt
from cg_raytracer_tpu.models.whitted import make_backend, render_image
from cg_raytracer_tpu.ops import camera as cam_ops
from cg_raytracer_tpu.ops.intersect import reconstruct_hit
from cg_raytracer_tpu.ops.pallas_shade import (shade_fused_pallas,
                                               supports_shade_kernel)
from cg_raytracer_tpu.ops.shading import direct_point_lights
from cg_raytracer_tpu.optim.inverse import (apply_material_params,
                                            material_params)


@pytest.fixture(scope="module")
def cornell():
    return cgrt.load_scene("cornell_box")


@pytest.fixture(scope="module")
def records(cornell):
    cfg = cgrt.RenderConfig(width=24, height=24, backend="pallas")
    be = make_backend(cornell, cfg)
    o, d = cam_ops.generate_rays(cgrt.Camera.default(), 24, 24)
    hit, bits = be.bounce(o, d)
    return o, d, hit, bits


def test_supports_gate(cornell):
    assert supports_shade_kernel(cornell)
    assert not supports_shade_kernel(cgrt.load_scene("monkey"))  # 968 tris
    assert not supports_shade_kernel(cgrt.load_scene("spheres"))
    assert not supports_shade_kernel(
        cgrt.load_scene("cornell_box_spherical_light"))


def test_forward_matches_xla_chain(cornell, records):
    o, d, hit, bits = records
    direct_k, valid_k, ks_k, n_k, p_k = shade_fused_pallas(
        cornell, o, d, hit, bits, interpret=True)
    surf = reconstruct_hit(cornell, o, d, hit)
    direct_x = direct_point_lights(cornell, d, surf, None, shadow_bits=bits)
    np.testing.assert_allclose(np.asarray(direct_k), np.asarray(direct_x),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(valid_k), np.asarray(surf.valid))
    np.testing.assert_allclose(np.asarray(ks_k), np.asarray(surf.ks),
                               rtol=1e-6, atol=0)
    np.testing.assert_allclose(np.asarray(n_k), np.asarray(surf.normal),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(p_k), np.asarray(surf.position),
                               rtol=1e-5, atol=1e-6)


def test_grads_match_xla_chain(cornell, records):
    # d(loss)/d(kd, ks, shininess, light pos/color) through the kernel's
    # custom VJP vs the plain XLA chain.
    o, d, hit, bits = records
    params = material_params(cornell)

    def loss_kernel(params_):
        s = apply_material_params(cornell, params_)
        direct, valid, ks, _, _ = shade_fused_pallas(s, o, d, hit, bits,
                                                     interpret=True)
        w = jnp.linspace(0.2, 1.0, direct.shape[0])[:, None]
        return jnp.sum(direct * w * valid[:, None]) + jnp.sum(ks * w)

    def loss_xla(params_):
        s = apply_material_params(cornell, params_)
        surf = reconstruct_hit(s, o, d, hit)
        direct = direct_point_lights(s, d, surf, None, shadow_bits=bits)
        w = jnp.linspace(0.2, 1.0, direct.shape[0])[:, None]
        return jnp.sum(direct * w * surf.valid[:, None]) + jnp.sum(surf.ks * w)

    lk, gk = jax.value_and_grad(loss_kernel)(params)
    lx, gx = jax.value_and_grad(loss_xla)(params)
    np.testing.assert_allclose(float(lk), float(lx), rtol=1e-5)
    for k in params:
        np.testing.assert_allclose(np.asarray(gk[k]), np.asarray(gx[k]),
                                   rtol=2e-4, atol=1e-5, err_msg=k)


def test_vertex_grads_match_xla_chain(cornell, records):
    # Geometry grads flow through the tri/aux table packs: perturbing
    # vertices moves t/u/v/normals; the kernel VJP must agree with XLA.
    o, d, hit, bits = records

    def loss(vertices, fused):
        s = dataclasses.replace(cornell, vertices=vertices)
        if fused:
            direct, valid, ks, _, _ = shade_fused_pallas(s, o, d, hit, bits,
                                                         interpret=True)
        else:
            surf = reconstruct_hit(s, o, d, hit)
            direct = direct_point_lights(s, d, surf, None, shadow_bits=bits)
            valid = surf.valid
        return jnp.sum(direct * valid[:, None])

    gk = jax.grad(lambda v: loss(v, True))(cornell.vertices)
    gx = jax.grad(lambda v: loss(v, False))(cornell.vertices)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gx),
                               rtol=2e-4, atol=2e-5)


def test_end_to_end_two_phase_kernel_render_and_grads(cornell):
    # Full render path: two-phase + shade kernel vs the one-phase XLA chain.
    cam = cgrt.Camera.default()
    key = jax.random.PRNGKey(7)
    cfg_ref = cgrt.RenderConfig(width=24, height=24, backend="pallas",
                                grad_two_phase="off")
    cfg_k = dataclasses.replace(cfg_ref, grad_two_phase="on",
                                shade_kernel="on")
    params = material_params(cornell)

    def loss(params_, cfg):
        s = apply_material_params(cornell, params_)
        img = render_image(s, cam, cfg, key=key)
        return jnp.mean(img), img

    (l0, img0), g0 = jax.value_and_grad(
        lambda p: loss(p, cfg_ref), has_aux=True)(params)
    (l1, img1), g1 = jax.value_and_grad(
        lambda p: loss(p, cfg_k), has_aux=True)(params)
    np.testing.assert_allclose(np.asarray(img0), np.asarray(img1),
                               rtol=1e-5, atol=1e-6)
    for k in params:
        np.testing.assert_allclose(np.asarray(g0[k]), np.asarray(g1[k]),
                                   rtol=2e-4, atol=1e-5, err_msg=k)


@pytest.mark.parametrize("depth,quirks", [(3, False), (2, True)])
def test_record_trace_matches_one_phase_at_depth(cornell, depth, quirks):
    # The record-trace megakernel's per-level records (incl. in-kernel
    # reflection rays and the ks-comma quirk) must reproduce the one-phase
    # render at any depth.
    cam = cgrt.Camera.default()
    key = jax.random.PRNGKey(9)
    cfg_ref = cgrt.RenderConfig(width=24, height=24, backend="pallas",
                                max_depth=depth, reference_quirks=quirks,
                                grad_two_phase="off")
    cfg_k = dataclasses.replace(cfg_ref, grad_two_phase="on",
                                shade_kernel="on")
    img0 = np.asarray(render_image(cornell, cam, cfg_ref, key=key))
    img1 = np.asarray(render_image(cornell, cam, cfg_k, key=key))
    np.testing.assert_allclose(img0, img1, rtol=1e-5, atol=1e-6)


def test_bounce_refl_matches_bounce_plus_reconstruct(cornell, records):
    from cg_raytracer_tpu.ops.pallas_kernels import bounce_refl_pallas
    from cg_raytracer_tpu.ops.linalg import reflect, safe_normalize

    o, d, hit, bits = records
    h2, b2, pos, refl, rf = bounce_refl_pallas(cornell, o, d, interpret=True)
    np.testing.assert_array_equal(np.asarray(hit.prim_id),
                                  np.asarray(h2.prim_id))
    np.testing.assert_array_equal(np.asarray(bits), np.asarray(b2))
    surf = reconstruct_hit(cornell, o, d, hit)
    v = np.asarray(surf.valid)
    np.testing.assert_allclose(np.asarray(pos)[v], np.asarray(surf.position)[v],
                               rtol=1e-5, atol=1e-6)
    refl_x = safe_normalize(reflect(d, surf.normal))
    np.testing.assert_allclose(np.asarray(refl)[v], np.asarray(refl_x)[v],
                               rtol=1e-4, atol=1e-5)
    rf_x = v & (np.asarray(surf.ks) > 0.01).any(-1)
    np.testing.assert_array_equal(np.asarray(rf), rf_x)
