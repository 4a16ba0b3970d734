"""Pallas kernel tests (interpret mode on CPU; compiled path exercised on TPU)."""
import dataclasses

import jax.numpy as jnp
import numpy as np

import cg_raytracer_tpu as cgrt
from cg_raytracer_tpu.ops import camera as cam_ops
from cg_raytracer_tpu.ops.intersect import intersect_brute, occluded_brute
from cg_raytracer_tpu.ops.pallas_kernels import (RAY_TILE, intersect_pallas,
                                                 occluded_pallas)
from tests.conftest import assert_images_close


def test_closest_matches_brute(scenes):
    scene = scenes("cornell_box")
    cam = cgrt.Camera.default()
    o, d = cam_ops.generate_rays(cam, 40, 40)  # 1600 rays: exercises tile padding
    hb = intersect_brute(scene, o, d)
    hp = intersect_pallas(scene, o, d, interpret=True)
    tb = np.where(np.isinf(np.asarray(hb.t)), 1e9, np.asarray(hb.t))
    tp = np.where(np.isinf(np.asarray(hp.t)), 1e9, np.asarray(hp.t))
    assert np.isclose(tb, tp, atol=1e-5).all()
    assert (np.asarray(hb.prim_id) == np.asarray(hp.prim_id)).all()
    np.testing.assert_allclose(np.asarray(hb.u), np.asarray(hp.u), atol=1e-5)


def test_anyhit_matches_brute(scenes):
    scene = scenes("cornell_box")
    cam = cgrt.Camera.default()
    o, d = cam_ops.generate_rays(cam, 40, 40)
    tm = jnp.full((o.shape[0],), 2.0, jnp.float32)
    bb = np.asarray(occluded_brute(scene, o, d, tm))
    bp = np.asarray(occluded_pallas(scene, o, d, tm, interpret=True))
    assert (bb == bp).all()


def test_t_max_bound():
    scene = cgrt.load_scene("cornell_box")
    cam = cgrt.Camera.default()
    o, d = cam_ops.generate_rays(cam, 16, 16)
    # Tight bound rejects everything.
    hp = intersect_pallas(scene, o, d, t_max=jnp.full((256,), 1e-3), interpret=True)
    assert (np.asarray(hp.prim_id) == -1).all()


def test_odd_batch_padding():
    # Batch far from a RAY_TILE multiple.
    scene = cgrt.load_scene("cornell_box")
    cam = cgrt.Camera.default()
    o, d = cam_ops.generate_rays(cam, 7, 13)  # 91 rays
    assert o.shape[0] < RAY_TILE
    hb = intersect_brute(scene, o, d)
    hp = intersect_pallas(scene, o, d, interpret=True)
    assert (np.asarray(hb.prim_id) == np.asarray(hp.prim_id)).all()


def test_full_render_pallas_backend(scenes):
    scene = scenes("cornell_box")
    cfg = cgrt.RenderConfig(width=40, height=40, backend="brute")
    cfg_p = dataclasses.replace(cfg, backend="pallas")
    brute = np.asarray(cgrt.render(scene, cgrt.Camera.default(), cfg))
    pallas = np.asarray(cgrt.render(scene, cgrt.Camera.default(), cfg_p))
    assert_images_close(brute, pallas, msg="pallas vs brute render")


def test_spheres_tail(scenes):
    # Sphere handling lives outside the kernel; combined scene must still work.
    scene = scenes("spheres")
    cam = cgrt.Camera.default()
    o, d = cam_ops.generate_rays(cam, 16, 16)
    hb = intersect_brute(scene, o, d)
    hp = intersect_pallas(scene, o, d, interpret=True)
    assert (np.asarray(hb.prim_id) == np.asarray(hp.prim_id)).all()


def test_pallas_bvh_matches_brute(scenes):
    from cg_raytracer_tpu.ops.pallas_bvh import (build_packed_bvh,
                                                 intersect_pallas_bvh,
                                                 occluded_pallas_bvh)

    scene = scenes("monkey")
    _, bvh = build_packed_bvh(scene)
    cam = cgrt.Camera.default()
    o, d = cam_ops.generate_rays(cam, 32, 32)
    hb = intersect_brute(scene, o, d)
    hp = intersect_pallas_bvh(scene, bvh, o, d, interpret=True)
    tb = np.where(np.isinf(np.asarray(hb.t)), 1e9, np.asarray(hb.t))
    tp = np.where(np.isinf(np.asarray(hp.t)), 1e9, np.asarray(hp.t))
    assert np.isclose(tb, tp, atol=1e-4).mean() > 0.998
    tm = jnp.full((o.shape[0],), 2.0, jnp.float32)
    bb = np.asarray(occluded_brute(scene, o, d, tm))
    bp = np.asarray(occluded_pallas_bvh(scene, bvh, o, d, tm, interpret=True))
    assert (bb == bp).mean() > 0.998


def test_pallas_bvh_oversized_leaves(scenes):
    # Depth-capped tree -> multi-row leaves inside the kernel.
    from cg_raytracer_tpu.ops.bvh import build_bvh
    from cg_raytracer_tpu.ops.pallas_bvh import (intersect_pallas_bvh,
                                                 pack_bvh_rows)

    scene = scenes("monkey")
    bvh = pack_bvh_rows(build_bvh(scene, max_depth=4, max_leaf=4))
    cam = cgrt.Camera.default()
    o, d = cam_ops.generate_rays(cam, 16, 16)
    hb = intersect_brute(scene, o, d)
    hp = intersect_pallas_bvh(scene, bvh, o, d, interpret=True)
    tb = np.where(np.isinf(np.asarray(hb.t)), 1e9, np.asarray(hb.t))
    tp = np.where(np.isinf(np.asarray(hp.t)), 1e9, np.asarray(hp.t))
    assert np.isclose(tb, tp, atol=1e-4).all()


def test_packed_bvh_invariants(scenes):
    from cg_raytracer_tpu.ops.pallas_bvh import TRIS_PER_ROW, build_packed_bvh

    scene = scenes("monkey")
    bvh, packed = build_packed_bvh(scene)
    T = scene.num_triangles
    s2p = np.asarray(packed.slot_to_prim)
    # Every original triangle appears exactly once; padding slots are -1.
    real = s2p[s2p >= 0]
    assert sorted(real.tolist()) == list(range(T))
    # Node integer payloads decode exactly.
    nodes = np.asarray(packed.nodes)
    count = np.asarray(bvh.count)
    leaves = count > 0
    n_rows = nodes[leaves, 9].astype(np.int64)
    assert (n_rows == -(-count[leaves] // TRIS_PER_ROW)).all()
    assert int(n_rows.sum()) == packed.tri_rows.shape[0]
    # Padding triangles are degenerate (all-zero rows beyond each leaf's count).
    rows = np.asarray(packed.tri_rows).reshape(-1, TRIS_PER_ROW, 9)
    pad_mask = (s2p < 0).reshape(-1, TRIS_PER_ROW)
    assert np.abs(rows[pad_mask]).max() == 0.0


def test_bvh_fused_bounce_matches_separate(scenes):
    from cg_raytracer_tpu.ops.intersect import reconstruct_hit
    from cg_raytracer_tpu.ops.linalg import norm, safe_normalize
    from cg_raytracer_tpu.ops.pallas_bvh import (bounce_pallas_bvh,
                                                 build_packed_bvh,
                                                 supports_fused_bounce_bvh)

    scene = scenes("monkey")  # 968 tris, 2 point lights
    assert supports_fused_bounce_bvh(scene)
    _, bvh = build_packed_bvh(scene)
    cam = cgrt.Camera.default()
    o, d = cam_ops.generate_rays(cam, 32, 32)
    hit_f, bits = bounce_pallas_bvh(scene, bvh, o, d, interpret=True)
    hit_b = intersect_brute(scene, o, d)
    tb = np.where(np.isinf(np.asarray(hit_b.t)), 1e9, np.asarray(hit_b.t))
    tf = np.where(np.isinf(np.asarray(hit_f.t)), 1e9, np.asarray(hit_f.t))
    assert np.isclose(tb, tf, atol=1e-4).mean() > 0.998

    # Shadow bits match the separate any-hit path for both lights, where hit.
    surf = reconstruct_hit(scene, o, d, hit_b)
    agree = np.asarray(hit_b.prim_id) == np.asarray(hit_f.prim_id)
    for li in range(2):
        lpos = scene.point_lights.position[li]
        to_light = lpos - surf.position
        dist = norm(to_light)
        ldir = safe_normalize(to_light)
        blocked_sep = np.asarray(
            occluded_brute(scene, surf.position + 1e-3 * ldir, ldir, dist - 1e-3)
        )
        blocked_fused = (np.asarray(bits) >> li) & 1
        mask = np.asarray(surf.valid) & agree
        assert (blocked_sep[mask] == blocked_fused[mask]).mean() > 0.995, f"light {li}"


def test_pallas_bvh_hbm_matches_brute(scenes):
    # HBM-streaming variant: triangles DMA'd per leaf, double-buffered.
    from cg_raytracer_tpu.ops.pallas_bvh import (build_hbm_bvh,
                                                 intersect_pallas_bvh_hbm,
                                                 occluded_pallas_bvh_hbm)

    scene = scenes("monkey")
    # Force small leaf_rows so many DMA round-trips are exercised.
    _, hbvh = build_hbm_bvh(scene, leaf_rows=2)
    cam = cgrt.Camera.default()
    o, d = cam_ops.generate_rays(cam, 32, 32)
    hb = intersect_brute(scene, o, d)
    hp = intersect_pallas_bvh_hbm(scene, hbvh, o, d, interpret=True)
    tb = np.where(np.isinf(np.asarray(hb.t)), 1e9, np.asarray(hb.t))
    tp = np.where(np.isinf(np.asarray(hp.t)), 1e9, np.asarray(hp.t))
    assert np.isclose(tb, tp, atol=1e-4).mean() > 0.998
    tm = jnp.full((o.shape[0],), 2.0, jnp.float32)
    bb = np.asarray(occluded_brute(scene, o, d, tm))
    bp = np.asarray(occluded_pallas_bvh_hbm(scene, hbvh, o, d, tm, interpret=True))
    assert (bb == bp).mean() > 0.998


def test_hbm_fused_bounce_matches_vmem(scenes):
    # HBM-streaming fused bounce agrees with the (already-validated) VMEM one.
    from cg_raytracer_tpu.ops.pallas_bvh import (bounce_pallas_bvh,
                                                 bounce_pallas_bvh_hbm,
                                                 build_hbm_bvh,
                                                 build_packed_bvh,
                                                 supports_fused_bounce_bvh_hbm)

    scene = scenes("monkey")
    assert supports_fused_bounce_bvh_hbm(scene)
    _, vbvh = build_packed_bvh(scene)
    _, hbvh = build_hbm_bvh(scene, leaf_rows=2)
    cam = cgrt.Camera.default()
    o, d = cam_ops.generate_rays(cam, 32, 32)
    hit_v, bits_v = bounce_pallas_bvh(scene, vbvh, o, d, interpret=True)
    hit_h, bits_h = bounce_pallas_bvh_hbm(scene, hbvh, o, d, interpret=True)
    agree = np.asarray(hit_v.prim_id) == np.asarray(hit_h.prim_id)
    assert agree.mean() > 0.998  # different leaf widths: rare coincident-t ties
    assert (np.asarray(bits_v)[agree] == np.asarray(bits_h)[agree]).mean() > 0.995


def test_fused_bounce_matches_separate(scenes):
    from cg_raytracer_tpu.ops.pallas_kernels import (bounce_pallas,
                                                     supports_fused_bounce)
    from cg_raytracer_tpu.ops.linalg import norm, safe_normalize

    scene = scenes("cornell_box")
    assert supports_fused_bounce(scene)
    cam = cgrt.Camera.default()
    o, d = cam_ops.generate_rays(cam, 32, 32)
    hit_f, bits = bounce_pallas(scene, o, d, interpret=True)
    hit_b = intersect_brute(scene, o, d)
    assert (np.asarray(hit_f.prim_id) == np.asarray(hit_b.prim_id)).all()

    # Shadow bits match the separate any-hit path where the ray hit.
    from cg_raytracer_tpu.ops.intersect import reconstruct_hit

    surf = reconstruct_hit(scene, o, d, hit_b)
    lpos = scene.point_lights.position[0]
    to_light = lpos - surf.position
    dist = norm(to_light)
    ldir = safe_normalize(to_light)
    blocked_sep = np.asarray(
        occluded_brute(scene, surf.position + 1e-3 * ldir, ldir, dist - 1e-3)
    )
    blocked_fused = (np.asarray(bits) & 1) > 0
    valid = np.asarray(surf.valid)
    agree = (blocked_sep == blocked_fused) | ~valid
    assert agree.mean() > 0.995


def test_fused_bounce_render_agreement(scenes):
    import dataclasses

    scene = scenes("cornell_box")
    cfg_b = cgrt.RenderConfig(width=40, height=40, backend="brute")
    cfg_p = dataclasses.replace(cfg_b, backend="pallas")  # uses fused bounce
    brute = np.asarray(cgrt.render(scene, cgrt.Camera.default(), cfg_b))
    pallas = np.asarray(cgrt.render(scene, cgrt.Camera.default(), cfg_p))
    assert_images_close(brute, pallas, msg="fused-bounce vs brute render")


def test_soft_shadow_table_kernel_matches_xla(scenes):
    """Table-variant soft-shadow kernel vs the XLA sample sweep with IDENTICAL
    Gaussian draws: visibility counts must agree (exactly, modulo rare
    coincident-t float knife edges)."""
    import jax

    from cg_raytracer_tpu.ops.intersect import reconstruct_hit
    from cg_raytracer_tpu.ops.linalg import norm, safe_normalize
    from cg_raytracer_tpu.ops.pallas_kernels import soft_shadow_counts_pallas
    from cg_raytracer_tpu.ops.shading import SHADOW_EPS

    scene = scenes("cornell_box_spherical_light")
    cam = cgrt.Camera.default()
    o, d = cam_ops.generate_rays(cam, 24, 24)
    surf = reconstruct_hit(scene, o, d, intersect_brute(scene, o, d))

    num_samples = 16
    key = jax.random.PRNGKey(7)
    gauss = jax.random.normal(key, (num_samples, o.shape[0], 3), jnp.float32)

    lpos = scene.spherical_lights.position[0]
    lrad = scene.spherical_lights.radius[0]
    units = safe_normalize(gauss)
    sample_pts = lpos + lrad * units
    to_sample = sample_pts - surf.position[None]
    sdir = safe_normalize(to_sample)
    sorigin = surf.position[None] + SHADOW_EPS * sdir
    light_t = norm(sample_pts - sorigin)
    flat = lambda a: a.reshape((-1,) + a.shape[2:])
    blocked = occluded_brute(scene, flat(sorigin), flat(sdir), flat(light_t))
    ref_counts = np.asarray(
        (~blocked).reshape(num_samples, -1).sum(axis=0), np.float32)

    counts = np.asarray(soft_shadow_counts_pallas(
        scene, surf.position, lpos, lrad, key, num_samples,
        interpret=True, gauss=gauss))

    diff = np.abs(counts - ref_counts)
    assert diff.max() <= 1.0, f"max count diff {diff.max()}"
    assert (diff == 0).mean() > 0.99
    # Sanity: the scene actually has a penumbra in this view.
    valid = np.asarray(surf.valid)
    assert counts[valid].min() < num_samples
    assert counts[valid].max() > 0


def test_soft_shadow_fully_visible_counts():
    """Points with an unobstructed view of the whole light sphere count every
    sample visible."""
    import jax

    from cg_raytracer_tpu.ops.pallas_kernels import soft_shadow_counts_pallas

    scene = cgrt.load_scene("cornell_box_spherical_light")
    lpos = scene.spherical_lights.position[0]
    lrad = scene.spherical_lights.radius[0]
    # Points just below the light, in the open interior between it and the
    # in-box occluders (the point at y=0.1 sits inside one of them and would
    # count zero).
    positions = jnp.array([[0.0, 0.2, 0.0], [0.0, 0.3, 0.0]], jnp.float32)
    num_samples = 8
    key = jax.random.PRNGKey(3)
    gauss = jax.random.normal(key, (num_samples, 2, 3), jnp.float32)
    counts = np.asarray(soft_shadow_counts_pallas(
        scene, positions, lpos, lrad, key, num_samples,
        interpret=True, gauss=gauss))
    np.testing.assert_array_equal(counts, num_samples)


def test_direct_spherical_soft_vis_fn_branch(scenes):
    """The soft_vis_fn fast path must reproduce the documented arithmetic:
    (diffuse+specular) * count/num_samples, gated by surf.valid."""
    import jax

    from cg_raytracer_tpu.ops.intersect import reconstruct_hit
    from cg_raytracer_tpu.ops.linalg import safe_normalize
    from cg_raytracer_tpu.ops.shading import (direct_spherical_lights,
                                              phong_one_light)

    scene = scenes("cornell_box_spherical_light")
    cam = cgrt.Camera.default()
    o, d = cam_ops.generate_rays(cam, 8, 8)
    surf = reconstruct_hit(scene, o, d, intersect_brute(scene, o, d))
    n = o.shape[0]
    num_samples = 10
    fixed_counts = jnp.arange(n, dtype=jnp.float32) % (num_samples + 1)

    got = direct_spherical_lights(
        scene, d, surf, occluded_fn=None, key=jax.random.PRNGKey(0),
        num_samples=num_samples,
        soft_vis_fn=lambda lpos, lrad, pos, k: fixed_counts)

    lpos = scene.spherical_lights.position[0]
    diffuse, specular = phong_one_light(
        d, surf.normal, surf.kd, surf.ks, surf.shininess,
        safe_normalize(lpos - surf.position), scene.spherical_lights.color[0])
    frac = fixed_counts / num_samples
    want = (diffuse + specular) * (frac * surf.valid.astype(jnp.float32))[..., None]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_resolve_soft_shadow_kernel():
    cfg = cgrt.RenderConfig()
    assert cfg.resolve_soft_shadow_kernel(platform="tpu")
    assert not cfg.resolve_soft_shadow_kernel(platform="cpu")
    import dataclasses

    on = dataclasses.replace(cfg, soft_shadow_kernel="on")
    off = dataclasses.replace(cfg, soft_shadow_kernel="off")
    assert on.resolve_soft_shadow_kernel(platform="cpu")
    assert not off.resolve_soft_shadow_kernel(platform="tpu")


def test_resolve_soft_shadow_kernel_rejects_typos():
    import dataclasses

    import pytest

    bad = dataclasses.replace(cgrt.RenderConfig(), soft_shadow_kernel="true")
    with pytest.raises(ValueError, match="soft_shadow_kernel"):
        bad.resolve_soft_shadow_kernel(platform="tpu")


def test_soft_shadow_kernel_on_cpu_falls_back(scenes):
    """A forced soft_shadow_kernel='on' off-TPU must warn and fall back to the
    XLA scan instead of raising NotImplementedError mid-trace (ADVICE r1)."""
    import dataclasses
    import warnings

    from cg_raytracer_tpu.models.whitted import make_backend

    scene = scenes("cornell_box_spherical_light")
    cfg = dataclasses.replace(
        cgrt.RenderConfig(width=16, height=16, soft_shadow_samples=4,
                          soft_shadow_chunk=2),
        backend="pallas", soft_shadow_kernel="on")
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        backend = make_backend(scene, cfg)
    assert backend.soft_vis is None
    assert any("soft_shadow_kernel" in str(w.message) for w in rec)
    img = np.asarray(cgrt.render(scene, cgrt.Camera.default(), cfg))
    assert np.isfinite(img).all() and img.max() > 0


def test_soft_shadow_table_gauss_mismatch_raises(scenes):
    import jax
    import pytest

    from cg_raytracer_tpu.ops.pallas_kernels import soft_shadow_counts_pallas

    scene = scenes("cornell_box_spherical_light")
    pos = jnp.zeros((4, 3), jnp.float32)
    gauss = jax.random.normal(jax.random.PRNGKey(0), (3, 4, 3), jnp.float32)
    with pytest.raises(ValueError, match="num_samples"):
        soft_shadow_counts_pallas(
            scene, pos, scene.spherical_lights.position[0],
            scene.spherical_lights.radius[0], jax.random.PRNGKey(0),
            num_samples=5, interpret=True, gauss=gauss)
