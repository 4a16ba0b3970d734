"""BVH-traversal in-kernel soft-shadow sampler (VERDICT r1 item 4).

The brute sampler (ops/pallas_kernels.py) unrolls the triangle table and caps
at 256 triangles; this variant resolves each sample's shadow ray by an any-hit
BVH traversal (ops/pallas_bvh.py::soft_shadow_counts_pallas_bvh), covering any
VMEM-resident scene.  Tests use the table variant (precomputed Gaussians) in
interpret mode, pinned against the brute-force XLA sweep with identical draws.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import cg_raytracer_tpu as cgrt
from cg_raytracer_tpu.models.whitted import make_backend
from cg_raytracer_tpu.ops import camera as cam_ops
from cg_raytracer_tpu.ops.intersect import (intersect_brute, occluded_brute,
                                            reconstruct_hit)
from cg_raytracer_tpu.ops.linalg import norm, safe_normalize
from cg_raytracer_tpu.ops.pallas_bvh import (build_packed_bvh,
                                             soft_shadow_counts_pallas_bvh,
                                             supports_soft_shadow_kernel_bvh)
from cg_raytracer_tpu.ops.shading import SHADOW_EPS


@pytest.fixture(scope="module")
def monkey_sl():
    return cgrt.load_scene("monkey_spherical_light")


def test_supports_gate(monkey_sl):
    assert supports_soft_shadow_kernel_bvh(monkey_sl)
    # Point-light-only and sphere scenes are excluded.
    assert not supports_soft_shadow_kernel_bvh(cgrt.load_scene("monkey"))
    assert not supports_soft_shadow_kernel_bvh(cgrt.load_scene("spheres"))


@pytest.mark.parametrize("tile_rows", [8, 64])
def test_bvh_sampler_matches_xla_sweep(monkey_sl, tile_rows):
    scene = monkey_sl
    _, packed = build_packed_bvh(scene)
    cam = cgrt.Camera.default()
    o, d = cam_ops.generate_rays(cam, 20, 20)
    surf = reconstruct_hit(scene, o, d, intersect_brute(scene, o, d))

    num_samples = 12
    key = jax.random.PRNGKey(11)
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

    counts = np.asarray(soft_shadow_counts_pallas_bvh(
        scene, packed, surf.position, lpos, lrad, key, num_samples,
        interpret=True, gauss=gauss, tile_rows=tile_rows))

    diff = np.abs(counts - ref_counts)
    assert diff.max() <= 1.0, f"max count diff {diff.max()}"
    assert (diff == 0).mean() > 0.99
    valid = np.asarray(surf.valid)
    # The monkey self-shadows under a spherical light: penumbra must exist.
    assert counts[valid].min() < num_samples


@pytest.mark.parametrize("sample_rows,num_samples", [(None, 12), (16, 40)])
def test_cone_sampler_matches_per_sample_kernel(monkey_sl, sample_rows,
                                                num_samples):
    """The cone-coherent layout (lanes = pixels, rows = samples) must produce
    IDENTICAL counts to the per-sample kernel given the same Gaussian table —
    pure regrouping of the same shadow rays (multi-pass case included:
    40 samples = 3 passes of 16 rows with a masked tail)."""
    from cg_raytracer_tpu.ops.pallas_bvh import \
        soft_shadow_counts_pallas_bvh_cone

    scene = monkey_sl
    _, packed = build_packed_bvh(scene)
    cam = cgrt.Camera.default()
    o, d = cam_ops.generate_rays(cam, 12, 12)
    surf = reconstruct_hit(scene, o, d, intersect_brute(scene, o, d))
    key = jax.random.PRNGKey(5)
    gauss = jax.random.normal(key, (num_samples, o.shape[0], 3), jnp.float32)
    lpos = scene.spherical_lights.position[0]
    lrad = scene.spherical_lights.radius[0]
    ref = np.asarray(soft_shadow_counts_pallas_bvh(
        scene, packed, surf.position, lpos, lrad, key, num_samples,
        interpret=True, gauss=gauss))
    cone = np.asarray(soft_shadow_counts_pallas_bvh_cone(
        scene, packed, surf.position, lpos, lrad, key, num_samples,
        interpret=True, gauss=gauss, sample_rows=sample_rows))
    np.testing.assert_array_equal(cone, ref)


@pytest.mark.parametrize("sample_rows,num_samples", [(None, 12), (16, 40)])
def test_bvh4_cone_sampler_matches_binary(monkey_sl, sample_rows, num_samples):
    """The 4-wide cone sampler must produce IDENTICAL counts to the binary
    cone sampler given the same Gaussian table — same shadow rays, different
    node table (oracle contract)."""
    from cg_raytracer_tpu.ops.pallas_bvh import \
        soft_shadow_counts_pallas_bvh_cone
    from cg_raytracer_tpu.ops.pallas_bvh4 import (
        build_packed_bvh4, soft_shadow_counts_pallas_bvh4_cone)

    scene = monkey_sl
    _, packed = build_packed_bvh(scene)
    _, packed4 = build_packed_bvh4(scene, max_leaf=56)
    cam = cgrt.Camera.default()
    o, d = cam_ops.generate_rays(cam, 12, 12)
    surf = reconstruct_hit(scene, o, d, intersect_brute(scene, o, d))
    key = jax.random.PRNGKey(5)
    gauss = jax.random.normal(key, (num_samples, o.shape[0], 3), jnp.float32)
    lpos = scene.spherical_lights.position[0]
    lrad = scene.spherical_lights.radius[0]
    ref = np.asarray(soft_shadow_counts_pallas_bvh_cone(
        scene, packed, surf.position, lpos, lrad, key, num_samples,
        interpret=True, gauss=gauss, sample_rows=sample_rows))
    got = np.asarray(soft_shadow_counts_pallas_bvh4_cone(
        scene, packed4, surf.position, lpos, lrad, key, num_samples,
        interpret=True, gauss=gauss, sample_rows=sample_rows))
    np.testing.assert_array_equal(got, ref)


def test_bvh4_cone_backend_wiring(monkey_sl):
    # With bvh_wide='4' and soft_shadow_tile='cone', the backend stays on the
    # 4-wide tree (closest/bounce) — formerly it fell back to binary whenever
    # the in-kernel sampler was selected.  On CPU soft_vis still gates off
    # (PRNG has no interpretation) but the oracle side must be BVH4.
    from cg_raytracer_tpu.ops.pallas_bvh4 import build_packed_bvh4

    cfg = cgrt.RenderConfig(backend="pallas", pallas_brute_max_tris=0,
                            bvh_wide="4", soft_shadow_tile="cone")
    _, p4 = build_packed_bvh4(monkey_sl, max_leaf=56)
    be = make_backend(monkey_sl, cfg, bvh=p4)
    o, d = cam_ops.generate_rays(cgrt.Camera.default(), 8, 8)
    hit = be.closest(o, d)
    hb = intersect_brute(monkey_sl, o, d)
    tb = np.where(np.isinf(np.asarray(hb.t)), 1e9, np.asarray(hb.t))
    t4 = np.where(np.isinf(np.asarray(hit.t)), 1e9, np.asarray(hit.t))
    assert (~np.isclose(tb, t4, atol=1e-4, rtol=1e-5)).mean() < 0.01


def test_bvh_sampler_gauss_mismatch_raises(monkey_sl):
    _, packed = build_packed_bvh(monkey_sl)
    lpos = monkey_sl.spherical_lights.position[0]
    lrad = monkey_sl.spherical_lights.radius[0]
    pos = jnp.zeros((4, 3), jnp.float32)
    gauss = jax.random.normal(jax.random.PRNGKey(0), (4, 4, 3), jnp.float32)
    with pytest.raises(ValueError, match="num_samples"):
        soft_shadow_counts_pallas_bvh(monkey_sl, packed, pos, lpos, lrad,
                                      jax.random.PRNGKey(0), 8,
                                      interpret=True, gauss=gauss)


def test_backend_wiring_gated_off_cpu(monkey_sl):
    # On CPU the PRNG sampler has no interpretation: 'on' warns and falls back.
    cfg = cgrt.RenderConfig(backend="pallas", soft_shadow_kernel="on")
    with pytest.warns(UserWarning, match="falling back"):
        be = make_backend(monkey_sl, cfg)
    assert be.soft_vis is None
    # 'off' stays off silently.
    cfg_off = dataclasses.replace(cfg, soft_shadow_kernel="off")
    assert make_backend(monkey_sl, cfg_off).soft_vis is None


def test_cone4_interleave_bands_identical_counts():
    """Round 5: the cone sampler's sample-band interleave is a pure
    regrouping in the table variant — counts identical across interleave
    settings (the PRNG variant redraws per band; statistically
    equivalent)."""
    import dataclasses

    import jax
    import numpy as np

    import cg_raytracer_tpu as cgrt
    from cg_raytracer_tpu.ops.pallas_bvh4 import (
        build_packed_bvh4, soft_shadow_counts_pallas_bvh4_cone)

    scene = cgrt.load_scene("monkey")
    _, p4 = build_packed_bvh4(scene, max_leaf=14)
    rng = np.random.default_rng(5)
    pos = jnp.asarray(rng.uniform(-1, 1, (300, 3)), jnp.float32)
    lp = jnp.asarray([-1.0, 1.0, -1.0], jnp.float32)
    ns = 24
    gauss = jnp.asarray(rng.standard_normal((ns, 300, 3)), jnp.float32)
    key = jax.random.PRNGKey(0)
    c1 = soft_shadow_counts_pallas_bvh4_cone(
        scene, p4, pos, lp, 0.1, key, ns, interpret=True, gauss=gauss,
        interleave=1)
    for il, pop in ((2, "base"), (2, "batched")):
        c = soft_shadow_counts_pallas_bvh4_cone(
            scene, p4, pos, lp, 0.1, key, ns, interpret=True, gauss=gauss,
            interleave=il, pop=pop, sample_rows=ns)
        np.testing.assert_array_equal(np.asarray(c1), np.asarray(c))
