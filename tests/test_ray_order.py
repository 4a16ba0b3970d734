"""Tile-size and ray-ordering invariance (VERDICT r1 item 3 infrastructure).

Per-ray results must be exactly permutation- and tile-grouping-invariant:
ordering/tile knobs only change which rays share a tile-synchronous traversal
(divergence → speed), never the image.
"""
import dataclasses

import numpy as np
import pytest

from cg_raytracer_tpu import Camera, RenderConfig, load_scene, render
from cg_raytracer_tpu.models.whitted import _ray_order_perm


@pytest.fixture(scope="module")
def monkey():
    return load_scene("monkey")  # 968 tris -> pallas BVH kernel


CAM = Camera.default(aspect=1.0)


def _img(scn, **overrides):
    cfg = RenderConfig(width=40, height=40, backend="pallas", **overrides)
    return np.asarray(render(scn, CAM, cfg))


def test_blocked_order_is_bitwise_invariant(monkey):
    base = _img(monkey, ray_order="raster")
    blocked = _img(monkey, ray_order="blocked")
    np.testing.assert_array_equal(base, blocked)


def test_morton_order_is_bitwise_invariant(monkey):
    base = _img(monkey, ray_order="raster")
    morton = _img(monkey, ray_order="morton")
    np.testing.assert_array_equal(base, morton)


def test_tile_rows_is_bitwise_invariant(monkey):
    base = _img(monkey, bvh_tile_rows=64)
    small = _img(monkey, bvh_tile_rows=8)
    np.testing.assert_array_equal(base, small)


def test_perm_is_a_permutation():
    for order in ("blocked", "morton"):
        perm, inv = _ray_order_perm(50, 70, order, 8)
        n = 50 * 70
        assert sorted(perm.tolist()) == list(range(n))
        np.testing.assert_array_equal(perm[inv], np.arange(n))


def test_blocked_groups_are_rectangles():
    # With h, w multiples of the block, each consecutive tile-sized chunk of
    # the permutation must cover exactly one (rows x 128) pixel rectangle.
    rows = 8
    perm, _ = _ray_order_perm(16, 256, "blocked", rows)
    first = perm[: rows * 128]
    ys, xs = first // 256, first % 256
    assert ys.max() == rows - 1 and xs.max() == 127


@pytest.mark.parametrize("mode", ["park", "pos", "posdir"])
def test_bounce_resort_is_bitwise_invariant(monkey, mode):
    base = _img(monkey, bounce_resort="off")
    sorted_ = _img(monkey, bounce_resort=mode)
    np.testing.assert_array_equal(base, sorted_)


def test_bounce_resort_grads_match(monkey):
    # The resort path (argsort + gathers + parked inactive rays) must be
    # gradient-transparent: same kd grad as the unsorted query.
    import jax
    import jax.numpy as jnp

    from cg_raytracer_tpu.models.whitted import build_accel, make_backend, render_image

    cam = Camera.default(aspect=1.0)

    def loss(kd, resort):
        cfg = RenderConfig(width=24, height=24, backend="pallas",
                           bounce_resort=resort)
        scn = dataclasses.replace(
            monkey, materials=dataclasses.replace(monkey.materials, kd=kd))
        bvh = build_accel(scn, cfg)
        backend = make_backend(scn, cfg, bvh=bvh)
        return jnp.sum(render_image(scn, cam, cfg, backend=backend) ** 2)

    kd = monkey.materials.kd
    g_off = jax.grad(loss)(kd, "off")
    g_on = jax.grad(loss)(kd, "posdir")
    np.testing.assert_allclose(np.asarray(g_off), np.asarray(g_on), rtol=1e-6)


def test_config_validation():
    cfg = RenderConfig(bvh_tile_rows=12)
    with pytest.raises(ValueError, match="bvh_tile_rows"):
        cfg.resolve_bvh_tile_rows()
    cfg = RenderConfig(ray_order="zigzag")
    with pytest.raises(ValueError, match="ray_order"):
        cfg.resolve_ray_order(10_000)
    cfg = RenderConfig(bounce_resort="yes")
    with pytest.raises(ValueError, match="bounce_resort"):
        cfg.resolve_bounce_resort(10_000)


def test_auto_order_targets_bvh_kernel_scenes():
    cfg = RenderConfig(backend="pallas")
    # Morton measured best on v5e (scripts/tpu_tile_ab.py).
    assert cfg.resolve_ray_order(100_000, platform="tpu") == "morton"
    assert cfg.resolve_ray_order(32, platform="tpu") == "raster"
    assert RenderConfig().resolve_ray_order(32, platform="cpu") == "raster"
