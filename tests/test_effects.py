"""Effects tests: AA, bloom, motion blur (main.cpp:318-720 capabilities)."""
import dataclasses

import numpy as np
import jax.numpy as jnp

import cg_raytracer_tpu as cgrt
from cg_raytracer_tpu.ops.effects import bloom, _box_blur_1d

CFG = cgrt.RenderConfig(width=48, height=48)


def _render(scene, cfg):
    return np.asarray(cgrt.render(scene, cgrt.Camera.default(), cfg))


def test_aa_smooths_edges(scenes):
    scene = scenes("cube")
    plain = _render(scene, CFG)
    aa = _render(scene, dataclasses.replace(CFG, anti_aliasing=True))
    assert aa.shape == plain.shape
    # AA must produce intermediate values on silhouette edges: count pixels that are
    # neither background-black nor fully interior.
    def edges(img):
        v = img.sum(axis=-1)
        return ((v > 1e-4) & (v < 0.9 * v.max())).sum()

    assert not np.allclose(aa, plain)
    # Default divisor 4 keeps overall brightness comparable (not /5-darkened).
    assert abs(aa.mean() - plain.mean()) < 0.25 * max(plain.mean(), 1e-6)


def test_aa_reference_quirk_divisor(scenes):
    # Quirk mode divides the 4-sample sum by 5 (main.cpp:685) -> exactly 4/5 of the
    # default-mode image.
    scene = scenes("cube")
    aa = _render(scene, dataclasses.replace(CFG, anti_aliasing=True))
    aq = _render(scene, dataclasses.replace(CFG, anti_aliasing=True,
                                            reference_quirks=True))
    np.testing.assert_allclose(aq, aa * 0.8, atol=1e-5)


def test_bloom_threshold_and_blur():
    # Synthetic image: one bright pixel above threshold (sum > 1), rest dim.
    img = jnp.zeros((48, 48, 3), jnp.float32).at[24, 24].set(jnp.asarray([2.0, 2.0, 2.0]))
    out = np.asarray(bloom(img, CFG))
    # Energy added around the bright pixel within the 21x21 window.
    assert out[24, 30].sum() > 0  # inside radius 10
    assert out[24, 40].sum() == 0  # outside radius
    # Dim pixels below threshold contribute nothing.
    img2 = jnp.full((48, 48, 3), 0.2, jnp.float32)  # sum 0.6 < 1
    out2 = np.asarray(bloom(img2, CFG))
    np.testing.assert_allclose(out2, np.asarray(img2), atol=1e-6)


def test_box_blur_normalization():
    # Edge-clipped normalization: blurring a constant image is the identity.
    img = jnp.full((32, 32, 3), 0.7, jnp.float32)
    out = np.asarray(_box_blur_1d(_box_blur_1d(img, 10, axis=0), 10, axis=1))
    np.testing.assert_allclose(out, 0.7, atol=1e-5)


def test_motion_blur_smears(scenes):
    scene = scenes("cube")
    cfg = dataclasses.replace(CFG, width=32, height=32)
    plain = _render(scene, cfg)
    blurred = _render(scene, dataclasses.replace(cfg, motion_blur=True))
    assert blurred.shape == plain.shape
    assert not np.allclose(blurred, plain)
    # Averaging jittered renders cannot exceed the per-frame max by much.
    assert blurred.max() <= plain.max() + 0.3


def test_motion_blur_reference_quirk(scenes):
    # Quirk mode: 15 jittered renders / 16 (base omitted) -> strictly darker in
    # expectation than the default 16/16 average.
    scene = scenes("cube")
    cfg = dataclasses.replace(CFG, width=24, height=24)
    default = _render(scene, dataclasses.replace(cfg, motion_blur=True))
    quirk = _render(scene, dataclasses.replace(cfg, motion_blur=True,
                                               reference_quirks=True))
    assert quirk.mean() < default.mean()
