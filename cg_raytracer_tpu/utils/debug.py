"""Debug data renders — the TPU-native replacement for interactive debug draw.

Reference capability: the R-key debug-ray workflow and per-level BVH visualization
(``/root/reference/src/draw.cpp:159-180``, ``src/main.cpp:742-762,896-903``,
``src/bounding_volume_hierarchy.cpp:469-525``).  A headless framework returns debug
*data* instead of GL lines: per-ray traces (hit ids, t, normals, shadow outcomes)
as arrays, plus host-side helpers to rasterize BVH level boxes into a matplotlib/PIL
friendly form.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..models.whitted import Backend, make_backend
from ..ops import camera as cam_ops
from ..ops.intersect import reconstruct_hit
from ..ops.linalg import norm, safe_normalize
from ..scene.types import Camera, Scene
from ..utils.config import RenderConfig


def debug_trace(scene: Scene, camera: Camera, ndc, cfg: RenderConfig | None = None,
                backend: Backend | None = None) -> Dict:
    """Trace one (or a batch of) debug ray(s) and return its full fate.

    The data equivalent of pressing R in the reference (main.cpp:747-753): for each
    bounce level, the hit id / t / position / normal, and per point light whether the
    shadow ray was occluded — everything the reference draws as colored GL lines
    (white=hit, red=miss/occluded, blue=normal, green=lit).
    """
    cfg = cfg or RenderConfig()
    if backend is None:
        backend = make_backend(scene, cfg)
    ndc = jnp.atleast_2d(jnp.asarray(ndc, jnp.float32))
    origin, dirs = cam_ops.generate_ray(camera, ndc)
    origins = jnp.broadcast_to(origin, dirs.shape)

    out = {"levels": []}
    o, d = origins, dirs
    for level in range(cfg.max_depth):
        hit = backend.closest(o, d)
        surf = reconstruct_hit(scene, o, d, hit)
        level_info = {
            "origin": np.asarray(o),
            "direction": np.asarray(d),
            "hit": np.asarray(surf.valid),
            "t": np.asarray(hit.t),
            "prim_id": np.asarray(hit.prim_id),
            "position": np.asarray(surf.position),
            "normal": np.asarray(surf.normal),
            "shadowed_by_light": [],
        }
        num_lights = scene.point_lights.position.shape[0]
        for li in range(num_lights):
            lpos = scene.point_lights.position[li]
            to_light = lpos - surf.position
            dist = norm(to_light)
            ldir = safe_normalize(to_light)
            blocked = backend.occluded(surf.position + 1e-3 * ldir, ldir, dist - 1e-3)
            level_info["shadowed_by_light"].append(np.asarray(blocked & surf.valid))
        out["levels"].append(level_info)

        refl = safe_normalize(
            d - 2.0 * jnp.sum(d * surf.normal, axis=-1, keepdims=True) * surf.normal
        )
        o = surf.position + 1e-3 * refl
        d = refl
    return out


def hit_statistics(scene: Scene, camera: Camera, cfg: RenderConfig,
                   backend: Backend | None = None) -> Dict:
    """Whole-grid debug arrays: hit mask, t-buffer, prim ids (for notebook viz)."""
    if backend is None:
        backend = make_backend(scene, cfg)
    origins, dirs = cam_ops.generate_rays(camera, cfg.height, cfg.width)
    hit = backend.closest(origins, dirs)
    shape = (cfg.height, cfg.width)
    return {
        "hit": np.asarray(hit.prim_id >= 0).reshape(shape),
        "t": np.asarray(hit.t).reshape(shape),
        "prim_id": np.asarray(hit.prim_id).reshape(shape),
        "u": np.asarray(hit.u).reshape(shape),
        "v": np.asarray(hit.v).reshape(shape),
    }


def bvh_level_boxes(bvh, level: int):
    """AABBs (lo, hi, is_leaf) of all nodes at a given tree level — the data behind
    the reference's per-level debugDraw slider (bvh.cpp:469-525, main.cpp:805-807)."""
    left = np.asarray(bvh.left)
    right = np.asarray(bvh.right)
    depth = np.zeros(left.shape[0], np.int32)
    for i in range(left.shape[0]):
        for c in (left[i], right[i]):
            if c >= 0:
                depth[c] = depth[i] + 1
    sel = depth == level
    return (
        np.asarray(bvh.node_lo)[sel],
        np.asarray(bvh.node_hi)[sel],
        (np.asarray(bvh.count) > 0)[sel],
    )
