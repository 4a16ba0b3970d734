"""Whitted-style renderer: the TPU-native core.

Reference capability: the recursive ``trace``/``shade``/``getFinalColor`` trio
(``/root/reference/src/main.cpp:160-310``) and the per-pixel loop of
``renderRayTracing`` (main.cpp:648-720).  XLA has no recursion, so the bounce
recursion (depth cap 2, main.cpp:267) becomes an unrolled iterative loop with a
per-ray throughput mask:

    contribution += throughput * direct_light(hit)         (shade, main.cpp:244-263)
    throughput   *= ks;  ray = reflected ray + eps offset  (main.cpp:252-256)
    active       &= hit && any(ks > 0.01)                  (main.cpp:246, fixed form)

The entire render — ray generation, every bounce's closest-hit query, every shadow
ray, shading, effects — is one jittable, differentiable function of the scene
pytree, so ``jax.grad`` flows from pixels to vertices, normals, materials, and
lights.  Intersection backends are pluggable ('brute' | 'bvh' | 'pallas') behind
the oracle + differentiable-reconstruction contract (see ops/intersect.py).
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..ops import camera as cam_ops
from ..ops import shading
from ..ops.bvh import BVH, build_bvh, intersect_bvh, occluded_bvh
from ..ops.intersect import (intersect_brute, occluded_brute,
                             reconstruct_hit, record_surface)
from ..ops.linalg import reflect, safe_normalize
from ..scene.types import Camera, Scene
from ..utils.config import RenderConfig

REFLECT_EPS = 1e-3


class AccelBundle(NamedTuple):
    """Primary acceleration structure + a separate soft-shadow tree.

    The cone soft-shadow sampler's leaf-width optimum inverts the primary
    kernels' (its leaf MT sweeps run on [samples, 128] tiles, so triangle
    tests are ~3x pricier relative to pops): it gets its own tree rather
    than sharing the primary's wide leaves.  VMEM is per-pallas_call, so
    carrying both costs nothing on-chip."""

    primary: object
    soft: object


jax.tree_util.register_pytree_node(
    AccelBundle, lambda b: ((b.primary, b.soft), None),
    lambda _, ch: AccelBundle(*ch),
)


class Backend(NamedTuple):
    """Intersection oracle pair: closest-hit and any-hit queries.

    ``bounce``, when present, is a fused fast path returning
    (Hit, shadow_bits [N] int32) — the closest hit plus per-point-light occlusion
    bits computed in one kernel (bit l = light l blocked)."""

    closest: Callable  # (origins, dirs) -> Hit
    occluded: Callable  # (origins, dirs, t_max) -> bool [N]
    bounce: Optional[Callable] = None  # (origins, dirs) -> (Hit, shadow_bits)
    # bounce + in-kernel reflection records: (origins, dirs) ->
    # (Hit, shadow_bits, position [N,3], refl_dir [N,3], reflective [N]) —
    # lets the two-phase record loop skip the XLA reconstruct entirely.
    bounce_refl: Optional[Callable] = None
    # Whole record phase in one dispatch: (origins, dirs) -> list of
    # per-level (o, d, Hit, shadow_bits, active) — the two-phase record
    # format with no HBM round trips between levels.
    record_trace: Optional[Callable] = None
    # Forward-only full-trace megakernel: (origins, dirs) -> color [N,3].
    # Present only under cfg.forward_only on supported scenes; replaces the
    # whole trace_rays bounce loop with one kernel dispatch.
    trace: Optional[Callable] = None
    # In-kernel spherical-light sampler: (light_pos [3], light_radius, positions
    # [N,3], key) -> visible-sample counts [N] f32.  Replaces the chunked XLA
    # soft-shadow scan when present (different, statistically equivalent stream).
    soft_vis: Optional[Callable] = None


def make_backend(scene: Scene, cfg: RenderConfig, bvh: Optional[BVH] = None) -> Backend:
    kind = cfg.resolve_backend(scene.num_triangles)
    if kind == "brute":
        return Backend(
            closest=lambda o, d: intersect_brute(scene, o, d, tri_chunk=cfg.tri_chunk),
            occluded=lambda o, d, tm: occluded_brute(scene, o, d, tm, tri_chunk=cfg.tri_chunk),
        )
    if kind == "bvh":
        # Known device fault: the jnp while-loop traversal kills the chip at
        # 320K-tri x 640K-ray scale on v5e (BENCH_NOTES "device fault" entry;
        # root cause unresolved).  Fail with an actionable error instead of
        # faulting the hardware; CGRT_ALLOW_TPU_BVH=1 overrides for bisection.
        import os

        if (jax.default_backend() == "tpu"
                and scene.num_triangles >= 200_000
                and os.environ.get("CGRT_ALLOW_TPU_BVH") != "1"):
            raise ValueError(
                f"backend='bvh' (jnp while-loop traversal) device-faults on "
                f"TPU at this scale ({scene.num_triangles} triangles); use "
                f"backend='pallas' (the HBM-streaming kernel covers scenes "
                f"to ~2.7M triangles), geometry sharding for anything larger "
                f"(parallel/geometry.py::geometry_sharded_render), or set "
                f"CGRT_ALLOW_TPU_BVH=1 to override"
            )
        if bvh is None:
            bvh = build_bvh(scene,
                            builder=cfg.resolve_bvh_builder(scene.num_triangles))
        return Backend(
            closest=lambda o, d: intersect_bvh(scene, bvh, o, d),
            occluded=lambda o, d, tm: occluded_bvh(scene, bvh, o, d, tm),
        )
    if kind == "pallas":
        # Small scenes: tiled brute-force kernel.  Larger scenes: the
        # tile-synchronous BVH traversal kernel (tree packed into VMEM).
        if scene.num_triangles <= cfg.pallas_brute_max_tris:
            from ..ops.pallas_kernels import (bounce_pallas,
                                              bounce_refl_pallas,
                                              intersect_pallas,
                                              occluded_pallas,
                                              soft_shadow_counts_pallas,
                                              supports_fused_bounce,
                                              supports_soft_shadow_kernel,
                                              supports_trace_kernel,
                                              trace_pallas)

            bounce = None
            bounce_refl = None
            record_trace = None
            if supports_fused_bounce(scene):
                from ..ops.pallas_kernels import record_trace_pallas

                bounce = lambda o, d, live=None: bounce_pallas(scene, o, d,
                                                               live=live)
                bounce_refl = lambda o, d, live=None: bounce_refl_pallas(
                    scene, o, d, live=live, quirk_ks_z=cfg.reference_quirks)
                record_trace = lambda o, d: record_trace_pallas(
                    scene, o, d, cfg.max_depth,
                    quirk_ks_z=cfg.reference_quirks)
            trace = None
            if cfg.forward_only and supports_trace_kernel(scene):
                trace = lambda o, d: trace_pallas(
                    scene, o, d, cfg.max_depth,
                    quirk_ks_z=cfg.reference_quirks)
            soft_vis = None
            use_soft_kernel = cfg.resolve_soft_shadow_kernel()
            if use_soft_kernel and jax.default_backend() != "tpu":
                # The PRNG sampler has no CPU interpretation; a forced 'on'
                # off-TPU would otherwise surface as a NotImplementedError
                # mid-trace (ADVICE r1).  Fall back to the XLA sample scan.
                import warnings

                warnings.warn(
                    "soft_shadow_kernel='on' requires a TPU backend; falling "
                    "back to the XLA soft-shadow scan",
                    stacklevel=2,
                )
                use_soft_kernel = False
            if use_soft_kernel and supports_soft_shadow_kernel(scene):
                ns = cfg.soft_shadow_samples
                soft_vis = lambda lpos, lrad, pos, k: soft_shadow_counts_pallas(
                    scene, pos, lpos, lrad, k, ns)
            return Backend(
                closest=lambda o, d: intersect_pallas(scene, o, d),
                occluded=lambda o, d, tm: occluded_pallas(scene, o, d, tm),
                bounce=bounce,
                bounce_refl=bounce_refl,
                record_trace=record_trace,
                soft_vis=soft_vis,
                trace=trace,
            )
        from ..ops.pallas_bvh import (HBMBVH, PackedBVH, bounce_pallas_bvh,
                                      bounce_pallas_bvh_hbm, build_hbm_bvh,
                                      build_packed_bvh, intersect_pallas_bvh,
                                      intersect_pallas_bvh_hbm,
                                      occluded_pallas_bvh,
                                      occluded_pallas_bvh_hbm,
                                      soft_shadow_counts_pallas_bvh,
                                      supports_fused_bounce_bvh,
                                      supports_fused_bounce_bvh_hbm,
                                      supports_pallas_bvh,
                                      supports_pallas_bvh_hbm,
                                      supports_soft_shadow_kernel_bvh)

        soft_bvh = None
        if isinstance(bvh, AccelBundle):
            soft_bvh = bvh.soft
            bvh = bvh.primary

        rows = cfg.resolve_bvh_tile_rows()

        def _hbm_backend(hbm):
            hrows = cfg.resolve_bvh_tile_rows(hbm=True)
            bounce = None
            if supports_fused_bounce_bvh_hbm(scene):
                bounce = lambda o, d, live=None: bounce_pallas_bvh_hbm(
                    scene, hbm, o, d, tile_rows=hrows, live=live)
            return Backend(
                closest=lambda o, d: intersect_pallas_bvh_hbm(
                    scene, hbm, o, d, tile_rows=hrows),
                occluded=lambda o, d, tm: occluded_pallas_bvh_hbm(
                    scene, hbm, o, d, tm, tile_rows=hrows),
                bounce=bounce,
            )

        def _hbm4_backend(hbm4):
            from ..ops.pallas_bvh4 import (bounce_pallas_bvh4_hbm,
                                           intersect_pallas_bvh4_hbm,
                                           occluded_pallas_bvh4_hbm,
                                           supports_fused_bounce_bvh4_hbm)

            hrows = cfg.resolve_bvh_tile_rows(hbm=True)
            il = cfg.resolve_bvh_interleave(hbm=True)
            pop = cfg.resolve_bvh_pop()
            bounce = None
            if supports_fused_bounce_bvh4_hbm(scene):
                bounce = lambda o, d, live=None: bounce_pallas_bvh4_hbm(
                    scene, hbm4, o, d, tile_rows=hrows, live=live,
                    interleave=il, pop=pop)
            return Backend(
                closest=lambda o, d: intersect_pallas_bvh4_hbm(
                    scene, hbm4, o, d, tile_rows=hrows, interleave=il,
                    pop=pop),
                occluded=lambda o, d, tm: occluded_pallas_bvh4_hbm(
                    scene, hbm4, o, d, tm, tile_rows=hrows, interleave=il,
                    pop=pop),
                bounce=bounce,
            )

        from ..ops.pallas_bvh4 import HBMBVH4

        if isinstance(bvh, HBMBVH4):
            return _hbm4_backend(bvh)
        if isinstance(bvh, HBMBVH):
            # Caller explicitly built the HBM-streaming structure — honor it
            # even when the scene would also fit the all-VMEM kernel.
            return _hbm_backend(bvh)

        from ..ops.pallas_bvh4 import (PackedBVH4, bounce_pallas_bvh4,
                                       build_packed_bvh4,
                                       intersect_pallas_bvh4,
                                       occluded_pallas_bvh4,
                                       supports_fused_bounce_bvh4)

        wide_mode = cfg.resolve_bvh_wide()
        use_wide = (wide_mode in ("4", "8") or isinstance(bvh, PackedBVH4))
        if (use_wide and scene.spherical_lights.position.shape[0] > 0
                and cfg.resolve_soft_shadow_kernel()
                and supports_soft_shadow_kernel_bvh(scene)
                and cfg.resolve_soft_shadow_tile() != "cone"
                and not isinstance(bvh, PackedBVH4)):
            # The per-SAMPLE soft-shadow sampler runs only on the binary tree;
            # keep the whole backend binary rather than carrying both node
            # tables.  The cone sampler has a 4-wide variant
            # (soft_shadow_counts_pallas_bvh4_cone), so 'cone' stays wide.
            use_wide = False
        if use_wide and supports_pallas_bvh(scene):
            if not isinstance(bvh, PackedBVH4):
                _, bvh = build_packed_bvh4(
                    scene, max_leaf=cfg.resolve_pallas_bvh_max_leaf(),
                    builder=cfg.resolve_bvh_builder(scene.num_triangles),
                    width=int(wide_mode) if wide_mode in ("4", "8") else 4)
            packed4 = bvh
            il = cfg.resolve_bvh_interleave()
            rows = cfg.resolve_bvh_tile_rows(wide=True)
            pop = cfg.resolve_bvh_pop()
            bounce = None
            if supports_fused_bounce_bvh4(scene):
                bounce = lambda o, d, live=None: bounce_pallas_bvh4(
                    scene, packed4, o, d, tile_rows=rows, live=live,
                    interleave=il, pop=pop)
            soft_vis = None
            use_soft_kernel = cfg.resolve_soft_shadow_kernel()
            if use_soft_kernel and jax.default_backend() != "tpu":
                # PRNG sampler has no CPU interpretation (same fallback as the
                # binary branch below).
                import warnings

                warnings.warn(
                    "soft_shadow_kernel='on' requires a TPU backend; falling "
                    "back to the XLA soft-shadow scan",
                    stacklevel=2,
                )
                use_soft_kernel = False
            if (use_soft_kernel and supports_soft_shadow_kernel_bvh(scene)
                    and cfg.resolve_soft_shadow_tile() == "cone"):
                from ..ops.pallas_bvh4 import \
                    soft_shadow_counts_pallas_bvh4_cone

                if not isinstance(soft_bvh, PackedBVH4):
                    # Host-side build (outside jit; jitted callers pass
                    # build_accel's AccelBundle).
                    _, soft_bvh = build_packed_bvh4(
                        scene, max_leaf=cfg.resolve_soft_bvh_max_leaf(),
                        builder=cfg.resolve_soft_bvh_builder())
                soft_tree = soft_bvh
                ns = cfg.soft_shadow_samples
                cil = cfg.resolve_soft_cone_interleave()
                soft_vis = (lambda lpos, lrad, pos, k:
                            soft_shadow_counts_pallas_bvh4_cone(
                                scene, soft_tree, pos, lpos, lrad, k, ns,
                                pop=pop, interleave=cil))
            return Backend(
                closest=lambda o, d: intersect_pallas_bvh4(
                    scene, packed4, o, d, tile_rows=rows, interleave=il,
                    pop=pop),
                occluded=lambda o, d, tm: occluded_pallas_bvh4(
                    scene, packed4, o, d, tm, tile_rows=rows, interleave=il,
                    pop=pop),
                bounce=bounce,
                soft_vis=soft_vis,
            )
        if supports_pallas_bvh(scene):
            if not isinstance(bvh, PackedBVH):
                # Host-side packing — must happen outside jit (build_accel does this).
                _, bvh = build_packed_bvh(
                    scene, max_leaf=cfg.resolve_pallas_bvh_max_leaf(),
                    builder=cfg.resolve_bvh_builder(scene.num_triangles))
            packed = bvh
            bounce = None
            if supports_fused_bounce_bvh(scene):
                bounce = lambda o, d, live=None: bounce_pallas_bvh(
                    scene, packed, o, d, tile_rows=rows, live=live)
            soft_vis = None
            use_soft_kernel = cfg.resolve_soft_shadow_kernel()
            if use_soft_kernel and jax.default_backend() != "tpu":
                # PRNG sampler has no CPU interpretation (same fallback as the
                # brute branch above).
                import warnings

                warnings.warn(
                    "soft_shadow_kernel='on' requires a TPU backend; falling "
                    "back to the XLA soft-shadow scan",
                    stacklevel=2,
                )
                use_soft_kernel = False
            if use_soft_kernel and supports_soft_shadow_kernel_bvh(scene):
                ns = cfg.soft_shadow_samples
                if cfg.resolve_soft_shadow_tile() == "cone":
                    from ..ops.pallas_bvh import \
                        soft_shadow_counts_pallas_bvh_cone

                    if not isinstance(soft_bvh, PackedBVH):
                        _, soft_bvh = build_packed_bvh(
                            scene,
                            max_leaf=cfg.resolve_soft_bvh_max_leaf(),
                            builder=cfg.resolve_soft_bvh_builder())
                    soft_tree = soft_bvh
                    soft_vis = (lambda lpos, lrad, pos, k:
                                soft_shadow_counts_pallas_bvh_cone(
                                    scene, soft_tree, pos, lpos, lrad, k, ns))
                else:
                    soft_vis = (lambda lpos, lrad, pos, k:
                                soft_shadow_counts_pallas_bvh(
                                    scene, packed, pos, lpos, lrad, k, ns,
                                    tile_rows=rows))
            return Backend(
                closest=lambda o, d: intersect_pallas_bvh(scene, packed, o, d,
                                                          tile_rows=rows),
                occluded=lambda o, d, tm: occluded_pallas_bvh(
                    scene, packed, o, d, tm, tile_rows=rows),
                bounce=bounce,
                soft_vis=soft_vis,
            )
        if supports_pallas_bvh_hbm(scene):
            # Past the VMEM cap: nodes stay on-chip, triangles stream from HBM.
            if cfg.resolve_bvh_wide_hbm() == "4":
                from ..ops.pallas_bvh4 import build_hbm_bvh4

                if not isinstance(bvh, HBMBVH4):
                    _, bvh = build_hbm_bvh4(
                        scene,
                        builder=cfg.resolve_bvh_builder(scene.num_triangles))
                return _hbm4_backend(bvh)
            if not isinstance(bvh, HBMBVH):
                _, bvh = build_hbm_bvh(
                    scene, builder=cfg.resolve_bvh_builder(scene.num_triangles))
            return _hbm_backend(bvh)
        raise ValueError(
            "pallas BVH backend: scene exceeds even the HBM-streaming node "
            "budget; use backend='bvh' for this scene"
        )
    raise ValueError(f"Unknown backend {kind!r}")


def _spread10(v):
    """Interleave a <=10-bit uint32 lane into every 3rd bit (3-D morton)."""
    v = (v | (v << 16)) & jnp.uint32(0x030000FF)
    v = (v | (v << 8)) & jnp.uint32(0x0300F00F)
    v = (v | (v << 4)) & jnp.uint32(0x030C30C3)
    v = (v | (v << 2)) & jnp.uint32(0x09249249)
    return v


def _bounce_sort_keys(o, d, lo, hi, active, mode):
    """uint32 sort key per secondary ray: morton code of the ray origin (the
    previous bounce's hit position), quantized to the scene AABB; 'posdir'
    prefixes the direction octant (3 bits) so opposite-facing rays never share
    a tile's near-to-far child ordering.  Inactive rays key to the max so they
    group together at the end."""
    span = jnp.maximum(hi - lo, 1e-6)
    bits = 9 if mode == "posdir" else 10
    q = (jnp.clip((o - lo) / span, 0.0, 1.0) * ((1 << bits) - 1)).astype(jnp.uint32)
    key = _spread10(q[:, 0]) | (_spread10(q[:, 1]) << 1) | (_spread10(q[:, 2]) << 2)
    if mode == "posdir":
        octant = ((d[:, 0] > 0).astype(jnp.uint32)
                  | ((d[:, 1] > 0).astype(jnp.uint32) << 1)
                  | ((d[:, 2] > 0).astype(jnp.uint32) << 2))
        key = key | (octant << 27)
    return jnp.where(active, key, jnp.uint32(0xFFFFFFFF))


def _resorted_query(backend: Backend, o, d, active, lo, hi, mode):
    """Run the bounce>=1 closest-hit (+fused shadow) query with deactivated
    rays parked outside the scene AABB pointing away, so tiles made entirely
    of them fail the root slab test and exit after one pop; their (miss)
    results are discarded by the caller's ``lit = active & surf.valid`` gate.
    'pos'/'posdir' additionally re-sort rays by coherence key (measured a loss
    on v5e — see RenderConfig.bounce_resort), un-permuting the results."""
    park = hi + (hi - lo) + 1.0
    o = jnp.where(active[:, None], o, park)
    d = jnp.where(active[:, None], d, jnp.asarray([1.0, 0.0, 0.0], jnp.float32))
    if mode == "park":
        if backend.bounce is not None:
            return backend.bounce(o, d, live=active)
        return backend.closest(o, d), None
    keys = _bounce_sort_keys(o, d, lo, hi, active, mode)
    p = jnp.argsort(keys)
    n = o.shape[0]
    inv = jnp.zeros((n,), jnp.int32).at[p].set(jnp.arange(n, dtype=jnp.int32))
    o_s, d_s = o[p], d[p]
    if backend.bounce is not None:
        hit, bits = backend.bounce(o_s, d_s, live=active[p])
        return jax.tree_util.tree_map(lambda x: x[inv], hit), bits[inv]
    hit = backend.closest(o_s, d_s)
    return jax.tree_util.tree_map(lambda x: x[inv], hit), None


def _two_phase_records(sg_scene, origins, dirs, cfg, backend, resort,
                       scene_lo, scene_hi):
    """Phase 1 of the two-phase gradient structure: per-level oracle records
    (o, d, hit, shadow_bits, active-in), geometry/masks only (stop-grad
    scene).  The reflective test and the reflection rays use only
    stop-gradded quantities the one-phase path also never differentiates
    (masks are discrete; o/d feed stop-gradded oracle kernels), so gradients
    are unchanged — only the partial-eval boundary moves."""
    n = origins.shape[0]
    records = []
    o, d = origins, dirs
    active = jnp.ones((n,), bool)
    for level in range(cfg.max_depth):
        live = active if level > 0 else None
        if backend.bounce_refl is not None:
            # Records straight out of the kernel: hit + shadow bits +
            # reflection ray, no XLA reconstruct in the record phase.
            hit, bits, pos, refl, refl_ok = backend.bounce_refl(
                o, d, live=live)
            records.append((o, d, hit, bits, active))
            if level + 1 >= cfg.max_depth:
                break
            active = active & refl_ok
            o = pos + REFLECT_EPS * refl
            d = jnp.where(active[..., None], refl, d)
            continue
        if level > 0 and resort != "off":
            hit, bits = _resorted_query(backend, o, d, active,
                                        scene_lo, scene_hi, resort)
        else:
            hit, bits = backend.bounce(o, d, live=live)
        records.append((o, d, hit, bits, active))
        if level + 1 >= cfg.max_depth:
            break
        # Recorded-surface fast path (round 5): position/normal/ks straight
        # from the recorded (t, u, v) — no Möller–Trumbore recompute, and a
        # [T, 15] gather instead of reconstruct's [T, 28].  Exact here: the
        # whole record phase is stop-gradient domain.
        surf = record_surface(sg_scene, o, d, hit)
        lit = active & surf.valid
        if cfg.reference_quirks:
            reflective = surf.ks[..., 2] > 0.01
        else:
            reflective = jnp.any(surf.ks > 0.01, axis=-1)
        active = lit & reflective
        refl_dir = safe_normalize(reflect(d, surf.normal))
        o = surf.position + REFLECT_EPS * refl_dir
        d = jnp.where(active[..., None], refl_dir, d)
    return records


def _synth_bounce(scene: Scene, backend: Backend):
    """Compose a (Hit, shadow_bits) bounce from the closest/any-hit oracles.

    Backends without a fused bounce kernel (the jnp BVH, the brute XLA path,
    and every scene with sphere primitives — the kernels' in-kernel shadow
    sweeps don't test spheres) can still take the two-phase gradient
    structure: the bits here come from the SAME occluded oracle the one-phase
    ``direct_point_lights`` would call, at positions reconstructed from the
    recorded t (identical math, so phase placement doesn't change results
    beyond oracle tie-break noise)."""
    lights = jax.lax.stop_gradient(scene.point_lights.position)
    num_lights = lights.shape[0]

    def bounce(o, d, live=None):
        from ..ops.linalg import norm
        from ..ops.shading import SHADOW_EPS

        hit = backend.closest(o, d)
        valid = hit.prim_id >= 0
        t = jnp.where(valid, hit.t, 0.0)
        pos = jnp.where(valid[:, None], o + d * t[:, None], 0.0)
        bits = jnp.zeros((o.shape[0],), jnp.int32)
        for li in range(num_lights):
            to_light = lights[li] - pos
            ldir = safe_normalize(to_light)
            dist = norm(to_light)
            shadow_origin = pos + SHADOW_EPS * ldir
            blocked = backend.occluded(shadow_origin, ldir,
                                       dist - SHADOW_EPS)
            bits = bits | (blocked.astype(jnp.int32) << li)
        return hit, bits

    return bounce


def trace_rays(scene: Scene, origins, dirs, cfg: RenderConfig, backend: Backend, key,
               sample_constrain=None):
    """Iterative Whitted trace of a ray batch -> color [N,3].

    Parity notes vs the reference:
    - miss -> black (trace(), main.cpp:289-294),
    - depth cap: contributions beyond ``max_depth`` levels are dropped (main.cpp:267),
    - reflection continues only while ks is non-negligible; the reference's comma-
      operator bug tests only ks.z (main.cpp:246) — reproduced under
      ``cfg.reference_quirks``, otherwise any(ks > 0.01),
    - reflected ray: reflect(dir, shading normal), origin offset by eps=0.001
      (main.cpp:252-256).
    """
    if backend.trace is not None:
        # Forward-only megakernel: the whole bounce loop in one dispatch
        # (cfg.forward_only; differentiation raises via the custom_vjp guard).
        return backend.trace(origins, dirs)

    n = origins.shape[0]
    color = jnp.zeros((n, 3), jnp.float32)
    throughput = jnp.ones((n, 3), jnp.float32)
    active = jnp.ones((n,), bool)

    resort = cfg.resolve_bounce_resort(scene.num_triangles)
    if scene.num_vertices == 0:  # all-sphere scene: no AABB to quantize into
        resort = "off"
    if resort != "off":
        verts = jax.lax.stop_gradient(scene.vertices)
        scene_lo, scene_hi = jnp.min(verts, axis=0), jnp.max(verts, axis=0)

    # Remat eligibility: the backward may only recompute the shade when that
    # recompute is pure XLA math from recorded oracle outputs — i.e. the
    # fused-bounce path (shadow bits recorded) with no stochastic
    # spherical-light sampling to re-run.
    remat_ok = (cfg.resolve_remat_shade()
                and backend.bounce is not None
                and scene.spherical_lights.position.shape[0] == 0)

    # Two-phase structure (cfg.grad_two_phase): oracle records first (all
    # bounces, materials stop-gradded), then the differentiable shade chain
    # over them.  Same eligibility conditions as remat (the record phase must
    # capture everything the shade needs: fused shadow bits, no stochastic
    # spherical sampling).  forward_only renders on scenes past the trace
    # megakernel's cap take it too when resolve_fwd_shade_kernel (host-side,
    # in render()/run_bench) resolved the routing 'on' — see the
    # fwd_shade_kernel knob for the measured rule.
    fwd_only_kernel = (cfg.forward_only and backend.trace is None
                       and cfg.fwd_shade_kernel == "on")
    # Spherical-light scenes take the two-phase structure too (round 5,
    # VERDICT r4 missing #1): phase 1 additionally records per-level
    # soft-shadow visibility fractions (shading.spherical_fracs — an oracle,
    # same PRNG stream as the one-phase path), which phase 2's shade consumes
    # as discrete inputs scaling the differentiable Phong terms.
    two_phase_ok = ((cfg.resolve_grad_two_phase() or fwd_only_kernel)
                    and sample_constrain is None)
    if two_phase_ok and backend.bounce is None:
        # No fused bounce kernel (jnp/brute backends, sphere scenes):
        # synthesize one from the closest/any-hit oracles so the two-phase
        # restructure — and with it the fused shade kernel — still applies.
        backend = backend._replace(bounce=_synth_bounce(scene, backend))

    # Fused shade kernel: two-phase only (it consumes the phase-1 records'
    # hit ids + shadow bits; its custom VJP emits cotangents for materials,
    # lights, geometry tables, AND the ray origins/dirs, so the reflected-ray
    # chain below carries the full vertex-grad term).
    use_shade_kernel = False
    if two_phase_ok and cfg.resolve_shade_kernel():
        from ..ops.pallas_shade import shade_fused_pallas, supports_shade_kernel

        use_shade_kernel = supports_shade_kernel(scene)

    def shade_level(scene_, o_, d_, hit_, bits_, lkey_, soft_fracs_=None):
        surf_ = reconstruct_hit(scene_, o_, d_, hit_)
        direct_ = shading.direct_light(
            scene_, d_, surf_, backend.occluded, lkey_,
            soft_shadow_samples=cfg.soft_shadow_samples,
            sample_chunk=cfg.soft_shadow_chunk,
            shadow_bits=bits_,
            sample_constrain=sample_constrain,
            # Sample-axis sharding owns the sample stream; the in-kernel
            # sampler yields to it.
            soft_vis_fn=None if sample_constrain is not None else backend.soft_vis,
            soft_fracs=soft_fracs_,
        )
        return direct_, surf_.valid, surf_.ks, surf_.normal, surf_.position

    if remat_ok:
        shade_level = jax.checkpoint(shade_level)

    if two_phase_ok:
        # --- Phase 1: oracle records, geometry/masks only (stop-grad scene).
        # The reflective test and the reflection rays use only stop-gradded
        # quantities the one-phase path also never differentiates (masks are
        # discrete; o/d feed stop-gradded oracle kernels), so gradients are
        # unchanged — only the partial-eval boundary moves.
        sg_scene = jax.tree_util.tree_map(jax.lax.stop_gradient, scene)
        if backend.record_trace is not None:
            records = backend.record_trace(origins, dirs)
        else:
            records = _two_phase_records(sg_scene, origins, dirs, cfg,
                                         backend, resort,
                                         scene_lo if resort != "off" else None,
                                         scene_hi if resort != "off" else None)

        # Spherical-light oracle records: per-level visibility fractions at
        # the recorded hit positions (o + t*d, zeroed on miss — Surface miss
        # semantics), with the SAME per-level/per-light/per-chunk key folding
        # as the one-phase path, so the sampled visibility is identical.
        num_sph = scene.spherical_lights.position.shape[0]
        soft_fracs_levels = None
        if num_sph > 0:
            soft_fracs_levels = []
            for level, (o_rec, d_rec, hit_l, _, _) in enumerate(records):
                valid_l = hit_l.prim_id >= 0
                t_l = jnp.where(valid_l, hit_l.t, 0.0)
                pos_l = jnp.where(valid_l[:, None],
                                  o_rec + d_rec * t_l[:, None], 0.0)
                fr = shading.spherical_fracs(
                    sg_scene, pos_l, backend.occluded,
                    jax.random.fold_in(key, level),
                    num_samples=cfg.soft_shadow_samples,
                    sample_chunk=cfg.soft_shadow_chunk,
                    soft_vis_fn=backend.soft_vis)
                soft_fracs_levels.append(fr)

        # --- Phase 2: differentiable shade chain over the records, with the
        # bounce rays RECOMPUTED differentiably from the previous level's
        # surface (position + eps * reflect).  The recorded o/d are primal-
        # equal byproducts of phase 1 (same reconstruct math on the same hit
        # ids) and are unused past level 0; recomputing them here threads the
        # reflected-ray-origin dependence through the graph, so vertex grads
        # match the one-phase path EXACTLY (VERDICT r3 item 3 — the two-phase
        # structure is no longer material/light-only).  Masks stay the
        # recorded primal ones (discrete, identical to a recompute).
        # 'recorded' keeps the r3 contract (phase 2 consumes the stop-gradded
        # phase-1 rays; drops the reflected-origin vertex term — selected by
        # optimize()/run_bench only when that term is structurally zero).
        # forward_only never differentiates, so the recorded rays are always
        # right there.
        exact_rays = (cfg.resolve_two_phase_rays() == "exact"
                      and not cfg.forward_only)
        color = jnp.zeros((n, 3), jnp.float32)
        throughput = jnp.ones((n, 3), jnp.float32)
        o_l, d_l = origins, dirs
        for level, (o_rec, d_rec, hit_l, bits_l, active_l) in enumerate(records):
            if not exact_rays and level > 0:
                o_l, d_l = o_rec, d_rec
            fr_l = (soft_fracs_levels[level]
                    if soft_fracs_levels is not None else None)
            if use_shade_kernel:
                direct, valid, ks, normal, position = shade_fused_pallas(
                    scene, o_l, d_l, hit_l, bits_l,
                    gather=cfg.resolve_shade_gather(), soft_fracs=fr_l)
            else:
                lkey = jax.random.fold_in(key, level)
                direct, valid, ks, normal, position = shade_level(
                    scene, o_l, d_l, hit_l, bits_l, lkey, fr_l)
            lit = active_l & valid
            color = color + throughput * direct * lit[..., None].astype(jnp.float32)
            throughput = throughput * ks
            if level + 1 >= len(records) or not exact_rays:
                continue
            active_next = records[level + 1][4]
            refl_dir = safe_normalize(reflect(d_l, normal))
            o_l = position + REFLECT_EPS * refl_dir
            d_l = jnp.where(active_next[..., None], refl_dir, d_l)
        return color

    o, d = origins, dirs
    for level in range(cfg.max_depth):
        shadow_bits = None
        if level > 0 and resort != "off":
            hit, shadow_bits = _resorted_query(backend, o, d, active,
                                               scene_lo, scene_hi, resort)
        elif backend.bounce is not None:
            hit, shadow_bits = backend.bounce(
                o, d, live=active if level > 0 else None)
        else:
            hit = backend.closest(o, d)
        lkey = jax.random.fold_in(key, level)
        direct, valid, ks, normal, position = shade_level(
            scene, o, d, hit, shadow_bits, lkey)
        lit = active & valid
        color = color + throughput * direct * lit[..., None].astype(jnp.float32)

        if level + 1 >= cfg.max_depth:
            break
        if cfg.reference_quirks:
            # Comma-operator bug: only ks.z is tested (main.cpp:246).
            reflective = ks[..., 2] > 0.01
        else:
            reflective = jnp.any(ks > 0.01, axis=-1)
        active = lit & reflective
        throughput = throughput * ks
        refl_dir = safe_normalize(reflect(d, normal))
        o = position + REFLECT_EPS * refl_dir
        d = jnp.where(active[..., None], refl_dir, d)

    return color


import functools as _functools


@_functools.lru_cache(maxsize=32)
def _ray_order_perm(h: int, w: int, order: str, tile_rows: int):
    """Pixel->ray permutation (and its inverse) grouping rays so each kernel
    tile covers a coherent image region.  'blocked': (tile_rows x 128)-pixel
    rectangles (one rectangle per ray tile — pure regrouping, no curve);
    'morton': Z-order curve.  Returned as numpy constants (host-computed; the
    gather itself costs two [N,3] shuffles, negligible next to traversal).
    Per-ray render results are permutation-invariant — only tile grouping
    (hence tile-synchronous divergence) changes.
    """
    import numpy as np

    ys, xs = np.mgrid[0:h, 0:w]
    if order == "blocked":
        bh, bw = tile_rows, 128
        nbw = -(-w // bw)
        key = ((ys // bh) * nbw + (xs // bw)).astype(np.int64)
        sub = ((ys % bh) * bw + (xs % bw)).astype(np.int64)
        k = key * (bh * bw) + sub
    elif order == "morton":
        def spread(v):
            v = v.astype(np.uint64)
            v = (v | (v << 16)) & np.uint64(0x0000FFFF0000FFFF)
            v = (v | (v << 8)) & np.uint64(0x00FF00FF00FF00FF)
            v = (v | (v << 4)) & np.uint64(0x0F0F0F0F0F0F0F0F)
            v = (v | (v << 2)) & np.uint64(0x3333333333333333)
            v = (v | (v << 1)) & np.uint64(0x5555555555555555)
            return v

        k = (spread(xs) | (spread(ys) << np.uint64(1))).reshape(h, w)
    else:
        raise ValueError(f"unknown ray order {order!r}")
    perm = np.argsort(k.reshape(-1), kind="stable").astype(np.int32)
    inv = np.argsort(perm, kind="stable").astype(np.int32)
    return perm, inv


def _render_flat(scene: Scene, camera: Camera, cfg: RenderConfig, backend: Backend,
                 key, offset=(0.0, 0.0), sample_constrain=None):
    origins, dirs = cam_ops.generate_rays(camera, cfg.height, cfg.width, offset=offset)
    order = cfg.resolve_ray_order(scene.num_triangles)
    perm = inv = None
    if order != "raster":
        perm, inv = _ray_order_perm(cfg.height, cfg.width, order,
                                    cfg.resolve_bvh_tile_rows())
        origins, dirs = origins[perm], dirs[perm]
    if cfg.ray_chunk and cfg.ray_chunk < origins.shape[0]:
        num = origins.shape[0]
        chunk = cfg.ray_chunk
        pad = (-num) % chunk
        o = jnp.pad(origins, ((0, pad), (0, 0)))
        d = jnp.pad(dirs, ((0, pad), (0, 0)), constant_values=1.0)
        o = o.reshape(-1, chunk, 3)
        d = d.reshape(-1, chunk, 3)
        colors = jax.lax.map(
            lambda od: trace_rays(scene, od[0], od[1], cfg, backend, key,
                                  sample_constrain=sample_constrain), (o, d)
        )
        color = colors.reshape(-1, 3)[:num]
    else:
        color = trace_rays(scene, origins, dirs, cfg, backend, key,
                           sample_constrain=sample_constrain)
    if inv is not None:
        color = color[inv]
    return color.reshape(cfg.height, cfg.width, 3)


def render_image(scene: Scene, camera: Camera, cfg: RenderConfig,
                 backend: Optional[Backend] = None, bvh: Optional[BVH] = None,
                 key=None, sample_constrain=None):
    """Full render: AA supersampling + bloom + motion blur post-passes.

    This is the functional equivalent of ``renderRayTracing`` (main.cpp:648-720).
    Returns [H, W, 3] float32 in image-row order (row 0 = top), linear values
    (clamp/quantize happens at write time, parity with screen.cpp:38-49).

    ``sample_constrain``: optional sharding constraint for the soft-shadow
    sample axis (parallel/sharding.py::sample_sharded_render).
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    if backend is None:
        backend = make_backend(scene, cfg, bvh=bvh)

    from ..ops import effects

    if cfg.bloom and cfg.reference_quirks and cfg.anti_aliasing and not cfg.motion_blur:
        # The reference's AA+bloom path thresholds the running subsample sum
        # and its final setPixel REPLACES the AA average (main.cpp:663-705);
        # it cannot be expressed as a post-pass on the supersampled image.
        return effects.bloom_quirk_aa(
            lambda off: _render_flat(scene, camera, cfg, backend, key,
                                     offset=off, sample_constrain=sample_constrain),
            cfg,
        )

    def base_render(camera_, key_):
        if cfg.anti_aliasing:
            return effects.supersample_render(
                lambda off: _render_flat(scene, camera_, cfg, backend, key_,
                                         offset=off, sample_constrain=sample_constrain),
                cfg,
            )
        return _render_flat(scene, camera_, cfg, backend, key_,
                            sample_constrain=sample_constrain)

    if cfg.motion_blur:
        img = effects.motion_blur(base_render, camera, cfg, key)
    else:
        img = base_render(camera, key)

    if cfg.bloom:
        img = effects.bloom(img, cfg)
    return img


def render_rows(scene: Scene, camera: Camera, cfg: RenderConfig, rows: slice,
                backend: Optional[Backend] = None, bvh: Optional[BVH] = None,
                key=None, offset=(0.0, 0.0)):
    """Render only image rows [rows.start, rows.stop) -> [k, W, 3].

    The row-tile primitive behind multi-host output assembly (each host renders
    and writes its ``host_local_rows`` slice without an all-gather) and failure
    recovery (re-run one failed tile instead of the whole frame) — SURVEY §5
    failure-detection row.  AA supersampling and motion blur are per-pixel and
    compose row-locally; bloom gathers a 21x21 neighborhood and therefore needs
    the full frame (raises).
    """
    if cfg.bloom:
        raise ValueError("render_rows cannot apply bloom: it gathers a 21x21 "
                         "pixel neighborhood across row-tile boundaries; "
                         "apply ops.effects.bloom on the assembled frame")
    if key is None:
        key = jax.random.PRNGKey(0)
    if backend is None:
        backend = make_backend(scene, cfg, bvh=bvh)
    start, stop, step = rows.indices(cfg.height)
    if step != 1:
        raise ValueError("render_rows requires a contiguous row slice")
    k = stop - start

    from ..ops import effects

    def rows_flat(camera_, key_, off):
        ndc = cam_ops.pixel_ndc(cfg.height, cfg.width, offset=off)[start:stop]
        origin, dirs = cam_ops.generate_ray(camera_, ndc.reshape(-1, 2))
        origins = jnp.broadcast_to(origin, dirs.shape)
        color = trace_rays(scene, origins, dirs, cfg, backend, key_)
        return color.reshape(k, cfg.width, 3)

    def base(camera_, key_):
        if cfg.anti_aliasing:
            return effects.supersample_render(
                lambda off: rows_flat(camera_, key_, off), cfg)
        return rows_flat(camera_, key_, offset)

    if cfg.motion_blur:
        return effects.motion_blur(base, camera, cfg, key)
    return base(camera, key)


def effective_max_depth(scene: Scene, cfg: RenderConfig) -> int:
    """Host-side bounce-count shortcut: if no material can pass the reflection
    continue-test (``any(ks > 0.01)``, or ``ks.z > 0.01`` under reference quirks,
    main.cpp:246), every bounce past the first contributes exactly zero — skip
    compiling them.  Only applies when the scene is concrete (outside jit)."""
    import numpy as np

    try:
        ks = np.asarray(scene.materials.ks)
        sks = np.asarray(scene.spheres.ks)
    except Exception:  # traced values: can't inspect, keep configured depth
        return cfg.max_depth
    if cfg.reference_quirks:
        reflective = (ks[:, 2] > 0.01).any() or (sks.size > 0 and (sks[:, 2] > 0.01).any())
    else:
        reflective = (ks > 0.01).any() or (sks.size > 0 and (sks > 0.01).any())
    return cfg.max_depth if reflective else min(cfg.max_depth, 1)


def resolve_fwd_shade_kernel(scene: Scene, cfg: RenderConfig) -> RenderConfig:
    """Host-side resolution of cfg.fwd_shade_kernel='auto' (see the knob's
    comment for the measured rule).  No-op on traced scenes or when the knob
    is already concrete."""
    import dataclasses

    import numpy as np

    if not cfg.forward_only or cfg.fwd_shade_kernel != "auto":
        return cfg
    try:
        ks = np.asarray(scene.materials.ks)
        tri_mat = np.asarray(scene.tri_material)
    except Exception:  # traced: keep 'auto' (= off at trace time)
        return cfg
    from ..ops.pallas_shade import supports_shade_kernel

    on = False
    # Spherical-light scenes keep the XLA forward path: the fwd+bwd kernel
    # win is measured, the forward-only one is not (round-4 wash) — don't
    # widen unmeasured forward routing with the round-5 spherical support.
    if (cfg.max_depth >= 2 and cfg.resolve_shade_kernel()
            and scene.spherical_lights.position.shape[0] == 0
            and supports_shade_kernel(scene) and scene.num_triangles > 0):
        refl_frac = float((ks[tri_mat] > 0.01).any(axis=-1).mean())
        on = refl_frac > 0.05
    return dataclasses.replace(cfg, fwd_shade_kernel="on" if on else "off")


def needs_bvh(cfg: RenderConfig, num_tris: int) -> bool:
    """Whether the resolved backend requires a prebuilt acceleration structure
    (host-side build — must happen outside jit)."""
    kind = cfg.resolve_backend(num_tris)
    return kind == "bvh" or (kind == "pallas" and num_tris > cfg.pallas_brute_max_tris)


def build_accel(scene: Scene, cfg: RenderConfig):
    """Host-side acceleration-structure build for the resolved backend: a BVH for
    the jnp traversal, a PackedBVH/HBMBVH for the Pallas kernels, or None.

    Memoized on the identity of the scene's triangle buffer: the build is a
    host-side Python pass plus a device upload (512 B/node + 36 B/triangle), so
    rebuilding it inside a render loop would dominate the render itself —
    ``render(bvh=None)`` calls this every frame and relies on the cache.
    """
    kind = cfg.resolve_backend(scene.num_triangles)
    builder = cfg.resolve_bvh_builder(scene.num_triangles)
    if kind == "bvh":
        return _cached_accel(scene, ("bvh", builder),
                             lambda: build_bvh(scene, builder=builder))
    if kind == "pallas" and scene.num_triangles > cfg.pallas_brute_max_tris:
        from ..ops.pallas_bvh import (build_hbm_bvh, build_packed_bvh,
                                      supports_pallas_bvh,
                                      supports_soft_shadow_kernel_bvh)

        if supports_pallas_bvh(scene):
            leaf = cfg.resolve_pallas_bvh_max_leaf()
            wide_mode = cfg.resolve_bvh_wide()
            wide = wide_mode in ("4", "8")
            wide_w = int(wide_mode) if wide else 4
            soft_cone = (scene.spherical_lights.position.shape[0] > 0
                         and cfg.resolve_soft_shadow_kernel()
                         and supports_soft_shadow_kernel_bvh(scene)
                         and cfg.resolve_soft_shadow_tile() == "cone")
            if (wide and scene.spherical_lights.position.shape[0] > 0
                    and cfg.resolve_soft_shadow_kernel()
                    and supports_soft_shadow_kernel_bvh(scene)
                    and not soft_cone):
                # Mirror make_backend's soft-sampler routing: only the
                # per-SAMPLE sampler forces the binary tree; the cone
                # sampler has a 4-wide variant.
                wide = False
            sleaf = cfg.resolve_soft_bvh_max_leaf()
            sbuilder = cfg.resolve_soft_bvh_builder()
            if wide:
                from ..ops.pallas_bvh4 import build_packed_bvh4

                primary = _cached_accel(
                    scene, ("pallas-vmem4", leaf, builder, wide_w),
                    lambda: build_packed_bvh4(scene, max_leaf=leaf,
                                              builder=builder,
                                              width=wide_w)[1])
                if soft_cone:
                    soft = _cached_accel(
                        scene, ("pallas-vmem4-soft", sleaf, sbuilder, wide_w),
                        lambda: build_packed_bvh4(scene, max_leaf=sleaf,
                                                  builder=sbuilder,
                                                  width=wide_w)[1])
                    return AccelBundle(primary, soft)
                return primary
            primary = _cached_accel(
                scene, ("pallas-vmem", leaf, builder),
                lambda: build_packed_bvh(scene, max_leaf=leaf, builder=builder)[1])
            if soft_cone:
                soft = _cached_accel(
                    scene, ("pallas-vmem-soft", sleaf, sbuilder),
                    lambda: build_packed_bvh(scene, max_leaf=sleaf,
                                             builder=sbuilder)[1])
                return AccelBundle(primary, soft)
            return primary
        if cfg.resolve_bvh_wide_hbm() == "4":
            from ..ops.pallas_bvh4 import build_hbm_bvh4

            return _cached_accel(
                scene, ("pallas-hbm4", builder),
                lambda: build_hbm_bvh4(scene, builder=builder)[1])
        return _cached_accel(scene, ("pallas-hbm", builder),
                             lambda: build_hbm_bvh(scene, builder=builder)[1])
    return None


_ACCEL_CACHE: dict = {}


def _cached_accel(scene: Scene, tag: tuple, builder):
    """Accel memo keyed on the triangle/vertex buffer identities (geometry only
    — materials and lights don't affect the tree).  Entries are evicted when the
    keying buffers are garbage-collected, so a stale id() can never be reused."""
    import weakref

    tris, verts = scene.triangles, scene.vertices
    key = (id(tris), id(verts), int(scene.num_triangles)) + tag
    hit = _ACCEL_CACHE.get(key)
    if hit is not None:
        return hit
    accel = _ACCEL_CACHE[key] = builder()
    for buf in (tris, verts):
        try:
            weakref.finalize(buf, _ACCEL_CACHE.pop, key, None)
        except TypeError:  # non-weakrefable leaf (e.g. numpy scalar): no eviction
            pass
    return accel


import functools


@functools.partial(jax.jit, static_argnames=("cfg",))
def _render_jit(scene, camera, bvh, key, cfg):
    backend = make_backend(scene, cfg, bvh=bvh)
    return render_image(scene, camera, cfg, backend=backend, key=key)


def render(scene: Scene, camera: Camera, cfg: RenderConfig, key=None, jit: bool = True,
           bvh=None):
    """User-facing render entry point.

    The jitted computation is cached on the (hashable) config + pytree structure —
    repeated calls with the same cfg re-trace nothing (a fresh closure per call
    costs ~1 s of tracing overhead per render, which would dwarf the render
    itself).
    """
    import dataclasses

    depth = effective_max_depth(scene, cfg)
    if depth != cfg.max_depth:
        cfg = dataclasses.replace(cfg, max_depth=depth)
    cfg = resolve_fwd_shade_kernel(scene, cfg)
    if bvh is None and needs_bvh(cfg, scene.num_triangles):
        bvh = build_accel(scene, cfg)
    if key is None:
        key = jax.random.PRNGKey(0)

    if not jit:
        backend = make_backend(scene, cfg, bvh=bvh)
        return render_image(scene, camera, cfg, backend=backend, key=key)
    return _render_jit(scene, camera, bvh, key, cfg)
