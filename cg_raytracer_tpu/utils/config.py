"""Render configuration.

Reference capability: the reference's "config system" is compile-time defines plus
ImGui globals (``bloom``/``blur``/``antiAliasing`` at main.cpp:33-35, scene/light
widgets at main.cpp:769-882).  Every interactive tunable becomes a field here; the
dataclass is frozen/hashable so it can be a static jit argument.
"""
from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    width: int = 800  # reference windowResolution (main.cpp:29)
    height: int = 800
    max_depth: int = 2  # reflection recursion cap (trace(), main.cpp:267)
    anti_aliasing: bool = False  # 2x2 supersampling (main.cpp:663-687)
    bloom: bool = False  # threshold + 21x21 box blur (main.cpp:586-628)
    motion_blur: bool = False  # 16 lookAt-jittered renders averaged (main.cpp:318-584)
    soft_shadow_samples: int = 200  # shadow rays per spherical-light shading (main.cpp:176)
    soft_shadow_chunk: int = 20  # scan chunk for the sample axis (memory bound)
    backend: str = "auto"  # 'brute' | 'bvh' | 'pallas' | 'auto'
    # Spherical-light soft shadows via the in-kernel Pallas sampler (TPU hardware
    # PRNG, samples never leave VMEM).  'auto' = on when the resolved backend is
    # the Pallas brute kernel on TPU.  NOTE: different (statistically equivalent)
    # sample stream than the jax.random XLA path — renders with the kernel are
    # deterministic but not bitwise-equal to kernel-off renders.
    soft_shadow_kernel: str = "auto"  # 'auto' | 'on' | 'off'
    # Rematerialize the per-level reconstruct+shade in the backward pass:
    # instead of storing ~40 f32/ray of surface residuals per bounce, the VJP
    # recomputes them from the (tiny) recorded oracle outputs (hit ids +
    # shadow bits).  Only applies on the fused-bounce path with point lights
    # (spherical-light sampling must not re-run in the backward).  'auto' =
    # measured best (scripts/tpu_r3_sweep.py bwd_probe).
    remat_shade: str = "auto"
    # In-kernel BVH soft-shadow sampler layout: 'sample' = one traversal per
    # sample over a pixel tile (pallas_bvh.py::_soft_bvh_prng_kernel); 'cone'
    # = tile rows are pixels and tile LANES are samples, so one traversal per
    # 128 samples serves the whole tile (all samples of a pixel share an
    # origin and a narrow cone toward the light — main.cpp:166-218).
    # 'auto' = measured best per scene class (scripts/tpu_r3_sweep.py
    # soft_cone_ab, r3_results.jsonl).
    soft_shadow_tile: str = "auto"
    # Declares that no gradients will be taken through this render: small
    # all-triangle point-light scenes then route the ENTIRE forward trace
    # (every bounce + shading) through one Pallas megakernel
    # (ops/pallas_kernels.py::trace_pallas).  Differentiating such a render
    # raises (custom_vjp guard) instead of silently returning zero grads.
    forward_only: bool = False
    ray_chunk: int = 0  # >0: process rays in chunks of this size (host loop)
    tri_chunk: int = 2048  # triangle tile per brute-force scan step
    reference_quirks: bool = False  # reproduce documented reference bugs (SURVEY §0)
    # auto backend: brute force below this triangle count, BVH above.
    brute_force_max_tris: int = 4096
    # Within the pallas backend: tiled brute-force kernel below this count, BVH
    # traversal kernel above.  Measured crossover on v5e is a few hundred tris
    # (monkey @968: brute 166 ms vs BVH 54 ms per 640K-ray frame).
    pallas_brute_max_tris: int = 256
    # Ray-tile height (x 128 lanes) for the tile-synchronous BVH kernels.
    # A node is visited iff *any* ray in the tile wants it, so smaller tiles
    # diverge less on mesh scenes at the cost of more grid programs.
    # 0 = auto (measured best, scripts/tpu_tile_ab.py).
    bvh_tile_rows: int = 0
    # Ray ordering before tile packing: 'raster' | 'blocked' | 'morton' |
    # 'auto'.  'blocked' regroups rays so one kernel tile covers a compact
    # (tile_rows x 128)-pixel rectangle instead of a thin full-width strip;
    # 'morton' uses a Z-order curve.  Pure permutation — per-ray results are
    # identical; only tile grouping (and thus divergence) changes.
    ray_order: str = "auto"

    # Max triangles per BVH leaf for the VMEM Pallas kernel, in units the
    # packed layout rounds to whole 14-triangle rows.  Wider leaves halve the
    # tile-synchronous pop count (the scalar-overhead-dominated part) for a
    # small increase in dense MT vector work.  0 = auto.
    pallas_bvh_max_leaf: int = 0

    # Between-bounce ray handling for the tile-synchronous BVH kernels.
    # 'park': deactivated rays (missed / non-reflective at the previous bounce)
    # are parked outside the scene AABB pointing away, so tiles made entirely
    # of them fail the root slab test and exit after one pop — without it a
    # missed background pixel re-traverses the whole tree every bounce with
    # its stale ray.  'pos'/'posdir' additionally re-sort bounce>=1 rays by a
    # morton code of the hit position (+ direction octant) — measured a LOSS
    # on v5e (scripts/tpu_resort_ab.py: bounce origins are already
    # image-coherent and the 640K argsort costs more than it recovers); kept
    # as knobs for other geometry.  Results are identical in all modes (parked
    # rays' hits are discarded; sorting is a pure permutation).
    # 'auto' | 'off' | 'park' | 'pos' | 'posdir'.
    bounce_resort: str = "auto"

    def resolve_bounce_resort(self, num_tris: int, platform: str | None = None) -> str:
        if self.bounce_resort not in ("auto", "off", "park", "pos", "posdir"):
            raise ValueError(
                f"bounce_resort must be 'auto' | 'off' | 'park' | 'pos' | "
                f"'posdir', got {self.bounce_resort!r}")
        if self.bounce_resort != "auto":
            return self.bounce_resort
        # Only the tile-synchronous BVH kernels are grouping-sensitive; the
        # brute kernels sweep every triangle for every tile regardless.
        if (self.resolve_backend(num_tris, platform) == "pallas"
                and num_tris > self.pallas_brute_max_tris):
            return "park"
        return "off"

    # Node width for the VMEM tile-synchronous BVH kernel: '2' = binary
    # (pallas_bvh.py), '4' = 4-wide collapsed tree (pallas_bvh4.py — one pop
    # descends two levels: no popped-node re-slab, half the scalar-bound pops,
    # scalar t-bound pruning).  'auto' = measured best (scripts/tpu_r3_sweep.py
    # bvh4_ab, r3_results.jsonl).
    bvh_wide: str = "auto"

    def resolve_bvh_wide(self) -> str:
        # '8' (round 4): one pop descends THREE binary levels — 8 slab tests
        # + a 19-comparator sort per pop, half the 4-wide pop count.  A/B'd
        # by scripts/tpu_r4b.py; auto stays '4' unless it wins.
        if self.bvh_wide not in ("auto", "2", "4", "8"):
            raise ValueError(
                f"bvh_wide must be 'auto' | '2' | '4' | '8', got "
                f"{self.bvh_wide!r}")
        if self.bvh_wide != "auto":
            return self.bvh_wide
        # Measured on v5e (scripts/tpu_r3_sweep.py bvh4_ab, r3_results.jsonl):
        # the 4-wide kernel wins every VMEM BVH scene — teacup 101.6 -> 93.3,
        # dragon 54.8 -> 50.9, monkey 40.6 -> 39.7 ms (800^2 fwd steady).
        return "4"

    # Node width for the HBM-streaming kernel ('auto' | '2' | '4').  '4' =
    # the 4-wide collapsed tree + per-leaf DMA pipeline
    # (pallas_bvh4.py::_pop_step4_hbm): half the scalar-bound pops, and the
    # collapse halves the node table so the same VMEM budget affords
    # narrower leaves (less DMA per leaf).  Kept separate from bvh_wide:
    # the VMEM and streaming kernels have different measured optima.
    bvh_wide_hbm: str = "auto"

    def resolve_bvh_wide_hbm(self) -> str:
        if self.bvh_wide_hbm not in ("auto", "2", "4"):
            raise ValueError(
                f"bvh_wide_hbm must be 'auto' | '2' | '4', got "
                f"{self.bvh_wide_hbm!r}")
        if self.bvh_wide_hbm != "auto":
            return self.bvh_wide_hbm
        # Measured on v5e (scripts/tpu_r4b.py / tpu_r4d.py donut stages,
        # r4_results.jsonl): the 4-wide DMA-pipelined kernel wins — donut
        # 800^2 fwd 79.9 (binary/rows32) -> 66.9 ms (wide/il2/rows32), images
        # bitwise identical; narrower collapsed-table leaves (2 rows vs 4)
        # halve the per-leaf DMA volume.
        return "4"

    # Multi-stack interleaving for the 4-wide VMEM kernel: 'N' splits each ray
    # tile into N independent row bands traversing in ONE fused loop (one pop
    # each per iteration).  Pops are scalar/reduction-bound (round-2 measured
    # facts); independent chains let the scheduler overlap one band's scalar
    # pop/sort with another's vector slab/MT work, and make smaller tiles
    # (less tile-union divergence) affordable.  'auto' = measured best
    # (scripts/tpu_il_ab.py, r3_results.jsonl).
    bvh_interleave: str = "auto"

    def resolve_bvh_interleave(self, hbm: bool = False) -> int:
        if self.bvh_interleave not in ("auto", "1", "2", "4"):
            raise ValueError(
                f"bvh_interleave must be 'auto' | '1' | '2' | '4', got "
                f"{self.bvh_interleave!r}")
        if self.bvh_interleave != "auto":
            n = int(self.bvh_interleave)
        else:
            # Measured on v5e (scripts/tpu_il_ab.py): interleave 2 wins at
            # every tile size — with 32-row tiles: teacup 68.8 -> 64.1,
            # dragon 39.0 -> 37.9; at the old 64-row default the gap is
            # larger (teacup 89.2 -> 70.8, dragon 48.1 -> 38.6).  The HBM
            # streaming variant gets the same default: its pops additionally
            # stall on DMA waits, which a second independent band hides.
            n = 2
        rows = self.resolve_bvh_tile_rows(wide=not hbm, hbm=hbm)
        while n > 1 and rows % (8 * n):
            # Bands must stay 8-sublane aligned.
            n //= 2
        return n

    # Internal-pop structure for the wide VMEM kernels (round 5, VERDICT r4
    # item 1 — 85% of mesh frame time is per-event serialization):
    # 'base' = width separate full-tile reduce->scalar crossings + the
    # compare-exchange push ordering; 'batched' = per-child sublane partials
    # stacked through ONE [8,128] lane-reduce + ONE vector->VMEM store, the
    # scalar unit reads the width results back with plain loads;
    # 'nosort'/'batched_nosort' additionally drop the ordering network
    # (static reverse push order; the pop-time staleness bound absorbs
    # mis-ordering at the cost of extra pops).  'auto' = measured best
    # (scripts/tpu_r5a.py pop_ab).
    bvh_pop: str = "auto"

    def resolve_bvh_pop(self) -> str:
        if self.bvh_pop not in ("auto", "base", "batched", "nosort",
                                "batched_nosort"):
            raise ValueError(
                f"bvh_pop must be 'auto' | 'base' | 'batched' | 'nosort' | "
                f"'batched_nosort', got {self.bvh_pop!r}")
        if self.bvh_pop != "auto":
            return self.bvh_pop
        # Measured on v5e (scripts/tpu_r5a.py pop_ab, r5_results.jsonl):
        # 'batched' wins every wide-VMEM scene — teacup 54.85 -> 50.11,
        # dragon 37.38 -> 34.40, monkey 35.52 -> 34.10 ms (800^2 fwd steady,
        # within-session A/B), hits bitwise-identical.  'nosort' loses
        # (unordered pushes buy extra pops: dragon 42.3).
        return "batched"

    # BVH split rule: 'median' (the reference's rule, bvh.cpp:192-207) or
    # 'sah' (binned surface-area heuristic — tighter boxes shrink the node
    # union a tile-synchronous ray tile must visit).  'auto' currently means
    # 'median'; flipped per-backend only when the TPU A/B sweep
    # (scripts/tpu_tile_ab.py / ab_results.jsonl) shows SAH winning.  Pure
    # build-side change: the oracle contract is unchanged (tie-breaks on
    # coincident-t edges may differ).
    bvh_builder: str = "auto"

    def resolve_bvh_builder(self, num_tris: int, platform: str | None = None) -> str:
        if self.bvh_builder not in ("auto", "median", "sah"):
            raise ValueError(
                f"bvh_builder must be 'auto' | 'median' | 'sah', got "
                f"{self.bvh_builder!r}")
        if self.bvh_builder != "auto":
            return self.bvh_builder
        # Measured on v5e (scripts/tpu_r3_sweep.py sah_ab, r3_results.jsonl):
        # SAH's tighter boxes shrink the tile-union through the VMEM
        # tile-synchronous kernels (teacup 101 -> 96, dragon 55 -> 51 ms) but
        # LOSE on the HBM-streaming scene (donut 108 -> 111 — wider depth-
        # capped leaves blunt the advantage); jnp/brute paths are insensitive.
        from ..ops.pallas_bvh import VMEM_MAX_TRIS

        if (self.resolve_backend(num_tris, platform) == "pallas"
                and self.pallas_brute_max_tris < num_tris <= VMEM_MAX_TRIS):
            return "sah"
        return "median"

    def resolve_pallas_bvh_max_leaf(self) -> int:
        if self.pallas_bvh_max_leaf:
            if self.pallas_bvh_max_leaf < 1:
                raise ValueError("pallas_bvh_max_leaf must be positive")
            return self.pallas_bvh_max_leaf
        # Measured on v5e (scripts/tpu_tile_ab.py sweep 3, 64-row morton
        # tiles): 56 > 28 > 14 on teacup (118->106 ms) and dragon
        # (56->51 ms) — wider leaves cut scalar-overhead-dominated pops;
        # the extra MT vector work is cheaper than the pops it removes.
        return 56

    def resolve_bvh_tile_rows(self, wide: bool = False,
                              hbm: bool = False) -> int:
        if self.bvh_tile_rows:
            if self.bvh_tile_rows % 8 or not (8 <= self.bvh_tile_rows <= 256):
                raise ValueError(
                    f"bvh_tile_rows must be a multiple of 8 in [8, 256], got "
                    f"{self.bvh_tile_rows}")
            return self.bvh_tile_rows
        if hbm:
            # Measured on v5e (r3_results.jsonl donut_rows; confirmed for
            # the 4-wide variant by r4_results.jsonl donut/donut2 sweeps:
            # rows32 66.9 < rows16 67.5-70.6 < rows8 69.3 < rows48 74.0):
            # 32-row tiles.  Smaller tile-unions mean fewer leaf-row DMAs,
            # and the DMA waits already hide the extra per-pop overhead.
            return 32
        if wide:
            # Measured on v5e for the interleaved 4-wide kernel
            # (scripts/tpu_il_ab.py): 32-row tiles beat 64/128 on teacup
            # (70.8 -> 64.1 ms at interleave 2) and dragon (38.6 -> 37.9) —
            # the cheaper 4-wide pops + interleave shift the
            # divergence-vs-scalar-overhead optimum below the binary
            # kernel's 64.
            return 32
        # Measured on v5e (scripts/tpu_tile_ab.py): 64 rows beat 8/16/128/256
        # on teacup and dragon through the BINARY kernels — smaller tiles cut
        # divergence (tile_sim.py: 5x less vector work at 8 rows) but per-pop
        # scalar/reduction overhead dominates below 64.
        return 64

    def resolve_ray_order(self, num_tris: int, platform: str | None = None) -> str:
        if self.ray_order != "auto":
            if self.ray_order not in ("raster", "blocked", "morton"):
                raise ValueError(
                    f"ray_order must be 'raster' | 'blocked' | 'morton' | "
                    f"'auto', got {self.ray_order!r}")
            return self.ray_order
        # Coherent grouping only matters for the tile-synchronous BVH kernels.
        # Morton measured best on v5e (scripts/tpu_tile_ab.py: teacup
        # 170->119 ms, dragon 81->56 ms vs raster; beats blocked rectangles).
        if (self.resolve_backend(num_tris, platform) == "pallas"
                and num_tris > self.pallas_brute_max_tris):
            return "morton"
        return "raster"

    def resolve_backend(self, num_tris: int, platform: str | None = None) -> str:
        if self.backend != "auto":
            return self.backend
        if platform is None:
            import jax

            platform = jax.default_backend()
        if platform == "tpu":
            # Compiled Pallas kernels beat the XLA-fused paths on TPU: the
            # VMEM-resident BVH kernel up to ~200K triangles, the HBM-streaming
            # one to ~2.7M.  The jnp while-loop traversal is the fallback only
            # beyond that (it has also produced device faults at 320K-tri /
            # 640K-ray scale on v5e, so prefer the kernels wherever supported).
            from ..ops.pallas_bvh import HBM_MAX_TRIS

            return "pallas" if num_tris <= HBM_MAX_TRIS else "bvh"
        return "brute" if num_tris <= self.brute_force_max_tris else "bvh"

    def resolve_remat_shade(self) -> bool:
        if self.remat_shade not in ("auto", "on", "off"):
            raise ValueError(
                f"remat_shade must be 'auto' | 'on' | 'off', got "
                f"{self.remat_shade!r}")
        if self.remat_shade != "auto":
            return self.remat_shade == "on"
        # 'auto' = off until the TPU probe (scripts/tpu_r3_sweep.py bwd_probe)
        # shows the recompute beating the residual traffic.
        return False

    # Two-phase gradient structure: phase 1 computes every level's oracle
    # records (bounce hits + shadow bits + reflection rays) with the scene
    # stop-gradded; phase 2 re-runs reconstruct+shade differentiably over the
    # records, RECOMPUTING the bounce rays from each level's surface so the
    # reflected-ray-origin vertex-grad term flows.  Gradients are exact for
    # every param set (the one-phase path never differentiates the oracle
    # either); what changes is the partial-eval boundary XLA sees —
    # the fix for the measured ~4 ms fwd/bwd composition overhead
    # (scripts/tpu_bwd2.py vs tpu_prof_bwd.py).
    grad_two_phase: str = "auto"

    def resolve_grad_two_phase(self) -> bool:
        if self.grad_two_phase not in ("auto", "on", "off"):
            raise ValueError(
                f"grad_two_phase must be 'auto' | 'on' | 'off', got "
                f"{self.grad_two_phase!r}")
        if self.grad_two_phase != "auto":
            return self.grad_two_phase == "on"
        # 'auto' = off until the TPU probe (scripts/tpu_prof_bwd.py hoist)
        # shows the restructure beating the one-phase graph.
        return False

    # Route forward_only renders (past the trace megakernel's cap) through
    # the record phase + fused shade kernel.  'auto' resolves HOST-SIDE in
    # render()/run_bench via models.whitted.resolve_fwd_shade_kernel — 'on'
    # only when bounce depth >= 2 AND a meaningful fraction of triangles is
    # actually reflective: the kernel chain wins when the XLA chain would
    # run twice over live rays and loses when the second level is dead
    # (dragon 34.0 -> 41.6 — its material table has a reflective entry no
    # visible triangle uses).  The round-4 'wash' became a clear win in
    # round 5 once the record phase consumed recorded (t,u,v) directly
    # (record_surface): teacup fwd 61.2 -> 46.8 ms at the final autos
    # (scripts/r5_results.jsonl table2).  At trace time 'auto' means 'off'.
    fwd_shade_kernel: str = "auto"

    # Phase-2 ray source for the two-phase structure.  'exact': bounce rays
    # are recomputed differentiably from each level's surface, so the
    # reflected-ray-origin vertex-grad term flows (full-gradient contract).
    # 'recorded': phase 2 consumes the stop-gradded phase-1 rays — drops that
    # one vertex term (material/light grads stay exact), saving the
    # reflect-chain recompute + its VJP (~1 ms at the 1024^2 headline,
    # scripts/r4_results.jsonl headline rows).  'auto' = 'exact';
    # optimize()/run_bench select 'recorded' when no vertex params are being
    # differentiated (the dropped term is then zero anyway).
    two_phase_rays: str = "auto"

    def resolve_two_phase_rays(self) -> str:
        if self.two_phase_rays not in ("auto", "exact", "recorded"):
            raise ValueError(
                f"two_phase_rays must be 'auto' | 'exact' | 'recorded', got "
                f"{self.two_phase_rays!r}")
        return "exact" if self.two_phase_rays == "auto" else self.two_phase_rays

    # Fused differentiable shade kernel (ops/pallas_shade.py): reconstruct +
    # point-light Phong in one Pallas dispatch each way (custom VJP).  Only
    # valid inside the two-phase gradient structure (its inputs are the
    # stop-gradded phase-1 records); scenes must pass supports_shade_kernel
    # (<= 64 tris, point lights only).
    shade_kernel: str = "auto"

    def resolve_shade_kernel(self, platform: str | None = None) -> bool:
        if self.shade_kernel not in ("auto", "on", "off"):
            raise ValueError(
                f"shade_kernel must be 'auto' | 'on' | 'off', got "
                f"{self.shade_kernel!r}")
        if self.shade_kernel == "off":
            return False
        if self.shade_kernel == "on":
            return True
        if platform is None:
            import jax

            platform = jax.default_backend()
        # 'auto' = TPU only (headline A/B: scripts/tpu_r3b.py, BENCH_NOTES
        # round-3 headline table — the fused kernel took 11.5 -> 7.69 ms
        # with the record-trace megakernel).
        return platform == "tpu"

    # Attribute-gather mode for the pregathered shade kernel (> 64 tris):
    # 'direct' = one lax.gather straight into the kernel tile layout (VJP =
    # direct scatter-add); 'rows' = [N,28] row gather + explicit transpose
    # each way.  'auto' = 'direct' (A/B: scripts/tpu_r4c.py).
    shade_gather: str = "auto"

    def resolve_shade_gather(self) -> str:
        if self.shade_gather not in ("auto", "direct", "rows"):
            raise ValueError(
                f"shade_gather must be 'auto' | 'direct' | 'rows', got "
                f"{self.shade_gather!r}")
        return "direct" if self.shade_gather == "auto" else self.shade_gather

    # Leaf width for the soft-shadow sampler's OWN tree (0 = auto).  The cone
    # sampler's leaf MT sweeps run on [samples, 128] tiles — triangle tests
    # are ~3x pricier relative to pops than in the primary kernels, so its
    # optimum sits at tight leaves while the primary kernels want 56.
    soft_bvh_max_leaf: int = 0

    def resolve_soft_bvh_max_leaf(self) -> int:
        if self.soft_bvh_max_leaf:
            if self.soft_bvh_max_leaf < 1:
                raise ValueError("soft_bvh_max_leaf must be positive")
            return self.soft_bvh_max_leaf
        # 'auto' = 14 (one packed row) pending the TPU A/B
        # (scripts/tpu_r3c.py cone_tree).
        return 14

    # Split rule for the soft-shadow tree ('auto' | 'median' | 'sah').
    soft_bvh_builder: str = "auto"

    def resolve_soft_bvh_builder(self) -> str:
        if self.soft_bvh_builder not in ("auto", "median", "sah"):
            raise ValueError(
                f"soft_bvh_builder must be 'auto' | 'median' | 'sah', got "
                f"{self.soft_bvh_builder!r}")
        if self.soft_bvh_builder != "auto":
            return self.soft_bvh_builder
        # The cone traversal is an any-hit over a narrow union; the
        # round-3 measurements suggest SAH's tighter-but-more-numerous cuts
        # hurt it (monkey_spherical 1074 ms median vs 1366 ms SAH through the
        # binary cone) — A/B'd properly by scripts/tpu_r3c.py cone_tree.
        return "median"

    # Sample-band interleave for the 4-wide cone soft-shadow sampler: 'N'
    # splits each pass's sample rows into N independent bands traversing in
    # one fused loop (the primary kernels' pop-latency-hiding structure,
    # applied to the sampler).  PRNG draws regroup per band (statistically
    # equivalent, not bitwise vs il=1; the table variant is bitwise
    # invariant — tested).  'auto' = measured best (scripts/tpu_r5c.py
    # cone_il).
    soft_cone_interleave: str = "auto"

    def resolve_soft_cone_interleave(self) -> int:
        if self.soft_cone_interleave not in ("auto", "1", "2", "4"):
            raise ValueError(
                f"soft_cone_interleave must be 'auto' | '1' | '2' | '4', "
                f"got {self.soft_cone_interleave!r}")
        if self.soft_cone_interleave != "auto":
            return int(self.soft_cone_interleave)
        # Measured on v5e (scripts/tpu_r5c.py cone_il, r5_results.jsonl):
        # monkey_spherical 800^2 fwd 579.7 (il1) -> 545.5 (il2); il4 loses
        # (590.9 — band rows shrink past the divergence/overhead optimum).
        return 2

    def resolve_soft_shadow_tile(self) -> str:
        if self.soft_shadow_tile not in ("auto", "sample", "cone"):
            raise ValueError(
                f"soft_shadow_tile must be 'auto' | 'sample' | 'cone', got "
                f"{self.soft_shadow_tile!r}")
        if self.soft_shadow_tile != "auto":
            return self.soft_shadow_tile
        # Measured on v5e (scripts/tpu_r3_sweep.py soft_cone_ab,
        # r3_results.jsonl): the cone-coherent layout — one any-hit traversal
        # serving 128 pixels x all their samples — wins decisively on
        # monkey_spherical_light (1559.8 -> 1073.9 ms, 800^2 fwd steady).
        return "cone"

    def resolve_soft_shadow_kernel(self, platform: str | None = None) -> bool:
        """Whether the in-kernel Pallas soft-shadow sampler should be used (the
        scene must separately satisfy supports_soft_shadow_kernel)."""
        if self.soft_shadow_kernel not in ("auto", "on", "off"):
            raise ValueError(
                f"soft_shadow_kernel must be 'auto' | 'on' | 'off', got "
                f"{self.soft_shadow_kernel!r}"
            )
        if self.soft_shadow_kernel == "off":
            return False
        if self.soft_shadow_kernel == "on":
            return True
        if platform is None:
            import jax

            platform = jax.default_backend()
        return platform == "tpu"
