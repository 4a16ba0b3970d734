"""Round-5 sweep A (real chip; appends to scripts/r5_results.jsonl).

Stages:
  pop_ab   internal-pop structure A/B (VERDICT r4 item 1): base vs batched
           reductions vs no-sort pushes, teacup/dragon/monkey 800^2 fwd
           steady through the wide VMEM kernels (+ parity checks).
  recsurf  mesh fwd+bwd at current autos after the record_surface change
           (VERDICT item 4: phase 1 consumes recorded t/u/v, no MT
           reconstruct) — compare against the r4 definitive rows
           55.9 / 45.9 / 38.5 (teacup/dragon/monkey).
  sph      spherical-light scenes through the two-phase + fused shade chain
           (VERDICT missing #1): cornell_box_spherical_light and
           monkey_spherical_light, fwd + fwd+bwd one-phase vs two-phase.
  spheres  the spheres preset fwd+bwd through the synthesized bounce +
           in-kernel sphere shading (VERDICT item 6).
  gather2  XLA gather formulation microbench (VERDICT item 2 groundwork):
           row width / alignment / two-step packed-row variants at 640K rays.
  headline cornell 1024^2 fwd+bwd full-contract re-check.

Usage: python scripts/tpu_r5a.py [stage ...]
"""
import json
import os
import sys
import time

RESULTS = os.path.join(os.path.dirname(__file__), "r5_results.jsonl")


def log(**rec):
    with open(RESULTS, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def _fwd(scene, ov, iters=3, frames=4, res=800):
    from cg_raytracer_tpu.utils.bench import run_bench

    r = run_bench(scene, res, res, include_bwd=False, iters=iters,
                  frames_per_call=frames, cfg_overrides=ov)
    return round(r["seconds_per_frame"] * 1e3, 2)


def _fwdbwd(scene, ov, iters=3, frames=4, res=800, vertex=False):
    from cg_raytracer_tpu.utils.bench import run_bench

    r = run_bench(scene, res, res, include_bwd=True, iters=iters,
                  frames_per_call=frames, cfg_overrides=ov,
                  include_vertex_params=vertex)
    return round(r["seconds_per_frame"] * 1e3, 2)


def stage_pop_ab():
    import numpy as np

    import cg_raytracer_tpu as cgrt
    from cg_raytracer_tpu.ops import camera as cam_ops
    from cg_raytracer_tpu.ops.pallas_bvh4 import (build_packed_bvh4,
                                                  intersect_pallas_bvh4)

    # Parity first: compiled-kernel hits must match across pop variants.
    scene = cgrt.load_scene("monkey")
    _, p4 = build_packed_bvh4(scene, max_leaf=56, builder="sah")
    o, d = cam_ops.generate_rays(cgrt.Camera.default(), 128, 128)
    hb = intersect_pallas_bvh4(scene, p4, o, d, tile_rows=32, interleave=2,
                               pop="base")
    tb = np.where(np.isinf(np.asarray(hb.t)), 1e9, np.asarray(hb.t))
    for pop in ("batched", "nosort", "batched_nosort"):
        hp = intersect_pallas_bvh4(scene, p4, o, d, tile_rows=32,
                                   interleave=2, pop=pop)
        tp = np.where(np.isinf(np.asarray(hp.t)), 1e9, np.asarray(hp.t))
        mism = float((~np.isclose(tb, tp, atol=1e-4, rtol=1e-5)).mean())
        log(stage="pop_ab", what=f"parity/{pop}", mismatch=mism)

    for scn in ("teacup", "dragon", "monkey"):
        for pop in ("base", "batched", "nosort", "batched_nosort"):
            try:
                ms = _fwd(scn, {"bvh_pop": pop})
                log(stage="pop_ab", scene=scn, pop=pop, ms=ms)
            except Exception as e:
                log(stage="pop_ab", scene=scn, pop=pop, error=repr(e)[:300])


def stage_recsurf():
    # r4 definitive fwd+bwd rows (materials, recorded-rays auto):
    # teacup 55.9, dragon 45.9, monkey 38.5.
    for scn, r4 in (("teacup", 55.9), ("dragon", 45.9), ("monkey", 38.5)):
        ms = _fwdbwd(scn, {})
        log(stage="recsurf", scene=scn, ms=ms, r4_ms=r4)


def stage_sph():
    # Forward reference points (r4: cornell_sph 152.95; monkey_sph 615.6).
    log(stage="sph", scene="cornell_box_spherical_light", what="fwd",
        ms=_fwd("cornell_box_spherical_light", {}))
    # fwd+bwd: one-phase XLA sample-scan (r4: 169.1) vs the round-5
    # two-phase + fused shade chain (fracs recorded by the sampler oracle).
    log(stage="sph", scene="cornell_box_spherical_light", what="one_phase",
        ms=_fwdbwd("cornell_box_spherical_light", {"grad_two_phase": "off"}))
    log(stage="sph", scene="cornell_box_spherical_light", what="two_phase",
        ms=_fwdbwd("cornell_box_spherical_light", {}))
    log(stage="sph", scene="monkey_spherical_light", what="fwd",
        ms=_fwd("monkey_spherical_light", {}))
    log(stage="sph", scene="monkey_spherical_light", what="one_phase",
        ms=_fwdbwd("monkey_spherical_light", {"grad_two_phase": "off"}))
    log(stage="sph", scene="monkey_spherical_light", what="two_phase",
        ms=_fwdbwd("monkey_spherical_light", {}))


def stage_spheres():
    log(stage="spheres", what="fwd", ms=_fwd("spheres", {}))
    log(stage="spheres", what="one_phase",
        ms=_fwdbwd("spheres", {"grad_two_phase": "off"}))
    log(stage="spheres", what="two_phase_kernel", ms=_fwdbwd("spheres", {}))


def stage_gather2():
    """XLA gather formulations at 640K rays (host-synced scan-of-8, the
    phantom-timing discipline from r4: time must scale with ITERS)."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    N = 640_000
    T = 48_000
    rng = np.random.default_rng(0)
    # Morton-coherent-ish indices: sorted blocks with jitter (the real
    # prim streams are tile-coherent, not random).
    base = np.sort(rng.integers(0, T, N))
    jit_idx = np.clip(base + rng.integers(-32, 32, N), 0, T - 1)
    idx = jnp.asarray(jit_idx, jnp.int32)
    ridx = jnp.asarray(rng.integers(0, T, N), jnp.int32)

    def timed(name, table_lanes, make_fn, indices):
        table = jnp.asarray(rng.standard_normal((T, table_lanes)), jnp.float32)
        fn = jax.jit(make_fn(table))
        for _ in range(2):
            s = float(np.asarray(fn(indices)).sum())  # true sync
        iters = 8
        t0 = time.perf_counter()
        for _ in range(iters):
            s = float(np.asarray(fn(indices)).sum())
        dt = (time.perf_counter() - t0) / iters * 1e3
        log(stage="gather2", what=name, lanes=table_lanes,
            ms_per_call=round(dt, 3))

    def row_gather(table):
        def f(ix):
            return jnp.sum(table[ix], axis=1)

        return f

    def take_along(table):
        def f(ix):
            return jnp.sum(
                jnp.take(table, ix, axis=0, unique_indices=False), axis=1)

        return f

    timed("row_gather_coherent", 19, row_gather, idx)
    timed("row_gather_random", 19, row_gather, ridx)
    timed("row_gather_128", 128, row_gather, idx)
    timed("row_gather_64", 64, row_gather, idx)
    timed("row_gather_8", 8, row_gather, idx)
    timed("take_19", 19, take_along, idx)

    # Two-step packed-row variant: gather the 14-tri packed row (slot // 14)
    # then slice the 9 in-row lanes via a tiny second gather.
    R = T // 14 + 1

    def packed_two_step(table):  # table [R, 126]
        def f(ix):
            row = table[ix // 14]  # [N, 126]
            off = (ix % 14) * 9
            lane = off[:, None] + jnp.arange(9)[None, :]
            vals = jnp.take_along_axis(row, lane, axis=1)
            return jnp.sum(vals, axis=1)

        return f

    table_r = jnp.asarray(rng.standard_normal((R, 126)), jnp.float32)
    fn = jax.jit(packed_two_step(table_r))
    for _ in range(2):
        float(np.asarray(fn(idx)).sum())
    t0 = time.perf_counter()
    for _ in range(8):
        float(np.asarray(fn(idx)).sum())
    log(stage="gather2", what="packed_two_step", lanes=126,
        ms_per_call=round((time.perf_counter() - t0) / 8 * 1e3, 3))


def stage_headline():
    ms = _fwdbwd("cornell_box", {}, iters=3, frames=8, res=1024, vertex=True)
    log(stage="headline", what="full_contract", ms=ms,
        mrays=round(1024 * 1024 / ms / 1e3, 1))


STAGES = {
    "pop_ab": stage_pop_ab,
    "recsurf": stage_recsurf,
    "sph": stage_sph,
    "spheres": stage_spheres,
    "gather2": stage_gather2,
    "headline": stage_headline,
}


def main():
    from cg_raytracer_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    names = sys.argv[1:] or list(STAGES)
    for name in names:
        print(f"=== stage {name} ===", flush=True)
        t0 = time.perf_counter()
        try:
            STAGES[name]()
        except Exception as e:  # keep later stages alive
            log(stage=name, fatal=repr(e)[:500])
        print(f"=== {name} done in {time.perf_counter() - t0:.1f}s ===",
              flush=True)


if __name__ == "__main__":
    main()
