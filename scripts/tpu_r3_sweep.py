"""Round-3 TPU measurement sweep (run on the real chip; results appended to
scripts/r3_results.jsonl as they land — poll the file, compiles take minutes).

Stages:
  1. bvh4_ab       — binary vs 4-wide VMEM BVH kernel (teacup/dragon/monkey)
  2. soft_cone_ab  — per-sample vs cone-coherent soft-shadow sampler
  3. bwd_probe     — headline fwd+bwd decomposition + remat-shade experiment
  4. sah_ab        — median vs binned-SAH builder through the winning kernel

Usage: python scripts/tpu_r3_sweep.py [stage ...]   (default: all)
"""
import dataclasses
import functools
import json
import os
import sys
import time

RESULTS = os.path.join(os.path.dirname(__file__), "r3_results.jsonl")


def log(**rec):
    with open(RESULTS, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def stage_bvh4_ab():
    from cg_raytracer_tpu.utils.bench import run_bench

    for scene in ("monkey", "teacup", "dragon"):
        for wide in ("2", "4"):
            r = run_bench(scene, 800, 800, include_bwd=False, iters=3,
                          frames_per_call=4,
                          cfg_overrides={"bvh_wide": wide})
            log(stage="bvh4_ab", scene=scene, wide=wide,
                ms=round(r["seconds_per_frame"] * 1e3, 2))


def stage_soft_cone_ab():
    from cg_raytracer_tpu.utils.bench import run_bench

    for tile in ("sample", "cone"):
        r = run_bench("monkey_spherical_light", 800, 800, include_bwd=False,
                      iters=3, frames_per_call=2,
                      cfg_overrides={"soft_shadow_tile": tile})
        log(stage="soft_cone_ab", scene="monkey_spherical_light", tile=tile,
            ms=round(r["seconds_per_frame"] * 1e3, 1))
    # The cornell spherical row uses the brute sampler (32 tris) — unchanged;
    # re-measure once for the round-3 Table-2 refresh.
    r = run_bench("cornell_box_spherical_light", 800, 800, include_bwd=False,
                  iters=3, frames_per_call=2)
    log(stage="soft_cone_ab", scene="cornell_box_spherical_light",
        tile="brute", ms=round(r["seconds_per_frame"] * 1e3, 1))


def stage_bwd_probe():
    import jax
    import jax.numpy as jnp

    import cg_raytracer_tpu as cgrt
    from cg_raytracer_tpu.models.whitted import (build_accel, make_backend,
                                                 needs_bvh, render_image,
                                                 trace_rays)
    from cg_raytracer_tpu.ops import camera as cam_ops
    from cg_raytracer_tpu.ops import shading
    from cg_raytracer_tpu.ops.intersect import reconstruct_hit
    from cg_raytracer_tpu.ops.linalg import reflect, safe_normalize
    from cg_raytracer_tpu.optim.inverse import (apply_material_params,
                                                material_params)
    from cg_raytracer_tpu.utils.bench import run_bench, time_fn

    W = H = 1024
    # (a) baseline fwd+bwd headline, (b) megakernel fwd, (c) bounce-kernel fwd
    r = run_bench("cornell_box", W, H, include_bwd=True, iters=5)
    log(stage="bwd_probe", what="fwd+bwd baseline",
        ms=round(r["seconds_per_frame"] * 1e3, 2))
    r = run_bench("cornell_box", W, H, include_bwd=False, iters=5)
    log(stage="bwd_probe", what="fwd megakernel",
        ms=round(r["seconds_per_frame"] * 1e3, 2))
    r = run_bench("cornell_box", W, H, include_bwd=False, iters=5,
                  cfg_overrides={"forward_only": False})
    log(stage="bwd_probe", what="fwd bounce-kernels",
        ms=round(r["seconds_per_frame"] * 1e3, 2))

    # (d) XLA reconstruct+shade isolation: fixed oracle outputs, fwd vs
    # fwd+bwd of the differentiable part only.
    scene = cgrt.load_scene("cornell_box")
    cfg = cgrt.RenderConfig(width=W, height=H)
    camera = cgrt.Camera.default()
    key = jax.random.PRNGKey(0)
    backend = make_backend(scene, cfg)
    o, d = cam_ops.generate_rays(camera, H, W)
    hit0, bits0 = jax.jit(backend.bounce)(o, d)
    surf0 = reconstruct_hit(scene, o, d, hit0)
    refl = safe_normalize(reflect(d, surf0.normal))
    o1 = surf0.position + 1e-3 * refl
    d1 = jnp.where((surf0.valid & (jnp.any(surf0.ks > 0.01, -1)))[:, None],
                   refl, d)
    hit1, bits1 = jax.jit(backend.bounce)(o1, d1)
    jax.block_until_ready((hit0, hit1))

    # level-1 reflective fraction (compaction potential)
    frac = float(jnp.mean((surf0.valid
                           & (jnp.any(surf0.ks > 0.01, -1))).astype(jnp.float32)))
    log(stage="bwd_probe", what="reflective fraction level1",
        frac=round(frac, 4))

    params = material_params(scene)

    def fixed_oracle_backend():
        seq = iter([(hit0, bits0), (hit1, bits1)])
        from cg_raytracer_tpu.models.whitted import Backend

        return Backend(closest=None, occluded=None,
                       bounce=lambda o_, d_: next(seq))

    def xla_loss(params_):
        scn = apply_material_params(scene, params_)
        color = trace_rays(scn, o, d, cfg, fixed_oracle_backend(), key)
        return jnp.mean(color)

    f_fwd = jax.jit(xla_loss)
    t = time_fn(f_fwd, params, iters=5)
    log(stage="bwd_probe", what="XLA shade fwd only", ms=round(t * 1e3, 2))
    f_vg = jax.jit(jax.value_and_grad(xla_loss))
    t = time_fn(f_vg, params, iters=5)
    log(stage="bwd_probe", what="XLA shade fwd+bwd", ms=round(t * 1e3, 2))

    # (e) remat-shade experiment: checkpoint the per-level reconstruct+shade
    # so the bwd recomputes it from (hit, bits) instead of storing residuals.
    def remat_loss(params_):
        scn = apply_material_params(scene, params_)

        @jax.checkpoint
        def level(scn_, oo, dd, hit, bits, lkey):
            surf = reconstruct_hit(scn_, oo, dd, hit)
            direct = shading.direct_light(scn_, dd, surf, None, lkey,
                                          shadow_bits=bits)
            return direct, surf.valid, surf.ks, surf.normal, surf.position

        color = jnp.zeros((o.shape[0], 3), jnp.float32)
        throughput = jnp.ones((o.shape[0], 3), jnp.float32)
        active = jnp.ones((o.shape[0],), bool)
        oo, dd = o, d
        seq = iter([(hit0, bits0), (hit1, bits1)])
        for level_i in range(cfg.max_depth):
            hit, bits = next(seq)
            lkey = jax.random.fold_in(key, level_i)
            direct, valid, ks, normal, position = level(scn, oo, dd, hit,
                                                        bits, lkey)
            lit = active & valid
            color = color + throughput * direct * lit[..., None].astype(jnp.float32)
            if level_i + 1 >= cfg.max_depth:
                break
            active = lit & jnp.any(ks > 0.01, axis=-1)
            throughput = throughput * ks
            rdir = safe_normalize(reflect(dd, normal))
            oo = position + 1e-3 * rdir
            dd = jnp.where(active[..., None], rdir, dd)
        return jnp.mean(color)

    f_rm = jax.jit(jax.value_and_grad(remat_loss))
    t = time_fn(f_rm, params, iters=5)
    log(stage="bwd_probe", what="XLA shade fwd+bwd remat-level",
        ms=round(t * 1e3, 2))

    # (f) full fwd+bwd with remat-level inside the real render loop is wired
    # via cfg once the isolated numbers justify it.


def stage_sah_ab():
    from cg_raytracer_tpu.utils.bench import run_bench

    for scene in ("teacup", "dragon", "donut"):
        for builder in ("median", "sah"):
            r = run_bench(scene, 800, 800, include_bwd=False, iters=3,
                          frames_per_call=4,
                          cfg_overrides={"bvh_builder": builder})
            log(stage="sah_ab", scene=scene, builder=builder,
                ms=round(r["seconds_per_frame"] * 1e3, 2))


STAGES = {
    "bvh4_ab": stage_bvh4_ab,
    "soft_cone_ab": stage_soft_cone_ab,
    "bwd_probe": stage_bwd_probe,
    "sah_ab": stage_sah_ab,
}


def main():
    from cg_raytracer_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    names = sys.argv[1:] or list(STAGES)
    for name in names:
        t0 = time.time()
        log(stage=name, what="START")
        try:
            STAGES[name]()
            log(stage=name, what="DONE", wall_s=round(time.time() - t0, 1))
        except Exception as e:  # keep later stages alive
            log(stage=name, what="ERROR", error=repr(e)[:500])


if __name__ == "__main__":
    main()
