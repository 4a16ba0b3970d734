"""Round-3 backward-pass decomposition, take 2 (real chip; appends to
scripts/r3_results.jsonl).

The round-2 bwd_probe's isolated XLA-shade numbers were unusable (28.2 ms
"fwd only" vs 14.6 ms for the FULL fwd+bwd render): it closed over the fixed
oracle outputs as jit constants, so XLA embedded two 1M-ray hit records as
weights and the comparison measured constant materialization, not shading.
This probe passes records as arguments and jitters them per scanned frame so
nothing hoists.

Variants (cornell_box 1024^2, the headline config; frames_per_call=8):
  baseline    fwd+bwd through the real path              (cached from r2)
  fwd         fwd-only through the bounce kernels        (cached from r2)
  remat_on    fwd+bwd with cfg.remat_shade='on' — bwd recomputes each level's
              reconstruct+shade from (o,d,hit,bits) instead of saving residuals
  depth1      fwd+bwd at max_depth=1 — per-level cost split
  oracle      fwd-only: bounce kernels + reconstruct + reflect math, no lighting
  shade       fwd+bwd of the XLA reconstruct+shade chain alone, records as args

Usage: python scripts/tpu_bwd2.py [variant ...]   (default: all)
"""
import json
import os
import sys
import time

RESULTS = os.path.join(os.path.dirname(__file__), "r3_results.jsonl")


def log(**rec):
    with open(RESULTS, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


W = H = 1024
FRAMES = 8


def _setup():
    import jax

    import cg_raytracer_tpu as cgrt
    from cg_raytracer_tpu.models.whitted import (build_accel, effective_max_depth,
                                                 make_backend, needs_bvh)

    import dataclasses

    scn = cgrt.load_scene("cornell_box")
    cfg = cgrt.RenderConfig(width=W, height=H)
    cfg = dataclasses.replace(cfg, max_depth=effective_max_depth(scn, cfg))
    cam = cgrt.Camera.default(aspect=1.0)
    key = jax.random.PRNGKey(0)
    return scn, cfg, cam, key


def variant_baseline():
    from cg_raytracer_tpu.utils.bench import run_bench

    r = run_bench("cornell_box", W, H, include_bwd=True, iters=5)
    log(stage="bwd2", what="baseline fwd+bwd",
        ms=round(r["seconds_per_frame"] * 1e3, 2))


def variant_fwd():
    from cg_raytracer_tpu.utils.bench import run_bench

    r = run_bench("cornell_box", W, H, include_bwd=False, iters=5,
                  cfg_overrides={"forward_only": False})
    log(stage="bwd2", what="fwd bounce-kernels",
        ms=round(r["seconds_per_frame"] * 1e3, 2))


def variant_remat_on():
    from cg_raytracer_tpu.utils.bench import run_bench

    r = run_bench("cornell_box", W, H, include_bwd=True, iters=5,
                  cfg_overrides={"remat_shade": "on"})
    log(stage="bwd2", what="fwd+bwd remat_shade=on",
        ms=round(r["seconds_per_frame"] * 1e3, 2))


def variant_depth1():
    from cg_raytracer_tpu.utils.bench import run_bench

    r = run_bench("cornell_box", W, H, include_bwd=True, iters=5, max_depth=1)
    log(stage="bwd2", what="fwd+bwd depth1",
        ms=round(r["seconds_per_frame"] * 1e3, 2))


def variant_oracle():
    """Oracle + reconstruct + reflect chain, no lighting: the non-shade share
    of the forward."""
    import jax
    import jax.numpy as jnp

    from cg_raytracer_tpu.models.whitted import make_backend
    from cg_raytracer_tpu.ops import camera as cam_ops
    from cg_raytracer_tpu.ops.intersect import reconstruct_hit
    from cg_raytracer_tpu.ops.linalg import reflect, safe_normalize
    from cg_raytracer_tpu.utils.bench import time_fn

    scn, cfg, cam, key = _setup()
    backend = make_backend(scn, cfg)
    keys = jax.random.split(key, FRAMES)

    @jax.jit
    def frames(scn_, cam_, keys_):
        def one(carry, key_):
            import dataclasses as _dc

            eps = jax.random.uniform(key_, (3,), jnp.float32, -1e-4, 1e-4)
            cj = _dc.replace(cam_, look_at=cam_.look_at + eps)
            o, d = cam_ops.generate_rays(cj, H, W)
            hit0, bits0 = backend.bounce(o, d)
            surf = reconstruct_hit(scn_, o, d, hit0)
            refl = safe_normalize(reflect(d, surf.normal))
            act = surf.valid & jnp.any(surf.ks > 0.01, -1)
            o1 = surf.position + 1e-3 * refl
            d1 = jnp.where(act[:, None], refl, d)
            hit1, bits1 = backend.bounce(o1, d1, live=act)
            s = (jnp.sum(jnp.where(jnp.isfinite(hit0.t), hit0.t, 0.0))
                 + jnp.sum(jnp.where(jnp.isfinite(hit1.t), hit1.t, 0.0))
                 + jnp.sum(bits0) + jnp.sum(bits1))
            return carry + s, None

        return jax.lax.scan(one, jnp.float32(0.0), keys_)[0]

    t = time_fn(frames, scn, cam, keys, iters=5)
    log(stage="bwd2", what="fwd oracle+reconstruct+reflect only",
        ms=round(t / FRAMES * 1e3, 2))


def variant_shade():
    """XLA reconstruct+shade chain alone, fwd and fwd+bwd, records as ARGS."""
    import jax
    import jax.numpy as jnp

    from cg_raytracer_tpu.models.whitted import Backend, make_backend, trace_rays
    from cg_raytracer_tpu.ops import camera as cam_ops
    from cg_raytracer_tpu.ops.intersect import reconstruct_hit
    from cg_raytracer_tpu.ops.linalg import reflect, safe_normalize
    from cg_raytracer_tpu.optim.inverse import (apply_material_params,
                                                material_params)
    from cg_raytracer_tpu.utils.bench import time_fn

    scn, cfg, cam, key = _setup()
    backend = make_backend(scn, cfg)
    o, d = cam_ops.generate_rays(cam, H, W)
    hit0, bits0 = jax.jit(backend.bounce)(o, d)
    surf0 = reconstruct_hit(scn, o, d, hit0)
    refl = safe_normalize(reflect(d, surf0.normal))
    act = surf0.valid & jnp.any(surf0.ks > 0.01, -1)
    o1 = surf0.position + 1e-3 * refl
    d1 = jnp.where(act[:, None], refl, d)
    hit1, bits1 = jax.jit(backend.bounce)(o1, d1, live=act)
    records = jax.block_until_ready(
        (o, d, hit0, bits0, o1, d1, hit1, bits1))
    params = material_params(scn)
    keys = jax.random.split(key, FRAMES)

    def shade_chain(params_, scn_, rec, key_):
        o_, d_, h0, b0, o1_, d1_, h1, b1 = rec
        # Per-frame t jitter: keeps each scanned frame a distinct computation
        # (records are loop-invariant args otherwise and XLA hoists the body).
        eps = jax.random.uniform(key_, h0.t.shape, jnp.float32, -1e-5, 1e-5)
        h0 = h0._replace(t=h0.t + eps)
        scn_p = apply_material_params(scn_, params_)
        fixed = iter([(h0, b0), (h1, b1)])
        be = Backend(closest=None, occluded=None,
                     bounce=lambda *_a, **_k: next(fixed))
        color = trace_rays(scn_p, o_, d_, cfg, be, key_)
        return jnp.mean(color)

    @jax.jit
    def fwd(params_, scn_, rec, keys_):
        def one(c, key_):
            return c + shade_chain(params_, scn_, rec, key_), None

        return jax.lax.scan(one, jnp.float32(0.0), keys_)[0]

    t = time_fn(fwd, params, scn, records, keys, iters=5)
    log(stage="bwd2", what="XLA shade chain fwd (args)",
        ms=round(t / FRAMES * 1e3, 2))

    @jax.jit
    def fwdbwd(params_, scn_, rec, keys_):
        def one(c, key_):
            l, g = jax.value_and_grad(shade_chain)(params_, scn_, rec, key_)
            return c + l, g

        return jax.lax.scan(one, jnp.float32(0.0), keys_)

    t = time_fn(fwdbwd, params, scn, records, keys, iters=5)
    log(stage="bwd2", what="XLA shade chain fwd+bwd (args)",
        ms=round(t / FRAMES * 1e3, 2))


VARIANTS = {
    "baseline": variant_baseline,
    "fwd": variant_fwd,
    "remat_on": variant_remat_on,
    "depth1": variant_depth1,
    "oracle": variant_oracle,
    "shade": variant_shade,
}


def main():
    from cg_raytracer_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    names = sys.argv[1:] or list(VARIANTS)
    for name in names:
        t0 = time.time()
        log(stage="bwd2", what=f"START {name}")
        try:
            VARIANTS[name]()
            log(stage="bwd2", what=f"DONE {name}",
                wall_s=round(time.time() - t0, 1))
        except Exception as e:
            log(stage="bwd2", what=f"ERROR {name}", error=repr(e)[:500])


if __name__ == "__main__":
    main()
