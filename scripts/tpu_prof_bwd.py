"""Profile the headline fwd+bwd step (cornell 1024^2) and probe the ~2.8 ms
fwd/bwd composition overhead found by tpu_bwd2.py.

Probes (appended to r3_results.jsonl):
  profile   jax.profiler trace of the real step -> /tmp/jaxprof (may be
            unsupported through the axon tunnel; guarded)
  kd_only   grad w.r.t. kd alone — is the light_position VJP path the gap?
  nolight   params without light_position/light_color at all
  hoist     backend/oracle hoisted OUT of value_and_grad: oracle records
            computed first (no grad), then value_and_grad of the pure shade
            chain over them INSIDE the same jit — composition fix candidate.

Usage: python scripts/tpu_prof_bwd.py [probe ...]
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


def _bench_core(param_filter=None):
    import dataclasses

    import jax
    import jax.numpy as jnp

    import cg_raytracer_tpu as cgrt
    from cg_raytracer_tpu.models.whitted import (effective_max_depth,
                                                 make_backend, render_image)
    from cg_raytracer_tpu.optim.inverse import (apply_material_params,
                                                material_params)
    from cg_raytracer_tpu.utils.bench import time_fn

    scn = cgrt.load_scene("cornell_box")
    cfg = cgrt.RenderConfig(width=W, height=H)
    cfg = dataclasses.replace(cfg, max_depth=effective_max_depth(scn, cfg))
    cam = cgrt.Camera.default(aspect=1.0)
    key = jax.random.PRNGKey(0)
    params = material_params(scn)
    if param_filter is not None:
        params = {k: v for k, v in params.items() if k in param_filter}
    keys = jax.random.split(key, FRAMES)

    def apply_partial(scene_, params_):
        full = material_params(scene_)
        full.update(params_)
        return apply_material_params(scene_, full)

    def loss_fn(params_, scn_, cam_, key_):
        scn_p = apply_partial(scn_, params_)
        be = make_backend(scn_p, cfg)
        img = render_image(scn_p, cam_, cfg, backend=be, key=key_)
        return jnp.mean(img)

    def jittered(cam_, key_):
        eps = jax.random.uniform(key_, (3,), jnp.float32, -1e-4, 1e-4)
        return dataclasses.replace(cam_, look_at=cam_.look_at + eps)

    @jax.jit
    def steps(params_, scn_, cam_, keys_):
        def one(carry, key_):
            loss, grads = jax.value_and_grad(loss_fn)(
                params_, scn_, jittered(cam_, key_), key_)
            return carry + loss, grads

        return jax.lax.scan(one, jnp.float32(0.0), keys_)

    t = time_fn(steps, params, scn, cam, keys, iters=5)
    return t / FRAMES


def probe_profile():
    import jax

    import cg_raytracer_tpu  # noqa: F401  (path check)

    t = None
    try:
        jax.profiler.start_trace("/tmp/jaxprof")
        t = _bench_core()
        jax.profiler.stop_trace()
        log(stage="prof", what="trace written", ms=round(t * 1e3, 2))
    except Exception as e:
        log(stage="prof", what="trace failed", error=repr(e)[:300],
            ms=None if t is None else round(t * 1e3, 2))


def probe_kd_only():
    t = _bench_core(param_filter={"kd"})
    log(stage="prof", what="fwd+bwd grad kd only", ms=round(t * 1e3, 2))


def probe_nolight():
    t = _bench_core(param_filter={"kd", "ks", "shininess"})
    log(stage="prof", what="fwd+bwd grad materials only",
        ms=round(t * 1e3, 2))


def probe_hoist():
    """Composition-fix candidate: run the oracle bounces OUTSIDE
    value_and_grad (they are param-independent pure functions of geometry),
    then differentiate only the shade chain over the recorded hits — all
    inside ONE jit.  Numerically identical to the real loss (the oracle sees
    the same rays: o1/d1 are geometry-only)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    import cg_raytracer_tpu as cgrt
    from cg_raytracer_tpu.models.whitted import (Backend, effective_max_depth,
                                                 make_backend, trace_rays)
    from cg_raytracer_tpu.ops import camera as cam_ops
    from cg_raytracer_tpu.ops.intersect import reconstruct_hit
    from cg_raytracer_tpu.ops.linalg import reflect, safe_normalize
    from cg_raytracer_tpu.optim.inverse import (apply_material_params,
                                                material_params)
    from cg_raytracer_tpu.utils.bench import time_fn

    scn = cgrt.load_scene("cornell_box")
    cfg = cgrt.RenderConfig(width=W, height=H)
    cfg = dataclasses.replace(cfg, max_depth=effective_max_depth(scn, cfg))
    cam = cgrt.Camera.default(aspect=1.0)
    params = material_params(scn)
    keys = jax.random.split(jax.random.PRNGKey(0), FRAMES)
    backend = make_backend(scn, cfg)

    def jittered(cam_, key_):
        eps = jax.random.uniform(key_, (3,), jnp.float32, -1e-4, 1e-4)
        return dataclasses.replace(cam_, look_at=cam_.look_at + eps)

    def records_for(scn_, cam_, key_):
        o, d = cam_ops.generate_rays(cam_, H, W)
        hit0, bits0 = backend.bounce(o, d)
        surf = reconstruct_hit(scn_, o, d, hit0)
        refl = safe_normalize(reflect(d, surf.normal))
        act = surf.valid & jnp.any(surf.ks > 0.01, -1)
        o1 = surf.position + 1e-3 * refl
        d1 = jnp.where(act[:, None], refl, d)
        hit1, bits1 = backend.bounce(o1, d1, live=act)
        return o, d, hit0, bits0, hit1, bits1

    def shade_loss(params_, scn_, rec, key_):
        o, d, hit0, bits0, hit1, bits1 = rec
        scn_p = apply_material_params(scn_, params_)
        fixed = iter([(hit0, bits0), (hit1, bits1)])
        be = Backend(closest=None, occluded=None,
                     bounce=lambda *_a, **_k: next(fixed))
        color = trace_rays(scn_p, o, d, cfg, be, key_)
        return jnp.mean(color)

    @jax.jit
    def steps(params_, scn_, cam_, keys_):
        def one(carry, key_):
            rec = records_for(scn_, jittered(cam_, key_), key_)
            loss, grads = jax.value_and_grad(shade_loss)(
                params_, scn_, rec, key_)
            return carry + loss, grads

        return jax.lax.scan(one, jnp.float32(0.0), keys_)

    t = time_fn(steps, params, scn, cam, keys, iters=5)
    log(stage="prof", what="fwd+bwd oracle hoisted out of grad",
        ms=round(t / FRAMES * 1e3, 2))


PROBES = {
    "profile": probe_profile,
    "kd_only": probe_kd_only,
    "nolight": probe_nolight,
    "hoist": probe_hoist,
}


def main():
    from cg_raytracer_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    names = sys.argv[1:] or ["hoist", "kd_only", "nolight", "profile"]
    for name in names:
        t0 = time.time()
        log(stage="prof", what=f"START {name}")
        try:
            PROBES[name]()
            log(stage="prof", what=f"DONE {name}",
                wall_s=round(time.time() - t0, 1))
        except Exception as e:
            log(stage="prof", what=f"ERROR {name}", error=repr(e)[:500])


if __name__ == "__main__":
    main()
