"""Decompose teacup fwd at final autos: traversal vs record-surface gather vs
shade chain — sizes the round-6 in-kernel-capture lever."""
import json, time
import numpy as np
import jax, jax.numpy as jnp
import cg_raytracer_tpu as cgrt
from cg_raytracer_tpu.models.whitted import (build_accel, make_backend,
                                             _ray_order_perm)
from cg_raytracer_tpu.ops import camera as cam_ops
from cg_raytracer_tpu.ops.intersect import record_surface
from cg_raytracer_tpu.ops.pallas_shade import shade_fused_pallas
from cg_raytracer_tpu.ops.linalg import reflect, safe_normalize
from cg_raytracer_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()
scene = cgrt.load_scene("teacup")
cfg = cgrt.RenderConfig(width=800, height=800, backend="pallas")
accel = build_accel(scene, cfg)
be = make_backend(scene, cfg, bvh=accel)
o0, d0 = cam_ops.generate_rays(cgrt.Camera.default(), 800, 800)
perm, inv = _ray_order_perm(800, 800, "morton", 32)
o0, d0 = o0[perm], d0[perm]

def phase1(o, d, scene):
    sg = jax.tree_util.tree_map(jax.lax.stop_gradient, scene)
    hit0, bits0 = be.bounce(o, d)
    surf = record_surface(sg, o, d, hit0)
    refl = safe_normalize(reflect(d, surf.normal))
    act = surf.valid & jnp.any(surf.ks > 0.01, axis=-1)
    o1 = surf.position + 1e-3 * refl
    d1 = jnp.where(act[:, None], refl, d)
    hit1, bits1 = be.bounce(o1, d1, live=act)
    return (o, d, hit0, bits0), (o1, d1, hit1, bits1), act

def jit_time(name, fn, *args, iters=5):
    f = jax.jit(fn)
    for _ in range(2):
        jax.block_until_ready(f(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(f(*args))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    print(json.dumps({"stage": "decomp", "what": name,
                      "ms": round(ts[len(ts)//2] * 1e3, 2)}), flush=True)

# A: level-0 bounce only
jit_time("bounce_L0", lambda o, d: be.bounce(o, d)[0].t.sum(), o0, d0)
# B: full phase 1 (adds record_surface gather + level-1 bounce)
def b_fn(o, d):
    r0, r1, act = phase1(o, d, scene)
    return r0[2].t.sum() + r1[2].t.sum()
jit_time("phase1", b_fn, o0, d0)
# C: phase 1 + both shade-kernel levels (the full fwd chain minus misc)
def c_fn(o, d):
    r0, r1, act = phase1(o, d, scene)
    c0 = shade_fused_pallas(scene, r0[0], r0[1], r0[2], r0[3])[0]
    c1 = shade_fused_pallas(scene, r1[0], r1[1], r1[2], r1[3])[0]
    return c0.sum() + c1.sum()
jit_time("phase1_plus_shade", c_fn, o0, d0)
# D: phase-1 with reconstruct_hit instead (the r4 structure) for the delta
from cg_raytracer_tpu.ops.intersect import reconstruct_hit
def d_fn(o, d):
    sg = jax.tree_util.tree_map(jax.lax.stop_gradient, scene)
    hit0, bits0 = be.bounce(o, d)
    surf = reconstruct_hit(sg, o, d, hit0)
    refl = safe_normalize(reflect(d, surf.normal))
    act = surf.valid & jnp.any(surf.ks > 0.01, axis=-1)
    o1 = surf.position + 1e-3 * refl
    d1 = jnp.where(act[:, None], refl, d)
    hit1, _ = be.bounce(o1, d1, live=act)
    return hit0.t.sum() + hit1.t.sum()
jit_time("phase1_reconstruct", d_fn, o0, d0)
