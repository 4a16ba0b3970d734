"""Round-4 sweep F2: the generic loop costs measured ~0 (tpu_r4f.py loopcost
— carries, reductions, SMEM ops all nanoseconds/iter), so the ~2-3 us/event
must come from specific pop structures.  Variants, each ONE suspect on top of
the scalar loop (ITERS iterations, (32,128) tile):

  redsmem    cross-lane reduce -> SMEM store -> scalar read-back (the
             vector->scalar domain crossing every pop's tstack push does)
  redbranch  cross-lane reduce -> lax.cond on the result (the visit decision)
  dynrow     dynamic-index VMEM row read (nodes4_ref[enc] every pop)
  switch3    3-branch lax.switch with small vector bodies (the pop dispatch)
  innerfori  inner fori_loop with dynamic trip count + dynamic row read + 14
             unrolled FMAs (the leaf-row sweep shape)

Usage: python scripts/tpu_r4f2.py
"""
import json
import os

RESULTS = os.path.join(os.path.dirname(__file__), "r4_results.jsonl")
ITERS = 20_000
ROWS = 32


def log(**rec):
    with open(RESULTS, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def main():
    from cg_raytracer_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from cg_raytracer_tpu.utils.bench import time_fn

    def make_kernel(variant):
        def kernel(x_ref, tab_ref, o_ref, sm_ref):
            x = x_ref[0]

            def cond(c):
                return c[0] < ITERS

            def body(c):
                i, acc, tile = c
                acc = acc * 1.000001 + 1.0
                if variant == "redsmem":
                    m = jnp.min(tile)  # tile is loop-carried: not hoistable
                    sm_ref[jnp.int32(1)] = m
                    acc = acc + sm_ref[jnp.int32(1)]
                    tile = tile + 1e-7
                elif variant == "redbranch":
                    m = jnp.min(tile)
                    acc = jax.lax.cond(m > 0.0, lambda a: a + 1.0,
                                       lambda a: a - 1.0, acc)
                    tile = tile + 1e-7
                elif variant == "dynrow":
                    idx = jnp.int32(i % 64)
                    row = tab_ref[idx]
                    acc = acc + row[0] * 1e-9
                elif variant == "switch3":
                    kind = i % 3

                    def b0(t):
                        return t + 1e-7

                    def b1(t):
                        return t * 1.0000001

                    def b2(t):
                        return t - 1e-7

                    tile = jax.lax.switch(kind, [b0, b1, b2], tile)
                elif variant == "innerfori":
                    n = 1 + (i % 2)  # dynamic trip count 1-2

                    def rb(r, t):
                        trow = tab_ref[jnp.int32((i + r) % 64)]
                        for k in range(14):
                            t = t + trow[k] * 1e-9
                        return t

                    tile = jax.lax.fori_loop(0, n, rb, tile)
                return i + 1, acc, tile

            out = jax.lax.while_loop(
                cond, body, (jnp.int32(0), jnp.float32(0.0), x))
            o_ref[0] = out[2] + out[1]

        return kernel

    x = (jnp.arange(ROWS * 128, dtype=jnp.float32).reshape(1, ROWS, 128)
         * 1e-6 + 1.0)
    tab = jnp.arange(64 * 128, dtype=jnp.float32).reshape(64, 128) * 1e-6
    for variant in ("redsmem", "redbranch", "dynrow", "switch3", "innerfori"):
        try:
            f = pl.pallas_call(
                make_kernel(variant),
                grid=(1,),
                in_specs=[pl.BlockSpec((1, ROWS, 128), lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((1, ROWS, 128), lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((1, ROWS, 128), jnp.float32),
                scratch_shapes=[pltpu.SMEM((8,), jnp.float32)],
            )
            jf = jax.jit(lambda a, t, f=f: f(a, t))
            s = time_fn(jf, x, tab, iters=5)
            log(stage="loopcost2", variant=variant,
                us_per_iter=round(s / ITERS * 1e6, 3))
        except Exception as e:
            log(stage="loopcost2", variant=variant, error=repr(e)[:300])


if __name__ == "__main__":
    main()
