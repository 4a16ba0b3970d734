"""Round-4 sweep F: WHERE do the ~2-3 us/event go?  (ceiling_analysis.py
found ~85% of mesh-scene frame time is per-pop/leaf-row overhead.)

Microbenchmark kernels, each a while_loop of ITERS iterations over a
(32, 128) ray-tile-shaped state, isolating one cost component:

  scalar    scalar-only carry, scalar body           -> loop-control floor
  reduce1   + one cross-lane min reduction/iter      -> reduction cost
  reduce4   + four reductions/iter (the 4-wide pop)  -> reduction scaling
  carry2    + two (32,128) carried tiles updated/iter -> vector-carry cost
  carry4    + four carried tiles (t/slot/u/v today)   -> carry scaling
  scratch4  four tiles in VMEM scratch refs, scalar carry -> ref-state cost
  smem1     + one SMEM read + write per iter          -> stack-op cost

Per-iteration us for each variant prices the round-5 restructure options
(drop u/v from the carry; move state to scratch refs; batch reductions).

Usage: python scripts/tpu_r4f.py
"""
import functools
import json
import os
import time

RESULTS = os.path.join(os.path.dirname(__file__), "r4_results.jsonl")
ITERS = 100_000  # big enough that per-iter cost dwarfs the ~25 ms dispatch
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
        def kernel(x_ref, o_ref, t0_ref, t1_ref, t2_ref, t3_ref, sm_ref):
            x = x_ref[0]
            if variant == "scratch4":
                for r in (t0_ref, t1_ref, t2_ref, t3_ref):
                    r[...] = x

            n_tiles = {"carry2": 2, "carry4": 4}.get(variant, 0)

            def cond(c):
                return c[0] < ITERS

            def body(c):
                i, acc = c[0], c[1]
                tiles = c[2:]
                # Data-dependent scalar chain (not hoistable/DCE-able).
                acc = acc * 1.000001 + 1.0
                if variant in ("reduce1", "reduce4"):
                    nred = 1 if variant == "reduce1" else 4
                    for k in range(nred):
                        acc = acc + jnp.min(x + acc)
                if variant in ("carry2", "carry4"):
                    tiles = tuple(t + acc for t in tiles)
                    acc = acc + tiles[0][0, 0] * 0.0
                if variant == "scratch4":
                    for r in (t0_ref, t1_ref, t2_ref, t3_ref):
                        r[...] = r[...] + acc
                    acc = acc + t0_ref[0, 0] * 0.0
                if variant == "smem1":
                    sm_ref[jnp.int32(0)] = acc
                    acc = acc + sm_ref[jnp.int32(0)] * 1e-9
                return (i + 1, acc) + tiles

            init = (jnp.int32(0), jnp.float32(0.0)) + tuple(
                x for _ in range(n_tiles))
            out = jax.lax.while_loop(cond, body, init)
            res = out[1]
            if variant == "scratch4":
                res = res + t1_ref[0, 0]
            if n_tiles:
                res = res + out[2][0, 0]
            o_ref[0] = x + res

        return kernel

    x = jnp.arange(ROWS * 128, dtype=jnp.float32).reshape(1, ROWS, 128)
    base_us = None
    for variant in ("scalar", "reduce1", "reduce4", "carry2", "carry4",
                    "scratch4", "smem1"):
        try:
            f = pl.pallas_call(
                make_kernel(variant),
                grid=(1,),
                in_specs=[pl.BlockSpec((1, ROWS, 128), lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((1, ROWS, 128), lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((1, ROWS, 128), jnp.float32),
                scratch_shapes=[pltpu.VMEM((ROWS, 128), jnp.float32)
                                for _ in range(4)]
                + [pltpu.SMEM((8,), jnp.float32)],
            )
            jf = jax.jit(lambda a, f=f: f(a))
            s = time_fn(jf, x, iters=5)
            us = s / ITERS * 1e6
            rec = {"stage": "loopcost", "variant": variant,
                   "us_per_iter": round(us, 3)}
            if variant == "scalar":
                base_us = us
            elif base_us is not None:
                rec["delta_us_vs_scalar"] = round(us - base_us, 3)
            log(**rec)
        except Exception as e:
            log(stage="loopcost", variant=variant, error=repr(e)[:300])


if __name__ == "__main__":
    main()
