"""Round-4 sweep G: price the pregathered shade chain's gather/scatter pair.

ceiling hypothesis: monkey's fwd+bwd chain (~16 ms at 640K rays) is dominated
not by the shade kernel but by XLA's gather-VJP scatter-add into the [T,28]
table.  Measure, at N = 640K rays and T in {968, 48000, 320000}:

  gather_fwd    the tiled gather alone (table[prim] -> [G,28,rows,128])
  gather_vjp    gather + its VJP (the scatter-add transpose)
  onehot_vjp    the dot_general alternative for the transpose
                ([G,28,per] x [G,per,T] batched matmul, precision HIGHEST)
                — viable for small/mid T only (flops scale with T)

Usage: python scripts/tpu_r4g.py
"""
import functools
import json
import os

RESULTS = os.path.join(os.path.dirname(__file__), "r4_results.jsonl")


def log(**rec):
    with open(RESULTS, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def main():
    from cg_raytracer_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from cg_raytracer_tpu.ops.pallas_shade import (_NFIELD,
                                                   _gather_fields_tiled)
    from cg_raytracer_tpu.utils.bench import time_fn

    N = 640_000
    ROWS, COLS = 64, 128
    g = -(-N // (ROWS * COLS))

    for T in (968, 48_000, 320_000):
        key = jax.random.PRNGKey(T)
        table = jax.random.normal(key, (T, _NFIELD), jnp.float32)
        prim_t = jax.random.randint(key, (g, ROWS, COLS), 0, T, jnp.int32)
        ct = jax.random.normal(key, (g, _NFIELD, ROWS, COLS), jnp.float32)

        @jax.jit
        def gather_fwd(tab, pt):
            return jnp.sum(_gather_fields_tiled(tab, pt))

        @jax.jit
        def gather_vjp(tab, pt, ct_):
            _, vjp = jax.vjp(lambda t: _gather_fields_tiled(t, pt), tab)
            return vjp(ct_)[0].sum()

        @jax.jit
        def onehot_vjp(tab, pt, ct_):
            per = ROWS * COLS
            d_rows = ct_.reshape(g, _NFIELD, per)
            onehot = jax.nn.one_hot(pt.reshape(g, per), tab.shape[0],
                                    dtype=jnp.float32)
            d = jax.lax.dot_general(
                d_rows, onehot,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
            return jnp.sum(d)

        try:
            ms = time_fn(gather_fwd, table, prim_t, iters=5) * 1e3
            log(stage="gather_cost", T=T, what="gather_fwd", ms=round(ms, 2))
        except Exception as e:
            log(stage="gather_cost", T=T, what="gather_fwd",
                error=repr(e)[:200])
        try:
            ms = time_fn(gather_vjp, table, prim_t, ct, iters=5) * 1e3
            log(stage="gather_cost", T=T, what="gather_vjp", ms=round(ms, 2))
        except Exception as e:
            log(stage="gather_cost", T=T, what="gather_vjp",
                error=repr(e)[:200])
        if T <= 48_000:
            try:
                ms = time_fn(onehot_vjp, table, prim_t, ct, iters=5) * 1e3
                log(stage="gather_cost", T=T, what="onehot_vjp",
                    ms=round(ms, 2))
            except Exception as e:
                log(stage="gather_cost", T=T, what="onehot_vjp",
                    error=repr(e)[:200])


if __name__ == "__main__":
    main()
