"""Round-5 sweep C (real chip; appends to scripts/r5_results.jsonl).

Stages:
  pop2     batched-pop port follow-ups: donut through the HBM4 kernel and
           monkey_spherical through the 4-wide cone sampler, base vs
           batched (+ donut image parity at 800^2).
  table2   reference Table 2 refresh at the new autos (fwd + fwd+bwd per
           scene) — the definitive round-5 rows.
  gather3  gather microbench redo with DEVICE-side scalar reduction (the
           r5a gather2 rows transferred a [640K] vector host-side per call,
           polluting every row by the tunnel transfer cost).

Usage: python scripts/tpu_r5c.py [stage ...]
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


def _fwdbwd(scene, ov, iters=3, frames=4, res=800):
    from cg_raytracer_tpu.utils.bench import run_bench

    r = run_bench(scene, res, res, include_bwd=True, iters=iters,
                  frames_per_call=frames, cfg_overrides=ov)
    return round(r["seconds_per_frame"] * 1e3, 2)


def stage_pop2():
    import numpy as np

    import cg_raytracer_tpu as cgrt

    # Donut image parity base vs batched through the HBM4 kernel.
    scene = cgrt.load_scene("donut")
    cam = cgrt.Camera.default()
    cfg0 = cgrt.RenderConfig(width=320, height=320, backend="pallas",
                             forward_only=True, bvh_pop="base")
    import dataclasses

    cfg1 = dataclasses.replace(cfg0, bvh_pop="batched")
    i0 = np.asarray(cgrt.render(scene, cam, cfg0))
    i1 = np.asarray(cgrt.render(scene, cam, cfg1))
    log(stage="pop2", what="donut_parity",
        bitwise=bool((i0 == i1).all()),
        maxdiff=float(np.abs(i0 - i1).max()))

    log(stage="pop2", scene="donut", pop="base",
        ms=_fwd("donut", {"bvh_pop": "base"}))
    log(stage="pop2", scene="donut", pop="batched",
        ms=_fwd("donut", {"bvh_pop": "batched"}))
    log(stage="pop2", scene="monkey_spherical_light", pop="base",
        ms=_fwd("monkey_spherical_light", {"bvh_pop": "base"}))
    log(stage="pop2", scene="monkey_spherical_light", pop="batched",
        ms=_fwd("monkey_spherical_light", {"bvh_pop": "batched"}))


def stage_table2():
    rows = [
        ("cornell_box", 168.0),
        ("cornell_box_spherical_light", 48500.0),
        ("monkey", 500.0),
        ("dragon", 500.0),
        ("teacup", 430.0),
        ("donut", 6500.0),
    ]
    for scn, ref_ms in rows:
        # fwd at frames=8 (comparable to every prior round's fwd column);
        # fwd+bwd at frames=4 (the r4 convention for that column).
        fwd = _fwd(scn, {}, frames=8)
        fb = _fwdbwd(scn, {})
        log(stage="table2", scene=scn, fwd_ms=fwd, fwdbwd_ms=fb,
            ref_ms=ref_ms, speedup=round(ref_ms / fwd, 1))


def stage_gather3():
    import numpy as np

    import jax
    import jax.numpy as jnp

    N = 640_000
    T = 48_000
    rng = np.random.default_rng(0)
    base = np.sort(rng.integers(0, T, N))
    idx = jnp.asarray(np.clip(base + rng.integers(-32, 32, N), 0, T - 1),
                      jnp.int32)

    def timed(name, lanes, make_fn, iters=16):
        table = jnp.asarray(rng.standard_normal((T, lanes)), jnp.float32)
        fn = jax.jit(make_fn(table))
        for _ in range(3):
            s = float(fn(idx))  # scalar output: true sync, 4-byte transfer
        t0 = time.perf_counter()
        for _ in range(iters):
            s = float(fn(idx))
        dt = (time.perf_counter() - t0) / iters * 1e3
        log(stage="gather3", what=name, lanes=lanes, ms_per_call=round(dt, 3))

    def row_gather(table):
        return lambda ix: jnp.sum(table[ix])

    def scan8(table):
        # Amortize dispatch like the render loop: 8 gathers per call.
        def f(ix):
            def body(c, k):
                return c + jnp.sum(table[(ix + k) % T]), None

            out, _ = jax.lax.scan(body, 0.0, jnp.arange(8))
            return out / 8.0

        return f

    timed("row19", 19, row_gather)
    timed("row32", 32, row_gather)
    timed("row64", 64, row_gather)
    timed("row128", 128, row_gather)
    timed("row19_scan8", 19, scan8, iters=4)
    timed("row32_scan8", 32, scan8, iters=4)





def stage_pop3():
    """Tile-size / interleave re-sweep at batched pops: cheaper per-pop events
    may shift the divergence-vs-overhead optimum below 32 rows (the r2/r3
    optima were measured at 'base' pop cost)."""
    for scn in ("teacup", "dragon"):
        for rows in (32, 16):
            for il in ("2", "4"):
                try:
                    ms = _fwd(scn, {"bvh_pop": "batched",
                                    "bvh_tile_rows": rows,
                                    "bvh_interleave": il})
                    log(stage="pop3", scene=scn, rows=rows, il=il, ms=ms)
                except Exception as e:
                    log(stage="pop3", scene=scn, rows=rows, il=il,
                        error=repr(e)[:200])
    for rows in (32, 16):
        for il in ("1", "2"):
            try:
                ms = _fwd("donut", {"bvh_pop": "batched",
                                    "bvh_tile_rows": rows,
                                    "bvh_interleave": il})
                log(stage="pop3", scene="donut", rows=rows, il=il, ms=ms)
            except Exception as e:
                log(stage="pop3", scene="donut", rows=rows, il=il,
                    error=repr(e)[:200])


def stage_leaf():
    """Leaf-width re-check at batched pops: cheaper pops shift the
    pops-vs-leaf-MT trade toward narrower leaves?"""
    for scn in ("teacup", "dragon"):
        for leaf in (56, 28):
            ms = _fwd(scn, {"pallas_bvh_max_leaf": leaf})
            log(stage="leaf", scene=scn, leaf=leaf, ms=ms)


def stage_w8():
    """Width-8 re-check at batched pops: the r4 loss was blamed on per-level
    sort/reduce work scaling with width — the batched reduce collapses the 8
    reduction crossings to one, which may flip the trade."""
    for scn in ("teacup", "dragon"):
        for wide in ("4", "8"):
            try:
                ms = _fwd(scn, {"bvh_wide": wide})
                log(stage="w8", scene=scn, wide=wide, ms=ms)
            except Exception as e:
                log(stage="w8", scene=scn, wide=wide, error=repr(e)[:200])


def stage_cone_il():
    for il in ("1", "2", "4"):
        try:
            ms = _fwd("monkey_spherical_light", {"soft_cone_interleave": il})
            log(stage="cone_il", il=il, ms=ms)
        except Exception as e:
            log(stage="cone_il", il=il, error=repr(e)[:300])


STAGES = {"pop2": stage_pop2, "table2": stage_table2,
          "gather3": stage_gather3, "pop3": stage_pop3, "leaf": stage_leaf,
          "w8": stage_w8, "cone_il": stage_cone_il}


def main():
    from cg_raytracer_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    for name in (sys.argv[1:] or list(STAGES)):
        print(f"=== stage {name} ===", flush=True)
        t0 = time.perf_counter()
        try:
            STAGES[name]()
        except Exception as e:
            log(stage=name, fatal=repr(e)[:500])
        print(f"=== {name} done in {time.perf_counter() - t0:.1f}s ===",
              flush=True)


if __name__ == "__main__":
    main()

