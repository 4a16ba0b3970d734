#!/usr/bin/env python
"""Reproduce the reference's performance table (report.pdf §9 Table 2) on TPU.

Same conditions as the reference: 800x800, Whitted depth 2, point/spherical lights
per scene preset; soft shadows use the reference's 200 samples.  Prints one JSON
line per scene with the wall-clock and the speedup vs the reference's CPU time
(BASELINE.md).  The Dragon/Teacup/Donut rows use procedural stand-ins at the
reported triangle counts (their data files were stripped from / never committed
to the reference repo).  Donut (320K tris) exercises the HBM-streaming Pallas
BVH kernel; the others fit the all-VMEM kernel.
"""
import argparse
import json
import time

import jax

REFERENCE_MS = {
    "cornell_box": 168.0,
    "cornell_box_spherical_light": 48_500.0,
    "monkey": 500.0,
    "dragon": 500.0,
    "teacup": 430.0,
    "donut": 6_500.0,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--no-bwd", action="store_true",
                    help="skip the fwd+bwd column (faster)")
    args = ap.parse_args()

    from cg_raytracer_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import cg_raytracer_tpu as cgrt

    cam = cgrt.Camera.default()
    for name, ref_ms in REFERENCE_MS.items():
        try:
            scene = cgrt.load_scene(name)
        except FileNotFoundError:
            print(json.dumps({"scene": name, "skipped": "data file missing"}))
            continue
        # forward_only: table renders never differentiate -> eligible scenes
        # take the shade-in-kernel trace megakernel, like the CLI does.
        cfg = cgrt.RenderConfig(width=800, height=800, forward_only=True)
        img = cgrt.render(scene, cam, cfg)
        jax.block_until_ready(img)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            img = cgrt.render(scene, cam, cfg)
            jax.block_until_ready(img)
            ts.append(time.perf_counter() - t0)
        # Median, not min (async dispatch outliers; utils/bench.py::time_fn).
        ms = sorted(ts)[len(ts) // 2] * 1e3
        rec = {"scene": name, "tris": scene.num_triangles, "ms": round(ms, 2),
               "reference_ms": ref_ms}
        if ref_ms:
            rec["speedup_vs_reference"] = round(ref_ms / ms, 2)

        # Steady-state per-frame time: 8 frames scanned inside one dispatch,
        # removing the fixed per-dispatch cost (~25 ms through the remote
        # tunnel) a production render loop would amortize anyway.
        from cg_raytracer_tpu.utils.bench import run_bench

        steady = run_bench(scene=name, width=800, height=800,
                           include_bwd=False, iters=3)
        rec["ms_steady"] = round(steady["seconds_per_frame"] * 1e3, 2)
        if ref_ms:
            rec["speedup_steady"] = round(ref_ms / rec["ms_steady"], 2)

        # fwd+bwd steady: the headline metric is a backward pass, so every
        # Table-2 scene gets a gradient row (VERDICT r3 item 5).  Spherical
        # soft shadows differentiate through the XLA sample scan (the
        # two-phase structure excludes stochastic sampling) and cost
        # accordingly.
        if not args.no_bwd:
            kw = (dict(iters=2, frames_per_call=2)
                  if "spherical" in name else dict(iters=3, frames_per_call=4))
            bwd = run_bench(scene=name, width=800, height=800,
                            include_bwd=True, **kw)
            rec["ms_fwd_bwd"] = round(bwd["seconds_per_frame"] * 1e3, 2)
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
