#!/usr/bin/env python
"""Bisect the jnp while-loop BVH device fault (VERDICT r1 item 8).

Round-1 observation: backend='bvh' (ops/bvh.py::traverse_closest, a vmapped
per-ray while_loop) kills the v5e chip at donut scale (320K tris x 640K rays);
ray_chunk did not avoid it.  make_backend now refuses that combination unless
CGRT_ALLOW_TPU_BVH=1.  This script probes the (num_tris x num_rays x
max_stack) grid from known-good sizes upward to find the failing threshold.

RUN THIS LAST: a device fault can wedge the remote-TPU tunnel for subsequent
work in the same session.  Each probe runs in a fresh subprocess so a fault
kills the probe, not the sweep; results append to bvh_fault_probes.jsonl.
"""
import json
import os
import subprocess
import sys

PROBE = r"""
import os, sys
os.environ["CGRT_ALLOW_TPU_BVH"] = "1"
import jax, jax.numpy as jnp
num_tris, num_rays, max_stack = map(int, sys.argv[1:4])
from cg_raytracer_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
import numpy as np
from cg_raytracer_tpu.scene.presets import _procedural_donut, load_scene
from cg_raytracer_tpu.scene.types import make_scene
from cg_raytracer_tpu.scene.loader import center_and_scale_to_unit
from cg_raytracer_tpu.ops.bvh import build_bvh, traverse_closest

# Donut geometry subsampled to num_tris (keeps the thin-shell structure).
mesh = _procedural_donut()
center_and_scale_to_unit([mesh])
scene = make_scene([mesh])
tris = scene.triangles[:num_tris]
import dataclasses
scene = dataclasses.replace(scene, triangles=tris)
bvh = build_bvh(scene)
import cg_raytracer_tpu as cgrt
from cg_raytracer_tpu.ops.camera import generate_rays
side = int(np.sqrt(num_rays))
o, d = generate_rays(cgrt.Camera.default(), side, side)
hit, _ = jax.jit(lambda o_, d_: traverse_closest(bvh, o_, d_,
                                                 max_stack=max_stack))(o, d)
jax.block_until_ready(hit.t)
print("OK", float(jnp.mean(jnp.isfinite(hit.t))))
"""


def probe(num_tris, num_rays, max_stack, timeout=1200):
    r = subprocess.run([sys.executable, "-c", PROBE, str(num_tris),
                        str(num_rays), str(max_stack)],
                       capture_output=True, text=True, timeout=timeout)
    ok = r.returncode == 0 and "OK" in r.stdout
    tail = (r.stdout + r.stderr)[-300:]
    return ok, tail


def main():
    out = open("bvh_fault_probes.jsonl", "a")
    # Coarse grid: triangles x rays at the default stack, then stack depth.
    # Round-3 datapoint: a DIFFERENT vmapped while-loop (the roofline
    # visit-stats counter) faulted the worker at monkey scale (968 tris x
    # 40K rays) — so small-scale probes and a repeat run (flakiness check)
    # come first; the highest-value configs lead in case the tunnel wedges.
    grid = [
        (1_000, 40_000, 64),       # today's small-scale fault neighborhood
        (1_000, 40_000, 64),       # repeat: flaky or deterministic?
        (320_000, 640_000, 64),    # the known-faulting config
        (40_000, 160_000, 64),
        (160_000, 160_000, 64),
        (320_000, 160_000, 64),
        (320_000, 640_000, 32),    # shallower stack
    ]
    for num_tris, num_rays, max_stack in grid:
        try:
            ok, tail = probe(num_tris, num_rays, max_stack)
        except subprocess.TimeoutExpired:
            ok, tail = False, "TIMEOUT"
        rec = {"tris": num_tris, "rays": num_rays, "stack": max_stack,
               "ok": ok, "tail": tail if not ok else ""}
        print(json.dumps(rec), flush=True)
        out.write(json.dumps(rec) + "\n")
        out.flush()


if __name__ == "__main__":
    main()
