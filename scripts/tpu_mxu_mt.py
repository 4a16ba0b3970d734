#!/usr/bin/env python
"""Prototype: Moller-Trumbore on the MXU (VERDICT r1 item 3 follow-on).

MT's four per-(ray, triangle) quantities are exact polynomials in the
16-monomial ray basis {1, o, d, o (x) d}:

    det   = -d . n                              (n = e1 x e2)
    u_num = o . (d x e2) + d . (e2 x v0)
    v_num = d . (o x e1) - d . (v0 x e1)
    t_num = n . (o - v0)

so a whole triangle block's (det, u_num, v_num, t_num) is ONE matmul
W[4T, 16] @ F[16, R] — MXU work instead of ~70 VPU ops per (ray, tri).  The
VPU keeps only the divide/compare/select epilogue (~20 ops/tri).  Per-tri
coefficients are fitted numerically host-side (16 random basis rays, one
16x16 solve — no sign-convention bugs possible; validated against _mt_tile).

This prototype validates exactness vs the VPU kernel and times both on a
standalone sweep.  Run on TPU:  python scripts/tpu_mxu_mt.py
"""
import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cg_raytracer_tpu.ops.pallas_kernels import _mt_tile

ROWS, COLS = 64, 128
N = ROWS * COLS


def mt_coeff_matrix(tri9):
    """[T, 9] triangle table -> W [4*T, 16] coefficient matrix, fitted
    numerically: evaluate the reference formulas on 16 basis rays and solve."""
    rng = np.random.RandomState(0)
    o = rng.randn(16, 3)
    d = rng.randn(16, 3)
    # Feature matrix Phi [16 rays, 16 monomials]: 1, o, d, outer(d, o).
    phi = np.concatenate(
        [np.ones((16, 1)), o, d, (d[:, :, None] * o[:, None, :]).reshape(16, 9)],
        axis=1)
    tri = np.asarray(tri9, np.float64)
    v0, v1, v2 = tri[:, 0:3], tri[:, 3:6], tri[:, 6:9]
    e1, e2 = v1 - v0, v2 - v0
    # Reference quantities on the basis rays (float64 for an exact fit).
    pvec = np.cross(d[:, None, :], e2[None])          # [16, T, 3]
    det = (e1[None] * pvec).sum(-1)                   # [16, T]
    tvec = o[:, None, :] - v0[None]
    unum = (tvec * pvec).sum(-1)
    qvec = np.cross(tvec, e1[None])
    vnum = (d[:, None, :] * qvec).sum(-1)
    tnum = (e2[None] * qvec).sum(-1)
    targets = np.stack([det, unum, vnum, tnum], axis=1)  # [16, 4, T]
    T = tri.shape[0]
    w = np.linalg.solve(phi, targets.reshape(16, 4 * T))  # [16, 4T]
    return w.T.astype(np.float32)  # [4T, 16]


def features(ox, oy, oz, dx, dy, dz):
    """16 monomial tiles -> [16, R] feature matrix (R = flattened rays)."""
    one = jnp.ones_like(ox)
    feats = [one, ox, oy, oz, dx, dy, dz,
             dx * ox, dx * oy, dx * oz,
             dy * ox, dy * oy, dy * oz,
             dz * ox, dz * oy, dz * oz]
    return jnp.stack([f.reshape(-1) for f in feats], axis=0)


_MT_EPS = 1e-9
_BARY_EPS = 1e-6


def _vpu_kernel(ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tris_ref,
                t_ref, slot_ref, *, num_tris, reps):
    ox, oy, oz = ox_ref[0], oy_ref[0], oz_ref[0]
    dx, dy, dz = dx_ref[0], dy_ref[0], dz_ref[0]

    def rep(_, carry):
        t_best, slot = carry
        for ti in range(num_tris):
            tri = tris_ref[ti]
            t, u, v, valid = _mt_tile(ox, oy, oz, dx, dy, dz, tri)
            closer = valid & (t < t_best)
            t_best = jnp.where(closer, t, t_best)
            slot = jnp.where(closer, ti, slot)
        return t_best, slot

    t_best, slot = jax.lax.fori_loop(
        0, reps, rep, (jnp.full((ROWS, COLS), jnp.inf, jnp.float32),
                       jnp.full((ROWS, COLS), -1, jnp.int32)))
    t_ref[0] = t_best
    slot_ref[0] = slot


def _mxu_kernel(ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, w_ref,
                t_ref, slot_ref, *, num_tris, reps):
    ox, oy, oz = ox_ref[0], oy_ref[0], oz_ref[0]
    dx, dy, dz = dx_ref[0], dy_ref[0], dz_ref[0]
    feat = features(ox, oy, oz, dx, dy, dz)  # [16, N]

    def rep(_, carry):
        t_best, slot = carry
        raw = jax.lax.dot_general(
            w_ref[...], feat, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)  # [4T, N]
        for ti in range(num_tris):
            # W rows are quantity-major: [det x T, unum x T, vnum x T, tnum x T].
            det = raw[0 * num_tris + ti].reshape(ROWS, COLS)
            unum = raw[1 * num_tris + ti].reshape(ROWS, COLS)
            vnum = raw[2 * num_tris + ti].reshape(ROWS, COLS)
            tnum = raw[3 * num_tris + ti].reshape(ROWS, COLS)
            ok_det = jnp.abs(det) > _MT_EPS
            inv = jnp.where(ok_det, 1.0 / det, 0.0)
            u = unum * inv
            v = vnum * inv
            t = tnum * inv
            valid = (ok_det & (u >= -_BARY_EPS) & (v >= -_BARY_EPS)
                     & (u + v <= 1.0 + _BARY_EPS) & (t >= 0.0))
            closer = valid & (t < t_best)
            t_best = jnp.where(closer, t, t_best)
            slot = jnp.where(closer, ti, slot)
        return t_best, slot

    t_best, slot = jax.lax.fori_loop(
        0, reps, rep, (jnp.full((ROWS, COLS), jnp.inf, jnp.float32),
                       jnp.full((ROWS, COLS), -1, jnp.int32)))
    t_ref[0] = t_best
    slot_ref[0] = slot


def run(kernel, inputs, num_tris, reps, interpret=False):
    k = functools.partial(kernel, num_tris=num_tris, reps=reps)
    spec = lambda: pl.BlockSpec((1, ROWS, COLS), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)
    return pl.pallas_call(
        k, grid=(1,),
        in_specs=[spec() for _ in range(6)] + [pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=[spec(), spec()],
        out_shape=[jax.ShapeDtypeStruct((1, ROWS, COLS), jnp.float32),
                   jax.ShapeDtypeStruct((1, ROWS, COLS), jnp.int32)],
        interpret=interpret,
    )(*inputs)


def main():
    interpret = jax.default_backend() != "tpu"
    if not interpret:
        from cg_raytracer_tpu.utils.cache import enable_compilation_cache

        enable_compilation_cache()
    rng = np.random.RandomState(42)
    T = 56
    tris = rng.randn(T, 9).astype(np.float32)
    o = rng.randn(N, 3).astype(np.float32) * 0.1 - np.array([0, 0, 3], np.float32)
    d = rng.randn(N, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    tiles = [jnp.asarray(a[:, i].reshape(1, ROWS, COLS))
             for a in (o, d) for i in range(3)]
    w = jnp.asarray(mt_coeff_matrix(tris))
    tris_j = jnp.asarray(tris)

    reps = 1 if interpret else 64
    tv, sv = run(_vpu_kernel, tiles + [tris_j], T, reps, interpret)
    tm, sm = run(_mxu_kernel, tiles + [w], T, reps, interpret)
    tv, sv, tm, sm = map(np.asarray, (tv, sv, tm, sm))
    hit = sv >= 0
    agree = (sv == sm).mean()
    tdiff = np.abs(np.where(hit, tv, 0) - np.where(sm >= 0, tm, 0)).max()
    print(json.dumps({"slot_agreement": float(agree), "max_t_diff": float(tdiff),
                      "hit_frac": float(hit.mean())}))

    if not interpret:
        for name, kern, extra in (("vpu", _vpu_kernel, tris_j),
                                  ("mxu", _mxu_kernel, w)):
            f = jax.jit(lambda *a: run(kern, list(a), T, reps))
            jax.block_until_ready(f(*tiles, extra))
            ts = []
            for _ in range(5):
                t0 = time.perf_counter()
                jax.block_until_ready(f(*tiles, extra))
                ts.append(time.perf_counter() - t0)
            ts.sort()
            med = ts[len(ts) // 2]
            mt_per_s = N * T * reps / med
            print(json.dumps({"kernel": name, "ms": round(med * 1e3, 3),
                              "g_mt_tests_per_s": round(mt_per_s / 1e9, 2)}),
                  flush=True)


if __name__ == "__main__":
    main()
