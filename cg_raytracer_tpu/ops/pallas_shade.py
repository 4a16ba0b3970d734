"""Fused differentiable shade kernel with a custom VJP — the headline's
reconstruct+Phong chain in one Pallas dispatch each way.

Reference capability: the shading math being differentiated is
``/root/reference/src/main.cpp:61-135`` (diffuseOneLight / specularOneLight /
pointInShadow) over the reconstruction of ``ray_tracing.cpp:94-106``.

Why: the XLA reconstruct+shade chain measured 3.61 ms fwd / 4.72 ms fwd+bwd at
the 1024^2 headline (scripts/tpu_bwd2.py) — ~10x off its flop roofline, lost
to materialized [N,28] gathers, one-hot tables, and a dozen [N,3]
intermediates round-tripping HBM.  This kernel keeps the whole chain in
registers: the forward recomputes Möller–Trumbore on the hit triangle's
attributes, interpolates the facing-flipped shading normal, and accumulates
bit-gated Phong per light.  The backward is the SAME math re-traced under
``jax.vjp`` *inside* the kernel body — elementwise only, so it legalizes —
emitting per-ray cotangents for all 28 gathered fields, the ray origins and
directions, plus per-tile light cotangents.

Two attribute-gather modes, selected by scene size (shade_fused_pallas):

- **select** (T <= SHADE_SELECT_MAX_TRIS): per-ray attributes are gathered
  in-kernel by masked select over static table rows — O(T) per ray, the right
  trade only for tiny tables (the headline Cornell box has 32 triangles).
  The backward's [N,28] -> [T,28] table transpose stays in XLA as a one-hot
  ``dot_general`` (precision HIGHEST — the payload rule from ops/intersect.py
  applies to the transpose too).
- **pregathered** (any T, incl. the VMEM/HBM BVH scenes — VERDICT r3 item 1):
  XLA performs ONE differentiable [N,28] row gather (``table[prim]``, the
  same packed-row pattern as reconstruct_hit) and the kernel consumes the
  per-ray field rows directly; the backward emits per-ray field cotangents
  and XLA's own gather-VJP scatter-adds them into the table.  Mosaic cannot
  express a per-lane vector gather from VMEM (dynamic indexing legalizes on
  the sublane dim only), so the gather/scatter pair is the one piece of this
  chain that stays in XLA by construction.

Gradient contract: identical to the XLA chain.  The gather, the facing flip,
the shadow bits, and ``valid`` are discrete (not differentiated there either);
everything continuous (MT, normal interpolation, Phong, light geometry) is
differentiated by the traced VJP — including the ray origin/direction inputs,
whose cotangents close the two-phase structure's reflected-ray vertex-grad
term (models/whitted.py phase 2; VERDICT r3 item 3).

Scope (supports_shade_kernel): all-triangle scenes with 1..SHADE_MAX_LIGHTS
point lights, no spheres, no spherical lights.  The light cap is 16, NOT
MAX_FUSED_LIGHTS: the backward packs per-light cotangents into lanes
``li * 8 + c`` of one 128-lane row (ADVICE r3 — a 17th light would overflow
the row and silently drop).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..scene.types import Scene
from .intersect import Surface
from .pallas_kernels import (RAY_COLS, RAY_ROWS, SHADOW_EPS,
                             _aux_table, _default_interpret, _mt_tile,
                             _pack_rays, _tri_table)

SHADE_SELECT_MAX_TRIS = 64  # in-kernel masked-select gather above this is O(T)
SHADE_MAX_LIGHTS = 16  # per-light cotangents pack into lanes li*8+c of one row
SHADE_MAX_MATS = 16  # per-material cotangents pack the same way (row 1)
SHADE_MAX_SPHERES = 8  # 11 scalars/sphere pack into lanes si*16+c of row 3
_NFIELD = 28  # 9 triangle-vertex lanes + 19 aux lanes (normals/face/material)
# Pregathered payload: only what CANNOT be recomputed or selected in-kernel --
# v0 v1 v2 (9), n0 n1 n2 (9), material id (1).  The face normal is recomputed
# from the vertices and kd/ks/shininess selected from a [M, 7] VMEM table, so
# the big-T gather/scatter (measured at ~5 + 3.4 ms per 640K rays for 28
# fields, r4_results.jsonl gather_cost2) moves 19/28 of the bytes.
_NFIELD_PRE = 19


def supports_shade_kernel(scene: Scene) -> bool:
    num_pl = scene.point_lights.position.shape[0]
    num_sph = scene.spherical_lights.position.shape[0]
    num_spheres = scene.spheres.radius.shape[0]
    return (
        # Sphere primitives shade in-kernel since round 5 (VERDICT r4 item
        # 6): hits arrive in the prim-id convention (T + s), the quadratic
        # is recomputed in-kernel (elementwise — ideal for the traced VJP),
        # and the 11 per-sphere scalars lane-pack cotangents into accumulator
        # row 3 (si*16+c), capping spheres at 8.
        0 < scene.num_triangles + num_spheres
        and num_spheres <= SHADE_MAX_SPHERES
        # Spherical lights shade in-kernel since round 5 (VERDICT r4 missing
        # #1): their visibility FRACTIONS are recorded by the oracle phase
        # (shading.spherical_fracs) and arrive as discrete per-ray tiles; the
        # Phong terms they scale are differentiated exactly like the
        # point-light ones.  Cotangent lane-packing caps both light kinds at
        # 16 (rows 0 and 2 of the accumulator).
        and 0 < num_pl + num_sph
        and num_pl <= SHADE_MAX_LIGHTS
        and num_sph <= SHADE_MAX_LIGHTS
        # The pregathered path selects materials in-kernel from a [M, 7]
        # table with lane-packed cotangents; tiny-T scenes bake materials
        # into the select-gather aux table instead and have no cap.
        and (scene.num_triangles <= SHADE_SELECT_MAX_TRIS
             or scene.materials.kd.shape[0] <= SHADE_MAX_MATS)
    )


def _gather_fields(tris_ref, aux_ref, slot, num_tris):
    """Per-ray attribute gather by masked select over static table rows.
    Returns 28 tiles: v0(3) v1(3) v2(3) | n0(3) n1(3) n2(3) face(3) kd(3)
    ks(3) shininess(1).  Miss lanes (slot -1) fall through to row 0 —
    mirroring reconstruct_hit's clip-gather, so their masked-out math stays
    non-degenerate (an all-zero triangle has det == 0, whose VJP poisons
    gradients; see the det_safe note in _mt_tile)."""
    bro = lambda s: jnp.full(slot.shape, s, jnp.float32)
    trow0, arow0 = tris_ref[0], aux_ref[0]
    f = [bro(trow0[j]) for j in range(9)] + [bro(arow0[j]) for j in range(19)]
    for ti in range(1, num_tris):
        sel = slot == ti
        trow = tris_ref[ti]
        arow = aux_ref[ti]
        for j in range(9):
            f[j] = jnp.where(sel, trow[j], f[j])
        for j in range(19):
            f[9 + j] = jnp.where(sel, arow[j], f[9 + j])
    return f


def _shade_math(fields, light_scalars, sph_scalars, o3, d3, bits, fracs,
                hit_f, sphere_scalars=(), slot=None, num_tris=0):
    """The differentiable core: per-ray shade from gathered fields.

    fields: 28 tiles (see _gather_fields); light_scalars: per-point-light
    tuple of 6 traced scalars (px,py,pz, cr,cg,cb); sph_scalars: same per
    SPHERICAL light (center + color — shading uses the center, main.cpp:174);
    o3/d3: ray tiles; bits: int32 shadow bits (discrete); fracs: per
    spherical light a [rows, 128] visibility-fraction tile (discrete — the
    oracle-recorded soft-shadow fraction that scales the Phong terms,
    main.cpp:212-216); hit_f: float 0/1 valid mask (discrete, covers tri AND
    sphere hits); sphere_scalars: per sphere-PRIMITIVE an 11-tuple of traced
    scalars (center3, radius, kd3, ks3, shininess) — sphere hits (``slot``
    in [num_tris, num_tris + S), the prim-id convention of
    ops/intersect.py:18) recompute the quadratic in-kernel and override the
    triangle surface before the shared Phong loop (ray_tracing.cpp:118-158;
    geometric normal per :156).
    Returns 12 tiles: direct(3), ks(3), normal(3), position(3) — Surface
    miss semantics (zeros; shininess handled internally)."""
    ox, oy, oz = o3
    dx, dy, dz = d3
    (v0x, v0y, v0z, v1x, v1y, v1z, v2x, v2y, v2z,
     n0x, n0y, n0z, n1x, n1y, n1z, n2x, n2y, n2z,
     fnx, fny, fnz, kdx, kdy, kdz, ksx, ksy, ksz, shin) = fields
    shin = jnp.where(hit_f > 0.0, shin, 1.0)  # Surface: shininess 1 on miss

    # Möller–Trumbore recompute on the gathered triangle (reconstruct_hit).
    t, u, v, _ = _mt_tile(ox, oy, oz, dx, dy, dz,
                          [v0x, v0y, v0z, v1x, v1y, v1z, v2x, v2y, v2z])
    t = jnp.where(hit_f > 0.0, t, 0.0)
    px = ox + dx * t
    py = oy + dy * t
    pz = oz + dz * t

    # Interpolated camera-facing shading normal.
    w0 = 1.0 - u - v
    nx = w0 * n0x + u * n1x + v * n2x
    ny = w0 * n0y + u * n1y + v * n2y
    nz = w0 * n0z + u * n1z + v * n2z
    ninv = 1.0 / jnp.maximum(jnp.sqrt(nx * nx + ny * ny + nz * nz), 1e-20)
    nx, ny, nz = nx * ninv, ny * ninv, nz * ninv
    facing = (fnx * dx + fny * dy + fnz * dz) < 0.0  # dot(face_n, -d) > 0
    flip = jnp.where(facing, 1.0, -1.0)
    nx, ny, nz = nx * flip, ny * flip, nz * flip

    if sphere_scalars:
        # Sphere-hit override: masked select of the hit sphere's scalars,
        # quadratic recompute (differentiable w.r.t. center/radius/rays,
        # mirroring reconstruct_hit's sphere branch), geometric normal.
        s0 = sphere_scalars[0]
        sp = [jnp.zeros_like(px) + s0[j] for j in range(11)]
        for si in range(1, len(sphere_scalars)):
            sel = slot == (num_tris + si)
            for j in range(11):
                sp[j] = jnp.where(sel, sphere_scalars[si][j], sp[j])
        (cx, cy, cz, rad, skdx, skdy, skdz, sksx, sksy, sksz, sshin) = sp
        sph_f = ((slot >= num_tris)
                 & (slot < num_tris + len(sphere_scalars))).astype(jnp.float32)
        ocx, ocy, ocz = ox - cx, oy - cy, oz - cz
        qa = dx * dx + dy * dy + dz * dz
        qb = 2.0 * (dx * ocx + dy * ocy + dz * ocz)
        qc = ocx * ocx + ocy * ocy + ocz * ocz - rad * rad
        disc = qb * qb - 4.0 * qa * qc
        # sqrt at disc <= 0 has an infinite derivative; gate the INPUT (the
        # det_safe pattern — a where() on the output alone still NaNs grads).
        disc_ok = disc > 0.0
        sq = jnp.sqrt(jnp.where(disc_ok, disc, 1.0))
        sq = jnp.where(disc_ok, sq, 0.0)
        inv2a = 1.0 / (2.0 * qa)
        t_small = (-qb - sq) * inv2a
        t_big = (-qb + sq) * inv2a
        t_sp = jnp.where(t_small >= 0.0, t_small, t_big)
        t_sp = jnp.where(disc_ok & (t_sp >= 0.0), t_sp, 0.0)
        spx = ox + dx * t_sp
        spy = oy + dy * t_sp
        spz = oz + dz * t_sp
        snx, sny, snz = spx - cx, spy - cy, spz - cz
        sninv = 1.0 / jnp.maximum(
            jnp.sqrt(snx * snx + sny * sny + snz * snz), 1e-20)
        snx, sny, snz = snx * sninv, sny * sninv, snz * sninv
        px = jnp.where(sph_f > 0.0, spx, px)
        py = jnp.where(sph_f > 0.0, spy, py)
        pz = jnp.where(sph_f > 0.0, spz, pz)
        nx = jnp.where(sph_f > 0.0, snx, nx)
        ny = jnp.where(sph_f > 0.0, sny, ny)
        nz = jnp.where(sph_f > 0.0, snz, nz)
        kdx = jnp.where(sph_f > 0.0, skdx, kdx)
        kdy = jnp.where(sph_f > 0.0, skdy, kdy)
        kdz = jnp.where(sph_f > 0.0, skdz, kdz)
        ksx = jnp.where(sph_f > 0.0, sksx, ksx)
        ksy = jnp.where(sph_f > 0.0, sksy, ksy)
        ksz = jnp.where(sph_f > 0.0, sksz, ksz)
        shin = jnp.where(sph_f > 0.0, sshin, shin)

    # Reflected view ray (specular lobe).
    ddn = dx * nx + dy * ny + dz * nz
    rx = dx - 2.0 * ddn * nx
    ry = dy - 2.0 * ddn * ny
    rz = dz - 2.0 * ddn * nz
    rinv = 1.0 / jnp.maximum(jnp.sqrt(rx * rx + ry * ry + rz * rz), 1e-20)
    rx, ry, rz = rx * rinv, ry * rinv, rz * rinv

    dr = jnp.zeros_like(px)
    dg = jnp.zeros_like(px)
    db = jnp.zeros_like(px)
    # Point lights (bit-gated hard shadows) then spherical lights (fraction-
    # scaled soft shadows) share the one Phong body; only the visibility
    # weight differs.
    weights = ([jnp.where(((bits >> li) & 1) > 0, 0.0, hit_f)
                for li in range(len(light_scalars))]
               + [fr * hit_f for fr in fracs])
    for (lx, ly, lz, lcr, lcg, lcb), w in zip(
            list(light_scalars) + list(sph_scalars), weights):
        tox = lx - px
        toy = ly - py
        toz = lz - pz
        linv = 1.0 / jnp.maximum(
            jnp.sqrt(tox * tox + toy * toy + toz * toz), 1e-20)
        ldx, ldy, ldz = tox * linv, toy * linv, toz * linv
        dcos = jnp.maximum(ldx * nx + ldy * ny + ldz * nz, 0.0)
        scos = rx * ldx + ry * ldy + rz * ldz
        spec = jnp.power(jnp.maximum(scos, 1e-30), shin)
        spec = jnp.where(scos > 0.0, spec, 0.0)
        dr = dr + lcr * (kdx * dcos + ksx * spec) * w
        dg = dg + lcg * (kdy * dcos + ksy * spec) * w
        db = db + lcb * (kdz * dcos + ksz * spec) * w

    # Surface miss semantics: zero position/normal/ks (the gather falls
    # through to row 0 on miss, so every field needs the explicit gate;
    # direct is already gated per light by w).
    px, py, pz = px * hit_f, py * hit_f, pz * hit_f
    nx, ny, nz = nx * hit_f, ny * hit_f, nz * hit_f
    ksx, ksy, ksz = ksx * hit_f, ksy * hit_f, ksz * hit_f
    return (dr, dg, db, ksx, ksy, ksz, nx, ny, nz, px, py, pz)


def _light_scalars(lights_ref, num_lights):
    out = []
    for li in range(num_lights):
        lrow = lights_ref[li]
        out.append(tuple(lrow[j] for j in range(6)))
    return out


def _mat_scalars(mats_ref, num_mats):
    out = []
    for mi in range(num_mats):
        mrow = mats_ref[mi]
        out.append(tuple(mrow[j] for j in range(7)))  # kd(3) ks(3) shininess
    return out


def _sphere_scalars(spheres_ref, num_spheres):
    out = []
    for si in range(num_spheres):
        srow = spheres_ref[si]
        # center(3) radius kd(3) ks(3) shininess
        out.append(tuple(srow[j] for j in range(11)))
    return out


def _shade_math19(fields19, mat_scalars, light_scalars, sph_scalars, o3, d3,
                  bits, fracs, hit_f, sphere_scalars=(), slot=None,
                  num_tris=0):
    # Pregathered-payload core: reconstruct the 28-field view from the 19
    # gathered fields (face normal recomputed from the vertices -- its VJP
    # flows straight into the vertex fields) + an in-kernel material select
    # over the traced [M, 7] scalars (mid is discrete; where() conditions
    # carry no gradient), then defer to _shade_math.
    (v0x, v0y, v0z, v1x, v1y, v1z, v2x, v2y, v2z,
     n0x, n0y, n0z, n1x, n1y, n1z, n2x, n2y, n2z, mid) = fields19
    e1x, e1y, e1z = v1x - v0x, v1y - v0y, v1z - v0z
    e2x, e2y, e2z = v2x - v0x, v2y - v0y, v2z - v0z
    fx = e1y * e2z - e1z * e2y
    fy = e1z * e2x - e1x * e2z
    fz = e1x * e2y - e1y * e2x
    finv = 1.0 / jnp.maximum(jnp.sqrt(fx * fx + fy * fy + fz * fz), 1e-20)
    fx, fy, fz = fx * finv, fy * finv, fz * finv

    m0 = mat_scalars[0]
    mats7 = [jnp.zeros(mid.shape, jnp.float32) + m0[j] for j in range(7)]
    for mi in range(1, len(mat_scalars)):
        sel = mid == mi
        for j in range(7):
            mats7[j] = jnp.where(sel, mat_scalars[mi][j], mats7[j])
    kdx, kdy, kdz, ksx, ksy, ksz, shin = mats7

    fields28 = (v0x, v0y, v0z, v1x, v1y, v1z, v2x, v2y, v2z,
                n0x, n0y, n0z, n1x, n1y, n1z, n2x, n2y, n2z,
                fx, fy, fz, kdx, kdy, kdz, ksx, ksy, ksz, shin)
    return _shade_math(fields28, light_scalars, sph_scalars, o3, d3, bits,
                       fracs, hit_f, sphere_scalars=sphere_scalars,
                       slot=slot, num_tris=num_tris)


def _shade_fwd_kernel(ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                      prim_ref, bits_ref, tris_ref, aux_ref, lights_ref,
                      *rest, num_tris, num_lights, num_sph, num_spheres):
    if num_sph:
        sph_ref, fracs_ref = rest[:2]
        rest = rest[2:]
    if num_spheres:
        spheres_ref = rest[0]
        rest = rest[1:]
    out_refs = rest
    slot = prim_ref[0]

    def live(_):
        hit_f = ((slot >= 0)
                 & (slot < num_tris + num_spheres)).astype(jnp.float32)
        fields = _gather_fields(tris_ref, aux_ref, slot, num_tris)
        sph = _light_scalars(sph_ref, num_sph) if num_sph else []
        fracs = [fracs_ref[0, si] for si in range(num_sph)] if num_sph else []
        spheres = (_sphere_scalars(spheres_ref, num_spheres)
                   if num_spheres else ())
        return _shade_math(fields, _light_scalars(lights_ref, num_lights),
                           sph,
                           (ox_ref[0], oy_ref[0], oz_ref[0]),
                           (dx_ref[0], dy_ref[0], dz_ref[0]),
                           bits_ref[0], fracs, hit_f,
                           sphere_scalars=spheres, slot=slot,
                           num_tris=num_tris)

    def dead(_):
        z = jnp.zeros(slot.shape, jnp.float32)
        return (z,) * 12

    # Dead-tile early-exit: every output is miss-gated to zero, so a tile
    # with no hits (~98% of tiles at bounce 1 of the Cornell headline) skips
    # the gather + Phong entirely.
    outs = jax.lax.cond(jnp.max(slot) >= 0, live, dead, 0)
    for ref, val in zip(out_refs, outs):
        ref[0] = val


def _shade_fwd_kernel_pre(ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                          prim_ref, bits_ref, fields_ref, lights_ref,
                          mats_ref, *rest, num_tris, num_lights,
                          num_mats, num_sph, num_spheres):
    """Pregathered variant: per-ray field rows arrive as a
    [1, 19, rows, 128] block (XLA's table[prim] gather); materials select
    in-kernel from the [M, 7] table."""
    if num_sph:
        sph_ref, fracs_ref = rest[:2]
        rest = rest[2:]
    if num_spheres:
        spheres_ref = rest[0]
        rest = rest[1:]
    out_refs = rest
    slot = prim_ref[0]

    def live(_):
        hit_f = ((slot >= 0)
                 & (slot < num_tris + num_spheres)).astype(jnp.float32)
        fields = [fields_ref[0, j] for j in range(_NFIELD_PRE)]
        sph = _light_scalars(sph_ref, num_sph) if num_sph else []
        fracs = [fracs_ref[0, si] for si in range(num_sph)] if num_sph else []
        spheres = (_sphere_scalars(spheres_ref, num_spheres)
                   if num_spheres else ())
        return _shade_math19(fields, _mat_scalars(mats_ref, num_mats),
                             _light_scalars(lights_ref, num_lights),
                             sph,
                             (ox_ref[0], oy_ref[0], oz_ref[0]),
                             (dx_ref[0], dy_ref[0], dz_ref[0]),
                             bits_ref[0], fracs, hit_f,
                             sphere_scalars=spheres, slot=slot,
                             num_tris=num_tris)

    def dead(_):
        z = jnp.zeros(slot.shape, jnp.float32)
        return (z,) * 12

    outs = jax.lax.cond(jnp.max(slot) >= 0, live, dead, 0)
    for ref, val in zip(out_refs, outs):
        ref[0] = val


def _shade_bwd_core(fields, o3, d3, bits, slot, lights_ref, sph_scal, fracs,
                    ct_refs, num_tris, num_lights, sphere_scal=()):
    """Shared backward: jax.vjp over _shade_math w.r.t.
    (fields, lights, spherical lights, o, d).

    Elementwise-only math, so the traced VJP legalizes in Mosaic; gradient
    semantics match XLA autodiff by construction.  Returns
    (d_fields tuple(28), d_lights (8, COLS) — point lights lane-packed in
    row 0, spherical in row 2 — and d_rays tuple(6)).  ``fracs`` are
    discrete (closed over, not differentiated), like bits/hit_f."""
    hit_f = ((slot >= 0)
             & (slot < num_tris + len(sphere_scal))).astype(jnp.float32)
    lscal = _light_scalars(lights_ref, num_lights)

    def f(fields_, lscal_, sph_, spheres_, o3_, d3_):
        return _shade_math(fields_, lscal_, sph_, o3_, d3_, bits, fracs,
                           hit_f, sphere_scalars=spheres_, slot=slot,
                           num_tris=num_tris)

    _, vjp_fn = jax.vjp(f, fields, lscal, sph_scal, sphere_scal, o3, d3)
    cts = tuple(r[0] for r in ct_refs)
    d_fields, d_lights, d_sph, d_spheres, d_o3, d_d3 = vjp_fn(cts)

    # Per-light scalar cotangents -> lanes li*8 + c of row 0 (<= 16 lights);
    # spherical-light cotangents -> the same lanes of row 2.
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, RAY_COLS), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (8, RAY_COLS), 0)
    acc = jnp.zeros((8, RAY_COLS), jnp.float32)
    for li in range(num_lights):
        for c in range(6):
            val = d_lights[li][c]
            acc = acc + jnp.where((row == 0) & (lane == li * 8 + c),
                                  val, 0.0)
    for si in range(len(sph_scal)):
        for c in range(6):
            acc = acc + jnp.where((row == 2) & (lane == si * 8 + c),
                                  d_sph[si][c], 0.0)
    for si in range(len(sphere_scal)):
        for c in range(11):
            acc = acc + jnp.where((row == 3) & (lane == si * 16 + c),
                                  d_spheres[si][c], 0.0)
    return tuple(d_fields), acc, tuple(d_o3) + tuple(d_d3)


def _shade_bwd_core_pre(fields19, o3, d3, bits, slot, lights_ref, mats_ref,
                        sph_scal, fracs, ct_refs, num_tris, num_lights,
                        num_mats, sphere_scal=()):
    """Pregathered backward: jax.vjp over _shade_math19 w.r.t.
    (fields19, materials, lights, spherical lights, o, d).  Per-material
    cotangents pack into row 1 of the same (8, COLS) accumulator the point
    lights use row 0 of; spherical lights take row 2."""
    hit_f = ((slot >= 0)
             & (slot < num_tris + len(sphere_scal))).astype(jnp.float32)
    lscal = _light_scalars(lights_ref, num_lights)
    mscal = _mat_scalars(mats_ref, num_mats)

    def f(fields_, mscal_, lscal_, sph_, spheres_, o3_, d3_):
        return _shade_math19(fields_, mscal_, lscal_, sph_, o3_, d3_, bits,
                             fracs, hit_f, sphere_scalars=spheres_,
                             slot=slot, num_tris=num_tris)

    _, vjp_fn = jax.vjp(f, fields19, mscal, lscal, sph_scal, sphere_scal,
                        o3, d3)
    cts = tuple(r[0] for r in ct_refs)
    d_fields, d_mats, d_lights, d_sph, d_spheres, d_o3, d_d3 = vjp_fn(cts)

    lane = jax.lax.broadcasted_iota(jnp.int32, (8, RAY_COLS), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (8, RAY_COLS), 0)
    acc = jnp.zeros((8, RAY_COLS), jnp.float32)
    for li in range(num_lights):
        for c in range(6):
            acc = acc + jnp.where((row == 0) & (lane == li * 8 + c),
                                  d_lights[li][c], 0.0)
    for mi in range(num_mats):
        for c in range(7):
            acc = acc + jnp.where((row == 1) & (lane == mi * 8 + c),
                                  d_mats[mi][c], 0.0)
    for si in range(len(sph_scal)):
        for c in range(6):
            acc = acc + jnp.where((row == 2) & (lane == si * 8 + c),
                                  d_sph[si][c], 0.0)
    for si in range(len(sphere_scal)):
        for c in range(11):
            acc = acc + jnp.where((row == 3) & (lane == si * 16 + c),
                                  d_spheres[si][c], 0.0)
    return tuple(d_fields), acc, tuple(d_o3) + tuple(d_d3)


def _bwd_dead(slot, nfield=_NFIELD):
    z = lambda: jnp.zeros(slot.shape, jnp.float32)
    return (tuple(z() for _ in range(nfield))
            + (jnp.zeros((8, RAY_COLS), jnp.float32),)
            + tuple(z() for _ in range(6)))


def _store_bwd_outs(outs, dfields_ref, dlights_ref, drays_ref,
                    nfield=_NFIELD):
    d_fields, acc, d_rays = outs
    for j in range(nfield):
        dfields_ref[0, j] = d_fields[j]
    dlights_ref[0] = acc
    for j in range(6):
        drays_ref[0, j] = d_rays[j]


def _shade_bwd_kernel(ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                      prim_ref, bits_ref, tris_ref, aux_ref, lights_ref,
                      ct_refs_and_outs, num_tris, num_lights, num_sph,
                      num_spheres):
    """Select-gather backward.  ct_refs_and_outs: [sph_ref, fracs_ref when
    num_sph,] [spheres_ref when num_spheres,] 12 cotangent tiles (matching
    _shade_math outputs), then outputs (d_fields [1, 28, rows, 128],
    d_lights [1, 8, 128], d_rays [1, 6, rows, 128])."""
    if num_sph:
        sph_ref, fracs_ref = ct_refs_and_outs[:2]
        ct_refs_and_outs = ct_refs_and_outs[2:]
    if num_spheres:
        spheres_ref = ct_refs_and_outs[0]
        ct_refs_and_outs = ct_refs_and_outs[1:]
    ct_refs = ct_refs_and_outs[:12]
    dfields_ref, dlights_ref, drays_ref = ct_refs_and_outs[12:15]
    slot = prim_ref[0]

    def live(_):
        fields = _gather_fields(tris_ref, aux_ref, slot, num_tris)
        sph = _light_scalars(sph_ref, num_sph) if num_sph else []
        fracs = [fracs_ref[0, si] for si in range(num_sph)] if num_sph else []
        spheres = (_sphere_scalars(spheres_ref, num_spheres)
                   if num_spheres else ())
        df, acc, dr = _shade_bwd_core(
            fields, (ox_ref[0], oy_ref[0], oz_ref[0]),
            (dx_ref[0], dy_ref[0], dz_ref[0]), bits_ref[0], slot,
            lights_ref, sph, fracs, ct_refs, num_tris, num_lights,
            sphere_scal=spheres)
        return df + (acc,) + dr

    # Dead-tile early-exit (miss lanes contribute zero cotangents anyway).
    outs = jax.lax.cond(jnp.max(slot) >= 0, live,
                        lambda _: _bwd_dead(slot), 0)
    _store_bwd_outs((outs[:_NFIELD], outs[_NFIELD], outs[_NFIELD + 1:]),
                    dfields_ref, dlights_ref, drays_ref)


def _shade_bwd_kernel_pre(ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                          prim_ref, bits_ref, fields_ref, lights_ref,
                          mats_ref, ct_refs_and_outs, num_tris, num_lights,
                          num_mats, num_sph, num_spheres):
    """Pregathered backward: fields come from the per-ray [1, 19, rows, 128]
    block; d_fields goes back in the same per-ray layout (XLA's gather VJP
    scatter-adds it into the table); material cotangents lane-pack into
    row 1 of the lights row, spherical-light cotangents into row 2, sphere-
    primitive cotangents into row 3."""
    if num_sph:
        sph_ref, fracs_ref = ct_refs_and_outs[:2]
        ct_refs_and_outs = ct_refs_and_outs[2:]
    if num_spheres:
        spheres_ref = ct_refs_and_outs[0]
        ct_refs_and_outs = ct_refs_and_outs[1:]
    ct_refs = ct_refs_and_outs[:12]
    dfields_ref, dlights_ref, drays_ref = ct_refs_and_outs[12:15]
    slot = prim_ref[0]

    def live(_):
        fields = [fields_ref[0, j] for j in range(_NFIELD_PRE)]
        sph = _light_scalars(sph_ref, num_sph) if num_sph else []
        fracs = [fracs_ref[0, si] for si in range(num_sph)] if num_sph else []
        spheres = (_sphere_scalars(spheres_ref, num_spheres)
                   if num_spheres else ())
        df, acc, dr = _shade_bwd_core_pre(
            fields, (ox_ref[0], oy_ref[0], oz_ref[0]),
            (dx_ref[0], dy_ref[0], dz_ref[0]), bits_ref[0], slot,
            lights_ref, mats_ref, sph, fracs, ct_refs, num_tris, num_lights,
            num_mats, sphere_scal=spheres)
        return df + (acc,) + dr

    outs = jax.lax.cond(jnp.max(slot) >= 0, live,
                        lambda _: _bwd_dead(slot, _NFIELD_PRE), 0)
    _store_bwd_outs(
        (outs[:_NFIELD_PRE], outs[_NFIELD_PRE], outs[_NFIELD_PRE + 1:]),
        dfields_ref, dlights_ref, drays_ref, nfield=_NFIELD_PRE)


def _ray_spec(rows):
    return pl.BlockSpec((1, rows, RAY_COLS), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)


def _fields_spec(rows, nfield=_NFIELD):
    return pl.BlockSpec((1, nfield, rows, RAY_COLS), lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)


def _drays_spec(rows):
    return pl.BlockSpec((1, 6, rows, RAY_COLS), lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)


@functools.partial(jax.jit, static_argnames=("num_lights", "num_tris",
                                             "interpret"))
def _shade_fwd_call(rays6, prim_tiles, bits_tiles, tri_table, aux, lights,
                    sph=None, fracs_t=None, spheres=None, num_lights=0,
                    num_tris=None, interpret=False):
    g, rows = rays6[0].shape[0], rays6[0].shape[1]
    num_sph = sph.shape[0] if sph is not None else 0
    num_spheres = spheres.shape[0] if spheres is not None else 0
    if num_tris is None:
        num_tris = tri_table.shape[0]
    kernel = functools.partial(_shade_fwd_kernel,
                               num_tris=num_tris,
                               num_lights=num_lights,
                               num_sph=num_sph,
                               num_spheres=num_spheres)
    out_shape = [jax.ShapeDtypeStruct((g, rows, RAY_COLS), jnp.float32)
                 for _ in range(12)]
    extra_in, extra_specs = [], []
    if num_sph:
        extra_in += [sph, fracs_t]
        extra_specs += [
            pl.BlockSpec(memory_space=pltpu.VMEM),  # spherical lights [Ls, 6]
            _fields_spec(rows, num_sph),  # fracs [1, Ls, rows, 128]
        ]
    if num_spheres:
        extra_in.append(spheres)
        extra_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))  # [S, 11]
    return pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=[_ray_spec(rows) for _ in range(8)] + [
            pl.BlockSpec(memory_space=pltpu.VMEM),  # tri table [T, 9]
            pl.BlockSpec(memory_space=pltpu.VMEM),  # aux table [T, 19]
            pl.BlockSpec(memory_space=pltpu.VMEM),  # lights [L, 6]
        ] + extra_specs,
        out_specs=[_ray_spec(rows) for _ in range(12)],
        out_shape=out_shape,
        interpret=interpret,
    )(*rays6, prim_tiles, bits_tiles, tri_table, aux, lights, *extra_in)


@functools.partial(jax.jit, static_argnames=("num_tris", "num_lights",
                                             "interpret"))
def _shade_fwd_call_pre(rays6, prim_tiles, bits_tiles, fields_tiles, lights,
                        mats, num_tris, sph=None, fracs_t=None, spheres=None,
                        num_lights=0, interpret=False):
    g, rows = rays6[0].shape[0], rays6[0].shape[1]
    num_sph = sph.shape[0] if sph is not None else 0
    num_spheres = spheres.shape[0] if spheres is not None else 0
    kernel = functools.partial(_shade_fwd_kernel_pre,
                               num_tris=num_tris,
                               num_lights=num_lights,
                               num_mats=mats.shape[0],
                               num_sph=num_sph,
                               num_spheres=num_spheres)
    out_shape = [jax.ShapeDtypeStruct((g, rows, RAY_COLS), jnp.float32)
                 for _ in range(12)]
    extra_in, extra_specs = [], []
    if num_sph:
        extra_in += [sph, fracs_t]
        extra_specs += [
            pl.BlockSpec(memory_space=pltpu.VMEM),
            _fields_spec(rows, num_sph),
        ]
    if num_spheres:
        extra_in.append(spheres)
        extra_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    return pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=[_ray_spec(rows) for _ in range(8)] + [
            _fields_spec(rows, _NFIELD_PRE),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # lights [L, 6]
            pl.BlockSpec(memory_space=pltpu.VMEM),  # materials [M, 7]
        ] + extra_specs,
        out_specs=[_ray_spec(rows) for _ in range(12)],
        out_shape=out_shape,
        interpret=interpret,
    )(*rays6, prim_tiles, bits_tiles, fields_tiles, lights, mats, *extra_in)


@functools.partial(jax.jit, static_argnames=("num_lights", "num_tris",
                                             "interpret"))
def _shade_bwd_call(rays6, prim_tiles, bits_tiles, tri_table, aux, lights,
                    ct_tiles, sph=None, fracs_t=None, spheres=None,
                    num_lights=0, num_tris=None, interpret=False):
    g, rows = rays6[0].shape[0], rays6[0].shape[1]
    if num_tris is None:
        num_tris = tri_table.shape[0]
    num_sph = sph.shape[0] if sph is not None else 0
    num_spheres = spheres.shape[0] if spheres is not None else 0

    def kernel(*refs):
        _shade_bwd_kernel(*refs[:11], refs[11:],
                          num_tris=num_tris, num_lights=num_lights,
                          num_sph=num_sph, num_spheres=num_spheres)

    sph_in, sph_specs = [], []
    if num_sph:
        sph_in += [sph, fracs_t]
        sph_specs += [
            pl.BlockSpec(memory_space=pltpu.VMEM),
            _fields_spec(rows, num_sph),
        ]
    if num_spheres:
        sph_in.append(spheres)
        sph_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    out_shape = [
        jax.ShapeDtypeStruct((g, _NFIELD, rows, RAY_COLS), jnp.float32),
        jax.ShapeDtypeStruct((g, 8, RAY_COLS), jnp.float32),
        jax.ShapeDtypeStruct((g, 6, rows, RAY_COLS), jnp.float32),
    ]
    return pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=[_ray_spec(rows) for _ in range(8)] + [
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ] + sph_specs + [_ray_spec(rows) for _ in range(12)],
        out_specs=[
            _fields_spec(rows),
            pl.BlockSpec((1, 8, RAY_COLS), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            _drays_spec(rows),
        ],
        out_shape=out_shape,
        interpret=interpret,
    )(*rays6, prim_tiles, bits_tiles, tri_table, aux, lights, *sph_in,
      *ct_tiles)


@functools.partial(jax.jit, static_argnames=("num_tris", "num_lights",
                                             "interpret"))
def _shade_bwd_call_pre(rays6, prim_tiles, bits_tiles, fields_tiles, lights,
                        mats, ct_tiles, num_tris, sph=None, fracs_t=None,
                        spheres=None, num_lights=0, interpret=False):
    g, rows = rays6[0].shape[0], rays6[0].shape[1]
    num_mats = mats.shape[0]
    num_sph = sph.shape[0] if sph is not None else 0
    num_spheres = spheres.shape[0] if spheres is not None else 0

    def kernel(*refs):
        _shade_bwd_kernel_pre(*refs[:11], refs[11:],
                              num_tris=num_tris,
                              num_lights=num_lights,
                              num_mats=num_mats,
                              num_sph=num_sph,
                              num_spheres=num_spheres)

    sph_in, sph_specs = [], []
    if num_sph:
        sph_in += [sph, fracs_t]
        sph_specs += [
            pl.BlockSpec(memory_space=pltpu.VMEM),
            _fields_spec(rows, num_sph),
        ]
    if num_spheres:
        sph_in.append(spheres)
        sph_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    out_shape = [
        jax.ShapeDtypeStruct((g, _NFIELD_PRE, rows, RAY_COLS), jnp.float32),
        jax.ShapeDtypeStruct((g, 8, RAY_COLS), jnp.float32),
        jax.ShapeDtypeStruct((g, 6, rows, RAY_COLS), jnp.float32),
    ]
    return pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=[_ray_spec(rows) for _ in range(8)] + [
            _fields_spec(rows, _NFIELD_PRE),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ] + sph_specs + [_ray_spec(rows) for _ in range(12)],
        out_specs=[
            _fields_spec(rows, _NFIELD_PRE),
            pl.BlockSpec((1, 8, RAY_COLS), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            _drays_spec(rows),
        ],
        out_shape=out_shape,
        interpret=interpret,
    )(*rays6, prim_tiles, bits_tiles, fields_tiles, lights, mats, *sph_in,
      *ct_tiles)


def _pack_int(x, n, g, rows, fill):
    xt = jnp.pad(x.astype(jnp.int32), (0, g * rows * RAY_COLS - n),
                 constant_values=fill)
    return xt.reshape(g, rows, RAY_COLS)


def _pack_fields(fields_rows, n, g):
    """[N, 28] per-ray field rows -> [G, 28, rows, 128] kernel blocks.

    The transpose is a real relayout of the field volume (112 B/ray) each
    way; the 'direct' gather mode below avoids it entirely."""
    nf = fields_rows.shape[1]
    fr = jnp.pad(fields_rows, ((0, g * RAY_ROWS * RAY_COLS - n), (0, 0)))
    fr = fr.reshape(g, RAY_ROWS, RAY_COLS, nf)
    return jnp.transpose(fr, (0, 3, 1, 2))


def _gather_fields_tiled(table, prim_t):
    """ONE differentiable gather from [T, 28] straight into the kernel's
    [G, 28, rows, 128] block layout (offset_dims=(1,) puts the field axis at
    output dim 1) — no transpose on the field volume, and XLA's gather VJP
    is the matching direct-layout scatter-add.  Padding/miss lanes carry
    prim -1 -> clipped to row 0 (select-gather fallthrough semantics; their
    cotangents are gated to zero in-kernel)."""
    # Clip BOTH ends (ADVICE r4): lax.gather defaults to PROMISE_IN_BOUNDS,
    # so an out-of-range prim (no record source emits one today, but the
    # documented fallthrough is row 0 / clip) must never reach it raw.
    idx = jnp.clip(prim_t, 0, table.shape[0] - 1).astype(jnp.int32)[..., None]
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(0,), start_index_map=(0,))
    return jax.lax.gather(table, idx, dn,
                          slice_sizes=(1, table.shape[1]))


def _unpack_ray_cts(d_rays_t, n):
    flat = lambda j: d_rays_t[:, j].reshape(-1)[:n]
    d_o = jnp.stack([flat(0), flat(1), flat(2)], axis=-1)
    d_d = jnp.stack([flat(3), flat(4), flat(5)], axis=-1)
    return d_o, d_d


def _unpack_light_cts(d_lights_t, num_lights):
    d_lights_row = jnp.sum(d_lights_t[:, 0, :], axis=0)  # [128]
    return d_lights_row[:num_lights * 8].reshape(num_lights, 8)[:, :6]


def _unpack_sph_cts(d_lights_t, num_sph):
    d_row = jnp.sum(d_lights_t[:, 2, :], axis=0)  # [128]
    return d_row[:num_sph * 8].reshape(num_sph, 8)[:, :6]


def _unpack_sphere_cts(d_lights_t, num_spheres):
    d_row = jnp.sum(d_lights_t[:, 3, :], axis=0)  # [128]
    return d_row[:num_spheres * 16].reshape(num_spheres, 16)[:, :11]


def _pack_fracs(fracs, n, g, rows):
    """[Ls, N] visibility fractions -> [G, Ls, rows, 128] kernel blocks."""
    ls = fracs.shape[0]
    fr = jnp.pad(fracs, ((0, 0), (0, g * rows * RAY_COLS - n)))
    return jnp.transpose(fr.reshape(ls, g, rows, RAY_COLS), (1, 0, 2, 3))


def _unpack_mat_cts(d_lights_t, num_mats):
    d_row = jnp.sum(d_lights_t[:, 1, :], axis=0)  # [128]
    return d_row[:num_mats * 8].reshape(num_mats, 8)[:, :7]


def _f0(x):
    import numpy as np

    return np.zeros(x.shape, jax.dtypes.float0)  # int-arg cotangents


# ---------------------------------------------------------------------------
# Select-gather custom VJP (T <= SHADE_SELECT_MAX_TRIS)
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11))
def _shade_core(tri_table, aux, lights, sph, spheres, o, d, prim, bits,
                fracs, num_tris, interpret):
    outs = _shade_core_fwd(tri_table, aux, lights, sph, spheres, o, d, prim,
                           bits, fracs, num_tris, interpret)[0]
    return outs


def _pad_lights(lights):
    """VMEM refs need >= 1 row; pure-spherical scenes carry a zero-row point-
    light table.  The placeholder row never shades (num_lights stays 0)."""
    if lights.shape[0] == 0:
        return jnp.zeros((1, 6), jnp.float32)
    return lights


def _shade_core_fwd(tri_table, aux, lights, sph, spheres, o, d, prim, bits,
                    fracs, num_tris, interpret):
    n = o.shape[0]
    rays6, n_, g = _pack_rays(o, d, rows=RAY_ROWS)
    prim_t = _pack_int(prim, n, g, RAY_ROWS, -1)
    bits_t = _pack_int(bits, n, g, RAY_ROWS, 0)
    num_sph = sph.shape[0] if sph is not None else 0
    num_spheres = spheres.shape[0] if spheres is not None else 0
    fr_t = _pack_fracs(fracs, n, g, RAY_ROWS) if num_sph else None
    tiles = _shade_fwd_call(rays6, prim_t, bits_t, tri_table, aux,
                            _pad_lights(lights),
                            sph=sph if num_sph else None, fracs_t=fr_t,
                            spheres=spheres if num_spheres else None,
                            num_lights=lights.shape[0], num_tris=num_tris,
                            interpret=interpret)
    flat = lambda a: a.reshape(-1)[:n]
    outs = tuple(flat(t) for t in tiles)
    return outs, (tri_table, aux, lights, sph, spheres, o, d, prim, bits,
                  fracs)


def _shade_core_bwd(num_tris, interpret, res, cts):
    tri_table, aux, lights, sph, spheres, o, d, prim, bits, fracs = res
    n = o.shape[0]
    rays6, n_, g = _pack_rays(o, d, rows=RAY_ROWS)
    prim_t = _pack_int(prim, n, g, RAY_ROWS, -1)
    bits_t = _pack_int(bits, n, g, RAY_ROWS, 0)
    num_sph = sph.shape[0] if sph is not None else 0
    num_spheres = spheres.shape[0] if spheres is not None else 0
    fr_t = _pack_fracs(fracs, n, g, RAY_ROWS) if num_sph else None

    def tile_of(ct):
        ctp = jnp.pad(ct.astype(jnp.float32), (0, g * RAY_ROWS * RAY_COLS - n))
        return ctp.reshape(g, RAY_ROWS, RAY_COLS)

    ct_tiles = [tile_of(c) for c in cts]
    d_fields, d_lights_t, d_rays_t = _shade_bwd_call(
        rays6, prim_t, bits_t, tri_table, aux, _pad_lights(lights), ct_tiles,
        sph=sph if num_sph else None, fracs_t=fr_t,
        spheres=spheres if num_spheres else None,
        num_lights=lights.shape[0], num_tris=num_tris, interpret=interpret)

    # [G, 28, rows*128] x [G, rows*128, T] batched matmul -> [28, T]: the
    # one-hot transpose without ever transposing the kernel's d_fields
    # layout (a moveaxis here measured as a full 112 MB relayout).  Rows are
    # the TABLE's (>= 1 even for all-sphere scenes); sphere/miss lanes carry
    # prim outside [0, rows) -> all-zero one-hot rows.
    table_rows = tri_table.shape[0]
    g = d_fields.shape[0]
    per = d_fields.shape[2] * d_fields.shape[3]
    d_rows = d_fields.reshape(g, _NFIELD, per)
    prim_flat = prim_t.reshape(g, per)
    onehot = jax.nn.one_hot(prim_flat, table_rows, dtype=jnp.float32)
    # (padding/miss lanes carry prim -1 -> all-zero one-hot rows; their
    # d_fields are gated to zero in-kernel as well)
    d_packed = jax.lax.dot_general(
        d_rows, onehot,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)  # [G, 28, T]
    d_packed = jnp.sum(d_packed, axis=0).T  # [T, 28]
    d_tri = d_packed[:, :9]
    d_aux = d_packed[:, 9:]

    d_lights = _unpack_light_cts(d_lights_t, lights.shape[0])
    d_sph = _unpack_sph_cts(d_lights_t, num_sph)
    d_spheres = _unpack_sphere_cts(d_lights_t, num_spheres)
    d_o, d_d = _unpack_ray_cts(d_rays_t, n)
    # fracs are a discrete oracle output (visibility counts): zero cotangent
    # by the oracle contract, matching the XLA sample-scan path.
    return (d_tri, d_aux, d_lights, d_sph, d_spheres, d_o, d_d, _f0(prim),
            _f0(bits), jnp.zeros_like(fracs))


_shade_core.defvjp(_shade_core_fwd, _shade_core_bwd)


# ---------------------------------------------------------------------------
# Pregathered custom VJP (any T): the per-ray field blocks [G, 28, rows, 128]
# are a differentiable XLA gather outside; this VJP returns their cotangents
# in the SAME layout and XLA's gather VJP scatter-adds them into the table
# (hence into vertices, normals, and materials).
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11))
def _shade_core_pre(fields_t, lights, mats, sph, spheres, o, d, prim, bits,
                    fracs, num_tris, interpret):
    return _shade_core_pre_fwd(fields_t, lights, mats, sph, spheres, o, d,
                               prim, bits, fracs, num_tris, interpret)[0]


def _shade_core_pre_fwd(fields_t, lights, mats, sph, spheres, o, d, prim,
                        bits, fracs, num_tris, interpret):
    n = o.shape[0]
    rays6, n_, g = _pack_rays(o, d, rows=RAY_ROWS)
    prim_t = _pack_int(prim, n, g, RAY_ROWS, -1)
    bits_t = _pack_int(bits, n, g, RAY_ROWS, 0)
    num_sph = sph.shape[0] if sph is not None else 0
    num_spheres = spheres.shape[0] if spheres is not None else 0
    fr_t = _pack_fracs(fracs, n, g, RAY_ROWS) if num_sph else None
    tiles = _shade_fwd_call_pre(rays6, prim_t, bits_t, fields_t,
                                _pad_lights(lights), mats, num_tris=num_tris,
                                sph=sph if num_sph else None, fracs_t=fr_t,
                                spheres=spheres if num_spheres else None,
                                num_lights=lights.shape[0],
                                interpret=interpret)
    flat = lambda a: a.reshape(-1)[:n]
    outs = tuple(flat(t) for t in tiles)
    return outs, (fields_t, lights, mats, sph, spheres, o, d, prim, bits,
                  fracs)


def _shade_core_pre_bwd(num_tris, interpret, res, cts):
    fields_t, lights, mats, sph, spheres, o, d, prim, bits, fracs = res
    n = o.shape[0]
    rays6, n_, g = _pack_rays(o, d, rows=RAY_ROWS)
    prim_t = _pack_int(prim, n, g, RAY_ROWS, -1)
    bits_t = _pack_int(bits, n, g, RAY_ROWS, 0)
    num_sph = sph.shape[0] if sph is not None else 0
    num_spheres = spheres.shape[0] if spheres is not None else 0
    fr_t = _pack_fracs(fracs, n, g, RAY_ROWS) if num_sph else None

    def tile_of(ct):
        ctp = jnp.pad(ct.astype(jnp.float32), (0, g * RAY_ROWS * RAY_COLS - n))
        return ctp.reshape(g, RAY_ROWS, RAY_COLS)

    ct_tiles = [tile_of(c) for c in cts]
    d_fields_t, d_lights_t, d_rays_t = _shade_bwd_call_pre(
        rays6, prim_t, bits_t, fields_t, _pad_lights(lights), mats, ct_tiles,
        num_tris=num_tris, sph=sph if num_sph else None, fracs_t=fr_t,
        spheres=spheres if num_spheres else None,
        num_lights=lights.shape[0], interpret=interpret)

    d_lights = _unpack_light_cts(d_lights_t, lights.shape[0])
    d_mats = _unpack_mat_cts(d_lights_t, mats.shape[0])
    d_sph = _unpack_sph_cts(d_lights_t, num_sph)
    d_spheres = _unpack_sphere_cts(d_lights_t, num_spheres)
    d_o, d_d = _unpack_ray_cts(d_rays_t, n)
    return (d_fields_t, d_lights, d_mats, d_sph, d_spheres, d_o, d_d,
            _f0(prim), _f0(bits), jnp.zeros_like(fracs))


_shade_core_pre.defvjp(_shade_core_pre_fwd, _shade_core_pre_bwd)


def shade_fused_pallas(scene: Scene, origins, dirs, hit, bits,
                       interpret: bool | None = None,
                       gather: str = "direct", soft_fracs=None) -> Surface:
    """Drop-in replacement for reconstruct_hit + direct lighting on eligible
    scenes, returning (direct [N,3], valid, ks, normal, position).
    Differentiable w.r.t. vertices, normals, materials, point AND spherical
    lights, AND the ray origins/dirs (the two-phase reflected-ray chain)
    through the custom VJP.  ``soft_fracs`` ([Ls, N], required when the scene
    has spherical lights): oracle-recorded visibility fractions
    (shading.spherical_fracs) scaling the spherical Phong terms — discrete,
    zero-cotangent, exactly like the shadow bits.  Gather mode for tables
    past SHADE_SELECT_MAX_TRIS: 'direct' = one lax.gather straight into the
    kernel's tile layout (VJP = direct-layout scatter-add, no relayout);
    'rows' = [N,28] row gather + explicit transpose each way (kept for the
    A/B — scripts/tpu_r4c.py)."""
    if interpret is None:
        interpret = _default_interpret()
    prim = jax.lax.stop_gradient(hit.prim_id)
    bits = jax.lax.stop_gradient(bits)
    lights = jnp.concatenate(
        [scene.point_lights.position, scene.point_lights.color], axis=1)
    num_sph = scene.spherical_lights.position.shape[0]
    sph = jnp.concatenate(
        [scene.spherical_lights.position, scene.spherical_lights.color],
        axis=1)  # [Ls, 6]; the radius shapes the oracle fracs, not the shade
    if num_sph and soft_fracs is None:
        raise ValueError(
            "shade_fused_pallas: scene has spherical lights but no "
            "soft_fracs were recorded (pass shading.spherical_fracs output)")
    fracs = (jax.lax.stop_gradient(soft_fracs) if num_sph
             else jnp.zeros((0, origins.shape[0]), jnp.float32))
    num_spheres = scene.spheres.radius.shape[0]
    spheres = jnp.concatenate(
        [scene.spheres.center, scene.spheres.radius[:, None],
         scene.spheres.kd, scene.spheres.ks,
         scene.spheres.shininess[:, None]], axis=1)  # [S, 11]
    num_tris = scene.num_triangles
    if num_tris <= SHADE_SELECT_MAX_TRIS:
        if num_tris > 0:
            tri_table = _tri_table(scene)
            aux = _aux_table(scene)
        else:
            # All-sphere scene: a 1-row NON-DEGENERATE placeholder keeps the
            # (fully masked-out) triangle math grad-safe — an all-zero row
            # has det == 0, whose VJP poisons gradients (see _gather_fields).
            tri_table = jnp.asarray(
                [[1., 0., 0., 0., 1., 0., 0., 0., 1.]], jnp.float32)
            aux = jnp.zeros((1, 19), jnp.float32)
            aux = aux.at[0, 9:12].set(jnp.float32(0.5773503))  # face normal
            aux = aux.at[0, 0:9].set(jnp.float32(0.5773503))   # vertex normals
            aux = aux.at[0, 18].set(1.0)                       # shininess
        outs = _shade_core(tri_table, aux, lights, sph, spheres, origins,
                           dirs, prim, bits, fracs, num_tris, interpret)
    else:
        # One differentiable packed-row gather of the MINIMAL payload
        # (vertices + vertex normals + material id; the face normal is
        # recomputed in-kernel and kd/ks/shininess selected from the tiny
        # [M, 7] table); miss lanes fall through to row 0 like the select
        # variant.
        tris = scene.triangles
        table = jnp.concatenate(
            [_tri_table(scene),
             scene.normals[tris[:, 0]], scene.normals[tris[:, 1]],
             scene.normals[tris[:, 2]],
             scene.tri_material[:, None].astype(jnp.float32)],
            axis=1)  # [T, 19]
        mats = jnp.concatenate(
            [scene.materials.kd, scene.materials.ks,
             scene.materials.shininess[:, None]], axis=1)  # [M, 7]
        n = origins.shape[0]
        g = -(-n // (RAY_ROWS * RAY_COLS))
        prim_t = _pack_int(prim, n, g, RAY_ROWS, -1)
        if gather == "direct":
            fields_t = _gather_fields_tiled(table, prim_t)
        else:
            rows = table[jnp.clip(prim, 0, num_tris - 1)]
            fields_t = _pack_fields(rows, n, g)
        outs = _shade_core_pre(fields_t, lights, mats, sph, spheres,
                               origins, dirs, prim, bits, fracs, num_tris,
                               interpret)
    (dr, dg, db, ksx, ksy, ksz, nx, ny, nz, px, py, pz) = outs
    direct = jnp.stack([dr, dg, db], axis=-1)
    ks = jnp.stack([ksx, ksy, ksz], axis=-1)
    normal = jnp.stack([nx, ny, nz], axis=-1)
    position = jnp.stack([px, py, pz], axis=-1)
    valid = (prim >= 0) & (prim < scene.num_triangles + num_spheres)
    return direct, valid, ks, normal, position
