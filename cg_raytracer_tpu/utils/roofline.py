"""Roofline model: how fast *could* each render go on this chip, and what
fraction of that the measured numbers achieve (BASELINE.md "≥85% of roofline"
target; VERDICT r1 item 2).

Two resource ceilings bound a render:

- **VPU compute**: the intersection sweeps are elementwise vector code
  (Moller-Trumbore, slab tests, Phong) — they run on the VPU, not the MXU.
  The only MXU work is the small one-hot gather matmul in ``reconstruct_hit``.
- **HBM bandwidth**: every kernel streams the ray/hit arrays HBM->VMEM->HBM;
  the jnp shading/reconstruction stages stream several [N,3] buffers each.

``roofline_seconds`` takes the larger of (flops / VPU peak) and
(bytes / HBM bandwidth); ``pct_of_roofline`` divides that ideal time by the
measured time.  FLOP counts are *useful per-ray work*: the work an ideal
per-ray traversal would execute.  Tile-synchronous divergence waste (a BVH
node visited because *any* ray in the 8192-ray tile wants it,
ops/pallas_bvh.py) therefore shows up as a *low* roofline fraction — that is
the point: it quantifies how much the kernel leaves on the table (teacup's
thin shells vs the donut's coherent torus, BENCH_NOTES Table 2).

Hardware model (public TPU v5e specs; jax-ml.github.io/scaling-book):
one TensorCore with 4 MXUs (128x128) at ~1.5 GHz derived from the published
197 bf16 TFLOP/s (2*128*128*4*clock); the VPU is an (8,128) vector unit with
4 independent ALUs => 4096 f32 FLOPs/cycle = ~6.1 TFLOP/s; HBM 819 GB/s.
Divisions, rsqrts and transcendentals are counted as 1 VPU op each (they are
multi-cycle in reality, so the compute ceiling is *optimistic* — a true >100%
is impossible, and fractions are conservative).
"""
from __future__ import annotations

import contextlib
import dataclasses


def _nullctx():
    return contextlib.nullcontext()

# ---------------------------------------------------------------------------
# Chip model
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class Chip:
    name: str
    clock_hz: float
    vpu_flops: float  # f32 elementwise peak
    mxu_flops_bf16: float
    hbm_bytes_per_s: float
    vmem_bytes: int


_V5E_CLOCK = 197e12 / (2 * 128 * 128 * 4)  # ~1.5 GHz from the published MXU peak

V5E = Chip(
    name="TPU v5e",
    clock_hz=_V5E_CLOCK,
    vpu_flops=8 * 128 * 4 * _V5E_CLOCK,  # (8,128) VPU x 4 ALUs ~= 6.1 TF f32
    mxu_flops_bf16=197e12,
    hbm_bytes_per_s=819e9,
    vmem_bytes=128 * 1024 * 1024,
)

# ---------------------------------------------------------------------------
# Per-op VPU flop counts — counted line-by-line from the kernel sources.
# Each vector op (add/mul/cmp/select/min/max/div/sqrt/log/cos) = 1 flop.
# ---------------------------------------------------------------------------

# ops/pallas_kernels.py::_mt_tile — one triangle vs the ray tile:
# edges 6, pvec 9, det 5, det-test 2, inv_det 2, tvec 3, u 6, qvec 9, v 6,
# t 6, validity chain 9.
MT_FLOPS = 64
# closest-hit running-minimum update: closer = valid & (t < t_best) + 4 selects
CLOSEST_UPDATE = 6
# any-hit accumulate: ok & (t < tmax), cast, max
ANYHIT_UPDATE = 4
# per-light shadow-ray construction inside the fused bounce kernels
# (_bounce_kernel): to-light 3, dist 6, inv 2, dir 3, origin 6, tmax 1
SHADOW_SETUP = 21

# ops/pallas_bvh.py::_slab_tile: 12 sub/mul, 10 min/max, pad 3, hit chain 5
SLAB_FLOPS = 30
# t-bound tighten after a slab test: pad 3, add/cmp/and 3
TBOUND_FLOPS = 6
# one internal-node expansion in _traverse_vmem: the popped node's own slab
# re-test (36) + two child slab tests (72) + near/far ordering ~10
INTERNAL_VISIT_FLOPS = SLAB_FLOPS + TBOUND_FLOPS + 2 * (SLAB_FLOPS + TBOUND_FLOPS) + 10
# one leaf visit costs its row count x 14 triangle tests
TRIS_PER_ROW = 14

# jnp stages (models/whitted.py + ops/shading.py + ops/intersect.py), per ray:
# reconstruct_hit: one MT re-solve 64, normal interpolation ~30, face normal
# cross+normalize ~25, facing flip + masking selects ~30
RECON_FLOPS = 150
# phong_one_light + shadow gating per light: normalize ~9, diffuse ~15,
# reflect+normalize ~21, specular pow chain ~10, masks ~5
SHADE_FLOPS = 60
# per-bounce bookkeeping in trace_rays: throughput update, reflection dir,
# masks, contribution accumulate
BOUNCE_MISC_FLOPS = 50

# ---------------------------------------------------------------------------
# HBM traffic lower bounds (bytes/ray) — the unavoidable streams.
# ---------------------------------------------------------------------------

# fused bounce kernel: 6 ray components + tmax in (28 B), t/slot/u/v/bits out (20 B)
KERNEL_BYTES = 48
# reconstruction: one packed [*,28] f32 row gather in + Surface fields out (~60 B)
RECON_BYTES = 28 * 4 + 60
# shading: surface fields re-read + color accumulate (several [N,3] streams)
SHADE_BYTES = 120


def brute_flops_per_ray(num_tris: int, num_lights: int, bounces: int,
                        include_bwd: bool = False) -> float:
    """Useful VPU flops per primary ray for the brute-sweep path (every ray
    tests every triangle — cornell-class scenes; ops/pallas_kernels.py).

    The Pallas kernels are non-differentiated oracles (stop_gradient), so the
    backward pass only replays reconstruction + shading VJPs (~2x their
    forward cost); the sweeps are forward-only either way.
    """
    closest = num_tris * (MT_FLOPS + CLOSEST_UPDATE)
    shadow = num_lights * (SHADOW_SETUP + num_tris * (MT_FLOPS + ANYHIT_UPDATE))
    kernel = bounces * (closest + shadow)
    jnp_fwd = bounces * (RECON_FLOPS + num_lights * SHADE_FLOPS + BOUNCE_MISC_FLOPS)
    total = kernel + jnp_fwd
    if include_bwd:
        total += 2 * jnp_fwd
    return float(total)


def bvh_flops_per_ray(internal_visits: float, leaf_rows: float, num_lights: int,
                      bounces: int, include_bwd: bool = False,
                      shadow_internal_visits: float | None = None,
                      shadow_leaf_rows: float | None = None) -> float:
    """Useful VPU flops per ray for a BVH-traversal render, parameterized by
    *measured* mean per-ray traversal statistics (``bvh_visit_stats``).

    internal_visits / leaf_rows: mean internal-node expansions and 14-triangle
    leaf rows swept per closest-hit query.  Shadow queries default to the same
    stats (in practice any-hit early exit makes them cheaper, which again makes
    the ceiling optimistic and the reported fraction conservative).
    """
    if shadow_internal_visits is None:
        shadow_internal_visits = internal_visits
    if shadow_leaf_rows is None:
        shadow_leaf_rows = leaf_rows
    closest = (internal_visits * INTERNAL_VISIT_FLOPS
               + leaf_rows * TRIS_PER_ROW * (MT_FLOPS + CLOSEST_UPDATE))
    shadow = num_lights * (SHADOW_SETUP
                           + shadow_internal_visits * INTERNAL_VISIT_FLOPS
                           + shadow_leaf_rows * TRIS_PER_ROW * (MT_FLOPS + ANYHIT_UPDATE))
    kernel = bounces * (closest + shadow)
    jnp_fwd = bounces * (RECON_FLOPS + num_lights * SHADE_FLOPS + BOUNCE_MISC_FLOPS)
    total = kernel + jnp_fwd
    if include_bwd:
        total += 2 * jnp_fwd
    return float(total)


def soft_shadow_flops_per_ray(num_tris: int, num_samples: int) -> float:
    """Extra per-ray flops for one spherical light's stochastic visibility
    (ops/pallas_kernels.py::_soft_shadow_prng_kernel): per sample, 4 PRNG
    draws + Box-Muller (~25), sample-point/shadow-ray construction (~40), and
    an any-hit sweep over the unrolled triangle table."""
    per_sample = 25 + 40 + num_tris * (MT_FLOPS + ANYHIT_UPDATE)
    return float(num_samples * per_sample)


def soft_shadow_bvh_flops_per_ray(shadow_internal_visits: float,
                                  shadow_leaf_rows: float,
                                  num_samples: int) -> float:
    """BVH-scene analogue of ``soft_shadow_flops_per_ray``: each sample's
    any-hit resolves by traversal (ops/pallas_bvh4.py cone sampler), so the
    per-sample work is parameterized by *measured* shadow-ray visit stats —
    the per-ray ideal, divergence-free by construction like the rest of the
    model (round-3 task 7: the monkey_spherical row's ceiling context)."""
    per_sample = (25 + 40
                  + shadow_internal_visits * INTERNAL_VISIT_FLOPS
                  + shadow_leaf_rows * TRIS_PER_ROW
                  * (MT_FLOPS + ANYHIT_UPDATE))
    return float(num_samples * per_sample)


def bytes_per_ray(num_lights: int, bounces: int, include_bwd: bool = False) -> float:
    """HBM stream lower bound per ray (triangle/node tables live in VMEM and
    amortize to ~0 per ray; the dominant streams are the per-ray buffers)."""
    kernel = bounces * KERNEL_BYTES
    jnp_fwd = bounces * (RECON_BYTES + SHADE_BYTES)
    total = kernel + jnp_fwd
    if include_bwd:
        # VJP re-streams activations and writes grads (~2x the forward jnp
        # traffic); the intersection kernels are not differentiated.
        total += 2 * jnp_fwd
    return float(total)


def roofline_seconds(flops: float, bytes_: float, chip: Chip = V5E):
    """Ideal frame time and which resource binds it."""
    t_compute = flops / chip.vpu_flops
    t_memory = bytes_ / chip.hbm_bytes_per_s
    if t_compute >= t_memory:
        return t_compute, "compute (VPU)"
    return t_memory, "memory (HBM)"


def pct_of_roofline(measured_s: float, flops: float, bytes_: float,
                    chip: Chip = V5E) -> float:
    ideal, _ = roofline_seconds(flops, bytes_, chip)
    return 100.0 * ideal / measured_s


def headline_roofline(width: int, height: int, num_tris: int, num_lights: int,
                      bounces: int, include_bwd: bool, chip: Chip = V5E) -> dict:
    """Roofline summary for a brute-sweep render (the bench.py headline:
    cornell_box 1024^2 fwd+bwd, 32 triangles, 1 point light, 2 bounces)."""
    rays = width * height
    flops = rays * brute_flops_per_ray(num_tris, num_lights, bounces,
                                       include_bwd=include_bwd)
    byts = rays * bytes_per_ray(num_lights, bounces, include_bwd=include_bwd)
    ideal, bound = roofline_seconds(flops, byts, chip)
    return {
        "chip": chip.name,
        "rays": rays,
        "gflops_per_frame": flops / 1e9,
        "mbytes_per_frame": byts / 1e6,
        "ideal_seconds": ideal,
        "bound": bound,
        "ideal_rays_per_s": rays / ideal,
    }


# ---------------------------------------------------------------------------
# Measured traversal statistics: an instrumented replica of the jnp per-ray
# traversal (ops/bvh.py::traverse_closest) that counts node expansions and
# leaf rows instead of returning hits.  Run on a *sample* of rays (CPU is
# fine) to parameterize bvh_flops_per_ray for each Table 2 scene.
# ---------------------------------------------------------------------------


def bvh_visit_stats(bvh, origins, dirs, t_max=None, max_stack: int = 64) -> dict:
    """Mean per-ray closest-hit traversal counts: internal-node expansions and
    14-triangle leaf rows swept.  Mirrors ops.bvh.traverse_closest's masked
    stack walk (same slab epsilons and near-to-far ordering) with counters.
    """
    import jax
    import jax.numpy as jnp

    from ..ops.bvh import _SLAB_EPS, _slab
    from ..ops.intersect import MISS, moller_trumbore

    n = origins.shape[0]
    chunk = bvh.max_leaf
    t0 = (jnp.full((n,), jnp.inf, jnp.float32) if t_max is None
          else jnp.broadcast_to(t_max, (n,)).astype(jnp.float32))

    def ray_fn(o, d, t_init):
        inv_d = 1.0 / d
        state = dict(
            sp=jnp.int32(1), stack=jnp.zeros((max_stack,), jnp.int32),
            stack_off=jnp.zeros((max_stack,), jnp.int32),
            t=t_init, slot=MISS, n_int=jnp.int32(0), n_leaf_rows=jnp.int32(0),
        )

        def cond(s):
            return s["sp"] > 0

        def body(s):
            sp = s["sp"] - 1
            ni = s["stack"][sp]
            off = s["stack_off"][sp]
            t_in, box_hit = _slab(o, inv_d, bvh.node_lo[ni], bvh.node_hi[ni])
            box_hit = box_hit & (t_in <= s["t"] + _SLAB_EPS * (1.0 + jnp.abs(s["t"])))
            cnt = bvh.count[ni]
            is_leaf = cnt > 0
            do_leaf = box_hit & is_leaf

            base = bvh.first[ni] + off
            t_cur, slot_cur = s["t"], s["slot"]
            for k in range(chunk):
                idx = base + k
                in_range = do_leaf & (off + k < cnt)
                safe = jnp.where(in_range, idx, 0)
                tt, _, _, ok = moller_trumbore(o, d, bvh.tv0[safe], bvh.tv1[safe],
                                               bvh.tv2[safe])
                ok = ok & in_range & (tt < t_cur)
                t_cur = jnp.where(ok, tt, t_cur)
                slot_cur = jnp.where(ok, safe, slot_cur)
            rows_here = jnp.where(
                do_leaf, (jnp.minimum(cnt - off, chunk) + TRIS_PER_ROW - 1)
                // TRIS_PER_ROW, 0)
            more = do_leaf & (off + chunk < cnt)
            stack = s["stack"].at[sp].set(ni)
            stack_off = s["stack_off"].at[sp].set(off + chunk)
            sp = sp + jnp.where(more, 1, 0)

            do_int = box_hit & (~is_leaf)
            li, ri = bvh.left[ni], bvh.right[ni]
            tl, hl = _slab(o, inv_d, bvh.node_lo[li], bvh.node_hi[li])
            tr, hr = _slab(o, inv_d, bvh.node_lo[ri], bvh.node_hi[ri])
            t_pad = _SLAB_EPS * (1.0 + jnp.abs(t_cur))
            hl = hl & do_int & (tl <= t_cur + t_pad)
            hr = hr & do_int & (tr <= t_cur + t_pad)
            left_near = tl <= tr
            near_i = jnp.where(left_near, li, ri)
            far_i = jnp.where(left_near, ri, li)
            near_h = jnp.where(left_near, hl, hr)
            far_h = jnp.where(left_near, hr, hl)
            stack = stack.at[sp].set(jnp.where(far_h, far_i, stack[sp]))
            stack_off = stack_off.at[sp].set(jnp.where(far_h, 0, stack_off[sp]))
            sp = sp + jnp.where(far_h, 1, 0)
            stack = stack.at[sp].set(jnp.where(near_h, near_i, stack[sp]))
            stack_off = stack_off.at[sp].set(jnp.where(near_h, 0, stack_off[sp]))
            sp = sp + jnp.where(near_h, 1, 0)

            return dict(sp=sp, stack=stack, stack_off=stack_off, t=t_cur,
                        slot=slot_cur,
                        n_int=s["n_int"] + do_int.astype(jnp.int32),
                        n_leaf_rows=s["n_leaf_rows"] + rows_here)

        out = jax.lax.while_loop(cond, body, state)
        return out["n_int"], out["n_leaf_rows"]

    # Pin the count to CPU when one is registered: this vmapped per-ray
    # while-loop is exactly the jnp-traversal shape that device-faults on
    # TPU (observed here at monkey scale during the round-3 roofline run,
    # not just the previously-known 320K-tri case), and it is pure
    # counting — platform-irrelevant.  Run measurement scripts with
    # JAX_PLATFORMS=axon,cpu (or tpu,cpu) so the CPU backend exists.
    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        cpu = None
    ctx = jax.default_device(cpu) if cpu is not None else _nullctx()
    with ctx:
        n_int, n_rows = jax.jit(jax.vmap(ray_fn))(
            jax.device_put(origins, cpu), jax.device_put(dirs, cpu),
            jax.device_put(t0, cpu))
    return {
        "mean_internal_visits": float(jnp.mean(n_int)),
        "mean_leaf_rows": float(jnp.mean(n_rows)),
        "max_internal_visits": int(jnp.max(n_int)),
        "max_leaf_rows": int(jnp.max(n_rows)),
    }
