"""Pallas TPU megakernel for the variant-B path tracer.

The jnp reference (render.py) is HBM-bandwidth bound: every [rays, lanes]
intermediate of every sampling/intersection op round-trips HBM. This kernel
keeps a tile of rays VMEM-resident for the entire samples x bounces loop —
the analog of the reference's one-thread-per-pixel ``pathTrace`` kernel
(RTrace/raytrace.metal:11-111), restructured for the VPU.

Layout (v2 — measured 12x over the first [rays, tri-lanes] design):
  * rays are DENSE on [RAY_SUB, 128] tiles: every per-ray op (camera gen,
    Halton digits, NEE, cosine bounce) uses all 128 lanes;
  * triangles are a STATIC unrolled loop over the ~36 real primitives, their
    constants broadcast from SMEM scalars — no lane padding, no [rays, tris]
    materialization, no argmin/gather: closest-hit is a running (t, attrs)
    min carried across the loop, shadow occlusion a running OR.

All math matches render._path_trace_chunk (same Halton dims, same reference
quirks); parity is asserted against the jnp oracle in tests.

Gradients: ``render_path_pallas`` carries a custom VJP whose backward is the
VJP of the jnp reference (recompute-based). Forward speed from the kernel,
backward correctness from XLA AD; a hand-written backward kernel is next.
"""
from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import sampling as smp
from ..intersect import compile_scene
from ..render import pixel_rng_offsets, render_path
from ..types import RenderConfig, Scene

_F32 = jnp.float32
_U32 = jnp.uint32
_I32 = jnp.int32

RAY_SUB = 32                 # sublanes of rays per tile
LANES = 128
TILE = RAY_SUB * LANES       # rays per grid step
BIG = 1e30
RAY_TMIN = 1e-3
RAY_TMAX = 1e3
# Record code = (prim + 1) + OCC_BIT * shadow_occluded; 0 = miss. Power of
# two (int decode is an and-mask) and small enough that every code stays
# exact in f32 (codes < 2^21 << 2^24) while leaving room for ~1M primitives
# (the grouped-traversal scenes go far past the old 512 limit).
OCC_BIT = 1 << 20

# Triangle-count threshold between the two traversal modes. Below it the
# primitive loop is a STATIC Python unroll over SMEM scalars (each scalar
# load has a static address, Mosaic hoists all of them out of the sample
# loop — the measured-fastest design for Cornell-scale scenes). Above it
# the kernels switch to GROUPED traversal: a fori_loop over fixed-size
# groups whose constants are read with DYNAMIC SMEM scalar indexing, so
# trace/compile size is O(GROUP) instead of O(P) and scenes of 1k-100k
# triangles compile in seconds. The attribute fetch likewise switches from
# one [P, TILE] one-hot matmul to per-128-block one-hots (a [P, TILE]
# one-hot at P=1k is 16 MB — past VMEM).
STATIC_UNROLL_MAX = 64
GROUP = 16     # triangles per dynamically-indexed inner unroll
SUPER = 8      # groups per super-group (two-level AABB hierarchy)
PBLK = 128     # primitives per one-hot fetch block (grouped mode)
BLOCK = 64     # square-tile side: one grid step = 64x64 pixels (grouped)


def use_blocked_tiles(config: RenderConfig, grouped: bool,
                      sharded: bool) -> bool:
    """Square 64x64 pixel tiles for the grouped tier (see _path_kernel).
    Requires divisible resolution; the sharded path keeps the linear
    mapping (shards slice the linear pixel range)."""
    return (grouped and not sharded
            and config.width % BLOCK == 0 and config.height % BLOCK == 0)


def to_blocked(a: jnp.ndarray, config: RenderConfig) -> jnp.ndarray:
    """Permute per-pixel [N, ...]-data from row-major to square-tile order
    (pure reshape/transpose — XLA relayout, no gathers)."""
    h, w = config.height, config.width
    rest = a.shape[1:]
    perm = (0, 2, 1, 3) + tuple(4 + i for i in range(len(rest)))
    return jnp.transpose(
        a.reshape(h // BLOCK, BLOCK, w // BLOCK, BLOCK, *rest),
        perm).reshape(-1, *rest)


def from_blocked(a: jnp.ndarray, config: RenderConfig) -> jnp.ndarray:
    """Inverse of to_blocked on [N, C] data -> [H, W, C]."""
    h, w = config.height, config.width
    c = a.shape[-1]
    return jnp.transpose(
        a.reshape(h // BLOCK, w // BLOCK, BLOCK, BLOCK, c),
        (0, 2, 1, 3, 4)).reshape(h, w, c)


class TraceAux(NamedTuple):
    """Trace-pass outputs consumed by the differentiable replay
    (ops/decoupled.py). ``records`` carries the discrete decisions; the uv
    planes carry the random draws so the replay never recomputes Halton
    digits. Shapes: [spp, bounces, N] except jitter_[xy] [spp, N]."""

    records: jnp.ndarray   # int32: (prim + 1) + OCC_BIT * occluded; 0=miss
    nee_u0: jnp.ndarray    # f32 light-sample u (pre-scale, in [0,1))
    nee_u1: jnp.ndarray
    cos_u0: jnp.ndarray    # f32 cosine-bounce u
    cos_u1: jnp.ndarray
    jitter_x: jnp.ndarray  # f32 camera subpixel jitter
    jitter_y: jnp.ndarray

# Packed triangle-constant rows ([NROWS, T] table, SMEM).
ROW_NX, ROW_NY, ROW_NZ, ROW_C0 = 0, 1, 2, 3
ROW_S1X, ROW_S1Y, ROW_S1Z, ROW_C1 = 4, 5, 6, 7
ROW_S2X, ROW_S2Y, ROW_S2Z, ROW_C2 = 8, 9, 10, 11
ROW_DR, ROW_DG, ROW_DB, ROW_ISEM = 12, 13, 14, 15
ROW_ER, ROW_EG, ROW_EB = 16, 17, 18
NROWS = 19

# Sphere-constant rows ([SROWS, S] table, SMEM): center xyz, radius,
# diffuse rgb, is_emissive, emissive rgb.
SROWS = 11

# Attribute-table rows ([NATTR, num_tris + num_spheres] VMEM table): shading
# attributes of every primitive, fetched once per bounce by a one-hot MXU
# matmul over the winning primitive index instead of being carried through
# the closest-hit select chain (10 fewer where-selects per primitive per
# ray). Rows: normal xyz (zeros for spheres), diffuse rgb, emissive rgb,
# is_emissive, sphere-center xyz (zeros for triangles).
NATTR = 13


# Halton indices are offset + n with offset < 2^20 (render.pixel_rng_offsets)
# and n < spp, so every index this kernel ever radical-inverses fits in
# HALTON_INDEX_BITS. The jnp oracle runs the full 32-bit digit loop; the
# extra high digits are zero there (q hits 0), so truncating the loop here is
# value-identical.
HALTON_INDEX_BITS = 21


def _halton_tile(i: jnp.ndarray, d: int) -> jnp.ndarray:
    """Halton radical inverse on an index tile; fixed digit-count loop
    (sampling.metal:107-122). Dense [RAY_SUB, 128] work.

    Digit extraction runs in f32 instead of u32 div/mod: indices are < 2^21
    so they are exact in f32, q0 = floor(i * (1/b)) is off by at most 1 from
    rounding, and one correction step recovers the exact (quotient, digit)
    pair — bit-identical to the oracle's integer path at a fraction of the
    cost (TPU integer division is emulated; every op here is a single-cycle
    VPU f32 op). Unrolled: the digit counts are small and static."""
    b = smp.PRIMES[d]
    digits = int(math.ceil(HALTON_INDEX_BITS / math.log2(b)))
    inv_b = _F32(1.0 / b)
    bf = _F32(b)

    def body(_, carry):
        f, r, i_f = carry
        f = f * inv_b
        q = jnp.floor(i_f * inv_b)
        digit = i_f - q * bf  # exact: both products are small integers
        # Correct the rounded quotient (at most one step either way).
        too_low = digit >= bf
        too_high = digit < 0.0
        q = jnp.where(too_low, q + 1.0, jnp.where(too_high, q - 1.0, q))
        digit = jnp.where(too_low, digit - bf,
                          jnp.where(too_high, digit + bf, digit))
        r = r + f * digit
        return f, r, q

    r0 = jnp.zeros(i.shape, _F32)
    f0 = r0 + 1.0
    i_f = i.astype(_I32).astype(_F32)  # < 2^21: exact
    _, r, _ = jax.lax.fori_loop(0, digits, body, (f0, r0, i_f), unroll=True)
    return r


def _normalize3(x, y, z):
    # 1e-12 floor, matching sampling.normalize: rsqrt's VJP overflows f32
    # below ~1e-24 (inf, then 0 * inf = NaN through in-kernel vjp on
    # masked lanes — seen on real TPUs in the MIS backward).
    inv = jax.lax.rsqrt(jnp.maximum(x * x + y * y + z * z, 1e-12))
    return x * inv, y * inv, z * inv


def _f32_divmod(x, m: int):
    """Exact (quotient, remainder) of a small-integer-valued f32 tile by a
    static int: floor-divide with one rounding-correction step (same trick
    as _halton_tile — f32 ops beat emulated integer div on the VPU)."""
    mf = _F32(m)
    q = jnp.floor(x * _F32(1.0 / m))
    r = x - q * mf
    too_low = r >= mf
    too_high = r < 0.0
    q = jnp.where(too_low, q + 1.0, jnp.where(too_high, q - 1.0, q))
    r = jnp.where(too_low, r - mf, jnp.where(too_high, r + mf, r))
    return q, r


def _safe_inv(d):
    """1/d with |d| < 1e-30 clamped to 1e30 for the AABB slab test. The
    clamp keeps (lo - o) * inv finite and NaN-free in every case (0 * 1e30
    = 0; finite * 1e30 may overflow to inf, which compares correctly), and
    for near-zero directions the test stays CONSERVATIVE: an origin inside
    the slab yields an unconstrained interval, an origin outside yields
    same-sign huge bounds that reject — exactly the true geometry."""
    return jnp.where(jnp.abs(d) < 1e-30, 1e30, 1.0 / d)


def _slab_interval(aabb6, ox, oy, oz, ivx, ivy, ivz):
    """Ray/AABB slab test on a ray tile against one group's bounds (6 SMEM
    scalars: lo xyz, hi xyz). Returns (tmin, tmax) of the box interval,
    clamped below at 0. The group AABBs are padded host-side (GROUP_AABB_PAD
    + relative margin) so FP differences between this arithmetic and the
    in-group plane tests can never reject a group containing a true hit —
    the cull is conservative by construction and decisions are bit-identical
    to the uncculled loop (asserted in tests/test_grouped.py)."""
    t0x = (aabb6[0] - ox) * ivx
    t1x = (aabb6[3] - ox) * ivx
    t0y = (aabb6[1] - oy) * ivy
    t1y = (aabb6[4] - oy) * ivy
    t0z = (aabb6[2] - oz) * ivz
    t1z = (aabb6[5] - oz) * ivz
    tmin = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                   jnp.minimum(t0y, t1y)),
                       jnp.maximum(jnp.minimum(t0z, t1z), 0.0))
    tmax = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                   jnp.maximum(t0y, t1y)),
                       jnp.maximum(t0z, t1z))
    return tmin, tmax


# Absolute padding added to every group AABB (plus a 1e-5 relative term) and
# the relative+absolute slack on the per-ray far limit. The slab arithmetic
# differs from the triangle plane test by a few ulps; these margins are ~1000x
# that, so the cull can only ever ACCEPT extra groups (wasted work), never
# reject a group whose triangle would have won — conservatism is what keeps
# grouped-with-AABB decisions identical to the brute-force loop.
GROUP_AABB_PAD = 1e-3
T_FAR_SLACK = 1e-3


def _sample_chunk_for(config: RenderConfig, records_only: bool,
                      grouped_prims: int = 0) -> int:
    """Samples per grid step for record-emitting runs: whole-spp when the
    staged record blocks fit comfortably in VMEM, else the largest divisor
    of spp whose block set stays <= ~3 MB (Pallas double-buffers output
    blocks across the sample grid dim — this is what lets BASELINE config
    5's 1024^2 x 256 spp record stream exist without a >12 MB VMEM block).

    ``grouped_prims``: padded primitive count of a GROUPED-tier scene —
    its VMEM-resident tables (transposed fetch table in the trace kernel;
    table + dtab output + scratch in the backward, ~200 B/prim total) eat
    into the block budget, so the chunk shrinks with scene size (measured:
    12.8k tris overflowed the 16 MB scoped limit by 0.5 MB at the
    ungrouped chunk choice). MUST be passed identically by the record
    EMITTER and the record CONSUMER — the record-plane block layout is
    this chunk size."""
    per_sample = config.bounces * RAY_SUB * LANES * 4      # records (i32)
    if not records_only:
        per_sample = per_sample * 5 + 2 * RAY_SUB * LANES * 4  # + uv/jitter
    reserve = 200 * grouped_prims
    if config.spp * per_sample <= (6 << 20) - reserve:
        return config.spp
    c = max(1, min(config.spp,
                   max((1 << 20), (3 << 20) - reserve) // per_sample))
    while config.spp % c:
        c -= 1
    return max(c, 1)


def _draws_kernel(config: RenderConfig, s_chunk: int,
                  offsets_ref, nee0_ref, nee1_ref, cos0_ref, cos1_ref,
                  jx_ref, jy_ref):
    """Random-draw pregeneration: the trace kernel's Halton evaluations
    (camera jitter + per-bounce NEE/cosine u-pairs), extracted into their
    own pass. The draws are a pure function of (pixel offset, sample index)
    — STEP-INVARIANT across a training/bench loop — so emitting them once
    and letting the trace kernel read planes turns ~14 radical-inverse
    tiles per sample of per-step VPU work into a one-time cost that XLA
    hoists out of `lax.scan`/training loops (the same amortization the MIS
    kernel gets from its host-precomputed SMEM sample tables). Bit-identical
    values: same f32-digit Halton as the in-kernel path."""
    off = offsets_ref[...]
    j_chunk = pl.program_id(1)

    def one_sample(n_i32, carry):
        ih = off + (j_chunk * s_chunk + n_i32).astype(_U32)
        jx = _halton_tile(ih, 0)
        jy = _halton_tile(ih, 1)
        if config.sampler == "stratified":
            k = int(round(math.sqrt(config.spp)))
            ihf = ih.astype(_I32).astype(_F32)
            _, cell = _f32_divmod(ihf, config.spp)
            cy, cx = _f32_divmod(cell, k)
            inv_k = _F32(1.0 / k)
            jx = (cx + jx) * inv_k
            jy = (cy + jy) * inv_k
        js = pl.ds(n_i32 * RAY_SUB, RAY_SUB)
        jx_ref[js, :] = jx
        jy_ref[js, :] = jy
        for bounce in range(config.bounces):
            bs = pl.ds((n_i32 * config.bounces + bounce) * RAY_SUB, RAY_SUB)
            nee0_ref[bs, :] = _halton_tile(ih, 2 + bounce * 5 + 0)
            nee1_ref[bs, :] = _halton_tile(ih, 2 + bounce * 5 + 1)
            cos0_ref[bs, :] = _halton_tile(ih, 2 + bounce * 5 + 2)
            cos1_ref[bs, :] = _halton_tile(ih, 2 + bounce * 5 + 3)
        return carry

    jax.lax.fori_loop(0, s_chunk, one_sample, 0)


def _path_kernel(config: RenderConfig, n_pixels: int, num_tris: int,
                 num_spheres: int, emit_records: bool, records_only: bool,
                 s_chunk: int, occluders, grouped: bool, n_shadow: int,
                 blocked: bool, share_shadow: bool,
                 offsets_ref, rid_base_ref, cam_ref, light_ref, tri_ref,
                 sph_ref, atab_ref, *rest):
    """One [RAY_SUB, 128] tile of rays: full spp x bounces path trace.

    With ``emit_records``, also writes one int32 visibility record per
    (sample, bounce, ray): code = (winning prim + 1) + OCC_BIT * occluded
    (0 = miss; sphere s records as num_tris + s + 1). The records replay the
    kernel's discrete decisions in a cheap differentiable jnp shading pass
    (ops/decoupled.py) — the fwd+bwd path. In this mode (unless
    ``records_only``) the random draws arrive as precomputed input planes
    from ``_draws_kernel`` instead of being radical-inversed in-loop.

    ``grouped`` switches the primitive loops to dynamic GROUPED traversal
    (see STATIC_UNROLL_MAX): tri_ref is then a zero-padded [12, P_pad] SMEM
    geometry table read with dynamic scalar indices inside a fori_loop over
    GROUP-sized chunks, atab_ref a TRANSPOSED [P_pad128, NATTR] VMEM fetch
    table contracted per 128-primitive block, and an extra ``shadow_ref``
    SMEM table (occluder-culled triangles packed dense, ``n_shadow`` wide)
    precedes the other rest-args. Padding columns are all-zero, so their
    plane tests fail the |den| guard and can never win."""
    if grouped:
        if share_shadow:
            # One geometry/AABB table set for both loops (SMEM budget —
            # see _render_pallas_impl's share_shadow note).
            aabb_ref, sup_ref = rest[:2]
            rest = rest[2:]
            shadow_ref, sh_aabb_ref, sh_sup_ref = tri_ref, aabb_ref, sup_ref
        else:
            (shadow_ref, aabb_ref, sup_ref,
             sh_aabb_ref, sh_sup_ref) = rest[:5]
            rest = rest[5:]
    else:
        shadow_ref = aabb_ref = sup_ref = sh_aabb_ref = sh_sup_ref = None
    reads_draws = emit_records and not records_only
    if reads_draws:
        (nee0_ref, nee1_ref, cos0_ref, cos1_ref, jx_ref, jy_ref,
         out_r_ref, out_g_ref, out_b_ref, rec_out_ref) = rest
    else:
        out_r_ref, out_g_ref, out_b_ref = rest[:3]
        rec_out_ref = rest[3] if emit_records else None
    W = config.width
    H = config.height
    he = _F32(config.area_light_half_extent)

    pid = pl.program_id(0)
    sub = jax.lax.broadcasted_iota(_I32, (RAY_SUB, LANES), 0)
    lanei = jax.lax.broadcasted_iota(_I32, (RAY_SUB, LANES), 1)
    # Global pixel id: rid_base is the shard's first pixel (0 single-chip;
    # axis_index * shard_size under shard_map) so sharded rendering keeps
    # every per-pixel quantity a pure function of the global pixel.
    rid = rid_base_ref[0, 0] + pid * TILE + sub * LANES + lanei
    if blocked:
        # SQUARE-TILE pixel mapping (grouped tier): each grid step owns one
        # 64x64 pixel block instead of an 8-row full-width strip, so the
        # tile's camera frustum / shadow cone is compact and the AABB cull's
        # tile-wide any() rejects far more boxes. The mapping is a pure
        # (reshape, transpose) permutation applied to the offsets input and
        # the hdr/record outputs host-side; per-pixel math is unchanged, so
        # images equal the linear mapping's exactly.
        nbx = W // BLOCK
        blk_s = rid_base_ref[0, 0] // TILE + pid        # scalar block id
        off = sub * LANES + lanei
        pxi = (blk_s % nbx) * BLOCK + off % BLOCK
        pyi = (blk_s // nbx) * BLOCK + off // BLOCK
        px = pxi.astype(_F32)
        py = pyi.astype(_F32)
    else:
        px = (rid % W).astype(_F32)
        py = (rid // W).astype(_F32)
    in_image = rid < n_pixels

    off = offsets_ref[...]  # [RAY_SUB, 128] uint32

    cam = [cam_ref[0, k] for k in range(12)]
    pos, uhw, vhh, wv = cam[0:3], cam[3:6], cam[6:9], cam[9:12]
    lcx, lcy, lcz = light_ref[0, 0], light_ref[0, 1], light_ref[0, 2]
    lr, lg, lb = light_ref[0, 3], light_ref[0, 4], light_ref[0, 5]

    # Hoist all triangle/sphere scalars out of the sample loop
    # (loop-invariant). Only the 12 geometry rows are consumed in-kernel;
    # shading attributes come from the one-hot fetch table. (Static mode
    # only — grouped mode reads them with dynamic indices per group.)
    tris = []
    if not grouped:
        for t in range(num_tris):
            tris.append(tuple(tri_ref[r, t] for r in range(12)))
    sphs = []
    for s_i in range(num_spheres):
        sphs.append(tuple(sph_ref[r, s_i] for r in range(SROWS)))

    n_prims = num_tris + num_spheres
    if not grouped:
        p_iota = jax.lax.broadcasted_iota(_I32, (n_prims, TILE), 0)
        # Exact one-pass attribute fetch (same bf16 chunk-split as the
        # backward kernel, pallas_shade.py): three bf16-representable chunks
        # stacked along the output row dim, one DEFAULT matmul, fold
        # reconstructs the f32 table exactly — 1/6 the MXU passes of the
        # previous HIGHEST fetch.
        atabv = atab_ref[...]
        a0 = atabv.astype(jnp.bfloat16).astype(_F32)
        ar = atabv - a0
        a1 = ar.astype(jnp.bfloat16).astype(_F32)
        atab9 = jnp.concatenate([a0, a1, ar - a1], axis=0)  # [3*NATTR, P]
    else:
        pb_iota = jax.lax.broadcasted_iota(_I32, (PBLK, TILE), 0)

    def fetch_attrs(prim_f, hit):
        """One-hot MXU attribute fetch of the winning primitive's shading
        rows -> [NATTR, RAY_SUB, LANES]. Miss lanes clamp to primitive 0;
        every consumer is gated by ``hit``-derived masks downstream.

        Grouped mode contracts per 128-primitive block against the
        TRANSPOSED table (a full [P, TILE] one-hot at 1k+ prims would be
        16+ MB — past VMEM); each block gets the same exact bf16
        chunk-split, folded per block, and each primitive matches exactly
        one block so the block-sum is exact."""
        pc = jnp.clip(prim_f, 0.0, _F32(n_prims - 1)).astype(_I32)
        if not grouped:
            onehot = (p_iota == pc.reshape(1, TILE)).astype(_F32)
            at9 = jax.lax.dot_general(
                atab9, onehot, (((1,), (0,)), ((), ())),
                preferred_element_type=_F32,
                precision=jax.lax.Precision.DEFAULT)  # [3*NATTR, TILE]
            at = at9[:NATTR] + at9[NATTR:2 * NATTR] + at9[2 * NATTR:]
            return at.reshape(NATTR, RAY_SUB, LANES)
        # BLOCK-RANGE fetch: only 128-primitive blocks between the tile's
        # min and max WINNING indices are contracted (a fori_loop with
        # dynamic bounds + dynamic VMEM slices). Coherent tiles touch a few
        # blocks; without this the per-block loop is itself O(P) and would
        # dominate once the AABB cull removes the intersection work. Miss
        # lanes are excluded from the range — they then fetch ZEROS instead
        # of primitive 0's attributes, which only changes values on lanes
        # every consumer already gates by ``hit`` (hdr/records identical on
        # live lanes; asserted against the oracle in tests/test_grouped.py).
        pcf = pc.reshape(1, TILE)
        pci = pc
        pmin = jnp.min(jnp.where(hit, pci, n_prims - 1))
        pmax = jnp.max(jnp.where(hit, pci, 0))
        bk_lo = pmin // PBLK
        bk_hi = pmax // PBLK

        def blk_body(bk, at_acc):
            off = pl.multiple_of(bk * PBLK, PBLK)
            oh = (pb_iota == (pcf - bk * PBLK)).astype(_F32)  # [PBLK, TILE]
            blk = atab_ref[pl.ds(off, PBLK), :]               # [PBLK, NATTR]
            b0 = blk.astype(jnp.bfloat16).astype(_F32)
            br = blk - b0
            b1 = br.astype(jnp.bfloat16).astype(_F32)
            blk9 = jnp.concatenate([b0, b1, br - b1], axis=1)  # [PBLK, 3*NA]
            at9 = jax.lax.dot_general(
                blk9, oh, (((0,), (0,)), ((), ())),
                preferred_element_type=_F32,
                precision=jax.lax.Precision.DEFAULT)  # [3*NATTR, TILE]
            part = at9[:NATTR] + at9[NATTR:2 * NATTR] + at9[2 * NATTR:]
            return at_acc + part

        at_acc = jax.lax.fori_loop(bk_lo, bk_hi + 1, blk_body,
                                   jnp.zeros((NATTR, TILE), _F32))
        return at_acc.reshape(NATTR, RAY_SUB, LANES)

    def sphere_roots(sph, ox, oy, oz, dx, dy, dz):
        """Quadratic ray/sphere roots (shaders_old.metal:108-136; same op
        order as intersect._sphere_candidates for oracle parity)."""
        scx, scy, scz, rad = sph[:4]
        ocx, ocy, ocz = ox - scx, oy - scy, oz - scz
        a = dx * dx + dy * dy + dz * dz
        b = 2.0 * (ocx * dx + ocy * dy + ocz * dz)
        c = (ocx * ocx + ocy * ocy + ocz * ocz) - rad * rad
        disc = b * b - 4.0 * a * c
        pos = disc > 0.0
        sq = jnp.sqrt(jnp.where(pos, disc, 1.0))
        t1 = (-b - sq) / (2.0 * a)
        t2 = (-b + sq) / (2.0 * a)
        return pos, t1, t2

    def _tri_closest_step(row, prim_idx_f, ox, oy, oz, dx, dy, dz,
                          t_best, prim_f):
        """One triangle's closest-hit test + running-min carry update.
        ``row``: the 12 geometry scalars; ``prim_idx_f``: the triangle's
        index as an f32 scalar (static in unrolled mode, traced in grouped
        mode — a splat either way)."""
        (nx, ny, nz, c0, s1x, s1y, s1z, c1, s2x, s2y, s2z, c2) = row
        den = dx * nx + dy * ny + dz * nz
        num = c0 - (ox * nx + oy * ny + oz * nz)
        ok = jnp.abs(den) >= 1e-12
        # Raw divide: guarded lanes produce Inf/NaN, every comparison on
        # them is false, and ``ok`` stays in the accept mask — decisions
        # (and winning-lane t values) exactly match the oracle's
        # selected-divide form at one fewer select per primitive.
        tt = num / den
        u = (ox * s1x + oy * s1y + oz * s1z) \
            + tt * (dx * s1x + dy * s1y + dz * s1z) - c1
        v = (ox * s2x + oy * s2y + oz * s2z) \
            + tt * (dx * s2x + dy * s2y + dz * s2z) - c2
        closer = (ok & (tt > RAY_TMIN) & (tt < RAY_TMAX)
                  & (jnp.minimum(u, v) >= 0.0) & (u + v <= 1.0)
                  & (tt < t_best))
        t_best = jnp.where(closer, tt, t_best)
        prim_f = jnp.where(closer, prim_idx_f, prim_f)
        return t_best, prim_f

    def closest(ox, oy, oz, dx, dy, dz):
        """Running-min closest hit over the triangle loop (static unroll or
        grouped fori_loop). Returns
        (hit, t, prim_f, normal xyz, diffuse rgb, emissive rgb, is_em).

        Only (t_best, prim_f) are carried through the primitive loop; the 10
        shading-attribute planes are fetched once at the end by the one-hot
        MXU fetch (``fetch_attrs``) — ~10 fewer VPU selects per primitive
        per ray than carrying the attributes through the chain."""
        t_best = jnp.full((RAY_SUB, LANES), BIG, _F32)
        prim_f = t_best * 0.0 - 1.0  # winning primitive index, -1 = miss
        if not grouped:
            for t_idx, tri in enumerate(tris):
                t_best, prim_f = _tri_closest_step(
                    tri, _F32(t_idx), ox, oy, oz, dx, dy, dz, t_best, prim_f)
        else:
            # TWO-LEVEL spatial rejection (the TPU-native analog of the
            # reference's driver BVH, computeShader.swift:45-97): a
            # fori_loop over SUPER-group AABBs (128 tris each) skips whole
            # regions per lax.cond; accepted supers test their 8 group
            # AABBs (16 tris each); accepted groups run the dynamically
            # SMEM-indexed triangle unroll. The t_best bound tightens as
            # the sweep runs, so later boxes reject more — per-ray cost
            # tracks INTERSECTED geometry, not total primitives. Host-side
            # Morton-coherent packing keeps the boxes tight; the cull is
            # conservative (padded boxes), so decisions are bit-identical
            # to the brute-force loop (tests/test_grouped.py).
            ivx, ivy, ivz = _safe_inv(dx), _safe_inv(dy), _safe_inv(dz)
            n_super = sup_ref.shape[1]

            def tri_group(g, carry):
                t_b, p_f = carry
                aabb6 = [aabb_ref[r, g] for r in range(6)]
                tmin, tmax = _slab_interval(aabb6, ox, oy, oz, ivx, ivy, ivz)
                t_far = jnp.minimum(t_b * (1.0 + T_FAR_SLACK) + T_FAR_SLACK,
                                    RAY_TMAX)
                reach = tmin <= jnp.minimum(tmax, t_far)
                any_hit = jnp.max(jnp.where(reach, 1.0, 0.0)) > 0.5

                def run(carry):
                    t_b, p_f = carry
                    base = g * GROUP
                    for k in range(GROUP):
                        idx = base + k
                        row = tuple(tri_ref[r, idx] for r in range(12))
                        t_b, p_f = _tri_closest_step(
                            row, idx.astype(_F32), ox, oy, oz, dx, dy, dz,
                            t_b, p_f)
                    return t_b, p_f

                return jax.lax.cond(any_hit, run, lambda c: c, (t_b, p_f))

            def super_body(sg, carry):
                t_b, p_f = carry
                s6 = [sup_ref[r, sg] for r in range(6)]
                tmin, tmax = _slab_interval(s6, ox, oy, oz, ivx, ivy, ivz)
                t_far = jnp.minimum(t_b * (1.0 + T_FAR_SLACK) + T_FAR_SLACK,
                                    RAY_TMAX)
                reach = tmin <= jnp.minimum(tmax, t_far)
                any_hit = jnp.max(jnp.where(reach, 1.0, 0.0)) > 0.5

                def run(carry):
                    for k in range(SUPER):
                        carry = tri_group(sg * SUPER + k, carry)
                    return carry

                return jax.lax.cond(any_hit, run, lambda c: c, (t_b, p_f))

            t_best, prim_f = jax.lax.fori_loop(
                0, n_super, super_body, (t_best, prim_f))
        # Analytic spheres after triangles (ties keep the triangle, like the
        # oracle's first-min argmin over [tris..., spheres...]).
        for s_idx, sph in enumerate(sphs):
            pos, t1, t2 = sphere_roots(sph, ox, oy, oz, dx, dy, dz)
            t1_ok = (t1 > RAY_TMIN) & (t1 < RAY_TMAX)
            t2_ok = (t2 > RAY_TMIN) & (t2 < RAY_TMAX)
            tt = jnp.where(t1_ok, t1, t2)
            closer = pos & (t1_ok | t2_ok) & (tt < t_best)
            t_best = jnp.where(closer, tt, t_best)
            prim_f = jnp.where(closer, _F32(num_tris + s_idx), prim_f)
        hit = t_best < BIG * 0.5
        at = fetch_attrs(prim_f, hit)
        nhx, nhy, nhz = at[0], at[1], at[2]
        dfr, dfg, dfb = at[3], at[4], at[5]
        emr, emg, emb = at[6], at[7], at[8]
        isem = at[9]
        if num_spheres:
            # Sphere normal: (hit point - center) normalized
            # (shaders_old.metal:122-123); select over the triangle normal
            # (zeros in the table's sphere columns).
            sphere_won = hit & (prim_f >= _F32(num_tris))
            wcx, wcy, wcz = at[10], at[11], at[12]
            t_s = jnp.where(sphere_won, t_best, 0.0)
            nvx = ox + dx * t_s - wcx
            nvy = oy + dy * t_s - wcy
            nvz = oz + dz * t_s - wcz
            inv = jax.lax.rsqrt(jnp.maximum(
                nvx * nvx + nvy * nvy + nvz * nvz, 1e-6))
            nhx = jnp.where(sphere_won, nvx * inv, nhx)
            nhy = jnp.where(sphere_won, nvy * inv, nhy)
            nhz = jnp.where(sphere_won, nvz * inv, nhz)
        return (hit, t_best, prim_f, nhx, nhy, nhz, dfr, dfg, dfb,
                emr, emg, emb, isem)

    def _tri_shadow_step(row, ox, oy, oz, dx, dy, dz, t_max, occ):
        """One triangle's any-hit test, OR'd into the running occlusion."""
        nx, ny, nz, c0, s1x, s1y, s1z, c1, s2x, s2y, s2z, c2 = row
        den = dx * nx + dy * ny + dz * nz
        num = c0 - (ox * nx + oy * ny + oz * nz)
        ok = jnp.abs(den) >= 1e-12
        # Raw divide: guarded lanes produce Inf/NaN, every comparison on
        # them is false, and ``ok`` stays in the accept mask — decisions
        # (and winning-lane t values) exactly match the oracle's
        # selected-divide form at one fewer select per primitive.
        tt = num / den
        u = (ox * s1x + oy * s1y + oz * s1z) \
            + tt * (dx * s1x + dy * s1y + dz * s1z) - c1
        v = (ox * s2x + oy * s2y + oz * s2z) \
            + tt * (dx * s2x + dy * s2y + dz * s2z) - c2
        return occ | (ok & (tt > 0.0) & (tt < t_max)
                      & (jnp.minimum(u, v) >= 0.0) & (u + v <= 1.0))

    def occluded_q(ox, oy, oz, dx, dy, dz, t_max):
        """Shadow any-hit with per-ray t_max (raytrace.metal:79-85).
        ``occluders`` statically culls triangles that provably cannot block
        a surface->light segment (intersect.potential_occluders — e.g. the
        convex-hull walls); decisions are bit-identical to the full loop.
        Grouped mode iterates the dense host-packed shadow table (culled
        triangles already dropped; padding columns fail the |den| guard)."""
        occ = jnp.zeros((RAY_SUB, LANES), bool)
        if not grouped:
            shadow_tris = (tris if occluders is None else
                           [t for i, t in enumerate(tris) if occluders[i]])
            for tri in shadow_tris:
                occ = _tri_shadow_step(tri[:12], ox, oy, oz, dx, dy, dz,
                                       t_max, occ)
        else:
            ivx, ivy, ivz = _safe_inv(dx), _safe_inv(dy), _safe_inv(dz)
            t_seg = t_max * (1.0 + T_FAR_SLACK) + T_FAR_SLACK
            n_super = sh_sup_ref.shape[1]

            # Two-level segment/AABB rejection + early-out (see the closest
            # loop): a box is skipped when no STILL-UNOCCLUDED ray's
            # [0, t_max] segment overlaps it — conservative, so occlusion
            # decisions are identical. The running-OR carries as f32 0/1,
            # not bool: Mosaic cannot legalize i1-vector loop carries.
            def tri_group(g, occ_f):
                aabb6 = [sh_aabb_ref[r, g] for r in range(6)]
                tmin, tmax = _slab_interval(aabb6, ox, oy, oz, ivx, ivy, ivz)
                reach = (tmin <= jnp.minimum(tmax, t_seg)) & (occ_f < 0.5)
                any_hit = jnp.max(jnp.where(reach, 1.0, 0.0)) > 0.5

                def run(occ_f):
                    base = g * GROUP
                    occ_c = occ_f > 0.5
                    for k in range(GROUP):
                        idx = base + k
                        row = tuple(shadow_ref[r, idx] for r in range(12))
                        occ_c = _tri_shadow_step(row, ox, oy, oz, dx, dy, dz,
                                                 t_max, occ_c)
                    return jnp.where(occ_c, 1.0, 0.0)

                return jax.lax.cond(any_hit, run, lambda o: o, occ_f)

            def super_body(sg, occ_f):
                s6 = [sh_sup_ref[r, sg] for r in range(6)]
                tmin, tmax = _slab_interval(s6, ox, oy, oz, ivx, ivy, ivz)
                reach = (tmin <= jnp.minimum(tmax, t_seg)) & (occ_f < 0.5)
                any_hit = jnp.max(jnp.where(reach, 1.0, 0.0)) > 0.5

                def run(occ_f):
                    for k in range(SUPER):
                        occ_f = tri_group(sg * SUPER + k, occ_f)
                    return occ_f

                return jax.lax.cond(any_hit, run, lambda o: o, occ_f)

            occ_f = jax.lax.fori_loop(0, n_super, super_body,
                                      jnp.where(occ, 1.0, 0.0))
            occ = occ_f > 0.5
        for sph in sphs:
            pos, t1, t2 = sphere_roots(sph, ox, oy, oz, dx, dy, dz)
            t1_ok = (t1 > 0.0) & (t1 < t_max)
            t2_ok = (t2 > 0.0) & (t2 < t_max)
            occ = occ | (pos & (t1_ok | t2_ok))
        return occ

    # Record-emitting runs use a (tile, sample-chunk) grid; the global
    # sample index is j * s_chunk + n so record slices stay within this
    # step's block while the RNG stays a pure function of the global index.
    j_chunk = pl.program_id(1) if emit_records else None

    def one_sample(n_i32, carry):
        acc_r, acc_g, acc_b = carry
        if reads_draws:
            js = pl.ds(n_i32 * RAY_SUB, RAY_SUB)
            jx = jx_ref[js, :]
            jy = jy_ref[js, :]
            ih = None
        else:
            if emit_records:
                n_glob = j_chunk * s_chunk + n_i32
            else:
                n_glob = n_i32
            ih = off + n_glob.astype(_U32)
            jx = _halton_tile(ih, 0)
            jy = _halton_tile(ih, 1)
            if config.sampler == "stratified":
                # Jittered grid over spp cells (sampling.stratified2
                # mirror; exact f32 integer math — ih < 2^21).
                k = int(round(math.sqrt(config.spp)))
                ihf = ih.astype(_I32).astype(_F32)
                _, cell = _f32_divmod(ihf, config.spp)
                cy, cx = _f32_divmod(cell, k)
                inv_k = _F32(1.0 / k)
                jx = (cx + jx) * inv_k
                jy = (cy + jy) * inv_k

        # Camera ray (sampling.metal:125-157); basis prescaled on host.
        s = ((px + jx) / _F32(W)) * 2.0 - 1.0
        t = -(((py + jy) / _F32(H)) * 2.0 - 1.0)
        dx = s * uhw[0] + t * vhh[0] - wv[0]
        dy = s * uhw[1] + t * vhh[1] - wv[1]
        dz = s * uhw[2] + t * vhh[2] - wv[2]
        dx, dy, dz = _normalize3(dx, dy, dz)
        ox = px * 0.0 + pos[0]
        oy = px * 0.0 + pos[1]
        oz = px * 0.0 + pos[2]

        one = px * 0.0 + 1.0
        col_r, col_g, col_b = one, one, one
        a_r = px * 0.0
        a_g, a_b = a_r, a_r
        alive = in_image

        for bounce in range(config.bounces):
            (hit, t_hit, prim_f, nhx, nhy, nhz, dfr, dfg, dfb,
             emr, emg, emb, isem) = closest(ox, oy, oz, dx, dy, dz)
            is_em = isem > 0.5
            active = alive & hit
            hit_light = active & is_em
            # Emissive hit REPLACES the accumulator (raytrace.metal:57-60).
            a_r = jnp.where(hit_light, emr, a_r)
            a_g = jnp.where(hit_light, emg, a_g)
            a_b = jnp.where(hit_light, emb, a_b)
            surf = active & ~is_em

            t_safe = jnp.where(surf, t_hit, 0.0)
            hx = ox + dx * t_safe + nhx * 1e-3
            hy = oy + dy * t_safe + nhy * 1e-3
            hz = oz + dz * t_safe + nhz * 1e-3

            # NEE (sampleAreaLight, sampling.metal:198-236): hardcoded frame
            # right=(he,0,0), up=(0,0,he), light normal (0,-1,0).
            if reads_draws:
                bs = pl.ds((n_i32 * config.bounces + bounce) * RAY_SUB,
                           RAY_SUB)
                u_nee0 = nee0_ref[bs, :]
                u_nee1 = nee1_ref[bs, :]
            else:
                u_nee0 = _halton_tile(ih, 2 + bounce * 5 + 0)
                u_nee1 = _halton_tile(ih, 2 + bounce * 5 + 1)
            w0 = u_nee0 * 2.0 - 1.0
            w1 = u_nee1 * 2.0 - 1.0
            tlx = lcx + he * w0 - hx
            tly = lcy - hy
            tlz = lcz + he * w1 - hz
            ldist = jnp.sqrt(jnp.maximum(
                tlx * tlx + tly * tly + tlz * tlz, 0.0))
            inv_d = 1.0 / jnp.maximum(ldist, 1e-3)
            ldx, ldy, ldz = tlx * inv_d, tly * inv_d, tlz * inv_d
            cos_l = jnp.clip(ldy, 0.0, 1.0)  # -ld . (0,-1,0)
            fall = inv_d * inv_d * cos_l
            cos_s = jnp.clip(nhx * ldx + nhy * ldy + nhz * ldz, 0.0, 1.0)
            gain = fall * cos_s

            col_r = jnp.where(surf, col_r * dfr, col_r)
            col_g = jnp.where(surf, col_g * dfg, col_g)
            col_b = jnp.where(surf, col_b * dfb, col_b)

            occ = occluded_q(hx, hy, hz, ldx, ldy, ldz, ldist - 1e-3)
            if emit_records:
                code = (prim_f + 1.0) + jnp.where(occ, _F32(OCC_BIT),
                                                  _F32(0.0))
                bs = pl.ds((n_i32 * config.bounces + bounce) * RAY_SUB,
                           RAY_SUB)
                rec_out_ref[bs, :] = code.astype(_I32)
            contrib = surf & ~occ
            w_c = jnp.where(contrib, gain, 0.0)
            a_r = a_r + lr * w_c * col_r
            a_g = a_g + lg * w_c * col_g
            a_b = a_b + lb * w_c * col_b

            # Cosine bounce (sampling.metal:39-66).
            if reads_draws:
                u0 = cos0_ref[bs, :]
                u1 = cos1_ref[bs, :]
            else:
                u0 = _halton_tile(ih, 2 + bounce * 5 + 2)
                u1 = _halton_tile(ih, 2 + bounce * 5 + 3)
            phi = _F32(2.0 * math.pi) * u0
            cth = jnp.sqrt(u1)
            sth = jnp.sqrt(jnp.maximum(1.0 - cth * cth, 0.0))
            lx = sth * jnp.cos(phi)
            ly = cth
            lz2 = sth * jnp.sin(phi)
            ax, ay, az = _F32(0.0072), _F32(1.0), _F32(0.0034)
            rx = nhy * az - nhz * ay
            ry = nhz * ax - nhx * az
            rz = nhx * ay - nhy * ax
            rx, ry, rz = _normalize3(rx, ry, rz)
            fx = ry * nhz - rz * nhy
            fy = rz * nhx - rx * nhz
            fz = rx * nhy - ry * nhx
            sdx = lx * rx + ly * nhx + lz2 * fx
            sdy = lx * ry + ly * nhy + lz2 * fy
            sdz = lx * rz + ly * nhz + lz2 * fz

            ox = jnp.where(surf, hx, ox)
            oy = jnp.where(surf, hy, oy)
            oz = jnp.where(surf, hz, oz)
            dx = jnp.where(surf, sdx, dx)
            dy = jnp.where(surf, sdy, dy)
            dz = jnp.where(surf, sdz, dz)
            alive = surf

        return acc_r + a_r, acc_g + a_g, acc_b + a_b

    zero = px * 0.0
    inv_spp = _F32(1.0 / config.spp)
    if emit_records:
        # Accumulate across the sample-chunk grid dim (hdr blocks are
        # revisited; sequential adds keep bit-parity with the 1-D loop) and
        # scale once at the last step.
        n_schunks = config.spp // s_chunk
        acc_r, acc_g, acc_b = jax.lax.fori_loop(
            0, s_chunk, one_sample, (zero, zero, zero))

        @pl.when(j_chunk == 0)
        def _():
            out_r_ref[...] = jnp.zeros_like(out_r_ref)
            out_g_ref[...] = jnp.zeros_like(out_g_ref)
            out_b_ref[...] = jnp.zeros_like(out_b_ref)

        out_r_ref[...] += acc_r
        out_g_ref[...] += acc_g
        out_b_ref[...] += acc_b

        @pl.when(j_chunk == n_schunks - 1)
        def _():
            out_r_ref[...] *= inv_spp
            out_g_ref[...] *= inv_spp
            out_b_ref[...] *= inv_spp
    else:
        acc_r, acc_g, acc_b = jax.lax.fori_loop(
            0, config.spp, one_sample, (zero, zero, zero))
        out_r_ref[...] = acc_r * inv_spp
        out_g_ref[...] = acc_g * inv_spp
        out_b_ref[...] = acc_b * inv_spp


def group_aabbs(verts):
    """[T, 3, 3] verts -> two-level AABB tables: per-GROUP [6, ng_pad]
    and per-SUPER [6, n_super] (rows: lo xyz, hi xyz). The trailing
    partial group is padded with copies of the last triangle so padding
    never widens a box; the group table is then padded to a SUPER
    multiple with SENTINEL point-boxes at 1e20 whose slab test rejects
    every ray (their geometry columns are never read — the cond skips
    the body). Conservative margin: GROUP_AABB_PAD + 1e-5 relative.
    Module-level: shared by the path AND the grouped MIS packers."""
    n = verts.shape[0]
    ng = max(1, (n + GROUP - 1) // GROUP)
    pad = ng * GROUP - n
    v = jnp.concatenate(
        [verts, jnp.broadcast_to(verts[-1:], (pad, 3, 3))]) \
        if pad else verts
    v = v.reshape(ng, GROUP * 3, 3)
    margin = GROUP_AABB_PAD + 1e-5 * jnp.max(jnp.abs(verts))
    lo = jnp.min(v, axis=1) - margin      # [ng, 3]
    hi = jnp.max(v, axis=1) + margin
    n_super = (ng + SUPER - 1) // SUPER
    gpad = n_super * SUPER - ng
    lo_p = jnp.concatenate([lo, jnp.full((gpad, 3), 1e20, _F32)])
    hi_p = jnp.concatenate([hi, jnp.full((gpad, 3), -1e20, _F32)])
    slo = jnp.min(lo_p.reshape(n_super, SUPER, 3), axis=1)
    shi = jnp.max(hi_p.reshape(n_super, SUPER, 3), axis=1)
    # Sentinel groups: point boxes at +1e20 (lo == hi == 1e20 rejects
    # every forward interval; see _safe_inv's conservativeness note).
    hi_p = jnp.where(hi_p <= -1e20, 1e20, hi_p)
    gtab = jnp.concatenate([lo_p.T, hi_p.T], axis=0).astype(_F32)
    stab = jnp.concatenate([slo.T, shi.T], axis=0).astype(_F32)
    return gtab, stab  # [6, ng_pad], [6, n_super]


def pad_geo(x):
    """Zero-pad geometry columns to SUPER * GROUP granularity so
    sentinel groups' columns exist (never read — their AABB rejects)."""
    mult = SUPER * GROUP
    p = ((x.shape[1] + mult - 1) // mult) * mult
    return jnp.pad(x, ((0, 0), (0, p - x.shape[1])))


def pack_shadow_tables(tri, verts, occluders, tri_geo, aabb_main,
                       sup_main):
    """Dense occluder-culled shadow geometry + its two-level AABB tables
    (falls back to the main tables when no cull is supplied)."""
    if occluders is None:
        return tri_geo, aabb_main, sup_main
    keep = [i for i, k in enumerate(occluders) if k]
    if keep:
        kidx = jnp.asarray(keep, jnp.int32)
        shadow_geo = pad_geo(tri[:12, kidx])
        aabb_shadow, sup_shadow = group_aabbs(verts[kidx])
    else:
        shadow_geo = jnp.zeros((12, SUPER * GROUP), _F32)
        aabb_shadow = jnp.full((6, SUPER), 1e20, _F32)
        sup_shadow = jnp.full((6, 1), 1e20, _F32)
    return shadow_geo, aabb_shadow, sup_shadow


def _pack_inputs(scene: Scene, config: RenderConfig, grouped: bool = False,
                 occluders=None):
    """Host-side marshalling: triangle constants to a [NROWS, T] table,
    camera to a prescaled-basis vector, light to scalars — the analog of the
    reference's convert*/makeBuffer step (RTrace/computeShader.swift:13-41).

    ``grouped``: marshal for the grouped-traversal kernels instead —
    returns (tri_geo [12, P_gpad] zero-padded to a GROUP multiple,
    cam_vec, light_vec, sph, atab_t [P_pad128, NATTR] TRANSPOSED fetch
    table, shadow_geo [12, S_gpad] with only the ``occluders``-kept
    triangles packed dense). Zero padding columns produce den == 0 in the
    plane test, which the |den| >= 1e-12 guard rejects — they can never
    win a hit or occlude."""
    compiled = compile_scene(scene.triangles, lane_pad=1)
    tri = jnp.stack([
        compiled.n[:, 0], compiled.n[:, 1], compiled.n[:, 2], compiled.c0,
        compiled.s1[:, 0], compiled.s1[:, 1], compiled.s1[:, 2], compiled.c1,
        compiled.s2[:, 0], compiled.s2[:, 1], compiled.s2[:, 2], compiled.c2,
        compiled.diffuse[:, 0], compiled.diffuse[:, 1], compiled.diffuse[:, 2],
        compiled.is_emissive.astype(_F32),
        compiled.emissive[:, 0], compiled.emissive[:, 1],
        compiled.emissive[:, 2],
    ])  # [NROWS, T]

    cam = scene.camera
    res_x, res_y = config.resolution
    aspect = float(res_x // res_y) if config.integer_aspect else res_x / res_y
    half_width = jnp.tan(jnp.asarray(cam.horizontal_fov, _F32) / 2.0)
    half_height = half_width / _F32(aspect)
    u, v, w = smp.camera_basis(jnp.asarray(cam.direction, _F32),
                               jnp.asarray(cam.up, _F32))
    cam_vec = jnp.concatenate([
        jnp.asarray(cam.position, _F32), u * half_width, v * half_height, w,
    ]).reshape(1, 12)

    light = scene.light
    light_vec = jnp.concatenate([
        jnp.asarray(light.center, _F32).reshape(-1),
        jnp.asarray(light.color, _F32).reshape(-1),
    ]).reshape(1, 6)

    sp = scene.spheres
    if sp.num_spheres:
        sph = jnp.stack([
            sp.center[:, 0], sp.center[:, 1], sp.center[:, 2], sp.radius,
            sp.diffuse[:, 0], sp.diffuse[:, 1], sp.diffuse[:, 2],
            (jnp.linalg.norm(sp.emissive, axis=-1) > 0.0).astype(_F32),
            sp.emissive[:, 0], sp.emissive[:, 1], sp.emissive[:, 2],
        ])  # [SROWS, S]
    else:
        sph = jnp.zeros((SROWS, 1), _F32)  # placeholder; loops are empty

    # One-hot fetch table [NATTR, tris + spheres]: shading attributes per
    # primitive, column order matching the kernel's prim_f encoding
    # (triangles first, then spheres).
    n_t = scene.triangles.num_triangles
    zt = jnp.zeros((3, n_t), _F32)
    tri_cols = jnp.concatenate([
        tri[ROW_NX:ROW_NZ + 1],                      # normal
        tri[ROW_DR:ROW_DB + 1],                      # diffuse
        tri[ROW_ER:ROW_EB + 1],                      # emissive
        tri[ROW_ISEM:ROW_ISEM + 1],                  # is_emissive
        zt,                                          # sphere center (n/a)
    ], axis=0)  # [NATTR, T]
    if sp.num_spheres:
        zs = jnp.zeros((3, sp.num_spheres), _F32)
        sph_cols = jnp.concatenate([
            zs,                                      # normal (computed)
            sph[4:7],                                # diffuse
            sph[8:11],                               # emissive
            sph[7:8],                                # is_emissive
            sph[0:3],                                # center
        ], axis=0)  # [NATTR, S]
        atab = jnp.concatenate([tri_cols, sph_cols], axis=1)
    else:
        atab = tri_cols
    if not grouped:
        return tri, cam_vec, light_vec, sph, atab

    verts = jnp.asarray(scene.triangles.verts, _F32)
    tri_geo = pad_geo(tri[:12])                      # [12, P_gpad]
    aabb_main, sup_main = group_aabbs(verts)
    shadow_geo, aabb_shadow, sup_shadow = pack_shadow_tables(
        tri, verts, occluders, tri_geo, aabb_main, sup_main)
    n_pad = ((atab.shape[1] + PBLK - 1) // PBLK) * PBLK
    atab_t = jnp.pad(atab, ((0, 0), (0, n_pad - atab.shape[1]))).T
    return (tri_geo, cam_vec, light_vec, sph, atab_t, shadow_geo,
            aabb_main, sup_main, aabb_shadow, sup_shadow)


def pregen_draws_for(scene: Scene, config: RenderConfig, interpret=None):
    """Scene-aware ``pregen_draws``: applies the square-tile pixel
    permutation when the scene will render through the blocked grouped
    kernels, so externally hoisted draws line up with the trace kernel's
    tile layout. Always use this (not bare ``pregen_draws``) when the
    triangle count may exceed STATIC_UNROLL_MAX."""
    grouped = scene.triangles.num_triangles > STATIC_UNROLL_MAX
    off = pixel_rng_offsets(config)
    if use_blocked_tiles(config, grouped, False):
        off = to_blocked(off, config)
    gp = (((scene.triangles.num_triangles + SUPER * GROUP - 1)
           // (SUPER * GROUP)) * SUPER * GROUP) if grouped else 0
    return pregen_draws(config, off, interpret, grouped_prims=gp)


def pregen_draws(config: RenderConfig, local_offsets=None, interpret=None,
                 grouped_prims: int = 0):
    """Pregenerate the trace kernel's random draws (camera jitter +
    per-bounce NEE/cosine u-pairs) as tile-major planes — a pure function of
    (config, pixel offsets), hence STEP-INVARIANT across a training or
    benchmark loop. Pass the result to ``render_path_decoupled_fused(...,
    draws=...)`` to hoist ~14 radical-inverse tiles per sample out of every
    step (XLA's loop-invariant pass SINKS the pregen kernel into `lax.scan`
    bodies to save memory, so the hoist must be explicit). Returns the
    6-tuple (nee_u0, nee_u1, cos_u0, cos_u1, jitter_x, jitter_y)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if local_offsets is None:
        local_offsets = pixel_rng_offsets(config)
    n_local = local_offsets.shape[0]
    n_padded = ((n_local + TILE - 1) // TILE) * TILE
    offsets = jnp.pad(local_offsets,
                      (0, n_padded - n_local)).reshape(-1, LANES)
    # grouped_prims must match the consuming trace kernel's chunk choice
    # (the plane row layout IS the chunk size) — pregen_draws_for threads
    # it from the scene.
    s_chunk = _sample_chunk_for(config, False, grouped_prims=grouped_prims)
    n_schunks = config.spp // s_chunk
    grid = (n_padded // TILE, n_schunks)
    nsb = config.spp * config.bounces
    csb = s_chunk * config.bounces
    sb_plane = jax.ShapeDtypeStruct(
        ((n_padded // LANES) * nsb, LANES), jnp.float32)
    s_plane = jax.ShapeDtypeStruct(
        ((n_padded // LANES) * config.spp, LANES), jnp.float32)
    rec_ix = lambda i, j: (i * n_schunks + j, 0)
    sb_spec = pl.BlockSpec((RAY_SUB * csb, LANES), rec_ix,
                           memory_space=pltpu.VMEM)
    s_spec = pl.BlockSpec((RAY_SUB * s_chunk, LANES), rec_ix,
                          memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_draws_kernel, config, s_chunk),
        grid=grid,
        in_specs=[pl.BlockSpec((RAY_SUB, LANES), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(sb_spec, sb_spec, sb_spec, sb_spec, s_spec, s_spec),
        out_shape=(sb_plane, sb_plane, sb_plane, sb_plane,
                   s_plane, s_plane),
        interpret=interpret,
    )(offsets)


def _render_pallas_impl(scene: Scene, config: RenderConfig,
                        interpret=None, emit_records: bool = False,
                        raw_records: bool = False,
                        records_only: bool = False,
                        local_offsets=None, rid_base=None,
                        flat_output: bool = False, draws=None,
                        occluders=None, grouped=None):
    """Single-chip entry when local_offsets/rid_base are None; under
    shard_map, pass the shard's RNG-offset slice and its global first pixel
    id ([1, 1] i32) — outputs are then the shard's flat [local, 3] hdr.

    ``records_only`` (implies raw_records) drops the six random-draw planes
    from the record stream — the backward kernel regenerates the Halton
    draws in-VMEM instead (pallas_shade recompute_rng mode). This is what
    makes BASELINE config 5 fit: at 1024^2 x 256 spp x 3 bounces the f32
    draw planes alone are ~18 GB; the int32 records are 3.2 GB.

    ``grouped``: None = auto (triangle count > STATIC_UNROLL_MAX). The
    grouped kernels produce the same decisions and (f32) arithmetic as the
    static unroll — the mode only changes how the primitive loop is
    scheduled/compiled, so images are identical up to compilation-variance
    ulps (asserted in tests/test_grouped.py)."""
    if interpret is None:
        # Mosaic only targets TPU; interpret elsewhere so the same entry
        # point runs in CPU CI.
        interpret = jax.default_backend() != "tpu"
    n_pixels = config.num_pixels
    num_tris = scene.triangles.num_triangles
    num_spheres = scene.spheres.num_spheres
    assert num_tris + num_spheres + 1 < OCC_BIT, "record encoding limit"
    if grouped is None:
        grouped = num_tris > STATIC_UNROLL_MAX
    # Square-tile mapping: grouped, single-chip, divisible resolution, and
    # not the decoded-TraceAux mode (its decode assumes linear pixel order).
    blocked = use_blocked_tiles(config, grouped, local_offsets is not None) \
        and not (emit_records and not (raw_records or records_only))

    if grouped:
        (tri, cam_vec, light_vec, sph, atab, shadow_geo, aabb_main,
         sup_main, aabb_shadow, sup_shadow) = _pack_inputs(
             scene, config, grouped=True, occluders=occluders)
    else:
        tri, cam_vec, light_vec, sph, atab = _pack_inputs(scene, config)
        shadow_geo = aabb_main = sup_main = aabb_shadow = sup_shadow = None
    if local_offsets is None:
        local_offsets = pixel_rng_offsets(config)
        if blocked:
            local_offsets = to_blocked(local_offsets, config)
    if rid_base is None:
        rid_base = jnp.zeros((1, 1), _I32)
    n_local = local_offsets.shape[0]
    n_padded = ((n_local + TILE - 1) // TILE) * TILE
    offsets = jnp.pad(local_offsets, (0, n_padded - n_local)).reshape(-1, LANES)

    s_chunk = _sample_chunk_for(
        config, records_only,
        grouped_prims=tri.shape[1] if grouped else 0) if emit_records \
        else config.spp
    n_schunks = config.spp // s_chunk
    if emit_records:
        grid = (n_padded // TILE, n_schunks)
        tile_ix = lambda i, j: (i, 0)
        const_ix = lambda i, j: (0, 0)
        rec_ix = lambda i, j: (i * n_schunks + j, 0)
    else:
        grid = (n_padded // TILE,)
        tile_ix = lambda i: (i, 0)
        const_ix = lambda i: (0, 0)

    if occluders is not None:
        assert len(occluders) == num_tris, (len(occluders), num_tris)
        occluders = tuple(bool(x) for x in occluders)
    n_shadow = (sum(occluders) if occluders is not None else num_tris)
    # SMEM holds ~1 MB of scoped windows; a separate occluder-culled shadow
    # geometry table doubles the per-table cost, which overflows past ~7k
    # triangles (measured: 12.8k tris = 808K + 648K > 1 MB). Above the
    # budget (or when there is no cull) the shadow loop traverses the MAIN
    # table + AABBs instead — occlusion decisions are identical (the cull
    # only ever removes provably-non-occluding triangles); only the cull's
    # throughput win is given back at extreme scene sizes.
    share_shadow = grouped and (
        shadow_geo is tri
        or 64 * (tri.shape[1] + shadow_geo.shape[1]) > 900_000)
    kernel = partial(_path_kernel, config, n_pixels, num_tris, num_spheres,
                     emit_records, records_only, s_chunk,
                     None if grouped else occluders, grouped, n_shadow,
                     blocked, share_shadow)
    plane = jax.ShapeDtypeStruct((n_padded // LANES, LANES), _F32)
    out_specs = pl.BlockSpec((RAY_SUB, LANES), tile_ix,
                             memory_space=pltpu.VMEM)
    out_shapes = [plane, plane, plane]
    out_spec_list = [out_specs, out_specs, out_specs]
    draw_arrays = ()
    draw_specs = []
    if emit_records:
        nsb = config.spp * config.bounces
        csb = s_chunk * config.bounces
        sb_plane = jax.ShapeDtypeStruct(
            ((n_padded // LANES) * nsb, LANES), jnp.float32)
        sb_spec = pl.BlockSpec((RAY_SUB * csb, LANES), rec_ix,
                               memory_space=pltpu.VMEM)
        s_plane = jax.ShapeDtypeStruct(
            ((n_padded // LANES) * config.spp, LANES), jnp.float32)
        s_spec = pl.BlockSpec((RAY_SUB * s_chunk, LANES), rec_ix,
                              memory_space=pltpu.VMEM)
        # records per (sample, bounce): the int32 decision stream.
        # records_only regenerates the draws in the backward; otherwise the
        # draws are pregenerated ONCE (step-invariant) and read as inputs.
        out_shapes += [jax.ShapeDtypeStruct(
            ((n_padded // LANES) * nsb, LANES), jnp.int32)]
        out_spec_list += [sb_spec]
        if not records_only:
            if draws is not None:
                expect = [(sb_plane.shape, _F32)] * 4 + [(s_plane.shape,
                                                          _F32)] * 2
                got = [(tuple(d.shape), d.dtype) for d in draws]
                if len(draws) != 6 or any(
                        tuple(g[0]) != e[0] for g, e in zip(got, expect)):
                    raise ValueError(
                        "draws= does not match this (config, shard): expected"
                        f" plane shapes {[e[0] for e in expect]}, got"
                        f" {[g[0] for g in got]} — regenerate with"
                        " pallas_path.pregen_draws(config, local_offsets)")
            draw_arrays = tuple(draws) if draws is not None else \
                pregen_draws(config, local_offsets, interpret,
                             grouped_prims=tri.shape[1] if grouped else 0)
            draw_specs = [sb_spec] * 4 + [s_spec] * 2
    if draws is not None and (records_only or not emit_records):
        # A caller-supplied pregen that this mode cannot consume is a bug at
        # the call site (stale amortization assumptions) — fail loudly
        # instead of silently re-deriving the draws in-kernel (ADVICE r3).
        raise ValueError(
            "draws= was passed but this mode regenerates draws in-kernel "
            f"(records_only={records_only}, emit_records={emit_records}); "
            "drop the argument or disable records_only")
    if grouped:
        geo_specs = [
            pl.BlockSpec((12, tri.shape[1]), const_ix,
                         memory_space=pltpu.SMEM),    # triangle geometry
            pl.BlockSpec((SROWS, max(num_spheres, 1)), const_ix,
                         memory_space=pltpu.SMEM),    # spheres
            pl.BlockSpec(tuple(atab.shape), const_ix,
                         memory_space=pltpu.VMEM),    # transposed fetch table
        ]
        if share_shadow:
            # One geometry table for both loops (see share_shadow above).
            geo_specs += [
                pl.BlockSpec((6, aabb_main.shape[1]), const_ix,
                             memory_space=pltpu.SMEM),  # group AABBs
                pl.BlockSpec((6, sup_main.shape[1]), const_ix,
                             memory_space=pltpu.SMEM),  # super AABBs
            ]
            geo_args = (tri, sph, atab, aabb_main, sup_main)
        else:
            geo_specs += [
                pl.BlockSpec((12, shadow_geo.shape[1]), const_ix,
                             memory_space=pltpu.SMEM),  # packed shadow tris
                pl.BlockSpec((6, aabb_main.shape[1]), const_ix,
                             memory_space=pltpu.SMEM),  # group AABBs (closest)
                pl.BlockSpec((6, sup_main.shape[1]), const_ix,
                             memory_space=pltpu.SMEM),  # super AABBs (closest)
                pl.BlockSpec((6, aabb_shadow.shape[1]), const_ix,
                             memory_space=pltpu.SMEM),  # group AABBs (shadow)
                pl.BlockSpec((6, sup_shadow.shape[1]), const_ix,
                             memory_space=pltpu.SMEM),  # super AABBs (shadow)
            ]
            geo_args = (tri, sph, atab, shadow_geo, aabb_main, sup_main,
                        aabb_shadow, sup_shadow)
    else:
        geo_specs = [
            pl.BlockSpec((NROWS, num_tris), const_ix,
                         memory_space=pltpu.SMEM),    # triangles
            pl.BlockSpec((SROWS, max(num_spheres, 1)), const_ix,
                         memory_space=pltpu.SMEM),    # spheres
            pl.BlockSpec((NATTR, num_tris + num_spheres), const_ix,
                         memory_space=pltpu.VMEM),    # one-hot fetch table
        ]
        geo_args = (tri, sph, atab)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((RAY_SUB, LANES), tile_ix,
                         memory_space=pltpu.VMEM),        # offsets
            pl.BlockSpec((1, 1), const_ix,
                         memory_space=pltpu.SMEM),        # rid_base
            pl.BlockSpec((1, 12), const_ix,
                         memory_space=pltpu.SMEM),        # camera
            pl.BlockSpec((1, 6), const_ix,
                         memory_space=pltpu.SMEM),        # light
            *geo_specs,
            *draw_specs,
        ],
        out_specs=tuple(out_spec_list),
        out_shape=tuple(out_shapes),
        interpret=interpret,
    )(offsets, rid_base, cam_vec, light_vec, *geo_args, *draw_arrays)
    r, g, b = outs[:3]
    hdr = jnp.stack([r.reshape(-1), g.reshape(-1), b.reshape(-1)], axis=-1)
    if flat_output:
        hdr = hdr[:n_local]
    elif blocked:
        hdr = from_blocked(hdr[:n_local], config)
    else:
        hdr = hdr[:n_local].reshape(config.height, config.width, 3)
    if not emit_records:
        return hdr
    if raw_records or records_only:
        # Undecoded tile-major planes, exactly as the kernels wrote them —
        # consumed relayout-free by the hand-written backward kernel
        # (ops/pallas_shade.py) with identical BlockSpecs.
        return hdr, tuple(outs[3:]) + tuple(draw_arrays)

    # Decode per-(sample, bounce) planes: rows are
    # [tile, sample, bounce, RAY_SUB] x LANES; pixel id within a tile is
    # sub * LANES + lane.
    def sb(x):
        x = x.reshape(grid[0], config.spp, config.bounces, RAY_SUB * LANES)
        return jnp.moveaxis(x, 0, 2).reshape(
            config.spp, config.bounces, n_padded)[:, :, :n_local]

    def s(x):
        x = x.reshape(grid[0], config.spp, RAY_SUB * LANES)
        return jnp.moveaxis(x, 0, 1).reshape(
            config.spp, n_padded)[:, :n_local]

    rec, nee0, nee1, cos0, cos1 = (sb(o) for o in
                                   (outs[3],) + tuple(draw_arrays[:4]))
    jx, jy = (s(o) for o in draw_arrays[4:6])
    return hdr, TraceAux(records=rec, nee_u0=nee0, nee_u1=nee1,
                         cos_u0=cos0, cos_u1=cos1, jitter_x=jx, jitter_y=jy)


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def render_path_pallas(scene: Scene, config: RenderConfig) -> jnp.ndarray:
    """Variant-B path trace via the Pallas megakernel. Returns [H, W, 3] HDR.
    Differentiable: the backward re-traces with record emission and runs the
    hand-written Pallas backward (ops/pallas_shade.py) — kernel-speed
    gradients identical to oracle AD. Forward-only callers pay nothing for
    it; gradient callers pay one extra (record-emitting) trace, so steady
    -state training loops should call ``render_path_decoupled_fused``
    directly (one trace total)."""
    return _render_pallas_impl(scene, config)


def _fwd(scene, config):
    return _render_pallas_impl(scene, config), scene


def _bwd(config, scene, g):
    from .pallas_shade import render_path_decoupled_fused
    _, vjp = jax.vjp(lambda s: render_path_decoupled_fused(s, config), scene)
    return vjp(g)


render_path_pallas.defvjp(_fwd, _bwd)


def render_path_pallas_interpret(scene: Scene, config: RenderConfig):
    """Interpreter-mode run (CPU) for parity tests."""
    return _render_pallas_impl(scene, config, interpret=True)
