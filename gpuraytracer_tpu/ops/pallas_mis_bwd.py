"""Pallas backward for the variant-A MIS megakernel.

Round-1 status: the MIS kernel's forward ran at 8108 Mrays/s but its
custom-VJP backward replayed the *jnp oracle* (2.2 s at 30 samples) — a
~50x fwd/bwd mismatch on BASELINE's fwd+bwd metric. This module closes it
with the decoupled recipe from the variant-B path (ops/pallas_shade.py):

  1. The trace kernel (ops/pallas_mis.py, ``emit_records=True``) writes the
     integrator's discrete decisions per (camera ray, sample, pixel): the
     camera/cosine/VNDF closest-hit winners and the three light-probe
     visibility bits. Those are exactly what AD treats as piecewise constant.
  2. This backward kernel recomputes each sample's *continuous* math from
     the records entirely in VMEM — no ray-scene traversals, which is where
     the forward's FLOPs go — and reverse-sweeps it.

Unlike pallas_shade.py, the reverse sweep is NOT hand-derived: the
per-sample replay is a pure-jnp function on [RAY_SUB, 128] tiles mirroring
the forward kernel expression-for-expression, and the kernel calls
``jax.vjp`` on it *inside the kernel body*. The reverse of elementwise math
is elementwise math and the reverse of the one-hot attribute fetch is the
transposed one-hot matmul, so the whole cotangent computation lowers to
Mosaic like any other kernel code — exact AD gradients at kernel speed,
with the discrete structure (one-hots, masks) held outside the vjp.

Cotangent outputs per tile, accumulated across the (camera ray, sample)
loops and reduced once at the end:
  * per-primitive table [P, ndif]: normal xyz, plane c0, diffuse rgb,
    metallic, roughness (+ a discarded is_emissive row) — and, for sphere
    scenes, center xyz + radius (+ a discarded is_sphere row) — via one
    [P, TILE] @ [TILE, ndif] one-hot MXU matmul per fetch site;
  * camera (12) and light (17) scalars as running partial-sum planes.

Scope: triangle AND sphere scenes. Sphere lanes replay the analytic
quadratic t(center, radius) and the point normal (hit − center)/‖·‖ inside
the vjp'd closure, so center/radius cotangents come out of the same
in-kernel AD as everything else (the discrete is_sphere select and the
recorded winner stay piecewise-constant). References being differentiated:
Sources/gpuRaytracer/shaders.metal:543-707 (MIS integrator),
Sources/gpuRaytracer/shaders_old.metal:108-136 (analytic sphere).
"""
from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import sampling as smp
from ..intersect import compile_scene
from ..types import RenderConfig, Scene
from .pallas_mis import (
    DEBUG_STRATEGY_MASK, LANES, NTAB, RAY_SUB, TILE,
    TAB_CSU0, TAB_CSU1, TAB_CU0, TAB_CU1, TAB_LU0, TAB_LU1,
    TAB_VSU0, TAB_VSU1, TAB_VU0, TAB_VU1,
    _brdf, _cosine_pdf, _cross3, _dot3, _hash_u32, _normalize3,
    _ortho_basis, _power_heuristic_3, _render_mis_impl, _u32_to_f32,
    _vndf_pdf,
)

_F32 = jnp.float32
_U32 = jnp.uint32
_I32 = jnp.int32
PI = math.pi

# Differentiable per-primitive table rows: n(3), c0, diffuse(3), metallic,
# roughness, is_emissive (the last is only compared against 0.5, so its
# cotangent is structurally zero and gets dropped host-side). Sphere scenes
# append center(3), radius, is_sphere (selector, cotangent likewise zero).
NDIF = 10
NDIF_SPH = 15
NCAM = 12
NLIGHT = 17
NSCAL = NCAM + NLIGHT
RAY_TMIN = 1e-3
RAY_TMAX = 1e3


def _mis_bwd_kernel(config: RenderConfig, n_pixels: int, n_prims: int,
                    num_spheres: int,
                    g_r_ref, g_g_ref, g_b_ref, crec_ref, srec_ref,
                    tab_ref, cam_ref, light_ref, stab_ref,
                    dtab_ref, dscal_ref):
    """One (ray tile, camera ray) grid step: replay every sample from the
    records and accumulate parameter cotangents via in-kernel jax.vjp.

    The vjp is split per strategy (three vjp calls per sample) so the
    residual stack Mosaic must keep live during each reverse sweep is one
    strategy's intermediates, not the whole sample's — the single-vjp
    version overflowed the 16 MB VMEM scoped allocation."""
    W = config.width
    H = config.height
    P = n_prims
    ndif = NDIF_SPH if num_spheres else NDIF
    s_per = config.mis_samples // 3

    pid = pl.program_id(0)
    cr_i = pl.program_id(1)  # camera-ray index
    sub = jax.lax.broadcasted_iota(_I32, (RAY_SUB, LANES), 0)
    lanei = jax.lax.broadcasted_iota(_I32, (RAY_SUB, LANES), 1)
    rid = pid * TILE + sub * LANES + lanei
    pxi = rid % W
    pyi = rid // W
    px = pxi.astype(_F32)
    py = pyi.astype(_F32)
    in_image = rid < n_pixels

    g3 = (g_r_ref[...], g_g_ref[...], g_b_ref[...])
    zero = px * 0.0

    cam12 = [cam_ref[0, k] for k in range(NCAM)]
    light17 = [light_ref[0, k] for k in range(NLIGHT)]
    # Broadcast the scalar parameters to planes BEFORE the vjp so their
    # cotangents come back as planes (partial sums deferred to one final
    # reduction per tile instead of 29 scalar reductions per sample).
    camp0 = tuple(zero + c for c in cam12)
    lightp0 = tuple(zero + c for c in light17)

    # Exact ONE-PASS fetch via the bf16 chunk-split (see pallas_shade.py:
    # t0 = bf16(t), t1 = bf16(t - t0), t2 = the exact remainder — stacked
    # along the output dim, one DEFAULT matmul, fold reconstructs f32
    # exactly in any order) — 1/6 the MXU passes of the HIGHEST fetch.
    tabv = tab_ref[...]  # [ndif, P]
    t0_ = tabv.astype(jnp.bfloat16).astype(_F32)
    r1_ = tabv - t0_
    t1_ = r1_.astype(jnp.bfloat16).astype(_F32)
    tab9 = jnp.concatenate([t0_, t1_, r1_ - t1_], axis=0)  # [3*ndif, P]
    p_iota = jax.lax.broadcasted_iota(_I32, (P, TILE), 0)

    def fetch(code):
        """code (prim + 1, 0 = miss) -> (hit, onehot [P, TILE],
        at [ndif, RAY_SUB, LANES]). Exact chunk-split one-hot MXU fetch."""
        prim = code - 1
        pc = jnp.clip(prim, 0, P - 1)
        onehot = (p_iota == pc.reshape(1, TILE)).astype(_F32)
        at9 = jax.lax.dot_general(
            tab9, onehot, (((1,), (0,)), ((), ())),
            preferred_element_type=_F32,
            precision=jax.lax.Precision.DEFAULT)  # [3*ndif, TILE]
        at = at9[:ndif] + at9[ndif:2 * ndif] + at9[2 * ndif:]
        return prim >= 0, onehot, at.reshape(ndif, RAY_SUB, LANES)

    def accum_tab(dtab_acc, onehot, d_at):
        """Cotangent accumulation with the THREE-chunk bf16 split: every
        f32 splits exactly into 3 bf16 chunks, the one-hot is 0/1, and the
        MXU accumulates in f32 — HIGHEST-equivalent accuracy at half its
        passes. (The round-3 two-chunk variant truncated the residual to
        <=2^-18 rel per partial; the round-4 TPU-hardware parity tier
        measured that near-cancelling partials amplify exactly that
        truncation — see pallas_shade.py's matching note.)"""
        d = d_at.reshape(ndif, TILE)
        p0 = d.astype(jnp.bfloat16).astype(_F32)
        pr = d - p0
        p1 = pr.astype(jnp.bfloat16).astype(_F32)
        planes9 = jnp.concatenate([p0, p1, pr - p1], axis=0)  # [3*ndif, T]
        part = jax.lax.dot_general(
            onehot, planes9, (((1,), (1,)), ((), ())),
            preferred_element_type=_F32,
            precision=jax.lax.Precision.DEFAULT)  # [P, 3*ndif]
        return dtab_acc + (part[:, :ndif] + part[:, ndif:2 * ndif]
                           + part[:, 2 * ndif:])

    def sphere_t(at_, ox, oy, oz, dx, dy, dz, tt_plane):
        """Select the analytic sphere root on is_sphere lanes (mirrors
        _mis_kernel.sphere_roots op-for-op => bit-equal t replay). No-op
        for triangle-only scenes."""
        if not num_spheres:
            return tt_plane
        is_sph = at_[14] > 0.5
        ocx, ocy, ocz = ox - at_[10], oy - at_[11], oz - at_[12]
        a_q = dx * dx + dy * dy + dz * dz
        b_q = 2.0 * (ocx * dx + ocy * dy + ocz * dz)
        c_q = (ocx * ocx + ocy * ocy + ocz * ocz) - at_[13] * at_[13]
        disc = b_q * b_q - 4.0 * a_q * c_q
        posd = disc > 0.0
        sq = jnp.sqrt(jnp.where(posd, disc, 1.0))
        t1 = (-b_q - sq) / (2.0 * a_q)
        t2 = (-b_q + sq) / (2.0 * a_q)
        t1_ok = (t1 > RAY_TMIN) & (t1 < RAY_TMAX)
        return jnp.where(is_sph, jnp.where(t1_ok, t1, t2), tt_plane)

    def sphere_normal(at_, p_x, p_y, p_z, active, nh3):
        """Point normal (p − center)/‖·‖ on active sphere lanes (mirrors
        _mis_kernel.closest_full's post-loop normal select)."""
        if not num_spheres:
            return nh3
        sel = active & (at_[14] > 0.5)
        nvx, nvy, nvz = p_x - at_[10], p_y - at_[11], p_z - at_[12]
        inv = jax.lax.rsqrt(jnp.maximum(
            nvx * nvx + nvy * nvy + nvz * nvz, 1e-6))
        return (jnp.where(sel, nvx * inv, nh3[0]),
                jnp.where(sel, nvy * inv, nh3[1]),
                jnp.where(sel, nvz * inv, nh3[2]))

    m1, m2, m3 = (_F32(1.0) if on else _F32(0.0)
                  for on in DEBUG_STRATEGY_MASK)
    inv_s = _F32(1.0 / s_per)

    # hashRandom jitter (non-differentiable; mirrors the trace kernel).
    xi = pxi.astype(_U32)
    yi = pyi.astype(_U32)
    iu = jnp.full((), 0, _U32) + cr_i.astype(_U32)
    sample_id = (yi * _U32(800) + xi) * iu
    jx = _u32_to_f32(_hash_u32(xi + yi * _U32(800) + sample_id))
    jy = _u32_to_f32(_hash_u32(yi + xi * _U32(600) + sample_id
                               + _U32(12345)))

    crec = crec_ref[...]
    cam_hit, onehot_cam, at_cam = fetch(crec)
    cam_hit = cam_hit & in_image
    isem_cam = at_cam[9] > 0.5
    cam_hit_light = cam_hit & isem_cam
    surf = cam_hit & ~isem_cam

    # ---- Differentiable replay pieces (mirror _mis_kernel's math with the
    # discrete decisions closed over; all take their diff inputs as args).

    def cam_stage(at_cam_, camp_):
        """Camera ray + camera-hit surface from the recorded winner's plane
        equation (same expression as the closest-hit loop => bit-equal t)."""
        pos, uhw, vhh, wv = (camp_[0:3], camp_[3:6], camp_[6:9], camp_[9:12])
        s = ((px + jx) / _F32(W)) * 2.0 - 1.0
        t = -(((py + jy) / _F32(H)) * 2.0 - 1.0)
        dx = s * uhw[0] + t * vhh[0] - wv[0]
        dy = s * uhw[1] + t * vhh[1] - wv[1]
        dz = s * uhw[2] + t * vhh[2] - wv[2]
        dx, dy, dz = _normalize3(dx, dy, dz)
        ox, oy, oz = pos[0], pos[1], pos[2]
        nhx, nhy, nhz = at_cam_[0], at_cam_[1], at_cam_[2]
        c0 = at_cam_[3]
        den = dx * nhx + dy * nhy + dz * nhz
        ok = jnp.abs(den) >= 1e-12
        tt = (c0 - (ox * nhx + oy * nhy + oz * nhz)) \
            / jnp.where(ok, den, 1.0)
        tt = sphere_t(at_cam_, ox, oy, oz, dx, dy, dz, tt)
        t_safe = jnp.where(surf, tt, 0.0)
        p_x = ox + dx * t_safe
        p_y = oy + dy * t_safe
        p_z = oz + dz * t_safe
        nhx, nhy, nhz = sphere_normal(at_cam_, p_x, p_y, p_z, surf,
                                      (nhx, nhy, nhz))
        return (dx, dy, dz, p_x, p_y, p_z,
                nhx, nhy, nhz,
                at_cam_[4], at_cam_[5], at_cam_[6],   # diffuse
                at_cam_[7], at_cam_[8])               # metallic, roughness

    def square_light_pdf(lightp_, q_x, q_y, q_z, sdx, sdy, sdz):
        lcx, lcy, lcz = lightp_[0:3]
        lnx, lny, lnz = lightp_[8:11]
        tox = lcx - q_x
        toy = lcy - q_y
        toz = lcz - q_z
        dist2 = tox * tox + toy * toy + toz * toz
        cos_t = jnp.maximum(0.0, -(sdx * lnx + sdy * lny + sdz * lnz))
        return dist2 / (lightp_[6] * lightp_[7] * cos_t + 1e-6)

    def direct_light(lightp_, q_x, q_y, q_z, nx, ny, nz, inx, iny, inz,
                     mr, mg, mb, mmet, mrgh, u0, u1, reach, active,
                     use_heuristic):
        lcx, lcy, lcz = lightp_[0:3]
        ler, leg, leb = lightp_[3:6]
        lw, ld = lightp_[6], lightp_[7]
        ltx, lty, ltz = lightp_[11:14]
        lbx, lby, lbz = lightp_[14:17]
        oxx = q_x + nx * 1e-4
        oyy = q_y + ny * 1e-4
        ozz = q_z + nz * 1e-4
        sx = lcx + ltx * ((u0 - 0.5) * lw) + lbx * ((u1 - 0.5) * ld)
        sy = lcy + lty * ((u0 - 0.5) * lw) + lby * ((u1 - 0.5) * ld)
        sz = lcz + ltz * ((u0 - 0.5) * lw) + lbz * ((u1 - 0.5) * ld)
        tox, toy, toz = sx - oxx, sy - oyy, sz - ozz
        dist = jnp.sqrt(jnp.maximum(
            tox * tox + toy * toy + toz * toz, 1e-30))
        ldx, ldy, ldz = tox / dist, toy / dist, toz / dist
        pdf_l = square_light_pdf(lightp_, q_x, q_y, q_z, ldx, ldy, ldz)
        hit_light = active & reach
        vx, vy, vz = -inx, -iny, -inz
        br, bg, bb = _brdf(vx, vy, vz, nx, ny, nz, mr, mg, mb,
                           mmet, mrgh, ldx, ldy, ldz)
        inv_pdf = 1.0 / pdf_l
        cr = br * ler * inv_pdf
        cg = bg * leg * inv_pdf
        cb = bb * leb * inv_pdf
        if use_heuristic:
            pdf_c = _cosine_pdf(nx, ny, nz, ldx, ldy, ldz)
            pdf_v = _vndf_pdf(vx, vy, vz, nx, ny, nz, ldx, ldy, ldz, mrgh)
            w = _power_heuristic_3(pdf_l, pdf_c, pdf_v, _F32(s_per))
            cr, cg, cb = cr * w, cg * w, cb * w
        z = cr * 0.0
        return (jnp.where(hit_light, cr, z),
                jnp.where(hit_light, cg, z),
                jnp.where(hit_light, cb, z))

    def bounce_strategy(lightp_, cs, at2, hit2, sec_reach, sdx, sdy, sdz,
                        pdf_self, w, su0, su1):
        (dx, dy, dz, p_x, p_y, p_z, nhx, nhy, nhz,
         dfr, dfg, dfb, met, rgh) = cs
        ler, leg, leb = lightp_[3:6]
        oxx = p_x + nhx * 1e-4
        oyy = p_y + nhy * 1e-4
        ozz = p_z + nhz * 1e-4
        n2x, n2y, n2z = at2[0], at2[1], at2[2]
        c02 = at2[3]
        den2 = sdx * n2x + sdy * n2y + sdz * n2z
        ok2 = jnp.abs(den2) >= 1e-12
        t2 = (c02 - (oxx * n2x + oyy * n2y + ozz * n2z)) \
            / jnp.where(ok2, den2, 1.0)
        t2 = sphere_t(at2, oxx, oyy, ozz, sdx, sdy, sdz, t2)

        vx, vy, vz = -dx, -dy, -dz
        br, bg, bb = _brdf(vx, vy, vz, nhx, nhy, nhz,
                           dfr, dfg, dfb, met, rgh, sdx, sdy, sdz)
        # Double-where reciprocal (mirrors the trace kernel / oracle —
        # pdf == 0 on roughness-0 lanes must yield a 0 term, not 0 * inf).
        pdf_ok = pdf_self > 0.0
        inv_pdf = jnp.where(pdf_ok, 1.0 / jnp.where(pdf_ok, pdf_self, 1.0),
                            0.0)

        hit_light = surf & hit2 & (at2[9] > 0.5)
        ltr = w * br * ler * inv_pdf
        ltg = w * bg * leg * inv_pdf
        ltb = w * bb * leb * inv_pdf

        hit_geo = surf & hit2 & (at2[9] <= 0.5)
        t2_safe = jnp.where(hit_geo, t2, 0.0)
        bpx = oxx + sdx * t2_safe
        bpy = oyy + sdy * t2_safe
        bpz = ozz + sdz * t2_safe
        n2x, n2y, n2z = sphere_normal(at2, bpx, bpy, bpz, hit_geo,
                                      (n2x, n2y, n2z))
        sr, sg, sb = direct_light(
            lightp_, bpx, bpy, bpz, n2x, n2y, n2z, sdx, sdy, sdz,
            at2[4], at2[5], at2[6], at2[7], at2[8], su0, su1,
            sec_reach, hit_geo, False)
        gr = br * inv_pdf * sr
        gg = bg * inv_pdf * sg
        gb = bb * inv_pdf * sb
        z = ltr * 0.0
        return (jnp.where(hit_light, ltr, z) + jnp.where(hit_geo, gr, z),
                jnp.where(hit_light, ltg, z) + jnp.where(hit_geo, gg, z),
                jnp.where(hit_light, ltb, z) + jnp.where(hit_geo, gb, z))

    def gated(rgb, m):
        return tuple(jnp.where(surf, c * (m * inv_s), 0.0) for c in rgb)

    def strategy1(tabsc, reach1, cs, lightp_):
        (dx, dy, dz, p_x, p_y, p_z, nhx, nhy, nhz,
         dfr, dfg, dfb, met, rgh) = cs
        rgb = direct_light(
            lightp_, p_x, p_y, p_z, nhx, nhy, nhz, dx, dy, dz,
            dfr, dfg, dfb, met, rgh, tabsc[TAB_LU0], tabsc[TAB_LU1],
            reach1, surf, True)
        return gated(rgb, m1)

    def strategy2(tabsc, reach2, hit_c, cs, at_c_, lightp_):
        (dx, dy, dz, p_x, p_y, p_z, nhx, nhy, nhz,
         dfr, dfg, dfb, met, rgh) = cs
        vx, vy, vz = -dx, -dy, -dz
        tx, ty, tz, bx, by, bz = _ortho_basis(nhx, nhy, nhz)
        phi = _F32(2.0 * PI) * tabsc[TAB_CU0]
        cth = jnp.sqrt(jnp.full((), 0.0, _F32) + tabsc[TAB_CU1])
        sth = jnp.sqrt(jnp.maximum(1.0 - tabsc[TAB_CU1], 0.0))
        cp, sp = jnp.cos(phi), jnp.sin(phi)
        cdx, cdy, cdz = _normalize3(
            tx * (cp * sth) + bx * (sp * sth) + nhx * cth,
            ty * (cp * sth) + by * (sp * sth) + nhy * cth,
            tz * (cp * sth) + bz * (sp * sth) + nhz * cth)
        pdf_c = _cosine_pdf(nhx, nhy, nhz, cdx, cdy, cdz)
        pdf_l = square_light_pdf(lightp_, p_x, p_y, p_z, cdx, cdy, cdz)
        pdf_v = _vndf_pdf(vx, vy, vz, nhx, nhy, nhz, cdx, cdy, cdz, rgh)
        w_c = _power_heuristic_3(pdf_c, pdf_l, pdf_v, _F32(s_per))
        rgb = bounce_strategy(lightp_, cs, at_c_, hit_c, reach2,
                              cdx, cdy, cdz, pdf_c, w_c,
                              tabsc[TAB_CSU0], tabsc[TAB_CSU1])
        return gated(rgb, m2)

    def strategy3(tabsc, reach3, hit_v, cs, at_v_, lightp_):
        (dx, dy, dz, p_x, p_y, p_z, nhx, nhy, nhz,
         dfr, dfg, dfb, met, rgh) = cs
        vx, vy, vz = -dx, -dy, -dz
        tx, ty, tz, bx, by, bz = _ortho_basis(nhx, nhy, nhz)
        alpha = rgh * rgh
        vtx = _dot3(vx, vy, vz, tx, ty, tz)
        vtb = _dot3(vx, vy, vz, bx, by, bz)
        vtn = _dot3(vx, vy, vz, nhx, nhy, nhz)
        vex, vey, vez = _normalize3(alpha * vtx, alpha * vtb, vtn)
        t1x, t1y, t1z = _normalize3(vez, vez * 0.0, -vex)
        t2x, t2y, t2z = _cross3(vex, vey, vez, t1x, t1y, t1z)
        vphi = _F32(2.0 * PI) * tabsc[TAB_VU0]
        ctm = _F32(1.0 / math.sqrt(2.0))
        vct = ctm + (1.0 - ctm) * tabsc[TAB_VU1]
        vst = jnp.sqrt(jnp.maximum(0.0, 1.0 - vct * vct))
        vcp, vsp = jnp.cos(vphi), jnp.sin(vphi)
        hx_, hy_, hz_ = _normalize3(
            t1x * (vcp * vst) + t2x * (vsp * vst) + vex * vct,
            t1y * (vcp * vst) + t2y * (vsp * vst) + vey * vct,
            t1z * (vcp * vst) + t2z * (vsp * vst) + vez * vct)
        nhx_, nhy_, nhz_ = _normalize3(
            alpha * hx_, alpha * hy_, jnp.maximum(0.0, hz_))
        whx = tx * nhx_ + bx * nhy_ + nhx * nhz_
        why = ty * nhx_ + by * nhy_ + nhy * nhz_
        whz = tz * nhx_ + bz * nhy_ + nhz * nhz_
        whx, why, whz = _normalize3(whx, why, whz)
        ddh = _dot3(dx, dy, dz, whx, why, whz)
        vdx = dx - 2.0 * ddh * whx
        vdy = dy - 2.0 * ddh * why
        vdz = dz - 2.0 * ddh * whz
        pdf_v2 = _vndf_pdf(vx, vy, vz, nhx, nhy, nhz, vdx, vdy, vdz, rgh)
        pdf_l2 = square_light_pdf(lightp_, p_x, p_y, p_z, vdx, vdy, vdz)
        pdf_c2 = _cosine_pdf(nhx, nhy, nhz, vdx, vdy, vdz)
        w_v = _power_heuristic_3(pdf_v2, pdf_l2, pdf_c2, _F32(s_per))
        rgb = bounce_strategy(lightp_, cs, at_v_, hit_v, reach3,
                              vdx, vdy, vdz, pdf_v2, w_v,
                              tabsc[TAB_VSU0], tabsc[TAB_VSU1])
        return gated(rgb, m3)

    # The camera stage is SAMPLE-INVARIANT: run its forward + linearization
    # ONCE per (tile, camera ray), thread its outputs ``cs`` into the
    # strategy vjps as a differentiable input, and apply its vjp once to
    # the sample-accumulated cs-cotangents at the end (vjps are linear in
    # the cotangent, so this is exactly the same gradient at 1/s_per the
    # camera-stage work and far fewer live residuals per strategy sweep).
    cs, vjp_cam_stage = jax.vjp(cam_stage, at_cam, camp0)

    def one_sample(s_i32, carry):
        d_cs, dtab_acc, dlightp = carry
        tabsc = [stab_ref[k, s_i32] for k in range(NTAB)]
        srec = srec_ref[pl.ds(s_i32 * RAY_SUB, RAY_SUB), :]
        reach1 = (srec & 1) == 1
        reach2 = ((srec >> 1) & 1) == 1
        reach3 = ((srec >> 2) & 1) == 1
        code_c = (srec >> 3) & 1023
        code_v = (srec >> 13) & 1023
        hit_c, onehot_c, at_c = fetch(code_c)
        hit_v, onehot_v, at_v = fetch(code_v)

        _, vjp1 = jax.vjp(partial(strategy1, tabsc, reach1),
                          cs, lightp0)
        dcs1, dl1 = vjp1(g3)
        _, vjp2 = jax.vjp(partial(strategy2, tabsc, reach2, hit_c),
                          cs, at_c, lightp0)
        dcs2, d_at_c, dl2 = vjp2(g3)
        _, vjp3 = jax.vjp(partial(strategy3, tabsc, reach3, hit_v),
                          cs, at_v, lightp0)
        dcs3, d_at_v, dl3 = vjp3(g3)

        d_cs = tuple(a + b + c + d
                     for a, b, c, d in zip(d_cs, dcs1, dcs2, dcs3))
        for onehot, d_at in ((onehot_c, d_at_c), (onehot_v, d_at_v)):
            dtab_acc = accum_tab(dtab_acc, onehot, d_at)
        dlightp = tuple(a + b + c + d
                        for a, b, c, d in zip(dlightp, dl1, dl2, dl3))
        return d_cs, dtab_acc, dlightp

    # Camera-ray-hits-light term: acc += where(chl, emitted_radiance); its
    # only cotangent is d(emitted_radiance) — hand-accumulated.
    zlight = [zero for _ in range(NLIGHT)]
    for c in range(3):
        zlight[3 + c] = jnp.where(cam_hit_light, g3[c], 0.0)

    dtab0 = jnp.zeros((P, ndif), _F32)
    d_cs0 = tuple(zero for _ in range(len(cs)))
    d_cs, dtab_acc, dlightp = jax.lax.fori_loop(
        0, s_per, one_sample, (d_cs0, dtab0, tuple(zlight)))

    d_at_cam, dcamp = vjp_cam_stage(d_cs)
    dtab_acc = accum_tab(dtab_acc, onehot_cam, d_at_cam)

    @pl.when((pid == 0) & (cr_i == 0))
    def _():
        dtab_ref[...] = jnp.zeros_like(dtab_ref)
        dscal_ref[...] = jnp.zeros_like(dscal_ref)

    dtab_ref[...] += dtab_acc
    scal_row = jnp.concatenate(
        [jnp.sum(p).reshape(1, 1) for p in (dcamp + dlightp)], axis=1)
    dscal_ref[...] += scal_row


def _bwd_pallas(config: RenderConfig, n_prims: int, num_spheres: int,
                g_planes, recs, tab, cam_vec, light_vec, stab,
                interpret: bool):
    n_pixels = config.num_pixels
    n_padded = ((n_pixels + TILE - 1) // TILE) * TILE
    cr_n = config.camera_rays
    s_per = config.mis_samples // 3
    grid = (n_padded // TILE, cr_n)
    ndif = NDIF_SPH if num_spheres else NDIF

    ray_spec = pl.BlockSpec((RAY_SUB, LANES), lambda i, j: (i, 0),
                            memory_space=pltpu.VMEM)
    kernel = partial(_mis_bwd_kernel, config, n_pixels, n_prims,
                     num_spheres)
    dtab, dscal = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            ray_spec, ray_spec, ray_spec,                    # g r/g/b
            pl.BlockSpec((RAY_SUB, LANES),
                         lambda i, j: (i * cr_n + j, 0),
                         memory_space=pltpu.VMEM),           # camera records
            pl.BlockSpec((RAY_SUB * s_per, LANES),
                         lambda i, j: (i * cr_n + j, 0),
                         memory_space=pltpu.VMEM),           # sample records
            pl.BlockSpec((ndif, n_prims), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),           # diff table
            pl.BlockSpec((1, NCAM), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),           # camera
            pl.BlockSpec((1, NLIGHT), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),           # light
            pl.BlockSpec((NTAB, s_per), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),           # sample tables
        ],
        out_specs=(
            pl.BlockSpec((n_prims, ndif), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NSCAL), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(jax.ShapeDtypeStruct((n_prims, ndif), _F32),
                   jax.ShapeDtypeStruct((1, NSCAL), _F32)),
        interpret=interpret,
    )(*g_planes, *recs, tab, cam_vec, light_vec, stab)
    return dtab, dscal


# ---------------------------------------------------------------------------
# custom_vjp wrapper: forward = the MIS trace kernel's own hdr (identity);
# backward = the kernel above.
# ---------------------------------------------------------------------------

@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _attach_grad_mis(config: RenderConfig, interpret, hdr, tab, cam_vec,
                     light_vec, stab, recs):
    return hdr


def _attach_fwd(config, interpret, hdr, tab, cam_vec, light_vec, stab,
                recs):
    return hdr, (tab, cam_vec, light_vec, stab, recs)


def _attach_bwd(config, interpret, resids, g):
    import numpy as np
    tab, cam_vec, light_vec, stab, recs = resids
    n_prims = tab.shape[1]
    num_spheres = 1 if tab.shape[0] == NDIF_SPH else 0
    n_pixels = config.num_pixels
    n_padded = ((n_pixels + TILE - 1) // TILE) * TILE

    gs = g.reshape(-1, 3)
    gs = jnp.pad(gs, ((0, n_padded - n_pixels), (0, 0)))
    g_planes = tuple(gs[:, c].reshape(-1, LANES) for c in range(3))

    dtab, dscal = _bwd_pallas(config, n_prims, num_spheres, g_planes, recs,
                              tab, cam_vec, light_vec, stab, interpret)
    d_tab = dtab.T              # [ndif, P]; is_em/is_sphere rows are zero
    d_cam = dscal[:, 0:NCAM]
    d_light = dscal[:, NCAM:NSCAL]
    d_stab = jnp.zeros_like(stab)        # stop-gradient'd RNG draws
    d_recs = jax.tree.map(
        lambda x: np.zeros(x.shape, jax.dtypes.float0), recs)
    return g, d_tab, d_cam, d_light, d_stab, d_recs


_attach_grad_mis.defvjp(_attach_fwd, _attach_bwd)


def _pack_diff_inputs_mis(scene: Scene, config: RenderConfig):
    """Differentiable jnp packing of the backward kernel's parameter views —
    cotangents chain back to the scene pytree (verts via compile_scene,
    camera via camera_basis, light frame via build_orthonormal_basis,
    sphere center/radius directly). Column order matches the trace kernel's
    record encoding: triangles first, then spheres."""
    compiled = compile_scene(scene.triangles, lane_pad=1)
    tab = jnp.stack([
        compiled.n[:, 0], compiled.n[:, 1], compiled.n[:, 2], compiled.c0,
        compiled.diffuse[:, 0], compiled.diffuse[:, 1], compiled.diffuse[:, 2],
        compiled.metallic, compiled.roughness,
        compiled.is_emissive.astype(_F32),
    ])  # [NDIF, T]
    sp = scene.spheres
    if sp.num_spheres:
        n_t = scene.triangles.num_triangles
        n_s = sp.num_spheres
        sph_is_em = (jnp.linalg.norm(sp.emissive, axis=-1)
                     > 0.0).astype(_F32)
        sph_cols = jnp.concatenate([
            jnp.zeros((4, n_s), _F32),               # n, c0 (computed)
            sp.diffuse.T,
            sp.metallic.reshape(1, -1), sp.roughness.reshape(1, -1),
            sph_is_em.reshape(1, -1),
        ], axis=0)                                   # [NDIF, S]
        extra = jnp.concatenate([                    # rows 10-14
            jnp.zeros((5, n_t), _F32),
            jnp.concatenate([sp.center.T, sp.radius.reshape(1, -1),
                             jnp.ones((1, n_s), _F32)], axis=0),
        ], axis=1)                                   # [5, T + S]
        tab = jnp.concatenate(
            [jnp.concatenate([tab, sph_cols], axis=1), extra],
            axis=0)                                  # [NDIF_SPH, T + S]

    cam = scene.camera
    res_x, res_y = config.resolution
    aspect = float(res_x // res_y) if config.integer_aspect else res_x / res_y
    half_width = jnp.tan(jnp.asarray(cam.horizontal_fov, _F32) / 2.0)
    half_height = half_width / _F32(aspect)
    u, v, w = smp.camera_basis(jnp.asarray(cam.direction, _F32),
                               jnp.asarray(cam.up, _F32))
    cam_vec = jnp.concatenate([
        jnp.asarray(cam.position, _F32), u * half_width, v * half_height, w,
    ]).reshape(1, NCAM)

    light = scene.light
    lnorm = jnp.asarray(light.normal, _F32)
    lt, lb = smp.build_orthonormal_basis(lnorm)
    light_vec = jnp.concatenate([
        jnp.asarray(light.center, _F32).reshape(-1),
        jnp.asarray(light.emitted_radiance, _F32).reshape(-1),
        jnp.asarray(light.width, _F32).reshape(1),
        jnp.asarray(light.depth, _F32).reshape(1),
        lnorm.reshape(-1), lt.reshape(-1), lb.reshape(-1),
    ]).reshape(1, NLIGHT)
    return tab, cam_vec, light_vec


def _sample_tables(config: RenderConfig):
    """The kernel's pixel-independent sample tables [NTAB, s_per] — the
    same shared rows the forward kernel and oracle use."""
    return smp.mis_sample_table_rows(config.mis_samples, config.sampler)


def render_mis_fused(scene: Scene, config: RenderConfig,
                     interpret=None, occluders=None) -> jnp.ndarray:
    """Variant-A differentiable MIS render at megakernel speed: the trace
    kernel's hdr with the record-replay Pallas backward attached. Handles
    triangle and sphere scenes (sphere lanes replay the analytic quadratic
    inside the in-kernel vjp — center/radius gradients at kernel speed).
    Returns [H, W, 3] raw accumulated HDR. ``occluders``: optional
    ``intersect.potential_occluders(scene, config)`` static tuple culling
    provably-non-occluding triangles from the light probes."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    hdr, recs = _render_mis_impl(jax.lax.stop_gradient(scene), config,
                                 interpret=interpret, emit_records=True,
                                 occluders=occluders)
    tab, cam_vec, light_vec = _pack_diff_inputs_mis(scene, config)
    stab = _sample_tables(config)
    return _attach_grad_mis(config, interpret, hdr, tab, cam_vec, light_vec,
                            stab, tuple(recs))


def render_mis_decoupled(scene: Scene, config: RenderConfig,
                         occluders=None) -> jnp.ndarray:
    """Fast differentiable variant-A render: the trace kernel forward with
    the record-replay Pallas backward, for every scene type. Value matches
    the megakernel/oracle; gradients match jax.grad of the oracle."""
    return render_mis_fused(scene, config, occluders=occluders)
