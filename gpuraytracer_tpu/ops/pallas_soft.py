"""Silhouette (visibility-edge) gradients at kernel speed — VERDICT r3 #2.

``grad/diff_render.render_direct_soft`` is the edge-aware direct-lighting
renderer: its VALUE is the hard render exactly, but its gradients include
the sphere-silhouette boundary term via the forward-exact / backward-soft
coverage trick (alpha = hard + soft - stop_grad(soft)). It is pure jnp —
the one estimator BASELINE config 4's sphere-CENTER recovery needs, and
through round 3 it only existed at oracle speed (~50x below the kernels).

This module fuses it:

  * **Forward** — the existing Pallas trace kernel's hdr at bounces=1
    (the hard direct render; the soft value is identical by construction),
    plus one extra silhouette-record pass (``_silh_kernel``) that captures
    the per-(sample, ray) DISCRETE decisions of the two-layer soft
    composite: background (triangle-only) winner + its shadow bit, the
    closest-sphere candidate index + its layer's shadow bit, and the
    sphere_front / potential gates — packed into one int32.
  * **Backward** — ``_soft_bwd_kernel`` replays the soft composite from
    those records entirely in VMEM, expression-for-expression against
    ``render_direct_soft`` (same clip gates, same normalize chains, same
    sigmoid coverage), and reverse-sweeps it with an in-kernel ``jax.vjp``
    (the ops/pallas_mis_bwd.py recipe): parameter cotangents — INCLUDING
    the silhouette d(center)/d(radius) terms — come out via one-hot MXU
    matmuls at kernel speed.

Gradients match ``jax.grad`` of the soft oracle to f32 rounding
(tests/test_soft_fused.py); the config-4 sphere-center recovery loop runs
on this pair via ``inverse_render(..., soft=True, fast=True)``.

Scope: sphere scenes at static-unroll scale (silhouette geometry is
analytic spheres; the grouped 1k-triangle tier has no analytic spheres).
Reference for the soft-coverage math being differentiated:
/root/reference/Sources/gpuRaytracer/shaders_old.metal:108-136 (sphere
intersection) — the soft estimator itself is a capability the reference
does not have (BASELINE config 4).
"""
from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..types import RenderConfig, Scene
from .pallas_path import (BIG, LANES, RAY_SUB, RAY_TMIN, RAY_TMAX, SROWS,
                          STATIC_UNROLL_MAX, TILE, _f32_divmod, _halton_tile,
                          _normalize3, _pack_inputs, _render_pallas_impl)
from .pallas_shade import NROWS_TAB_SPH, NTAB_SPH, _pack_diff_inputs

_F32 = jnp.float32
_I32 = jnp.int32
_U32 = jnp.uint32

# code2 packing (int32; every field exact):
#   bits  0..19  prim_bg + 1 (triangle-only closest winner; 0 = miss)
#   bit   20     occ_bg   (background layer's NEE shadow bit)
#   bit   21     occ_s    (sphere layer's NEE shadow bit)
#   bit   22     sphere_front
#   bit   23     potential (candidate closest-approach in front of bg)
#   bits 24..    s* + 1   (closest-sphere candidate index, >= 1 always —
#                          argmin defaults to sphere 0 like the oracle)
_B_OCCB = 1 << 20
_B_OCCS = 1 << 21
_B_FRONT = 1 << 22
_B_POT = 1 << 23
_B_SIDX = 1 << 24

NSCAL_SOFT = 21  # pos(3) hu(3) hv(3) wb(3) lc(3) lcol(3) ln(3)


def _camera_ray(cam, px, py, jx, jy, W, H):
    pos, uhw, vhh, wv = cam[0:3], cam[3:6], cam[6:9], cam[9:12]
    s = ((px + jx) / _F32(W)) * 2.0 - 1.0
    t = -(((py + jy) / _F32(H)) * 2.0 - 1.0)
    dx = s * uhw[0] + t * vhh[0] - wv[0]
    dy = s * uhw[1] + t * vhh[1] - wv[1]
    dz = s * uhw[2] + t * vhh[2] - wv[2]
    rn = jnp.sqrt(dx * dx + dy * dy + dz * dz)
    dx, dy, dz = dx / rn, dy / rn, dz / rn
    ox = px * 0.0 + pos[0]
    oy = px * 0.0 + pos[1]
    oz = px * 0.0 + pos[2]
    return (ox, oy, oz), (dx, dy, dz), (s, t, rn)


def _silh_kernel(config: RenderConfig, n_pixels: int, num_tris: int,
                 num_spheres: int, occluders,
                 offsets_ref, rid_base_ref, cam_ref, light_ref, tri_ref,
                 sph_ref, code_ref):
    """Per (sample, ray): the soft composite's discrete decisions.
    Mirrors grad/diff_render.render_direct_soft's masks bit-for-bit:
    triangle-only closest hit (intersect.closest_hit with spheres=None),
    sphere candidate argmin over masked t, the two layers' hard shadow
    probes, and the sphere_front/potential gates."""
    W = config.width
    H = config.height
    he = _F32(config.area_light_half_extent)

    pid = pl.program_id(0)
    sub = jax.lax.broadcasted_iota(_I32, (RAY_SUB, LANES), 0)
    lanei = jax.lax.broadcasted_iota(_I32, (RAY_SUB, LANES), 1)
    rid = rid_base_ref[0, 0] + pid * TILE + sub * LANES + lanei
    px = (rid % W).astype(_F32)
    py = (rid // W).astype(_F32)

    off = offsets_ref[...]
    cam = [cam_ref[0, k] for k in range(12)]
    lc = [light_ref[0, k] for k in range(3)]
    ln = [light_ref[0, 6 + k] for k in range(3)]

    tris = [tuple(tri_ref[r, t] for r in range(12)) for t in range(num_tris)]
    # Shading normal rows of the triangle table (the plane normal) for the
    # 1e-3 hit-point offset; is_emissive row for the tri_surf gate.
    tri_n = [(tri_ref[0, t], tri_ref[1, t], tri_ref[2, t])
             for t in range(num_tris)]
    tri_isem = [tri_ref[15, t] for t in range(num_tris)]
    sphs = [tuple(sph_ref[r, s_i] for r in range(SROWS))
            for s_i in range(num_spheres)]

    def tri_closest(ox, oy, oz, dx, dy, dz):
        t_best = jnp.full((RAY_SUB, LANES), BIG, _F32)
        prim_f = t_best * 0.0 - 1.0
        for t_idx, tri in enumerate(tris):
            (nx, ny, nz, c0, s1x, s1y, s1z, c1, s2x, s2y, s2z, c2) = tri
            den = dx * nx + dy * ny + dz * nz
            num = c0 - (ox * nx + oy * ny + oz * nz)
            ok = jnp.abs(den) >= 1e-12
            tt = num / den
            u = (ox * s1x + oy * s1y + oz * s1z) \
                + tt * (dx * s1x + dy * s1y + dz * s1z) - c1
            v = (ox * s2x + oy * s2y + oz * s2z) \
                + tt * (dx * s2x + dy * s2y + dz * s2z) - c2
            closer = (ok & (tt > RAY_TMIN) & (tt < RAY_TMAX)
                      & (jnp.minimum(u, v) >= 0.0) & (u + v <= 1.0)
                      & (tt < t_best))
            t_best = jnp.where(closer, tt, t_best)
            prim_f = jnp.where(closer, _F32(t_idx), prim_f)
        return t_best, prim_f

    def sphere_roots(sph, ox, oy, oz, dx, dy, dz):
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

    def occluded(ox, oy, oz, dx, dy, dz, t_max):
        occ = jnp.zeros((RAY_SUB, LANES), bool)
        shadow = (tris if occluders is None else
                  [t for i, t in enumerate(tris) if occluders[i]])
        for tri in shadow:
            nx, ny, nz, c0, s1x, s1y, s1z, c1, s2x, s2y, s2z, c2 = tri
            den = dx * nx + dy * ny + dz * nz
            num = c0 - (ox * nx + oy * ny + oz * nz)
            ok = jnp.abs(den) >= 1e-12
            tt = num / den
            u = (ox * s1x + oy * s1y + oz * s1z) \
                + tt * (dx * s1x + dy * s1y + dz * s1z) - c1
            v = (ox * s2x + oy * s2y + oz * s2z) \
                + tt * (dx * s2x + dy * s2y + dz * s2z) - c2
            occ = occ | (ok & (tt > 0.0) & (tt < t_max)
                         & (jnp.minimum(u, v) >= 0.0) & (u + v <= 1.0))
        for sph in sphs:
            pos, t1, t2 = sphere_roots(sph, ox, oy, oz, dx, dy, dz)
            occ = occ | (pos & (((t1 > 0.0) & (t1 < t_max))
                                | ((t2 > 0.0) & (t2 < t_max))))
        return occ

    def light_dir_from(hx, hy, hz, w0, w1):
        tlx = (lc[0] + he * w0) - hx
        tly = lc[1] - hy
        tlz = (lc[2] + he * w1) - hz
        dist = jnp.sqrt(jnp.maximum(tlx * tlx + tly * tly + tlz * tlz, 0.0))
        inv_d = 1.0 / jnp.maximum(dist, 1e-3)
        return tlx * inv_d, tly * inv_d, tlz * inv_d, dist

    def one_sample(n_i32, carry):
        ih = off + n_i32.astype(_U32)
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
        (ox, oy, oz), (dx, dy, dz), _ = _camera_ray(cam, px, py, jx, jy,
                                                    W, H)

        t_bg, prim_bg = tri_closest(ox, oy, oz, dx, dy, dz)
        bg_hit = t_bg < BIG * 0.5

        # Sphere candidate argmin over masked t (oracle: argmin of
        # where(valid, t, 1e30), ties/all-invalid -> index 0 with sphere
        # 0's RAW selected root).
        pos0, t1_0, t2_0 = sphere_roots(sphs[0], ox, oy, oz, dx, dy, dz)
        t1ok = (t1_0 > RAY_TMIN) & (t1_0 < RAY_TMAX)
        t2ok = (t2_0 > RAY_TMIN) & (t2_0 < RAY_TMAX)
        tt0 = jnp.where(t1ok, t1_0, t2_0)
        valid_0 = pos0 & (t1ok | t2ok)
        masked_b = jnp.where(valid_0, tt0, _F32(1e30))
        # Validity carried as f32 0/1: Mosaic cannot lower selects over
        # i1 vectors (arith.trunci i8->i1).
        valid_b_f = jnp.where(valid_0, 1.0, 0.0)
        s_f = jnp.zeros((RAY_SUB, LANES), _F32)
        t_s = tt0
        for s_idx in range(1, num_spheres):
            pos_i, t1_i, t2_i = sphere_roots(sphs[s_idx], ox, oy, oz,
                                             dx, dy, dz)
            t1ok = (t1_i > RAY_TMIN) & (t1_i < RAY_TMAX)
            t2ok = (t2_i > RAY_TMIN) & (t2_i < RAY_TMAX)
            tt_i = jnp.where(t1ok, t1_i, t2_i)
            valid_i = pos_i & (t1ok | t2ok)
            masked_i = jnp.where(valid_i, tt_i, _F32(1e30))
            closer = masked_i < masked_b
            masked_b = jnp.where(closer, masked_i, masked_b)
            valid_b_f = jnp.where(closer, jnp.where(valid_i, 1.0, 0.0),
                                  valid_b_f)
            t_s = jnp.where(closer, tt_i, t_s)
            s_f = jnp.where(closer, _F32(s_idx), s_f)

        sphere_front = (valid_b_f > 0.5) & (t_s < t_bg)

        # Candidate sphere's center/radius via the winning index (static
        # select chain over the small sphere set; zero + scalar = splat).
        zero = px * 0.0
        scx = zero + sphs[0][0]
        scy = zero + sphs[0][1]
        scz = zero + sphs[0][2]
        for s_idx in range(1, num_spheres):
            selm = s_f == _F32(s_idx)
            scx = jnp.where(selm, sphs[s_idx][0], scx)
            scy = jnp.where(selm, sphs[s_idx][1], scy)
            scz = jnp.where(selm, sphs[s_idx][2], scz)
        ocx, ocy, ocz = scx - ox, scy - oy, scz - oz
        t_ca = ocx * dx + ocy * dy + ocz * dz
        potential = (t_ca > RAY_TMIN) & (t_ca < t_bg)

        # NEE draws (bounce-0 dims, same as the path kernel / soft oracle).
        w0 = _halton_tile(ih, 2) * 2.0 - 1.0
        w1 = _halton_tile(ih, 3) * 2.0 - 1.0

        # Sphere layer shadow probe: point = o + d*ts' + n_s*1e-3, where
        # ts' = where(sphere_front, where(sphere_front, t_s, 1.0), 0.0)
        #     = where(sphere_front, t_s, 0.0)   (oracle _shade_direct).
        ts_p = jnp.where(sphere_front, t_s, 0.0)
        psx = ox + dx * jnp.where(sphere_front, t_s, 1.0)
        psy = oy + dy * jnp.where(sphere_front, t_s, 1.0)
        psz = oz + dz * jnp.where(sphere_front, t_s, 1.0)
        # 1e-6-floored normalize, NOT _normalize3's 1e-12: the oracle
        # (diff_render) and the backward replay both floor at 1e-6, and the
        # recorded occ_s decision must be bit-for-bit the decision the
        # backward replays on degenerate lanes (ADVICE r4).
        tox, toy, toz = psx - scx, psy - scy, psz - scz
        inv_ns = jax.lax.rsqrt(jnp.maximum(
            tox * tox + toy * toy + toz * toz, 1e-6))
        nsx, nsy, nsz = tox * inv_ns, toy * inv_ns, toz * inv_ns
        hsx = ox + dx * ts_p + nsx * 1e-3
        hsy = oy + dy * ts_p + nsy * 1e-3
        hsz = oz + dz * ts_p + nsz * 1e-3
        ldx, ldy, ldz, dist_s = light_dir_from(hsx, hsy, hsz, w0, w1)
        occ_s = occluded(hsx, hsy, hsz, ldx, ldy, ldz, dist_s - 1e-3)

        # Background layer shadow probe (triangle winner's plane normal).
        bnx = jnp.zeros((RAY_SUB, LANES), _F32)
        bny, bnz, b_isem = bnx, bnx, bnx
        for t_idx in range(num_tris):
            selm = prim_bg == _F32(t_idx)
            bnx = jnp.where(selm, tri_n[t_idx][0], bnx)
            bny = jnp.where(selm, tri_n[t_idx][1], bny)
            bnz = jnp.where(selm, tri_n[t_idx][2], bnz)
            b_isem = jnp.where(selm, tri_isem[t_idx], b_isem)
        tri_surf = bg_hit & (b_isem < 0.5)
        tb_p = jnp.where(tri_surf, t_bg, 0.0)
        hbx = ox + dx * tb_p + bnx * 1e-3
        hby = oy + dy * tb_p + bny * 1e-3
        hbz = oz + dz * tb_p + bnz * 1e-3
        lbx, lby, lbz, dist_b = light_dir_from(hbx, hby, hbz, w0, w1)
        occ_b = occluded(hbx, hby, hbz, lbx, lby, lbz, dist_b - 1e-3)

        code = (prim_bg + 1.0).astype(_I32) \
            + jnp.where(occ_b, _B_OCCB, 0) \
            + jnp.where(occ_s, _B_OCCS, 0) \
            + jnp.where(sphere_front, _B_FRONT, 0) \
            + jnp.where(potential, _B_POT, 0) \
            + (s_f + 1.0).astype(_I32) * _B_SIDX
        code_ref[pl.ds(n_i32 * RAY_SUB, RAY_SUB), :] = code
        return carry

    jax.lax.fori_loop(0, config.spp, one_sample, 0)


def _soft_bwd_kernel(config: RenderConfig, n_pixels: int, num_tris: int,
                     num_prims: int, kappa: float,
                     g_r_ref, g_g_ref, g_b_ref, code_ref, off_ref,
                     rid_base_ref, table_ref, cam_ref, light_ref,
                     dtab_ref, dscal_ref):
    """Replay the soft composite from the silhouette records and reverse it
    with in-kernel jax.vjp. The closure mirrors render_direct_soft
    expression-for-expression; discrete decisions (winners, shadow bits,
    gates) are closed over as constants."""
    W = config.width
    H = config.height
    P = num_prims
    he = _F32(config.area_light_half_extent)
    nrows = NROWS_TAB_SPH
    ntab = NTAB_SPH

    pid = pl.program_id(0)
    sub = jax.lax.broadcasted_iota(_I32, (RAY_SUB, LANES), 0)
    lanei = jax.lax.broadcasted_iota(_I32, (RAY_SUB, LANES), 1)
    rid = rid_base_ref[0, 0] + pid * TILE + sub * LANES + lanei
    px = (rid % W).astype(_F32)
    py = (rid // W).astype(_F32)
    in_image = rid < n_pixels

    g3 = (g_r_ref[...], g_g_ref[...], g_b_ref[...])
    zero = px * 0.0
    off = off_ref[...]

    cam12 = [cam_ref[0, k] for k in range(12)]
    light9 = [light_ref[0, k] for k in range(9)]
    camp0 = tuple(zero + c for c in cam12)
    lightp0 = tuple(zero + c for c in light9)

    # Exact 3-chunk one-hot fetch (pallas_shade recipe), full nrows.
    tabv = table_ref[...]
    t0_ = tabv.astype(jnp.bfloat16).astype(_F32)
    r1_ = tabv - t0_
    t1_ = r1_.astype(jnp.bfloat16).astype(_F32)
    tab9 = jnp.concatenate([t0_, t1_, r1_ - t1_], axis=0)  # [3*nrows, P]
    p_iota = jax.lax.broadcasted_iota(_I32, (P, TILE), 0)

    def fetch(pc):
        onehot = (p_iota == pc.reshape(1, TILE)).astype(_F32)
        at9 = jax.lax.dot_general(
            tab9, onehot, (((1,), (0,)), ((), ())),
            preferred_element_type=_F32,
            precision=jax.lax.Precision.DEFAULT)  # [3*nrows, TILE]
        at = at9[:nrows] + at9[nrows:2 * nrows] + at9[2 * nrows:]
        return onehot, at.reshape(nrows, RAY_SUB, LANES)

    def accum_tab(dtab_acc, onehot, d_at):
        d = d_at.reshape(ntab, TILE)
        p0 = d.astype(jnp.bfloat16).astype(_F32)
        pr = d - p0
        p1 = pr.astype(jnp.bfloat16).astype(_F32)
        planes9 = jnp.concatenate([p0, p1, pr - p1], axis=0)
        part = jax.lax.dot_general(
            onehot, planes9, (((1,), (1,)), ((), ())),
            preferred_element_type=_F32,
            precision=jax.lax.Precision.DEFAULT)  # [P, 3*ntab]
        return dtab_acc + (part[:, :ntab] + part[:, ntab:2 * ntab]
                           + part[:, 2 * ntab:])

    inv_spp = _F32(1.0 / config.spp)
    g_scaled = tuple(g * inv_spp for g in g3)

    def one_sample(n_i32, carry):
        dtab_acc, dscal = carry
        ih = off + n_i32.astype(_U32)
        jx = _halton_tile(ih, 0)
        jy = _halton_tile(ih, 1)
        if config.sampler == "stratified":
            k = int(round(math.sqrt(config.spp)))
            ihf = ih.astype(_I32).astype(_F32)
            _, cell = _f32_divmod(ihf, config.spp)
            cy_c, cx_c = _f32_divmod(cell, k)
            inv_k = _F32(1.0 / k)
            jx = (cx_c + jx) * inv_k
            jy = (cy_c + jy) * inv_k
        u0 = _halton_tile(ih, 2)
        u1 = _halton_tile(ih, 3)

        code = code_ref[pl.ds(n_i32 * RAY_SUB, RAY_SUB), :]
        prim_bg = code % _B_OCCB - 1
        occ_b = (code & _B_OCCB) != 0
        occ_s = (code & _B_OCCS) != 0
        sphere_front = ((code & _B_FRONT) != 0) & in_image
        potential = (code & _B_POT) != 0
        s_idx = code // _B_SIDX - 1

        bg_hit = (prim_bg >= 0) & in_image
        pc_bg = jnp.clip(prim_bg, 0, P - 1)
        pc_s = jnp.clip(num_tris + s_idx, 0, P - 1)
        oh_bg, at_bg = fetch(pc_bg)
        oh_s, at_s = fetch(pc_s)

        def soft_sample(at_bg_, at_s_, camp_, lightp_):
            """render_direct_soft's one_sample on tiles, discrete decisions
            closed over. Returns (Lr, Lg, Lb)."""
            lcx, lcy, lcz = lightp_[0], lightp_[1], lightp_[2]
            lclr = lightp_[3:6]
            lnx, lny, lnz = lightp_[6], lightp_[7], lightp_[8]

            (ox, oy, oz), (dx, dy, dz), _ = _camera_ray(
                camp_, px, py, jx, jy, W, H)

            def shade_direct(hx, hy, hz, nx, ny, nz, dfr, dfg, dfb, occ):
                """_shade_direct mirror: sample_area_light + cos gate +
                diffuse + hard vis. ``h`` is the offset hit point."""
                w0 = u0 * 2.0 - 1.0
                w1 = u1 * 2.0 - 1.0
                tlx = (lcx + he * w0) - hx
                tly = lcy - hy
                tlz = (lcz + he * w1) - hz
                dist = jnp.sqrt(jnp.maximum(
                    tlx * tlx + tly * tly + tlz * tlz, 0.0))
                inv_d = 1.0 / jnp.maximum(dist, 1e-3)
                ldx, ldy, ldz = tlx * inv_d, tly * inv_d, tlz * inv_d
                cos_l = jnp.clip(-(ldx * lnx + ldy * lny + ldz * lnz),
                                 0.0, 1.0)
                cos_s = jnp.clip(nx * ldx + ny * ldy + nz * ldz, 0.0, 1.0)
                inv_d2 = inv_d * inv_d
                vis = jnp.where(occ, 0.0, 1.0)
                base = (inv_d2 * cos_l) * cos_s * vis
                return (lclr[0] * base * dfr, lclr[1] * base * dfg,
                        lclr[2] * base * dfb)

            # ---- background (triangle) layer.
            bnx, bny, bnz, bc0 = at_bg_[0], at_bg_[1], at_bg_[2], at_bg_[3]
            bdf = at_bg_[4:7]
            bem = at_bg_[7:10]
            b_isem = at_bg_[10] > 0.5
            den = dx * bnx + dy * bny + dz * bnz
            t_bg = (bc0 - (ox * bnx + oy * bny + oz * bnz)) / jnp.where(
                jnp.abs(den) < 1e-12, 1.0, den)
            tri_surf = bg_hit & ~b_isem
            tb_p = jnp.where(tri_surf, t_bg, 0.0)
            hbx = ox + dx * tb_p + bnx * 1e-3
            hby = oy + dy * tb_p + bny * 1e-3
            hbz = oz + dz * tb_p + bnz * 1e-3
            Lt = shade_direct(hbx, hby, hbz, bnx, bny, bnz,
                              bdf[0], bdf[1], bdf[2], occ_b)
            Lt = tuple(jnp.where(tri_surf, c, 0.0) for c in Lt)
            em_show = bg_hit & b_isem
            Lt = tuple(jnp.where(em_show, e, c)
                       for e, c in zip((bem[0], bem[1], bem[2]), Lt))

            # ---- sphere layer (candidate s*).
            scx, scy, scz = at_s_[11], at_s_[12], at_s_[13]
            srad = at_s_[14]
            sdf = at_s_[4:7]
            sem = at_s_[7:10]
            ocx, ocy, ocz = ox - scx, oy - scy, oz - scz
            a_q = dx * dx + dy * dy + dz * dz
            b_q = 2.0 * (ocx * dx + ocy * dy + ocz * dz)
            c_q = (ocx * ocx + ocy * ocy + ocz * ocz) - srad * srad
            disc = b_q * b_q - 4.0 * a_q * c_q
            posd = disc > 0.0
            sq = jnp.sqrt(jnp.where(posd, disc, 1.0))
            t1 = (-b_q - sq) / (2.0 * a_q)
            t2 = (-b_q + sq) / (2.0 * a_q)
            t1_ok = (t1 > RAY_TMIN) & (t1 < RAY_TMAX)
            t_s = jnp.where(t1_ok, t1, t2)
            ts_safe = jnp.where(sphere_front, t_s, 1.0)
            psx = ox + dx * ts_safe
            psy = oy + dy * ts_safe
            psz = oz + dz * ts_safe
            tox, toy, toz = psx - scx, psy - scy, psz - scz
            inv_n = jax.lax.rsqrt(jnp.maximum(
                tox * tox + toy * toy + toz * toz, 1e-6))
            nsx, nsy, nsz = tox * inv_n, toy * inv_n, toz * inv_n
            ts_p = jnp.where(sphere_front, ts_safe, 0.0)
            hsx = ox + dx * ts_p + nsx * 1e-3
            hsy = oy + dy * ts_p + nsy * 1e-3
            hsz = oz + dz * ts_p + nsz * 1e-3
            Ls = shade_direct(hsx, hsy, hsz, nsx, nsy, nsz,
                              sdf[0], sdf[1], sdf[2], occ_s)
            Ls = tuple(c + e for c, e in zip(Ls, (sem[0], sem[1], sem[2])))

            # ---- soft coverage (forward-exact / backward-soft alpha).
            socx, socy, socz = scx - ox, scy - oy, scz - oz
            t_ca = socx * dx + socy * dy + socz * dz
            h2 = jnp.maximum(
                (socx * socx + socy * socy + socz * socz) - t_ca * t_ca,
                1e-12)
            h = jnp.sqrt(h2)
            alpha_soft = jax.nn.sigmoid((srad - h) / (_F32(kappa) * srad))
            alpha_soft = jnp.where(potential, alpha_soft, 0.0)
            alpha = (sphere_front.astype(_F32) + alpha_soft
                     - jax.lax.stop_gradient(alpha_soft))
            return tuple(alpha * s + (1.0 - alpha) * t
                         for s, t in zip(Ls, Lt))

        _, vjp_fn = jax.vjp(soft_sample, at_bg, at_s, camp0, lightp0)
        d_at_bg, d_at_s, d_cam, d_light = vjp_fn(g_scaled)

        # Table cotangents: rows map 1:1 ([n(3) c0 df(3) em(3) is_em
        # sc(3) r is_sph] = NROWS_TAB_SPH with the selector rows zeroed);
        # ntab = NTAB_SPH drops the two selector rows in the accumulator.
        def to_planes(d_at):
            rows = [d_at[k] for k in range(10)]          # n c0 df em
            rows += [d_at[k] for k in range(11, 15)]     # sc(3) r
            return jnp.stack(rows, axis=0)

        dtab_acc = accum_tab(dtab_acc, oh_bg, to_planes(d_at_bg))
        dtab_acc = accum_tab(dtab_acc, oh_s, to_planes(d_at_s))
        new_scal = tuple(s + jnp.sum(d)
                         for s, d in zip(dscal, d_cam + d_light))
        return dtab_acc, new_scal

    dtab0 = jnp.zeros((P, ntab), _F32)
    scal0 = tuple(jnp.float32(0.0) for _ in range(NSCAL_SOFT))
    dtab_acc, dscal = jax.lax.fori_loop(0, config.spp, one_sample,
                                        (dtab0, scal0))

    @pl.when(pid == 0)
    def _():
        dtab_ref[...] = jnp.zeros_like(dtab_ref)
        dscal_ref[...] = jnp.zeros_like(dscal_ref)

    dtab_ref[...] += dtab_acc
    dscal_ref[...] += jnp.concatenate(
        [d.reshape(1, 1) for d in dscal], axis=1)


def _silh_records(scene: Scene, config: RenderConfig, interpret,
                  occluders=None):
    from ..render import pixel_rng_offsets
    n_pixels = config.num_pixels
    num_tris = scene.triangles.num_triangles
    num_spheres = scene.spheres.num_spheres
    tri, cam_vec, light_vec, sph, _ = _pack_inputs(scene, config)
    light9 = jnp.concatenate([
        light_vec[0, 0:3], light_vec[0, 3:6],
        jnp.asarray(scene.light.normal, _F32).reshape(-1)]).reshape(1, 9)
    offsets = pixel_rng_offsets(config)
    n_local = offsets.shape[0]
    n_padded = ((n_local + TILE - 1) // TILE) * TILE
    off_planes = jnp.pad(offsets, (0, n_padded - n_local)).reshape(-1, LANES)
    if occluders is not None:
        occluders = tuple(bool(x) for x in occluders)
    kernel = partial(_silh_kernel, config, n_pixels, num_tris, num_spheres,
                     occluders)
    s_plane = jax.ShapeDtypeStruct(
        ((n_padded // LANES) * config.spp, LANES), jnp.int32)
    const_ix = lambda i: (0, 0)
    return pl.pallas_call(
        kernel,
        grid=(n_padded // TILE,),
        in_specs=[
            pl.BlockSpec((RAY_SUB, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), const_ix, memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 12), const_ix, memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 9), const_ix, memory_space=pltpu.SMEM),
            pl.BlockSpec((tri.shape[0], num_tris), const_ix,
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((SROWS, max(num_spheres, 1)), const_ix,
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((RAY_SUB * config.spp, LANES),
                               lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=s_plane,
        interpret=interpret,
    )(off_planes, jnp.zeros((1, 1), _I32), cam_vec, light9, tri, sph)


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _attach_soft_grad(config, interpret, kappa, num_tris, hdr, table,
                      cam_vec, light_vec, code, offsets):
    return hdr


def _attach_soft_fwd(config, interpret, kappa, num_tris, hdr, table,
                     cam_vec, light_vec, code, offsets):
    return hdr, (table, cam_vec, light_vec, code, offsets)


def _attach_soft_bwd(config, interpret, kappa, num_tris, resids, g):
    import numpy as np
    table, cam_vec, light_vec, code, offsets = resids
    n_local = config.num_pixels
    n_padded = ((n_local + TILE - 1) // TILE) * TILE
    num_prims = table.shape[1]
    # hdr cotangent to tile planes; the 1/spp scaling happens in-kernel.
    gs = g.reshape(-1, 3)
    gs = jnp.pad(gs, ((0, n_padded - n_local), (0, 0)))
    g_planes = tuple(gs[:, c].reshape(-1, LANES) for c in range(3))
    off_planes = jnp.pad(offsets, (0, n_padded - n_local)).reshape(-1, LANES)
    ntab = NTAB_SPH
    kernel = partial(_soft_bwd_kernel, config, config.num_pixels,
                     num_tris, num_prims, kappa)
    s_spec = pl.BlockSpec((RAY_SUB * config.spp, LANES), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
    ray_spec = pl.BlockSpec((RAY_SUB, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    const_ix = lambda i: (0, 0)
    dtab, dscal = pl.pallas_call(
        kernel,
        grid=(n_padded // TILE,),
        in_specs=[ray_spec, ray_spec, ray_spec, s_spec, ray_spec,
                  pl.BlockSpec((1, 1), const_ix, memory_space=pltpu.SMEM),
                  pl.BlockSpec((NROWS_TAB_SPH, num_prims), const_ix,
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 12), const_ix, memory_space=pltpu.SMEM),
                  pl.BlockSpec((1, 9), const_ix, memory_space=pltpu.SMEM)],
        out_specs=(
            pl.BlockSpec((num_prims, ntab), const_ix,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NSCAL_SOFT), const_ix,
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(jax.ShapeDtypeStruct((num_prims, ntab), _F32),
                   jax.ShapeDtypeStruct((1, NSCAL_SOFT), _F32)),
        interpret=interpret,
    )(*g_planes, code, off_planes, jnp.zeros((1, 1), _I32), table,
      cam_vec, light_vec)
    zrow = jnp.zeros((1, num_prims), _F32)
    # dtab columns [ntab = n(3) c0 df(3) em(3) sc(3) r] -> table rows with
    # the two selector rows re-inserted as zeros.
    d_table = jnp.concatenate(
        [dtab.T[:10], zrow, dtab.T[10:14], zrow], axis=0)
    d_cam = dscal[:, 0:12]
    d_light = dscal[:, 12:21]
    d_code = np.zeros(code.shape, jax.dtypes.float0)
    d_off = np.zeros(offsets.shape, jax.dtypes.float0)
    return g, d_table, d_cam, d_light, d_code, d_off


_attach_soft_grad.defvjp(_attach_soft_fwd, _attach_soft_bwd)


def render_direct_soft_fused(scene: Scene, config: RenderConfig,
                             kappa: float = 0.05, interpret=None,
                             occluders=None) -> jnp.ndarray:
    """Edge-aware direct-lighting render at kernel speed: value == the hard
    trace kernel's hdr (bounces=1); gradients == jax.grad of
    grad/diff_render.render_direct_soft (interior + sphere-silhouette
    terms). ``occluders``: optional static shadow culling for the record
    pass — decisions unchanged PROVIDED the mask came from
    intersect.potential_occluders, whose endpoint hull includes the camera
    position (the sphere-layer probe originates at ~the camera on
    non-sphere_front lanes, and that occ_s bit is decision-relevant on
    potential lanes; ADVICE r4)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    assert scene.spheres.num_spheres > 0, "soft renderer requires spheres"
    assert scene.triangles.num_triangles <= STATIC_UNROLL_MAX, (
        "silhouette kernels are static-unroll only (sphere scenes)")
    cfg1 = config.replace(bounces=1) if config.bounces != 1 else config
    hdr = _render_pallas_impl(jax.lax.stop_gradient(scene), cfg1,
                              interpret=interpret, occluders=occluders)
    code = _silh_records(jax.lax.stop_gradient(scene), cfg1, interpret,
                         occluders=occluders)
    table, cam_vec, light_vec = _pack_diff_inputs(scene, cfg1)
    from ..render import pixel_rng_offsets
    offsets = pixel_rng_offsets(cfg1)
    return _attach_soft_grad(cfg1, interpret, float(kappa),
                             scene.triangles.num_triangles, hdr, table,
                             cam_vec, light_vec, code, offsets)
