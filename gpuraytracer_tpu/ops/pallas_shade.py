"""Hand-written Pallas backward for the decoupled path tracer.

``render_path_decoupled`` (ops/decoupled.py) splits the render at the
discrete/continuous boundary: a Pallas trace kernel emits visibility records
+ random draws, and a differentiable jnp "shade replay" recomputes radiance
from them. That replay exists ONLY so jax AD has a graph to differentiate —
its forward value is identical to the trace kernel's own hdr output. XLA's
AD of the replay costs ~43 ms (fwd 17 + remat 17 + bwd 9) at 512^2/16spp on
one v5e chip, all of it HBM-bound elementwise traffic.

This module deletes that cost: a ``custom_vjp`` whose forward is the *trace
kernel's hdr, unchanged* (zero extra work), and whose backward is one Pallas
kernel that recomputes each sample's path from the recorded aux planes
entirely in VMEM and walks the three bounces in reverse, accumulating:

  * per-primitive cotangents (normal, plane constant, diffuse, emissive) via
    one [P, rays-tile] one-hot matmul per (sample, bounce) on the MXU —
    HIGHEST precision, exact for one-hot operands;
  * camera cotangents (position, prescaled basis) and light cotangents
    (center, color, normal) as running [32, 128] partial-sum planes, reduced
    once per tile.

The reverse-mode math mirrors the jnp replay expression-for-expression
(same clip gates with >=/<= bounds, same normalize-by-divide chains, same
clamp-to-primitive-0 on dead lanes), so gradients match ``jax.grad`` of the
replay — and therefore of the jnp oracle renderer — to fp32 rounding
(asserted in tests/test_pallas_shade.py).

Aux planes are consumed RAW (tile-major, exactly as the trace kernel wrote
them, pallas_path.py `bs`/`js` slices) — no relayout between the kernels.

Scope: triangle scenes (the flagship bench workload). Scenes with spheres
fall back to the jnp replay (decoupled.render_path_decoupled handles both).
Reference for the forward being differentiated: RTrace/raytrace.metal:11-111.
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
from .pallas_path import (LANES, RAY_SUB, TILE, _f32_divmod, _halton_tile,
                          _render_pallas_impl)

_F32 = jnp.float32
_I32 = jnp.int32
_U32 = jnp.uint32

NTAB = 10   # differentiable table rows: n(3), c0, diffuse(3), emissive(3)
NSCAL = 21  # pos(3) hu(3) hv(3) wb(3) lc(3) lcol(3) ln(3)


def _shade_bwd_kernel(config: RenderConfig, n_pixels: int, num_tris: int,
                      recompute_rng: bool, s_chunk: int, *refs):
    """One ray tile: recompute every sample's path from the aux planes, then
    reverse the bounce chain accumulating parameter cotangents.

    ``recompute_rng``: the trace pass emitted only the int32 records
    (records_only mode — BASELINE config 5's memory fix); the jitter and
    NEE/cosine draws are regenerated here from the RNG offsets with the
    same f32 Halton digits as the trace kernel — bit-identical values,
    zero extra HBM planes."""
    if recompute_rng:
        (g_r_ref, g_g_ref, g_b_ref, rec_ref, off_ref, rid_base_ref,
         table_ref, cam_ref, light_ref, dtab_ref, dscal_ref) = refs
        nee0_ref = nee1_ref = cos0_ref = cos1_ref = jx_ref = jy_ref = None
    else:
        (g_r_ref, g_g_ref, g_b_ref, rec_ref, nee0_ref, nee1_ref, cos0_ref,
         cos1_ref, jx_ref, jy_ref, rid_base_ref, table_ref, cam_ref,
         light_ref, dtab_ref, dscal_ref) = refs
        off_ref = None
    W = config.width
    H = config.height
    B = config.bounces
    P = num_tris
    he = _F32(config.area_light_half_extent)

    pid = pl.program_id(0)
    sub = jax.lax.broadcasted_iota(_I32, (RAY_SUB, LANES), 0)
    lanei = jax.lax.broadcasted_iota(_I32, (RAY_SUB, LANES), 1)
    # Global pixel id (rid_base = shard's first pixel under shard_map).
    rid = rid_base_ref[0, 0] + pid * TILE + sub * LANES + lanei
    px = (rid % W).astype(_F32)
    py = (rid // W).astype(_F32)
    in_image = rid < n_pixels

    cam = [cam_ref[0, k] for k in range(12)]
    pos, hu, hv, wb = cam[0:3], cam[3:6], cam[6:9], cam[9:12]
    lc = [light_ref[0, k] for k in range(3)]
    lcol = [light_ref[0, 3 + k] for k in range(3)]
    ln = [light_ref[0, 6 + k] for k in range(3)]

    # Upstream hdr cotangent for this tile (already scaled by 1/spp).
    g_r = g_r_ref[...]
    g_g = g_g_ref[...]
    g_b = g_b_ref[...]

    zero = px * 0.0
    p_iota = jax.lax.broadcasted_iota(_I32, (P, TILE), 0)

    def fetch(pc):
        """Attrs via one-hot matmul (exact under HIGHEST for 0/1 lhs).
        Returns (onehot [P, TILE], 11 planes [RAY_SUB, LANES])."""
        onehot = (p_iota == pc.reshape(1, TILE)).astype(_F32)
        at = jax.lax.dot_general(
            table_ref[...], onehot, (((1,), (0,)), ((), ())),
            preferred_element_type=_F32,
            precision=jax.lax.Precision.HIGHEST)  # [11, TILE]
        at = at.reshape(11, RAY_SUB, LANES)
        return onehot, [at[k] for k in range(11)]

    off = off_ref[...] if recompute_rng else None
    j_chunk = pl.program_id(1)

    def one_sample(n_i32, carry):
        dtab_acc, dscal = carry
        js = pl.ds(n_i32 * RAY_SUB, RAY_SUB)
        if recompute_rng:
            # Regenerate the trace kernel's draws (pallas_path one_sample
            # mirror — bit-identical f32 Halton digits). Sample index is
            # global; the aux-plane slices are within this step's block.
            ih = off + (j_chunk * s_chunk + n_i32).astype(_U32)
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
        else:
            jx = jx_ref[js, :]
            jy = jy_ref[js, :]

        # ---------------- forward recompute (saving residuals) -----------
        s = ((px + jx) / _F32(W)) * 2.0 - 1.0
        t = -(((py + jy) / _F32(H)) * 2.0 - 1.0)
        rx = s * hu[0] + t * hv[0] - wb[0]
        ry = s * hu[1] + t * hv[1] - wb[1]
        rz = s * hu[2] + t * hv[2] - wb[2]
        rn = jnp.sqrt(rx * rx + ry * ry + rz * rz)
        ox, oy, oz = zero + pos[0], zero + pos[1], zero + pos[2]
        dx, dy, dz = rx / rn, ry / rn, rz / rn

        col = [zero + 1.0, zero + 1.0, zero + 1.0]
        alive = in_image
        res = []
        for b in range(B):
            bs = pl.ds((n_i32 * B + b) * RAY_SUB, RAY_SUB)
            code = rec_ref[bs, :]
            occ = code >= 512
            prim = code % 512 - 1
            hit = prim >= 0
            pc = jnp.clip(prim, 0, P - 1)
            onehot, at = fetch(pc)
            nx, ny, nz, c0 = at[0], at[1], at[2], at[3]
            df = at[4:7]
            em3 = at[7:10]
            is_em = at[10] > 0.5

            den = dx * nx + dy * ny + dz * nz
            ok = jnp.abs(den) >= 1e-12
            sden = jnp.where(ok, den, 1.0)
            num = c0 - (ox * nx + oy * ny + oz * nz)
            tt = num / sden

            active = alive & hit
            hit_light = active & is_em
            surf = active & ~is_em
            ts = jnp.where(surf, tt, 0.0)
            hx = ox + dx * ts + nx * 1e-3
            hy = oy + dy * ts + ny * 1e-3
            hz = oz + dz * ts + nz * 1e-3

            if recompute_rng:
                w0 = _halton_tile(ih, 2 + b * 5 + 0) * 2.0 - 1.0
                w1 = _halton_tile(ih, 2 + b * 5 + 1) * 2.0 - 1.0
            else:
                w0 = nee0_ref[bs, :] * 2.0 - 1.0
                w1 = nee1_ref[bs, :] * 2.0 - 1.0
            tlx = (lc[0] + he * w0) - hx
            tly = lc[1] - hy
            tlz = (lc[2] + he * w1) - hz
            q = tlx * tlx + tly * tly + tlz * tlz
            dist = jnp.sqrt(jnp.maximum(q, 0.0))
            invd = 1.0 / jnp.maximum(dist, 1e-3)
            ldx, ldy, ldz = tlx * invd, tly * invd, tlz * invd
            cl_raw = -(ldx * ln[0] + ldy * ln[1] + ldz * ln[2])
            cs_raw = nx * ldx + ny * ldy + nz * ldz
            cos_l = jnp.clip(cl_raw, 0.0, 1.0)
            cos_s = jnp.clip(cs_raw, 0.0, 1.0)
            invd2 = invd * invd
            gain = (invd2 * cos_l) * cos_s
            contrib = surf & ~occ

            colp = col
            col = [jnp.where(surf, colp[c] * df[c], colp[c]) for c in range(3)]

            # Cosine bounce direction.
            if recompute_rng:
                u0 = _halton_tile(ih, 2 + b * 5 + 2)
                u1 = _halton_tile(ih, 2 + b * 5 + 3)
            else:
                u0 = cos0_ref[bs, :]
                u1 = cos1_ref[bs, :]
            phi = _F32(2.0 * math.pi) * u0
            cth = jnp.sqrt(u1)
            sth = jnp.sqrt(1.0 - cth * cth)
            sxl = sth * jnp.cos(phi)
            syl = cth
            szl = sth * jnp.sin(phi)
            ax, ay, az = _F32(0.0072), _F32(1.0), _F32(0.0034)
            crx = ny * az - nz * ay
            cry = nz * ax - nx * az
            crz = nx * ay - ny * ax
            crn = jnp.sqrt(crx * crx + cry * cry + crz * crz)
            crxn, cryn, crzn = crx / crn, cry / crn, crz / crn

            res.append(dict(
                onehot=onehot, nx=nx, ny=ny, nz=nz, df=df, em3=em3,
                ok=ok, sden=sden, tt=tt, ts=ts,
                o=(ox, oy, oz), d=(dx, dy, dz),
                surf=surf, hit_light=hit_light, contrib=contrib,
                tlx=tlx, tly=tly, tlz=tlz, dist=dist, invd=invd,
                cl_raw=cl_raw, cs_raw=cs_raw, cos_l=cos_l, cos_s=cos_s,
                gain=gain, colp=colp, col=col,
                sxl=sxl, syl=syl, szl=szl,
                crn=crn, crxn=crxn, cryn=cryn, crzn=crzn,
            ))
            if b < B - 1:
                fwx = cryn * nz - crzn * ny
                fwy = crzn * nx - crxn * nz
                fwz = crxn * ny - cryn * nx
                sdx = sxl * crxn + syl * nx + szl * fwx
                sdy = sxl * cryn + syl * ny + szl * fwy
                sdz = sxl * crzn + syl * nz + szl * fwz
                ox = jnp.where(surf, hx, ox)
                oy = jnp.where(surf, hy, oy)
                oz = jnp.where(surf, hz, oz)
                dx = jnp.where(surf, sdx, dx)
                dy = jnp.where(surf, sdy, dy)
                dz = jnp.where(surf, sdz, dz)
            alive = surf

        # ---------------- reverse sweep ----------------------------------
        (d_pos, d_hu, d_hv, d_wb, d_lc, d_lcol, d_ln) = (
            list(dscal[0:3]), list(dscal[3:6]), list(dscal[6:9]),
            list(dscal[9:12]), list(dscal[12:15]), list(dscal[15:18]),
            list(dscal[18:21]))

        d_a = [g_r, g_g, g_b]
        d_o = [zero, zero, zero]
        d_d = [zero, zero, zero]
        d_col = [zero, zero, zero]

        for b in reversed(range(B)):
            r = res[b]
            nx, ny, nz = r["nx"], r["ny"], r["nz"]
            surf = r["surf"]
            d_n = [zero, zero, zero]

            # (D) o/d updates + (9) cosine-direction chain (absent for the
            # last bounce: its o/d die unused).
            if b < B - 1:
                d_h = [jnp.where(surf, d_o[c], 0.0) for c in range(3)]
                d_o = [jnp.where(surf, 0.0, d_o[c]) for c in range(3)]
                d_sd = [jnp.where(surf, d_d[c], 0.0) for c in range(3)]
                d_d = [jnp.where(surf, 0.0, d_d[c]) for c in range(3)]

                sxl, syl, szl = r["sxl"], r["syl"], r["szl"]
                crxn, cryn, crzn, crn = (r["crxn"], r["cryn"], r["crzn"],
                                         r["crn"])
                d_crxn = sxl * d_sd[0]
                d_cryn = sxl * d_sd[1]
                d_crzn = sxl * d_sd[2]
                d_n[0] += syl * d_sd[0]
                d_n[1] += syl * d_sd[1]
                d_n[2] += syl * d_sd[2]
                d_fw = [szl * d_sd[0], szl * d_sd[1], szl * d_sd[2]]
                # fw = cr_n x n
                d_cryn += nz * d_fw[0]
                d_n[2] += cryn * d_fw[0]
                d_crzn -= ny * d_fw[0]
                d_n[1] -= crzn * d_fw[0]
                d_crzn += nx * d_fw[1]
                d_n[0] += crzn * d_fw[1]
                d_crxn -= nz * d_fw[1]
                d_n[2] -= crxn * d_fw[1]
                d_crxn += ny * d_fw[2]
                d_n[1] += crxn * d_fw[2]
                d_cryn -= nx * d_fw[2]
                d_n[0] -= cryn * d_fw[2]
                # normalize reverse
                s_dot = crxn * d_crxn + cryn * d_cryn + crzn * d_crzn
                d_crx = (d_crxn - crxn * s_dot) / crn
                d_cry = (d_cryn - cryn * s_dot) / crn
                d_crz = (d_crzn - crzn * s_dot) / crn
                # cr = n x axis (axis = (0.0072, 1, 0.0034))
                ax, ay, az = _F32(0.0072), _F32(1.0), _F32(0.0034)
                d_n[1] += az * d_crx
                d_n[2] -= ay * d_crx
                d_n[2] += ax * d_cry
                d_n[0] -= az * d_cry
                d_n[0] += ay * d_crz
                d_n[1] -= ax * d_crz
            else:
                d_h = [zero, zero, zero]

            # (C) reverse: a += where(contrib, (lcol*gain)*col)
            contrib = r["contrib"]
            gain = r["gain"]
            col = r["col"]
            d_gain = zero
            for c in range(3):
                gated = jnp.where(contrib, d_a[c], 0.0)
                d_lcol[c] += gain * col[c] * gated
                d_gain += lcol[c] * col[c] * gated
                d_col[c] += lcol[c] * gain * gated

            # (B) reverse: col = where(surf, colp*df, colp)
            colp, df = r["colp"], r["df"]
            d_df = [jnp.where(surf, d_col[c] * colp[c], 0.0) for c in range(3)]
            d_col = [jnp.where(surf, d_col[c] * df[c], d_col[c])
                     for c in range(3)]

            # (6) NEE reverse
            invd, dist = r["invd"], r["dist"]
            cos_l, cos_s = r["cos_l"], r["cos_s"]
            cl_raw, cs_raw = r["cl_raw"], r["cs_raw"]
            tlx, tly, tlz = r["tlx"], r["tly"], r["tlz"]
            invd2 = invd * invd
            d_invd2 = cos_l * cos_s * d_gain
            d_cos_l = invd2 * cos_s * d_gain
            d_cos_s = invd2 * cos_l * d_gain
            d_cs_raw = jnp.where((cs_raw >= 0.0) & (cs_raw <= 1.0),
                                 d_cos_s, 0.0)
            d_cl_raw = jnp.where((cl_raw >= 0.0) & (cl_raw <= 1.0),
                                 d_cos_l, 0.0)
            ldx, ldy, ldz = tlx * invd, tly * invd, tlz * invd
            # cs_raw = n . ld ; cl_raw = -(ld . ln)
            d_n[0] += ldx * d_cs_raw
            d_n[1] += ldy * d_cs_raw
            d_n[2] += ldz * d_cs_raw
            d_ld = [nx * d_cs_raw - ln[0] * d_cl_raw,
                    ny * d_cs_raw - ln[1] * d_cl_raw,
                    nz * d_cs_raw - ln[2] * d_cl_raw]
            d_ln[0] -= ldx * d_cl_raw
            d_ln[1] -= ldy * d_cl_raw
            d_ln[2] -= ldz * d_cl_raw
            d_invd = 2.0 * invd * d_invd2
            d_invd += tlx * d_ld[0] + tly * d_ld[1] + tlz * d_ld[2]
            d_tl = [invd * d_ld[0], invd * d_ld[1], invd * d_ld[2]]
            d_maxd = -(invd * invd) * d_invd
            d_dist = jnp.where(dist >= 1e-3, d_maxd, 0.0)
            d_q = d_dist / (2.0 * dist)
            d_tl[0] += 2.0 * tlx * d_q
            d_tl[1] += 2.0 * tly * d_q
            d_tl[2] += 2.0 * tlz * d_q
            d_lc[0] += d_tl[0]
            d_lc[1] += d_tl[1]
            d_lc[2] += d_tl[2]
            d_h[0] -= d_tl[0]
            d_h[1] -= d_tl[1]
            d_h[2] -= d_tl[2]

            # (5) h reverse: h = o + d*ts + n*1e-3
            ox, oy, oz = r["o"]
            dx, dy, dz = r["d"]
            ts = r["ts"]
            d_o[0] += d_h[0]
            d_o[1] += d_h[1]
            d_o[2] += d_h[2]
            d_d[0] += ts * d_h[0]
            d_d[1] += ts * d_h[1]
            d_d[2] += ts * d_h[2]
            d_ts = dx * d_h[0] + dy * d_h[1] + dz * d_h[2]
            d_n[0] += _F32(1e-3) * d_h[0]
            d_n[1] += _F32(1e-3) * d_h[1]
            d_n[2] += _F32(1e-3) * d_h[2]

            # (A) reverse: a = where(hit_light, em, a)
            hit_light = r["hit_light"]
            d_em = [jnp.where(hit_light, d_a[c], 0.0) for c in range(3)]
            d_a = [jnp.where(hit_light, 0.0, d_a[c]) for c in range(3)]

            # (2) reverse: tt = (c0 - o.n) / sden
            tt, sden, ok = r["tt"], r["sden"], r["ok"]
            d_tt = jnp.where(surf, d_ts, 0.0)
            d_num = d_tt / sden
            d_sden = -(tt * d_tt) / sden
            d_den = jnp.where(ok, d_sden, 0.0)
            d_c0 = d_num
            d_o[0] -= nx * d_num
            d_o[1] -= ny * d_num
            d_o[2] -= nz * d_num
            d_n[0] -= ox * d_num
            d_n[1] -= oy * d_num
            d_n[2] -= oz * d_num
            d_d[0] += nx * d_den
            d_d[1] += ny * d_den
            d_d[2] += nz * d_den
            d_n[0] += dx * d_den
            d_n[1] += dy * d_den
            d_n[2] += dz * d_den

            # (1) table cotangent accumulation: [P, NTAB] one-hot matmul.
            planes = jnp.stack(
                [d_n[0], d_n[1], d_n[2], d_c0,
                 d_df[0], d_df[1], d_df[2],
                 d_em[0], d_em[1], d_em[2]], axis=0)  # [NTAB, 32, 128]
            planes = planes.reshape(NTAB, TILE)
            part = jax.lax.dot_general(
                r["onehot"], planes, (((1,), (1,)), ((), ())),
                preferred_element_type=_F32,
                precision=jax.lax.Precision.HIGHEST)  # [P, NTAB]
            dtab_acc = dtab_acc + part

        # Camera reverse (bounce-0 entry o/d are the camera ray).
        d_pos[0] += d_o[0]
        d_pos[1] += d_o[1]
        d_pos[2] += d_o[2]
        dx0, dy0, dz0 = res[0]["d"]
        s_dot = dx0 * d_d[0] + dy0 * d_d[1] + dz0 * d_d[2]
        d_r = [(d_d[0] - dx0 * s_dot) / rn,
               (d_d[1] - dy0 * s_dot) / rn,
               (d_d[2] - dz0 * s_dot) / rn]
        for c in range(3):
            d_hu[c] += s * d_r[c]
            d_hv[c] += t * d_r[c]
            d_wb[c] -= d_r[c]

        new_scal = tuple(d_pos + d_hu + d_hv + d_wb + d_lc + d_lcol + d_ln)
        return dtab_acc, new_scal

    dtab0 = jnp.zeros((P, NTAB), _F32)
    scal0 = tuple(zero for _ in range(NSCAL))
    dtab_acc, dscal = jax.lax.fori_loop(
        0, s_chunk, one_sample, (dtab0, scal0), unroll=False)

    @pl.when((pid == 0) & (j_chunk == 0))
    def _():
        dtab_ref[...] = jnp.zeros_like(dtab_ref)
        dscal_ref[...] = jnp.zeros_like(dscal_ref)

    dtab_ref[...] += dtab_acc
    scal_row = jnp.concatenate(
        [jnp.sum(p).reshape(1, 1) for p in dscal], axis=1)  # [1, NSCAL]
    dscal_ref[...] += scal_row


def _bwd_pallas(config: RenderConfig, n_pixels: int, num_tris: int,
                g_planes, aux_planes, table, cam_vec, light_vec,
                interpret: bool, rid_base, n_local: int, offsets=None):
    from .pallas_path import _sample_chunk_for
    n_padded = ((n_local + TILE - 1) // TILE) * TILE
    recompute_rng = offsets is not None
    s_chunk = _sample_chunk_for(config, recompute_rng)
    n_schunks = config.spp // s_chunk
    grid = (n_padded // TILE, n_schunks)
    csb = s_chunk * config.bounces

    ray_spec = pl.BlockSpec((RAY_SUB, LANES), lambda i, j: (i, 0),
                            memory_space=pltpu.VMEM)
    rec_ix = lambda i, j: (i * n_schunks + j, 0)
    sb_spec = pl.BlockSpec((RAY_SUB * csb, LANES), rec_ix,
                           memory_space=pltpu.VMEM)
    s_spec = pl.BlockSpec((RAY_SUB * s_chunk, LANES), rec_ix,
                          memory_space=pltpu.VMEM)

    if recompute_rng:
        aux_specs = [sb_spec, ray_spec]          # records + RNG offsets
        aux_inputs = (*aux_planes, offsets)
    else:
        aux_specs = [sb_spec] * 5 + [s_spec] * 2  # records + uv + jitter
        aux_inputs = aux_planes
    kernel = partial(_shade_bwd_kernel, config, n_pixels, num_tris,
                     recompute_rng, s_chunk)
    dtab, dscal = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[ray_spec, ray_spec, ray_spec,             # g r/g/b
                  *aux_specs,
                  pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                               memory_space=pltpu.SMEM),    # rid_base
                  pl.BlockSpec((11, num_tris), lambda i, j: (0, 0),
                               memory_space=pltpu.VMEM),    # table
                  pl.BlockSpec((1, 12), lambda i, j: (0, 0),
                               memory_space=pltpu.SMEM),    # camera
                  pl.BlockSpec((1, 9), lambda i, j: (0, 0),
                               memory_space=pltpu.SMEM)],   # light
        out_specs=(
            pl.BlockSpec((num_tris, NTAB), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NSCAL), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(jax.ShapeDtypeStruct((num_tris, NTAB), _F32),
                   jax.ShapeDtypeStruct((1, NSCAL), _F32)),
        interpret=interpret,
    )(*g_planes, *aux_inputs, rid_base, table, cam_vec, light_vec)
    return dtab, dscal


# ---------------------------------------------------------------------------
# custom_vjp wrapper: forward = the trace kernel's own hdr (identity);
# backward = the kernel above.
# ---------------------------------------------------------------------------

@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _attach_grad(config: RenderConfig, interpret, hdr, table, cam_vec,
                 light_vec, aux_planes, rid_base, offsets):
    return hdr


def _attach_fwd(config, interpret, hdr, table, cam_vec, light_vec,
                aux_planes, rid_base, offsets):
    return hdr, (table, cam_vec, light_vec, aux_planes, rid_base, offsets)


def _attach_bwd(config, interpret, resids, g):
    table, cam_vec, light_vec, aux_planes, rid_base, offsets = resids
    n_local = g.shape[0] * (g.shape[1] if g.ndim == 3 else 1)
    n_padded = ((n_local + TILE - 1) // TILE) * TILE
    num_tris = table.shape[1]

    # hdr cotangent ([H, W, 3] or flat [local, 3]) -> padded tile planes,
    # pre-scaled by 1/spp (hdr = sum_samples acc / spp).
    gs = (g * _F32(1.0 / config.spp)).reshape(-1, 3)
    gs = jnp.pad(gs, ((0, n_padded - n_local), (0, 0)))
    g_planes = tuple(gs[:, c].reshape(-1, LANES) for c in range(3))

    if offsets is not None and len(aux_planes) == 1:
        off_planes = jnp.pad(offsets, (0, n_padded - n_local)).reshape(
            -1, LANES)
    else:
        off_planes = None
    dtab, dscal = _bwd_pallas(config, config.num_pixels, num_tris, g_planes,
                              aux_planes, table, cam_vec, light_vec,
                              interpret, rid_base, n_local,
                              offsets=off_planes)
    d_table = jnp.concatenate(
        [dtab.T, jnp.zeros((1, num_tris), _F32)], axis=0)  # +is_em row
    d_cam = dscal[:, 0:12]
    d_light = dscal[:, 12:21]

    # Aux planes are non-differentiable (int records / stop-gradient'd RNG
    # draws): int inputs take float0 cotangents, float inputs zero arrays
    # (DCE'd — they feed a stop_gradient upstream).
    import numpy as np
    d_aux = jax.tree.map(
        lambda x: (np.zeros(x.shape, jax.dtypes.float0)
                   if jnp.issubdtype(x.dtype, jnp.integer)
                   else jnp.zeros_like(x)),
        aux_planes)
    d_rid = np.zeros(rid_base.shape, jax.dtypes.float0)
    d_off = (None if offsets is None
             else np.zeros(offsets.shape, jax.dtypes.float0))
    return g, d_table, d_cam, d_light, d_aux, d_rid, d_off


_attach_grad.defvjp(_attach_fwd, _attach_bwd)


def _pack_diff_inputs(scene: Scene, config: RenderConfig):
    """Differentiable jnp packing of the kernel's parameter views — grads
    chain from the kernel's cotangents back to the scene pytree (verts via
    compile_scene, camera via camera_basis, light fields directly)."""
    compiled = compile_scene(scene.triangles, lane_pad=1)
    table = jnp.stack([
        compiled.n[:, 0], compiled.n[:, 1], compiled.n[:, 2], compiled.c0,
        compiled.diffuse[:, 0], compiled.diffuse[:, 1], compiled.diffuse[:, 2],
        compiled.emissive[:, 0], compiled.emissive[:, 1],
        compiled.emissive[:, 2],
        compiled.is_emissive.astype(_F32),
    ])  # [11, P]

    cam = scene.camera
    res_x, res_y = config.resolution
    aspect = float(res_x // res_y) if config.integer_aspect else res_x / res_y
    half_width = jnp.tan(jnp.asarray(cam.horizontal_fov, _F32) / 2.0)
    half_height = half_width / aspect
    u, v, w = smp.camera_basis(jnp.asarray(cam.direction, _F32),
                               jnp.asarray(cam.up, _F32))
    cam_vec = jnp.concatenate([
        jnp.asarray(cam.position, _F32), u * half_width, v * half_height, w,
    ]).reshape(1, 12)
    light = scene.light
    light_vec = jnp.concatenate([
        jnp.asarray(light.center, _F32).reshape(-1),
        jnp.asarray(light.color, _F32).reshape(-1),
        jnp.asarray(light.normal, _F32).reshape(-1),
    ]).reshape(1, 9)
    return table, cam_vec, light_vec


def _auto_records_only(config: RenderConfig) -> bool:
    """records_only when the six f32 draw planes would exceed ~2 GB —
    BASELINE config 5 (1024^2 x 256 spp) needs ~18 GB of them; regenerating
    the draws in the backward kernel costs a few Halton evaluations per
    (sample, bounce) instead."""
    nsb = config.num_pixels * config.spp * config.bounces
    return nsb * 4 * 4 + config.num_pixels * config.spp * 2 * 4 > 2 << 30


def render_path_decoupled_fused(scene: Scene, config: RenderConfig,
                                interpret=None,
                                records_only=None) -> jnp.ndarray:
    """Variant-B differentiable render at megakernel forward speed: the
    trace kernel's hdr with the hand-written backward attached. Triangle
    scenes only (callers fall back to the jnp replay for spheres)."""
    if scene.spheres.num_spheres:
        raise ValueError("fused decoupled path supports triangle scenes; "
                         "use render_path_decoupled for sphere scenes")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if records_only is None:
        records_only = _auto_records_only(config)
    hdr, aux = _render_pallas_impl(jax.lax.stop_gradient(scene), config,
                                   interpret=interpret, emit_records=True,
                                   raw_records=True,
                                   records_only=records_only)
    table, cam_vec, light_vec = _pack_diff_inputs(scene, config)
    from ..render import pixel_rng_offsets
    offsets = pixel_rng_offsets(config) if records_only else None
    return _attach_grad(config, interpret, hdr, table, cam_vec, light_vec,
                        tuple(aux), jnp.zeros((1, 1), jnp.int32), offsets)


def render_path_fused_local(scene: Scene, config: RenderConfig,
                            local_offsets, rid_base, interpret=None,
                            records_only=None):
    """Shard-local fused render for use inside ``shard_map`` (see
    parallel/fast.py): renders the pixels [rid_base, rid_base + len(offsets))
    and returns flat [local, 3] hdr with the hand-written backward attached.
    Cotangents for the replicated scene parameters are per-shard partials —
    shard_map's transpose inserts the psum."""
    if scene.spheres.num_spheres:
        raise ValueError("fused decoupled path supports triangle scenes")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if records_only is None:
        records_only = _auto_records_only(config)
    hdr, aux = _render_pallas_impl(jax.lax.stop_gradient(scene), config,
                                   interpret=interpret, emit_records=True,
                                   raw_records=True,
                                   records_only=records_only,
                                   local_offsets=local_offsets,
                                   rid_base=rid_base, flat_output=True)
    table, cam_vec, light_vec = _pack_diff_inputs(scene, config)
    offsets = local_offsets if records_only else None
    return _attach_grad(config, interpret, hdr, table, cam_vec, light_vec,
                        tuple(aux), rid_base, offsets)
