"""Metallic-roughness microfacet BRDF (calculateBRDFContribution,
Sources/gpuRaytracer/shaders.metal:259-289)."""
from __future__ import annotations

import jax.numpy as jnp

from .sampling import (_safe_normalize, d_ggx, dot, f_schlick, fd_lambert,
                       normalize, v_smith_ggx_correlated)


def brdf_contribution(
    incoming_dir: jnp.ndarray,  # [..., 3] ray direction toward surface
    normal: jnp.ndarray,        # [..., 3]
    diffuse: jnp.ndarray,       # [..., 3]
    metallic: jnp.ndarray,      # [...]
    roughness: jnp.ndarray,     # [...]
    light_dir: jnp.ndarray,     # [..., 3] normalized
) -> jnp.ndarray:
    """kD * (Fd + Fr) * NoL with f0 = mix(0.04, diffuse, metallic).

    Mirrors the reference exactly, including its quirks: D_GGX receives
    roughness (not alpha = roughness^2), and the GGX visibility term uses the
    same un-squared roughness (shaders.metal:273-275)."""
    v = -normalize(incoming_dir)
    n = normal
    l = light_dir
    h = _safe_normalize(v + l)  # l == -v (masked lanes) must stay finite

    n_dot_v = jnp.abs(dot(n, v)) + 1e-5
    n_dot_l = jnp.clip(dot(n, l), 0.0, 1.0)
    n_dot_h = jnp.clip(dot(n, h), 0.0, 1.0)
    l_dot_h = jnp.clip(dot(l, h), 0.0, 1.0)

    # mix(0.04, diffuse, metallic), elementwise over rgb.
    f0 = 0.04 * (1.0 - metallic[..., None]) + diffuse * metallic[..., None]
    d = d_ggx(n_dot_h, roughness)
    f = f_schlick(l_dot_h, f0)
    g = v_smith_ggx_correlated(n_dot_v, n_dot_l, roughness)

    fr = (d * g)[..., None] * f / (4.0 * n_dot_v * n_dot_l + 1e-7)[..., None]
    fd = diffuse * fd_lambert()

    k_d = (1.0 - f) * (1.0 - metallic[..., None])
    return k_d * (fd + fr) * n_dot_l[..., None]
