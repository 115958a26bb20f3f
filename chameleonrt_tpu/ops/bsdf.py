"""Disney BSDF: evaluation, pdf, and sampling (jax, vectorized).

A branchless re-design of the Disney BSDF kernel library every reference
backend replicates per shader language (backends/embree/disney_bsdf.ih:38-429,
after Burley's 2012 course notes): diffuse + retro, GTR2 (an)isotropic
microfacet specular, GTR1 clearcoat, sheen, and GTR2 microfacet transmission.
All lane-level `if`s become jnp.where with guarded denominators so masked
lanes cannot poison active lanes with NaNs; everything runs as wide VPU ops
over the whole ray wavefront at once.

Sampling draws and component selection follow the reference order exactly
(disney_bsdf.ih:364-429): uniform component pick among
diffuse | microfacet | clearcoat [| transmission if specular_transmission>0],
pdf = mixture average over components (disney_bsdf.ih:334-359).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from chameleonrt_tpu.ops import rng
from chameleonrt_tpu.ops.math import (
    M_1_PI,
    M_PI,
    dot,
    lerp,
    luminance,
    normalize,
    reflect,
    refract,
    saturate,
    sqr,
)

_ALPHA_MIN = 0.001


class MaterialBatch(NamedTuple):
    """SoA Disney material parameters, one entry per lane (or per material
    when used as the device material table)."""

    base_color: jnp.ndarray  # (..., 3)
    metallic: jnp.ndarray
    specular: jnp.ndarray
    roughness: jnp.ndarray
    specular_tint: jnp.ndarray
    anisotropy: jnp.ndarray
    sheen: jnp.ndarray
    sheen_tint: jnp.ndarray
    clearcoat: jnp.ndarray
    clearcoat_gloss: jnp.ndarray
    ior: jnp.ndarray
    specular_transmission: jnp.ndarray

    @staticmethod
    def default(shape=()) -> "MaterialBatch":
        z = jnp.zeros(shape, jnp.float32)
        return MaterialBatch(
            base_color=jnp.broadcast_to(jnp.float32(0.9), shape + (3,)),
            metallic=z,
            specular=z,
            roughness=jnp.ones(shape, jnp.float32),
            specular_tint=z,
            anisotropy=z,
            sheen=z,
            sheen_tint=z,
            clearcoat=z,
            clearcoat_gloss=z,
            ior=jnp.full(shape, 1.5, jnp.float32),
            specular_transmission=z,
        )


def same_hemisphere(w_o, w_i, n):
    return dot(w_o, n) * dot(w_i, n) > 0.0


def cos_sample_hemisphere(u):
    """Concentric-disk cosine hemisphere sample about +z
    (reference disney_bsdf.ih:44-62)."""
    s = 2.0 * u - 1.0
    sx, sy = s[..., 0], s[..., 1]
    use_x = jnp.abs(sx) > jnp.abs(sy)
    radius = jnp.where(use_x, sx, sy)
    safe_sx = jnp.where(sx == 0.0, 1.0, sx)
    safe_sy = jnp.where(sy == 0.0, 1.0, sy)
    theta = jnp.where(
        use_x, (M_PI / 4.0) * (sy / safe_sx), M_PI / 2.0 - (M_PI / 4.0) * (sx / safe_sy)
    )
    degenerate = (sx == 0.0) & (sy == 0.0)
    radius = jnp.where(degenerate, 0.0, radius)
    dx = radius * jnp.cos(theta)
    dy = radius * jnp.sin(theta)
    dz = jnp.sqrt(jnp.maximum(0.0, 1.0 - dx * dx - dy * dy))
    return jnp.stack([dx, dy, dz], axis=-1)


def spherical_dir(sin_theta, cos_theta, phi):
    return jnp.stack(
        [sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta], axis=-1
    )


def schlick_weight(cos_theta):
    return saturate(1.0 - cos_theta) ** 5


def fresnel_dielectric(cos_theta_i, eta_i, eta_t):
    """Full Fresnel dielectric (reference disney_bsdf.ih:82-89)."""
    g2 = sqr(eta_t) / jnp.maximum(sqr(eta_i), 1e-20) - 1.0 + sqr(cos_theta_i)
    total = g2 < 0.0
    g = jnp.sqrt(jnp.maximum(g2, 0.0))
    denom1 = jnp.where(jnp.abs(g + cos_theta_i) < 1e-20, 1.0, g + cos_theta_i)
    denom2 = cos_theta_i * (g - cos_theta_i) + 1.0
    denom2 = jnp.where(jnp.abs(denom2) < 1e-20, 1.0, denom2)
    f = (
        0.5
        * sqr(g - cos_theta_i)
        / sqr(denom1)
        * (1.0 + sqr(cos_theta_i * (g + cos_theta_i) - 1.0) / sqr(denom2))
    )
    return jnp.where(total, 1.0, f)


def gtr_1(cos_theta_h, alpha):
    """GTR gamma=1 NDF for clearcoat (reference disney_bsdf.ih:93-99)."""
    alpha_sqr = sqr(alpha)
    log_a = jnp.log(jnp.maximum(alpha_sqr, 1e-20))
    log_a = jnp.where(log_a == 0.0, 1.0, log_a)
    d = (
        M_1_PI
        * (alpha_sqr - 1.0)
        / (log_a * (1.0 + (alpha_sqr - 1.0) * sqr(cos_theta_h)))
    )
    return jnp.where(alpha >= 1.0, M_1_PI, d)


def gtr_2(cos_theta_h, alpha):
    """GTR gamma=2 (GGX) NDF (reference disney_bsdf.ih:103-106)."""
    alpha_sqr = sqr(alpha)
    return M_1_PI * alpha_sqr / jnp.maximum(sqr(1.0 + (alpha_sqr - 1.0) * sqr(cos_theta_h)), 1e-20)


def gtr_2_aniso(h_dot_n, h_dot_x, h_dot_y, alpha_x, alpha_y):
    """Anisotropic GTR2 NDF (reference disney_bsdf.ih:110-113)."""
    denom = (
        alpha_x
        * alpha_y
        * sqr(sqr(h_dot_x / alpha_x) + sqr(h_dot_y / alpha_y) + sqr(h_dot_n))
    )
    return M_1_PI / jnp.maximum(denom, 1e-20)


def smith_shadowing_ggx(n_dot_o, alpha_g):
    a = sqr(alpha_g)
    b = sqr(n_dot_o)
    return 1.0 / jnp.maximum(n_dot_o + jnp.sqrt(jnp.maximum(a + b - a * b, 0.0)), 1e-10)


def smith_shadowing_ggx_aniso(n_dot_o, o_dot_x, o_dot_y, alpha_x, alpha_y):
    return 1.0 / jnp.maximum(
        n_dot_o
        + jnp.sqrt(jnp.maximum(sqr(o_dot_x * alpha_x) + sqr(o_dot_y * alpha_y) + sqr(n_dot_o), 0.0)),
        1e-10,
    )


def _to_world(hemi, n, v_x, v_y):
    return hemi[..., 0:1] * v_x + hemi[..., 1:2] * v_y + hemi[..., 2:3] * n


def sample_lambertian_dir(n, v_x, v_y, s):
    return _to_world(normalize(cos_sample_hemisphere(s)), n, v_x, v_y)


def sample_gtr_1_h(n, v_x, v_y, alpha, s):
    """Clearcoat half-vector sample (reference disney_bsdf.ih:132-140)."""
    phi_h = 2.0 * M_PI * s[..., 0]
    alpha_sqr = jnp.maximum(sqr(alpha), 1e-8)
    cos_theta_h_sqr = (1.0 - jnp.power(alpha_sqr, 1.0 - s[..., 1])) / jnp.where(
        alpha_sqr == 1.0, 1.0, 1.0 - alpha_sqr
    )
    cos_theta_h = jnp.sqrt(jnp.maximum(cos_theta_h_sqr, 0.0))
    sin_theta_h = jnp.sqrt(jnp.maximum(1.0 - cos_theta_h_sqr, 0.0))
    hemi = normalize(spherical_dir(sin_theta_h, cos_theta_h, phi_h))
    return _to_world(hemi, n, v_x, v_y)


def sample_gtr_2_h(n, v_x, v_y, alpha, s):
    """GGX half-vector sample (reference disney_bsdf.ih:142-149)."""
    phi_h = 2.0 * M_PI * s[..., 0]
    cos_theta_h_sqr = (1.0 - s[..., 1]) / jnp.maximum(
        1.0 + (sqr(alpha) - 1.0) * s[..., 1], 1e-20
    )
    cos_theta_h = jnp.sqrt(jnp.maximum(cos_theta_h_sqr, 0.0))
    sin_theta_h = jnp.sqrt(jnp.maximum(1.0 - cos_theta_h_sqr, 0.0))
    hemi = normalize(spherical_dir(sin_theta_h, cos_theta_h, phi_h))
    return _to_world(hemi, n, v_x, v_y)


def sample_gtr_2_aniso_h(n, v_x, v_y, alpha_x, alpha_y, s):
    """Anisotropic GGX half-vector sample (reference disney_bsdf.ih:151-155)."""
    x = 2.0 * M_PI * s[..., 0]
    scale = jnp.sqrt(s[..., 1] / jnp.maximum(1.0 - s[..., 1], 1e-20))
    w_h = (
        scale[..., None]
        * (alpha_x[..., None] * jnp.cos(x)[..., None] * v_x + alpha_y[..., None] * jnp.sin(x)[..., None] * v_y)
        + n
    )
    return normalize(w_h)


def lambertian_pdf(w_i, n):
    d = dot(w_i, n)
    return jnp.where(d > 0.0, d * M_1_PI, 0.0)


def _half_vector_pdf(w_o, w_i, n, d_of_cos):
    """Shared reflection-pdf shape: D(cos_h) * cos_h / (4 |w_o . w_h|)."""
    w_h = normalize(w_i + w_o)
    cos_theta_h = dot(n, w_h)
    d = d_of_cos(cos_theta_h, w_h)
    o_dot_h = dot(w_o, w_h)
    o_dot_h = jnp.where(jnp.abs(o_dot_h) < 1e-10, 1e-10, o_dot_h)
    pdf = d * cos_theta_h / (4.0 * o_dot_h)
    return jnp.where(same_hemisphere(w_o, w_i, n), pdf, 0.0)


def gtr_1_pdf(w_o, w_i, n, alpha):
    return _half_vector_pdf(w_o, w_i, n, lambda c, _h: gtr_1(c, alpha))


def gtr_2_pdf(w_o, w_i, n, alpha):
    return _half_vector_pdf(w_o, w_i, n, lambda c, _h: gtr_2(c, alpha))


def gtr_2_aniso_pdf(w_o, w_i, n, v_x, v_y, alpha_x, alpha_y):
    return _half_vector_pdf(
        w_o,
        w_i,
        n,
        lambda c, h: gtr_2_aniso(c, jnp.abs(dot(h, v_x)), jnp.abs(dot(h, v_y)), alpha_x, alpha_y),
    )


def gtr_2_transmission_pdf(w_o, w_i, n, alpha, ior):
    """Transmission half-vector pdf with the Jacobian of the refraction map
    (reference disney_bsdf.ih:185-201)."""
    entering = dot(w_o, n) > 0.0
    eta_o = jnp.where(entering, 1.0, ior)
    eta_i = jnp.where(entering, ior, 1.0)
    w_h = normalize(w_o + w_i * (eta_i / eta_o)[..., None])
    cos_theta_h = jnp.abs(dot(n, w_h))
    i_dot_h = dot(w_i, w_h)
    o_dot_h = dot(w_o, w_h)
    d = gtr_2(cos_theta_h, alpha)
    denom = sqr(eta_o * o_dot_h + eta_i * i_dot_h)
    dwh_dwi = o_dot_h * sqr(eta_o) / jnp.maximum(denom, 1e-20)
    pdf = d * cos_theta_h * jnp.abs(dwh_dwi)
    return jnp.where(same_hemisphere(w_o, w_i, n), 0.0, pdf)


def disney_diffuse(mat: MaterialBatch, n, w_o, w_i):
    """Burley diffuse with retro-reflection (reference disney_bsdf.ih:215-226)."""
    w_h = normalize(w_i + w_o)
    n_dot_o = jnp.abs(dot(w_o, n))
    n_dot_i = jnp.abs(dot(w_i, n))
    i_dot_h = dot(w_i, w_h)
    fd90 = 0.5 + 2.0 * mat.roughness * sqr(i_dot_h)
    fi = schlick_weight(n_dot_i)
    fo = schlick_weight(n_dot_o)
    return mat.base_color * (M_1_PI * lerp(1.0, fd90, fi) * lerp(1.0, fd90, fo))[..., None]


def _specular_color(mat: MaterialBatch):
    lum = luminance(mat.base_color)
    tint = jnp.where(
        lum[..., None] > 0.0, mat.base_color / jnp.maximum(lum[..., None], 1e-20), 1.0
    )
    spec = lerp(
        (mat.specular * 0.08)[..., None] * lerp(1.0, tint, mat.specular_tint[..., None]),
        mat.base_color,
        mat.metallic[..., None],
    )
    return spec


def disney_microfacet_isotropic(mat: MaterialBatch, n, w_o, w_i):
    """(reference disney_bsdf.ih:228-241)"""
    w_h = normalize(w_i + w_o)
    spec = _specular_color(mat)
    alpha = jnp.maximum(_ALPHA_MIN, sqr(mat.roughness))
    d = gtr_2(dot(n, w_h), alpha)
    f = lerp(spec, 1.0, schlick_weight(dot(w_i, w_h))[..., None])
    g = smith_shadowing_ggx(dot(n, w_i), alpha) * smith_shadowing_ggx(dot(n, w_o), alpha)
    return (d * g)[..., None] * f


def disney_microfacet_anisotropic(mat: MaterialBatch, n, w_o, w_i, v_x, v_y):
    """(reference disney_bsdf.ih:271-287)"""
    w_h = normalize(w_i + w_o)
    spec = _specular_color(mat)
    aspect = jnp.sqrt(jnp.maximum(1.0 - mat.anisotropy * 0.9, 1e-8))
    a = sqr(mat.roughness)
    alpha_x = jnp.maximum(_ALPHA_MIN, a / aspect)
    alpha_y = jnp.maximum(_ALPHA_MIN, a * aspect)
    d = gtr_2_aniso(
        dot(n, w_h), jnp.abs(dot(w_h, v_x)), jnp.abs(dot(w_h, v_y)), alpha_x, alpha_y
    )
    f = lerp(spec, 1.0, schlick_weight(dot(w_i, w_h))[..., None])
    g = smith_shadowing_ggx_aniso(
        dot(n, w_i), jnp.abs(dot(w_i, v_x)), jnp.abs(dot(w_i, v_y)), alpha_x, alpha_y
    ) * smith_shadowing_ggx_aniso(
        dot(n, w_o), jnp.abs(dot(w_o, v_x)), jnp.abs(dot(w_o, v_y)), alpha_x, alpha_y
    )
    return (d * g)[..., None] * f


def disney_microfacet_transmission_isotropic(mat: MaterialBatch, n, w_o, w_i):
    """(reference disney_bsdf.ih:243-269)"""
    o_dot_n = dot(w_o, n)
    i_dot_n = dot(w_i, n)
    degenerate = (o_dot_n == 0.0) | (i_dot_n == 0.0)
    entering = o_dot_n > 0.0
    eta_o = jnp.where(entering, 1.0, mat.ior)
    eta_i = jnp.where(entering, mat.ior, 1.0)
    w_h = normalize(w_o + w_i * (eta_i / eta_o)[..., None])
    alpha = jnp.maximum(_ALPHA_MIN, sqr(mat.roughness))
    d = gtr_2(jnp.abs(dot(n, w_h)), alpha)
    f = fresnel_dielectric(jnp.abs(dot(w_i, n)), eta_o, eta_i)
    g = smith_shadowing_ggx(jnp.abs(dot(n, w_i)), alpha) * smith_shadowing_ggx(
        jnp.abs(dot(n, w_o)), alpha
    )
    i_dot_h = dot(w_i, w_h)
    o_dot_h = dot(w_o, w_h)
    c = (
        jnp.abs(o_dot_h)
        / jnp.maximum(jnp.abs(o_dot_n), 1e-10)
        * jnp.abs(i_dot_h)
        / jnp.maximum(jnp.abs(i_dot_n), 1e-10)
        * sqr(eta_o)
        / jnp.maximum(sqr(eta_o * o_dot_h + eta_i * i_dot_h), 1e-20)
    )
    val = mat.base_color * (c * (1.0 - f) * g * d)[..., None]
    return jnp.where(degenerate[..., None], 0.0, val)


def disney_clear_coat(mat: MaterialBatch, n, w_o, w_i):
    """(reference disney_bsdf.ih:289-298)"""
    w_h = normalize(w_i + w_o)
    alpha = lerp(0.1, 0.001, mat.clearcoat_gloss)
    d = gtr_1(dot(n, w_h), alpha)
    f = lerp(0.04, 1.0, schlick_weight(dot(w_i, n)))
    g = smith_shadowing_ggx(dot(n, w_i), 0.25) * smith_shadowing_ggx(dot(n, w_o), 0.25)
    return 0.25 * mat.clearcoat * d * f * g


def disney_sheen(mat: MaterialBatch, n, w_o, w_i):
    """(reference disney_bsdf.ih:300-309)"""
    lum = luminance(mat.base_color)
    tint = jnp.where(
        lum[..., None] > 0.0, mat.base_color / jnp.maximum(lum[..., None], 1e-20), 1.0
    )
    sheen_color = lerp(1.0, tint, mat.sheen_tint[..., None])
    f = schlick_weight(dot(w_i, n))
    return (f * mat.sheen)[..., None] * sheen_color


def disney_brdf(mat: MaterialBatch, n, w_o, w_i, v_x, v_y):
    """Full Disney BSDF evaluation (reference disney_bsdf.ih:311-332)."""
    same_hemi = same_hemisphere(w_o, w_i, n)

    # Transmission side
    spec_trans = disney_microfacet_transmission_isotropic(mat, n, w_o, w_i)
    trans_val = spec_trans * ((1.0 - mat.metallic) * mat.specular_transmission)[..., None]
    trans_val = jnp.where((mat.specular_transmission > 0.0)[..., None], trans_val, 0.0)

    # Reflection side
    coat = disney_clear_coat(mat, n, w_o, w_i)
    sheen = disney_sheen(mat, n, w_o, w_i)
    diffuse = disney_diffuse(mat, n, w_o, w_i)
    gloss_iso = disney_microfacet_isotropic(mat, n, w_o, w_i)
    gloss_aniso = disney_microfacet_anisotropic(mat, n, w_o, w_i, v_x, v_y)
    gloss = jnp.where((mat.anisotropy == 0.0)[..., None], gloss_iso, gloss_aniso)
    refl_val = (
        (diffuse + sheen)
        * ((1.0 - mat.metallic) * (1.0 - mat.specular_transmission))[..., None]
        + gloss
        + coat[..., None]
    )
    return jnp.where(same_hemi[..., None], refl_val, trans_val)


def disney_pdf(mat: MaterialBatch, n, w_o, w_i, v_x, v_y):
    """Mixture pdf over the sampled components (reference disney_bsdf.ih:334-359)."""
    alpha = jnp.maximum(_ALPHA_MIN, sqr(mat.roughness))
    aspect = jnp.sqrt(jnp.maximum(1.0 - mat.anisotropy * 0.9, 1e-8))
    alpha_x = jnp.maximum(_ALPHA_MIN, alpha / aspect)
    alpha_y = jnp.maximum(_ALPHA_MIN, alpha * aspect)
    clearcoat_alpha = lerp(0.1, 0.001, mat.clearcoat_gloss)

    diffuse = lambertian_pdf(w_i, n)
    clear_coat = gtr_1_pdf(w_o, w_i, n, clearcoat_alpha)
    micro_iso = gtr_2_pdf(w_o, w_i, n, alpha)
    micro_aniso = gtr_2_aniso_pdf(w_o, w_i, n, v_x, v_y, alpha_x, alpha_y)
    microfacet = jnp.where(mat.anisotropy == 0.0, micro_iso, micro_aniso)
    has_trans = mat.specular_transmission > 0.0
    micro_trans = jnp.where(
        has_trans, gtr_2_transmission_pdf(w_o, w_i, n, alpha, mat.ior), 0.0
    )
    n_comp = jnp.where(has_trans, 4.0, 3.0)
    return (diffuse + microfacet + micro_trans + clear_coat) / n_comp


def sample_disney_brdf(mat: MaterialBatch, n, w_o, v_x, v_y, rng_state):
    """Sample a continuation direction (reference disney_bsdf.ih:364-429).

    Returns (rng_state, bsdf_value, w_i, pdf). Invalid samples (reflection
    below the horizon, total internal reflection) return pdf=0, bsdf=0,
    w_i=0, matching the reference's terminate-on-invalid convention.
    """
    has_trans = mat.specular_transmission > 0.0
    rng_state, u_comp = rng.lcg_randomf(rng_state)
    n_comp = jnp.where(has_trans, 4.0, 3.0)
    max_comp = jnp.where(has_trans, 3, 2)
    component = jnp.clip((u_comp * n_comp).astype(jnp.int32), 0, max_comp)

    rng_state, samples = rng.lcg_randomf2(rng_state)

    alpha = jnp.maximum(_ALPHA_MIN, sqr(mat.roughness))
    aspect = jnp.sqrt(jnp.maximum(1.0 - mat.anisotropy * 0.9, 1e-8))
    alpha_x = jnp.maximum(_ALPHA_MIN, alpha / aspect)
    alpha_y = jnp.maximum(_ALPHA_MIN, alpha * aspect)

    # Component 0: diffuse
    w_i_diffuse = sample_lambertian_dir(n, v_x, v_y, samples)

    # Component 1: microfacet reflection (iso or aniso)
    w_h_iso = sample_gtr_2_h(n, v_x, v_y, alpha, samples)
    w_h_aniso = sample_gtr_2_aniso_h(n, v_x, v_y, alpha_x, alpha_y, samples)
    w_h_micro = jnp.where((mat.anisotropy == 0.0)[..., None], w_h_iso, w_h_aniso)
    w_i_micro = reflect(-w_o, w_h_micro)
    micro_valid = same_hemisphere(w_o, w_i_micro, n)

    # Component 2: clearcoat reflection
    cc_alpha = lerp(0.1, 0.001, mat.clearcoat_gloss)
    w_h_cc = sample_gtr_1_h(n, v_x, v_y, cc_alpha, samples)
    w_i_cc = reflect(-w_o, w_h_cc)
    cc_valid = same_hemisphere(w_o, w_i_cc, n)

    # Component 3: microfacet transmission
    w_h_t = sample_gtr_2_h(n, v_x, v_y, alpha, samples)
    w_h_t = jnp.where(dot(w_o, w_h_t)[..., None] < 0.0, -w_h_t, w_h_t)
    entering = dot(w_o, n) > 0.0
    eta = jnp.where(entering, 1.0 / mat.ior, mat.ior)
    w_i_t = refract(-w_o, w_h_t, eta)
    t_valid = dot(w_i_t, w_i_t) > 0.0

    # Component select via a where-chain, NOT jnp.choose: choose lowers to
    # a gather over the stacked (4, R, 3) lobe array, and XLA:TPU gathers
    # run ~12 ns/row sequentially (~35 ms per call at 921K lanes, two calls
    # per bounce — measured as the largest non-traversal op in the frame).
    c = component[..., None]
    w_i = jnp.where(
        c == 0,
        w_i_diffuse,
        jnp.where(c == 1, w_i_micro, jnp.where(c == 2, w_i_cc, w_i_t)),
    )
    valid = jnp.where(
        component == 0,
        jnp.ones_like(micro_valid),
        jnp.where(
            component == 1,
            micro_valid,
            jnp.where(component == 2, cc_valid, t_valid),
        ),
    )

    pdf = disney_pdf(mat, n, w_o, w_i, v_x, v_y)
    bsdf = disney_brdf(mat, n, w_o, w_i, v_x, v_y)

    pdf = jnp.where(valid, pdf, 0.0)
    bsdf = jnp.where(valid[..., None], bsdf, 0.0)
    w_i = jnp.where(valid[..., None], w_i, 0.0)
    return rng_state, bsdf, w_i, pdf
