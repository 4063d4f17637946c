"""BSDF statistical tests (SURVEY.md §4a): pdf <-> sample consistency and
white-furnace energy conservation."""
import numpy as np
import jax.numpy as jnp
import pytest

import terra_tpu as tt
from terra_tpu import bsdf
from terra_tpu.ops import math3, rng as rng_mod
from terra_tpu.surface import Surface


def _make_surface(n, bsdf_type, attrs_fn):
    normal = jnp.asarray(np.tile([[0.0, 1.0, 0.0]], (n, 1)).astype(np.float32))
    tangent, bitangent = math3.build_basis(normal)
    attrs = np.zeros((n, 8, 3), np.float32)
    attrs_fn(attrs)
    return Surface(
        point=jnp.zeros((n, 3)), normal=normal, tangent=tangent, bitangent=bitangent,
        uv=jnp.zeros((n, 2)), attrs=jnp.asarray(attrs), emissive=jnp.zeros((n, 3)),
        mat_id=jnp.zeros((n,), jnp.int32),
        bsdf_type=jnp.full((n,), int(bsdf_type), jnp.int32),
        ior=jnp.full((n,), 1.5), t=jnp.ones((n,)),
        obj_id=jnp.zeros((n,), jnp.int32), tri_area=jnp.ones((n,)),
    )


def _uniforms(n, seed):
    k = rng_mod.key_from_seed(seed)
    pix = jnp.arange(n, dtype=jnp.uint32)
    e0 = rng_mod.path_uniform(k, pix, 0, 0, 2)
    e1 = rng_mod.path_uniform(k, pix, 0, 0, 3)
    e2 = rng_mod.path_uniform(k, pix, 0, 0, 4)
    return e0, e1, e2


def _wo(n):
    w = np.tile([[0.2, 0.9, 0.1]], (n, 1)).astype(np.float32)
    return jnp.asarray(w / np.linalg.norm(w, axis=-1, keepdims=True))


@pytest.mark.parametrize("ty,setup", [
    (tt.BSDFType.DIFFUSE, lambda a: a.__setitem__((slice(None), 0), (1.0, 1.0, 1.0))),
    (tt.BSDFType.GGX, lambda a: (
        a.__setitem__((slice(None), 0), (1.0, 1.0, 1.0)),
        a.__setitem__((slice(None), 1), (0.5, 0, 0)),
        a.__setitem__((slice(None), 2), (0.2, 0, 0)),
    )),
])
def test_white_furnace_bounded(ty, setup):
    """E[f * NoL / pdf] for a white BSDF must be <= ~1 (energy conservation)
    and ~1 for pure diffuse."""
    n = 1 << 15
    surf = _make_surface(n, ty, setup)
    wo = _wo(n)
    e0, e1, e2 = _uniforms(n, 3)
    present = (int(ty),)
    wi, aux = bsdf.sample(surf, e0, e1, e2, wo, present)
    pdf = jnp.maximum(bsdf.pdf(surf, wi, wo, aux, present), 1e-6)
    f = bsdf.eval_f(surf, wi, wo, present)
    nol = jnp.maximum(math3.dot(surf.normal, wi), 0.0)
    est = np.asarray(f[:, 0] * nol / pdf)
    mean = est.mean()
    assert np.isfinite(est).all()
    if ty == tt.BSDFType.DIFFUSE:
        assert abs(mean - 1.0) < 0.02, mean
    else:
        assert mean < 1.15, mean  # microfacet w/o multi-scatter loses energy
        assert mean > 0.3, mean


def test_pdf_integrates_to_one_diffuse():
    """Monte-Carlo check that the cosine pdf integrates to 1 over the
    hemisphere: uniform-hemisphere samples, E[pdf / uniform_pdf] == 1."""
    n = 1 << 15
    surf = _make_surface(n, tt.BSDFType.DIFFUSE, lambda a: a.__setitem__((slice(None), 0), (0.5, 0.5, 0.5)))
    rng = np.random.default_rng(0)
    v = rng.normal(size=(n, 3)).astype(np.float32)
    v[:, 1] = np.abs(v[:, 1])
    wi = jnp.asarray(v / np.linalg.norm(v, axis=-1, keepdims=True))
    pdf = np.asarray(bsdf.pdf(surf, wi, _wo(n), jnp.zeros(n), (0,)))
    # uniform hemisphere pdf = 1/(2 pi)
    integral = (pdf * 2 * np.pi).mean()
    assert abs(integral - 1.0) < 0.05, integral


def test_sample_pdf_chi2_diffuse():
    """Chi-square-style binning: observed sample frequencies in cos-theta
    bins match the cosine pdf prediction."""
    n = 1 << 16
    surf = _make_surface(n, tt.BSDFType.DIFFUSE, lambda a: a.__setitem__((slice(None), 0), (0.5, 0.5, 0.5)))
    e0, e1, e2 = _uniforms(n, 9)
    wi, _ = bsdf.sample(surf, e0, e1, e2, _wo(n), (0,))
    cos_t = np.asarray(math3.dot(surf.normal, wi))
    bins = np.linspace(0, 1, 11)
    observed, _ = np.histogram(cos_t, bins=bins)
    observed = observed / n
    # P(cos in [a,b]) for cosine-weighted = b^2 - a^2
    expected = bins[1:] ** 2 - bins[:-1] ** 2
    assert np.abs(observed - expected).max() < 0.01


def test_phong_lobe_mixture_frequencies():
    """The phong diffuse/specular pick frequency matches kd."""
    n = 1 << 15

    def setup(a):
        a[:, 0] = (0.6, 0.6, 0.6)  # albedo sum 1.8
        a[:, 1] = (0.3, 0.3, 0.3)  # spec sum 0.9 -> ks = 0.5*0.9/1.8 = 0.25
        a[:, 2] = (32.0, 0, 0)

    surf = _make_surface(n, tt.BSDFType.PHONG, setup)
    e0, e1, e2 = _uniforms(n, 5)
    wi, aux = bsdf.sample(surf, e0, e1, e2, _wo(n), (1,))
    frac_diffuse = float((np.asarray(aux) > 0).mean())
    assert abs(frac_diffuse - 0.75) < 0.02, frac_diffuse


def test_mirror_sample_is_reflection():
    n = 128
    surf = _make_surface(n, tt.BSDFType.MIRROR, lambda a: a.__setitem__((slice(None), 0), (0.9, 0.9, 0.9)))
    wo = _wo(n)
    e0, e1, e2 = _uniforms(n, 1)
    wi, _ = bsdf.sample(surf, e0, e1, e2, wo, (3,))
    wr = math3.reflect(wo, surf.normal)
    np.testing.assert_allclose(np.asarray(wi), np.asarray(wr), atol=1e-5)
    # eval * NoL / pdf returns exactly the mirror color on the sampled ray
    f = bsdf.eval_f(surf, wi, wo, (3,))
    pdf = bsdf.pdf(surf, wi, wo, jnp.zeros(n), (3,))
    nol = math3.dot(surf.normal, wi)
    np.testing.assert_allclose(
        np.asarray(f * (nol / pdf)[:, None])[:, 0], 0.9, atol=1e-4
    )


# ------------------------------------------------------------------- disney

def _disney_setup(metal, rough, clearcoat=0.0, aniso=0.0):
    def setup(a):
        a[:, 0] = (0.8, 0.6, 0.4)        # base color
        a[:, 1] = (0.5, 0.0, 0.0)        # specular, tint
        a[:, 3] = (clearcoat, 0.8, 0.0)  # clearcoat, gloss
        a[:, 4] = (metal, rough, 0.0)    # metalness, roughness
        a[:, 5] = (aniso, 0.0, 0.0)      # anisotropic, subsurface
    return setup


@pytest.mark.parametrize("metal,rough,clearcoat", [
    (0.0, 0.6, 0.0), (1.0, 0.3, 0.0), (0.4, 0.5, 0.8),
])
def test_disney_pdf_integrates_to_one(metal, rough, clearcoat):
    """The Disney mixture pdf must integrate to ~1 over the hemisphere:
    E[pdf/uniform_pdf] with uniform-hemisphere wi."""
    n = 1 << 16
    surf = _make_surface(n, tt.BSDFType.DISNEY, _disney_setup(metal, rough, clearcoat))
    rng = np.random.default_rng(2)
    v = rng.normal(size=(n, 3)).astype(np.float32)
    v[:, 1] = np.abs(v[:, 1])
    wi = jnp.asarray(v / np.linalg.norm(v, axis=-1, keepdims=True))
    present = (int(tt.BSDFType.DISNEY),)
    pdf = np.asarray(bsdf.pdf(surf, wi, _wo(n), jnp.zeros(n), present))
    assert np.isfinite(pdf).all() and (pdf >= 0).all()
    integral = (pdf * 2 * np.pi).mean()
    # GTR tails are heavy; MC error + below-horizon specular mass allow ~10%
    assert abs(integral - 1.0) < 0.1, integral


@pytest.mark.parametrize("metal,rough", [(0.0, 0.7), (1.0, 0.4), (0.5, 0.25)])
def test_disney_furnace_bounded(metal, rough):
    """E[f * NoL / pdf] stays bounded and positive (consistent estimator)."""
    n = 1 << 15
    surf = _make_surface(n, tt.BSDFType.DISNEY, _disney_setup(metal, rough, clearcoat=0.5))
    wo = _wo(n)
    e0, e1, e2 = _uniforms(n, 5)
    present = (int(tt.BSDFType.DISNEY),)
    wi, aux = bsdf.sample(surf, e0, e1, e2, wo, present)
    pdf = jnp.maximum(bsdf.pdf(surf, wi, wo, aux, present), 1e-6)
    f = bsdf.eval_f(surf, wi, wo, present)
    nol = jnp.maximum(math3.dot(surf.normal, wi), 0.0)
    est = np.asarray(f * nol[:, None] / pdf[:, None])
    assert np.isfinite(est).all()
    mean = est.mean(axis=0)
    assert (mean > 0.01).all(), mean
    assert (mean < 2.0).all(), mean  # reflectance estimate can't exceed ~1 + tail noise


def test_disney_sample_prefers_specular_when_metal():
    """A metallic smooth surface concentrates samples near the mirror
    direction (importance sampling actually follows the GTR2 lobe)."""
    n = 1 << 14
    surf = _make_surface(n, tt.BSDFType.DISNEY, _disney_setup(1.0, 0.2))
    wo = _wo(n)
    e0, e1, e2 = _uniforms(n, 8)
    present = (int(tt.BSDFType.DISNEY),)
    wi, _ = bsdf.sample(surf, e0, e1, e2, wo, present)
    wr = math3.reflect(wo, surf.normal)
    cos_to_mirror = np.asarray(math3.dot(wi, wr))
    # diffuse-only sampling gives E[cos to mirror] ~ 0.37; lobe-following much higher
    assert cos_to_mirror.mean() > 0.7, cos_to_mirror.mean()
