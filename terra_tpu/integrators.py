"""Wavefront integrator passes: simple / NEE / MIS / debug AOVs.

Re-architecture of the reference integrators
(/root/reference/src/Terra.c:1099-1587): the scalar per-path switch becomes
a statically-selected wavefront pass that runs for every active lane of the
bounce. Each pass returns per-lane radiance *already multiplied by
throughput* (the reference multiplies at its exit labels, Terra.c:1424,
1585).

All passes share one context: the per-bounce surface batch, the outgoing
direction, the RNG handle, and a closure for nested raycasts (shadow rays /
BSDF-strategy rays).
"""
from __future__ import annotations

from typing import Callable

import jax.numpy as jnp
import numpy as np

from . import bsdf, lights
from .ops import math3
from .ops.rng import PathStreams as S
from .scene import Integrator, Scene
from .surface import Surface, surface_init

__all__ = ["make_integrator"]

EPS = np.float32(1e-4)
FAR_PLANE = np.float32(500.0)  # debug-depth far plane (Terra.c:1154)
# Shadow-ray range: hits within t_max*(1-1e-3) occlude; the sampled light
# point itself (t ~= t_max) never counts as its own occluder.
SHADOW_TMAX_SCALE = np.float32(1.0 - 1e-3)


PDF_CLAMP = np.float32(1e17)  # keeps pdf^2 finite in f32 (1e34 << 3.4e38)


def _power2_weight(pa, pb):
    """Power-2 MIS heuristic weight for strategy a vs b (Terra.c:1505-1513).
    Near-delta lobes produce pdfs up to ~1e19 whose square overflows f32
    (inf/inf -> NaN); clamping both pdfs first is weight-preserving where it
    matters (the clamped regime has weight ~ 0 or ~ 1). The NumPy mirror
    (testing/mirror.py) applies the identical clamp."""
    pa = jnp.minimum(pa, PDF_CLAMP)
    pb = jnp.minimum(pb, PDF_CLAMP)
    return (pa * pa) / jnp.maximum(pa * pa + pb * pb, np.float32(1e-20))


def _emit_gate(ctx, bounce):
    """Emissive-pickup gate for DIRECT/DIRECT_MIS. The reference adds hit
    emissive only at bounce 0 (Terra.c:1357-1360, 1440-1443) because NEE +
    the MIS BSDF strategy cover direct light at every later vertex — but
    neither strategy can see a light through a delta (MIRROR/GLASS) lobe.
    ``ctx['emit_ok']`` is the per-lane specular-bounce flag maintained by
    the wavefront driver (render.py): True at bounce 0 and whenever the
    previous bounce was a delta lobe, so mirrors/glass show lights. None
    (delta-free scene) falls back to the reference's bounce-0 gate."""
    ok = ctx.get("emit_ok")
    if ok is None:
        return bounce == 0
    return ok


def _skip_delta(ctx, mask):
    """AND ``mask`` with not-delta: NEE and the MIS BSDF strategy do not
    apply at delta lanes (their radiance flows through the path
    continuation + the emit_ok gate instead). No-op for delta-free scenes."""
    delta = ctx.get("delta")
    if delta is None:
        return mask
    return mask & ~delta


def _shadow_ray(surf: Surface, wi, ctx=None):
    """Next ray from a surface: origin offset along the shading normal
    (terra_surface_ray, Terra.c:1715-1724). When the wavefront's active
    mask rides in ctx, dead lanes become canonical miss rays so the BVH
    coherence sort packs them into trivially-terminating packets."""
    from .intersect import mask_dead_rays

    o, d = surf.point + surf.normal * np.float32(1e-4), wi
    if ctx is not None and ctx.get("active") is not None:
        o, d = mask_dead_rays(ctx["active"], o, d)
    return o, d


def _integrate_simple(ctx, surf: Surface, wo, throughput, bounce):
    """Emissive-only (terra_integrate_simple, Terra.c:1339-1347): emissive
    whenever the surface faces the viewer, at every bounce."""
    facing = math3.dot(wo, surf.normal) > 0.0
    return jnp.where(facing[..., None], surf.emissive, 0.0) * throughput


def _nee_light_strategy(ctx, surf: Surface, wo, bounce, want_weight: bool, aux):
    """Shared light-sampling strategy for DIRECT and DIRECT_MIS
    (Terra.c:1366-1421 and 1452-1515).

    Returns (contribution, weight_debug). ``want_weight`` selects the MIS
    power-2 weighting; DIRECT uses weight = 1. ``aux`` is the current
    bounce's BSDF lobe pick for pdf evaluation (reference threads it through
    a surface attribute slot; see bsdf.py).
    """
    scene: Scene = ctx["scene"]
    rng = ctx["rng"]
    raycast = ctx["raycast"]

    e_pick = rng(bounce, S.LIGHT_PICK)
    e1 = rng(bounce, S.LIGHT_U)
    e2 = rng(bounce, S.LIGHT_V)
    ls = lights.pick_and_sample(
        scene, e_pick, e1, e2, area_weighted=ctx.get("light_area", False),
        table=ctx["tables"].light,
    )

    p_to_light = ls.pos - surf.point
    wi = math3.normalize(p_to_light)
    o_sh, d_sh = _shadow_ray(surf, wi, ctx)
    # Ranged occlusion query: anything strictly closer than the sampled
    # light point blocks it. The per-ray t_max also SEEDS the traversal's
    # best-t, pruning every subtree beyond the light — shadow rays cost a
    # fraction of a closest-hit walk. (The reference instead closest-hits
    # and requires hit.primitive == picked, Terra.c:1403; equivalent up to
    # coplanar-overlap corner cases, and this needs no hit-surface rebuild.)
    t_light = math3.length(ls.pos - o_sh) * SHADOW_TMAX_SCALE
    # any_hit: occlusion needs only the boolean, and an any-hit walk lets
    # occluded lanes stop dilating the packet union (kernel early-out).
    # sort_hint: shadow rays leave the current hit surface — the parent-hit
    # coherence key applies exactly as it does to extension rays.
    occ = raycast(o_sh, d_sh, t_max=t_light, any_hit=True,
                  sort_hint=ctx.get("hit_tri"))
    visible = ~occ.hit

    cos_l = math3.dot(ls.normal, -wi)  # cos at the light (Terra.c:1411)
    visible = visible & (cos_l > 0.0)
    visible = _skip_delta(ctx, visible)

    # Solid-angle-converted area pdf (Terra.c:1418): d^2 / |cos * area|.
    light_pdf = math3.sqlen(p_to_light) / jnp.maximum(
        jnp.abs(cos_l * ls.area), np.float32(1e-12)
    )
    f = bsdf.eval_f(surf, wi, wo, ctx["present"])
    nol = math3.dot(wi, surf.normal)

    # Emissive at the sampled light point (equal to the reference's
    # hit-surface emissive whenever the sample is visible — same point).
    Le = ls.emissive

    if want_weight:
        bsdf_pdf = bsdf.pdf(surf, wi, wo, aux, ctx["present"])
        weight = _power2_weight(light_pdf, bsdf_pdf)
        visible = visible & (light_pdf != 0.0)
    else:
        weight = jnp.ones_like(light_pdf)

    # Safe masked division (grad-safe): invalid lanes divide by 1, not 0.
    denom = jnp.where(visible, light_pdf * ls.pick_pdf, 1.0)
    contrib = Le * f * (nol * weight / denom)[..., None]
    contrib = jnp.where(visible[..., None], contrib, 0.0)
    return contrib, jnp.where(visible, weight, 0.0), ls


def _nee_env_strategy(ctx, surf: Surface, wo, bounce, want_weight: bool, aux):
    """Environment next-event estimation (extension; see envmap.py): draw a
    direction from the env proposal, require the shadow ray to escape the
    scene, weight by the solid-angle pdf (MIS power-2 vs the BSDF pdf when
    ``want_weight``). Only active when ctx['env_dist'] is set."""
    from . import envmap

    scene: Scene = ctx["scene"]
    rng = ctx["rng"]
    raycast = ctx["raycast"]
    env_dist = ctx["env_dist"]

    e1 = rng(bounce, S.ENV_U)
    e2 = rng(bounce, S.ENV_V)
    wi, env_pdf = envmap.sample(env_dist, e1, e2)

    nol = math3.dot(wi, surf.normal)
    o_sh, d_sh = _shadow_ray(surf, wi, ctx)
    # escape test: boolean only
    hit = raycast(o_sh, d_sh, any_hit=True, sort_hint=ctx.get("hit_tri"))
    visible = (~hit.hit) & (nol > 0.0) & (env_pdf > 0.0)
    visible = _skip_delta(ctx, visible)

    f = bsdf.eval_f(surf, wi, wo, ctx["present"])
    Le = envmap.radiance(scene, wi)

    if want_weight:
        bsdf_pdf = bsdf.pdf(surf, wi, wo, aux, ctx["present"])
        weight = _power2_weight(env_pdf, bsdf_pdf)
    else:
        weight = jnp.ones_like(env_pdf)

    denom = jnp.where(visible, env_pdf, 1.0)  # grad-safe masked division
    contrib = Le * f * (nol * weight / denom)[..., None]
    return jnp.where(visible[..., None], contrib, 0.0)


def _mis_bsdf_env_term(ctx, surf: Surface, wo, wi, f, bsdf_pdf, hit):
    """Env contribution of the MIS BSDF strategy: when the strategy ray
    escapes, add env radiance MIS-weighted against the env-NEE pdf (the
    standard counterpart of _nee_env_strategy; covers specular lobes)."""
    from . import envmap

    scene: Scene = ctx["scene"]
    env_pdf = envmap.pdf(ctx["env_dist"], wi)
    nol = math3.dot(wi, surf.normal)
    ok = (~hit.hit) & (bsdf_pdf > 0.0) & (nol > 0.0)
    ok = _skip_delta(ctx, ok)
    weight = _power2_weight(bsdf_pdf, env_pdf)
    Le = envmap.radiance(scene, wi)
    denom = jnp.where(ok, bsdf_pdf, 1.0)
    contrib = Le * f * (nol * weight / denom)[..., None]
    return jnp.where(ok[..., None], contrib, 0.0)


def _mis_bsdf_strategy(ctx, surf: Surface, wo, bounce, ls):
    """BSDF-sampling strategy of DIRECT_MIS (Terra.c:1516-1583): sample the
    BSDF (independent streams from the path continuation), trace it, and if
    it lands on the same light *object* NEE picked, weight by power-2.

    Returns (contribution, weight_debug, wi)."""
    scene: Scene = ctx["scene"]
    rng = ctx["rng"]
    raycast = ctx["raycast"]

    e0 = rng(bounce, S.MIS_E0)
    e1 = rng(bounce, S.MIS_E1)
    e2 = rng(bounce, S.MIS_E2)
    wi, aux = bsdf.sample(surf, e0, e1, e2, wo, ctx["present"])
    f = bsdf.eval_f(surf, wi, wo, ctx["present"])
    bsdf_pdf = bsdf.pdf(surf, wi, wo, aux, ctx["present"])

    o_sh, d_sh = _shadow_ray(surf, wi, ctx)
    hit = raycast(o_sh, d_sh, sort_hint=ctx.get("hit_tri"))
    hit_surf = surface_init(scene, ctx["tables"], o_sh + d_sh * np.float32(1e-3), d_sh, hit.tri)

    # Reference acceptance (Terra.c:1543): the hit object must be the light
    # object that NEE picked this bounce.
    geom = scene.geometry
    same_object = hit_surf.obj_id == geom.obj_id[ls.tri_idx]
    ok = hit.hit & same_object

    now = math3.dot(hit_surf.normal, -wi)  # cos at the light hit (Terra.c:1554)
    ok = ok & (now > 0.0)
    ok = _skip_delta(ctx, ok)

    dist2 = math3.sqlen(hit_surf.point - surf.point)
    hit_area = hit_surf.tri_area
    light_pdf = dist2 / jnp.maximum(now * hit_area, np.float32(1e-12))
    weight = _power2_weight(bsdf_pdf, light_pdf)
    ok = ok & (bsdf_pdf != 0.0)

    nol = math3.dot(wi, surf.normal)
    denom = jnp.where(ok, bsdf_pdf, 1.0)  # grad-safe masked division
    contrib = hit_surf.emissive * f * (nol * weight / denom)[..., None]
    contrib = jnp.where(ok[..., None], contrib, 0.0)
    if ctx.get("env_dist") is not None:
        contrib = contrib + _mis_bsdf_env_term(ctx, surf, wo, wi, f, bsdf_pdf, hit)
    return contrib, jnp.where(ok, weight, 0.0)


def _integrate_direct(ctx, surf: Surface, wo, throughput, bounce):
    """Next-event estimation (terra_integrate_direct, Terra.c:1349-1426)."""
    facing = (math3.dot(wo, surf.normal) > 0.0) & _emit_gate(ctx, bounce)
    Lo = jnp.where(facing[..., None], surf.emissive, 0.0)
    contrib, _, _ = _nee_light_strategy(ctx, surf, wo, bounce, want_weight=False, aux=None)
    if ctx.get("env_dist") is not None:
        contrib = contrib + _nee_env_strategy(ctx, surf, wo, bounce, want_weight=False, aux=None)
    return (Lo + contrib) * throughput


def _integrate_direct_mis(ctx, surf: Surface, wo, throughput, bounce):
    """NEE + BSDF sampling with power-2 MIS (terra_integrate_direct_mis,
    Terra.c:1428-1587)."""
    facing = (math3.dot(wo, surf.normal) > 0.0) & _emit_gate(ctx, bounce)
    Lo = jnp.where(facing[..., None], surf.emissive, 0.0)
    # The reference samples the BSDF before the light strategy and reuses
    # the lobe pick for the light-strategy pdf; we evaluate the pdf with the
    # aux of the MIS bsdf sample for the same effect.
    rng = ctx["rng"]
    e0 = rng(bounce, S.MIS_E0)
    e1 = rng(bounce, S.MIS_E1)
    e2 = rng(bounce, S.MIS_E2)
    _, aux = bsdf.sample(surf, e0, e1, e2, wo, ctx["present"])
    light_c, _, ls = _nee_light_strategy(ctx, surf, wo, bounce, want_weight=True, aux=aux)
    bsdf_c, _ = _mis_bsdf_strategy(ctx, surf, wo, bounce, ls)
    Lo = Lo + light_c + bsdf_c
    if ctx.get("env_dist") is not None:
        Lo = Lo + _nee_env_strategy(ctx, surf, wo, bounce, want_weight=True, aux=aux)
    return Lo * throughput


def _integrate_debug_mono(ctx, surf, wo, throughput, bounce):
    """White on first hit (Terra.c:1140-1146)."""
    first = (bounce == 0) & jnp.ones(surf.t.shape, bool)
    return jnp.where(first[..., None], 1.0, 0.0)


def _integrate_debug_depth(ctx, surf, wo, throughput, bounce):
    """Linear depth / 500 (Terra.c:1148-1157); distance from the bounce-0
    ray origin (the camera)."""
    o_orig = ctx["ray_origin"]
    d = math3.length(surf.point - o_orig) / FAR_PLANE
    first = (bounce == 0) & jnp.ones(surf.t.shape, bool)
    return jnp.where(first[..., None], d[..., None], 0.0)


def _integrate_debug_normals(ctx, surf, wo, throughput, bounce):
    """Signed-normal color map (Terra.c:1159-1197)."""
    px = jnp.array([1.0, 0.0, 0.0], jnp.float32)
    py = jnp.array([0.0, 1.0, 0.0], jnp.float32)
    pz = jnp.array([0.0, 0.0, 1.0], jnp.float32)
    nx = jnp.array([0.0, 1.0, 1.0], jnp.float32)
    ny = jnp.array([1.0, 0.0, 1.0], jnp.float32)
    nz = jnp.array([1.0, 1.0, 0.0], jnp.float32)
    n = surf.normal
    p = jnp.clip(n, 0.0, 1.0)
    m = -jnp.clip(n, -1.0, 0.0)
    color = (
        p[..., 0:1] * px + p[..., 1:2] * py + p[..., 2:3] * pz
        + m[..., 0:1] * nx + m[..., 1:2] * ny + m[..., 2:3] * nz
    )
    first = (bounce == 0) & jnp.ones(surf.t.shape, bool)
    return jnp.where(first[..., None], color, 0.0)


def _integrate_debug_mis_weights(ctx, surf, wo, throughput, bounce):
    """MIS weight visualization (Terra.c:1199-1337): light-strategy weight
    in blue, bsdf-strategy weight in red, bounce 0 only."""
    rng = ctx["rng"]
    e0 = rng(bounce, S.MIS_E0)
    e1 = rng(bounce, S.MIS_E1)
    e2 = rng(bounce, S.MIS_E2)
    _, aux = bsdf.sample(surf, e0, e1, e2, wo, ctx["present"])
    _, w_light, ls = _nee_light_strategy(ctx, surf, wo, bounce, want_weight=True, aux=aux)
    _, w_bsdf = _mis_bsdf_strategy(ctx, surf, wo, bounce, ls)
    color = jnp.stack([w_bsdf, jnp.zeros_like(w_bsdf), w_light], axis=-1)
    first = (bounce == 0) & jnp.ones(surf.t.shape, bool)
    return jnp.where(first[..., None], color, 0.0) * throughput


_TABLE = {
    Integrator.SIMPLE: _integrate_simple,
    Integrator.DIRECT: _integrate_direct,
    Integrator.DIRECT_MIS: _integrate_direct_mis,
    Integrator.DEBUG_MONO: _integrate_debug_mono,
    Integrator.DEBUG_DEPTH: _integrate_debug_depth,
    Integrator.DEBUG_NORMALS: _integrate_debug_normals,
    Integrator.DEBUG_MIS_WEIGHTS: _integrate_debug_mis_weights,
}


def make_integrator(kind: Integrator) -> Callable:
    """Static integrator dispatch (terra_integrate, Terra.c:1099-1137)."""
    return _TABLE[Integrator(kind)]
