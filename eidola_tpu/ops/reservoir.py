"""Weighted-reservoir (ReSTIR) algebra over SoA pytrees
(ref shaders/reservoir.glsl:26-128, shaders/host_device.h:260-284).

A reservoir is a dict pytree:
    {"sample": <pytree of per-lane arrays>, "num": f32 M, "weight": f32 wSum}
optionally with "big_w" for GI reservoirs (ref host_device.h:273-284).
All fields carry the same leading lane shape (pixels); ops are fully
vectorized — one `resv_update` call processes every pixel's reservoir at once,
which is the TPU-native replacement for the reference's per-thread scalar
reservoir structs.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _select_sample(cond, new_sample, old_sample):
    return jax.tree_util.tree_map(
        lambda a, b: jnp.where(
            cond.reshape(cond.shape + (1,) * (a.ndim - cond.ndim)), a, b
        ),
        new_sample,
        old_sample,
    )


def make_reservoir(sample, lane_shape, with_big_w: bool = False):
    """Fresh empty reservoirs (ref reservoir.glsl resvReset)."""
    r = {
        "sample": sample,
        "num": jnp.zeros(lane_shape, jnp.float32),
        "weight": jnp.zeros(lane_shape, jnp.float32),
    }
    if with_big_w:
        r["big_w"] = jnp.zeros(lane_shape, jnp.float32)
    return r


def resv_check(resv):
    """NaN guard: zero out invalid reservoirs (ref reservoir.glsl:26-44)."""
    bad = ~jnp.isfinite(resv["weight"])
    out = dict(resv)
    out["weight"] = jnp.where(bad, 0.0, resv["weight"])
    out["num"] = jnp.where(bad, 0.0, resv["num"])
    if "big_w" in resv:
        badw = bad | ~jnp.isfinite(resv["big_w"])
        out["big_w"] = jnp.where(badw, 0.0, resv["big_w"])
    return out


def resv_update(resv, sample, weight, u):
    """Streaming RIS update with one candidate per lane
    (ref reservoir.glsl:46-60).

    weight = pHat / pdf of the candidate; u = uniform [0,1) per lane.
    """
    weight = jnp.where(jnp.isfinite(weight) & (weight >= 0.0), weight, 0.0)
    w_sum = resv["weight"] + weight
    take = u * w_sum < weight  # replace stored sample with prob weight/w_sum
    out = dict(resv)
    out["weight"] = w_sum
    out["num"] = resv["num"] + 1.0
    out["sample"] = _select_sample(take, sample, resv["sample"])
    return out


def resv_merge_same_target(resv, other, u, enabled=None):
    """Merge two reservoirs whose target function is identical (DI temporal
    reuse at the reprojected pixel; ref reservoir.glsl:62-82).

    The merged weightSum is the sum; the incoming sample wins with probability
    other.weight / total.  `enabled` masks lanes where the neighbour is
    invalid (failed reprojection gates).
    """
    other = resv_check(other)
    ow = other["weight"]
    on = other["num"]
    if enabled is not None:
        ow = jnp.where(enabled, ow, 0.0)
        on = jnp.where(enabled, on, 0.0)
    w_sum = resv["weight"] + ow
    take = u * w_sum < ow
    out = dict(resv)
    out["weight"] = w_sum
    out["num"] = resv["num"] + on
    out["sample"] = _select_sample(take, other["sample"], resv["sample"])
    return out


def resv_merge_phat(resv, other, p_hat_other, u, enabled=None):
    """Generalized merge when the target function differs between domains
    (ref reservoir.glsl:84-114): incoming mass = pHat_dst(other.sample) *
    other.W * other.M, per the ReSTIR paper's combineReservoirs.

    `other` must carry "big_w" (its W at its own domain).
    """
    other = resv_check(other)
    w = p_hat_other * other["big_w"] * other["num"]
    w = jnp.where(jnp.isfinite(w) & (w >= 0.0), w, 0.0)
    on = other["num"]
    if enabled is not None:
        w = jnp.where(enabled, w, 0.0)
        on = jnp.where(enabled, on, 0.0)
    w_sum = resv["weight"] + w
    take = u * w_sum < w
    out = dict(resv)
    out["weight"] = w_sum
    out["num"] = resv["num"] + on
    out["sample"] = _select_sample(take, other["sample"], resv["sample"])
    return out


def resv_clamp(resv, max_num):
    """M-clamp to bound temporal staleness (ref reservoir.glsl:116-128;
    clamp = RISSampleNum * reservoirClamp at direct_stage.comp:219-222).

    Scales weightSum proportionally so the estimator stays consistent.
    """
    num = resv["num"]
    scale = jnp.where(num > max_num, max_num / jnp.maximum(num, 1e-20), 1.0)
    out = dict(resv)
    out["num"] = jnp.minimum(num, max_num)
    out["weight"] = resv["weight"] * scale
    return out


def resv_big_w(resv, p_hat):
    """Unbiased contribution weight W = wSum / (M * pHat)
    (ref direct_stage.comp:256-261)."""
    denom = resv["num"] * p_hat
    return jnp.where(denom > 1e-20, resv["weight"] / jnp.maximum(denom, 1e-20), 0.0)


def gather_reservoir(resv, idx):
    """Gather reservoir lanes at flat indices idx (motion-vector indexed
    temporal fetch, ref direct_stage.comp:47-84)."""
    def g(a):
        flat = a.reshape((-1,) + a.shape[resv["num"].ndim:])
        return flat[idx]
    return jax.tree_util.tree_map(g, resv)
