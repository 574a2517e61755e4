"""O(1) discrete sampling via alias tables
(ref src/alias_table.hpp:21-126, shaders/host_device.h:287-293).

Build is host-side numpy (load-time, like the reference's CPU build in
scene.cpp:700-772 / hdr_sampling.cpp:107-176); sampling is a two-gather jnp
op run per candidate on device.  Each entry stores {alias, q, pdf, alias_pdf}
so a single gather yields both the redirect and the pdf of whichever bin wins
(the reference packs the same four fields into ImptSampData).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class AliasTable(NamedTuple):
    alias: jnp.ndarray      # (N,) int32 redirect index
    q: jnp.ndarray          # (N,) float32 acceptance threshold
    pdf: jnp.ndarray        # (N,) float32 normalized pmf of bin i
    alias_pdf: jnp.ndarray  # (N,) float32 normalized pmf of alias[i]


def build_alias_table_np(weights: np.ndarray):
    """Walker/Vose two-stack construction (ref alias_table.hpp:21-63).

    Returns (alias i32, q f32, pdf f32, alias_pdf f32) numpy arrays and the
    total weight (the integral, used e.g. for the env firefly clamp,
    sample_example.cpp:97-106).
    """
    w = np.asarray(weights, np.float64).ravel()
    n = w.size
    total = float(w.sum())
    if n == 0 or total <= 0.0:
        z = np.zeros(max(n, 1), np.float32)
        return (
            np.zeros(max(n, 1), np.int32),
            np.ones(max(n, 1), np.float32),
            z,
            z,
            0.0,
        )
    pdf = (w / total).astype(np.float64)
    scaled = pdf * n
    alias = np.arange(n, dtype=np.int32)
    q = np.ones(n, np.float64)

    small = [i for i in range(n) if scaled[i] < 1.0]
    large = [i for i in range(n) if scaled[i] >= 1.0]
    while small and large:
        s = small.pop()
        l = large.pop()
        q[s] = scaled[s]
        alias[s] = l
        scaled[l] = (scaled[l] + scaled[s]) - 1.0
        (small if scaled[l] < 1.0 else large).append(l)
    for i in small + large:
        q[i] = 1.0
        alias[i] = i

    alias_pdf = pdf[alias]
    return (
        alias.astype(np.int32),
        q.astype(np.float32),
        pdf.astype(np.float32),
        alias_pdf.astype(np.float32),
        total,
    )


def make_alias_table(weights: np.ndarray) -> tuple[AliasTable, float]:
    from ..native import build_alias_native

    w = np.asarray(weights, np.float64).ravel()
    out = build_alias_native(w) if w.size else None
    if out is not None:
        alias, q, pdf, alias_pdf, total = out
        if w.size == 0 or total <= 0.0:
            alias, q, pdf, alias_pdf, total = build_alias_table_np(weights)
    else:
        alias, q, pdf, alias_pdf, total = build_alias_table_np(weights)
    # numpy leaves: the scene uploader batches all tables into one transfer
    # (utils/transfer.py); standalone users auto-convert on first device op.
    return AliasTable(alias, q, pdf, alias_pdf), total


def sample_alias(table: AliasTable, u1, u2):
    """Draw from the table: uniform bin pick + alias redirect
    (ref alias_table.hpp:70-74, env_sampling.glsl:38-99).

    Returns (index i32, pmf f32).  pmf is the *normalized* probability of the
    returned index (multiply by N for the density relative to uniform).
    """
    n = table.alias.shape[0]
    idx = jnp.minimum((u1 * n).astype(jnp.int32), n - 1)
    qv = table.q[idx]
    take = u2 < qv
    out_idx = jnp.where(take, idx, table.alias[idx])
    out_pmf = jnp.where(take, table.pdf[idx], table.alias_pdf[idx])
    return out_idx, out_pmf
