"""Row-band locality: shard-bounded image gathers + the band context.

Multi-chip EIDOLA shards the image by pixel rows (parallel/sharding.py).
Two op families in the frame would otherwise make XLA's SPMD partitioner
materialise cross-chip traffic proportional to the FULL image (measured
with tools/spmd_hlo.py: 40 MB of collectives per 8k-pixel frame, ~10 GB
extrapolated to 1080p — the masked all-reduce emulation of gathers along
the sharded row axis):

  1. dynamic image-space gathers — ReSTIR temporal reprojection and
     spatial neighbour taps read `img[motion_y, motion_x]`;
  2. the wavefront ray sort — a GLOBAL sort permutes ray state across
     row shards (and the traversal loop carrying that state inherits
     the resharding).

Both have bounded-locality structure the partitioner cannot see:
reprojection rows move a few dozen rows per frame, spatial taps are
radius-bounded, and the ray sort is perf-only (ANY permutation is
correct, so a band-local sort is as good).  This module makes the bound
explicit:

  * `halo_gather` clamps the row displacement to ±halo and gathers from
    a band-extended operand along an UNSHARDED axis, so SPMD lowers it
    to a 2·halo-row halo exchange (collective-permute) + local gather.
  * `get_bands()` is the trace-time band count.  Default 1 (single-chip
    code is untouched); `make_sharded_step` traces under
    `band_context(n_devices)` so every band-aware op (this module's
    gathers, the banded wavefront sort in ops/packets.py) splits along
    shard boundaries.

Reference contrast: the reference is single-GPU (SURVEY §2.4) and its
temporal taps (direct_stage.comp:47-84) read freely across the image;
the ±halo clamp is the TPU-native communication bound, and out-of-halo
reprojections are handled exactly like its failed gates (history
rejected — unbiased, more variance under extreme motion).
"""
from __future__ import annotations

import contextlib
import os

import jax
import jax.numpy as jnp

_BANDS = [int(os.environ.get("EIDOLA_BANDS", "1"))]


def get_bands() -> int:
    """Trace-time row-band count (1 = unbanded single-chip layout)."""
    return _BANDS[-1]


@contextlib.contextmanager
def band_context(n: int):
    """Trace band-aware ops split into `n` row bands (n = mesh size, or a
    multiple: every shard then owns a whole number of bands)."""
    _BANDS.append(max(int(n), 1))
    try:
        yield
    finally:
        _BANDS.pop()


def _flat_gather(a, ry, rx):
    ha, wa = a.shape[:2]
    flat = a.reshape((ha * wa,) + a.shape[2:])
    idx = (ry * wa + rx).reshape(-1)
    return flat[idx].reshape(ry.shape + a.shape[2:])


def halo_gather(a, ry, rx, halo: int, stride: int = 1, bands: int | None = None):
    """out[r, c] = a[ry', rx[r,c]] with ry' = ry clamped to r·stride ± halo.

    a:       (Ha, Wa, ...) source image (row-sharded under SPMD).
    ry, rx:  (Ho, Wo) int32 source coords, already clipped to valid range.
    stride:  output-row → source-row scale (2 when gathering a full-res
             source at half-res coords·2; Ha == Ho·stride).
    Returns (out, in_halo): out is (Ho, Wo) + a.shape[2:]; in_halo marks
    pixels whose REQUESTED row was within ±halo (AND it into accept
    gates — the clamp is only unbiased if clamped rows are rejected).

    With bands=B>1 (trace under band_context) and divisible shapes, the
    gather runs per band against a (Hab + 2·halo)-row extended operand:
    the extension is static slices (→ SPMD halo exchange of 2·halo rows)
    and the index arithmetic stays inside the band, so no full-image
    collective is emitted.  Falls back to the flat gather (identical
    values) when shapes don't divide.
    """
    ha, wa = a.shape[:2]
    ho, wo = ry.shape
    b = get_bands() if bands is None else bands
    own = jnp.arange(ho, dtype=jnp.int32)[:, None] * stride
    dy = ry - own
    in_halo = (dy >= -halo) & (dy <= halo)
    ry_c = jnp.clip(jnp.clip(dy, -halo, halo) + own, 0, ha - 1)
    if b <= 1 or ha % b or ho % b or ha // b != (ho // b) * stride:
        return _flat_gather(a, ry_c, rx), in_halo
    hab, hob = ha // b, ho // b
    pad = ((halo, halo),) + ((0, 0),) * (a.ndim - 1)
    padded = jnp.pad(a, pad, mode="edge")
    ext = jnp.stack([
        jax.lax.slice_in_dim(padded, k * hab, k * hab + hab + 2 * halo, axis=0)
        for k in range(b)
    ])                                        # (B, Hab + 2·halo, Wa, ...)
    band_start = (jnp.arange(ho, dtype=jnp.int32)[:, None] // hob) * hab
    j = ry_c - band_start + halo              # ∈ [0, Hab + 2·halo)
    jb = j.reshape(b, hob, wo)
    xb = rx.reshape(b, hob, wo)

    def per_band(ext_k, j_k, x_k):
        flat = ext_k.reshape((-1,) + ext_k.shape[2:])
        return flat[(j_k * wa + x_k).reshape(-1)]

    out = jax.vmap(per_band)(ext, jb, xb)
    return out.reshape((ho, wo) + a.shape[2:]), in_halo


def halo_gather_tree(tree, ry, rx, halo: int, stride: int = 1):
    """halo_gather every leaf of a pytree of (Ha, Wa, ...) images with one
    shared (ry, rx); returns (gathered tree, in_halo mask)."""
    mask = {}

    def g(a):
        out, m = halo_gather(a, ry, rx, halo, stride)
        mask["m"] = m
        return out

    out = jax.tree_util.tree_map(g, tree)
    return out, mask["m"]
