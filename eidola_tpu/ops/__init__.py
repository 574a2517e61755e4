"""Low-level device ops: math helpers, codecs, RNG, reservoirs, BVH, intersection."""
