"""Raw gather / sort / scatter throughput on the live device — the
primitives that decide between per-ray and per-packet traversal designs."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(f, *args, iters=10, warmup=3):
    for _ in range(warmup):
        out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    R = 2_073_600
    rng = np.random.default_rng(0)
    for n_rows, width in [(2048, 8), (2048, 1), (65536, 8), (65536, 1),
                          (1 << 20, 8), (2048, 32)]:
        table = jnp.asarray(
            rng.standard_normal((n_rows, width)).astype(np.float32)
        )
        idx = jnp.asarray(rng.integers(0, n_rows, R).astype(np.int32))
        f = jax.jit(lambda t, i: jnp.sum(t[i], axis=-1))
        ms = timeit(f, table, idx)
        rows_per_s = R / (ms * 1e-3)
        print(f"gather table=({n_rows:7d},{width:2d})  {ms:7.2f} ms  "
              f"{rows_per_s/1e9:.2f} Grows/s  "
              f"{rows_per_s*width*4/1e9:.0f} GB/s")

    # sort throughput (wavefront compaction primitive)
    keys = jnp.asarray(rng.integers(0, 1 << 30, R).astype(np.uint32))
    vals = jnp.arange(R, dtype=jnp.int32)
    f = jax.jit(lambda k, v: jax.lax.sort_key_val(k, v))
    print(f"sort {R} u32 kv: {timeit(f, keys, vals):7.2f} ms")

    f = jax.jit(lambda k: jnp.argsort(k))
    print(f"argsort {R} u32: {timeit(f, keys):7.2f} ms")

    # cumsum (compaction offsets)
    f = jax.jit(lambda k: jnp.cumsum(k.astype(jnp.int32)))
    print(f"cumsum {R} i32: {timeit(f, keys):7.2f} ms")


if __name__ == "__main__":
    main()
