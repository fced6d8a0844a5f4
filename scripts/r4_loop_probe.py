"""Validate the in-program loop timings: the batch-2 numbers (611 TB/s
at 8192^2) are physically impossible, so either block_until_ready via the
axon relay does not block for these programs, or the loop is being
elided.  This probe (a) times with block_until_ready vs an actual host
fetch (device_get forces materialization), (b) scales K — real execution
must scale linearly in K.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)


def main():
    size = int(os.environ.get("OTAMG_PROBE_SIZE", "8192"))
    m = n = size
    key = jax.random.PRNGKey(0)
    S = (jax.random.uniform(key, (m, n)) < 0.05).astype(jnp.float32)
    v = jax.random.normal(key, (n,), jnp.float32)

    def make(K):
        @jax.jit
        def gemv_chain(S, v):
            def body(_, v):
                y = S @ v
                z = S.T @ y
                return z / jnp.max(jnp.abs(z))

            return jax.lax.fori_loop(0, K, body, v)

        return gemv_chain

    for K in (10, 50, 200):
        fn = make(K)
        out = fn(S, v)
        s0 = float(jnp.sum(out))          # forces a real fetch (warm)
        t0 = time.perf_counter()
        out = fn(S, v)
        jax.block_until_ready(out)
        t_block = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = fn(S, v)
        s1 = float(np.asarray(jax.device_get(out)).sum())
        t_fetch = time.perf_counter() - t0
        per_iter_us = t_fetch / K * 1e6
        bw = 2 * m * n * 4 / (t_fetch / K) / 1e9
        print(json.dumps({
            "size": size, "K": K,
            "t_block_ms": round(t_block * 1e3, 3),
            "t_fetch_ms": round(t_fetch * 1e3, 3),
            "per_iter_us_fetch": round(per_iter_us, 2),
            "GBps_fetch": round(bw, 1),
            "checksum": s1,
        }), flush=True)


if __name__ == "__main__":
    main()
