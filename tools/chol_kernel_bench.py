"""Micro-benchmark: small-matrix Cholesky + triangular-inverse backends
on the real chip — XLA custom-call chain vs ops.chol (Pallas,
batch-on-lanes) vs ops.smallchol (unrolled scalars, the production path).

Two measurement modes per backend:
  - dispatch-level (10 pipelined dispatches; includes the tunneled
    platform's ~20 ms fixed per-dispatch floor), and
  - in-graph (K=50 factorization batches chained inside one jit via
    lax.scan — the honest device-time number; this is how the ops run
    inside the solver's update program).

Usage: python tools/chol_kernel_bench.py [B]
Round-5 numbers are recorded in PROFILE_r05.json.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/idocp_tpu_jax_cache")
    from idocp_tpu.ops import chol_tri_inv as pallas_ctinv
    from idocp_tpu.ops import smallchol

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 10240
    K = 50
    key = jax.random.PRNGKey(0)
    for n in (12, 18):
        X = jax.random.normal(key, (B, n, n), jnp.float32)
        A = (X @ jnp.swapaxes(X, 1, 2) / n
             + 2.0 * jnp.eye(n, dtype=jnp.float32))
        shifts = 1.0 + 0.01 * jnp.arange(K, dtype=jnp.float32)

        def chain(core):
            @jax.jit
            def run(Am):
                def body(acc, s):
                    return acc + jnp.sum(core(s * Am)), None
                out, _ = jax.lax.scan(body, jnp.float32(0), shifts)
                return out
            return run

        def xla_core(Am):
            L = jnp.linalg.cholesky(Am)
            eye = jnp.broadcast_to(jnp.eye(n, dtype=jnp.float32), Am.shape)
            return jax.scipy.linalg.solve_triangular(L, eye, lower=True)

        cases = [("xla", chain(xla_core)),
                 ("pallas", chain(pallas_ctinv)),
                 ("unrolled", chain(jax.vmap(smallchol.chol_tri_inv)))]
        for name, fn in cases:
            try:
                ref = np.asarray(fn(A))
            except Exception as exc:  # lowering may reject a shape
                print(f"n={n} {name}: FAILED ({type(exc).__name__})")
                continue
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(fn(A))
                ts.append(time.perf_counter() - t0)
            per_ms = min(ts) / K * 1e3
            print(f"n={n} B={B} {name:9s} {per_ms:8.3f} ms/batch in-graph "
                  f"({per_ms/B*1e6:.0f} ns/matrix, sum={ref:.6g})",
                  flush=True)


if __name__ == "__main__":
    main()
