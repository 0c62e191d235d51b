"""Micro-benchmark: ops.chol.chol_tri_inv (Pallas, batch-on-lanes) vs the
XLA cholesky + triangular_solve chain, on the real chip.

Usage: python tools/chol_kernel_bench.py [B]
Timings are amortized over pipelined dispatches (the tunneled platform
has ~20 ms fixed per dispatch — see tools/runtime_profile.py).
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
    from idocp_tpu.ops import chol_tri_inv

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 10240
    key = jax.random.PRNGKey(0)
    for n in (12, 18, 30):
        X = jax.random.normal(key, (B, n, n), jnp.float32)
        A = (X @ jnp.swapaxes(X, 1, 2) / n
             + 2.0 * jnp.eye(n, dtype=jnp.float32))

        @jax.jit
        def xla_chain(Am):
            L = jnp.linalg.cholesky(Am)
            eye = jnp.broadcast_to(jnp.eye(n, dtype=jnp.float32), Am.shape)
            Li = jax.scipy.linalg.solve_triangular(L, eye, lower=True)
            return jnp.sum(Li)

        @jax.jit
        def pallas_kernel(Am):
            return jnp.sum(chol_tri_inv(Am))

        for name, fn in (("xla", xla_chain), ("pallas", pallas_kernel)):
            try:
                ref = np.asarray(fn(A))
            except Exception as exc:  # lowering may reject a shape
                print(f"n={n} {name}: FAILED ({type(exc).__name__})")
                continue
            ts = []
            for _ in range(2):
                t0 = time.perf_counter()
                outs = [fn(A) for _ in range(10)]
                for o in outs:
                    np.asarray(o)
                ts.append((time.perf_counter() - t0) / 10)
            print(f"n={n} B={B} {name:7s} {min(ts)*1e3:8.2f} ms "
                  f"(sum={ref:.4g})", flush=True)


if __name__ == "__main__":
    main()
