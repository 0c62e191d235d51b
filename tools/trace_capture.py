"""Capture a jax.profiler device trace of the shipping bench update
(SURVEY.md §5 tracing row; VERDICT r4 missing #5 — round 5 verified the
tunneled axon platform DOES capture device-side xplane events).

Writes traces/bench_b512/... (xplane.pb + trace.json.gz) and prints the
top device ops per update. Usage:
    python tools/trace_capture.py [BATCH] [OUTDIR]
"""
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    from bench import build, configure_cache, fence
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    outdir = sys.argv[2] if len(sys.argv) > 2 else \
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "traces", f"bench_b{batch}")
    configure_cache()
    bs, sol_b, q_b, v_b, sched, _ = build(batch=batch)
    sol, stats = bs.update(sol_b, 0.05, q_b, v_b, sched)
    fence(stats.cost)
    n_iters = 3
    with jax.profiler.trace(outdir):
        for _ in range(n_iters):
            sol, stats = bs.update(sol, 0.05, q_b, v_b, sched)
        fence(stats.cost)

    tj = glob.glob(os.path.join(outdir, "**", "*.trace.json.gz"),
                   recursive=True)
    print("trace:", tj)
    if not tj:
        return
    with gzip.open(tj[0], "rt") as f:
        data = json.load(f)
    durs = {}
    for e in data.get("traceEvents", []):
        n = e.get("name", "?")
        if (e.get("ph") == "X" and not n.startswith("$")
                and "asarray" not in n and "jax.Array" not in n):
            durs[n] = durs.get(n, 0) + e.get("dur", 0)
    for n, d in sorted(durs.items(), key=lambda kv: -kv[1])[:20]:
        print(f"{d / (1e3 * n_iters):9.3f} ms/update  {n[:80]}")


if __name__ == "__main__":
    main()
