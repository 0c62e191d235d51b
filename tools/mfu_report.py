"""MFU / roofline accounting for the shipping batched update
(VERDICT r4 missing #1: "the difference between 'fast' and 'knows it's
fast'").

Protocol: lower + compile the EXACT bench-default jitted update
(bench.build — no-line-search trust-capped f32 config), pull FLOP and
bytes-accessed counts from XLA's own cost analysis of the compiled
module, measure amortized wall-clock on the chip, and place the workload
on the (HBM-bandwidth, f32-peak) roofline of the v5e chip:

    arithmetic intensity AI = flops / hbm_bytes        [flop/byte]
    bandwidth ceiling       = AI * HBM_BW              [flop/s]
    roofline ceiling        = min(peak_f32, AI * HBM_BW)
    MFU                     = achieved_flops / peak_f32
    roofline_utilization    = achieved_flops / roofline ceiling

Usage: python tools/mfu_report.py [BATCH ...]; prints one JSON blob
(recorded in PROFILE_r05.json).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# TPU v5 lite (v5e) public specs
PEAK_F32 = 9.9e13     # flop/s (MXU f32; bf16 is 1.97e14)
HBM_BW = 8.19e11      # byte/s


def analyze(batch):
    import jax

    from bench import build, configure_cache, fence
    configure_cache()
    bs, sol_b, q_b, v_b, sched, _ = build(batch=batch)

    lowered = bs._update.lower(sol_b, 0.05, q_b, v_b, sched)
    compiled = lowered.compile()
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        flops = float(ca.get("flops", float("nan")))
        hbm_bytes = float(ca.get("bytes accessed", float("nan")))
    except Exception as exc:
        return {"batch": batch,
                "error": f"cost_analysis unavailable: {exc}"}

    # timing: pipelined dispatches, device fetch as the fence (axon)
    sol = sol_b
    sol, stats = bs.update(sol, 0.05, q_b, v_b, sched)
    fence(stats.cost)
    iters = 10
    t0 = time.time()
    for _ in range(iters):
        sol, stats = bs.update(sol, 0.05, q_b, v_b, sched)
    fence(stats.cost)
    wall = (time.time() - t0) / iters

    achieved = flops / wall
    ai = flops / hbm_bytes
    bw_ceiling = ai * HBM_BW
    roof = min(PEAK_F32, bw_ceiling)
    return {
        "batch": batch,
        "flops_per_update": flops,
        "hbm_bytes_per_update": hbm_bytes,
        "update_wall_s": wall,
        "solves_per_s": batch / wall,
        "achieved_flops_per_s": achieved,
        "arithmetic_intensity_flop_per_byte": ai,
        "machine_balance_flop_per_byte": PEAK_F32 / HBM_BW,
        "bandwidth_ceiling_flop_per_s": bw_ceiling,
        "roofline_ceiling_flop_per_s": roof,
        "mfu_pct": 100.0 * achieved / PEAK_F32,
        "roofline_utilization_pct": 100.0 * achieved / roof,
        "hbm_utilization_pct": 100.0 * (hbm_bytes / wall) / HBM_BW,
    }


def main():
    batches = [int(b) for b in sys.argv[1:]] or [512]
    out = {"hardware": "1x TPU v5 lite chip (tunneled axon platform)",
           "peak_f32_flop_per_s": PEAK_F32,
           "hbm_bw_byte_per_s": HBM_BW,
           "note": "flops/bytes from XLA cost_analysis of the compiled "
                   "shipping update (bench.build defaults); wall-clock "
                   "amortized over 10 pipelined dispatches incl. ~20 ms "
                   "tunnel dispatch overhead",
           "runs": [analyze(b) for b in batches]}
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
