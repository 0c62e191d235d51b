"""Utils coverage: checkpoint round-trip (SURVEY.md §5 checkpoint/resume)
and the JSONL stats logger."""
import io
import json

import jax.numpy as jnp
import numpy as np

from idocp_tpu.ocp.data import zero_solution
from idocp_tpu.utils.checkpoint import load_solution, save_solution
from idocp_tpu.utils.logging import StatsLogger, stats_to_dict


def _sol(batch=None):
    sol = zero_solution(7, 7, 7, 0, 4, 0.3 * jnp.ones(7), jnp.ones(7))
    import dataclasses
    sol = dataclasses.replace(
        sol,
        slack={"u_lower": jnp.full((5, 7), 2.0)},
        dual={"u_lower": jnp.full((5, 7), 0.5)})
    if batch:
        import jax
        sol = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x[None], (batch,) + x.shape), sol)
    return sol


def test_checkpoint_roundtrip(tmp_path):
    sol = _sol()
    p = str(tmp_path / "sol.npz")
    save_solution(p, sol)
    back = load_solution(p)
    np.testing.assert_array_equal(np.asarray(back.q), np.asarray(sol.q))
    np.testing.assert_array_equal(np.asarray(back.slack["u_lower"]),
                                  np.asarray(sol.slack["u_lower"]))
    np.testing.assert_array_equal(np.asarray(back.dual["u_lower"]),
                                  np.asarray(sol.dual["u_lower"]))


def test_checkpoint_roundtrip_batched(tmp_path):
    sol = _sol(batch=3)
    p = str(tmp_path / "solb.npz")
    save_solution(p, sol)
    back = load_solution(p, dtype=jnp.float32)
    assert back.q.shape == (3, 5, 7)
    assert back.q.dtype == jnp.float32


class _FakeStats:
    cost = jnp.asarray(1.5)
    barrier = jnp.asarray(0.1)
    alpha_primal = jnp.asarray([0.5, 1.0])  # batched
    alpha_dual = jnp.asarray(1.0)
    kkt_direction_norm = jnp.asarray(0.2)
    violation = jnp.asarray(3.0)
    kkt_error = jnp.asarray([0.9, 1.1])


def test_checkpoint_loads_pre_filter_format(tmp_path):
    """.npz files written before the filter-memory fields existed must
    still load (ADVICE r3: backward-compatible checkpoint format)."""
    sol = _sol()
    p = str(tmp_path / "old.npz")
    save_solution(p, sol)
    # strip the filter fields to emulate the old format
    with np.load(p) as data:
        payload = {k: data[k] for k in data.files
                   if not k.startswith("filter")}
    np.savez(p, **payload)
    back = load_solution(p)
    np.testing.assert_array_equal(np.asarray(back.q), np.asarray(sol.q))
    assert back.filter_cost.shape == (0,)
    assert int(back.filter_ptr) == 0
    # explicit filter_size: backfill with +inf EMPTY slots so the restored
    # solution is shape-compatible with a filter-enabled solver instead of
    # silently disabling its line-search memory (ADVICE r4 low)
    back_f = load_solution(p, filter_size=8)
    assert back_f.filter_cost.shape == (8,)
    assert np.isinf(np.asarray(back_f.filter_cost)).all()
    assert np.isinf(np.asarray(back_f.filter_viol)).all()


def test_stats_logger_jsonl():
    buf = io.StringIO()
    with StatsLogger(buf) as log:
        log.write(_FakeStats(), iteration=0)
        log.write(_FakeStats(), iteration=1, note="x")
    lines = [json.loads(l) for l in buf.getvalue().splitlines()]
    assert len(lines) == 2
    assert lines[0]["iteration"] == 0 and lines[1]["note"] == "x"
    assert lines[0]["cost"] == 1.5
    assert lines[0]["alpha_primal.mean"] == 0.75
    assert abs(lines[0]["kkt_error.max"] - 1.1) < 1e-6


def test_stats_to_dict_scalars_and_batches():
    d = stats_to_dict(_FakeStats())
    assert set(k.split(".")[0] for k in d) == {
        "cost", "barrier", "alpha_primal", "alpha_dual",
        "kkt_direction_norm", "violation", "kkt_error"}
