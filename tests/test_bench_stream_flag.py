"""Unit tests for bench.py's streaming perf-flag logic (VERDICT r11
item 6): the tight 0.5 s per-delta margin must be noise-gated (a slow
session can't trip it), while a real 2× floor exceedance or a family-sum
overrun trips the flag regardless of session noise.  Synthetic records
only — no Spark session."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import (  # noqa: E402
    _STREAM8_FAMILY_MAX,
    _STREAM_FLOORS,
    compute_stream_flag,
)


def _times(scale: float = 1.0, **overrides: float) -> dict[str, float]:
    t = {q: f * scale for q, f in _STREAM_FLOORS.items()}
    t.update(overrides)
    return t


def test_clean_session_at_floor_is_green():
    deltas, family, flag = compute_stream_flag(_times(), True)
    assert not flag
    assert family <= _STREAM8_FAMILY_MAX
    assert all(abs(d) < 1e-9 for d in deltas.values())


def test_clean_session_small_exceedance_trips_tight_check():
    # one gate 0.8 s over its floor, clean session → tight check fires
    t = _times(op_stream_windowed=_STREAM_FLOORS["op_stream_windowed"] + 0.8)
    _, _, flag = compute_stream_flag(t, True)
    assert flag


def test_noisy_session_small_exceedance_does_not_trip():
    # same 0.8 s exceedance (< 2x the 0.9 s floor) but the session's
    # own noise instruments are dirty → the r11 false-positive case
    # must stay green
    t = _times(op_stream_windowed=_STREAM_FLOORS["op_stream_windowed"] + 0.8)
    _, _, flag = compute_stream_flag(t, False)
    assert not flag


def test_uniform_session_drift_does_not_trip_when_noisy():
    # a 1.25x across-the-board inflation (classic session spread, r11
    # PERF_NOTES) with dirty instruments stays green — the family sum
    # (floor-sum 10.9 s × 1.25 = 13.6 s) is still inside the hard bar
    _, _, flag = compute_stream_flag(_times(scale=1.25), False)
    assert not flag


def test_two_x_floor_exceedance_trips_even_when_noisy():
    # ...but a REAL 2x floor exceedance on one gate is hard
    t = _times(
        op_stream_stateful=2.0 * _STREAM_FLOORS["op_stream_stateful"] + 0.1
    )
    _, _, flag = compute_stream_flag(t, False)
    assert flag


def test_family_sum_overrun_trips_even_when_noisy():
    # every gate 1.9x its floor: no per-gate 2x trip, but the family
    # sum blows the ≤14 s hard target
    t = _times(scale=1.9)
    deltas, family, flag = compute_stream_flag(t, False)
    assert family > _STREAM8_FAMILY_MAX and flag


def test_missing_and_nan_gates_are_skipped():
    t = _times()
    del t["op_stream_dedup"]
    t["op_stream_windowed"] = float("nan")
    deltas, family, flag = compute_stream_flag(t, True)
    assert "op_stream_dedup" not in deltas
    assert "op_stream_windowed" not in deltas
    assert not flag


# --- r13: hard bars scale by the measured micro-batch-path inflation


_R12_DRIVER = {
    # BENCH_r12.json, the false-positive record this model must explain:
    # every stateful gate ~1.5× the builder readings, batch sentinels
    # clean, loadavg_start 5.77
    "op_stream_windowed": 0.8,
    "op_stream_sink_upsert": 2.219,
    "op_stream_dedup": 1.435,
    "op_stream_stateful": 2.31,
    "op_stream_sequence_detect": 1.817,
    "op_stream_interval_join": 1.869,
    "op_stream_sessionize": 1.938,
    "op_stream_near_dup": 2.369,
}


def test_r12_driver_record_green_under_measured_inflation():
    # the r12 record's family (14.757) and sink reading (2.219 over the
    # revised 1.1 floor) clear the hard bars once the session's own
    # stream sentinel reads even 10% slow — the attribution: session
    # inflation, not a sink regression (PERF_NOTES_r13 §1)
    _, family, flag = compute_stream_flag(
        _R12_DRIVER, session_clean=False, inflation=1.1
    )
    assert family > _STREAM8_FAMILY_MAX  # raw bar overrun is real...
    assert not flag  # ...but explained by the measured inflation


def test_single_gate_regression_still_trips_under_inflation():
    # a genuine one-gate regression (3× its floor) fires even when the
    # session reads 1.3× slow — inflation widens bars, it doesn't
    # disable them
    t = _times(
        op_stream_sink_upsert=3.0 * _STREAM_FLOORS["op_stream_sink_upsert"]
    )
    _, _, flag = compute_stream_flag(t, session_clean=False, inflation=1.3)
    assert flag


def test_inflation_is_capped_and_floored():
    # a >3× sentinel cannot stretch the bars indefinitely: at the 3.0
    # cap a uniform 6.2× record must still flag (floor-sum 11.1 × 6.2
    # > 14 × 3.0)...
    _, _, flag = compute_stream_flag(
        _times(scale=6.2), session_clean=False, inflation=10.0
    )
    assert flag
    # ...and a sub-1 sentinel (machine faster than the reference) never
    # TIGHTENS the bars below their quiet-session calibration
    _, _, flag = compute_stream_flag(
        _times(scale=1.0), session_clean=True, inflation=0.5
    )
    assert not flag


def test_tight_tier_disarmed_by_stream_inflation():
    # same-day builder evidence: a session can read batch-clean while
    # its null drain runs 1.48x the quiet reference — the tight 0.5 s
    # margin against quiet-session floors is meaningless there (two
    # gates read +1.3 s, no hard bar tripped) and must not fire...
    t = _times(
        op_stream_dedup=_STREAM_FLOORS["op_stream_dedup"] + 1.34,
        op_stream_interval_join=_STREAM_FLOORS["op_stream_interval_join"]
        + 1.29,
    )
    _, _, flag = compute_stream_flag(t, session_clean=True, inflation=1.48)
    assert not flag
    # ...while the identical record on a stream-quiet session DOES fire
    _, _, flag = compute_stream_flag(t, session_clean=True, inflation=1.0)
    assert flag


def test_session_clean_requires_quiet_launch_loadavg():
    from bench import compute_session_clean

    # the r12 driver case: fast sentinels, loadavg 5.77 at launch on a
    # 32-core box (> 0.15×32 = 4.8) → NOT clean
    assert not compute_session_clean(False, 0.185, 0.061, 5.77, 32)
    # quiet launch, fast sentinels → clean
    assert compute_session_clean(False, 0.185, 0.185, 0.7, 32)
    # sentinel drift or the contended flag still dirty the session
    assert not compute_session_clean(False, 0.1, 0.2, 0.7, 32)
    assert not compute_session_clean(True, 0.185, 0.185, 0.7, 32)
