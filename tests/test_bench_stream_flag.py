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
