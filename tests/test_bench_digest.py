"""Replay tests for the bench stdout digest (VERDICT r15 item 1).

The r15 driver record's long prose ``headline_comparable_reason``
silently evicted 5 per-query watch rows from the 1900-char stdout
digest (bench.py's old eviction loop dropped rows FIRST), which cost
the driver its round-over-round diff on those queries.  These tests
replay a worst-case record — every instrument field populated, the
longest reason string any committed record has carried, all 191 gates
— and assert every watch row survives.  Synthetic/committed records
only; no Spark session.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import (  # noqa: E402
    build_digest,
    compact_reasons,
    select_watch_rows,
)

# the r15 driver session's reasons — the longest any record has carried
_R15_DRIVER_REASONS = [
    "launch loadavg[1m]=14.044921875 > 4.8",
    "launch loadavg[5m]=7.54296875 > 4.8",
    "batch floor ratio median 1.672 > 1.25 over 191 gates",
]


def _committed_full_record() -> dict:
    path = Path(__file__).resolve().parent.parent / "BENCH_FULL.json"
    return json.loads(path.read_text())


def _worst_case_record() -> tuple[dict, list[str]]:
    """The committed full record, made strictly worse for the digest:
    the r15 driver's prose reason plus one extra clause, non-comparable
    flags, and retry-attempt metadata all present at once."""
    rec = _committed_full_record()
    reasons = _R15_DRIVER_REASONS + [
        "stream sentinel inflation 1.234 > 1.15",
        "contended flag fired mid-run",
    ]
    rec["headline_comparable"] = False
    rec["headline_comparable_reason"] = "; ".join(reasons)
    rec["session_clean"] = False
    rec["contended"] = True
    rec["bench_attempt"] = 2
    rec["bench_attempts"] = 2
    rec["launch_load_check"] = (
        "1m-only (retry: the 5/15-min horizons carry this"
        " process's own previous attempt)"
    )
    rec["discarded_attempts"] = [
        {
            "attempt": 1,
            "batch_floor_ratio_median": 1.734,
            "reason": compact_reasons(_R15_DRIVER_REASONS),
        }
    ]
    return rec, reasons


def test_worst_case_record_keeps_every_watch_row():
    rec, reasons = _worst_case_record()
    digest_q, env_keys = select_watch_rows(rec["queries"])
    n_watch = len(digest_q)
    assert n_watch >= 18, "watch list unexpectedly shrank"
    line = build_digest(rec, digest_q, env_keys, reasons)
    assert len(line) <= 1900
    parsed = json.loads(line)
    assert len(parsed["queries"]) == n_watch
    # the rows the r15 driver lost must all be present
    for q in (
        "op_dedup_clusters",
        "op_embedding_dups",
        "op_lsh_topk_bare",
        "op_semantic_dedup",
        "op_semantic_dedup_bare",
    ):
        assert q in parsed["queries"], q
    # headline fields the driver parses survive any eviction
    for k in ("metric", "value", "unit", "sf", "headline_comparable"):
        assert k in parsed, k


def test_env_watch_rows_survive_worst_case(monkeypatch):
    rec, reasons = _worst_case_record()
    extra = sorted(rec["queries"])[:5]
    monkeypatch.setenv("SPARK_GRAFT_BENCH_WATCH", ",".join(extra))
    digest_q, env_keys = select_watch_rows(rec["queries"])
    line = build_digest(rec, digest_q, env_keys, reasons)
    parsed = json.loads(line)
    assert len(line) <= 1900
    for q in extra:
        assert q in parsed["queries"], q


def test_reason_is_compact_codes_not_prose():
    rec, reasons = _worst_case_record()
    digest_q, env_keys = select_watch_rows(rec["queries"])
    line = build_digest(rec, digest_q, env_keys, reasons)
    parsed = json.loads(line)
    reason = parsed.get("headline_comparable_reason")
    # either compacted to codes or (only under extreme overflow)
    # evicted entirely — never the unbounded prose
    if reason is not None:
        assert len(reason) <= 120
        assert "load1m=14.04" in reason
        assert "floor=1.672" in reason


def test_compact_reasons_codes():
    got = compact_reasons(_R15_DRIVER_REASONS)
    assert got == "load1m=14.04;load5m=7.54;floor=1.672"
    assert compact_reasons([]) is None
    assert (
        compact_reasons(["contended flag fired mid-run"]) == "contended"
    )
    assert (
        compact_reasons(["batch sentinel drifted 0.9/0.3"])
        == "sent=0.9/0.3"
    )
    assert (
        compact_reasons(["stream sentinel inflation 1.3 > 1.15"])
        == "sinfl=1.3"
    )
    # unknown reasons truncate, never drop
    assert compact_reasons(["x" * 100]) == "x" * 24


def test_fields_evict_before_rows():
    """Under an artificially tight budget the digest sheds
    informational fields, not watch rows."""
    rec, reasons = _worst_case_record()
    digest_q, env_keys = select_watch_rows(rec["queries"])
    n_watch = len(digest_q)
    line = build_digest(rec, digest_q, env_keys, reasons, limit=1500)
    parsed = json.loads(line)
    assert len(parsed["queries"]) == n_watch
    assert "methodology" not in parsed or len(line) <= 1500


def test_full_record_fields_not_in_digest():
    rec, reasons = _worst_case_record()
    digest_q, env_keys = select_watch_rows(rec["queries"])
    line = build_digest(rec, digest_q, env_keys, reasons)
    parsed = json.loads(line)
    for bulky in (
        "stream_sentinel_samples",
        "stream_gate_inflations",
        "stream_gate_bar_scales",
        "discarded_attempts",
    ):
        assert bulky not in parsed, bulky
