"""Bench artifact contract tests (no Spark needed).

Round 3's graded BENCH artifact had rc=0 but `parsed: null`: the final JSON
line carried a long prose scaling_notes string and overflowed the driver's
bounded stdout-tail capture, truncating the headline value and five query
timings out of the record. These tests pin the size contract so it cannot
regress: a fully-populated result line (20 headline queries + the complete
cdc scaling section) must stay well under the capture window.
"""

from __future__ import annotations

import json

import bench


def _full_result() -> dict:
    # worst-case realistic values: every headline query present with 3-digit
    # ms resolution, full control + two level dicts + all summary fields
    queries = {name: 12.34 for name in bench.HEADLINE}
    return {
        "metric": "headline query suite wall time + CDC MERGE-apply throughput",
        "value": round(sum(queries.values()), 2),
        "unit": "sec",
        "queries": queries,
        "sf": 0.1,
        "cdc": {
            "wal_events": 2_000_000,
            "scaling_factor": 4.0,
            "notes": "BASELINE.md#sandbox-scaling-protocol",
            "control": {
                "local2": {"wall_sec": 88.55, "rows_per_sec": 187153908.4,
                           "runs": 5},
                "local8": {"wall_sec": 22.71, "rows_per_sec": 589733418.2,
                           "runs": 5},
                "scaling_efficiency": 0.788,
            },
            "local2": {"wall_sec": 127.89, "events_per_sec": 62832.8,
                       "runs": 2, "parallel_utilization": 0.88},
            "local8": {"wall_sec": 116.23, "events_per_sec": 107989.8,
                       "runs": 2, "parallel_utilization": 0.59},
            "events_per_sec": 107989.8,
            "scaling_efficiency": 0.43,
            "scaling_efficiency_utilization": 0.639,
            "utilization_retention": 0.672,
            "task_sec_per_million_events": {"local2": 28.1, "local8": 44.0},
        },
    }


def test_final_line_fits_tail_capture():
    line = bench._final_line(_full_result())
    assert len(line) <= 1400, len(line)
    parsed = json.loads(line)
    assert parsed["value"] and len(parsed["queries"]) == len(bench.HEADLINE)
    assert parsed["cdc"]["control"]["scaling_efficiency"] is not None


def test_final_line_guard_drops_notes_when_oversized():
    r = _full_result()
    r["cdc"]["notes"] = "x" * 2000
    line = bench._final_line(r)
    parsed = json.loads(line)
    assert "notes" not in parsed["cdc"]
    assert len(line) <= 1400


def test_headline_list_unchanged_shape():
    # the driver compares rounds query-by-query: names must be stable and
    # every headline entry must exist in the driver queries registry
    from nifi_daffodil_spark.plans import driver_queries as dq

    qs = dq.queries()
    for name in bench.HEADLINE:
        assert name in qs, name
