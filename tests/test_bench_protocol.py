"""Protocol guards for bench.py's driver contract (VERDICT r08 item 1):
the stdout record must survive the driver's 2,000-char stdout TAIL capture.
The runtime assert in bench.main() catches this at bench time; this test
catches it at TEST time — i.e. when someone grows BENCH_QUERIES — without
running any Spark.
"""

from __future__ import annotations

import json


def test_bench_summary_fits_driver_tail_capture():
    import bench

    # worst-case realistic rendering: every query at a 4-digit-seconds
    # value with 3 decimals (9999.999 — wider than any plausible real run)
    times = {k: 9999.999 for k in bench.BENCH_QUERIES}
    times["word_count_761mb_bulk"] = 9999.999
    times["agg_group_60m_rows_bulk"] = 9999.999
    times["dedup_exact_500k_docs_bulk"] = 9999.999
    compact = {
        "metric": "headline_queries_total",
        "value": 99999.999,
        "unit": "sec",
        "queries": times,
        "sf": 0.1,
        "box_factor": 9.999,
        "n_passes": 3,
        "degraded_passes": [0, 1, 2],
        "n_runs": bench.N_RUNS,
        "contended": False,
        # suspect_queries can legitimately hold several long key names
        "suspect_queries": sorted(bench.BENCH_QUERIES)[:5],
        "detail": "BENCH_detail_last.json",
    }
    payload = json.dumps(compact)
    # same drop order as bench.main(); the MANDATORY core (metric/value/
    # queries/sf/box_factor) must fit even if every droppable is dropped
    for droppable in (
        "detail",
        "suspect_queries",
        "contended",
        "n_runs",
        "degraded_passes",
        "n_passes",
    ):
        if len(payload) < 1900:
            break
        compact.pop(droppable, None)
        payload = json.dumps(compact)
    assert len(payload) < 1900, (
        f"bench stdout summary would be {len(payload)} chars with "
        f"{len(times)} queries — the driver records only a 2,000-char tail; "
        "trim BENCH_QUERIES or shorten key names"
    )


def test_bench_queries_all_resolvable():
    """Every bench key must resolve through _bench_fn — either a registry
    key or one of the deliberate production-listing overrides (whose
    registered twins are one-row verdicts)."""
    import bench

    unresolved = []
    for k in bench.BENCH_QUERIES:
        try:
            fn = bench._bench_fn(k)
        except Exception:
            fn = None
        if not callable(fn):
            unresolved.append(k)
    assert not unresolved, f"bench keys _bench_fn cannot resolve: {unresolved}"
