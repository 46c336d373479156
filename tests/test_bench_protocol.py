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


def _mk_pass(times, canary_min, contended=False, suspects=()):
    return {
        "times": times,
        "canary_min": canary_min,
        "contended": contended,
        "suspect_queries": list(suspects),
    }


def test_summarize_passes_one_provenance_rule():
    """VERDICT r10 item 3 + ADVICE r10 (bench provenance): degraded or
    contended passes are excluded from the comparison min; box
    normalization is per-pass-then-min; the suspect flag comes from each
    query's min-providing pass; fallback to all passes (flagged) only
    when no pass is clean."""
    import bench

    ref = bench.CANARY_REF_FLOOR
    degraded = _mk_pass({"a": 1.0, "b": 9.0}, round(2.0 * ref, 4))
    clean1 = _mk_pass({"a": 2.0, "b": 3.0}, round(1.05 * ref, 4), suspects=["b"])
    clean2 = _mk_pass({"a": 2.2, "b": 2.8}, round(1.01 * ref, 4))
    s = bench.summarize_passes([degraded, clean1, clean2])
    # the degraded pass's faster-looking times must NOT leak into the min
    assert s["times_min"] == {"a": 2.0, "b": 2.8}
    assert s["degraded"] == [0] and s["clean"] == [1, 2]
    assert s["min_over"] == "clean_passes" and s["contended"] is False
    # b's min came from clean2, which did not flag b — not suspect
    assert s["suspect"] == []
    # per-pass normalization: each time divided by ITS pass's box factor
    expected_a = min(
        2.0 / bench._pass_box(clean1), 2.2 / bench._pass_box(clean2)
    )
    assert s["box_normalized"]["a"] == round(expected_a, 3)

    # no clean pass: fall back to all passes, loudly
    s2 = bench.summarize_passes(
        [degraded, _mk_pass({"a": 0.5, "b": 1.0}, ref, contended=True)]
    )
    assert s2["min_over"] == "all_passes" and s2["contended"] is True
    assert s2["times_min"] == {"a": 0.5, "b": 1.0}


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
