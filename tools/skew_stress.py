"""Adversarial-skew stress gate (VERDICT r05 item 5): build a deliberately
hostile fixture at sf0.1 scale, run the three skew-sensitive registered
queries on it AGAINST THEIR OWN DUCKDB ORACLES, and record times + verdicts
to BULK_r6.json. This turns the SCALE.md skew claims (bucket caps, over-cap
neighbor recovery, large-star fallback, salted aggregation) from unit-test
assertions into an end-to-end gate on corpus-shaped data.

Fixture (deterministic, derived from /root/testdata/sf0.1 — written to a
scratch dir, source data untouched):

* documents: ~10% of docs are rewritten as ONE giant near-dup family —
  each takes a fixed 25-token base set, drops 2 base tokens and adds 1
  extra token (keyed on doc_id), giving hundreds of DISTINCT token sets
  with pairwise Jaccard straddling the 0.8 verify threshold: exact-collapse
  cannot absorb them, they flood shared LSH buckets past CLUSTER_MAX_BUCKET
  (the cap + sketch-sort neighbor recovery actually fire), and the truth
  component has chain topology. The remaining 90% have ~25% of their tokens
  replaced by one HEAD WORD, pushing it toward ~30% of all tokens (the
  word_count hot key).
* lineitem: 90% of rows get l_returnflag='N' (the hot group for the
  two-phase salted aggregation).

Run: python tools/skew_stress.py   (writes BULK_r6.json at the repo root)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC_SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
FIXTURE = os.path.join(REPO, ".skewfix")
HEAD_WORD = "spark"
QUERIES = ["word_count", "dedup_clusters_lsh", "agg_salted"]
N_RUNS = 3


def build_fixture() -> dict:
    """Deterministic skewed rewrite of documents + lineitem via DuckDB
    (hash() is stable across runs/versions for these types)."""
    os.makedirs(FIXTURE, exist_ok=True)
    con = duckdb.connect()
    # token universe of the source corpus, sorted for determinism
    vocab = [
        r[0]
        for r in con.execute(
            "SELECT DISTINCT tok FROM (SELECT unnest(string_split(text,' ')) "
            f"AS tok FROM read_parquet('{SRC_SF}/documents.parquet')) "
            "WHERE tok <> '' ORDER BY tok"
        ).fetchall()
    ]
    base, extras = vocab[:25], vocab[25:]
    rows = con.execute(
        f"SELECT doc_id, text, lang, source FROM "
        f"read_parquet('{SRC_SF}/documents.parquet') ORDER BY doc_id"
    ).fetchall()
    out = []
    n_dup = 0
    for doc_id, text, lang, source in rows:
        if doc_id % 10 == 0:  # the giant near-dup family
            d1 = doc_id % 25
            d2 = (d1 + 1 + (doc_id // 25) % 24) % 25
            toks = [t for i, t in enumerate(base) if i not in (d1, d2)]
            toks.append(extras[doc_id % len(extras)])
            new_text = " ".join(toks)
            n_dup += 1
        else:  # hot head word: ~25% of positions overwritten
            toks = [
                HEAD_WORD if (doc_id * 131071 + i * 8191) % 4 == 0 else t
                for i, t in enumerate(text.split(" "))
            ]
            new_text = " ".join(toks)
        out.append((doc_id, new_text, lang, source, len(new_text)))
    con.execute(
        "CREATE TABLE docs(doc_id BIGINT, text VARCHAR, lang VARCHAR, "
        "source VARCHAR, n_chars BIGINT)"
    )
    con.executemany("INSERT INTO docs VALUES (?,?,?,?,?)", out)
    con.execute(
        f"COPY docs TO '{FIXTURE}/documents.parquet' (FORMAT parquet)"
    )
    con.execute(
        "COPY (SELECT * REPLACE (CASE WHEN hash(l_orderkey) % 10 < 9 "
        "THEN 'N' ELSE l_returnflag END AS l_returnflag) "
        f"FROM read_parquet('{SRC_SF}/lineitem.parquet')) "
        f"TO '{FIXTURE}/lineitem.parquet' (FORMAT parquet)"
    )
    head_frac = con.execute(
        "SELECT sum(CASE WHEN tok = ? THEN 1 ELSE 0 END)::DOUBLE / count(*) "
        "FROM (SELECT unnest(string_split(text,' ')) AS tok FROM docs) "
        "WHERE tok <> ''",
        [HEAD_WORD],
    ).fetchone()[0]
    return {
        "n_docs": len(out),
        "n_neardup_family": n_dup,
        "head_word": HEAD_WORD,
        "head_word_token_frac": round(head_frac, 4),
    }


def main() -> int:
    import importlib.util

    from parallel_map_reduce_word_counter_for_one_machine_spark.session import (
        get_spark,
    )

    meta = build_fixture()
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    qs, osql = mod.queries(), mod.oracle_sql()

    spark = get_spark(app_name="skew-stress")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in ("documents", "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{FIXTURE}/{t}.parquet')"
        )

    results = {}
    ok_all = True
    for name in QUERIES:
        times = []
        rows = None
        for _ in range(N_RUNS):
            t0 = time.monotonic()
            rows = qs[name](spark, FIXTURE).collect()
            times.append(round(time.monotonic() - t0, 3))
        d = sorted(con.execute(osql[name]).fetchall(), key=repr)
        s = sorted((tuple(r) for r in rows), key=repr)
        ok = len(s) == len(d) and all(
            repr(a) == repr(b) for a, b in zip(s, d)
        )
        ok_all = ok_all and ok
        results[name] = {
            "rows": len(rows),
            "oracle_ok": bool(ok),
            "times_sec": times,
            "best_sec": min(times),
        }
        print(f"{'ok ' if ok else 'FAIL'} {name:24s} {len(rows):8d} rows "
              f"{times}")
    payload = {"fixture": meta, "sf_source": SRC_SF, "results": results}
    with open(os.path.join(REPO, "BULK_r6.json"), "w") as fh:
        json.dump(payload, fh, indent=1)
    print("wrote BULK_r6.json; all green:", ok_all)
    return 0 if ok_all else 1


if __name__ == "__main__":
    raise SystemExit(main())
