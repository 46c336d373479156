"""Adversarial-skew stress gate (VERDICT r05 item 5): build deliberately
hostile fixtures, run the three skew-sensitive registered queries on them
against independent checks, and record times + verdicts to BULK_r6.json.
This turns the SCALE.md skew claims (bucket caps, over-cap neighbor
recovery, chain-topology closure, salted aggregation) from unit-test
assertions into an end-to-end gate on corpus-shaped data.

Fixture recipe (deterministic, derived from /root/testdata/sf*, written to
a scratch dir under the repo — source data untouched):

* documents: ~10% of docs are rewritten as ONE giant near-dup family —
  each takes a fixed 25-token base set, drops 2 base tokens and adds 1
  extra token (keyed on doc_id), giving hundreds of DISTINCT token sets
  with pairwise Jaccard straddling the 0.8 verify threshold: exact-collapse
  cannot absorb them, they flood shared LSH buckets past CLUSTER_MAX_BUCKET
  (the cap + sketch-sort neighbor recovery actually fire), and the truth
  component has chain topology. The remaining 90% have ~25% of their tokens
  replaced by one HEAD WORD, pushing it toward ~30% of all tokens (the
  word_count hot key). The family also WELDS with part of the normal corpus
  (the 31-token universe makes mid-J ubiquitous), which is more adversarial
  still: the giant component spans both populations.
* lineitem: 90% of rows get l_returnflag='N' (the hot group for the
  two-phase salted aggregation).

Two tiers, because the exact dedup truth is inherently O(n²):

* **sf0.01-scale fixture** — every query verified against its full DuckDB
  oracle, INCLUDING the recursive-CTE closure over the exact all-pairs
  edge truth (tractable at 500 docs; at 5 000 docs the welded giant
  component makes the all-pairs + transitive-walk oracle run for hours —
  measured, which is precisely why the registered correctness gate runs
  at sf0.01).
* **sf0.1-scale fixture** — word_count and agg_salted keep their full
  oracles (linear SQL); dedup_clusters_lsh is checked by ALGORITHM
  DIVERSITY instead: the label-propagation closure must be identical to
  the independent large-star/small-star closure over the same verified
  edge set, and the cluster map must be a valid closure (every edge
  endpoint pair shares a cluster id; cluster_id = min member). Times for
  all three are recorded at this scale.

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
HEAD_WORD = "spark"
N_RUNS = 3


def build_fixture(src_sf: str, fixture: str) -> dict:
    """Deterministic skewed rewrite of documents + lineitem via DuckDB."""
    os.makedirs(fixture, exist_ok=True)
    con = duckdb.connect()
    vocab = [
        r[0]
        for r in con.execute(
            "SELECT DISTINCT tok FROM (SELECT unnest(string_split(text,' ')) "
            f"AS tok FROM read_parquet('{src_sf}/documents.parquet')) "
            "WHERE tok <> '' ORDER BY tok"
        ).fetchall()
    ]
    base, extras = vocab[:25], vocab[25:]
    rows = con.execute(
        f"SELECT doc_id, text, lang, source FROM "
        f"read_parquet('{src_sf}/documents.parquet') ORDER BY doc_id"
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
    con.execute(f"COPY docs TO '{fixture}/documents.parquet' (FORMAT parquet)")
    con.execute(
        "COPY (SELECT * REPLACE (CASE WHEN hash(l_orderkey) % 10 < 9 "
        "THEN 'N' ELSE l_returnflag END AS l_returnflag) "
        f"FROM read_parquet('{src_sf}/lineitem.parquet')) "
        f"TO '{fixture}/lineitem.parquet' (FORMAT parquet)"
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


def _oracle_check(con, sql: str, rows) -> bool:
    d = sorted(con.execute(sql).fetchall(), key=repr)
    s = sorted((tuple(r) for r in rows), key=repr)
    return len(s) == len(d) and all(repr(a) == repr(b) for a, b in zip(s, d))


def _timed(fn, n=N_RUNS):
    times, rows = [], None
    for _ in range(n):
        t0 = time.monotonic()
        rows = fn()
        times.append(round(time.monotonic() - t0, 3))
    return rows, times


def main() -> int:
    import importlib.util

    from pyspark.sql import functions as F

    from parallel_map_reduce_word_counter_for_one_machine_spark.operators import (
        dedup as D,
        graphdedup as G,
    )
    from parallel_map_reduce_word_counter_for_one_machine_spark.session import (
        get_spark,
    )

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    qs, osql = mod.queries(), mod.oracle_sql()
    spark = get_spark(app_name="skew-stress")
    spark.sparkContext.setLogLevel("ERROR")
    payload = {"tiers": {}}
    ok_all = True

    # ---- tier 1: sf0.01-scale, FULL oracles including the CTE closure ----
    fix1 = os.path.join(REPO, ".skewfix_sf001")
    meta1 = build_fixture("/root/testdata/sf0.01", fix1)
    con = duckdb.connect()
    for t in ("documents", "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{fix1}/{t}.parquet')"
        )
    tier1 = {"fixture": meta1, "results": {}}
    # hybrid_retrieval: the head word (~30% of tokens) is a degenerate
    # posting list — stage 1 scores the whole corpus for that term and
    # must still bound candidates via the window. tokenizer_bpe_ids: BPE
    # trained on the skewed vocabulary (head-word merges dominate).
    for name in (
        "word_count",
        "dedup_clusters_lsh",
        "agg_salted",
        "hybrid_retrieval",
        "tokenizer_bpe_ids",
    ):
        rows, times = _timed(lambda: qs[name](spark, fix1).collect(), n=1)
        ok = _oracle_check(con, osql[name], rows)
        ok_all &= ok
        tier1["results"][name] = {
            "rows": len(rows), "oracle_ok": bool(ok), "times_sec": times,
        }
        print(f"{'ok ' if ok else 'FAIL'} sf0.01-skew {name:22s} "
              f"{len(rows):7d} rows {times}")
    payload["tiers"]["sf0.01_full_oracles"] = tier1

    # ---- tier 2: sf0.1-scale — linear oracles + algorithm diversity ----
    fix2 = os.path.join(REPO, ".skewfix")
    meta2 = build_fixture("/root/testdata/sf0.1", fix2)
    con2 = duckdb.connect()
    for t in ("documents", "lineitem"):
        con2.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{fix2}/{t}.parquet')"
        )
    tier2 = {"fixture": meta2, "results": {}}
    for name in ("word_count", "agg_salted", "hybrid_retrieval"):
        rows, times = _timed(lambda: qs[name](spark, fix2).collect())
        ok = _oracle_check(con2, osql[name], rows)
        ok_all &= ok
        tier2["results"][name] = {
            "rows": len(rows), "oracle_ok": bool(ok), "times_sec": times,
            "best_sec": min(times),
        }
        print(f"{'ok ' if ok else 'FAIL'} sf0.1-skew  {name:22s} "
              f"{len(rows):7d} rows {times}")

    # dedup_clusters_lsh at sf0.1-skew: times + two independent checks
    # (the exact CTE oracle is O(n²·walk) and runs for hours on the welded
    # 5k-doc giant component — measured; the registered oracle gate runs
    # at sf0.01, tier 1 above)
    rows, times = _timed(lambda: qs["dedup_clusters_lsh"](spark, fix2).collect())
    labelprop = {(r.doc_id, r.cluster_id) for r in rows}
    # (a) algorithm diversity: large-star/small-star over the same verified
    # edge set must produce the identical component map
    pairs = D.lsh_verified_pairs(spark, fix2).localCheckpoint()
    star = G.connected_components_star(G._sym_edges(pairs))
    bigstar = {
        (r.node, r.component)
        for r in star.select("node", "component").collect()
    }
    div_ok = labelprop == bigstar
    # (b) closure validity: every verified edge's endpoints share a cluster
    cmap = {d: c for d, c in labelprop}
    edge_ok = all(
        cmap.get(r.doc_a) == cmap.get(r.doc_b) for r in pairs.collect()
    )
    min_ok = all(c <= d and cmap.get(c) == c for d, c in labelprop)
    ok = div_ok and edge_ok and min_ok
    ok_all &= ok
    tier2["results"]["dedup_clusters_lsh"] = {
        "rows": len(rows), "times_sec": times, "best_sec": min(times),
        "bigstar_identical": bool(div_ok),
        "every_edge_intra_cluster": bool(edge_ok),
        "cluster_id_is_component_min": bool(min_ok),
        "n_pairs": pairs.count(),
        "giant_cluster_size": max(
            __import__("collections").Counter(c for _, c in labelprop).values(),
            default=0,
        ),
    }
    print(f"{'ok ' if ok else 'FAIL'} sf0.1-skew  dedup_clusters_lsh "
          f"{len(rows):7d} rows {times} div={div_ok} edges={edge_ok}")
    payload["tiers"]["sf0.1_linear_oracles_plus_diversity"] = tier2

    with open(os.path.join(REPO, "BULK_r6.json"), "w") as fh:
        json.dump(payload, fh, indent=1)
    print("wrote BULK_r6.json; all green:", ok_all)
    return 0 if ok_all else 1


if __name__ == "__main__":
    raise SystemExit(main())
