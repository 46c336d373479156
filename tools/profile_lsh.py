"""Stage-level profiles for the LSH pipelines (VERDICT r04 items 5-7):
times each materialization barrier of minhash_lsh_pairs /
embedding_lsh_pairs / dedup_spans separately at $SPARK_GRAFT_SF_DIR
(default sf0.1), N repetitions each, so a regression can be pinned to a
stage instead of guessed at from the end-to-end number.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from parallel_map_reduce_word_counter_for_one_machine_spark.operators import dedup as D
from parallel_map_reduce_word_counter_for_one_machine_spark.session import get_spark
from parallel_map_reduce_word_counter_for_one_machine_spark.sources.tables import (
    load_table,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N = int(os.environ.get("PROFILE_RUNS", "3"))


def t(label, fn):
    times = []
    for _ in range(N):
        t0 = time.monotonic()
        out = fn()
        times.append(round(time.monotonic() - t0, 3))
    print(f"{label:40s} {times} min={min(times)}")
    return out


def noop(df):
    df.write.mode("overwrite").format("noop").save()


def profile_minhash(spark):
    print("== minhash_lsh_pairs stages ==")
    docs = load_table(spark, SF_DIR, "documents")

    sigs = t("signatures (ckpt)", lambda: D.minhash_signatures(docs).localCheckpoint())
    cands = t("candidate pairs (from ckpt sigs)", lambda: D.lsh_candidate_pairs(sigs).localCheckpoint())
    sh = t(
        "shingle table (ckpt)",
        lambda: D._fan_out_small_input(docs)
        .select("doc_id", D._shingles().alias("sh"), F.size(D._shingles()).alias("n"))
        .localCheckpoint(),
    )

    def verify():
        a, b = sh.alias("a"), sh.alias("b")
        inter = F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh")))
        union = F.col("a.n") + F.col("b.n") - inter
        jac = F.when(union > 0, inter.cast("double") / union)
        out = (
            cands.join(a, cands.doc_a == F.col("a.doc_id"))
            .join(b, cands.doc_b == F.col("b.doc_id"))
            .select("doc_a", "doc_b", jac.alias("jaccard"))
            .filter(F.col("jaccard") >= D.JACCARD_THRESHOLD)
        )
        noop(out)

    t("verify join (pre-ckpt inputs)", verify)
    t("END-TO-END minhash_lsh_pairs", lambda: noop(D.minhash_lsh_pairs(spark, SF_DIR)))


def profile_embedding_lsh(spark):
    print("== embedding_lsh_pairs stages ==")
    emb = load_table(spark, SF_DIR, "embeddings")
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    norm = F.sqrt(
        F.aggregate(F.transform("v", lambda x: x * x), F.lit(0.0), lambda a_, u: a_ + u)
    )
    e = t(
        "unit-vector table (ckpt)",
        lambda: emb.select("vec_id", v.alias("v"), norm.alias("nrm"))
        .filter(F.col("nrm") > 0)
        .select("vec_id", F.transform("v", lambda x: x / F.col("nrm")).alias("u"))
        .localCheckpoint(),
    )
    sigs = t(
        "rhp signatures (ckpt)",
        lambda: D.rhp_signatures(e.withColumnRenamed("u", "v")).localCheckpoint(),
    )
    cands = t(
        "candidate pairs (from ckpt sigs)",
        lambda: D.lsh_candidate_pairs(
            sigs, n_bands=D.RHP_BANDS, n_hashes=D.RHP_BANDS, sort_prefix=4
        ).localCheckpoint(),
    )

    def verify():
        a, b = e.alias("a"), e.alias("b")
        cos = F.aggregate(
            F.zip_with(F.col("a.u"), F.col("b.u"), lambda p, q: p * q),
            F.lit(0.0),
            lambda acc, u: acc + u,
        )
        out = (
            cands.join(a, cands.doc_a == F.col("a.vec_id"))
            .join(b, cands.doc_b == F.col("b.vec_id"))
            .select(
                F.col("doc_a").alias("vec_a"),
                F.col("doc_b").alias("vec_b"),
                F.round(cos, 6).alias("cos_sim"),
            )
            .filter(F.col("cos_sim") >= D.SEMANTIC_COSINE)
        )
        noop(out)

    t("verify join (pre-ckpt inputs)", verify)
    t(
        "END-TO-END embedding_lsh_pairs",
        lambda: noop(D.embedding_lsh_pairs(emb.select("vec_id", v.alias("v")))),
    )


def profile_spans(spark):
    print("== dedup_spans ==")
    t(
        "END-TO-END dedup_spans",
        lambda: noop(
            __import__(
                "parallel_map_reduce_word_counter_for_one_machine_spark.registry",
                fromlist=["registry"],
            ).QUERIES["dedup_spans"](spark, SF_DIR)
        ),
    )


def main():
    from parallel_map_reduce_word_counter_for_one_machine_spark import registry

    registry.load_all()
    spark = get_spark(app_name="lsh-profile")
    spark.sparkContext.setLogLevel("ERROR")
    which = sys.argv[1:] or ["minhash", "embedding", "spans"]
    if "minhash" in which:
        profile_minhash(spark)
    if "embedding" in which:
        profile_embedding_lsh(spark)
    if "spans" in which:
        profile_spans(spark)


if __name__ == "__main__":
    main()
