"""Deep-budget BPE trainer structure probe (round 10): the BULK decade
ladder trains the driver-gate's 6-merge budget — which the r10 trainer
now finishes in ONE vocabulary pass per tier — so it no longer exercises
the merges-vs-passes STRUCTURE at production-like budgets. This probe
trains a 64-merge budget on the bulk x10 fixture (500k docs, verbatim
replication — vocabulary identical to sf0.1) and records passes /
batch_sizes / wall, splicing a `tokenizer_bpe_train64_x10` info block
into BULK_r10.json. Structure (passes ≪ merges) is the claim; wall time
is informational (n=2, min).

Run: python tools/bpe_budget_probe.py [BULK_file]
(argv[1] defaults to BULK_r10.json; naming a non-existent file starts a
fresh {"families": {...}} payload — used for the r11 post-fix
re-validation after the ADVICE r10 empty-batch repair.)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    from bulk_rehearsal import FIXROOT, _build_bpe_fixture, _make_session

    from parallel_map_reduce_word_counter_for_one_machine_spark.operators import (
        bpetrain,
    )
    from parallel_map_reduce_word_counter_for_one_machine_spark.operators.bpetrain import (
        _corpus_words,
        train_bpe,
    )
    from parallel_map_reduce_word_counter_for_one_machine_spark.sources.tables import (
        load_table,
    )

    path = os.path.join(REPO, sys.argv[1] if len(sys.argv) > 1 else "BULK_r10.json")
    payload = (
        json.load(open(path))
        if os.path.exists(path)
        else {"families": {}}
    )
    shutil.rmtree(FIXROOT, ignore_errors=True)
    spark = _make_session(shuffle_partitions=64)
    fix = _build_bpe_fixture(spark, "bpe_probe_x10", 1000, codec="zstd", n_files=64)
    words = _corpus_words(load_table(spark, fix, "documents")).localCheckpoint()
    runs = []
    for _ in range(2):
        t0 = time.monotonic()
        merges = train_bpe(words, 64)
        runs.append(
            {
                "wall_sec": round(time.monotonic() - t0, 1),
                "merges": len(merges),
                "passes": bpetrain.LAST_TRAIN_STATS["passes"],
                "batch_sizes": list(bpetrain.LAST_TRAIN_STATS["batch_sizes"]),
            }
        )
    entry = {
        "what": (
            "64-merge budget on the x10 fixture (500k docs): the structure "
            "claim — vocabulary passes MUCH fewer than merges — at a budget "
            "deep enough that the front of the pair table cannot be "
            "swallowed in one batch"
        ),
        "runs": runs,
        "passes_much_fewer_than_merges_ok": all(
            r["passes"] <= r["merges"] // 2 for r in runs
        ),
    }
    payload["families"]["tokenizer_bpe_train64_x10"] = entry
    with open(path, "w") as fh:
        json.dump(payload, fh, indent=1)
        fh.write("\n")
    print(json.dumps(entry["runs"]))
    print("passes<=merges/2:", entry["passes_much_fewer_than_merges_ok"])
    shutil.rmtree(FIXROOT, ignore_errors=True)
    return 0 if entry["passes_much_fewer_than_merges_ok"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
