"""Fresh-session A/B of the chunking/pipeline bench anomaly (VERDICT r07
item 3): BENCH_r07 recorded pack_sequences +127%, dedup_chunks +124%,
pii_scrub +79%, prepare_training_corpus +66%, dedup_spans_trim +61%,
chunk_documents +59% box-normalized vs BENCH_r06 — while the builder's
same-round pass showed the family flat and the driver pass's 1-min
loadavg rose 2.4 -> 11.4 mid-run. Code cause is unlikely (r7 touched
pipeline.py by 7 lines and chunking.py not at all), but the driver
record is the record: this runs the six keys in FRESH sessions against
the r6 and r7 checkouts (git worktrees), interleaved canary before every
key, n runs each, on a quiet box — attributing the delta to code or box
with data.

Run: python tools/chunk_ab.py      (writes CHUNK_AB_r8.json)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
R6_COMMIT = "8addcf0"  # round 6: verdict/advice/correctness/bench
R7_COMMIT = "2120f0b"  # round 7: verdict/advice/correctness/bench
KEYS = [
    "chunk_documents",
    "dedup_chunks",
    "pii_scrub",
    "pack_sequences",
    "prepare_training_corpus",
    "dedup_spans_trim",
]
N = 5

# Executed inside each checkout with its own python -- fresh JVM, fresh
# session, the checkout's own registry.
CHILD = r"""
import json, os, sys, time
sys.path.insert(0, sys.argv[1])
os.chdir(sys.argv[1])
from parallel_map_reduce_word_counter_for_one_machine_spark import registry
from parallel_map_reduce_word_counter_for_one_machine_spark.session import get_spark

registry.load_all()
spark = get_spark(app_name="chunk-ab")
spark.sparkContext.setLogLevel("ERROR")
sf = "/root/testdata/sf0.1"
keys = json.loads(sys.argv[2])
n = int(sys.argv[3])

def run(name):
    fn = registry.QUERIES[name]
    t0 = time.monotonic()
    fn(spark, sf).write.mode("overwrite").format("noop").save()
    return round(time.monotonic() - t0, 3)

# warm-in: the canary query until it stabilizes
canary_fn = registry.QUERIES["word_count"]
warm = []
for _ in range(8):
    t0 = time.monotonic()
    canary_fn(spark, sf).write.mode("overwrite").format("noop").save()
    warm.append(round(time.monotonic() - t0, 3))

out = {"warm_canary": warm, "canary": [], "keys": {}, "loadavg": []}
for name in keys:
    t0 = time.monotonic()
    canary_fn(spark, sf).write.mode("overwrite").format("noop").save()
    out["canary"].append(round(time.monotonic() - t0, 3))
    out["loadavg"].append(round(os.getloadavg()[0], 2))
    out["keys"][name] = [run(name) for _ in range(n)]
print("CHUNK_AB_RESULT " + json.dumps(out))
"""


def run_checkout(commit: str) -> dict:
    wt = f"/tmp/chunk_ab_{commit}"
    if not os.path.isdir(wt):
        subprocess.run(
            ["git", "-C", REPO, "worktree", "add", "--detach", wt, commit],
            check=True,
        )
    proc = subprocess.run(
        [sys.executable, "-c", CHILD, wt, json.dumps(KEYS), str(N)],
        capture_output=True,
        text=True,
        timeout=3600,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("CHUNK_AB_RESULT "):
            return json.loads(line[len("CHUNK_AB_RESULT "):])
    raise RuntimeError(
        f"no result line from {commit}:\n{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}"
    )


def main() -> int:
    payload = {"keys": KEYS, "n": N, "checkouts": {}}
    # alternate order would be better box hygiene; two passes each,
    # interleaved r6,r7,r6,r7 to cancel slow box drift
    seqs = [("r6", R6_COMMIT), ("r7", R7_COMMIT), ("r6b", R6_COMMIT), ("r7b", R7_COMMIT)]
    for tag, commit in seqs:
        res = run_checkout(commit)
        payload["checkouts"][tag] = res
        cmin = min(res["canary"] + res["warm_canary"][-3:])
        mins = {k: min(v) for k, v in res["keys"].items()}
        norm = {k: round(v * 0.114 / cmin, 3) for k, v in mins.items()}
        payload["checkouts"][tag]["min"] = mins
        payload["checkouts"][tag]["canary_min"] = cmin
        payload["checkouts"][tag]["box_normalized"] = norm
        print(tag, "canary_min", cmin, "mins", mins, flush=True)
    # verdict: per key, best box-normalized r7 vs r6 across both passes
    verdict = {}
    for k in KEYS:
        r6v = min(
            payload["checkouts"][t]["box_normalized"][k] for t in ("r6", "r6b")
        )
        r7v = min(
            payload["checkouts"][t]["box_normalized"][k] for t in ("r7", "r7b")
        )
        verdict[k] = {
            "r6_norm": r6v,
            "r7_norm": r7v,
            "ratio_r7_over_r6": round(r7v / max(r6v, 1e-9), 3),
        }
    payload["verdict"] = verdict
    with open(os.path.join(REPO, "CHUNK_AB_r8.json"), "w") as fh:
        json.dump(payload, fh, indent=1)
    print(json.dumps(verdict, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
