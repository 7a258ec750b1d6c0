"""Throughput in the REFERENCE'S metric definition: kenlm_benchmark's
id-stream protocol (queries/sec excluding load, every token + EOS is one
query) over the sf0.1 caption corpus.

Two measurements, appended to BENCH/BASELINE.md:
  * ours — `python -m kenlm_spark.benchmark_cli -v | -q` (numpy
    score_batch, single process, the same kernel every Spark executor
    runs per Arrow batch);
  * reference — the COMPILED reference scoring the same sentences
    through its python binding (Model.score, bos/eos). Caveat: the
    binding adds one Cython call per sentence vs the pure-C++
    kenlm_benchmark binary (unbuildable here: boost), so the reference
    number is a floor for the reference's true single-thread speed.

Usage: python scripts/bench_kenlm_benchmark.py
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time

sys.path.insert(0, ".")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ARPA = os.path.join(REPO, "tests", "fixtures", "test.arpa")


def main() -> None:
    import duckdb

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    texts = [
        (r[0] or "").replace("\n", " ")
        for r in duckdb.sql(
            f"select text from '{sf_dir}/documents.parquet'"
        ).fetchall()
    ]
    text = "".join(t + "\n" for t in texts)

    klm = "/tmp/bench_probing.klm"
    from kenlm_spark.build_binary_cli import main as bb_main

    bb_main(["probing", ARPA, klm])

    conv = subprocess.run(
        [sys.executable, "-m", "kenlm_spark.benchmark_cli", "-v", "-m", klm],
        input=text.encode(), capture_output=True, check=True,
    )
    best = None
    for _ in range(3):
        q = subprocess.run(
            [sys.executable, "-m", "kenlm_spark.benchmark_cli", "-q", "-m",
             klm, "-t", "1"],
            input=conv.stdout, capture_output=True, check=True,
        )
        out = q.stdout.decode()
        qps = float(
            re.search(
                r"Queries per second excluding load, CPU: \S+ Wall: (\S+)", out
            ).group(1)
        )
        queries = int(re.search(r"Queries: (\d+)", out).group(1))
        psum = float(
            re.search(r"Probability sum: (\S+)", q.stderr.decode()).group(1)
        )
        if best is None or qps > best[0]:
            best = (qps, queries, psum)
    qps, queries, psum = best

    ref = None
    if os.path.exists("/tmp/refbuild"):
        sys.path.insert(0, "/tmp/refbuild")
        try:
            import kenlm as ref_kenlm

            rm = ref_kenlm.Model(klm)
            ref_best = None
            for _ in range(3):
                t0 = time.perf_counter()
                rsum = 0.0
                for t in texts:
                    rsum += rm.score(t, bos=True, eos=True)
                wall = time.perf_counter() - t0
                if ref_best is None or wall < ref_best[0]:
                    ref_best = (wall, rsum)
            ref = {
                "queries_per_sec_wall": round(queries / ref_best[0], 1),
                "probability_sum": round(ref_best[1], 4),
            }
            assert abs(ref_best[1] - psum) < 1e-2 * max(1, abs(psum)), (
                ref_best[1], psum,
            )
        except ImportError:
            pass

    result = {
        "metric": "kenlm_benchmark_queries_per_sec_excluding_load",
        "value": round(qps, 1),
        "unit": "queries/sec",
        "queries": queries,
        "probability_sum": round(psum, 4),
        "reference_binding": ref,
        "sf": sf_dir,
    }
    print(json.dumps(result))

    section = f"""

## kenlm_benchmark twin: throughput in the reference's own units

`kenlm_spark.benchmark_cli` replicates `lm/kenlm_benchmark_main.cc`'s
id-stream protocol (-v vocab conversion, -q timed query, every token +
per-line EOS = one query, load excluded). On the sf0.1 caption corpus
({len(texts)} sentences, {queries} queries, probing model):

| engine | queries/sec (wall, excluding load) |
|---|---|
| ours (benchmark_cli -q, numpy score_batch, 1 process) | {qps:,.0f} |
| compiled reference via python binding (same stream) | {(ref or {}).get('queries_per_sec_wall', 'n/a')} |

Probability sums agree ({psum:.4f}); the binding adds one Cython call
per sentence vs the pure-C++ binary (unbuildable here — boost), so the
reference number is a floor. Note this is the SINGLE-THREAD metric the
reference's README reports relative numbers in; the engine's
distributed throughput is the captions/sec line in bench.py.
"""
    with open("BENCH/BASELINE.md", "a") as fh:
        fh.write(section)


if __name__ == "__main__":
    main()
