"""SemDeDup (operators/semdedup.py): clustering reuse, the paper's
least-centroid-typical keep rule, and the degenerate-cell guard."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from kenlm_spark.operators.semdedup import semdedup_labels


def _rows():
    """Two well-separated direction clusters in 4-d; cluster A holds a
    3-member near-dup clique + one distinct member, cluster B holds a
    2-member clique + one distinct member."""
    a = np.array([1.0, 0.05, 0.0, 0.0])
    b = np.array([0.0, 0.0, 1.0, -0.05])

    def py(v):
        return [float(x) for x in v]

    rows = [
        (0, py(a)),
        (1, py(a + [0.001, 0.0, 0.0, 0.0])),
        (2, py(a + [0.0, 0.002, 0.0, 0.0])),
        (3, [0.2, 0.9, 0.0, 0.0]),  # same cell as A, not a near-dup
        (10, py(b)),
        (11, py(b + [0.0, 0.0, 0.001, 0.0])),
        (12, [0.0, 0.1, 0.3, 0.9]),  # same half-space as B, distinct
    ]
    return rows


def test_keep_rule_least_typical_survives(spark):
    df = spark.createDataFrame(
        _rows(), "vec_id long, embedding array<double>"
    )
    out = semdedup_labels(
        df, tau=0.99, n_cells=2, sample_frac=1.0
    ).collect()
    got = {r["nid"]: r for r in out}
    assert len(got) == 7
    # cliques resolve to exactly one survivor each
    assert sum(got[i]["keep"] for i in (0, 1, 2)) == 1
    assert sum(got[i]["keep"] for i in (10, 11)) == 1
    # non-duplicates always keep
    assert got[3]["keep"] and got[12]["keep"]
    # the survivor of a fully-connected clique is the (c_sim, nid)-min
    # member: it wins every pairwise contest under the paper rule
    for clique in ((0, 1, 2), (10, 11)):
        winner = min(clique, key=lambda i: (got[i]["c_sim"], i))
        assert got[winner]["keep"]
        assert all(not got[i]["keep"] for i in clique if i != winner)
    # members of one clique share a cell (k-means put them together)
    assert len({got[i]["cell"] for i in (0, 1, 2)}) == 1


def test_max_cell_guard_skips_degenerate_cluster(spark):
    rows = _rows()
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    out = {
        r["nid"]: r["keep"]
        for r in semdedup_labels(
            df, tau=0.99, n_cells=2, sample_frac=1.0, max_cell=3
        ).collect()
    }
    # k-means splits this corpus {0,1,2} / {3,10,11,12} (the A clique is
    # so tight it owns a cell): the 4-member cell exceeds max_cell=3 and
    # is skipped from pairing — the B clique (10, 11) keeps BOTH members
    # — while the 3-member cell still dedups the A clique to 1 survivor.
    assert out[10] and out[11]
    assert sum(out[i] for i in (0, 1, 2)) == 1
    assert out[3] and out[12]


def test_labels_cover_corpus_and_match_sql_shape(spark):
    df = spark.createDataFrame(
        _rows(), "vec_id long, embedding array<double>"
    )
    out = semdedup_labels(df, tau=0.99, n_cells=2, sample_frac=1.0)
    assert [f.name for f in out.schema.fields] == [
        "nid", "cell", "c_sim", "keep",
    ]
    # every input row gets a label exactly once
    assert out.groupBy("nid").count().filter(F.col("count") > 1).count() == 0
    assert out.count() == 7
