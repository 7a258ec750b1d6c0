"""Arrow-typed oracle gate — every DuckDB twin, every query, at sf0.01.

Round-6 lesson: the repr()-based local mirror stayed green on a
decimal128-vs-int64 type split (DuckDB SUM(BIGINT) -> HUGEINT) that the
driver's type-aware hasher flagged (q_domain_rebalance, the one r6
driver-red cell). This gate compares BOTH result sets at the Arrow
level — field types modulo the documented long/double canonicalization,
then values — so a twin whose aggregate drifts to decimal/HUGEINT (or
any other type the driver distinguishes) fails locally before it fails
on the scoreboard.

One pytest per query (parametrized) so a regression names its query.
Runs at sf0.01 — the driver's own comparison scale.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


def _load():
    import __spark_entry__ as entrymod

    return entrymod.queries(), entrymod.oracle_sql()


_QUERIES, _ORACLES = _load()


@pytest.fixture(scope="module")
def duck():
    from scripts.check_oracles import duck_connect

    con = duck_connect(SF_DIR)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_oracle_arrow_typed(spark, duck, name):
    from scripts.check_oracles import check_query

    if name not in _ORACLES:
        # rows-only queries (no SQL-expressible twin) still must run
        fn = _QUERIES[name]
        assert fn(spark, SF_DIR).toArrow().num_rows >= 0
        return
    problems = check_query(spark, duck, _QUERIES[name], _ORACLES[name], SF_DIR)
    assert not problems, f"{name}: {'; '.join(problems)}"
