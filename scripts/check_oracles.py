"""Local mirror of the driver's correctness gate — Arrow-typed.

Runs every __spark_entry__ query on Spark and its oracle on DuckDB over
the same sf dir and compares row count, schema (names), **Arrow-level
field types** (modulo the documented canonicalization below), and
order-insensitive values (columns sorted by name, rows sorted).

Type canonicalization (the ONLY widenings the comparison forgives —
chosen to match a type-aware driver hasher's behavior):

* every signed/unsigned integer width  -> long
* float32 / float64                    -> double
* string / large_string / string_view  -> string
* binary / large_binary                -> binary
* list / large_list / fixed_size_list  -> array<canon(child)>
* timestamp (any unit; tz-naive only)  -> timestamp

Everything else — in particular DECIMAL (DuckDB's SUM(BIGINT) ->
HUGEINT -> decimal128 trap, round 6's one driver-red cell) — compares
verbatim and FAILS against an int64/double twin. This is deliberate:
the round-6 repr()-based mirror stayed green on a decimal-vs-int64
split that the driver's type-aware hasher flagged; this gate can't.

Usage: python scripts/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime
import math
import sys

import duckdb
import pyarrow as pa

sys.path.insert(0, ".")

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def canon_type(t: pa.DataType) -> str:
    """Canonical spelling of an Arrow type for cross-engine comparison."""
    if pa.types.is_integer(t):
        return "long"
    if pa.types.is_floating(t):
        return "double"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_timestamp(t):
        # unit is a transport detail; a tz-aware vs naive split is real
        # and surfaces via the value compare (normalize() keys on UTC)
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    if (
        pa.types.is_list(t)
        or pa.types.is_large_list(t)
        or pa.types.is_fixed_size_list(t)
    ):
        return f"array<{canon_type(t.value_type)}>"
    if pa.types.is_struct(t):
        inner = ",".join(f"{f.name}:{canon_type(f.type)}" for f in t)
        return f"struct<{inner}>"
    # decimals, maps, unions, null: verbatim — intentionally NOT folded
    return str(t)


def _norm_value(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9))
    if isinstance(v, datetime.datetime):
        # Spark toArrow stamps the session tz; DuckDB is naive — compare
        # instants: naive values are treated as UTC (this box's session tz)
        if v.tzinfo is not None:
            v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        return v.isoformat()
    if isinstance(v, list):
        return "[" + ",".join(_norm_value(x) for x in v) + "]"
    return repr(v)


def normalize_arrow(tbl: pa.Table):
    """Sorted-row tuples of normalized reprs, columns sorted by name."""
    cols = sorted(tbl.column_names)
    pylists = {c: tbl.column(c).to_pylist() for c in cols}
    out = [
        tuple(_norm_value(pylists[c][i]) for c in cols)
        for i in range(tbl.num_rows)
    ]
    out.sort()
    return out


def compare_tables(spark_tbl: pa.Table, duck_tbl: pa.Table) -> list[str]:
    """Problem list (empty == match) for two Arrow result tables."""
    problems: list[str] = []
    if spark_tbl.num_rows != duck_tbl.num_rows:
        problems.append(f"rows {spark_tbl.num_rows} vs {duck_tbl.num_rows}")
    s_names = sorted(spark_tbl.column_names)
    d_names = sorted(duck_tbl.column_names)
    if s_names != d_names:
        problems.append(f"schema {s_names} vs {d_names}")
        return problems
    for name in s_names:
        st = canon_type(spark_tbl.schema.field(name).type)
        dt = canon_type(duck_tbl.schema.field(name).type)
        if st != dt:
            problems.append(f"type[{name}] spark={st} vs duckdb={dt}")
    if problems:
        return problems
    a = normalize_arrow(spark_tbl)
    b = normalize_arrow(duck_tbl)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y]
        problems.append(f"{len(diffs)} value mismatches; first: {diffs[:2]}")
    return problems


def check_query(spark, con, fn, sql: str | None, sf_dir: str) -> list[str]:
    """Run one query both ways; return the problem list ([] == OK,
    ['SKIP'] == no oracle). Shared by the CLI and the pytest gate."""
    sdf = fn(spark, sf_dir)
    spark_tbl = sdf.toArrow()
    if sql is None:
        return ["SKIP"]
    duck_tbl = con.execute(sql).fetch_arrow_table()
    return compare_tables(spark_tbl, duck_tbl)


def duck_connect(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from kenlm_spark.session import get_spark

    spark = get_spark("oracle-check", shuffle_partitions=8)
    con = duck_connect(sf_dir)

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            problems = check_query(spark, con, fn, oracles.get(name), sf_dir)
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: error: {e}")
            failures += 1
            continue
        if problems == ["SKIP"]:
            print(f"SKIP {name}: no oracle")
        elif problems:
            print(f"FAIL {name}: {'; '.join(problems)}")
            failures += 1
        else:
            print(f"OK   {name}")

    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
