"""Scale up a testdata SF directory by an integer factor (default 10).

The driver measures rounds at a larger, driver-generated scale factor
(BENCH_r07.json: sf1.0) that is not present in this sandbox; this script
builds an approximation for local measurement by replicating each table
``k`` times with disjoint key ranges:

* every int64 key column (``*_id``, ``*key``) is offset by ``copy * OFF``
  so primary/foreign key relationships survive within a copy and ids
  stay globally unique;
* ``documents.text`` gets a per-copy suffix token (`` repN``) so exact/
  near-duplicate cluster SIZES stay at their generated values and the
  number of clusters scales — without it every document would gain 9
  exact copies and pair-generating dedup stages would see a quadratic,
  unrepresentative blowup;
* fixed dimension tables (``region``, ``nation``) are not replicated
  (TPC-H keeps them constant across scale factors, and sf0.1 vs sf0.01
  confirms the generator does too);
* row-group layout: output is written with one row group per copy, so a
  table that was one file/one row group at sf0.1 stays a realistic
  multi-split scan at the scaled size.

This is a measurement aid only — never an input to correctness gates.

Usage: python scripts/make_scale_testdata.py SRC_DIR DST_DIR [factor]
           [--dup-clusters]

``--dup-clusters`` skips the per-copy text suffix so every duplicate
cluster grows by the full factor — the harsher variant for stressing
pair-generating dedup stages (the driver's generator grows cluster sizes
with SF; BENCH_r07's sf1.0 phash clusters were ~10x the sf0.1 ones).
"""

from __future__ import annotations

import glob
import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

OFF = 1_000_000_000  # key offset per copy; far above any generated id
FIXED_TABLES = {"region", "nation"}


def _scale_table(
    name: str, table: pa.Table, factor: int, perturb_text: bool = True
) -> pa.Table:
    key_cols = [
        f
        for f in table.schema.names
        if (f.endswith("_id") or f.endswith("key"))
        # FKs into the fixed dimension tables must keep their values
        and not f.endswith(("nationkey", "regionkey"))
        and pa.types.is_int64(table.schema.field(f).type)
    ]
    copies = []
    for k in range(factor):
        t = table
        if k > 0:
            for col in key_cols:
                idx = t.schema.get_field_index(col)
                typ = t.schema.field(col).type
                shifted = pc.add(
                    t.column(col), pa.scalar(k * OFF, type=typ)
                )
                t = t.set_column(idx, t.schema.field(col), shifted)
            if name == "documents" and perturb_text:
                idx = t.schema.get_field_index("text")
                text = pc.binary_join_element_wise(
                    pc.coalesce(t.column("text"), pa.scalar("")),
                    pa.scalar(f" rep{k}"),
                    "",
                )
                t = t.set_column(idx, t.schema.field("text"), text)
        copies.append(t)
    return pa.concat_tables(copies)


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    perturb = "--dup-clusters" not in sys.argv
    src = args[0] if len(args) > 0 else "/root/testdata/sf0.1"
    dst = args[1] if len(args) > 1 else "/tmp/sfscaled"
    factor = int(args[2]) if len(args) > 2 else 10
    os.makedirs(dst, exist_ok=True)
    for path in sorted(glob.glob(os.path.join(src, "*.parquet"))):
        name = os.path.splitext(os.path.basename(path))[0]
        table = pq.read_table(path)
        n0 = table.num_rows
        if name not in FIXED_TABLES:
            table = _scale_table(name, table, factor, perturb)
        pq.write_table(
            table,
            os.path.join(dst, f"{name}.parquet"),
            row_group_size=max(n0, 1),
            compression="snappy",
        )
        print(f"{name}: {n0} -> {table.num_rows} rows")
    open(os.path.join(dst, "_DONE"), "w").close()


if __name__ == "__main__":
    main()
