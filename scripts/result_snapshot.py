"""Before/after result-identity harness for optimization rounds.

Runs __spark_entry__ queries and writes a JSON of
{query: {"rows": n, "hash": md5-of-normalized-sorted-rows}} so an
optimization can prove the restructured query returns bit-identical
results at ANY scale factor (the oracle gate only runs at sf0.01; this
catches scale-dependent drift such as float summation-order changes).

Usage: python scripts/result_snapshot.py <sf_dir> <out.json> [query ...]
Compare two snapshots: python scripts/result_snapshot.py --diff a.json b.json
"""

from __future__ import annotations

import hashlib
import json
import sys

sys.path.insert(0, ".")

from check_oracles import normalize_arrow  # noqa: E402


def snapshot(sf_dir: str, out_path: str, only: set[str]) -> int:
    import __spark_entry__ as entrymod
    from kenlm_spark.session import get_spark

    spark = get_spark("result-snapshot")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    out: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            tbl = fn(spark, sf_dir).toArrow()
            rows = normalize_arrow(tbl)
            h = hashlib.md5(
                "\n".join("\x1f".join(r) for r in rows).encode()
            ).hexdigest()
            out[name] = {"rows": tbl.num_rows, "hash": h}
            print(f"OK   {name}: rows={tbl.num_rows} hash={h[:12]}")
        except Exception as e:  # noqa: BLE001
            out[name] = {"error": str(e)[:500]}
            print(f"FAIL {name}: {e}")
    spark.stop()
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    return 0


def diff(a_path: str, b_path: str) -> int:
    a = json.load(open(a_path))
    b = json.load(open(b_path))
    rc = 0
    for k in sorted(set(a) & set(b)):
        if a[k] != b[k]:
            print(f"DIFF {k}: {a[k]} vs {b[k]}")
            rc = 1
    for k in sorted(set(a) ^ set(b)):
        print(f"ONLY-ONE {k}")
    if rc == 0:
        print(f"IDENTICAL: {len(set(a) & set(b))} queries compared")
    return rc


if __name__ == "__main__":
    if sys.argv[1] == "--diff":
        raise SystemExit(diff(sys.argv[2], sys.argv[3]))
    raise SystemExit(
        snapshot(sys.argv[1], sys.argv[2], set(sys.argv[3:]))
    )
