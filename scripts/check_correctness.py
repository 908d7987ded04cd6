#!/usr/bin/env python
"""Local replica of the driver's correctness gate.

Runs each `__spark_entry__.queries()` entry on Spark AND its
`oracle_sql()` DuckDB twin at sf0.01 (tables pre-registered as views),
canonicalizes both frames (columns sorted by name, rows sorted by all
columns), and reports rows/schema/value matches. Use while iterating:

    python scripts/check_correctness.py            # all queries
    python scripts/check_correctness.py d_simhash_pairs e_lsh_topk
    python scripts/check_correctness.py --json CORRECTNESS_LOCAL_r05.json

With --json PATH the per-query results are ALSO written in the
driver's CORRECTNESS_r{N}.json format (rows_match/schema_match/
hash_match/spark_rows/oracle_rows/err), so every round can commit a
hard-signal artifact covering the FULL queries() surface even when
the driver samples a subset (round-4 verdict item #1).
"""

from __future__ import annotations

import math
import sys

import duckdb
import pandas as pd

SF_DIR = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _dtype_class(dt) -> str:
    s = str(dt).lower()
    if "float" in s or "double" in s:
        return "float"
    if "int" in s:
        return "int"
    if "bool" in s:
        return "bool"
    return "other"


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.copy()
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].map(
                lambda v: tuple(v) if isinstance(v, (list, tuple)) else v
            )
        elif "float" in str(pdf[c].dtype):
            pdf[c] = pdf[c].astype("float64")
        elif "int" in str(pdf[c].dtype).lower():
            pdf[c] = pdf[c].astype("int64")
    pdf = pdf[sorted(pdf.columns)]
    if len(pdf):
        pdf = pdf.sort_values(list(pdf.columns), kind="mergesort")
    return pdf.reset_index(drop=True)


def _values_equal(a, b) -> bool:
    if a.shape != b.shape or list(a.columns) != list(b.columns):
        return False
    for c in a.columns:
        x, y = a[c], b[c]
        if "float" in str(x.dtype) or "float" in str(y.dtype):
            ok = all(
                (math.isnan(p) and math.isnan(q)) or p == q
                for p, q in zip(
                    x.astype("float64"), y.astype("float64")
                )
            )
        else:
            ok = x.astype(str).equals(y.astype(str))
        if not ok:
            print(f"    column {c!r} differs")
            bad = [
                (i, p, q)
                for i, (p, q) in enumerate(zip(x, y))
                if str(p) != str(q)
            ][:5]
            for i, p, q in bad:
                print(f"      row {i}: spark={p!r} oracle={q!r}")
            return False
    return True


def main():
    args = sys.argv[1:]
    json_path = None
    if "--json" in args:
        i = args.index("--json")
        json_path = args[i + 1]
        args = args[:i] + args[i + 2:]
    names = args
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry
    from louvain_communities_openmp_spark.session import get_spark

    spark = get_spark(app_name="check", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )

    qs = entry.queries()
    oq = entry.oracle_sql()
    sel = names or list(qs)
    fails = []
    report: dict[str, dict] = {}
    for name in sel:
        if name not in qs:
            print(f"{name}: UNKNOWN query")
            continue
        try:
            sdf = qs[name](spark, SF_DIR).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"{name}: SPARK ERROR {type(e).__name__}: {e}")
            fails.append(name)
            report[name] = {
                "rows_match": False, "schema_match": False,
                "hash_match": False, "spark_rows": None,
                "oracle_rows": None,
                "err": f"spark: {type(e).__name__}: {e}",
            }
            continue
        if name not in oq:
            # driver semantics: no oracle twin → weaker rows-only check
            print(f"{name}: no_oracle ({len(sdf)} rows)")
            report[name] = {
                "rows_match": len(sdf) >= 0, "schema_match": None,
                "hash_match": None, "spark_rows": len(sdf),
                "oracle_rows": None, "err": None,
                "note": "no_oracle (rows-only check)",
            }
            continue
        try:
            odf = con.sql(oq[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ORACLE ERROR {type(e).__name__}: {e}")
            fails.append(name)
            report[name] = {
                "rows_match": False, "schema_match": False,
                "hash_match": False, "spark_rows": len(sdf),
                "oracle_rows": None,
                "err": f"oracle: {type(e).__name__}: {e}",
            }
            continue
        # dtype-class gate BEFORE canonicalization: the driver hashes raw
        # values, so an int column on one side vs float on the other
        # (e.g. DuckDB HUGEINT->float64) is a driver FAIL even when the
        # int64-coerced values match (round-2 A7 escaped exactly this way)
        dtype_ok = True
        shared = set(sdf.columns) & set(odf.columns)
        for c in sorted(shared):
            ca, cb = _dtype_class(sdf[c].dtype), _dtype_class(odf[c].dtype)
            if ca != cb:
                print(
                    f"{name}: DTYPE MISMATCH col {c!r}: "
                    f"spark={sdf[c].dtype} oracle={odf[c].dtype}"
                )
                dtype_ok = False
        a, b = _canon(sdf), _canon(odf)
        rows = len(a) == len(b)
        schema = list(a.columns) == list(b.columns)
        vals = rows and schema and _values_equal(a, b)
        status = "OK" if (rows and schema and vals and dtype_ok) else "FAIL"
        print(
            f"{name}: {status} rows={len(a)}/{len(b)} schema={schema} "
            f"values={vals}"
        )
        report[name] = {
            "rows_match": rows,
            "schema_match": schema and dtype_ok,
            "hash_match": bool(vals and dtype_ok),
            "spark_rows": len(a),
            "oracle_rows": len(b),
            "err": None,
        }
        if status == "FAIL":
            fails.append(name)
            if not schema:
                print(f"    spark cols:  {list(a.columns)}")
                print(f"    oracle cols: {list(b.columns)}")
    spark.stop()
    if json_path:
        import json

        with open(json_path, "w") as f:
            json.dump(report, f, indent=2)
        print(f"\nwrote {json_path} ({len(report)} queries)")
    if fails:
        print(f"\nFAILED: {fails}")
        sys.exit(1)
    print("\nall green")


if __name__ == "__main__":
    main()
