"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin
on DuckDB at the given scale factor, then compares row count, column
names, and an order-insensitive value hash (rows sorted by their
string rendering; floats rendered via repr of float64).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import math
import sys
import time

import duckdb


def _norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # full-precision rendering: any last-bit double divergence between
        # the engines must show up here (the driver hashes raw values, so a
        # lenient rendering would hide real mismatches)
        return repr(v)
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def _hash_rows(cols, rows):
    # sort columns by name, then rows lexicographically
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x1f".join(_norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode("utf-8"))
        h.update(b"\n")
    return h.hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry_mod
    from pasta_pipeline_spark.operators.util import release_cached_deps
    from pasta_pipeline_spark.session import get_spark

    spark = get_spark("oracle-check", shuffle_partitions=8)
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
            release_cached_deps(sdf)
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"OK?  {name}: rows-only ({len(srows)} rows, {time.time()-t0:.1f}s) — no oracle")
            continue
        try:
            orel = con.sql(oracles[name])
            ocols = [c.lower() for c in orel.columns]
            # dtype audit: HUGEINT (DuckDB's SUM-over-INT result) and JSON
            # round-trip unpredictably through pandas/arrow on the driver
            # side (HUGEINT -> float64 renders 99111.0 vs Spark's 99111),
            # so any oracle emitting them is a latent hash mismatch even
            # when fetchall() values agree. Fail fast on the type.
            risky = [
                (c, str(t))
                for c, t in zip(orel.columns, orel.types)
                if str(t) in ("HUGEINT", "UHUGEINT", "JSON")
            ]
            orows = orel.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {e}")
            continue
        scols_l = [c.lower() for c in scols]
        problems = []
        if risky:
            problems.append(f"driver-fragile oracle dtypes: {risky} (cast to BIGINT/VARCHAR)")
        if sorted(scols_l) != sorted(ocols):
            problems.append(f"cols spark={scols_l} duck={ocols}")
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} duck={len(orows)}")
        if not problems:
            sh = _hash_rows(scols_l, [tuple(r) for r in srows])
            oh = _hash_rows(ocols, orows)
            if sh != oh:
                problems.append("value-hash mismatch")
                # show first differing sorted row for debugging
                order_s = sorted(range(len(scols_l)), key=lambda i: scols_l[i])
                order_o = sorted(range(len(ocols)), key=lambda i: ocols[i])
                a = sorted("\x1f".join(_norm_cell(r[i]) for i in order_s) for r in [tuple(x) for x in srows])
                b = sorted("\x1f".join(_norm_cell(r[i]) for i in order_o) for r in orows)
                for x, y in zip(a, b):
                    if x != y:
                        problems.append(f"  spark: {x!r}")
                        problems.append(f"  duck : {y!r}")
                        break
        if problems:
            failures.append(name)
            print(f"FAIL {name}: " + "; ".join(problems[:1]))
            for p in problems[1:]:
                print(p)
        else:
            print(f"PASS {name} ({len(srows)} rows, {time.time()-t0:.1f}s)")

    print()
    if failures:
        print(f"{len(failures)} FAILURES: {failures}")
        sys.exit(1)
    print("all queries pass")


if __name__ == "__main__":
    main()
