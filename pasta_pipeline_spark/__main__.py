"""Command-line entry point — the "switch from the reference and run
your queries today" surface:

    python -m pasta_pipeline_spark list [--grep PATTERN]
    python -m pasta_pipeline_spark run <query> [--sf-dir DIR] [--limit N] [--json]
    python -m pasta_pipeline_spark explain <query> [--sf-dir DIR]
    python -m pasta_pipeline_spark sql "SELECT ..." [--sf-dir DIR] [--limit N] [--json]

``run`` executes a registered catalog query (queries/catalog.py);
``sql`` registers every testdata table as a temp view
(schemas.register_views) and runs arbitrary Spark SQL against them;
``explain`` prints the formatted physical plan — the same artifact
tools/plan_audit.py sweeps.
"""

from __future__ import annotations

import argparse
import json
import sys

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def _spark():
    from pasta_pipeline_spark.session import get_spark

    s = get_spark("pasta-cli")
    s.sparkContext.setLogLevel("ERROR")
    return s


def _emit(df, limit: int, as_json: bool, out=sys.stdout) -> None:
    # limit > 0: bounded collect (default 1000 keeps a fact-scale
    # query from OOMing the driver); limit 0 opts into an UNBOUNDED
    # result streamed through toLocalIterator — one partition on the
    # driver at a time, never the whole frame.
    rows = df.limit(limit).collect() if limit else df.toLocalIterator()
    cols = df.columns
    if not as_json:
        out.write("\t".join(cols) + "\n")
    for r in rows:
        if as_json:
            out.write(json.dumps(r.asDict(recursive=True), default=str) + "\n")
        else:
            out.write("\t".join(str(r[c]) for c in cols) + "\n")


def main(argv: list[str] | None = None, out=sys.stdout) -> int:
    p = argparse.ArgumentParser(prog="pasta_pipeline_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    p_list = sub.add_parser("list", help="list registered catalog queries")
    p_list.add_argument("--grep", default=None)

    for name in ("run", "explain"):
        sp = sub.add_parser(name)
        sp.add_argument("query")
        sp.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
        if name == "run":
            sp.add_argument("--limit", type=int, default=1000)
            sp.add_argument("--json", action="store_true")

    p_sql = sub.add_parser("sql", help="run Spark SQL over the testdata views")
    p_sql.add_argument("statement")
    p_sql.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    p_sql.add_argument("--limit", type=int, default=1000)
    p_sql.add_argument("--json", action="store_true")

    args = p.parse_args(argv)

    from pasta_pipeline_spark.queries.catalog import REGISTRY

    if args.cmd == "list":
        for name, spec in sorted(REGISTRY.items()):
            if args.grep and args.grep not in name:
                continue
            doc = " ".join((spec.doc or "").split())
            out.write(f"{name}\t{doc[:100]}\n")
        return 0

    if args.cmd in ("run", "explain"):
        if args.query not in REGISTRY:
            out.write(f"unknown query: {args.query!r} (try `list`)\n")
            return 2
        spark = _spark()
        df = REGISTRY[args.query].spark_fn(spark, args.sf_dir)
        if args.cmd == "explain":
            # public API only (df.explain prints to stdout; capture and
            # redirect) — the private _jvm/_jdf route breaks across
            # PySpark versions and under Spark Connect.
            import contextlib
            import io

            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain(mode="formatted")
            out.write(buf.getvalue())
            return 0
        _emit(df, args.limit, args.json, out)
        return 0

    # sql
    from pasta_pipeline_spark.schemas import register_views

    spark = _spark()
    register_views(spark, args.sf_dir)
    _emit(spark.sql(args.statement), args.limit, args.json, out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
