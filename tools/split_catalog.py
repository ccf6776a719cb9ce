"""One-shot mechanical splitter for queries/catalog.py (r8 verdict ask #4).

Splits the 13k-line monolith into a `queries/catalog/` package of
per-tier modules at the existing section-comment boundaries, with query
bodies copied VERBATIM. Registration order is preserved by the package
__init__ importing the tier modules in file order. Cross-chunk name
references (shared SQL helpers defined in one tier, used in a later
one) are resolved by generated explicit imports; any forward reference
(earlier chunk using a later chunk's name) aborts the split.

Run once from the repo root; verify with tools/check_oracle.py and the
registry-order snapshot it writes to /tmp/registry_before.txt.
"""

from __future__ import annotations

import ast
import os
import sys

SRC = "pasta_pipeline_spark/queries/catalog.py"
PKG = "pasta_pipeline_spark/queries/catalog"

# (module_name, start_line, title) — start is the first line of the
# chunk (the opening "# ---" of its section header, or a @register
# line for the mechanical splits inside the unmarked 4642-9456 span).
CHUNKS = [
    ("t01_core_relational", 96, "core relational: scans, aggregations, joins, window dedup, merge/upsert, event-time windows"),
    ("t02_text_analysis", 567, "text analysis: hashes, word counts, fingerprints, lang-id, quality"),
    ("t03_dedup_ladder", 765, "dedup ladder: exact, fingerprint, Jaccard, SimHash, MinHash-LSH"),
    ("t04_similarity_ann", 895, "embedding similarity: cosine top-k, kNN join, sign-LSH ANN"),
    ("t05_multimodal", 1031, "multimodal plumbing + misc relational (media features, salted agg, cosine-dup pairs, JSON)"),
    ("t06_sampling_sessions", 1830, "deterministic sampling, packing, sessions, funnels"),
    ("t07_subdoc_robust", 2894, "sub-document dedup + robust stats / integer EWMA"),
    ("t08_relational_depth2", 3182, "relational depth II, corpus statistics II, intervals + graph triangles"),
    ("t09_tpch_round2_hygiene", 3466, "TPC-H round 2 + corpus hygiene, rolling frames, CDC, event gaps"),
    ("t10_summaries_ids", 4383, "mergeable summaries and scalable sequential ids"),
    ("t11_tpch_round3a", 4642, "TPC-H round 3 + extension surface, part A"),
    ("t12_tpch_round3b", 5843, "TPC-H round 3 + extension surface, part B"),
    ("t13_tpch_round3c", 7035, "TPC-H round 3 + extension surface, part C"),
    ("t14_tpch_round3d", 8211, "TPC-H round 3 + extension surface, part D"),
    ("t15_dsir", 9457, "DSIR importance resampling + r6 extension tier"),
    ("t16_round7", 10566, "round-7 tier"),
    ("t17_wave8", 11296, "wave 8: robust stats, AB testing, decayed counts, tokenizer audits"),
    ("t18_wave9", 11852, "wave 9: association mining, inferential stats, readability, denoising"),
    ("t19_wave10", 12091, "wave 10: journeys, temporal lags, RAKE, contrastive"),
    ("t20_waves11_22", 12339, "waves 11-22 (r8): governance, causal, privacy, GD training, BPE, survival, quantiles"),
]
END = None  # filled with len(lines)+1

CORE_EXPORTS = [
    "QuerySpec", "REGISTRY", "register", "spark_queries",
    "oracle_queries", "_t", "_tp", "_xsum",
]
HEADER_IMPORTS = {
    "DataFrame": "from pyspark.sql import DataFrame",
    "SparkSession": "from pyspark.sql import SparkSession",
    "Window": "from pyspark.sql import Window",
    "F": "from pyspark.sql import functions as F",
    "load_table": "from pasta_pipeline_spark.schemas import load_table",
    "DEFAULT_BUCKET_CAP": "from pasta_pipeline_spark.operators.similarity import DEFAULT_BUCKET_CAP",
    "dataclass": "from dataclasses import dataclass",
    "Callable": "from typing import Callable",
}


def main() -> None:
    src = open(SRC).read()
    lines = src.splitlines(keepends=True)
    end = len(lines) + 1
    tree = ast.parse(src)

    bounds = [c[1] for c in CHUNKS] + [end]

    def chunk_of(lineno: int) -> int:
        """Index into CHUNKS, or -1 for the _core header region."""
        if lineno < CHUNKS[0][1]:
            return -1
        for i in range(len(CHUNKS)):
            if bounds[i] <= lineno < bounds[i + 1]:
                return i
        raise AssertionError(lineno)

    # map: defined top-level name -> chunk index
    defined_in: dict[str, int] = {}
    # per-chunk: names used anywhere (incl. annotations, decorators)
    used: list[set[str]] = [set() for _ in CHUNKS]

    for node in tree.body:
        start = node.lineno
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)) and node.decorator_list:
            start = min(start, node.decorator_list[0].lineno)
        ci = chunk_of(start)
        names: list[str] = []
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            names = [node.name]
        elif isinstance(node, ast.Assign):
            names = [t.id for t in node.targets if isinstance(t, ast.Name)]
        elif isinstance(node, ast.AnnAssign) and isinstance(node.target, ast.Name):
            names = [node.target.id]
        elif isinstance(node, (ast.Import, ast.ImportFrom)):
            for a in node.names:
                names.append(a.asname or a.name.split(".")[0])
        for n in names:
            # later definitions don't override: first definition wins
            # for import resolution (append-only file, no redefs expected)
            if n in defined_in and defined_in[n] != ci:
                print(f"NOTE: {n} defined in chunks {defined_in[n]} and {ci}")
            defined_in.setdefault(n, ci)
        if ci >= 0:
            for sub in ast.walk(node):
                if isinstance(sub, ast.Name):
                    used[ci].add(sub.id)

    # resolve cross-chunk needs
    core_names = {n for n, c in defined_in.items() if c == -1}
    needs: list[dict[int, list[str]]] = []  # per chunk: src_chunk -> names
    for i in range(len(CHUNKS)):
        defined_here = {n for n, c in defined_in.items() if c == i}
        need: dict[int, list[str]] = {}
        for n in sorted(used[i]):
            if n in defined_here:
                continue
            c = defined_in.get(n)
            if c is None or c == i:
                continue
            if c == -1:
                continue  # handled via _core / header imports
            if c > i:
                sys.exit(
                    f"FORWARD REFERENCE: chunk {CHUNKS[i][0]} uses {n!r} "
                    f"defined in later chunk {CHUNKS[c][0]} — move it to _core"
                )
            need.setdefault(c, []).append(n)
        needs.append(need)

    os.makedirs(PKG, exist_ok=True)

    # ---- _core.py: header region verbatim (docstring, imports, registry)
    with open(f"{PKG}/_core.py", "w") as f:
        f.write("".join(lines[: CHUNKS[0][1] - 1]))

    # ---- tier modules
    for i, (mod, start, title) in enumerate(CHUNKS):
        stop = bounds[i + 1]
        body = "".join(lines[start - 1 : stop - 1])
        hdr = [
            f'"""Catalog tier: {title}.\n',
            "\n",
            "Split verbatim from the r8 catalog monolith (r8 verdict ask #4).\n",
            "Registration order is preserved by the package __init__ import\n",
            "order; registration stays APPEND-ONLY — new queries go at the end\n",
            "of the LAST tier module (or a new one imported last).\n",
            '"""\n\n',
            "from __future__ import annotations\n\n",
        ]
        used_hdr = [n for n in HEADER_IMPORTS if n in used[i]]
        for n in sorted(used_hdr):
            hdr.append(HEADER_IMPORTS[n] + "\n")
        core_used = sorted(n for n in CORE_EXPORTS if n in used[i])
        if core_used:
            hdr.append(
                "from pasta_pipeline_spark.queries.catalog._core import "
                + ", ".join(core_used) + "\n"
            )
        # other _core-region names (rare)
        extra_core = sorted(
            n for n in used[i]
            if n in core_names and n not in CORE_EXPORTS and n not in HEADER_IMPORTS
        )
        if extra_core:
            hdr.append(
                "from pasta_pipeline_spark.queries.catalog._core import "
                + ", ".join(extra_core) + "\n"
            )
        for c in sorted(needs[i]):
            hdr.append(
                f"from pasta_pipeline_spark.queries.catalog.{CHUNKS[c][0]} import "
                + ", ".join(sorted(needs[i][c])) + "\n"
            )
        hdr.append("\n")
        with open(f"{PKG}/{mod}.py", "w") as f:
            f.write("".join(hdr) + body)

    # ---- __init__.py
    with open(f"{PKG}/__init__.py", "w") as f:
        f.write('"""Catalog registry package — split from the former 13k-line\n')
        f.write("queries/catalog.py monolith (r8 verdict ask #4); see _core.py for\n")
        f.write("the cross-engine determinism conventions.\n\n")
        f.write("TIER IMPORT ORDER BELOW IS THE REGISTRATION ORDER — the driver's\n")
        f.write("correctness window keys on position, so the list is append-only:\n")
        f.write("add new tiers at the END, new queries at the end of the last tier.\n")
        f.write('"""\n\n')
        f.write("from pasta_pipeline_spark.queries.catalog._core import (  # noqa: F401\n")
        for n in CORE_EXPORTS:
            f.write(f"    {n},\n")
        f.write(")\n\n")
        for mod, _, _ in CHUNKS:
            f.write(f"from pasta_pipeline_spark.queries.catalog import {mod}  # noqa: E402,F401\n")

    print("wrote", PKG)


if __name__ == "__main__":
    main()
