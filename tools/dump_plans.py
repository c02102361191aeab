"""Dump the physical plan of every driver-contract query to PLANS.md —
reviewable evidence that filters push down, scans prune columns, dims
broadcast, and aggregates combine map-side.

Usage: python tools/dump_plans.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")


def main():
    import __spark_entry__ as entry_mod
    from seqarray_spark.plans import explain as E
    from seqarray_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("dump-plans")
    spark.sparkContext.setLogLevel("ERROR")

    lines = [
        "# PLANS — physical plans of every `__spark_entry__.queries()` entry",
        "",
        f"Generated against `{sf_dir}`. Summary per query: shuffles,",
        "broadcast joins, pushed filters, read schemas; full `formatted`",
        "plan follows.",
        "",
    ]
    for name, fn in entry_mod.queries().items():
        df = fn(spark, sf_dir)
        lines += [
            f"## {name}",
            "",
            f"- shuffles (Exchange): {E.num_shuffles(df)}",
            f"- broadcast joins: {E.broadcast_join_count(df)}",
            f"- sort-merge joins: {E.sortmerge_join_count(df)}",
            f"- pushed filters: {E.pushed_filters(df) or '—'}",
            f"- read schemas: {E.read_schemas(df) or '—'}",
            "",
            "```",
            E.plan_string(df, "simple").strip(),
            "```",
            "",
        ]
    with open("PLANS.md", "w") as fh:
        fh.write("\n".join(lines))
    print(f"wrote PLANS.md ({len(entry_mod.queries())} queries)")


if __name__ == "__main__":
    main()
