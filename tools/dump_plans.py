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
        if name == "seq_chrom_rle":
            # VERDICT r8 nit 4: the registry query at this SF is under
            # the small-selection threshold, so the plan above is the
            # single-task fast path; also dump the DISTRIBUTED fold the
            # same call takes at scale (driver_threshold=0), so the
            # scale plan is reviewable without running tests
            from seqarray_spark.dataset import chrom_rle
            from seqarray_spark.sources import testdata as td

            ds = td.variant_dataset(spark, sf_dir)
            dist = chrom_rle(ds.variants, driver_threshold=0)
            lines += [
                "### seq_chrom_rle — distributed-fold variant "
                "(driver_threshold=0, the at-scale plan)",
                "",
                f"- shuffles (Exchange): {E.num_shuffles(dist)}",
                "",
                "```",
                E.plan_string(dist, "simple").strip(),
                "```",
                "",
            ]
    # self-verification (VERDICT r9 item 4): the dump must cover the
    # WHOLE registry — r9's PLANS.md went stale at 70/73 and the round's
    # one scale-killer plan shipped unreviewed in exactly the gap
    n_dumped = sum(1 for ln in lines if ln.startswith("## "))
    n_reg = len(entry_mod.queries())
    if n_dumped != n_reg:
        raise SystemExit(
            f"PLANS.md dump incomplete: {n_dumped} plans for {n_reg} "
            "registry queries — a query failed to build its DataFrame"
        )
    with open("PLANS.md", "w") as fh:
        fh.write("\n".join(lines))
    print(f"wrote PLANS.md ({n_dumped}/{n_reg} queries)")


if __name__ == "__main__":
    main()
