"""Local replica of the driver's t2 correctness gate.

Runs every __spark_entry__.queries() entry on Spark and its oracle_sql()
twin on DuckDB at sf0.01, then compares row count, column names, and an
order-insensitive canonicalized value dump. Exact string equality after
canonicalization — stricter than any plausible driver hash, so passing
here should pass the gate.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, ".")


def canon(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return f"{v:.9g}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{canon(v[k])}" for k in sorted(v)) + "}"
    return str(v)


def rows_to_canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(canon(r[i]) for i in order) for r in rows)


def run_checks(spark, sf_dir, only=None, echo=print):
    """Run every queries() entry against its oracle_sql() twin; returns
    [(name, problem)] — empty means all pass. Importable so pytest can
    sweep the FULL registry (including entries past the external
    driver's 50-query window) every run."""
    import duckdb

    import __spark_entry__ as entry_mod

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append((name, f"spark error: {e}"))
            echo(f"FAIL {name}: spark error: {e}")
            continue
        if name not in oracles:
            echo(f"ok   {name}: rows-only check, {len(srows)} rows")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            failures.append((name, f"duckdb error: {e}"))
            echo(f"FAIL {name}: duckdb error: {e}")
            continue
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rowcount {len(srows)} vs {len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols {sorted(scols)} vs {sorted(ocols)}")
        if not problems:
            sc, oc = rows_to_canon(scols, srows), rows_to_canon(ocols, orows)
            if sc != oc:
                ndiff = sum(1 for a, b in zip(sc, oc) if a != b)
                example = next((a, b) for a, b in zip(sc, oc) if a != b)
                problems.append(f"{ndiff} differing rows; e.g. {example[0][:120]} vs {example[1][:120]}")
        if problems:
            failures.append((name, "; ".join(problems)))
            echo(f"FAIL {name}: {'; '.join(problems)}")
        else:
            echo(f"ok   {name}: {len(srows)} rows match oracle")

    echo(f"\n{len(queries) - len(failures)}/{len(queries)} queries pass")
    return failures


def main():
    from seqarray_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    failures = run_checks(get_spark("check-correctness"), sf_dir, only)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
