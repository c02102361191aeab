"""Dump .explain("formatted") for named registry queries to
plans/r14/<q>_<suffix>.txt (driver-side only; no job execution)."""
import os, sys
HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

def main():
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as entry_mod
    from seqarray_spark.session import get_spark
    qs = entry_mod.queries()
    spark = get_spark("plans-r14")
    spark.sparkContext.setLogLevel("ERROR")
    outdir = os.path.join(HERE, "plans", "r14")
    os.makedirs(outdir, exist_ok=True)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    keep = []  # hold every frame: rebinding df would GC the previous
    # query's frame, firing release_on_gc finalizers that unpersist
    # cache entries SHARED (by plan canonicalization) with queries not
    # yet explained — their dumps would lose InMemoryRelation nodes
    # that the bench's one-query-at-a-time flow does show
    for n in names:
        df = qs[n](spark, sf_dir)
        keep.append(df)
        txt = df._jdf.queryExecution().explainString(mode)
        with open(os.path.join(outdir, f"{n}_{suffix}.txt"), "w") as fh:
            fh.write(txt)
        print(f"wrote {n}_{suffix}.txt ({txt.count('Exchange')} Exchange refs)")
    spark.stop()

if __name__ == "__main__":
    main()
