"""Per-variant / per-sample aggregations (SURVEY.md §2.5).

All are single groupBy().agg() plans: Spark's partial aggregation
(map-side combine) + AQE replaces the reference's split-selection →
per-worker C kernel → combine pattern (reference: R/Utilities.R:1008-1124
seqParallel; kernels src/Methods.cpp:122-1009).

Scale notes: every aggregate here shuffles once on variant_id (or
sample_id). At 100 TB the map-side combine reduces each group's traffic to
a handful of longs before the shuffle, so these plans are shuffle-light;
none of them collect to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from seqarray_spark.functions.variant import (
    allele_count_in_call,
    nonmissing_in_call,
)

# Missing-call predicate: a call is missing if its alleles array is NULL or
# contains any NULL slot (reference: FC_Missing_* src/Methods.cpp:122-246;
# raw 0xFF missing code src/Index.h:56).
def _call_missing(col="alleles"):
    a = F.col(col)
    return a.isNull() | (F.size(F.filter(a, lambda x: x.isNull())) > 0)


# Slot-level missing accounting — the reference's missing rates divide
# missing ALLELE SLOTS by total slots (FC_Missing_PerVariant counts
# NA_RAW over the full ploidy x samples grid, src/Methods.cpp:122-138),
# so a half-missing diploid call contributes 0.5, not 1.0. A NULL
# alleles array stands for a fully-missing call of `ploidy` slots.
def _miss_slots(col="alleles", ploidy: int = 2):
    a = F.col(col)
    return F.when(a.isNull(), F.lit(ploidy)).otherwise(
        F.size(F.filter(a, lambda x: x.isNull()))
    )


def _total_slots(col="alleles", ploidy: int = 2):
    a = F.col(col)
    return F.when(a.isNull(), F.lit(ploidy)).otherwise(F.size(a))


def allele_freq(
    calls: DataFrame,
    ref_allele: int | None = 0,
    minor: bool = False,
    ploidy: int = 2,
) -> DataFrame:
    """Per-variant allele frequency (reference: seqAlleleFreq
    R/Methods.R:905-1021; kernels FC_AF_* src/Methods.cpp:333-606).

    ref_allele=k: frequency of allele index k among non-missing slots.
    ref_allele=None: full per-allele frequency list (reference FC_AF_List).
    minor=True folds to min(f, 1-f) — MAF.
    """
    if ref_allele is None:
        return per_allele_table(calls).withColumn(
            "freq", F.col("count") / F.col("total")
        )
    cnt = allele_count_in_call("alleles", ref_allele)
    out = calls.groupBy("variant_id").agg(
        (
            F.sum(cnt).cast("double")
            / F.sum(nonmissing_in_call("alleles")).cast("double")
        ).alias("af")
    )
    if minor:
        out = out.withColumn(
            "af", F.least(F.col("af"), F.lit(1.0) - F.col("af"))
        ).withColumnRenamed("af", "maf")
    return out


def allele_count(calls: DataFrame, ref_allele: int | None = 0, minor: bool = False) -> DataFrame:
    """Per-variant allele counts (reference: seqAlleleCount
    R/Methods.R:1028-1144; FC_AC_* src/Methods.cpp:613-806)."""
    if ref_allele is None:
        return per_allele_table(calls).select("variant_id", "allele", "count")
    cnt = allele_count_in_call("alleles", ref_allele)
    out = calls.groupBy("variant_id").agg(
        F.sum(cnt).cast("bigint").alias("_ac"),
        F.sum(nonmissing_in_call("alleles")).cast("bigint").alias("an"),
    )
    # all slots missing -> NA, not 0 (reference FC_AC_Ref:
    # '(n < N) ? (int)m : NA_INTEGER', src/Methods.cpp:613-627)
    out = out.withColumn(
        "ac", F.when(F.col("an") > 0, F.col("_ac"))
    ).drop("_ac").select("variant_id", "ac", "an")
    if minor:
        out = out.withColumn(
            "mac",
            F.when(F.col("an") > 0, F.least(F.col("ac"), F.col("an") - F.col("ac"))),
        )
    return out


def _af_at_index(
    calls: DataFrame,
    idx_df: DataFrame,
    minor: bool,
    as_count: bool,
) -> DataFrame:
    """Shared core for the per-variant-target forms of seqAlleleFreq /
    seqAlleleCount. `idx_df` is (variant_id, __aidx) where __aidx is the
    0-based target allele index or NULL when the target is invalid
    (character form: allele string absent from the allele list,
    FC_AF_Allele 'A = -1' src/Methods.cpp:538-551; numeric form:
    index >= num_allele, FC_AF_Index 'if (A < nAllele)'
    src/Methods.cpp:333-360).

    Plan shape: ONE calls-scale shuffle (explode -> groupBy on
    (variant_id, allele) with map-side combine); everything after runs
    on the per-(variant, allele) table, which is tiny relative to calls.
    """
    pa = (
        calls.select("variant_id", F.explode("alleles").alias("__a"))
        .filter(F.col("__a").isNotNull())
        .groupBy("variant_id", "__a")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    j = idx_df.join(pa, "variant_id", "left")
    agg = j.groupBy("variant_id", "__aidx").agg(
        F.coalesce(F.sum("__c"), F.lit(0)).alias("__an"),
        F.coalesce(
            F.sum(F.when(F.col("__a") == F.col("__aidx"), F.col("__c"))),
            F.lit(0),
        ).alias("__m"),
    )
    # NA iff target invalid OR every slot missing ('(n > 0)' /
    # '(n < N)' guards in FC_AF_*/FC_AC_* src/Methods.cpp:333-360,698-734)
    valid = F.col("__aidx").isNotNull() & (F.col("__an") > 0)
    if as_count:
        m = F.col("__m")
        if minor:
            # minor fold on counts: min(m, non-missing - m)
            # (FC_AC_Allele 'm0 = N - n - m; if (m0 < m) m = m0')
            m = F.least(m, F.col("__an") - m)
        return agg.select(
            "variant_id", F.when(valid, m).cast("bigint").alias("ac")
        )
    p = F.col("__m").cast("double") / F.col("__an").cast("double")
    if minor:
        p = F.when(p > 0.5, F.lit(1.0) - p).otherwise(p)
    return agg.select("variant_id", F.when(valid, p).alias("af"))


def _allele_string_index(variants: DataFrame, target) -> DataFrame:
    """(variant_id, __aidx): 0-based position of the target allele string
    in the variant's 'REF,ALT1,...' list, NULL when absent — the engine's
    GetIndexOfAllele (reference src/Index.cpp:1533-1551). `target` is a
    Column over the variants frame (or a literal string)."""
    t = F.lit(target) if isinstance(target, str) else target
    allele_list = F.concat(F.array(F.col("ref")), F.col("alt"))
    pos = F.array_position(allele_list, t)  # 1-based, 0 when absent
    return variants.select(
        "variant_id", (F.nullif(pos, F.lit(0)) - 1).cast("int").alias("__aidx")
    )


def allele_freq_at(
    calls: DataFrame, variants: DataFrame, target, minor: bool = False
) -> DataFrame:
    """seqAlleleFreq(ref.allele=<character>): per-variant frequency of a
    NAMED allele, looked up in the variant's allele list; NULL when the
    allele is absent or every slot is missing (reference R/Methods.R:
    1001-1019 dispatching FC_AF_Allele src/Methods.cpp:538-560). `target`
    is a per-variant Column over `variants` (the R form's character
    vector, one entry per selected variant) or a single literal string.
    """
    return _af_at_index(
        calls, _allele_string_index(variants, target), minor, as_count=False
    )


def allele_count_at(
    calls: DataFrame, variants: DataFrame, target, minor: bool = False
) -> DataFrame:
    """seqAlleleCount(ref.allele=<character>): count of a NAMED allele per
    variant; minor folds to min(count, non-missing - count); NULL when the
    allele is absent or all slots missing (reference FC_AC_Allele
    src/Methods.cpp:698-734)."""
    return _af_at_index(
        calls, _allele_string_index(variants, target), minor, as_count=True
    )


def allele_freq_index(
    calls: DataFrame,
    variants: DataFrame,
    idx,
    minor: bool = False,
    as_count: bool = False,
) -> DataFrame:
    """seqAlleleFreq/Count(ref.allele=<numeric vector>): per-variant
    0-based allele INDEX (a Column over `variants`, or a single int);
    indexes >= num_allele yield NULL like FC_AF_Index's 'if (A < nAllele)'
    guard (src/Methods.cpp:333-360)."""
    from seqarray_spark.functions.variant import num_allele as _na

    i = F.lit(int(idx)) if isinstance(idx, int) else idx
    idx_df = variants.select(
        "variant_id",
        F.when((i >= 0) & (i < _na()), i).cast("int").alias("__aidx"),
    )
    return _af_at_index(calls, idx_df, minor, as_count)


def per_allele_table(calls: DataFrame, variants: DataFrame | None = None) -> DataFrame:
    """Per-(variant, allele-index) counts — the explode form of the
    reference's per-allele count vectors (reference: FC_AlleleCount
    src/Methods.cpp:828-895).

    With `variants` supplied, the table follows the reference's vector
    shape exactly: only indexes 0 <= allele < num_allele are counted
    ('if (g < nAllele) pV[g]++'), and every declared allele appears —
    unobserved ones as explicit 0 rows. Without it, observed indexes are
    reported as-is (no declared-allele set to bound against)."""
    exploded = calls.select(
        "variant_id", F.explode(F.col("alleles")).alias("allele")
    ).filter(F.col("allele").isNotNull())
    if variants is not None:
        from seqarray_spark.functions.variant import num_allele as _na

        domain = variants.select(
            "variant_id",
            F.explode(F.sequence(F.lit(0), _na() - 1)).alias("allele"),
        )
        counts = (
            exploded.groupBy("variant_id", "allele")
            .agg(F.count(F.lit(1)).alias("count"))
        )
        counts = domain.join(counts, ["variant_id", "allele"], "left").select(
            "variant_id", "allele", F.coalesce("count", F.lit(0)).alias("count")
        )
        totals = counts.groupBy("variant_id").agg(F.sum("count").alias("total"))
        return counts.join(totals, "variant_id")
    counts = exploded.groupBy("variant_id", "allele").agg(
        F.count(F.lit(1)).alias("count")
    )
    totals = exploded.groupBy("variant_id").agg(F.count(F.lit(1)).alias("total"))
    return counts.join(totals, "variant_id")


def missing_rate(calls: DataFrame, per: str = "variant", ploidy: int = 2) -> DataFrame:
    """Missing rate per variant, per sample, or both (reference: seqMissing
    R/Methods.R:794-898; kernels src/Methods.cpp:122-246).

    SLOT-level like the reference: missing allele slots / total slots
    (a half-missing diploid call contributes 0.5, not 1 — FC_Missing_*
    count NA codes over the ploidy x samples grid). `ploidy` sizes fully
    NULL alleles arrays.
    per='both' returns (per-variant DF, per-sample DF) from ONE scan and
    ONE shuffle via GROUPING SETS — the reference's fused one-pass
    FC_Missing_SampVariant. Only the O(n_var + n_samp) aggregate is
    persisted (released when both results are dropped,
    plans/lifecycle.py); the earlier design cached the full projected
    scan and left it pinned for the session.
    """
    m = _miss_slots(ploidy=ploidy).cast("double")
    t = _total_slots(ploidy=ploidy).cast("double")
    rate = (F.sum(m) / F.sum(t)).alias("missing_rate")
    if per == "variant":
        return calls.groupBy("variant_id").agg(rate)
    if per == "sample":
        return calls.groupBy("sample_id").agg(rate)
    if per == "both":
        from seqarray_spark.plans.lifecycle import release_on_gc

        g = (
            calls.select("variant_id", "sample_id", m.alias("m"), t.alias("t"))
            .groupingSets([["variant_id"], ["sample_id"]], "variant_id", "sample_id")
            .agg((F.sum("m") / F.sum("t")).alias("missing_rate"),
                 F.grouping_id().alias("_g"))
            .persist()
        )
        # grouping_id bit set = column aggregated away: 0b01 -> grouped
        # by variant_id only, 0b10 -> by sample_id only
        v = g.filter(F.col("_g") == 1).select("variant_id", "missing_rate")
        s = g.filter(F.col("_g") == 2).select("sample_id", "missing_rate")
        return release_on_gc(g, v, s)
    raise ValueError(f"per must be variant|sample|both, got {per}")


def af_ac_missing(calls: DataFrame, ploidy: int = 2, alt: bool = False) -> DataFrame:
    """Fused AF + AC + missing-rate + NS in one scan (reference:
    seqGetAF_AC_Missing R/Methods.R:1152-1210; FC_AF_AC_MISS_*
    src/Methods.cpp:897-1009). One groupBy with multiple aggregate
    expressions — Catalyst fuses them into a single shuffle.

    Returns: variant_id, af, ac, an, maf, mac, missing_rate, ns.
    alt=True reports ALT-allele af/ac instead of REF.
    """
    ref_cnt = allele_count_in_call("alleles", 0)
    nonmiss = nonmissing_in_call("alleles")
    agg = calls.groupBy("variant_id").agg(
        F.sum(ref_cnt).cast("bigint").alias("_ref_ac"),
        F.sum(nonmiss).cast("bigint").alias("an"),
        # slot-level missing rate (reference FC_AF_AC_MISS_Geno:
        # nmiss / N over the full slot grid, src/Methods.cpp:911-936)
        (
            F.sum(_miss_slots(ploidy=ploidy).cast("double"))
            / F.sum(_total_slots(ploidy=ploidy).cast("double"))
        ).alias("missing_rate"),
        # ns = samples with a fully non-missing call (engine extension;
        # the reference kernel reports af/ac/miss only)
        F.sum((~_call_missing()).cast("int")).cast("bigint").alias("ns"),
    )
    ac = (F.col("an") - F.col("_ref_ac")) if alt else F.col("_ref_ac")
    return (
        agg.withColumn("ac", F.when(F.col("an") > 0, ac))  # all-missing -> NA
        .withColumn(
            "af",
            F.when(F.col("an") > 0, F.col("ac").cast("double") / F.col("an").cast("double")),
        )
        .withColumn(
            "maf",
            F.when(F.col("an") > 0, F.least(F.col("af"), F.lit(1.0) - F.col("af"))),
        )
        .withColumn(
            "mac",
            F.when(F.col("an") > 0, F.least(F.col("ac"), F.col("an") - F.col("ac"))),
        )
        .select("variant_id", "af", "ac", "an", "maf", "mac", "missing_rate", "ns")
    )


def num_allele(variants: DataFrame) -> DataFrame:
    """#alleles per variant (reference: seqNumAllele R/Methods.R:780-784)."""
    from seqarray_spark.functions.variant import num_allele as na

    return variants.select("variant_id", na().alias("num_allele"))


def summary_by_chrom(variants: DataFrame) -> DataFrame:
    """Per-chromosome variant counts — the core of the reference's dataset
    profile (reference: seqSummary R/Summary.R:652-775)."""
    return variants.groupBy("chromosome").agg(F.count(F.lit(1)).alias("n_variants"))


def summary_filter_hist(variants: DataFrame) -> DataFrame:
    """FILTER histogram (reference: seqSummary R/Summary.R:560-600)."""
    return variants.groupBy("filter").agg(F.count(F.lit(1)).alias("n"))


def digest(
    df: DataFrame,
    cols: list[str],
    group_col: str | None = None,
    ordered: bool = False,
    order_col: str = "variant_id",
) -> DataFrame:
    """Content fingerprint (reference: seqDigest R/Summary.R:781-820;
    FC_Digest* src/Methods.cpp:1011-1117).

    ordered=False: the reference streams md5 over a node in file order; a
    distributed engine has no inherent order, so the default digest is
    md5 over the '|'-joined values sorted lexicographically within the
    group — an order-insensitive content hash with the same
    fingerprinting power.

    ordered=True: reference-parity mode — md5 folds the values in
    `order_col` order (with assign_ids='order' that IS file order, so
    two imports of the same VCF fingerprint identically, which is the
    operator's whole purpose in a pipeline-integrity check). Each group
    still collects to one array, so this is the parity path; digest_xor
    is the 100 TB path.
    """
    row_repr = F.concat_ws("|", *[F.col(c).cast("string") for c in cols])
    grouped = df.groupBy(group_col) if group_col else df.groupBy()
    if ordered:
        joined = F.concat_ws(
            ",",
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col(order_col).alias("o"), row_repr.alias("r")))
                ),
                lambda x: x["r"],
            ),
        )
        return grouped.agg(F.md5(joined).alias("digest"))
    return grouped.agg(
        F.md5(F.concat_ws(",", F.sort_array(F.collect_list(row_repr)))).alias("digest")
    )


def digest_xor(df: DataFrame, cols: list[str], group_col: str | None = None) -> DataFrame:
    """Scale-safe content fingerprint: bit_xor of per-row xxhash64 values —
    commutative and overflow-free, so no collect_list and no ordering
    requirement. This is the 100 TB path; digest() is the md5-parity path."""
    row_hash = F.xxhash64(*[F.col(c).cast("string") for c in cols])
    grouped = df.groupBy(group_col) if group_col else df.groupBy()
    return grouped.agg(F.bit_xor(row_hash).alias("digest"))


def allele_freq_dosage(
    calls: DataFrame, ds_col: str = "DS", ploidy: int = 2, minor: bool = False
) -> DataFrame:
    """Dosage-backed allele frequency (reference: seqAlleleFreq DS path,
    FC_AF_DS src/Methods.cpp:443-506; .has_dosage R/Internal.R:135-142):
    imputed datasets carry an alt-dosage in [0, ploidy] instead of
    genotypes; ALT AF = sum(DS) / (ploidy * #non-missing)."""
    d = F.col(ds_col)
    out = calls.groupBy("variant_id").agg(
        (
            F.sum(d).cast("double")
            / (F.lit(float(ploidy)) * F.count(d).cast("double"))
        ).alias("af_alt")
    )
    if minor:
        out = out.select(
            "variant_id",
            F.least(F.col("af_alt"), F.lit(1.0) - F.col("af_alt")).alias("maf"),
        )
    return out


def allele_count_dosage(calls: DataFrame, ds_col: str = "DS", ploidy: int = 2) -> DataFrame:
    """Dosage-backed allele counts (reference: FC_AC_DS
    src/Methods.cpp:690-750): AC = sum(DS) (fractional), AN = ploidy*NS."""
    d = F.col(ds_col)
    return calls.groupBy("variant_id").agg(
        F.sum(d).cast("double").alias("ac_alt"),
        (F.lit(ploidy) * F.count(d)).cast("bigint").alias("an"),
    )


def af_ac_missing_dosage(
    calls: DataFrame, ds_col: str = "DS", ploidy: int = 2
) -> DataFrame:
    """Fused dosage-backed AF + AC + AN + missing-rate in ONE groupBy
    (reference: the DS kernels FC_AF_DS/FC_AC_DS/FC_Missing_DS,
    src/Methods.cpp:443-750, fused the way seqGetAF_AC_Missing fuses the
    genotype kernels). One scan, one shuffle — running the three
    single-stat functions separately costs three scans + three shuffles
    plus two joins to reassemble."""
    d = F.col(ds_col)
    return calls.groupBy("variant_id").agg(
        (
            F.sum(d).cast("double") / (F.lit(float(ploidy)) * F.count(d).cast("double"))
        ).alias("af_alt"),
        F.sum(d).cast("double").alias("ac_alt"),
        (F.lit(ploidy) * F.count(d)).cast("bigint").alias("an"),
        F.avg(d.isNull().cast("double")).alias("missing_rate"),
    )


def missing_rate_dosage(calls: DataFrame, ds_col: str = "DS", per: str = "variant") -> DataFrame:
    """Dosage-backed missing rate (reference: FC_Missing_DS paths
    src/Methods.cpp:170-246)."""
    miss = F.col(ds_col).isNull().cast("double")
    key = "variant_id" if per == "variant" else "sample_id"
    return calls.groupBy(key).agg(F.avg(miss).alias("missing_rate"))


def summary_var(ds, varname: str) -> dict:
    """Per-variable summary — the seqSummary(gdsfile, varname) form
    (reference: R/Summary.R:74-200 .summary_geno/.summary_phase and
    :280-530 .summary_info/.summary_format/.summary_sample_annot):
    'genotype'/'phase' report full-file and selected dims; the
    annotation folders report their field catalogs.

    dim follows the reference's (ploidy, n_samples, n_variants) order;
    seldim applies the CURRENT filter stack. Driver cost is two counts;
    no data plane is touched."""
    if varname in ("genotype", "phase"):
        n_var_all = ds._base_variants.count()
        n_samp_all = (
            ds._base_samples.count() if ds._base_samples is not None else 0
        )
        n_var_sel = (
            ds.variants.count()
            if ds._sel.variant_filtered
            else n_var_all
        )
        n_samp_sel = (
            ds.samples.count()
            if ds._sel.sample_filtered and ds.samples is not None
            else n_samp_all
        )
        return {
            "dim": (ds.ploidy, n_samp_all, n_var_all),
            "seldim": (ds.ploidy, n_samp_sel, n_var_sel),
        }
    if varname == "annotation/info":
        v = ds._base_variants
        if "info" not in v.columns:
            return {"fields": []}
        return {
            "fields": [
                {"ID": f.name, "Type": f.dataType.simpleString()}
                for f in v.schema["info"].dataType.fields
            ]
        }
    if varname == "annotation/format":
        if ds._base_calls is None:
            return {"fields": []}
        skip = ("variant_id", "sample_id", "alleles", "phased")
        sch = {f.name: f.dataType.simpleString() for f in ds._base_calls.schema.fields}
        return {
            "fields": [
                {"ID": c, "Type": t} for c, t in sch.items() if c not in skip
            ]
        }
    if varname == "sample.annotation":
        if ds._base_samples is None:
            return {"fields": []}
        return {
            "fields": [
                {"ID": f.name, "Type": f.dataType.simpleString()}
                for f in ds._base_samples.schema.fields
                if f.name != "sample_id"
            ]
        }
    meta = getattr(ds, "meta", None) or {}
    if varname in ("sample.id", "variant.id", "position"):
        # the reference returns the node length (.summary_sample_id /
        # _variant_id / _position, R/Summary.R:176-231)
        if varname == "sample.id":
            n = ds._base_samples.count() if ds._base_samples is not None else 0
        else:
            n = ds._base_variants.count()
        return {"length": n}
    if varname == "chromosome":
        # per-chromosome table over the SELECTION, numeric names first in
        # numeric order (.summary_chrom R/Summary.R:233-265)
        rows = summary_by_chrom(ds.variants).collect()

        def _key(r):
            c = r["chromosome"]
            return (0, int(c)) if c.lstrip("+-").isdigit() else (1, c)

        return {r["chromosome"]: r["n_variants"] for r in sorted(rows, key=_key)}
    if varname in ("allele", "$alt"):
        # declared ALT structured lines (.summary_allele R/Summary.R:268-291)
        return {"alt": list(meta.get("alts") or [])}
    if varname in ("annotation/filter", "$filter"):
        # FILTER levels with Descriptions + observed counts
        # (.summary_filter R/Summary.R:361-400)
        counts = {
            r["filter"]: r["n"] for r in summary_filter_hist(ds.variants).collect()
        }
        declared = list(meta.get("filter_meta") or [])
        seen = {d.get("ID") for d in declared}
        levels = [
            {
                "ID": d.get("ID"),
                "Description": d.get("Description", ""),
                "Count": counts.get(d.get("ID"), 0),
            }
            for d in declared
        ] + [
            {"ID": k, "Description": "", "Count": v}
            for k, v in sorted(counts.items())
            if k not in seen and k is not None
        ]
        return {"filter": levels}
    if varname == "$reference":
        return {"reference": meta.get("reference")}
    if varname == "$contig":
        return {"contig": list(meta.get("contigs") or [])}
    raise KeyError(f"summary_var: unknown varname {varname!r}")


def summary(ds) -> dict:
    """Dataset profile (reference: seqSummary R/Summary.R:652-775):
    dimensions, per-chromosome variant counts, allele-count tabulation,
    QUAL quantiles, FILTER histogram, INFO/FORMAT catalogs. Returns a dict
    of scalars and small DataFrames (the catalog queries stay lazy)."""
    from seqarray_spark.functions.variant import num_allele as na

    v = ds.variants
    out = {
        "n_variants": v.count(),
        "n_samples": ds.samples.count() if ds.samples is not None else 0,
        "ploidy": ds.ploidy,
        "by_chromosome": summary_by_chrom(v),
        "allele_tab": v.select(na().alias("num_allele"))
        .groupBy("num_allele")
        .agg(F.count(F.lit(1)).alias("n")),
        "filter_hist": summary_filter_hist(v) if "filter" in v.columns else None,
        "qual_quantiles": v.agg(
            F.percentile("qual", F.array(*[F.lit(x) for x in (0.0, 0.25, 0.5, 0.75, 1.0)])).alias("q")
        )
        if "qual" in v.columns
        else None,
        "info_fields": [f.name for f in v.schema["info"].dataType.fields]
        if "info" in v.columns
        else [],
    }
    if ds._base_calls is not None:
        out["format_fields"] = [
            c
            for c in ds._base_calls.columns
            if c not in ("variant_id", "sample_id", "alleles", "phased")
        ]
    return out


def check_dims(variants: DataFrame, calls: DataFrame, samples: DataFrame | None) -> dict:
    """Integrity check (reference: seqCheck R/Summary.R:928-1020):
    dimension consistency between the three frames."""
    vstats = variants.agg(
        F.count(F.lit(1)).alias("n"), F.countDistinct("variant_id").alias("nd")
    ).first()
    n_var = vstats["n"]
    stats = calls.agg(
        F.countDistinct("variant_id").alias("nv"),
        F.countDistinct("sample_id").alias("ns"),
    ).first()
    out = {
        "n_variants": n_var,
        "variant_ids_unique": vstats["nd"] == n_var,  # hash-id collision check
        "n_call_variants": stats["nv"],
        "variants_consistent": stats["nv"] <= n_var,
    }
    if samples is not None:
        n_samp = samples.count()
        out.update(
            {"n_samples": n_samp, "n_call_samples": stats["ns"], "samples_consistent": stats["ns"] <= n_samp}
        )
    return out


def seq_check(ds) -> dict:
    """Full-dataset validation (reference: seqCheck R/Summary.R:928-1020,
    which re-reads every node and re-verifies stored dims/hashes; here
    the container's per-node checksums are parquet's own page checksums,
    so the engine validates the *semantic* invariants the reference's
    node scan establishes):

    - variant ids unique, positions present and positive
    - every call references an existing variant and sample (no orphans)
    - every allele index is within the variant's allele count
    - phase vector length == ploidy - 1 (slot count - 1) per call

    Two passes total: one aggregate over variants, one over calls joined
    to the (variant_id, num_allele) projection and the sample-id list —
    all violation counters fused into a single shuffle each, no
    per-check scans. Returns counters plus an overall 'ok'.

    For GDS containers, `sources.gds.verify_digests` is the companion
    byte-level check (stored per-node md5 vs stream content). A False
    there matches what R's seqCheck(check='full') reports on the same
    file — including the reference's own CEU fixture, whose two DP
    digests were stamped before a later rewrite (a stale stamp, not
    corruption); neither engine can distinguish the two cases from the
    file alone.
    """
    from seqarray_spark.functions.variant import num_allele as na

    v = ds.variants
    vrow = v.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("variant_id").alias("nd"),
        F.sum(
            (F.col("position").isNull() | (F.col("position") <= 0)).cast("long")
        ).alias("bad_pos"),
    ).first()
    out = {
        "n_variants": vrow["n"],
        "variant_ids_unique": vrow["nd"] == vrow["n"],
        "bad_positions": vrow["bad_pos"] or 0,
    }
    calls = ds._base_calls
    if calls is not None:
        vk = v.select("variant_id", na().alias("__na"))
        joined = calls.join(vk, "variant_id", "left")
        if ds.samples is not None:
            joined = joined.join(
                ds.samples.select("sample_id", F.lit(1).alias("__s")),
                "sample_id",
                "left",
            )
        has_phase = "phased" in calls.columns
        crow = joined.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("__na").isNull().cast("long")).alias("orphan_variant"),
            *(
                [F.sum(F.col("__s").isNull().cast("long")).alias("orphan_sample")]
                if ds.samples is not None
                else []
            ),
            F.sum(
                F.exists(
                    "alleles", lambda x: x.isNotNull() & (x >= F.col("__na"))
                ).cast("long")
            ).alias("bad_allele"),
            *(
                [
                    F.sum(
                        (F.size("phased") != F.size("alleles") - 1).cast("long")
                    ).alias("bad_phase")
                ]
                if has_phase
                else []
            ),
        ).first()
        out.update(
            {
                "n_calls": crow["n"],
                "orphan_call_variants": crow["orphan_variant"] or 0,
                "bad_allele_indexes": crow["bad_allele"] or 0,
            }
        )
        if ds.samples is not None:
            out["orphan_call_samples"] = crow["orphan_sample"] or 0
        if has_phase:
            out["bad_phase_lengths"] = crow["bad_phase"] or 0
    out["ok"] = (
        out["variant_ids_unique"]
        and out["bad_positions"] == 0
        and out.get("orphan_call_variants", 0) == 0
        and out.get("orphan_call_samples", 0) == 0
        and out.get("bad_allele_indexes", 0) == 0
        and out.get("bad_phase_lengths", 0) == 0
    )
    return out
