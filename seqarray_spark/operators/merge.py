"""Dataset merge (SURVEY.md §2.4).

Reference parity:
- variant mode (same samples, disjoint variants -> concatenate):
  seqMerge R/UtilsMerge.R:258-611
- sample mode (same variants keyed by the FULL $chrom_pos_allele,
  different samples -> full outer join; differing ALT lists stay
  distinct variants, so allele codes never remap):
  R/UtilsMerge.R:612-1006 with C kernels SEQ_MergeAllele/Geno/Phase/
  Info/Format (src/FileMerge.cpp:56-365)
- seqResetVariantID (R/UtilsMerge.R:1008+)

Spark shape: the reference's hand-written sorted node-by-node merge
becomes unionByName (variant mode) or a full-outer join on the variant
allele key (sample mode), fully inside codegen.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from seqarray_spark.dataset import SeqDataset

VKEY = ["chromosome", "position", "ref"]

_NUM_RANK = {"smallint": 0, "int": 1, "bigint": 2, "float": 3, "double": 4}


def _unify_scalar(types):
    from pyspark.sql.types import StringType

    names = [t.simpleString() for t in types]
    if len(set(names)) == 1:
        return types[0]
    if all(n in _NUM_RANK for n in names):
        return max(types, key=lambda t: _NUM_RANK[t.simpleString()])
    return StringType()


def _unify_types(types):
    from pyspark.sql.types import ArrayType

    arrays = [t for t in types if isinstance(t, ArrayType)]
    if arrays:
        elems = [t.elementType for t in arrays] + [
            t for t in types if not isinstance(t, ArrayType)
        ]
        return ArrayType(_unify_scalar(elems))
    return _unify_scalar(types)


def _harmonize_calls(parts: list[DataFrame]) -> list[DataFrame]:
    """Schema-harmonize FORMAT columns across merged files BEFORE the
    union — the reference's SEQ_MergeFormat (src/FileMerge.cpp:365-460)
    merges per-variant blocks whose arity (Number) DIFFERS across files
    by padding each to the per-variant max; a file that declares a
    field scalar (Number=1) and another that declares it a vector must
    land in one column. In long format that is a TYPE unification:

    - scalar in one file + array in another -> array (a non-null scalar
      x becomes [x]; a NULL scalar stays a NULL array, matching the
      reference's NA plane);
    - numeric widths widen (int < long < double), anything mixed with
      string becomes string.

    Per-variant MAX-arity padding itself happens where the reference
    does it — on export, where the container writer pads each sample's
    array to the variant's max length; the long format carries ragged
    arrays losslessly in between. GT columns (alleles/phased) are
    excluded: ploidy mixing is the genotype/extra mechanism, not
    FORMAT Number unification."""
    from pyspark.sql.types import ArrayType

    fixed = ("variant_id", "sample_id", "alleles", "phased", "vcf_errors")
    all_types: dict[str, list] = {}
    for p in parts:
        for f in p.schema.fields:
            if f.name not in fixed:
                all_types.setdefault(f.name, []).append(f.dataType)
    targets = {
        n: _unify_types(ts)
        for n, ts in all_types.items()
        if len({t.simpleString() for t in ts}) > 1
    }
    if not targets:
        return parts
    out = []
    for p in parts:
        cols = []
        for f in p.schema.fields:
            n, tgt = f.name, targets.get(f.name)
            if tgt is None or f.dataType.simpleString() == tgt.simpleString():
                cols.append(F.col(n))
            elif isinstance(tgt, ArrayType) and not isinstance(f.dataType, ArrayType):
                cols.append(
                    F.when(F.col(n).isNull(), F.lit(None).cast(tgt))
                    .otherwise(F.array(F.col(n).cast(tgt.elementType)))
                    .alias(n)
                )
            else:
                cols.append(F.col(n).cast(tgt).alias(n))
        out.append(p.select(*cols))
    return out


def _merged_samples(parts: list[DataFrame], concat_order: bool) -> DataFrame | None:
    """Union the per-file samples frames, keeping the file-order
    convention coherent. sample_ordinal is per-FILE (1..N each), so a
    raw union would collide ordinals — and distinct() would stop
    deduplicating identical samples whose ordinals differ across files.

    - concat_order=True (sample-mode merge, disjoint sample sets): the
      reference's merged order is file-1 samples then file-2 then ...
      (R/UtilsMerge.R:694-700 c(samp1, samp2)); offset each file's
      ordinals by the cumulative count of earlier files. Counts are
      driver-side but samples-axis-bounded (≤~10^6).
    - concat_order=False (variant-mode merge, same/overlapping sample
      sets): ordinals are meaningless across files — drop them and fall
      back to the sorted-sample_id convention after distinct().
    Any file lacking the column drops the convention for the whole
    merge (mixed ordinals would be undefined)."""
    if not parts:
        return None
    if not all("sample_ordinal" in p.columns for p in parts) or not concat_order:
        parts = [p.drop("sample_ordinal") for p in parts]
        return reduce(
            lambda a, b: a.unionByName(b, allowMissingColumns=True), parts
        ).distinct()
    out, offset = [], 0
    for p in parts:
        out.append(p.withColumn(
            "sample_ordinal", F.col("sample_ordinal") + F.lit(offset)
        ))
        offset += p.count()
    return reduce(
        lambda a, b: a.unionByName(b, allowMissingColumns=True), out
    ).distinct()


def _overlap_mode(datasets: list[SeqDataset]) -> str:
    """Decide merge mode the way the reference prechecks overlap
    (R/UtilsMerge.R:303-381): disjoint variants -> 'variant';
    disjoint samples -> 'sample'; both overlapping -> error."""
    v0 = datasets[0].variants.select(*VKEY, "alt")
    s0 = datasets[0].samples.select("sample_id") if datasets[0].samples is not None else None
    var_overlap = samp_overlap = False
    for d in datasets[1:]:
        if v0.join(d.variants.select(*VKEY, "alt"), VKEY + ["alt"], "inner").limit(1).count():
            var_overlap = True
        if s0 is not None and d.samples is not None:
            if s0.join(d.samples.select("sample_id"), "sample_id", "inner").limit(1).count():
                samp_overlap = True
    if var_overlap and samp_overlap:
        raise ValueError("datasets overlap in both variants and samples; cannot merge")
    return "sample" if var_overlap else "variant"


def merge(datasets: list[SeqDataset], mode: str | None = None) -> SeqDataset:
    mode = mode or _overlap_mode(datasets)
    if mode == "variant":
        return merge_variants(datasets)
    if mode == "sample":
        # N-way FORMAT unification must be computed over ALL files
        # BEFORE the pairwise fold — the reference's SEQ_MergeFormat
        # (src/FileMerge.cpp:365-460) is a single pass over every
        # file, so each value converts ONCE from its declared type to
        # the globally unified one. A per-pair unification converts
        # through intermediate types: with XX int/double/string across
        # three files, fold order ((A+B)+C) renders A's 1 as int ->
        # double -> '1.0' while (C+A)+B renders '1' — order-dependent
        # values the reference never produces (r10 parity review,
        # VERDICT r9 item 7; the 3-file fixture is pytest-pinned).
        # Harmonizing every file to the global target first makes each
        # pair's own _harmonize_calls a no-op, so the fold is
        # value-order-independent again.
        return reduce(merge_samples_pair, _preharmonized(datasets))
    raise ValueError(f"unknown merge mode {mode}")


def _preharmonized(datasets: list[SeqDataset]) -> list[SeqDataset]:
    """Rebuild each dataset with its calls cast to the N-way unified
    FORMAT schema (see merge); datasets without calls pass through."""
    idx = [i for i, d in enumerate(datasets) if d._base_calls is not None]
    if len(idx) < 2:
        return datasets
    fixed = _harmonize_calls([datasets[i]._base_calls for i in idx])
    out = list(datasets)
    for i, calls in zip(idx, fixed):
        d = out[i]
        if calls is d._base_calls:
            continue
        nd = SeqDataset(
            d._base_variants, calls, d._base_samples,
            ploidy=d.ploidy, meta=d.meta,
            ids_dense=d.ids_dense, n_variants_hint=d._n_variants_hint,
        )
        # the rebuild must carry the dataset's ACTIVE selection —
        # merge_samples_pair reads the selection-aware .variants /
        # .samples properties, so a fresh full _Selection would
        # silently merge filtered-out rows back in (and only for
        # inputs whose FORMAT schema needed harmonizing)
        nd._sel = d._sel
        nd._stack = list(d._stack)
        out[i] = nd
    return out


def _merge_meta(metas: list[dict]) -> dict:
    """Union of the inputs' header metadata: scalar fields keep the
    first non-empty value; contig/ALT tables and header pairs
    concatenate with exact-duplicate removal — a merged dataset's
    regenerated VCF header must declare every input's contigs and ALTs,
    not just the first file's."""
    out: dict = {}
    for m in metas:
        m = m or {}
        for k in ("fileformat", "reference", "assembly"):
            if not out.get(k) and m.get(k):
                out[k] = m[k]
        for k in ("contigs", "alts"):
            seen = [tuple(sorted(d.items())) for d in out.get(k, [])]
            for d in m.get(k) or []:
                if tuple(sorted(d.items())) not in seen:
                    out.setdefault(k, []).append(d)
                    seen.append(tuple(sorted(d.items())))
        pairs = [tuple(p) for p in out.get("header_pairs", [])]
        for p in m.get("header_pairs") or []:
            if tuple(p) not in pairs:
                out.setdefault("header_pairs", []).append(tuple(p))
                pairs.append(tuple(p))
    return out


def merge_variants(datasets: list[SeqDataset], reset_variant_id: bool = True) -> SeqDataset:
    """Variant-mode merge: UNION ALL of variants/calls across files with
    missing-column padding (reference: R/UtilsMerge.R:258-611; sample sets
    may differ -> union of samples, absent calls simply absent in long
    format — the reference's missing-pad alignment `match(samp.id, sid)`
    is unnecessary)."""
    pairs = [(d.variants, d._base_calls) for d in datasets]
    if reset_variant_id:
        # per-dataset renumber BEFORE the union: input files may reuse the
        # same dense ids (the reference renumbers too, R/UtilsMerge.R:1008+)
        pairs = [reset_variant_ids(v, c) for v, c in pairs]
    variants = reduce(
        lambda a, b: a.unionByName(b, allowMissingColumns=True),
        [v for v, _ in pairs],
    )
    calls_list = _harmonize_calls([c for _, c in pairs if c is not None])
    calls = (
        reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), calls_list)
        if calls_list
        else None
    )
    samples = _merged_samples(
        [d.samples for d in datasets if d.samples is not None],
        concat_order=False,
    )
    return SeqDataset(variants, calls, samples, ploidy=datasets[0].ploidy,
                      meta=_merge_meta([d.meta for d in datasets]))


def reset_variant_ids(variants: DataFrame, calls: DataFrame | None):
    """Renumber variant ids across merged inputs (reference:
    seqResetVariantID R/UtilsMerge.R:1008+). Uses a collision-free
    composite key hash rather than a global row_number — a global
    sequential renumber would funnel 100 TB through one partition. Dense
    ids, when truly required, can be assigned per-chromosome with
    chromosome offsets."""
    new_id = F.xxhash64("chromosome", "position", "ref", F.concat_ws(",", "alt"))
    mapping = variants.select(F.col("variant_id").alias("__old"), new_id.alias("__new")).distinct()
    variants = variants.withColumn("variant_id", new_id)
    if calls is not None:
        from seqarray_spark.plans.hints import maybe_broadcast

        # the mapping is variants-sized — never force a broadcast of it
        calls = (
            calls.join(
                maybe_broadcast(mapping),
                calls["variant_id"] == mapping["__old"],
            )
            .drop("variant_id", "__old")
            .withColumnRenamed("__new", "variant_id")
        )
    return variants, calls


def merge_samples_pair(a: SeqDataset, b: SeqDataset) -> SeqDataset:
    """Sample-mode merge of two datasets sharing variants, keyed by the
    FULL $chrom_pos_allele (chrom:pos_REF,ALT1,...) like the reference
    (R/UtilsMerge.R:376 matches variants via '$chrom_pos_allele';
    SEQ_MergeAllele src/FileMerge.cpp:56-109 is then an identity union
    under that key).

    Files that disagree on the ALT list at a position contribute
    DISTINCT variants — each file's samples are simply absent at the
    other's variant (absent calls are absent rows in long format; the
    reference missing-fills the genotype grid). Allele codes therefore
    never remap: index k means the same allele on both sides of a match.
    """
    akey = F.concat_ws(",", "alt").alias("__alts")
    va = a.variants.withColumn("__alts", akey).alias("va")
    vb = b.variants.withColumn("__alts", akey).alias("vb")
    key = VKEY + ["__alts"]
    joined = va.join(vb, key, "full_outer")
    # first-file-wins by VARIANT PRESENCE, not value non-nullness: the
    # reference's SEQ_MergeInfo (src/FileMerge.cpp:326-347) walks files
    # in order and the first file CONTAINING the variant supplies the
    # value — even a missing one (it breaks before looking at file 2),
    # so a NULL in file 1 must NOT be patched from file 2. A value
    # coalesce(va, vb) would diverge exactly there. Annotation columns
    # and INFO struct FIELDS are the UNION across files
    # (R/UtilsMerge.R:758-766 collects varnm over every file): a var the
    # first file lacks stays missing wherever file 1 contains the
    # variant and carries file 2's values only at file-2-only variants.
    a_present = F.col("va.variant_id").isNotNull()

    def pick(c):
        in_a = c in a.variants.columns
        in_b = c in b.variants.columns
        ta = dict(a.variants.dtypes).get(c)
        tb = dict(b.variants.dtypes).get(c)
        va_c = F.col(f"va.{c}") if in_a else F.lit(None).cast(tb)
        vb_c = F.col(f"vb.{c}") if in_b else F.lit(None).cast(ta)
        return F.when(a_present, va_c).otherwise(vb_c).alias(c)

    def pick_info():
        fa = (
            {f.name: f.dataType for f in a.variants.schema["info"].dataType.fields}
            if "info" in a.variants.columns else {}
        )
        fb = (
            {f.name: f.dataType for f in b.variants.schema["info"].dataType.fields}
            if "info" in b.variants.columns else {}
        )
        names = list(fa) + [n for n in fb if n not in fa]

        def side(fields, prefix):
            return F.struct(*[
                (
                    F.col(f"{prefix}.info.{n}") if n in fields
                    else F.lit(None).cast(fb.get(n) or fa.get(n))
                ).alias(n)
                for n in names
            ])

        return F.when(a_present, side(fa, "va")).otherwise(
            side(fb, "vb")
        ).alias("info")

    extra_cols = sorted(
        {
            c for c in a.variants.columns + b.variants.columns
            if c not in VKEY + ["alt", "variant_id", "info", "__alts"]
        },
        key=lambda c: (c not in a.variants.columns, c),
    )
    has_info = "info" in a.variants.columns or "info" in b.variants.columns
    variants = joined.select(
        F.xxhash64(*VKEY, F.col("__alts")).alias("variant_id"),
        *[F.col(c) for c in VKEY],
        pick("alt"),
        *[pick(c) for c in extra_cols],
        *([pick_info()] if has_info else []),
        F.col("va.variant_id").alias("__vid_a"),
        F.col("vb.variant_id").alias("__vid_b"),
    )

    def relabel_calls(calls: DataFrame, vid_col: str) -> DataFrame:
        m = variants.filter(F.col(vid_col).isNotNull()).select(
            F.col(vid_col).alias("__old_vid"),
            F.col("variant_id").alias("__new_vid"),
        )
        keep = [c for c in calls.columns if c != "variant_id"]
        return (
            calls.join(m, calls["variant_id"] == m["__old_vid"])
            .select(F.col("__new_vid").alias("variant_id"), *keep)
        )

    calls_parts: list[DataFrame] = []
    if a._base_calls is not None:
        calls_parts.append(relabel_calls(a._base_calls, "__vid_a"))
    if b._base_calls is not None:
        calls_parts.append(relabel_calls(b._base_calls, "__vid_b"))
    calls = (
        reduce(lambda x, y: x.unionByName(y, allowMissingColumns=True),
               _harmonize_calls(calls_parts))
        if calls_parts
        else None
    )
    samples = _merged_samples(
        [d.samples for d in (a, b) if d.samples is not None],
        concat_order=True,
    )
    variants = variants.drop("__vid_a", "__vid_b")
    return SeqDataset(variants, calls, samples, ploidy=max(a.ploidy, b.ploidy),
                      meta=_merge_meta([a.meta, b.meta]))


def _comp(col):
    """Nucleotide complement as a dialect-stable CASE chain."""
    return (
        F.when(col == "A", F.lit("T"))
        .when(col == "T", F.lit("A"))
        .when(col == "C", F.lit("G"))
        .when(col == "G", F.lit("C"))
    )


def allele_harmonize(
    variants_a: DataFrame, variants_b: DataFrame
) -> DataFrame:
    """Cross-panel allele harmonization — the snpgdsAlleleSwitch /
    PLINK --flip pre-merge step: match two variant panels on
    (chromosome, position) and classify each biallelic-SNP match by
    the transformation that reconciles panel B's alleles with A's:

      * 'same'      — identical ref/alt
      * 'swap'      — ref/alt exchanged (recode: dosage d -> 2 - d)
      * 'flip'      — opposite strand (complement both; dosage keeps)
      * 'flip_swap' — opposite strand AND exchanged
      * 'ambiguous' — palindromic site (A/T or C/G on either side):
                      strand is UNRESOLVABLE from alleles alone —
                      classified FIRST, the standard drop list
      * 'mismatch'  — alleles irreconcilable (tri-allelic across
                      panels, indel vs SNP at same position, ...)

    Non-SNP or multiallelic rows on either side are excluded (they
    route through seqMerge's allele-string union instead). One
    broadcast-size join per matched position; pure Column CASE tree —
    fully SQL-expressible, gate seq_allele_switch.

    Output: (chromosome, position, variant_id_a, variant_id_b,
    ref_a, alt_a, ref_b, alt_b, action)."""
    nucs = list("ACGT")

    def snp(df, suf):
        a1 = F.element_at("alt", 1)
        return df.where(
            (F.size("alt") == 1)
            & F.col("ref").isin(*nucs)
            & a1.isin(*nucs)
            & (F.col("ref") != a1)
        ).select(
            "chromosome",
            "position",
            F.col("variant_id").alias(f"variant_id_{suf}"),
            F.col("ref").alias(f"ref_{suf}"),
            a1.alias(f"alt_{suf}"),
        )

    j = snp(variants_a, "a").join(
        snp(variants_b, "b"), ["chromosome", "position"]
    )
    ra, aa = F.col("ref_a"), F.col("alt_a")
    rb, ab = F.col("ref_b"), F.col("alt_b")
    action = (
        F.when(
            (ra == _comp(aa)) | (rb == _comp(ab)), F.lit("ambiguous")
        )
        .when((ra == rb) & (aa == ab), F.lit("same"))
        .when((ra == ab) & (aa == rb), F.lit("swap"))
        .when(
            (_comp(ra) == rb) & (_comp(aa) == ab), F.lit("flip")
        )
        .when(
            (_comp(ra) == ab) & (_comp(aa) == rb), F.lit("flip_swap")
        )
        .otherwise(F.lit("mismatch"))
    )
    return j.select(
        "chromosome",
        "position",
        "variant_id_a",
        "variant_id_b",
        "ref_a",
        "alt_a",
        "ref_b",
        "alt_b",
        action.alias("action"),
    )


_COMP_SQL = """CASE {c} WHEN 'A' THEN 'T' WHEN 'T' THEN 'A'
                        WHEN 'C' THEN 'G' WHEN 'G' THEN 'C' END"""


def allele_harmonize_oracle_sql(perturb_mod: int = 4) -> str:
    """DuckDB oracle twin of the seq_allele_switch gate: panel B is
    gvariants deterministically perturbed by variant_id % perturb_mod
    (0 swap, 1 flip, 2 flip+swap, 3 unchanged — the engine gate
    spells the identical rule), then the same match + CASE tree."""

    def comp(c):
        return _COMP_SQL.format(c=c)

    return f"""
        , snpa AS (
          SELECT chromosome, position, variant_id AS variant_id_a,
                 ref AS ref_a, alt_str AS alt_a
          FROM gvariants
          WHERE ref IN ('A','C','G','T') AND alt_str IN ('A','C','G','T')
            AND ref <> alt_str
        ), pertb AS (
          SELECT chromosome, position, variant_id,
                 CASE variant_id % {int(perturb_mod)}
                   WHEN 0 THEN alt_str
                   WHEN 1 THEN {comp("ref")}
                   WHEN 2 THEN {comp("alt_str")}
                   ELSE ref END AS ref,
                 CASE variant_id % {int(perturb_mod)}
                   WHEN 0 THEN ref
                   WHEN 1 THEN {comp("alt_str")}
                   WHEN 2 THEN {comp("ref")}
                   ELSE alt_str END AS alt_str
          FROM gvariants
          WHERE ref IN ('A','C','G','T') AND alt_str IN ('A','C','G','T')
            AND ref <> alt_str
        ), snpb AS (
          SELECT chromosome, position, variant_id AS variant_id_b,
                 ref AS ref_b, alt_str AS alt_b
          FROM pertb
          WHERE ref IN ('A','C','G','T') AND alt_str IN ('A','C','G','T')
            AND ref <> alt_str
        )
        SELECT a.chromosome, a.position, a.variant_id_a, b.variant_id_b,
               a.ref_a, a.alt_a, b.ref_b, b.alt_b,
               CASE
                 WHEN a.ref_a = {comp("a.alt_a")}
                   OR b.ref_b = {comp("b.alt_b")} THEN 'ambiguous'
                 WHEN a.ref_a = b.ref_b AND a.alt_a = b.alt_b
                   THEN 'same'
                 WHEN a.ref_a = b.alt_b AND a.alt_a = b.ref_b
                   THEN 'swap'
                 WHEN {comp("a.ref_a")} = b.ref_b
                  AND {comp("a.alt_a")} = b.alt_b THEN 'flip'
                 WHEN {comp("a.ref_a")} = b.alt_b
                  AND {comp("a.alt_a")} = b.ref_b THEN 'flip_swap'
                 ELSE 'mismatch' END AS action
        FROM snpa a JOIN snpb b
          ON a.chromosome = b.chromosome AND a.position = b.position
    """
