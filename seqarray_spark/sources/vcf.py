"""VCF source & sink — Spark-first re-implementation of the reference's
import/export pipeline.

Reference parity:
- header parse       <- seqVCF_Header (R/ConvVCF2GDS.R:92-512)
- bulk import        <- seqVCF2GDS (R/ConvVCF2GDS.R:559-1465,
                        src/ConvVCF2GDS.cpp:1175-1948)
- export             <- seqGDS2VCF (R/Conversion.R:30-402,
                        src/ConvGDS2VCF.cpp:571-989)

Architecture: spark.read.text gives distributed input splits (replacing the
reference's manual fork-by-line-range parallel import,
R/ConvVCF2GDS.R:816-907); the driver reads only the header prefix. All
field parsing is built-in Column expressions (split / str_to_map /
transform / try_cast) so the whole parse stays in whole-stage codegen — no
Python ever touches a data line. Number=A/G/R/. cardinalities (INFO/FORMAT)
become ArrayType columns; the reference's ragged '@length' side-vectors
(R/ConvVCF2GDS.R:1144-1149) are unnecessary because array values travel
with their row.

Scale notes: the parse is shuffle-free (narrow transformations only).
Dense file-order variant ids need one extra pass (zipWithIndex) — the only
place the engine drops to the RDD layer, and it is optional
(assign_ids='hash' avoids the pass by deriving a 64-bit key from
chrom:pos:alleles; uniqueness is verifiable post-hoc with
operators.aggregates.check_dims).
"""

from __future__ import annotations

import gzip
import io
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# calls-frame bookkeeping columns that are never FORMAT data fields:
# the genotype pair (alleles/phased), the keys, quarantine-mode error
# capture, and the per-variant presence record. Shared by write_vcf's
# default FORMAT derivation AND its format_fields validation so a
# bookkeeping name (e.g. 'alleles') cannot validate as an exportable
# FORMAT field (reference fmt.var checks the file's format vars,
# R/Conversion.R:90-92 — 'alleles' is genotype, not annotation/format)
_CALL_BOOKKEEPING = (
    "variant_id", "sample_id", "alleles", "phased",
    "vcf_errors", "fmt_present",
)


# ---------------------------------------------------------------------------
# header model (reference: SeqVCFHeaderClass, R/ConvVCF2GDS.R:92-512)
# ---------------------------------------------------------------------------

@dataclass
class VcfField:
    id: str
    number: str  # '0','1','2',... or 'A','G','R','.'
    type: str  # Integer|Float|Flag|Character|String
    description: str = ""

    @property
    def is_array(self) -> bool:
        return self.number not in ("0", "1")

    def spark_type(self) -> T.DataType:
        base = {
            "Integer": T.IntegerType(),
            "Float": T.DoubleType(),
            "Flag": T.BooleanType(),
            "Character": T.StringType(),
            "String": T.StringType(),
        }[self.type]
        if self.type == "Flag":
            return base
        return T.ArrayType(base) if self.is_array else base


@dataclass
class VcfHeader:
    info: dict[str, VcfField] = field(default_factory=dict)
    formats: dict[str, VcfField] = field(default_factory=dict)
    filters: list[str] = field(default_factory=list)
    samples: list[str] = field(default_factory=list)
    meta: list[str] = field(default_factory=list)
    ploidy: int = 2
    # structured header tables (reference: seqVCF_Header returns contig /
    # alt / assembly as data.frames, R/ConvVCF2GDS.R:92-512) — not just
    # raw meta strings, so they survive schema-level round trips
    contigs: list[dict] = field(default_factory=list)
    alts: list[dict] = field(default_factory=list)
    assembly: str | None = None
    filter_meta: list[dict] = field(default_factory=list)
    # container description parity (reference keeps these as
    # description/* nodes, R/ConvVCF2GDS.R:928-957)
    fileformat: str | None = None
    reference: str | None = None
    extra: list[tuple[str, str]] = field(default_factory=list)


def _parse_structured_meta(line: str) -> dict[str, str]:
    """Parse ##INFO=<ID=...,Number=...,Type=...,Description="...">"""
    body = line.split("=<", 1)[1].rstrip(">")
    out, key, buf, in_quotes = {}, None, [], False
    for ch in body:
        if ch == '"':
            in_quotes = not in_quotes
        elif ch == "=" and not in_quotes and key is None:
            key = "".join(buf)
            buf = []
        elif ch == "," and not in_quotes:
            if key is not None:
                out[key] = "".join(buf)
            key, buf = None, []
        else:
            buf.append(ch)
    if key is not None:
        out[key] = "".join(buf)
    return out


def apply_header_line(hdr: VcfHeader, line: str) -> None:
    """Fold one '##...'/'#CHROM' header line into `hdr` — shared by the
    text reader below and the BCF reader (whose header text is embedded
    in the binary container, sources/bcf.py)."""
    if line.startswith("##"):
        hdr.meta.append(line)
        if line.startswith("##INFO=<"):
            d = _parse_structured_meta(line)
            # duplicated IDs keep the FIRST declaration (reference drops
            # later duplicates, R/ConvVCF2GDS.R:1055, :734 for FORMAT)
            hdr.info.setdefault(d["ID"], VcfField(
                d["ID"], d.get("Number", "."), d.get("Type", "String"),
                d.get("Description", ""),
            ))
        elif line.startswith("##FORMAT=<"):
            d = _parse_structured_meta(line)
            hdr.formats.setdefault(d["ID"], VcfField(
                d["ID"], d.get("Number", "."), d.get("Type", "String"),
                d.get("Description", ""),
            ))
        elif line.startswith("##FILTER=<"):
            d = _parse_structured_meta(line)
            hdr.filters.append(d["ID"])
            hdr.filter_meta.append(d)
        elif line.startswith("##contig=<"):
            hdr.contigs.append(_parse_structured_meta(line))
        elif line.startswith("##ALT=<"):
            hdr.alts.append(_parse_structured_meta(line))
        elif line.startswith("##assembly="):
            hdr.assembly = line.split("=", 1)[1]
        elif line.startswith("##fileformat="):
            hdr.fileformat = line.split("=", 1)[1]
        elif line.startswith("##reference="):
            hdr.reference = line.split("=", 1)[1]
        elif "=" in line[2:] and not line.split("=", 1)[1].startswith("<"):
            k, v = line[2:].split("=", 1)
            hdr.extra.append((k, v))
    elif line.startswith("#CHROM"):
        cols = line.split("\t")
        if len(cols) > 9:
            hdr.samples = cols[9:]


def parse_vcf_header(path: str, infer_ploidy: bool = True) -> VcfHeader:
    """Driver-side parse of the '##'/'#CHROM' prefix (small by construction).

    Ploidy is inferred from the first data line's GT, as the reference does
    (R/ConvVCF2GDS.R:307-328).
    """
    opener = gzip.open if path.endswith(".gz") else open
    hdr = VcfHeader()
    with opener(path, "rb") as fh:
        tfh = io.TextIOWrapper(fh, encoding="utf-8", errors="replace")
        for line in tfh:
            line = line.rstrip("\n")
            if line.startswith("#"):
                apply_header_line(hdr, line)
            elif line:
                if not (infer_ploidy and hdr.samples):
                    break
                # max ploidy across ALL samples of the first data lines —
                # reading only the first sample's GT would infer ploidy 1
                # from a missing call '.' on an otherwise diploid file
                # (reference scans the first line's calls the same way,
                # R/ConvVCF2GDS.R:307-328)
                best, found = 1, False
                for _ in range(50):  # until a non-missing GT appears
                    fields = line.rstrip("\n").split("\t")
                    for tok in fields[9:]:
                        gt = tok.split(":", 1)[0]
                        if gt and gt != ".":
                            best = max(best, gt.count("/") + gt.count("|") + 1)
                            found = True
                    if found:
                        break
                    line = tfh.readline()
                    if not line or line.startswith("#"):
                        break
                hdr.ploidy = best
                break
    return hdr


# ---------------------------------------------------------------------------
# read path
# ---------------------------------------------------------------------------

def _info_kv_map(col: Column) -> Column:
    """key->value map from a 'k=v;flag;k2=x' INFO string; duplicate keys
    keep the FIRST occurrence. str_to_map would throw under Spark's
    default mapKeyDedupPolicy=EXCEPTION on a malformed 'DP=3;DP=4' line,
    killing the whole import — quarantine mode promises one bad line
    never does that. Flags (no '=') map to NULL like str_to_map."""
    toks = F.filter(F.split(col, ";"), lambda s: s != "")
    pairs = F.transform(
        toks,
        lambda s: F.struct(
            F.substring_index(s, "=", 1).alias("key"),
            F.when(F.instr(s, "=") > 0,
                   F.substr(s, F.instr(s, "=") + F.lit(1))).alias("value"),
        ),
    )
    keys = F.transform(pairs, lambda p: p["key"])
    uniq = F.filter(
        pairs, lambda p, i: F.array_position(keys, p["key"]) == i + 1
    )
    return F.map_from_entries(uniq)


def _typed_info_col(fld: VcfField, raw_map: Column) -> Column:
    """One INFO field from the key->string map, honoring Number/Type
    (reference: src/ConvVCF2GDS.cpp:1500-1635 with NA-fill semantics)."""
    raw = raw_map.getItem(fld.id)
    if fld.type == "Flag":
        return F.map_contains_key(raw_map, F.lit(fld.id)).alias(fld.id)
    if fld.is_array:
        elem = "int" if fld.type == "Integer" else (
            "double" if fld.type == "Float" else "string"
        )
        return F.when(
            raw.isNotNull(),
            F.transform(
                F.split(raw, ","),
                lambda x: F.nullif(x, F.lit(".")).try_cast(elem),
            ),
        ).alias(fld.id)
    if fld.type == "Integer":
        return raw.try_cast("int").alias(fld.id)
    if fld.type == "Float":
        return raw.try_cast("double").alias(fld.id)
    return F.nullif(raw, F.lit(".")).alias(fld.id)


def _typed_format_col(
    fld: VcfField, token: Column, fmt_arr: Column, idx: Column | None = None
) -> Column:
    """One FORMAT field from a sample token, positioned by the line's
    FORMAT column (reference: TVCF_Format src/ConvVCF2GDS.cpp:744-997).
    Pass a precomputed per-variant `idx` to keep the array_position out
    of the per-cell projection (callers hoist it above the explode)."""
    if idx is None:
        idx = F.array_position(fmt_arr, fld.id)
    # try_element_at, not element_at: a spec-valid VCF may drop trailing
    # FORMAT fields per-sample ('0/0' under 'GT:DP:GQ'); under ANSI mode
    # (Spark 4 default) element_at would abort the whole import, while the
    # reference (seqVCF2GDS) fills NA for the missing fields.
    raw = F.when(idx > 0, F.try_element_at(F.split(token, ":"), idx.cast("int")))
    raw = F.nullif(F.nullif(raw, F.lit(".")), F.lit(""))
    if fld.is_array:
        elem = "int" if fld.type == "Integer" else (
            "double" if fld.type == "Float" else "string"
        )
        return F.when(
            raw.isNotNull(),
            F.transform(
                F.split(raw, ","),
                lambda x: F.nullif(x, F.lit(".")).try_cast(elem),
            ),
        ).alias(fld.id)
    if fld.type == "Integer":
        return raw.try_cast("int").alias(fld.id)
    if fld.type == "Float":
        return raw.try_cast("double").alias(fld.id)
    return raw.alias(fld.id)


def _expected_count(number: str, n_alt: Column, ploidy: int) -> Column | None:
    """Declared value count for a Number= spec, per variant (reference:
    src/ConvVCF2GDS.cpp:644-723 — Number=A/R/G and fixed-k enforcement;
    the Number=G mismatch is a hard error there, :680-704).

    Returns None when the spec is unchecked ('.', '0', '1')."""
    if number in (".", "0", "1"):
        return None
    if number == "A":
        return n_alt
    if number == "R":
        return n_alt + 1
    if number == "G":
        # genotype-combination count C(n_alt + ploidy, ploidy) as a
        # small product expression, any ploidy (the reference enforces
        # the full combinatorial count and hard-errors on mismatch,
        # src/ConvVCF2GDS.cpp:680-704). The product stays far below
        # 2^53 for real ploidies (<=8), so the double division by p!
        # is exact before the int cast.
        import math as _math

        prod = (n_alt + 1).cast("bigint")
        for i in range(2, ploidy + 1):
            prod = prod * (n_alt + i)
        return (prod / _math.factorial(ploidy)).cast("int")
    if number.isdigit():
        return F.lit(int(number))
    return None


def _violation(kind: str, fld: VcfField, raw: Column, n_alt: Column, ploidy: int) -> Column | None:
    """NULL when `raw` (comma-joined value string) obeys fld's declared
    Number, else a message string. Missing values ('.'/absent) pass —
    the reference fills NA for absent fields, it only rejects
    wrong-arity *present* values."""
    exp = _expected_count(fld.number, n_alt, ploidy)
    if exp is None:
        return None
    got = F.size(F.split(raw, ","))
    bad = raw.isNotNull() & (raw != ".") & (got != exp)
    return F.when(
        bad,
        F.format_string(f"{kind}/{fld.id}: Number=%s expects %d values, got %d",
                        F.lit(fld.number), exp, got),
    )


def read_vcf(
    spark: SparkSession,
    path: str,
    header: VcfHeader | None = None,
    info_fields: list[str] | None = None,
    format_fields: list[str] | None = None,
    ignore_chr_prefix: str = "chr",
    assign_ids: str = "order",
    validate: str = "none",
    genotype_var_name: str = "GT",
    start: int = 1,
    count: int = -1,
):
    """VCF → SeqDataset (reference: seqVCF2GDS R/ConvVCF2GDS.R:559-1465).

    genotype_var_name: which FORMAT field holds the genotype calls
    (reference genotype.var.name; located per record in FORMAT, so records
    that omit it decode as all-missing at the header ploidy).
    start/count: 1-based file-order row range to import (reference's
    parallel-chunk mechanism, R/ConvVCF2GDS.R:826-837); the imported
    chunk is re-numbered 1..count like each reference chunk file.

    assign_ids: 'order' = dense 1..N ids in file order (reference parity,
    one zipWithIndex pass); 'hash' = xxhash64(chrom:pos:ref:alt) without
    the extra pass (the 100 TB default — id stability across re-imports
    instead of file-order density).

    validate: 'none' = permissive try_cast parse; 'strict' = abort the
    import on any Number=A/R/G/fixed-k arity violation (reference
    semantics, src/ConvVCF2GDS.cpp:644-723); 'quarantine' = add a
    vcf_errors ARRAY<STRING> column to variants and calls listing the
    violations so bad rows can be filtered/routed without killing the
    job (the 100 TB mode — one malformed line shouldn't fail an
    8-hour import).
    """
    paths = [path] if isinstance(path, str) else list(path)
    if header is None:
        header = parse_vcf_header(paths[0])
        # multi-file import requires identical sample columns (reference:
        # sample-id consistency check, R/ConvVCF2GDS.R:633-658)
        for p in paths[1:]:
            other = parse_vcf_header(p)
            if other.samples != header.samples:
                raise ValueError(
                    f"{p}: sample columns differ from {paths[0]}; "
                    "use operators.merge for sample-disjoint files"
                )
            header.info.update(
                {k: v for k, v in other.info.items() if k not in header.info}
            )
            header.formats.update(
                {k: v for k, v in other.formats.items() if k not in header.formats}
            )
    lines = spark.read.text(paths).filter(~F.col("value").startswith("#"))

    if assign_ids == "order":
        # Dense file-order ids (reference: variant.id = 1..N on import,
        # src/ConvVCF2GDS.cpp:1405-1406). A bare zipWithIndex is wrong
        # here: Spark packs scan splits into partitions by size
        # (descending), not file/byte order, so multi-file or multi-split
        # inputs would get silently permuted ids. Instead each line is
        # keyed by (file, block_start, index-within-partition) — a split
        # is read by exactly one task in byte order, so the in-partition
        # index orders lines within their block — and per-block id
        # offsets (a tiny one-row-per-128MB-block aggregate) are
        # broadcast-joined back. No global sort, no driver data pull.
        import os

        file_rank = {os.path.abspath(p): k for k, p in enumerate(paths)}
        file_rank.update({p: k for k, p in enumerate(paths)})
        tagged = (
            spark.read.text(paths)
            .select(
                "value",
                F.col("_metadata.file_path").alias("__file"),
                F.col("_metadata.file_block_start").alias("__blk"),
            )
            .filter(~F.col("value").startswith("#"))
        )

        def _enum(batches):
            # Arrow-batched partition enumeration (a row-at-a-time RDD
            # mapPartitions here would serialize every data line through
            # Python individually)
            import numpy as np

            i = 0
            for pdf in batches:
                pdf = pdf.copy()
                pdf["__i"] = np.arange(i, i + len(pdf), dtype=np.int64)
                i += len(pdf)
                yield pdf

        lines = tagged.mapInPandas(
            _enum, "value string, __file string, __blk long, __i long"
        )
        blocks = (
            lines.groupBy("__file", "__blk")
            .agg(F.count("*").alias("__n"), F.min("__i").alias("__i0"))
            .collect()
        )
        # driver-side cumulative offsets over blocks in (file-order,
        # byte-offset) order; one row per block, so this stays tiny even
        # at 100 TB (~800k rows)
        def _rank(r):
            from urllib.parse import unquote, urlparse

            f = r["__file"]
            local = unquote(urlparse(f).path) if ":" in f else f
            key = file_rank.get(local, file_rank.get(f, len(paths)))
            return (key, f, r["__blk"])

        blocks = sorted(blocks, key=_rank)
        off, rows = 0, []
        for b in blocks:
            rows.append((b["__file"], b["__blk"], off, b["__i0"]))
            off += b["__n"]
        offsets = spark.createDataFrame(
            rows, "__file string, __blk long, __off long, __i0 long"
        )
        lines = (
            lines.join(F.broadcast(offsets), ["__file", "__blk"])
            .withColumn(
                "variant_id",
                (F.col("__off") + F.col("__i") - F.col("__i0") + 1).cast("long"),
            )
            .drop("__file", "__blk", "__i", "__off", "__i0")
        )
    if start != 1 or count != -1:
        # row-range import (reference: seqVCF2GDS(start=, count=),
        # R/ConvVCF2GDS.R:826-837 — the parallel-chunk mechanism; each
        # chunk file gets dense ids 1..count over its own rows). Needs
        # the file-order ids to define the range.
        if assign_ids != "order":
            raise ValueError("start/count require assign_ids='order'")
        if start < 1:
            raise ValueError("'start' should be a positive integer")
        hi = None if count < 0 else start + int(count) - 1
        pred = F.col("variant_id") >= int(start)
        if hi is not None:
            pred = pred & (F.col("variant_id") <= hi)
        lines = lines.filter(pred).withColumn(
            "variant_id", F.col("variant_id") - int(start) + 1
        )
    return parse_vcf_lines(
        lines, header, info_fields, format_fields, ignore_chr_prefix, assign_ids,
        validate, genotype_var_name,
    )


def parse_vcf_lines(
    lines,
    header: VcfHeader,
    info_fields: list[str] | None = None,
    format_fields: list[str] | None = None,
    ignore_chr_prefix: str = "chr",
    assign_ids: str = "hash",
    validate: str = "none",
    genotype_var_name: str = "GT",
):
    """Core line-parse: a DataFrame with a 'value' column of VCF data lines
    (and optionally a precomputed variant_id) → SeqDataset. Works on batch
    and streaming inputs alike (streaming must use assign_ids='hash')."""
    from seqarray_spark.dataset import SeqDataset

    if validate not in ("none", "strict", "quarantine"):
        raise ValueError("validate must be none|strict|quarantine")
    spark = lines.sparkSession
    info_fields = list(header.info) if info_fields is None else info_fields
    format_fields = (
        [f for f in header.formats if f != genotype_var_name]
        if format_fields is None
        else format_fields
    )
    parsed = lines.withColumn("__f", F.split("value", "\t"))

    chrom = F.col("__f")[0]
    if ignore_chr_prefix:
        chrom = F.when(
            chrom.startswith(ignore_chr_prefix),
            F.expr(f"substring(__f[0], {len(ignore_chr_prefix) + 1})"),
        ).otherwise(chrom)
    parsed = parsed.withColumn("chromosome", chrom)
    if assign_ids == "hash":
        parsed = parsed.withColumn(
            "variant_id",
            F.xxhash64(F.col("chromosome"), F.col("__f")[1], F.col("__f")[3], F.col("__f")[4]),
        )

    info_map = _info_kv_map(F.col("__f")[7])
    # per-variant FORMAT field presence (reference model: a field absent
    # from a line's FORMAT column stores ZERO rows at that variant —
    # TVCF_Format index 0 — and seqGDS2VCF then OMITS it from that
    # variant's FORMAT on re-export, ExportInfoFormat's Rf_isNull skip,
    # src/ConvGDS2VCF.cpp:546-554). Tracked as the declared non-GT
    # fields present in the line's FORMAT, in line order; write_vcf
    # honors it when the column exists
    declared_non_gt = [f for f in header.formats if f != genotype_var_name]
    fmt_present_col = (
        [
            F.filter(
                # null-safe get(): a sites-only data line in a
                # sample-carrying file has no FORMAT column (ANSI [8]
                # would throw) -> NULL presence = full-catalog behavior
                F.split(F.get(F.col("__f"), 8), ":"),
                lambda x: (x != F.lit(genotype_var_name))
                & F.array_contains(
                    F.array(*[F.lit(f) for f in declared_non_gt]), x
                ),
            ).alias("fmt_present")
        ]
        if header.samples and declared_non_gt
        else []
    )
    base = parsed.select(
        "variant_id",
        "chromosome",
        F.col("__f")[1].try_cast("int").alias("position"),
        F.nullif(F.col("__f")[2], F.lit(".")).alias("id"),
        F.col("__f")[3].alias("ref"),
        F.when(F.col("__f")[4] != ".", F.split(F.col("__f")[4], ",")).otherwise(
            F.array().cast("array<string>")
        ).alias("alt"),
        F.nullif(F.col("__f")[5], F.lit(".")).try_cast("double").alias("qual"),
        F.nullif(F.col("__f")[6], F.lit(".")).alias("filter"),
        *(
            [F.struct(*[_typed_info_col(header.info[i], info_map) for i in info_fields]).alias("info")]
            if info_fields
            else []
        ),
        *fmt_present_col,
        F.col("__f").alias("__fields"),
    )

    n_alt = F.size("alt")
    if validate != "none":
        # arity checks against declared Number= (reference hard-errors,
        # src/ConvVCF2GDS.cpp:644-723); expressions only, so the checks
        # ride the same codegen stage as the parse
        raw_info = _info_kv_map(F.col("__fields")[7])
        viols = [
            v
            for i in info_fields
            if (v := _violation("INFO", header.info[i],
                                F.nullif(raw_info.getItem(i), F.lit("")),
                                n_alt, header.ploidy)) is not None
        ]
        errs = (
            F.array_compact(F.array(*viols)) if viols
            else F.array().cast("array<string>")
        )
        if validate == "strict":
            # embed the guard in a kept column so Catalyst cannot prune it
            base = base.withColumn(
                "variant_id",
                F.when(
                    F.size(errs) > 0,
                    F.raise_error(F.concat(F.lit("VCF arity violation: "),
                                           F.concat_ws("; ", errs))),
                ).otherwise(F.col("variant_id")),
            )
        else:
            base = base.withColumn("vcf_errors", errs)

    variants = base.drop("__fields")

    calls = None
    if header.samples:
        sample_arr = F.array(*[F.lit(s) for s in header.samples])
        fmt_arr = F.split(F.col("__fields")[8], ":")
        # the genotype field (genotype.var.name, default GT) is located in
        # the per-record FORMAT column, not assumed first: records whose
        # FORMAT omits it yield all-missing calls at the header ploidy
        # (reference: geno field index per record, R/ConvVCF2GDS.R:589-590,
        # src/ConvVCF2GDS.cpp missing-genotype fill). The index rides the
        # PRE-explode projection so it evaluates once per variant, not
        # once per sample cell — Generate replicates the value.
        # header-declared FORMAT fields only, in request order; unknown
        # names are silently skipped (reference: undeclared FORMAT IDs are
        # dropped at import, R/ConvVCF2GDS.R:560-570).  `k` below is the
        # index into THIS filtered list everywhere — producer and both
        # consumers — so a request like ['NOPE','DP'] cannot misalign the
        # hoisted __fidx_{k} columns.
        valid_formats = [f for f in format_fields if f in header.formats]
        exploded = base.select(
            "variant_id",
            fmt_arr.alias("__fmt"),
            F.array_position(fmt_arr, genotype_var_name).alias("__gtidx"),
            *[
                F.array_position(fmt_arr, f).alias(f"__fidx_{k}")
                for k, f in enumerate(valid_formats)
            ],
            n_alt.alias("__n_alt"),
            F.posexplode(F.slice("__fields", 10, len(header.samples))).alias(
                "__pos", "__token"
            ),
        ).withColumn("sample_id", F.element_at(sample_arr, F.col("__pos") + 1))
        gt_idx = F.col("__gtidx")
        gt = F.try_element_at(F.split(F.col("__token"), ":"), gt_idx.cast("int"))
        # alleles: '0/1', '0|1', '.', './.', '0/0/1' (mixed ploidy — the
        # reference's genotype/extra mechanism collapses into array length,
        # src/ConvVCF2GDS.cpp:1775-1797)
        missing_alleles = F.array_repeat(
            F.lit(None).cast("smallint"), int(header.ploidy or 2)
        )
        alleles = F.when(
            gt_idx > 0,
            F.transform(
                F.split(gt, r"[/|]"),
                lambda x: F.nullif(x, F.lit(".")).try_cast("smallint"),
            ),
        ).otherwise(missing_alleles)
        # per-slot phase flags: the separator *before* each later slot
        # (reference: phase/data bit matrix, R/ConvVCF2GDS.R:1011-1031)
        phased = F.when(
            gt_idx > 0,
            F.transform(
                F.regexp_extract_all(gt, F.lit(r"[/|]"), 0),
                lambda x: x == "|",
            ),
        ).otherwise(
            F.array_repeat(F.lit(False), max(int(header.ploidy or 2) - 1, 0))
        )
        fmt_viol_cols = []
        if validate != "none":
            for k, f in enumerate(valid_formats):
                idx = F.col(f"__fidx_{k}")
                raw = F.when(
                    idx > 0,
                    F.try_element_at(F.split(F.col("__token"), ":"), idx.cast("int")),
                )
                v = _violation("FORMAT", header.formats[f],
                               F.nullif(raw, F.lit("")),
                               F.col("__n_alt"), header.ploidy)
                if v is not None:
                    fmt_viol_cols.append(v)
        fmt_errs = (
            F.array_compact(F.array(*fmt_viol_cols)) if fmt_viol_cols
            else F.array().cast("array<string>")
        )
        vid = F.col("variant_id")
        if validate == "strict":
            vid = F.when(
                F.size(fmt_errs) > 0,
                F.raise_error(F.concat(F.lit("VCF arity violation: "),
                                       F.concat_ws("; ", fmt_errs))),
            ).otherwise(vid)
        calls = exploded.select(
            vid.alias("variant_id"),
            "sample_id",
            alleles.alias("alleles"),
            phased.alias("phased"),
            *[
                _typed_format_col(
                    header.formats[f], F.col("__token"), F.col("__fmt"),
                    idx=F.col(f"__fidx_{k}"),
                )
                for k, f in enumerate(valid_formats)
            ],
            *([fmt_errs.alias("vcf_errors")] if validate == "quarantine" else []),
        )

    # sample_ordinal: 1-based FILE order (header column order) — the
    # reference's sample order everywhere; ranks ret.idx/$sample_index/
    # colData/export axes via dataset.sample_order_cols
    samples = (
        spark.createDataFrame(
            [(s, k + 1) for k, s in enumerate(header.samples)],
            "sample_id string, sample_ordinal int",
        )
        if header.samples
        else None
    )
    return SeqDataset(
        variants, calls, samples, ploidy=header.ploidy,
        meta=header_meta(header),
        # 'order' ids are gapless 1..N in file order (reference parity,
        # src/ConvVCF2GDS.cpp:1405-1406) — order-dependent projections
        # may use them as a ready-made dense index
        ids_dense=(assign_ids == "order"),
    )


def vcf_sample_ids(path: str) -> list[str]:
    """Sample ids from a VCF header without importing the file
    (reference: seqVCF_SampID R/ConvVCF2GDS.R:522-556 — errors when the
    file declares no samples, preserved here)."""
    samples = parse_vcf_header(path).samples
    if not samples:
        raise ValueError(f"{path}: no sample columns in the VCF header")
    return list(samples)


def header_meta(header: VcfHeader) -> dict:
    """The slice of a VcfHeader the container's description/* nodes
    preserve (reference: R/ConvVCF2GDS.R:928-957)."""
    return {
        "fileformat": header.fileformat,
        "reference": header.reference,
        "assembly": header.assembly,
        "contigs": list(header.contigs),
        "alts": list(header.alts),
        "header_pairs": list(header.extra),
        # declared FILTER lines: the container's filter factor appends
        # declared-but-unobserved levels and carries their Descriptions
        # (R/ConvVCF2GDS.R:1405-1425)
        "filter_meta": list(header.filter_meta),
        # declared INFO/FORMAT catalogs (reference: seqVCF_Header's
        # header$info/header$format data.frames, R/ConvVCF2GDS.R:92-512;
        # the container pins them as Number/Type/Description node attrs)
        # — the header() accessor and VCF re-export read these back
        "info_meta": [
            {"ID": f.id, "Number": f.number, "Type": f.type,
             "Description": f.description or ""}
            for f in header.info.values()
        ],
        "format_meta": [
            {"ID": f.id, "Number": f.number, "Type": f.type,
             "Description": f.description or ""}
            for f in header.formats.values()
        ],
    }


# ---------------------------------------------------------------------------
# write path
# ---------------------------------------------------------------------------

def _meta_line(kind: str, d: dict) -> str:
    """Render one structured ##kind=<...> line; Description values are
    re-quoted, other values pass through verbatim."""
    parts = []
    for k, v in d.items():
        if k == "Description" or (isinstance(v, str) and ("," in v or " " in v)):
            parts.append(f'{k}="{v}"')
        else:
            parts.append(f"{k}={v}")
    return f"##{kind}=<{','.join(parts)}>"


def render_vcf_meta(header: VcfHeader) -> list[str]:
    """Regenerate the '##' header block from the structured model —
    INFO/FORMAT/FILTER/contig/ALT/assembly all come back even when the
    original raw meta lines were never kept (reference: seqGDS2VCF
    rebuilds the header from the stored description tables,
    R/Conversion.R:83-143)."""
    lines = [f"##fileformat={header.fileformat or 'VCFv4.2'}",
             "##source=seqarray_spark"]
    if header.reference:
        lines.append(f"##reference={header.reference}")
    if header.assembly:
        lines.append(f"##assembly={header.assembly}")
    for k, v in header.extra:
        if k not in ("fileformat", "source"):
            lines.append(f"##{k}={v}")
    for c in header.contigs:
        lines.append(_meta_line("contig", c))
    for a in header.alts:
        lines.append(_meta_line("ALT", a))
    seen = {d.get("ID") for d in header.filter_meta}
    for d in header.filter_meta:
        lines.append(_meta_line("FILTER", d))
    for fid in header.filters:
        if fid not in seen:
            lines.append(f'##FILTER=<ID={fid},Description="">')
    for f in header.info.values():
        lines.append(
            f'##INFO=<ID={f.id},Number={f.number},Type={f.type},Description="{f.description}">'
        )
    for f in header.formats.values():
        lines.append(
            f'##FORMAT=<ID={f.id},Number={f.number},Type={f.type},Description="{f.description}">'
        )
    return lines


def _header_from_dataset(ds, info_fields: list[str], format_fields: list[str]) -> VcfHeader:
    """Synthesize a declaration-complete header from a SeqDataset's
    schema when no VcfHeader was supplied: INFO/FORMAT entries from the
    column types (arrays declare Number='.'), GT always declared, contig
    lines from the distinct chromosomes actually present (one tiny
    aggregate)."""
    hdr = VcfHeader(ploidy=ds.ploidy)

    def _field(name: str, dt: T.DataType) -> VcfField:
        if isinstance(dt, T.BooleanType):
            return VcfField(name, "0", "Flag")
        number = "1"
        if isinstance(dt, T.ArrayType):
            number, dt = ".", dt.elementType
        typ = (
            "Integer"
            if isinstance(dt, (T.IntegerType, T.LongType, T.ShortType))
            else "Float"
            if isinstance(dt, (T.DoubleType, T.FloatType))
            else "String"
        )
        return VcfField(name, number, typ)

    v = ds.variants
    if "info" in v.columns:
        for f in v.schema["info"].dataType.fields:
            if f.name in info_fields:
                hdr.info[f.name] = _field(f.name, f.dataType)
    calls = ds._base_calls
    if calls is not None:
        # GT is declared only when the dataset actually carries genotype
        # calls — a dosage-only dataset (no alleles column) exports via
        # the reference's SEQ_ToVCF_NoGeno path with no GT anywhere
        if "alleles" in calls.columns:
            hdr.formats["GT"] = VcfField("GT", "1", "String", "Genotype")
        for f in calls.schema.fields:
            if f.name in format_fields:
                hdr.formats[f.name] = _field(f.name, f.dataType)
    meta = getattr(ds, "meta", None) or {}
    hdr.fileformat = meta.get("fileformat")
    hdr.reference = meta.get("reference")
    hdr.assembly = meta.get("assembly")
    hdr.alts = list(meta.get("alts") or [])
    hdr.extra = [tuple(p) for p in (meta.get("header_pairs") or [])]
    hdr.contigs = list(meta.get("contigs") or []) or [
        {"ID": r["chromosome"]}
        for r in v.select("chromosome").distinct().orderBy("chromosome").collect()
    ]
    # declared catalogs win over schema synthesis (reference: seqGDS2VCF
    # rebuilds ##INFO/##FORMAT from the STORED Number/Type/Description
    # attrs, R/Conversion.R:83-143) — only for fields actually exported
    for d in meta.get("info_meta") or []:
        if d.get("ID") in hdr.info:
            hdr.info[d["ID"]] = VcfField(
                d["ID"], d.get("Number", "."), d.get("Type", "String"),
                d.get("Description", ""),
            )
    for d in meta.get("format_meta") or []:
        if d.get("ID") in hdr.formats:
            hdr.formats[d["ID"]] = VcfField(
                d["ID"], d.get("Number", "."), d.get("Type", "String"),
                d.get("Description", ""),
            )
    hdr.filter_meta = list(meta.get("filter_meta") or [])
    return hdr


def _fmt_num(col: Column) -> Column:
    """Render an INTEGER column the way VCF expects (plain digits, '.'
    for null — the reference's fast_itoa path, ConvGDS2VCF.cpp:203)."""
    return F.when(col.isNull(), F.lit(".")).otherwise(
        F.when(col == col.cast("long"), col.cast("long").cast("string")).otherwise(
            col.cast("string")
        )
    )


def _fmt_g(col: Column) -> Column:
    """C printf '%g' rendering for FLOAT columns — the reference writes
    every QUAL / Float INFO / Float FORMAT cell with snprintf("%g")
    (_Line_Append(double), src/ConvGDS2VCF.cpp:195-201): 6 significant
    digits, trailing zeros stripped, '.' for non-finite, and the
    fixed/scientific cutover at exponent < -4 or >= 6. Java's %.6g
    shares the cutover rule and exponent spelling ('1.23457e+06'); only
    the zero-stripping differs, applied here by regex."""
    d = col.cast("double")
    g = F.format_string("%.6g", d)
    g = F.regexp_replace(g, r"(\.\d*?)0+(e|$)", r"$1$2")
    g = F.regexp_replace(g, r"\.(e|$)", r"$1")
    return F.when(
        d.isNull() | F.isnan(d) | (F.abs(d) == float("inf")), F.lit(".")
    ).otherwise(g)


def _trim_trailing_missing(c: Column, et: str) -> Column:
    """Drop an array cell's trailing missing run (reference: both INFO
    and FORMAT value writers walk back from the end past NA/non-finite/
    empty before rendering — INFO_GetNum src/ConvGDS2VCF.cpp:245-270,
    FORMAT_Write :329-403). Interior missing still renders '.'; an
    all-missing array trims to empty."""
    if et in ("double", "float"):
        missing = lambda x: x.isNull() | F.isnan(x) | (F.abs(x) == float("inf"))
    elif et == "string":
        missing = lambda x: x.isNull() | (x == "")
    else:
        missing = lambda x: x.isNull()
    n_trail = F.aggregate(
        F.reverse(c),
        F.struct(F.lit(0).cast("int").alias("n"), F.lit(False).alias("stop")),
        lambda acc, x: F.struct(
            F.when(acc["stop"] | ~missing(x), acc["n"])
            .otherwise(acc["n"] + 1)
            .alias("n"),
            (acc["stop"] | ~missing(x)).alias("stop"),
        ),
    )["n"]
    return F.slice(c, 1, F.greatest(F.size(c) - n_trail, F.lit(0)))


def write_vcf(
    ds,
    out_path: str,
    header: VcfHeader | None = None,
    info_fields: list[str] | None = None,
    format_fields: list[str] | None = None,
    compression: str | None = None,
    chr_prefix: str = "",
    no_sample: bool | None = None,
) -> None:
    """SeqDataset → VCF text (reference: seqGDS2VCF R/Conversion.R:30-402;
    line formatters src/ConvGDS2VCF.cpp:571-989).

    chr_prefix prepends to every CHROM cell on export (reference
    chr_prefix, R/Conversion.R:31,160-162); no_sample=True forces a
    sites-only export of a dataset that HAS samples (reference no_sample,
    R/Conversion.R:31 — None keeps the auto behavior).

    The per-row line formatter is a single concat_ws projection —
    whole-stage codegen, no UDF. Output is a directory of part files in
    (chromosome, position) order plus a _header.vcf; `cat` them for a
    single classic file.
    """
    # the CURRENT SELECTION exports (reference seqGDS2VCF applies the
    # active filter) — _base_calls would emit tokens for samples the
    # header no longer declares, shifting genotype columns
    variants = ds.variants
    calls = ds.calls if ds._base_calls is not None else None
    if format_fields is not None:
        # validate against the DATASET's FORMAT catalog (like the
        # reference's fmt.var check against the file's format vars),
        # before no_sample nulls `calls` — a sites-only export of a
        # real field must not false-error (r10 review); bookkeeping
        # columns are excluded exactly as the default derivation below
        # excludes them, so format_fields=['alleles'] errors instead
        # of rendering the raw genotype array as a bogus data column
        have = (
            set()
            if calls is None
            else {c for c in calls.columns if c not in _CALL_BOOKKEEPING}
        )
        missing = [n for n in format_fields if n not in have]
        if missing:
            raise ValueError("Not exist: " + ",".join(missing))
    if no_sample:
        calls = None
    info_type = dict(variants.dtypes).get("info")
    known_info = (
        [f.split(":")[0] for f in _struct_field_names(variants)]
        if info_type else []
    )
    if info_fields is None:
        info_fields = known_info
    else:
        # reference seqGDS2VCF validates info.var/fmt.var up front with
        # a user-level error (R/Conversion.R:76-77,90-92) — not the
        # unresolved-column AnalysisException a bad name would hit at
        # action time
        missing = [n for n in info_fields if n not in known_info]
        if missing:
            raise ValueError("Not exist: " + ",".join(missing))

    # INFO reconstruction: key=value for non-null, bare key for flags
    info_parts = []
    for name in info_fields:
        c = F.col(f"info.{name}")
        dt = dict(_struct_field_types(variants)).get(name, "string")
        if dt == "boolean":
            info_parts.append(F.when(c, F.lit(name)))
        elif dt.startswith("array"):
            # the no-trailing-.0 renderer is for NUMERIC elements only: a
            # String-typed field like '007' must not be coerced to '7'
            et = dt[6:-1]
            elem_fmt = (
                _fmt_g if et in ("double", "float")
                else _fmt_num if et in ("int", "bigint", "smallint")
                else (lambda x: F.coalesce(F.nullif(x, F.lit("")), F.lit(".")))
            )
            # trailing missing trim; an all-missing array omits the key
            # entirely (reference: INFO_GetNum m==0 skips the field,
            # src/ConvGDS2VCF.cpp:511-520)
            trimmed = _trim_trailing_missing(c, et)
            info_parts.append(
                F.when(
                    c.isNotNull() & (F.size(trimmed) > 0),
                    F.concat(F.lit(name + "="), F.concat_ws(",", F.transform(trimmed, elem_fmt))),
                )
            )
        elif dt == "double":
            info_parts.append(F.when(c.isNotNull(), F.concat(F.lit(name + "="), _fmt_g(c))))
        else:
            info_parts.append(
                F.when(c.isNotNull(), F.concat(F.lit(name + "="), c.cast("string")))
            )
    info_str = (
        F.coalesce(F.concat_ws(";", *[p for p in info_parts]), F.lit("."))
        if info_parts
        else F.lit(".")
    )
    info_str = F.when(info_str == "", F.lit(".")).otherwise(info_str)

    fixed = variants.select(
        "variant_id",
        F.concat_ws(
            "\t",
            F.concat(F.lit(chr_prefix), F.col("chromosome"))
            if chr_prefix
            else F.col("chromosome"),
            F.col("position").cast("string"),
            F.coalesce(F.col("id"), F.lit(".")),
            F.col("ref"),
            F.when(F.size("alt") > 0, F.concat_ws(",", "alt")).otherwise(F.lit(".")),
            F.coalesce(_fmt_g(F.col("qual")), F.lit(".")),
            F.coalesce(F.col("filter"), F.lit(".")),
            info_str,
        ).alias("__fixed"),
        "chromosome",
        "position",
        # REF length feeds the tabix end coordinate (htslib tbx.c infers
        # end = pos + len(REF) for the VCF preset)
        F.coalesce(F.length("ref"), F.lit(1)).alias("__rlen"),
    )

    sample_ids = (
        [r[0] for r in ds.samples.select("sample_id").collect()]
        if ds.samples is not None and not no_sample
        else []
    )

    if calls is not None and sample_ids:
        if format_fields is None:
            # vcf_errors is quarantine-mode bookkeeping, not a FORMAT
            # field (the GDS writer excludes it the same way)
            format_fields = [
                c for c in calls.columns if c not in _CALL_BOOKKEEPING
            ]
        # per-variant FORMAT presence (reference: a field with zero rows
        # at a variant is OMITTED from that variant's FORMAT column and
        # its sample cells — ExportInfoFormat's Rf_isNull skip,
        # src/ConvGDS2VCF.cpp:546-554). Honored when the dataset carries
        # the fmt_present column read_vcf records; NULL presence (or no
        # column) keeps the constant-FORMAT behavior
        has_presence = (
            "fmt_present" in variants.columns and len(format_fields) > 0
        )
        if has_presence:
            # a calls frame that already carries fmt_present (it is
            # excluded from format_fields above) would make the joined
            # column ambiguous — the variants copy is authoritative
            # (r9 advice)
            if "fmt_present" in calls.columns:
                calls = calls.drop("fmt_present")
            calls = calls.join(
                variants.select("variant_id", "fmt_present"), "variant_id", "left"
            )

        def _present(f_name):
            return F.col("fmt_present").isNull() | F.array_contains(
                F.col("fmt_present"), f_name
            )
        # a calls frame without an alleles column is a no-genotype
        # dataset (dosage-only etc.): the reference dispatches to
        # SEQ_ToVCF_NoGeno (R/Conversion.R:364-367) — FORMAT carries the
        # format vars with NO leading GT, or '.' if there are none
        # (ExportInfoFormat src/ConvGDS2VCF.cpp:533-541)
        has_gt = "alleles" in calls.columns
        fmt_cols = []
        if has_gt:
            phased = (
                F.col("phased") if "phased" in calls.columns
                else F.lit(None).cast("array<boolean>")
            )
            fmt_cols.append(_genotype_string(F.col("alleles"), phased))
        for f_name in format_fields:
            c = F.col(f_name)
            dt = dict(calls.dtypes)[f_name]
            cell = None
            # missing renders per FORMAT_Write (src/ConvGDS2VCF.cpp:329-403):
            # trailing missing values trim off the cell, interior missing
            # keeps '.', and a cell whose trim leaves NOTHING renders '.'
            # (the writer's final `if (n <= 0) *pLine++ = '.'` — r9 parity
            # fix: this engine previously rendered the empty string there)
            if dt.startswith("array"):
                et = dt[6:-1]
                elem_fmt = (
                    _fmt_g if et in ("double", "float")
                    else _fmt_num if et in ("int", "bigint", "smallint")
                    else (lambda x: F.coalesce(F.nullif(x, F.lit("")), F.lit(".")))
                )
                trimmed = _trim_trailing_missing(c, et)
                cell = F.when(
                    F.size(trimmed) > 0,
                    F.concat_ws(",", F.transform(trimmed, elem_fmt)),
                ).otherwise(F.lit("."))
            elif dt == "double":
                d = c.cast("double")
                cell = F.when(
                    d.isNull() | F.isnan(d) | (F.abs(d) == float("inf")),
                    F.lit("."),
                ).otherwise(_fmt_g(c))
            else:
                cell = F.coalesce(
                    F.nullif(c.cast("string"), F.lit("")), F.lit(".")
                )
            if has_presence:
                # absent-at-variant fields render NO cell (concat_ws
                # drops NULL elements, matching the omitted FORMAT id)
                cell = F.when(_present(f_name), cell)
            fmt_cols.append(cell)
        token = F.concat_ws(":", *fmt_cols) if fmt_cols else F.lit("")
        order_expr = F.map_from_arrays(
            F.array(*[F.lit(s) for s in sample_ids]),
            F.array(*[F.lit(i) for i in range(len(sample_ids))]),
        )
        per_variant = (
            calls.withColumn("__ord", order_expr.getItem(F.col("sample_id")))
            .withColumn("__tok", token)
            .groupBy("variant_id")
            .agg(
                F.concat_ws(
                    "\t",
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct(F.col("__ord"), F.col("__tok")))
                        ),
                        lambda s: s["__tok"],
                    ),
                ).alias("__samples")
            )
        )
        if has_presence:
            # per-variant FORMAT: GT plus only the fields present at
            # this variant (catalog order preserved — the reference
            # walks the catalog and skips NULL fields)
            decl = F.concat_ws(
                ":",
                *(([F.lit("GT")] if has_gt else [])
                  + [F.when(_present(f), F.lit(f)) for f in format_fields]),
            )
            fmt_decl_col = F.when(decl == "", F.lit(".")).otherwise(decl)
        else:
            fmt_decl_col = F.lit(
                ":".join((["GT"] if has_gt else []) + list(format_fields))
                or "."
            )
        lines_src = fixed.join(per_variant, "variant_id", "left")
        if has_presence:
            lines_src = lines_src.join(
                variants.select("variant_id", "fmt_present"), "variant_id", "left"
            )
        lines = lines_src.select(
            F.concat_ws(
                "\t",
                F.col("__fixed"),
                fmt_decl_col,
                F.coalesce(F.col("__samples"), F.lit("")),
            ).alias("value"),
            "chromosome",
            "position",
            "__rlen",
        )
    else:
        lines = fixed.select(
            F.col("__fixed").alias("value"), "chromosome", "position", "__rlen"
        )

    if header is not None:
        # raw meta verbatim when the caller kept it; else regenerate the
        # full declaration block from the structured model
        hdr_lines = header.meta or render_vcf_meta(header)
    else:
        hdr_lines = render_vcf_meta(
            _header_from_dataset(ds, info_fields, format_fields or [])
        )
    chrom_line = "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO"
    if sample_ids:
        chrom_line += "\tFORMAT\t" + "\t".join(sample_ids)
    header_text = "\n".join(hdr_lines + [chrom_line]) + "\n"

    spark = variants.sparkSession
    nparts = max(1, spark.sparkContext.defaultParallelism)
    ordered = lines.repartitionByRange(
        nparts, "chromosome", "position"
    ).sortWithinPartitions("chromosome", "position")

    if compression == "bgzf":
        _write_bgzf_indexed(ordered, out_path, header_text)
    else:
        writer = ordered.select("value").write.mode("overwrite")
        if compression:
            # gzip/bzip2/lz4 part files (reference exports gzip/bgzf/bz2/
            # xz, R/Conversion.R:150-152)
            writer = writer.option("compression", compression)
        writer.text(out_path)

    with open(f"{out_path}/_header.vcf", "w") as fh:
        fh.write(header_text)


def _write_bgzf_indexed(ordered: DataFrame, out_path: str, header_text: str) -> None:
    """tabix/bcftools-compatible blocked gzip + .tbi (reference: bgzf
    export + indexTabix via Rsamtools, R/Conversion.R:118-132) — htslib-
    free (sources/bgzf.py, sources/tabix.py).

    Scale shape: each executor task BGZF-compresses its own sorted
    partition into a `part-*.bgz` fragment (no EOF marker) while
    recording tabix bin chunks + 16 kb linear-index entries in fragment-
    local virtual offsets; the driver then byte-concatenates header
    fragment + parts + EOF (zero deflate work — BGZF members are
    independently decompressable) and merges the index fragments by
    shifting each part's virtual offsets by its start byte. Driver
    memory is O(index), never O(text)."""
    import os
    import shutil

    import pandas as pd

    from seqarray_spark.sources.bgzf import BGZF_EOF, BgzfWriter
    from seqarray_spark.sources.tabix import reg2bin, write_tbi

    shutil.rmtree(out_path, ignore_errors=True)
    os.makedirs(out_path, exist_ok=True)

    def _part_kernel(pdfs):
        w, pid, path = None, -1, None
        bins: dict = {}    # (chrom, bin) -> [[v0, v1] contiguous runs]
        linear: dict = {}  # (chrom, window) -> min virtual offset
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            if w is None:
                pid = int(pdf["pid"].iloc[0])
                path = os.path.join(out_path, f"part-{pid:05d}.bgz")
                w = BgzfWriter(path, write_eof=False)
            for val, chrom, pos, rl in zip(
                pdf["value"], pdf["chromosome"], pdf["position"], pdf["__rlen"]
            ):
                v0 = w.tell_virtual()
                w.write(val)
                w.write("\n")
                v1 = w.tell_virtual()
                beg0 = int(pos) - 1
                end0 = beg0 + max(int(rl), 1)
                key = (chrom, reg2bin(beg0, end0))
                runs = bins.get(key)
                if runs is None:
                    bins[key] = [[v0, v1]]
                elif runs[-1][1] == v0:
                    runs[-1][1] = v1
                else:
                    runs.append([v0, v1])
                for wi in range(beg0 >> 14, ((end0 - 1) >> 14) + 1):
                    lk = (chrom, wi)
                    if lk not in linear or v0 < linear[lk]:
                        linear[lk] = v0
        rows = []
        if w is not None:
            w.close()
            rows.append((pid, "size", "", 0, os.path.getsize(path), 0))
            for (chrom, b), runs in bins.items():
                rows.extend((pid, "chunk", chrom, b, v0, v1) for v0, v1 in runs)
            rows.extend(
                (pid, "lin", chrom, wi, v, 0) for (chrom, wi), v in linear.items()
            )
        yield pd.DataFrame(
            rows, columns=["pid", "kind", "chrom", "b", "v0", "v1"]
        )

    man = (
        ordered.select(
            "value", "chromosome", "position", "__rlen",
            F.spark_partition_id().alias("pid"),
        )
        .mapInPandas(
            _part_kernel,
            "pid int, kind string, chrom string, b long, v0 long, v1 long",
        )
        .collect()
    )

    sizes = {r["pid"]: r["v0"] for r in man if r["kind"] == "size"}
    bgz = f"{out_path}/export.vcf.bgz"
    hw = BgzfWriter(bgz, write_eof=False)
    hw.write(header_text)
    hw.close()
    part_off, off = {}, os.path.getsize(bgz)
    with open(bgz, "ab") as fh:
        for pid in sorted(sizes):
            part_off[pid] = off
            off += sizes[pid]
            with open(os.path.join(out_path, f"part-{pid:05d}.bgz"), "rb") as f:
                shutil.copyfileobj(f, fh, 1 << 20)
        fh.write(BGZF_EOF)

    # merge index fragments: globalize virtual offsets by part start byte
    # (parts begin at a block boundary, so coffset shifts additively)
    names = sorted({r["chrom"] for r in man if r["kind"] == "chunk"})
    bins_per_ref, linear_per_ref = [], []
    for chrom in names:
        bins: dict = {}
        crows = [r for r in man if r["kind"] == "chunk" and r["chrom"] == chrom]
        for r in sorted(crows, key=lambda r: (r["b"], part_off[r["pid"]], r["v0"])):
            shift = part_off[r["pid"]] << 16
            v0, v1 = r["v0"] + shift, r["v1"] + shift
            ch = bins.setdefault(r["b"], [])
            if ch and ch[-1][1] == v0:
                ch[-1][1] = v1
            else:
                ch.append([v0, v1])
        lrows = [r for r in man if r["kind"] == "lin" and r["chrom"] == chrom]
        best: dict = {}
        for r in lrows:
            v = r["v0"] + (part_off[r["pid"]] << 16)
            if r["b"] not in best or v < best[r["b"]]:
                best[r["b"]] = v
        nwin = max(best) + 1 if best else 0
        lin = [0] * nwin
        for wi, v in best.items():
            lin[wi] = v
        for i in range(1, nwin):  # htslib forward-fills empty windows
            if i not in best:
                lin[i] = lin[i - 1]
        bins_per_ref.append({b: [tuple(c) for c in ch] for b, ch in bins.items()})
        linear_per_ref.append(lin)
    write_tbi(bgz + ".tbi", names, bins_per_ref, linear_per_ref)


def _genotype_string(alleles: Column, phased: Column) -> Column:
    """Rebuild '0|1'-style GT from alleles+phase arrays (reference: diploid
    fast path SEQ_ToVCF_Di_WrtFmt src/ConvGDS2VCF.cpp:715-871). Handles any
    ploidy incl. haploid and the reference's 'extra' mixed-ploidy calls."""
    rendered = F.transform(
        alleles, lambda a: F.coalesce(a.cast("string"), F.lit("."))
    )
    seps = F.transform(
        F.coalesce(phased, F.array().cast("array<boolean>")),
        lambda p: F.when(p, F.lit("|")).otherwise(F.lit("/")),
    )
    return F.when(alleles.isNull(), F.lit(".")).otherwise(
        F.concat(
            F.element_at(rendered, 1),
            F.coalesce(
                F.aggregate(
                    F.zip_with(
                        F.slice(rendered, 2, F.greatest(F.size(rendered) - 1, F.lit(0))),
                        seps,
                        lambda r, s: F.concat(F.coalesce(s, F.lit("/")), r),
                    ),
                    F.lit(""),
                    lambda acc, x: F.concat(acc, x),
                ),
                F.lit(""),
            ),
        )
    )


def _struct_field_names(variants: DataFrame) -> list[str]:
    t = variants.schema["info"].dataType
    return [f.name for f in t.fields]


def _struct_field_types(variants: DataFrame) -> list[tuple[str, str]]:
    t = variants.schema["info"].dataType
    return [(f.name, f.dataType.simpleString()) for f in t.fields]


def vcf_samp_id(path: str) -> list[str]:
    """Sample ids from a VCF's #CHROM header line (reference:
    seqVCF_SampID, R/ConvVCF2GDS.R — the quick pre-import probe)."""
    return parse_vcf_header(path, infer_ploidy=False).samples


def example_file_name(type: str = "gds") -> str:
    """Path of a bundled example file (reference: seqExampleFileName,
    R/Utilities.R:42-53). 'gds'/'vcf'/'KG_Phase1'/'dosage' resolve to
    the reference's own fixtures when present (this engine reads them
    directly); 'toy_vcf' is this repo's minimal fixture."""
    import os

    names = {
        "gds": "/root/reference/inst/extdata/CEU_Exon.gds",
        "vcf": "/root/reference/inst/extdata/CEU_Exon.vcf.gz",
        "KG_Phase1": "/root/reference/inst/extdata/1KG_phase1_release_v3_chr22.gds",
        "dosage": "/root/reference/inst/extdata/Imputed_dosages.gds",
        "toy_vcf": os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))),
            "tests", "fixtures", "toy.vcf",
        ),
    }
    if type not in names:
        raise ValueError(f"unknown example type {type!r} (use {sorted(names)})")
    return names[type]
