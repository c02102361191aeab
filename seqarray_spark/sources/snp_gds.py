"""SNPRelate snp.gds container adapters — the TRUE container format.

The reference converts between SeqArray GDS and SNPRelate's SNP GDS
container (seqGDS2SNP / seqSNP2GDS, R/Conversion.R:410-547,555-825).
This module emits and reads that actual node layout so SNPRelate users
can hand files across:

- root attr ``FileFormat`` = 'SNP_ARRAY' (or 'IMPUTED_DOSAGE');
- ``sample.id``, ``snp.id``, ``snp.rs.id``, ``snp.position``,
  ``snp.chromosome``, ``snp.allele`` ('ref/alt1,alt2' — the first comma
  rendered as '/', FC_AlleleStr src/Methods.cpp:808);
- ``genotype``: bit2 matrix, attr 'sample.order' (samples contiguous per
  SNP) or 'snp.order' (SNPs contiguous per sample — SNPRelate's
  snpfirstdim default); code = count of the FIRST allele, 3 = missing.
  The dosage form stores real numbers (packedreal16/float) instead.

Recode semantics (kernels FC_GDS2SNP / FC_SNP2GDS / FC_Dosage2GDS,
src/ConvToGDS.cpp:171-343):

- Seq -> SNP: code = $dosage (REF count, NULL on any missing slot),
  values > 3 clamped to 3.
- SNP -> Seq with ``major_ref``: per SNP with allele 'A/B' and codes g,
  if sum(valid g) < n_valid the alleles flip to 'B,A' and g maps
  0->(0,0), 1->(0,1), 2->(1,1); otherwise alleles 'A,B' and g maps
  0->(1,1), 1->(0,1), 2->(0,0); other/missing -> (NULL, NULL).
- Real genotype (dosage d of the first allele): DS = d when flipped
  else 2 - d; out-of-[0,2]/non-finite -> NULL.

Distribution: writing encodes per-variant-block fragments in executor
tasks (same fragment/manifest flow as gds_write) and stream-assembles on
the driver; reading decodes variant blocks in tasks for 'sample.order'
files, and for transposed 'snp.order' files reads per-sample rows and
shuffles to variant-major (one exchange — inherent to reading a
transposed matrix by the other axis).
"""

from __future__ import annotations

import math
import os
import shutil

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from seqarray_spark.sources.gds import GdsFile
from seqarray_spark.sources.gds_spark import (
    _bit_rows,
    _node_slice,
    _vl_byte_bounds,
    _vl_slice,
)
from seqarray_spark.sources.gds_write import (
    _MANIFEST_SCHEMA,
    _emit_fragment,
    _encode_values,
    _explode,
    _make_assembler,
    _manifest_pdf,
    _parse_coder,
    _variant_index,
)

_INT_GENO_KINDS = {"bit2", "uint8", "int8", "int16", "int32"}


# ---------------------------------------------------------------------------
# SeqDataset -> snp.gds  (seqGDS2SNP parity)
# ---------------------------------------------------------------------------

def write_snp_gds(ds, path: str, *, dosage: bool | str = False,
                  compress_geno: str | None = "LZMA_ra",
                  compress_annotation: str | None = "LZMA_ra",
                  ds_type: str = "packedreal16",
                  block_variants: int | None = None) -> None:
    """SeqDataset -> SNPRelate snp.gds container (reference seqGDS2SNP,
    R/Conversion.R:410-547). ``dosage`` selects the IMPUTED_DOSAGE form:
    True stores the 'DS' FORMAT column of ds.calls, a string names
    another calls column; genotype then holds real dosages in ``ds_type``
    storage instead of bit2 codes."""
    spark = ds.variants.sparkSession
    variants = ds.variants
    calls = ds.calls
    ploidy = ds.ploidy
    ds_col = None
    if dosage is True:
        ds_col = "DS"
    elif isinstance(dosage, str):
        ds_col = dosage
    if ds_col is not None and ds_col not in calls.columns:
        raise ValueError(f"dosage column {ds_col!r} not in calls")

    plan = {
        "base": _parse_coder(compress_annotation),
        "geno": _parse_coder(compress_geno),
        "index": _parse_coder(compress_annotation),
    }
    from seqarray_spark.dataset import ordered_sample_ids

    sample_ids = ordered_sample_ids(ds.samples)
    n_samp = len(sample_ids)
    sample_pos = {s: i for i, s in enumerate(sample_ids)}

    n_var = variants.count()
    if block_variants is None:
        block_variants = min(max(2_000_000 // max(n_samp, 1), 64), 65536)
    nblocks = max(1, math.ceil(n_var / max(block_variants, 1)))
    vindex, _ = _variant_index(variants, nblocks)

    has_rs = "id" in variants.columns
    tmp = path + ".parts"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)

    vcols = ["variant_id", "position", "chromosome", "ref", "alt"]
    if has_rs:
        vcols.append("id")
    ccols = ["variant_id", "sample_id"] + (
        [ds_col] if ds_col is not None else ["alleles"]
    )

    def kernel(key, vdf, cdf):
        blk = int(key[0])
        rows: list = []
        if len(vdf) == 0:
            return _manifest_pdf(rows)

        def emit(kname, kind=None, values=None, raw=None, nvals=None,
                 s=-1, bits=None):
            _emit_fragment(tmp, blk, plan, rows, kname, kind=kind,
                           values=values, raw=raw, nvals=nvals, s=s,
                           bits=bits)

        vdf = vdf.sort_values("__vidx")
        nv = len(vdf)
        v0 = int(vdf["__vidx"].iloc[0])
        vids = vdf["variant_id"].to_numpy(np.int64)

        emit("snp.id", "int32", vids)
        emit("snp.position", "int32",
             pd.to_numeric(vdf["position"]).fillna(0).to_numpy(np.int64))
        emit("snp.chromosome", "vlstr", vdf["chromosome"].tolist())
        alleles = [
            (r if a is None or len(a) == 0 else f"{r}/{','.join(a)}")
            for r, a in zip(vdf["ref"], vdf["alt"])
        ]
        emit("snp.allele", "vlstr", alleles)
        if has_rs:
            emit("snp.rs.id", "vlstr",
                 ["" if x is None else str(x) for x in vdf["id"]])

        # genotype grid, variant-major with samples contiguous per SNP
        # ('sample.order'); absent cells are missing
        li_of = {int(v): i for i, v in enumerate(vdf["variant_id"])}
        if ds_col is None:
            grid = np.full((nv, n_samp), 3, dtype=np.uint8)
            if cdf is not None and len(cdf):
                cdf = cdf.reset_index(drop=True)
                c_li = cdf["variant_id"].map(li_of).to_numpy(np.int64)
                c_si = cdf["sample_id"].map(sample_pos).to_numpy(np.int64)
                nc = len(cdf)
                lens, rid, _, ex = _explode(cdf["alleles"])
                vals = pd.to_numeric(ex, errors="coerce").to_numpy(np.float64)
                miss = lens == 0
                nz = np.zeros(nc, dtype=np.int64)
                nan = np.isnan(vals)
                np.logical_or.at(miss, rid[nan], True)
                np.add.at(nz, rid[~nan & (vals == 0)], 1)
                # code = REF dosage ($dosage: NULL on any missing slot,
                # FC_GDS2SNP clamps > 3 to the missing code 3)
                codes = np.where(miss, 3, np.minimum(nz, 3)).astype(np.uint8)
                grid[c_li, c_si] = codes
            s_g = v0 * n_samp
            padv = s_g % 4
            raw = _encode_values(
                "bit2",
                np.concatenate([np.zeros(padv, np.uint8), grid.ravel()]),
            )
            emit("geno.data", raw=raw, nvals=nv * n_samp, s=s_g, bits=2)
        else:
            grid = np.full((nv, n_samp), np.nan, dtype=np.float64)
            if cdf is not None and len(cdf):
                c_li = cdf["variant_id"].map(li_of).to_numpy(np.int64)
                c_si = cdf["sample_id"].map(sample_pos).to_numpy(np.int64)
                vals = pd.to_numeric(cdf[ds_col], errors="coerce").to_numpy(
                    np.float64
                )
                grid[c_li, c_si] = vals
            emit("geno.data", ds_type, grid.ravel())
        return _manifest_pdf(rows)

    try:
        vmeta = variants.select(*vcols).join(vindex, "variant_id")
        cj = calls.select(*ccols).join(
            vindex.select("variant_id", F.col("__blk").alias("__cblk")),
            "variant_id",
        )
        manifest = (
            vmeta.groupBy("__blk")
            .cogroup(cj.groupBy("__cblk"))
            .applyInPandas(kernel, _MANIFEST_SCHEMA)
            .collect()
        )

        b, frags, tot, dnode, raw_node = _make_assembler(tmp, manifest, plan)
        root_id = b.new_id()  # = 1 (the reader's root stream id)
        entries: list[tuple[int, str, bool]] = []
        entries.append(
            (raw_node("vlstr", (n_samp,), _encode_values("vlstr", sample_ids)),
             "sample.id", False)
        )
        entries.append((dnode("int32", (n_var,), "snp.id"), "snp.id", False))
        if has_rs:
            entries.append(
                (dnode("vlstr", (n_var,), "snp.rs.id"), "snp.rs.id", False)
            )
        entries.append(
            (dnode("int32", (n_var,), "snp.position"), "snp.position", False)
        )
        entries.append(
            (dnode("vlstr", (n_var,), "snp.chromosome"), "snp.chromosome",
             False)
        )
        entries.append(
            (dnode("vlstr", (n_var,), "snp.allele"), "snp.allele", False)
        )
        gattrs = {"sample.order": None}
        if ds_col is None:
            gid = dnode("bit2", (n_var, n_samp), "geno.data", bits=2,
                        attrs=gattrs)
        else:
            gid = dnode(ds_type, (n_var, n_samp), "geno.data", attrs=gattrs)
        entries.append((gid, "genotype", False))
        b.folder(
            root_id, entries,
            attrs={"FileFormat":
                   "IMPUTED_DOSAGE" if ds_col is not None else "SNP_ARRAY"},
        )
        b.emit(path)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


# ---------------------------------------------------------------------------
# snp.gds -> SeqDataset  (seqSNP2GDS parity)
# ---------------------------------------------------------------------------

def _split_allele(s: str) -> tuple[str, str]:
    """'A/B,C' -> ('A', 'B,C'); no '/' -> (s, '')."""
    i = s.find("/") if s else -1
    if i < 0:
        return (s or "", "")
    return s[:i], s[i + 1:]


def read_snp_gds(spark: SparkSession, path: str, *, major_ref: bool = True,
                 block_variants: int | None = None):
    """Open a SNPRelate snp.gds container as a SeqDataset (reference
    seqSNP2GDS, R/Conversion.R:555-825 + FC_SNP2GDS src/ConvToGDS.cpp:177).

    Integer genotypes become diploid allele pairs with the major-allele-
    as-ref recode when ``major_ref`` (per-SNP: flip when the first
    allele's mean code < 1); real genotypes become an all-missing GT
    grid with a 'DS' FORMAT column (DS = 2 - d, or d when flipped).
    Variants gain the reference's synthesized annotations: id from
    snp.rs.id (falling back to snp.id), qual = 100.0, filter = 'PASS'.
    """
    from seqarray_spark.dataset import SeqDataset

    f = GdsFile(path)
    sample_ids = [str(s) for s in f.read_array("sample.id")]
    n_samp = len(sample_ids)
    geno = f.node("genotype")
    n_var = int(f.node("snp.id").dims[0])
    if len(geno.dims) != 2:
        raise ValueError("snp.gds 'genotype' must be a matrix")
    # reference default is snpfirstdim=TRUE; a 'sample.order' attr flips
    # it and wins over 'snp.order' (R/Conversion.R:598-601)
    sample_major = "sample.order" in geno.attrs
    # stored dims: slowest axis first — (n_var, n_samp) for sample.order
    # (samples contiguous per SNP), (n_samp, n_var) for snp.order
    exp = (n_var, n_samp) if sample_major else (n_samp, n_var)
    if tuple(geno.dims) != exp:
        raise ValueError(
            f"genotype dims {tuple(geno.dims)} do not match "
            f"{'sample.order' if sample_major else 'snp.order'} {exp}"
        )
    is_int = geno.kind in _INT_GENO_KINDS
    rs_node = f.node("snp.rs.id") if _has(f, "snp.rs.id") else None

    if block_variants is None:
        ncores = spark.sparkContext.defaultParallelism
        block_variants = max(256, min(8192, -(-n_var // max(ncores, 1))))

    # variant-axis blocks with VL byte bounds for the string nodes
    vb = list(range(0, n_var, block_variants)) + [n_var]
    vlnodes = {"snp.chromosome": f.node("snp.chromosome"),
               "snp.allele": f.node("snp.allele")}
    if rs_node is not None:
        vlnodes["snp.rs.id"] = rs_node
    vl_bounds = {
        p: _vl_byte_bounds(f, nd, vb) for p, nd in vlnodes.items()
    }
    # per-SNP "has a '/'-separated allele pair" mask — the reference only
    # considers a major-allele flip when sign_pos >= 0 (FC_SNP2GDS); one
    # bounded driver pass per block, broadcast as n_var bits
    flip_ok = np.zeros(n_var, dtype=bool)
    if major_ref:
        an = vlnodes["snp.allele"]
        ab = vl_bounds["snp.allele"]
        for i in range(len(vb) - 1):
            s, e = vb[i], vb[i + 1]
            sl = _vl_slice(f, an, s, e, bref=(ab[i], ab[i + 1], s))
            flip_ok[s:e] = ["/" in (x or "") for x in sl]
    vlpaths = sorted(vlnodes)
    blocks = [
        (
            int(vb[i]), int(vb[i + 1]),
            [int(vl_bounds[p][i]) for p in vlpaths],
            [int(vl_bounds[p][i + 1]) for p in vlpaths],
        )
        for i in range(len(vb) - 1)
    ]
    bschema = "start long, end long, vb0 array<long>, vb1 array<long>"
    ncores = spark.sparkContext.defaultParallelism
    blocks_df = spark.createDataFrame(blocks, bschema).repartition(
        min(max(len(blocks), 1), ncores * 4)
    )
    bc = spark.sparkContext.broadcast(f)
    bcf = spark.sparkContext.broadcast(flip_ok)

    def _block_meta(g, row):
        """Decode one variant block's axis vectors (ids, pos, chrom,
        allele, rs) from the broadcast container."""
        s, e = int(row["start"]), int(row["end"])
        vids = np.asarray(
            _node_slice(g, g.node("snp.id"), s, e), dtype=np.int64
        )
        pos = np.asarray(
            _node_slice(g, g.node("snp.position"), s, e), dtype=np.int64
        )
        sl = {}
        for i, p in enumerate(vlpaths):
            sl[p] = _vl_slice(
                g, g.node(p), s, e,
                bref=(row["vb0"][i], row["vb1"][i], s),
            )
        rs = sl.get("snp.rs.id")
        return s, e, vids, pos, sl["snp.chromosome"], sl["snp.allele"], rs

    def _codes_block(g, s, e):
        """(e-s, n_samp) code/dosage matrix for a sample.order file."""
        if is_int:
            vals = np.asarray(
                _bit_rows(g, g.node("genotype"), s, e, n_samp)
                if g.node("genotype").kind == "bit2"
                else _node_slice(g, g.node("genotype"), s * n_samp, e * n_samp),
                dtype=np.float64,
            )
        else:
            vals = np.asarray(
                _node_slice(g, g.node("genotype"), s * n_samp, e * n_samp),
                dtype=np.float64,
            )
        return vals.reshape(e - s, n_samp)

    def _rev_flags(codes: np.ndarray) -> np.ndarray:
        """Per-variant major-allele flip decision (FC_SNP2GDS: flip when
        sum(valid codes) < n_valid)."""
        valid = np.isfinite(codes) & (codes >= 0) & (codes <= 2)
        ssum = np.where(valid, codes, 0).sum(axis=1)
        nval = valid.sum(axis=1)
        return ssum < nval

    # sample-row blocks for the transposed (snp.order) layout — used by
    # both the rev-flag precompute and the calls reader
    srow = max(1, 2_000_000 // max(n_var, 1))
    sblocks = [(i, min(i + srow, n_samp)) for i in range(0, n_samp, srow)]

    def _sample_rows(g, s, e):
        """(e-s, n_var) code/dosage matrix rows of a snp.order file."""
        gn = g.node("genotype")
        if gn.kind == "bit2":
            vals = np.asarray(_bit_rows(g, gn, s, e, n_var), np.float64)
        else:
            vals = np.asarray(
                _node_slice(g, gn, s * n_var, e * n_var), np.float64
            )
        return vals.reshape(e - s, n_var)

    # For transposed files the flip decision needs variant-axis sums that
    # no single sample-row task sees, so precompute them distributedly:
    # each task folds its sample rows into per-variant partial (sum,
    # n_valid) vectors — one n_var-length pair per block, no cell-level
    # shuffle — then the driver reduces and broadcasts n_var flip bits
    # (same driver footprint as the flip_ok mask above). Both the
    # variants and the calls kernels read this one vector, so ref/alt and
    # the genotype recode can never disagree.
    bcrev = None
    if major_ref and not sample_major:
        sdf0 = spark.createDataFrame(sblocks, "s long, e long").repartition(
            min(max(len(sblocks), 1), ncores * 4)
        )

        def partial_kernel(batches):
            g = bc.value
            for pdf in batches:
                for _, row in pdf.iterrows():
                    m = _sample_rows(g, int(row["s"]), int(row["e"]))
                    valid = np.isfinite(m) & (m >= 0) & (m <= 2)
                    yield pd.DataFrame(
                        {
                            "ssum": [
                                np.where(valid, m, 0).sum(axis=0).tolist()
                            ],
                            "nval": [
                                valid.sum(axis=0).astype(float).tolist()
                            ],
                        }
                    )

        ssum = np.zeros(n_var)
        nval = np.zeros(n_var)
        for r in sdf0.mapInPandas(
            partial_kernel, "ssum array<double>, nval array<double>"
        ).collect():
            ssum += np.asarray(r["ssum"])
            nval += np.asarray(r["nval"])
        bcrev = spark.sparkContext.broadcast((ssum < nval) & flip_ok)

    # --- variants ------------------------------------------------------
    def variants_kernel(batches):
        g = bc.value
        for pdf in batches:
            for _, row in pdf.iterrows():
                s, e, vids, pos, chroms, alleles, rs = _block_meta(g, row)
                splits = [_split_allele(a) for a in alleles]
                if not major_ref:
                    rev = np.zeros(e - s, dtype=bool)
                elif sample_major:
                    rev = _rev_flags(_codes_block(g, s, e)) & bcf.value[s:e]
                else:
                    rev = bcrev.value[s:e]
                refs, alts = [], []
                for (a, rest), rv in zip(splits, rev):
                    if rv:
                        parts = rest.split(",") + [a]
                    else:
                        parts = [a] + (rest.split(",") if rest else [])
                    refs.append(parts[0])
                    alts.append(parts[1:])
                # reference seqSNP2GDS copies snp.rs.id verbatim whenever
                # the node exists (blank entries stay blank); snp.id is
                # the fallback only when there is no rs node at all
                # (R/Conversion.R:644-652)
                ids = (
                    ["" if r is None else str(r) for r in rs]
                    if rs is not None else [str(v) for v in vids]
                )
                yield pd.DataFrame(
                    {
                        "variant_id": vids,
                        "chromosome": [str(c) for c in chroms],
                        "position": pos.astype(np.int32),
                        "id": ids,
                        "ref": refs,
                        "alt": alts,
                        "qual": np.full(e - s, 100.0),
                        "filter": ["PASS"] * (e - s),
                    }
                )

    v_schema = (
        "variant_id long, chromosome string, position int, id string, "
        "ref string, alt array<string>, qual double, filter string"
    )
    variants = blocks_df.mapInPandas(variants_kernel, schema=v_schema)

    # --- calls ---------------------------------------------------------
    sids_arr = np.asarray(sample_ids, dtype=object)

    def _emit_calls(vids, codes, rev):
        nv = len(vids)
        vcol = np.repeat(vids, n_samp)
        scol = np.tile(sids_arr, nv)
        flat = codes.ravel()
        revf = np.repeat(rev, n_samp)
        if is_int:
            ok = np.isfinite(flat) & (flat >= 0) & (flat <= 2)
            gi = np.where(ok, flat, 0).astype(np.int64)
            # rev: g copies of allele 1 -> pairs 0/(0,0) 1/(0,1) 2/(1,1)
            # fwd: g copies of allele 0 -> pairs 0/(1,1) 1/(0,1) 2/(0,0)
            a0 = np.where(revf, (gi >= 2), (gi <= 0)).astype(np.int16)
            a1 = np.where(revf, (gi >= 1), (gi <= 1)).astype(np.int16)
            alleles = [
                [int(x), int(y)] if k else [None, None]
                for x, y, k in zip(a0, a1, ok)
            ]
            return pd.DataFrame(
                {
                    "variant_id": vcol,
                    "sample_id": scol,
                    "alleles": alleles,
                    "phased": [[False]] * (nv * n_samp),
                }
            )
        ok = np.isfinite(flat) & (flat >= 0) & (flat <= 2)
        ds_out = np.where(revf, flat, 2.0 - flat)
        return pd.DataFrame(
            {
                "variant_id": vcol,
                "sample_id": scol,
                "alleles": [[None, None]] * (nv * n_samp),
                "phased": [[False]] * (nv * n_samp),
                "DS": [float(d) if k else None for d, k in zip(ds_out, ok)],
            }
        )

    c_schema = (
        "variant_id long, sample_id string, alleles array<smallint>, "
        "phased array<boolean>" + ("" if is_int else ", DS double")
    )

    if sample_major:
        def calls_kernel(batches):
            g = bc.value
            for pdf in batches:
                for _, row in pdf.iterrows():
                    s, e = int(row["start"]), int(row["end"])
                    vids = np.asarray(
                        _node_slice(g, g.node("snp.id"), s, e), np.int64
                    )
                    codes = _codes_block(g, s, e)
                    rev = (
                        _rev_flags(codes) & bcf.value[s:e] if major_ref
                        else np.zeros(e - s, dtype=bool)
                    )
                    yield _emit_calls(vids, codes, rev)

        calls = blocks_df.mapInPandas(calls_kernel, schema=c_schema)
    else:
        # snp.order (SNPs contiguous per sample): read sample rows in
        # tasks, explode to (variant_ord, sample, value), shuffle to
        # variant-major, then recode per variant — one exchange,
        # inherent to consuming a transposed matrix by the other axis
        sdf = spark.createDataFrame(sblocks, "s long, e long").repartition(
            min(max(len(sblocks), 1), ncores * 4)
        )

        def long_kernel(batches):
            g = bc.value
            for pdf in batches:
                for _, row in pdf.iterrows():
                    s, e = int(row["s"]), int(row["e"])
                    m = _sample_rows(g, s, e)
                    yield pd.DataFrame(
                        {
                            "__vord": np.tile(
                                np.arange(n_var, dtype=np.int64), e - s
                            ),
                            "sample_id": np.repeat(sids_arr[s:e], n_var),
                            "g": m.ravel(),
                        }
                    )

        long_df = sdf.mapInPandas(
            long_kernel, "__vord long, sample_id string, g double"
        )
        grp = long_df.groupBy("__vord").agg(
            F.collect_list(F.struct("sample_id", "g")).alias("cells")
        )
        sample_pos = {s: i for i, s in enumerate(sample_ids)}

        def regroup_kernel(batches):
            g = bc.value
            vid_all = None
            for pdf in batches:
                if not len(pdf):
                    continue
                if vid_all is None:
                    vid_all = np.asarray(
                        _node_slice(g, g.node("snp.id"), 0, n_var), np.int64
                    )
                vords = pdf["__vord"].to_numpy(np.int64)
                order = np.argsort(vords, kind="stable")
                pdf = pdf.iloc[order]
                vords = vords[order]
                vids = vid_all[vords]
                codes = np.full((len(pdf), n_samp), np.nan)
                for i, cells in enumerate(pdf["cells"]):
                    for c in cells:
                        codes[i, sample_pos[c["sample_id"]]] = c["g"]
                # use the precomputed broadcast flips (same vector the
                # variants kernel reads) — NOT a local _rev_flags on the
                # regrouped codes, so calls and variants stay coherent
                # even if a partition saw a partial sample set
                rev = (
                    bcrev.value[vords] if major_ref
                    else np.zeros(len(pdf), dtype=bool)
                )
                yield _emit_calls(vids, codes, rev)

        calls = grp.mapInPandas(regroup_kernel, schema=c_schema)

    # sample_ordinal = 1-based node order (the reference's sample order)
    samples = spark.createDataFrame(
        [(s, k + 1) for k, s in enumerate(sample_ids)],
        "sample_id string, sample_ordinal int",
    )
    if _has(f, "sample.annot"):
        for child in f.node("sample.annot").children:
            if child.is_folder or child.kind is None:
                continue
            vals = f.read_array(child.path)
            # preserve the node's storage type (the reference copies
            # annotation nodes as-is, R/Conversion.R:706-719) — numpy
            # scalars from int/float nodes are converted to Python
            # natives of the matching Spark type
            styp, conv = _annot_spark_type(child.kind)
            aux = spark.createDataFrame(
                [
                    (s, None if v is None else conv(v))
                    for s, v in zip(sample_ids, vals)
                ],
                f"sample_id string, `{child.name}` {styp}",
            )
            samples = samples.join(aux, "sample_id", "left")

    return SeqDataset(variants, calls, samples, ploidy=2)


def _annot_spark_type(kind: str):
    """Map a GDS storage kind to (spark type ddl, value converter) so
    sample.annot children keep their numeric types across the read."""
    if kind in ("int8", "int16", "int32", "uint8", "bit1", "bit2", "vlint"):
        return "long", int
    if kind in ("float32", "float64") or kind.startswith("packedreal"):
        return "double", float
    return "string", str


def _has(f: GdsFile, path: str) -> bool:
    try:
        f.node(path)
        return True
    except KeyError:
        return False


# ---------------------------------------------------------------------------
# one-step file converters (the reference's public entry points)
# ---------------------------------------------------------------------------

def snp2gds(spark: SparkSession, snp_fn: str, out_fn: str, *,
            storage_option: str | None = "LZMA_ra", major_ref: bool = True,
            ds_type: str = "packedreal16") -> str:
    """snp.gds -> SeqArray .gds on disk (reference seqSNP2GDS)."""
    from seqarray_spark.sources.gds_write import write_gds

    ds = read_snp_gds(spark, snp_fn, major_ref=major_ref)
    fs = None
    if "DS" in (ds.calls.columns if ds.calls is not None else []):
        fs = {"DS": ds_type}
    write_gds(ds, out_fn, coder=storage_option, format_storage=fs)
    return out_fn


def gds2snp(spark: SparkSession, gds_fn: str, out_fn: str, *,
            dosage: bool | str = False,
            compress_geno: str | None = "LZMA_ra",
            compress_annotation: str | None = "LZMA_ra",
            ds_type: str = "packedreal16") -> str:
    """SeqArray .gds -> snp.gds on disk (reference seqGDS2SNP)."""
    from seqarray_spark.sources.gds_spark import from_gds

    ds = from_gds(spark, gds_fn)
    write_snp_gds(ds, out_fn, dosage=dosage, compress_geno=compress_geno,
                  compress_annotation=compress_annotation, ds_type=ds_type)
    return out_fn
