"""Greedy LD-prune walk memory/time stress (VERDICT r11 item 5).

ld_prune(method='greedy')'s sequential kept-set semantics run as ONE
cogrouped pandas task per chromosome, holding only the chromosome's
variant frame plus its >tau pair skeleton. This tool measures that
task's kernel at 10M variants/chromosome with a ZIPFIAN pair skeleton
(hot variants correlate with many partners — the LD-block reality) and
reports wall time and peak RSS, so SCALE.md's bound is a measurement.

Two kernels are measured on identical data:
- dict-of-sets: the r11 form (predecessor sets keyed by variant id) —
  ~200+ bytes/pair of Python object overhead;
- array walk: the r12 form shipped in ld.py's _walk — CSR-grouped
  position-coded int arrays, ~24 bytes/pair task state.

Pure-kernel measurement (no Spark session): the cogroup machinery adds
Arrow transport around exactly these frames. Peak RSS is process-wide
(ru_maxrss), so run each kernel in its own invocation for clean
numbers: `--kernel array` (default) or `--kernel dict`; `--check N`
cross-validates both kept-sets at a smaller N first.

Usage: python tools/prune_walk_stress.py [n_variants] [pairs_per_variant]
           [--kernel array|dict] [--check N]
Prints one JSON line.
"""

from __future__ import annotations

import json
import resource
import sys
import time

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))

import numpy as np
import pandas as pd


def make_skeleton(n_variants: int, pairs_per_variant: float, seed: int = 5):
    """One chromosome: positions 1..n, and a Zipf-hot pair skeleton
    whose va is always earlier than vb in position order (what the
    ld_pairs relation produces)."""
    rng = np.random.default_rng(seed)
    vpdf = pd.DataFrame(
        {
            "variant_id": np.arange(1, n_variants + 1, dtype=np.int64),
            "chromosome": "1",
            "position": np.arange(1, n_variants + 1, dtype=np.int32),
        }
    )
    # Zipfian per-variant strong-pair degree (LD blocks: a few hub
    # variants correlate with up to the whole window), pairs DISTINCT
    # BY CONSTRUCTION (each vb takes its `deg` nearest predecessors) —
    # ld_pairs emits distinct pairs, so neither kernel gets to
    # amortize repeated rows the real relation never has
    deg = rng.zipf(2.2, n_variants).astype(np.int64) - 1
    deg = np.minimum(deg, 1000)
    ids = np.arange(1, n_variants + 1, dtype=np.int64)
    deg = np.minimum(deg, ids - 1)
    # rescale toward the requested density by random thinning
    mean = deg.mean()
    if mean > pairs_per_variant:
        keep = rng.random(n_variants) < (pairs_per_variant / mean)
        deg = deg * keep
    vb = np.repeat(ids, deg)
    starts = np.repeat(np.cumsum(deg) - deg, deg)
    offs = np.arange(len(vb), dtype=np.int64) - starts
    va = vb - 1 - offs
    ppdf = pd.DataFrame({"va": va, "vb": vb})
    return vpdf, ppdf


def walk_dict(vpdf: pd.DataFrame, ppdf: pd.DataFrame) -> set:
    """The r11 dict-of-sets kernel, verbatim semantics."""
    order = vpdf.sort_values(["position", "variant_id"])
    preds: dict = {}
    for va, vb in zip(ppdf["va"], ppdf["vb"]):
        preds.setdefault(vb, set()).add(va)
    kept: set = set()
    for vid in order["variant_id"]:
        if preds.get(vid, set()) & kept:
            continue
        kept.add(vid)
    return kept


def walk_array(vpdf: pd.DataFrame, ppdf: pd.DataFrame) -> set:
    """The shipped kernel's array logic (ld.py _walk), replicated here
    because running it through the public op would need a Spark
    session; tests pin the shipped walk against the dict form."""
    order = vpdf.sort_values(["position", "variant_id"])
    vids = order["variant_id"].to_numpy()
    n = len(vids)
    id_order = np.argsort(vids, kind="stable")
    ids_sorted = vids[id_order]

    def walk_pos(ids):
        j = np.searchsorted(ids_sorted, ids)
        j_safe = np.minimum(j, n - 1)
        pos = id_order[j_safe]
        return np.where(ids_sorted[j_safe] == ids, pos, -1)

    va_pos = walk_pos(ppdf["va"].to_numpy())
    vb_pos = walk_pos(ppdf["vb"].to_numpy())
    good = (va_pos >= 0) & (vb_pos >= 0)
    va_pos, vb_pos = va_pos[good], vb_pos[good]
    grp = np.argsort(vb_pos, kind="stable")
    vbp = vb_pos[grp]
    vap = va_pos[grp]
    bounds = np.searchsorted(vbp, np.arange(n + 1))
    kept = np.zeros(n, dtype=bool)
    for j in range(n):
        s, e = bounds[j], bounds[j + 1]
        if e > s and kept[vap[s:e]].any():
            continue
        kept[j] = True
    return set(vids[kept].tolist())


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_variants = int(args[0]) if args else 10_000_000
    ppv = float(args[1]) if len(args) > 1 else 3.0
    kernel = "array"
    if "--kernel" in sys.argv:
        kernel = sys.argv[sys.argv.index("--kernel") + 1]
    if "--check" in sys.argv:
        n_chk = int(sys.argv[sys.argv.index("--check") + 1])
        v, p = make_skeleton(n_chk, ppv)
        a, d = walk_array(v, p), walk_dict(v, p)
        assert a == d, (len(a), len(d))
        print(f"check ok at n={n_chk}: kept {len(a)} both kernels",
              file=sys.stderr)

    if "--gen" in sys.argv:
        # write the frames so --load runs measure the WALK's RSS in a
        # fresh process, not the generator's allocation peak
        out = sys.argv[sys.argv.index("--gen") + 1]
        vpdf, ppdf = make_skeleton(n_variants, ppv)
        vpdf.to_parquet(f"{out}.variants.parquet")
        ppdf.to_parquet(f"{out}.pairs.parquet")
        print(json.dumps({"generated": out, "n_variants": n_variants,
                          "n_pairs": len(ppdf)}))
        return
    if "--load" in sys.argv:
        src = sys.argv[sys.argv.index("--load") + 1]
        vpdf = pd.read_parquet(f"{src}.variants.parquet")
        ppdf = pd.read_parquet(f"{src}.pairs.parquet")
    else:
        vpdf, ppdf = make_skeleton(n_variants, ppv)
    base_rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    t0 = time.perf_counter()
    kept = (walk_array if kernel == "array" else walk_dict)(vpdf, ppdf)
    wall = time.perf_counter() - t0
    peak_rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    print(
        json.dumps(
            {
                "metric": "greedy_prune_walk_task",
                "kernel": kernel,
                "n_variants": n_variants,
                "n_pairs": len(ppdf),
                "kept": len(kept),
                "wall_sec": round(wall, 2),
                "input_rss_mb": round(base_rss / 1024, 0),
                "peak_rss_mb": round(peak_rss / 1024, 0),
            }
        )
    )


if __name__ == "__main__":
    main()
