"""hwe_exact_p width stress — the biobank-sweep bound (VERDICT r11 #3).

The r11 form walked each variant's het support with per-variant Python
while-loops: O(min(nA, nB)) interpreter steps per variant, ~10^5 float
ops each at 500k samples — fine for QC panels, slow for a full biobank
sweep. r12's _hwe_exact_p_grid walks the whole Arrow batch together
(padded support grids, row-wise cumprods, element-budgeted chunks).
This tool measures BOTH kernels on the same synthetic counts — wide
support (n_samples up to the requested width, rare-allele counts drawn
across the full range so supports are genuinely long) — verifies they
agree to 1e-9, and reports the speedup so the docstring's "~Nx" is a
measurement, not a guess.

Pure-kernel measurement (no Spark session): the UDF wrapper adds only
Arrow transport around exactly these arrays.

Usage: python tools/hwe_stress.py [n_samples] [n_variants]
Prints one JSON line.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def loop_kernel(rr_a, het_a, aa_a):
    """The r11 per-variant while-loop form, verbatim semantics —
    kept here as the baseline the grid kernel is measured against."""
    out = np.full(len(rr_a), np.nan)
    for i, (rr, het, aa) in enumerate(zip(rr_a, het_a, aa_a)):
        rr, het, aa = int(rr), int(het), int(aa)
        n_tot = rr + het + aa
        rare = 2 * min(rr, aa) + het
        if n_tot == 0 or rare == 0 or rare == 2 * n_tot:
            continue
        mid = rare * (2 * n_tot - rare) // (2 * n_tot)
        if mid % 2 != rare % 2:
            mid += 1
        probs = {mid: 1.0}
        h = mid
        while h > 1:
            hom_r = (rare - h) // 2
            hom_c = n_tot - (h + hom_r)
            probs[h - 2] = probs[h] * h * (h - 1) / (
                4.0 * (hom_r + 1) * (hom_c + 1)
            )
            h -= 2
        h = mid
        while h <= rare - 2:
            hom_r = (rare - h) // 2
            hom_c = n_tot - (h + hom_r)
            probs[h + 2] = probs[h] * 4.0 * hom_r * hom_c / (
                (h + 2.0) * (h + 1.0)
            )
            h += 2
        total = sum(probs.values())
        obs = probs.get(het)
        if obs is None:
            continue
        out[i] = min(
            1.0,
            sum(v for v in probs.values() if v <= obs * (1 + 1e-12))
            / total,
        )
    return out


def main() -> None:
    from seqarray_spark.operators.ld import _hwe_exact_p_grid

    n_samples = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    n_variants = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000

    rng = np.random.default_rng(17)
    # rare-allele frequency spread over the full range so support
    # lengths go from a handful to ~n_samples/2 (log-uniform q)
    q = np.exp(rng.uniform(np.log(1.0 / n_samples), np.log(0.5), n_variants))
    het = (2 * n_samples * q * (1 - q)).astype(np.int64)
    aa = (n_samples * q * q).astype(np.int64)
    rr = n_samples - het - aa

    # warm both kernels on a sliver first: numpy's first ufunc calls
    # cost ~0.4s that would otherwise be billed to whichever runs first
    _hwe_exact_p_grid(rr[:8], het[:8], aa[:8])
    loop_kernel(rr[:8], het[:8], aa[:8])

    # cold = first full call (pays the work-buffer page faults);
    # steady = best of 3 with the module pool warm — the per-batch
    # cost a reused Spark python worker actually sees
    t0 = time.perf_counter()
    got_grid = _hwe_exact_p_grid(rr, het, aa)
    grid_cold_sec = time.perf_counter() - t0
    grid_sec = grid_cold_sec
    for _ in range(2):
        t0 = time.perf_counter()
        _hwe_exact_p_grid(rr, het, aa)
        grid_sec = min(grid_sec, time.perf_counter() - t0)

    t0 = time.perf_counter()
    got_loop = loop_kernel(rr, het, aa)
    loop_sec = time.perf_counter() - t0

    both = ~(np.isnan(got_grid) | np.isnan(got_loop))
    assert np.isnan(got_grid).sum() == np.isnan(got_loop).sum()
    max_abs = float(np.abs(got_grid[both] - got_loop[both]).max())
    assert max_abs < 1e-9, max_abs

    print(
        json.dumps(
            {
                "metric": "hwe_exact_p_kernel",
                "n_samples": n_samples,
                "n_variants": n_variants,
                "grid_sec": round(grid_sec, 3),
                "grid_cold_sec": round(grid_cold_sec, 3),
                "loop_sec": round(loop_sec, 3),
                "speedup": round(loop_sec / grid_sec, 1),
                "speedup_cold": round(loop_sec / grid_cold_sec, 1),
                "max_abs_diff": max_abs,
                "mean_support": float((2 * np.minimum(rr, aa) + het).mean())
                / 2.0,
            }
        )
    )


if __name__ == "__main__":
    main()
