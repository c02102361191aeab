"""Unrelated-sample greedy walk stress at biobank n (VERDICT r12
item 5): unrelated_samples runs its kept-set walk as ONE cogrouped
pandas task holding only sample ids + the >tau kinship skeleton. This
measures that task's kernel — the STRING-id alignment (sort +
searchsorted, the sample-graph-specific cost) plus the shared
_greedy_kept_walk — at n = 1M samples with a HUB-HEAVY skeleton
(a few mega-families touch thousands of samples each, plus a Zipf
tail of small families — the cryptic-relatedness reality KING
cutoffs exist for).

Pure-kernel measurement (no Spark session): the cogroup machinery
adds Arrow transport around exactly these frames. Prints one JSON
line with wall seconds, peak RSS, and kept-set size.

Usage: python tools/sample_walk_stress.py [n_samples] [pairs_per_sample]
           [n_hubs] [hub_degree]
"""

from __future__ import annotations

import json
import resource
import sys
import time

sys.path.insert(
    0,
    __import__("os").path.dirname(
        __import__("os").path.dirname(__import__("os").path.abspath(__file__))
    ),
)

import numpy as np
import pandas as pd


def make_kinship_skeleton(
    n: int, pairs_per_sample: float, n_hubs: int, hub_degree: int, seed: int = 7
):
    """String sample ids + a hub-heavy >tau pair skeleton: n_hubs
    samples each related to hub_degree others (mega-families), the
    rest Zipf-degree small families; sample_i < sample_j (string
    order), distinct pairs."""
    rng = np.random.default_rng(seed)
    ids = np.array([f"UKB{i:08d}" for i in range(n)])
    # hub pairs: hub h relates to hub_degree random later samples
    hubs = rng.choice(n - hub_degree - 1, size=n_hubs, replace=False)
    hub_i = np.repeat(hubs, hub_degree)
    hub_j = hub_i + 1 + (
        rng.integers(1, n // 2, size=len(hub_i)) % (n - hub_i - 1)
    )
    # tail: Zipf per-sample degree toward the requested mean density
    deg = rng.zipf(2.5, n).astype(np.int64) - 1
    deg = np.minimum(deg, 50)
    mean = deg.mean()
    if mean > pairs_per_sample:
        keep = rng.random(n) < (pairs_per_sample / mean)
        deg = deg * keep
    tail_i = np.repeat(np.arange(n), deg)
    tail_j = tail_i + 1 + (
        rng.integers(1, 1000, size=len(tail_i)) % np.maximum(n - tail_i - 1, 1)
    )
    pi = np.concatenate([hub_i, tail_i])
    pj = np.concatenate([hub_j, tail_j])
    ok = pj < n
    pi, pj = pi[ok], pj[ok]
    pairs = pd.DataFrame({"sample_i": ids[pi], "sample_j": ids[pj]})
    pairs = pairs.drop_duplicates()
    return pd.DataFrame({"sample_id": ids}), pairs


def run_kernel(spdf: pd.DataFrame, ppdf: pd.DataFrame):
    """Verbatim unrelated_samples._walk body (string alignment + the
    shared _greedy_kept_walk)."""
    from seqarray_spark.operators.ld import _greedy_kept_walk

    ids = np.sort(spdf["sample_id"].to_numpy())
    n = len(ids)

    def pos(v):
        j = np.searchsorted(ids, v)
        j_safe = np.minimum(j, n - 1)
        return np.where(ids[j_safe] == v, j_safe, -1)

    pa = pos(ppdf["sample_i"].to_numpy())
    pb = pos(ppdf["sample_j"].to_numpy())
    good = (pa >= 0) & (pb >= 0)
    kept = _greedy_kept_walk(n, pa[good], pb[good])
    return ids[kept]


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    density = float(sys.argv[2]) if len(sys.argv) > 2 else 0.5
    n_hubs = int(sys.argv[3]) if len(sys.argv) > 3 else 200
    hub_degree = int(sys.argv[4]) if len(sys.argv) > 4 else 5000
    spdf, ppdf = make_kinship_skeleton(n, density, n_hubs, hub_degree)
    t0 = time.time()
    kept = run_kernel(spdf, ppdf)
    wall = time.time() - t0
    print(
        json.dumps(
            {
                "metric": "unrelated_walk_kernel",
                "n_samples": n,
                "n_pairs": int(len(ppdf)),
                "n_hubs": n_hubs,
                "hub_degree": hub_degree,
                "kept": int(len(kept)),
                "wall_sec": round(wall, 2),
                "peak_rss_mb": round(
                    resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024,
                    1,
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
