"""Planted-drift detection stress for the streamed ANN index's
codebook-staleness probe (VERDICT r10 item 6).

Scenario: PQ codebooks are fit on a base embedding distribution, then
batches DRIFT — the whole distribution translates progressively along a
fixed direction (the "new embedding model / new corpus domain" failure
mode). Each batch plants one NEAR-DUPLICATE per probe in its corpus, so
the exact top-1 is unambiguous; the probe metric — pq_drift_probe's
mean ADC-vs-exact top-1 agreement, exactly what
ingest_pq_codes_stream(probe_sample=) appends to <index>_drift.jsonl —
then reads as near-dup RECALL under the frozen codebooks. It must decay
as drift grows (quantization coarsens off the training distribution)
and recover after a codebook refit on the drifted data (what
retrain_pq_codes_index re-encodes the corpus under).

Measured (defaults): agreement 1.0 at drift 0 -> 0.95 / 0.90 / 0.75 at
drift 2 / 4 / 8 sigma; post-retrain back to 1.0.

Usage: python tools/pq_drift_stress.py [corpus_rows] [n_probes]
Prints one JSON line and asserts decay + recovery.
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")


def _fit_codebooks(mat, m: int, k: int, sub_d: int, iters: int = 8):
    """Per-subspace Lloyd's on the batch's slices (the offline codebook
    fit a retrain would run)."""
    import numpy as np

    rows = []
    for j in range(m):
        x = mat[:, j * sub_d : (j + 1) * sub_d]
        cents = x[:k].copy()
        for _ in range(iters):
            d2 = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            a = d2.argmin(axis=1)
            for c in range(k):
                sel = x[a == c]
                if len(sel):
                    cents[c] = sel.mean(axis=0)
        rows.extend((j, c, [float(v) for v in cents[c]]) for c in range(k))
    return rows


def main() -> None:
    corpus_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    n_probes = int(sys.argv[2]) if len(sys.argv) > 2 else 40

    import numpy as np

    from seqarray_spark.operators.similarity import pq_drift_probe
    from seqarray_spark.session import get_spark

    spark = get_spark("pq-drift-stress")
    spark.sparkContext.setLogLevel("ERROR")

    dim, m, k_codes, eps = 32, 4, 16, 0.2
    sub_d = dim // m
    rng = np.random.default_rng(13)
    direction = rng.normal(size=dim)
    direction /= np.linalg.norm(direction)

    def make(drift: float, seed: int):
        r = np.random.default_rng(seed)
        corpus = r.normal(0.0, 1.0, (corpus_rows, dim)) + direction * drift
        probes = r.normal(0.0, 1.0, (n_probes, dim)) + direction * drift
        dups = probes + r.normal(0.0, eps, probes.shape)
        return probes, np.vstack([dups, corpus])

    def agreement(probes, corpus, cb, cents) -> float:
        p_n = len(probes)
        pdf = spark.createDataFrame(
            [(i, [float(x) for x in probes[i]]) for i in range(p_n)],
            "vec_id long, embedding array<float>",
        )
        cdf = spark.createDataFrame(
            [
                (p_n + i, [float(x) for x in corpus[i]])
                for i in range(len(corpus))
            ],
            "vec_id long, embedding array<float>",
        )
        rows = pq_drift_probe(pdf, cdf, cents, cb, m, nprobe=4).collect()
        return round(sum(r["agree"] for r in rows) / len(rows), 3)

    p0, c0 = make(0.0, 1)
    cb_rows = _fit_codebooks(c0, m, k_codes, sub_d)
    cents = [list(map(float, v / np.linalg.norm(v))) for v in c0[:4]]

    out = {"corpus_rows": corpus_rows, "n_probes": n_probes, "steps": []}
    last = None
    for step, drift in enumerate((0.0, 2.0, 4.0, 8.0)):
        last = make(drift, 10 + step)
        out["steps"].append(
            {
                "drift": drift,
                "mean_top1_agreement": agreement(*last, cb_rows, cents),
            }
        )
    cb_new = _fit_codebooks(last[1], m, k_codes, sub_d)
    out["post_retrain_agreement"] = agreement(*last, cb_new, cents)
    print(json.dumps(out))
    assert (
        out["steps"][-1]["mean_top1_agreement"]
        < out["steps"][0]["mean_top1_agreement"]
    ), out
    assert (
        out["post_retrain_agreement"]
        > out["steps"][-1]["mean_top1_agreement"]
    ), out


if __name__ == "__main__":
    main()
