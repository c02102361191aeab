"""Full-registry oracle sweep (VERDICT r6 item 2): every queries() entry
is value-checked against its oracle_sql() twin at sf0.001 on EVERY
pytest run — so the queries rotated past the external driver's 50-entry
window can never silently regress. This is the CI twin of the driver's
t2 gate (tools/check_correctness.py is the shared engine)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"


def test_all_registry_queries_match_oracles(spark):
    from tools.check_correctness import run_checks

    import __spark_entry__ as entry_mod

    failures = run_checks(spark, SF_DIR, echo=lambda *_: None)
    assert not failures, "; ".join(f"{n}: {p}" for n, p in failures)
    # the sweep only proves anything if it saw the whole registry
    # (VERDICT r8 item 8: pin the actual count so an accidental registry
    # truncation fails loudly; bump when adding queries)
    assert len(entry_mod.queries()) >= 130


def test_every_query_has_oracle_or_documented_exemption():
    """Every registry entry needs an oracle; the rows-only exemptions
    are pinned here so a new operator can't silently ship without one
    (the r5/r6 governance lesson, twice)."""
    import __spark_entry__ as entry_mod

    exempt = {
        # DuckDB cannot read GDS containers; value parity is pytest-
        # pinned against the CEU fixture in tests/test_gds.py
        "gds_read_af",
        # approximate by construction; pinned by the exact-degeneration
        # twin emb_ivf_topk_full which IS oracle-checked
        "emb_ivf_topk",
    }
    missing = set(entry_mod.queries()) - set(entry_mod.oracle_sql()) - exempt
    assert not missing, f"queries without an oracle: {sorted(missing)}"


def test_rotation_invariant():
    """VERDICT r8 item 2: every registry entry that has NEVER earned a
    driver row (green or rows-only) must sit at index < 50 — inside the
    external driver's value-check window — so no new operator can ship
    past the hard correctness gate (the emb_kmeans_cells lesson). The
    'checked' set is computed from the committed CORRECTNESS_r*.json
    files, so it self-updates each round instead of going stale."""
    import glob
    import json

    import __spark_entry__ as entry_mod

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    checked = set()
    for path in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        with open(path) as f:
            rows = json.load(f)
        for name, row in rows.items():
            # a driver row counts if the value hash matched, or it is the
            # structurally rows-only case (err == "no_oracle")
            if row.get("hash_match") or row.get("err") == "no_oracle":
                checked.add(name)
    names = list(entry_mod.queries().keys())
    stragglers = [
        (i, n) for i, n in enumerate(names) if n not in checked and i >= 50
    ]
    assert not stragglers, (
        "registry entries never driver-checked but OUTSIDE the 50-entry "
        f"driver window: {stragglers} — move them to the front"
    )


def test_plans_md_covers_whole_registry():
    """VERDICT r9 item 4: PLANS.md went stale at 70/73 in r9 and the
    round's one scale-killer plan shipped unreviewed in exactly the
    gap. The committed dump must name every registry query — adding a
    query without regenerating (python tools/dump_plans.py) fails CI."""
    import __spark_entry__ as entry_mod

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "PLANS.md")) as fh:
        dumped = {ln[3:].strip() for ln in fh if ln.startswith("## ")}
    missing = set(entry_mod.queries()) - dumped
    assert not missing, f"PLANS.md missing plans for: {sorted(missing)}"


def test_bench_newest_shared_set_covers_full_registry():
    """The newest frozen bench set is documented as the full
    current-round registry; this pins the lockstep so a new queries()
    entry cannot ship outside the like-for-like subtotal (the r10
    review's bench drift, made structural)."""
    import bench

    import __spark_entry__ as entry_mod

    assert set(bench.shared_r13) == set(entry_mod.queries())
