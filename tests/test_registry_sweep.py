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
    assert len(entry_mod.queries()) >= 59


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
