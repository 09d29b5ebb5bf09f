"""The official correctness record must enumerate every contract entry.

Rounds 3 and 4 each shipped registry entries that landed AFTER the
driver's correctness pass, so CORRECTNESS_r{N}.json under-reported the
verified surface (round-4 verdict, What's wrong #1). This test makes
the gap loud: once the newest CORRECTNESS file post-dates the contract
module, full parity is required; while the registry is mid-round
(contract modified after the last snapshot) only the subset direction
is enforced.

No SparkSession needed — queries() builds closures lazily.
"""

from __future__ import annotations

import glob
import json
import os

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Entries the driver's snapshot missed but the round-4 judge verified
# green by hand (VERDICT round 4, "What's wrong" #1).  Grandfathered so
# the gate enforces from r05 onward without re-litigating a settled
# record; any NEW gap still fails.
ADJUDICATED_GAPS = {
    "CORRECTNESS_r04.json": {
        "sparql_virtual_const",
        "sparql_virtual_graph",
        "sparql_virtual_describe",
        "sparql_virtual_doc",
    },
}


def _latest_record() -> str | None:
    files = sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json")))
    return files[-1] if files else None


def test_correctness_record_parity():
    import __spark_entry__ as entrymod

    latest = _latest_record()
    if latest is None:
        pytest.skip("no CORRECTNESS_r*.json yet (round 1)")
    with open(latest) as f:
        recorded = set(json.load(f))
    registry = set(entrymod.queries())

    stale = recorded - registry
    assert not stale, (
        f"{os.path.basename(latest)} records entries no longer in the "
        f"registry: {sorted(stale)}"
    )

    contract = os.path.join(ROOT, "morph_xr2rml_spark", "driver_contract.py")
    if os.path.getmtime(latest) < os.path.getmtime(contract):
        pytest.skip(
            "registry modified after the last correctness snapshot "
            "(mid-round state); scripts/check_contract.py reports the "
            "pending entries"
        )
    missing = (
        registry
        - recorded
        - ADJUDICATED_GAPS.get(os.path.basename(latest), set())
    )
    assert not missing, (
        f"registry entries missing from {os.path.basename(latest)}: "
        f"{sorted(missing)} — contract entries must land before the "
        "driver's correctness pass (freeze additions near round end)"
    )


def test_every_query_entry_has_oracle_or_documented_exemption():
    """Every queries() entry needs an oracle_sql() twin for the driver's
    hash gate; omissions are only for genuinely non-SQL-expressible ops
    and must be listed here explicitly so a forgotten oracle is loud."""
    import __spark_entry__ as entrymod

    exempt: set[str] = set()  # currently none — keep it that way
    missing = set(entrymod.queries()) - set(entrymod.oracle_sql()) - exempt
    assert not missing, f"queries() entries without oracle SQL: {sorted(missing)}"
