"""Session-scoped cache registry.

Operators persist intermediates their plans reference repeatedly (the
shingle posting table, RefObjectMap parent-side scans, the triple table
under SPARQL evaluation). In a long-lived session those executor blocks
leak unless something unpersists them after the consuming action runs —
the operator itself cannot, because it returns a lazy plan.

Every such persist goes through :func:`cache`, giving one release
point: :func:`release_caches` drops everything still registered.
Contract/bench queries call it on entry (releasing the *previous*
query's blocks, whose action has completed), and library users embed it
wherever their job boundaries are.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_LIVE: list[DataFrame] = []


def cache(df: DataFrame) -> DataFrame:
    """persist() + register for a later :func:`release_caches`."""
    df = df.persist()
    _LIVE.append(df)
    return df


def release_caches() -> int:
    """Unpersist every registered DataFrame; returns how many."""
    n = 0
    while _LIVE:
        df = _LIVE.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:  # noqa: BLE001 — session may already be gone
            pass
    return n
