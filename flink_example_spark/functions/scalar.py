"""Scalar functions the reference exercises (F1-F4, SURVEY.md §2.2).

Both are thin wrappers over JVM-side Catalyst built-ins — no Python UDFs in
the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def nullif_(col: Column | str, value) -> Column:
    """``NULLIF(col, value)`` (F1, App.java:70): NULL when equal, else col."""
    c = F.col(col) if isinstance(col, str) else col
    return F.nullif(c, F.lit(value))


def timestampadd_(unit: str, amount: int, ts: Column | str) -> Column:
    """``TIMESTAMPADD(unit, amount, ts)`` (F2, App.java:65)."""
    c = F.col(ts) if isinstance(ts, str) else ts
    return F.timestamp_add(unit, F.lit(amount), c)
