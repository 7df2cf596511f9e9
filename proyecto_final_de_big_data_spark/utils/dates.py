"""Month/quarter-list resolution (reference F10/C3,
``src/utils/fechas.py:1-32``): every reference entry point starts by
normalizing exactly one of --month / --months / --quarter into a list
of zero-padded month strings. Driver-side utility — never touches Spark.
"""

from __future__ import annotations

QUARTER_MONTHS: dict[int, list[int]] = {
    1: [1, 2, 3],
    2: [4, 5, 6],
    3: [7, 8, 9],
    4: [10, 11, 12],
}


def normalize_month(month: int | str) -> str:
    """``7`` / ``"7"`` / ``"07"`` → ``"07"``; raises on non-int or out of 1-12."""
    try:
        m = int(month)
    except (TypeError, ValueError):
        raise ValueError(f"invalid month: {month!r}") from None
    if not 1 <= m <= 12:
        raise ValueError(f"month out of range 1-12: {month!r}")
    return f"{m:02d}"


def resolve_months(
    month: int | str | None = None,
    months: str | None = None,
    quarter: int | str | None = None,
) -> list[str]:
    """Exactly one selector → ordered list of ``"MM"`` strings.

    - ``month="3"`` → ``["03"]``
    - ``months="1,2, 11"`` → ``["01", "02", "11"]``
    - ``quarter=2`` → ``["04", "05", "06"]``

    Raises ``ValueError`` unless exactly one selector is given (the
    reference's mutual-exclusion contract, ``src/utils/fechas.py:12-14``).
    """
    given = [s is not None and str(s).strip() != "" for s in (month, months, quarter)]
    if sum(given) != 1:
        raise ValueError("exactly one of month / months / quarter must be given")

    if quarter is not None:
        try:
            q = int(quarter)
        except (TypeError, ValueError):
            raise ValueError(f"invalid quarter: {quarter!r}") from None
        if q not in QUARTER_MONTHS:
            raise ValueError(f"quarter out of range 1-4: {quarter!r}")
        return [normalize_month(m) for m in QUARTER_MONTHS[q]]

    if months is not None:
        parts = [p.strip() for p in str(months).split(",") if p.strip()]
        if not parts:
            raise ValueError("empty months list")
        return [normalize_month(p) for p in parts]

    return [normalize_month(month)]
