"""Cost-escalating fetch policy (SURVEY S22 / §4: scraper selection
basic → proxy → proxy+JS with cached choice and periodic re-probe,
news_articles_ingest_get_paper/main.py:62-91).

Pure-policy implementation: ``EscalatingFetcher`` tries tiers in cost
order, remembers the cheapest tier that worked per site, and re-probes
from tier 0 after ``reprobe_after`` successes (the reference re-probes
weekly; a count is deterministic and testable — callers can pass a
clock-based policy instead).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence
from typing import Any


class EscalatingFetcher:
    """Try fetch tiers cheapest-first; cache the winning tier per key."""

    def __init__(
        self,
        tiers: Sequence[tuple[str, Callable[[str], Any]]],
        reprobe_after: int = 50,
    ):
        self.tiers = list(tiers)
        self.reprobe_after = reprobe_after
        self._choice: dict[str, int] = {}
        self._since_probe: dict[str, int] = {}

    def tier_for(self, key: str) -> str | None:
        idx = self._choice.get(key)
        return self.tiers[idx][0] if idx is not None else None

    def fetch(self, key: str, request: str) -> tuple[str, Any]:
        """Returns (tier_name, result). Raises the last tier's error if
        every tier fails. Escalation state is per ``key`` (site)."""
        start = self._choice.get(key, 0)
        if self._since_probe.get(key, 0) >= self.reprobe_after:
            start = 0
            self._since_probe[key] = 0
        last_err: Exception | None = None
        for idx in range(start, len(self.tiers)):
            name, fn = self.tiers[idx]
            try:
                result = fn(request)
            except Exception as e:  # noqa: BLE001 — policy layer passes through
                last_err = e
                continue
            self._choice[key] = idx
            self._since_probe[key] = self._since_probe.get(key, 0) + 1
            return name, result
        assert last_err is not None
        raise last_err
