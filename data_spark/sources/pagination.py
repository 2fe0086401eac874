"""Pagination cursor state machines (SURVEY S13-S19).

Each generator yields (rows, cursor) pairs; the cursor dict is
everything needed to resume — persist it to a control table between
runs (the reference keeps these in Firestore docs). ``fetch`` is
injected so connectors are testable offline and rate-limit/retry policy
stays caller-side.

Reference disciplines mapped:
  keyset_pages      — FEC schedule_a: sort key + last_index resume
                      (federal_fec_ingest_get_receipts/main.py:34-46,94-167)
  page_number_pages — FEC financials: page counter until short page
                      (…get_financials/main.py:27-88)
  offset_pages      — House clerk deep offsets 0..9800 step N
                      (house…get_disclosures/main.py:160-213)
  timeline_pages    — Twitter since_id/until_id bidirectional walk
                      (twitter_ingest_get_timeline/main.py:39-111)
  token_pages       — Facebook ads `after` token
                      (facebook_ingest_get_ads/main.py:118-166)
(count-resume, S16, is page_number_pages with start_page=count//size.)
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Any

Rows = list[dict[str, Any]]
Cursor = dict[str, Any]


def keyset_pages(
    fetch: Callable[[Cursor], tuple[Rows, Any]],
    cursor: Cursor | None = None,
    max_pages: int | None = None,
) -> Iterator[tuple[Rows, Cursor]]:
    """Keyset pagination: fetch(cursor) → (rows, last_key); resumes from
    cursor['last_key']. Stops on empty page."""
    cursor = dict(cursor or {"last_key": None})
    pages = 0
    while max_pages is None or pages < max_pages:
        rows, last_key = fetch(cursor)
        if not rows:
            break
        cursor = {"last_key": last_key}
        pages += 1
        yield rows, dict(cursor)


def page_number_pages(
    fetch: Callable[[int], Rows],
    page_size: int,
    start_page: int = 1,
    max_pages: int | None = None,
) -> Iterator[tuple[Rows, Cursor]]:
    """Page-number pagination; a short page (<page_size) is the last.
    Resume by passing start_page (count-resume: processed_count // size + 1)."""
    page = start_page
    pages = 0
    while max_pages is None or pages < max_pages:
        rows = fetch(page)
        if not rows:
            break
        yield rows, {"next_page": page + 1}
        if len(rows) < page_size:
            break
        page += 1
        pages += 1


def offset_pages(
    fetch: Callable[[int], Rows],
    step: int,
    max_offset: int,
    start_offset: int = 0,
) -> Iterator[tuple[Rows, Cursor]]:
    """Deep-offset enumeration with a hard cap (the House clerk API
    stops serving past 9,900; the cap is part of the discipline)."""
    for offset in range(start_offset, max_offset + 1, step):
        rows = fetch(offset)
        if not rows:
            break
        yield rows, {"next_offset": offset + step}
        if len(rows) < step:
            break


def timeline_pages(
    fetch: Callable[[Cursor], Rows],
    id_of: Callable[[dict], int],
    cursor: Cursor | None = None,
    max_pages: int | None = None,
) -> Iterator[tuple[Rows, Cursor]]:
    """Bidirectional timeline walk: first drain BACKWARD from the oldest
    known id (until_id) to the history end, then poll FORWARD from the
    newest (since_id). Cursor: {min_id, max_id, direction, end}.

    fetch receives the cursor and must interpret direction
    ('backward' → until_id=min_id, 'forward' → since_id=max_id).
    """
    cur: Cursor = dict(cursor or {"min_id": None, "max_id": None, "direction": "backward", "end": False})
    pages = 0
    while max_pages is None or pages < max_pages:
        rows = fetch(dict(cur))
        if not rows:
            if cur["direction"] == "backward":
                # history drained: flip to forward polling; surface the
                # flipped cursor as an empty page so callers persist end=True
                cur["direction"] = "forward"
                cur["end"] = True
                yield [], dict(cur)
                continue
            break
        ids = [id_of(r) for r in rows]
        cur["min_id"] = min(ids) if cur["min_id"] is None else min(cur["min_id"], *ids)
        cur["max_id"] = max(ids) if cur["max_id"] is None else max(cur["max_id"], *ids)
        pages += 1
        yield rows, dict(cur)


def token_pages(
    fetch: Callable[[str | None], tuple[Rows, str | None]],
    cursor: Cursor | None = None,
    max_pages: int | None = None,
) -> Iterator[tuple[Rows, Cursor]]:
    """Opaque-token pagination: fetch(after_token) → (rows, next_token);
    next_token None ⇒ done."""
    token = (cursor or {}).get("after")
    pages = 0
    while max_pages is None or pages < max_pages:
        rows, token = fetch(token)
        if rows:
            yield rows, {"after": token}
        if token is None or not rows:
            break
        pages += 1
