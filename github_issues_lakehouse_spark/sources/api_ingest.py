"""GitHub REST API ingestion — the reference pipeline's entry point
(reference ingest.py:45-126 behavior parity): cursor pagination via
the ``Link`` response header, bearer-token auth, server-side ``since``
(UPDATED-time) filtering, client-side ``created_from`` (CREATED-time)
filtering, clean stop on HTTP 422, and pull-request exclusion (the
issues endpoint interleaves PRs; any item carrying a ``pull_request``
key is dropped).

Deliberately DRIVER-SIDE: the GitHub API is one rate-limited endpoint
with an opaque cursor — there is nothing to distribute. Spark takes
over at the bronze JSONL boundary this module writes; everything
downstream (silver merge, gold marts) is distributed.

The HTTP client is injected (any ``requests.Session``-compatible
object with ``.get(url, headers=..., params=..., timeout=...)``), so
the pager is fully unit-testable offline and the sandbox needs no
network or the ``requests`` package to exercise it.
"""

from __future__ import annotations

import json
from collections.abc import Iterator
from pathlib import Path

USER_AGENT = "github-issues-lakehouse-spark"


def _headers(token: str | None) -> dict[str, str]:
    h = {"Accept": "application/vnd.github+json", "User-Agent": USER_AGENT}
    if token:
        h["Authorization"] = f"Bearer {token}"
    return h


def _created_at_utc(item: dict) -> str | None:
    # GitHub timestamps are ISO-8601 Zulu ("2020-01-31T12:00:00Z");
    # normalizing Z -> +00:00 lets plain string compare order them,
    # so no datetime parsing of every row is needed.
    v = item.get("created_at")
    return v.replace("Z", "+00:00") if isinstance(v, str) else None


def iter_issue_pages(
    session,
    owner: str,
    repo: str,
    *,
    token: str | None = None,
    per_page: int = 100,
    since: str | None = None,
    base_url: str = "https://api.github.com",
    timeout: int = 60,
) -> Iterator[list[dict]]:
    """Yield pages of raw issue dicts, following the ``Link: rel=next``
    cursor until it runs out. First request carries the query params;
    follow-ups use the opaque next URL verbatim (it embeds the
    cursor). A 422 response (page window exhausted / bad filter)
    terminates cleanly; other HTTP errors raise."""
    headers = _headers(token)
    params: dict = {"state": "all", "per_page": per_page}
    if since:
        params["since"] = since  # server filters by UPDATED time
    next_url: str | None = f"{base_url}/repos/{owner}/{repo}/issues"
    first = True
    while next_url:
        if first:
            resp = session.get(next_url, headers=headers, params=params, timeout=timeout)
            first = False
        else:
            resp = session.get(next_url, headers=headers, timeout=timeout)
        if getattr(resp, "status_code", 200) == 422:
            return
        resp.raise_for_status()
        items = resp.json()
        if not items:
            return
        yield items
        next_url = resp.links.get("next", {}).get("url")


def fetch_issues_jsonl(
    session,
    owner: str,
    repo: str,
    out_file: str,
    *,
    token: str | None = None,
    per_page: int = 100,
    since: str | None = None,
    created_from: str | None = None,
    base_url: str = "https://api.github.com",
) -> int:
    """Page the issues endpoint into a bronze JSONL file (one raw API
    item per line — the exact payload shape the local ``--input`` path
    ingests). PRs are excluded; ``created_from`` (ISO date or
    datetime, UTC) drops issues created before it client-side, since
    the API can only filter on updated time. Returns rows written."""
    cf = None
    if created_from:
        cf = created_from.replace("Z", "+00:00")
        if "T" not in cf:
            cf = f"{cf}T00:00:00+00:00"
    n = 0
    out = Path(out_file)
    out.parent.mkdir(parents=True, exist_ok=True)
    with open(out, "w", encoding="utf-8") as f:
        for page in iter_issue_pages(
            session,
            owner,
            repo,
            token=token,
            per_page=per_page,
            since=since,
            base_url=base_url,
        ):
            for item in page:
                if "pull_request" in item:
                    continue
                if cf is not None:
                    created = _created_at_utc(item)
                    if created is not None and created < cf:
                        continue
                f.write(json.dumps(item, ensure_ascii=False) + "\n")
                n += 1
    return n


def default_session():
    """A real ``requests.Session`` when the package is available; the
    sandbox (and unit tests) inject a stub instead."""
    import requests

    return requests.Session()
