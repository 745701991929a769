"""GitHub API pager (reference ingest.py:45-126 behavior) against a
stubbed HTTP session: Link-header cursor pagination, token auth,
since/created_from filters, 422 clean-stop, PR exclusion — and parity
with the local-JSONL bronze contract."""

import json

import pytest

from github_issues_lakehouse_spark.sources.api_ingest import (
    fetch_issues_jsonl,
    iter_issue_pages,
)


def _issue(i, created="2024-01-05T10:00:00Z", pr=False):
    item = {
        "id": i,
        "number": 100 + i,
        "state": "open",
        "title": f"issue {i}",
        "body": "b",
        "created_at": created,
        "updated_at": created,
        "closed_at": None,
        "labels": [{"name": "Bug"}],
    }
    if pr:
        item["pull_request"] = {"url": f"https://example.invalid/pr/{i}"}
    return item


class FakeResponse:
    def __init__(self, items, next_url=None, status=200, text=""):
        self.status_code = status
        self.text = text
        self._items = items
        self.links = {"next": {"url": next_url}} if next_url else {}

    def raise_for_status(self):
        if self.status_code >= 400:
            raise RuntimeError(f"HTTP {self.status_code}")

    def json(self):
        return self._items


class FakeSession:
    """Serves scripted responses keyed by URL; records every request."""

    def __init__(self, script):
        self.script = script
        self.calls = []

    def get(self, url, headers=None, params=None, timeout=None):
        self.calls.append({"url": url, "headers": headers, "params": params})
        return self.script[url]


BASE = "https://api.github.com/repos/acme/widgets/issues"


def test_pagination_follows_link_cursor(tmp_path):
    sess = FakeSession(
        {
            BASE: FakeResponse([_issue(1), _issue(2, pr=True)], next_url=f"{BASE}?page=2"),
            f"{BASE}?page=2": FakeResponse([_issue(3)], next_url=f"{BASE}?page=3"),
            f"{BASE}?page=3": FakeResponse([]),
        }
    )
    out = str(tmp_path / "issues_r1.jsonl")
    n = fetch_issues_jsonl(sess, "acme", "widgets", out, token="tok-xyz", since="2024-01-01T00:00:00Z")
    assert n == 2  # PR excluded
    # first call carries params; cursor follow-ups must NOT re-send them
    assert sess.calls[0]["params"] == {"state": "all", "per_page": 100, "since": "2024-01-01T00:00:00Z"}
    assert sess.calls[1]["params"] is None and sess.calls[1]["url"] == f"{BASE}?page=2"
    assert len(sess.calls) == 3
    # auth + API headers on every request
    for c in sess.calls:
        assert c["headers"]["Authorization"] == "Bearer tok-xyz"
        assert c["headers"]["Accept"] == "application/vnd.github+json"
    ids = [json.loads(line)["id"] for line in open(out)]
    assert ids == [1, 3]


def test_422_stops_cleanly_keeping_prior_pages(tmp_path):
    sess = FakeSession(
        {
            BASE: FakeResponse([_issue(1)], next_url=f"{BASE}?page=2"),
            f"{BASE}?page=2": FakeResponse(None, status=422, text="window exhausted"),
        }
    )
    out = str(tmp_path / "issues_r1.jsonl")
    assert fetch_issues_jsonl(sess, "acme", "widgets", out) == 1


def test_http_error_raises():
    sess = FakeSession({BASE: FakeResponse(None, status=500)})
    with pytest.raises(RuntimeError, match="HTTP 500"):
        list(iter_issue_pages(sess, "acme", "widgets"))


def test_created_from_filters_client_side(tmp_path):
    sess = FakeSession(
        {
            BASE: FakeResponse(
                [
                    _issue(1, created="2023-12-31T23:59:59Z"),
                    _issue(2, created="2024-01-01T00:00:00Z"),
                    _issue(3, created="2024-06-01T00:00:00Z"),
                ]
            )
        }
    )
    out = str(tmp_path / "issues_r1.jsonl")
    n = fetch_issues_jsonl(sess, "acme", "widgets", out, created_from="2024-01-01")
    assert n == 2
    assert [json.loads(x)["id"] for x in open(out)] == [2, 3]


def test_api_bronze_matches_local_bronze_contract(spark, tmp_path):
    """The API pager's output file is byte-for-byte the same bronze
    payload shape the local --input path ingests: read_jsonl_issues
    parses both to identical typed rows."""
    from github_issues_lakehouse_spark.sources.readers import read_jsonl_issues

    items = [_issue(1), _issue(2, created="2024-02-01T00:00:00Z"), _issue(9, pr=True)]
    sess = FakeSession({BASE: FakeResponse(items)})
    api_out = str(tmp_path / "api" / "issues_r1.jsonl")
    fetch_issues_jsonl(sess, "acme", "widgets", api_out)

    local_out = str(tmp_path / "local_issues.jsonl")
    with open(local_out, "w") as f:
        for it in items:
            f.write(json.dumps(it, ensure_ascii=False) + "\n")

    via_api = read_jsonl_issues(spark, api_out)
    via_local = read_jsonl_issues(spark, local_out)
    assert via_api.exceptAll(via_local).count() == 0
    assert via_local.exceptAll(via_api).count() == 0
    assert via_api.count() == 2


def test_cli_ingest_api_source(spark, tmp_path):
    """ingest --source api writes the bronze layout via an injected
    session and the silver step can consume it unchanged."""
    from github_issues_lakehouse_spark.cli import run_ingest

    cfg = tmp_path / "config.yml"
    cfg.write_text(
        "source:\n  repos:\n    - {owner: acme, repo: widgets}\n"
        "ingestion:\n  per_page: 50\n"
    )
    base = "https://api.github.com/repos/acme/widgets/issues"
    sess = FakeSession({base: FakeResponse([_issue(1), _issue(2)])})
    paths = run_ingest(
        str(cfg), str(tmp_path / "data"), source="api", run_id="r1", session=sess
    )
    assert sess.calls[0]["params"]["per_page"] == 50
    assert paths == [str(tmp_path / "data" / "bronze" / "acme__widgets" / "issues_r1.jsonl")]
    assert sum(1 for _ in open(paths[0])) == 2
