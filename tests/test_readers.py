"""Bronze JSONL reader semantics (reference ingest.py:85-126):
pull-request exclusion, created_from filtering, label extraction,
timestamp parsing."""

import json
import shutil
import tempfile

import pytest

from github_issues_lakehouse_spark.sources.readers import read_jsonl_issues

ISSUES = [
    {
        "id": 1,
        "number": 101,
        "state": "closed",
        "title": "crash on load",
        "body": "stack trace ...",
        "created_at": "2024-01-05T10:00:00Z",
        "updated_at": "2024-01-06T10:00:00Z",
        "closed_at": "2024-01-07T10:00:00Z",
        "labels": [{"name": "Bug"}, {"name": "component: io"}],
    },
    {
        "id": 2,
        "number": 102,
        "state": "open",
        "title": "add docs",
        "body": None,
        "created_at": "2023-12-01T00:00:00Z",
        "updated_at": "2023-12-02T00:00:00Z",
        "closed_at": None,
        "labels": [{"name": "Docs"}],
    },
    {
        # pull request: must be excluded
        "id": 3,
        "number": 103,
        "state": "open",
        "title": "a PR",
        "body": "",
        "created_at": "2024-02-01T00:00:00Z",
        "updated_at": "2024-02-01T00:00:00Z",
        "closed_at": None,
        "labels": [],
        "pull_request": {"url": "https://example.invalid/pr/103"},
    },
]


@pytest.fixture()
def jsonl_path():
    d = tempfile.mkdtemp(prefix="bronze_test_")
    p = f"{d}/issues_run1.jsonl"
    with open(p, "w") as f:
        for row in ISSUES:
            f.write(json.dumps(row) + "\n")
    yield p
    shutil.rmtree(d, ignore_errors=True)


def test_pull_requests_excluded(spark, jsonl_path):
    df = read_jsonl_issues(spark, jsonl_path)
    ids = {r.issue_id for r in df.collect()}
    assert ids == {1, 2}


def test_created_from_filter(spark, jsonl_path):
    df = read_jsonl_issues(spark, jsonl_path, created_from="2024-01-01")
    ids = {r.issue_id for r in df.collect()}
    assert ids == {1}


def test_labels_and_timestamps(spark, jsonl_path):
    rows = {r.issue_id: r for r in read_jsonl_issues(spark, jsonl_path).collect()}
    assert rows[1].labels == ["Bug", "component: io"]
    assert rows[1].closed_at is not None and rows[2].closed_at is None
    assert rows[1].created_at.year == 2024


def test_keep_pull_requests_flag(spark, jsonl_path):
    df = read_jsonl_issues(spark, jsonl_path, exclude_pull_requests=False)
    assert df.count() == 3
