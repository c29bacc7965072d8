"""Fetch → land-raw → read lifecycle tests (SURVEY.md §3.1, §2.8 O3).

No network in the sandbox: retries are exercised with an injectable
opener, the end-to-end path with file:// URLs over golden payloads.
"""

from __future__ import annotations

import json

import pytest

from chchfr_data_collection_spark.sources.fetch import (
    FetchError,
    collect_all_sources,
    fetch_json,
    land_payload,
)
from chchfr_data_collection_spark.sources.specs import BP_SPEC, MOBIL_SPEC

from test_sources import BP_PAYLOAD, MOBIL_PAYLOAD


def test_fetch_retries_then_succeeds():
    calls = []

    def flaky(url, timeout):
        calls.append(url)
        if len(calls) < 3:
            raise OSError("connection reset")
        return BP_PAYLOAD.encode()

    naps = []
    out = fetch_json("http://x/stations", opener=flaky, sleep=naps.append)
    assert json.loads(out) == json.loads(BP_PAYLOAD)
    assert len(calls) == 3
    assert naps == [0.5, 1.0]  # exponential backoff between attempts


def test_fetch_exhausts_retry_budget():
    def always_down(url, timeout):
        raise OSError("refused")

    with pytest.raises(FetchError, match="after 5 attempts"):
        fetch_json("http://x/stations", opener=always_down, sleep=lambda s: None)


def test_fetch_garbage_200_is_retryable():
    """A 200 response that is not JSON counts as a failed attempt (the
    reference's KeyError => task retry), not a success."""
    bodies = [b"<html>rate limited</html>", BP_PAYLOAD.encode()]

    def srv(url, timeout):
        return bodies.pop(0)

    out = fetch_json("http://x/stations", opener=srv, sleep=lambda s: None)
    assert json.loads(out) == json.loads(BP_PAYLOAD)


def test_land_payload_idempotent_and_atomic(tmp_path):
    p1 = land_payload(BP_PAYLOAD, str(tmp_path), "bp", "2026-01-01")
    p2 = land_payload(BP_PAYLOAD, str(tmp_path), "bp", "2026-01-01")
    assert p1 == p2  # same batch_id => same immutable path, no dup landings
    assert "batch=2026-01-01" in p1
    assert json.loads(open(p1).read()) == json.loads(BP_PAYLOAD)


def test_collect_all_sources_file_urls(spark, tmp_path):
    """End-to-end over file:// URLs: fetch both dialects, land them,
    read conformed + priority-deduped through the distributed path."""
    bp_file = tmp_path / "bp_api.json"
    bp_file.write_text(BP_PAYLOAD)
    mobil_file = tmp_path / "mobil_api.json"
    mobil_file.write_text(MOBIL_PAYLOAD)
    landing = tmp_path / "landing"
    out = collect_all_sources(
        spark,
        [(BP_SPEC, bp_file.as_uri()), (MOBIL_SPEC, mobil_file.as_uri())],
        str(landing),
        batch_id="b1",
    )
    rows = out.collect()
    assert len(rows) >= 2
    assert {r.source for r in rows} <= {"bp", "mobil"}
    # landed raw files exist where the reader found them
    assert (landing / "bp" / "batch=b1" / "payload.json").exists()
    assert (landing / "mobil" / "batch=b1" / "payload.json").exists()
