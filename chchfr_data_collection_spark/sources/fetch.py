"""Driver-side fetch → land-raw → read adapter (SURVEY.md §3.1 lifecycle).

The reference fetches each API inside the task process and transforms
in-memory (`get_remote_json()`, dag_collection_data_from_bp.py:25-35,
retried 5× by Airflow's task-retry policy). Here the lifecycle splits:

1. `fetch_json` — a thin driver/edge utility: GET with timeout +
   bounded exponential-backoff retries (the Spark twin of the Airflow
   retry budget; SURVEY.md §2.8 O3). The fetch is NOT a Spark job —
   API calls are rate-limited and tiny; distributing them buys nothing
   and couples executor scheduling to third-party latency.
2. `land_payload` — the payload lands IMMUTABLY in a landing zone,
   one timestamped JSON document per fetch. Raw-before-transform means
   any conformance bug is replayable from bytes, and the landing dir is
   the natural streaming-source boundary (readStream over it).
3. `read_conformed(spark, spec, path=...)` — the existing distributed
   read with explicit schema (sources/json_source.py) picks the files
   up; nothing below this line is driver-side.

No network exists in the test sandbox, so tests exercise the retry and
landing logic through `file://` URLs and an injectable opener — the
HTTP specifics live entirely in the standard library.
"""

from __future__ import annotations

import json
import os
import time
import urllib.request
from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession

from .specs import SourceSpec


class FetchError(RuntimeError):
    """All retries exhausted (or a non-retryable payload error)."""


#: 4xx statuses that are still worth retrying: request-timeout and
#: rate-limit are transient by definition; everything else in 4xx is a
#: deterministic client error (bad URL, bad key) that no retry can fix.
_RETRYABLE_4XX = frozenset({408, 429})


def _is_permanent(exc: Exception) -> bool:
    """True for deterministic failures no retry budget can fix:
    HTTP 4xx (except 408/429). 5xx, network resets, timeouts, and
    JSON-garbage payloads all stay retryable."""
    code = getattr(exc, "code", None)  # urllib.error.HTTPError
    return isinstance(code, int) and 400 <= code < 500 and code not in _RETRYABLE_4XX


def fetch_json(
    url: str,
    retries: int = 5,
    backoff_s: float = 0.5,
    timeout_s: float = 10.0,
    opener: Callable[[str, float], bytes] | None = None,
    sleep: Callable[[float], None] = time.sleep,
) -> str:
    """GET a JSON document with bounded exponential-backoff retries.

    Mirrors the reference's fetch + Airflow retry budget (5 tries).
    Returns the raw text (NOT parsed rows — parsing/validation is
    Spark's job, with an explicit schema). A payload that is not valid
    JSON at all counts as a failed attempt: the reference's KeyError ⇒
    task-retry behavior, without re-fetching forever on a 200-with-
    garbage endpoint.
    """

    def default_opener(u: str, t: float) -> bytes:
        with urllib.request.urlopen(u, timeout=t) as resp:  # noqa: S310
            return resp.read()

    get = opener or default_opener
    last_err: Exception | None = None
    for attempt in range(retries):
        try:
            text = get(url, timeout_s).decode("utf-8")
            json.loads(text)  # validate it parses; content schema is Spark's job
            return text
        except Exception as exc:
            last_err = exc
            if _is_permanent(exc):
                raise FetchError(f"permanent failure ({exc}): {url}") from exc
            if attempt < retries - 1:
                sleep(backoff_s * (2**attempt))
    raise FetchError(f"fetch failed after {retries} attempts: {url}") from last_err


def fetch_json_paginated(
    url: str,
    page_token_param: str = "pagetoken",
    token_key: str = "next_page_token",
    max_pages: int = 10,
    **fetch_kwargs,
) -> list[str]:
    """Follow Google-Places-style `next_page_token` pagination, returning
    the raw text of each page (parity-plus: the reference issues a single
    GET, dag_collection_data_from_z.py:44-48, and silently truncates at
    the API's 20-result first page).

    Each page fetch gets the full bounded-retry budget of `fetch_json`;
    `max_pages` bounds the loop so a server echoing a token forever
    cannot spin us — hitting the bound with a token still present raises
    (silent truncation would be indistinguishable from completion)."""
    pages: list[str] = []
    token: str | None = None
    for _ in range(max_pages):
        u = (
            url
            if token is None
            else f"{url}{'&' if '?' in url else '?'}{page_token_param}={token}"
        )
        text = fetch_json(u, **fetch_kwargs)
        pages.append(text)
        nxt = json.loads(text).get(token_key)
        token = nxt if isinstance(nxt, str) and nxt else None
        if token is None:
            return pages
    raise FetchError(
        f"pagination still yielding {token_key} after max_pages={max_pages}: {url}"
    )


def land_payload(payload: str, landing_dir: str, source: str, batch_id: str) -> str:
    """Write one fetched payload immutably into the landing zone.

    Layout: ``{landing_dir}/{source}/batch={batch_id}/payload.json`` —
    partition-style directories so a reader (batch or readStream) can
    prune by source/batch, and a re-fetch of the same batch_id is an
    idempotent overwrite of the same path (no duplicate landings).
    """
    d = os.path.join(landing_dir, source, f"batch={batch_id}")
    os.makedirs(d, exist_ok=True)
    path = os.path.join(d, "payload.json")
    tmp = path + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        f.write(payload)
    os.replace(tmp, path)  # atomic on POSIX: readers never see half a payload
    return path


def collect_source(
    spark: SparkSession,
    spec: SourceSpec,
    url: str,
    landing_dir: str,
    batch_id: str,
    **fetch_kwargs,
) -> DataFrame:
    """fetch → land → distributed conform, for one source.

    The returned DataFrame reads from the LANDED file (not the in-memory
    string): the landing zone is the source of truth, and the same path
    replays through the identical plan."""
    from .json_source import read_conformed

    payload = fetch_json(url, **fetch_kwargs)
    path = land_payload(payload, landing_dir, spec.name, batch_id)
    return read_conformed(spark, spec, path=path)


def collect_all_sources(
    spark: SparkSession,
    specs_with_urls: Sequence[tuple[SourceSpec, str]],
    landing_dir: str,
    batch_id: str,
    **fetch_kwargs,
) -> DataFrame:
    """The four collector DAGs as one driver loop: fetch+land each
    source (per-source failures propagate — a failed source fails the
    batch, like the reference's per-DAG retry-then-fail), then one
    unioned, priority-deduped conformed frame."""
    from ..operators.ingest import union_sources_with_priority

    frames = [
        collect_source(spark, spec, url, landing_dir, batch_id, **fetch_kwargs)
        for spec, url in specs_with_urls
    ]
    return union_sources_with_priority(frames)
