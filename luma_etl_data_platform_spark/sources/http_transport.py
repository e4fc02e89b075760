"""Concrete HTTP transport for the REST lake source.

``HttpLakeTransport`` is the real-network implementation of
``rest_lake.LakeTransport``, reproducing the reference client's wire
behavior (reference: datalakewrapper.py:69-102 split/list GETs with a
URL-encoded filter and a Bearer token; fsmwrapper.py:30-44,92-103
``_links`` next-href pagination with wraparound detection;
fsmwrapper.py:166-178 per-id object fetch; non-200 → raise,
datalakewrapper.py:83-84):

- every request carries ``Authorization: Bearer <token>`` from an
  injected ``TokenProvider`` (90%-TTL proactive refresh, oauth.py);
- transient statuses (429/5xx) and connection errors retry with
  exponential backoff; other non-200s raise with the response body;
- the list endpoint returns ``[header, record...]`` where the header
  carries ``_count`` and ``_links`` — the next page is the ``next``
  link resolved against the current URL, surfaced as the page token
  so ``LakeTransport.list_objects``'s wraparound guard applies;
- the raw HTTP GET is injectable (``get_fn(url, headers, timeout) →
  (status, body_bytes)``) so every code path is testable offline; the
  default is a thin ``requests`` call.

Picklable (executors run ``fetch_object``): the transport holds only
plain data + picklable callables.
"""

from __future__ import annotations

import json
import time
import urllib.parse
from dataclasses import dataclass
from typing import Callable

from .oauth import TokenProvider
from .rest_lake import DEFAULT_BATCH_SIZE, LakeObject, LakeTransport

RETRY_STATUSES = frozenset({429, 500, 502, 503, 504})


def requests_get(url: str, headers: dict, timeout: float) -> tuple[int, bytes]:
    """Default ``get_fn``: one GET via requests. Import-gated so the
    module (and every injected-transport test) works without the
    library installed."""
    try:
        import requests
    except ImportError as ex:  # pragma: no cover
        raise RuntimeError(
            "HttpLakeTransport needs the 'requests' library (or an "
            "injected get_fn)") from ex
    resp = requests.get(url, headers=headers, timeout=timeout)
    return resp.status_code, resp.content


@dataclass(frozen=True)
class LakeEndpoints:
    """URL templates for one deployment. ``{filter}`` / ``{num_records}``
    / ``{id}`` are substituted per call; the filter is URL-quoted and
    parenthesized exactly like the reference's query builder
    (datalakewrapper.py:73-75)."""

    split_url: str    # .format(filter=...)
    list_url: str     # .format(filter=..., num_records=...)
    object_url: str   # .format(id=...)

    def for_split(self, doc_filter: str) -> str:
        return self.split_url.format(
            filter=f"({urllib.parse.quote(doc_filter)})")

    def for_list(self, chunk_filter: str, batch_size: int) -> str:
        return self.list_url.format(
            filter=f"({urllib.parse.quote(chunk_filter)})",
            num_records=batch_size)

    def for_object(self, object_id: str) -> str:
        return self.object_url.format(id=urllib.parse.quote(object_id))


class HttpLakeTransport(LakeTransport):
    def __init__(self, endpoints: LakeEndpoints, tokens: TokenProvider,
                 get_fn: Callable[[str, dict, float], tuple[int, bytes]] = requests_get,
                 timeout: float = 60.0, max_retries: int = 3,
                 backoff_seconds: float = 0.5,
                 sleep_fn: Callable[[float], None] = time.sleep):
        self.endpoints = endpoints
        self.tokens = tokens
        self.get_fn = get_fn
        self.timeout = timeout
        self.max_retries = max_retries
        self.backoff_seconds = backoff_seconds
        self.sleep_fn = sleep_fn

    # ------------------------------------------------------------- wire
    def _get(self, url: str) -> bytes:
        last_err: str | None = None
        for attempt in range(self.max_retries + 1):
            if attempt:
                self.sleep_fn(self.backoff_seconds * (2 ** (attempt - 1)))
            headers = {"Authorization": f"Bearer {self.tokens.get()}"}
            try:
                status, body = self.get_fn(url, headers, self.timeout)
            except Exception as ex:  # connection-level failure: retry
                last_err = f"{type(ex).__name__}: {ex}"
                continue
            if status == 200:
                return body
            last_err = f"HTTP {status}: {body[:500].decode('utf-8', 'replace')}"
            if status not in RETRY_STATUSES:
                break
        raise RuntimeError(f"GET {url} failed after "
                           f"{self.max_retries + 1} attempts — {last_err}")

    # ------------------------------------------------- LakeTransport API
    def query_split(self, doc_filter: str) -> list[str]:
        return list(json.loads(self._get(
            self.endpoints.for_split(doc_filter)).decode("utf-8")))

    def list_objects_page(self, chunk_filter: str, page_token: str | None,
                          batch_size: int = DEFAULT_BATCH_SIZE
                          ) -> tuple[list[LakeObject], str | None]:
        url = page_token or self.endpoints.for_list(chunk_filter, batch_size)
        payload = json.loads(self._get(url).decode("utf-8"))
        if not payload:
            return [], None
        header, records = payload[0], payload[1:]
        objs = [LakeObject(str(rec["dl_id"]),
                           int(rec.get("dl_instance_count", 1)))
                for rec in records]
        return objs, _next_url(url, header)

    def fetch_object(self, object_id: str) -> str:
        return self._get(
            self.endpoints.for_object(object_id)).decode("utf-8")


def _next_url(current_url: str, header: dict) -> str | None:
    """Next-page URL from the header's ``_links``: prefer the entry
    with ``rel == 'next'``, else the reference's positional second
    link (fsmwrapper.py:38-39); ``../``-relative hrefs resolve against
    the current URL. An empty page (``_count == 0``) or absent link
    ends pagination."""
    if int(header.get("_count", 0) or 0) == 0:
        return None
    links = header.get("_links") or []
    href = None
    for link in links:
        if link.get("rel") == "next":
            href = link.get("href")
            break
    if href is None and len(links) > 1:
        href = links[1].get("href")
    if not href:
        return None
    return urllib.parse.urljoin(current_url, href)
