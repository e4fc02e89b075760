"""HttpLakeTransport: wire behavior against an injected fake HTTP
layer — auth header + 90%-TTL refresh, retry/backoff on transient
statuses, hard failure on 4xx, _links pagination with wraparound,
and end-to-end through the restlake DataSource."""

from __future__ import annotations

import json

import pytest

from luma_etl_data_platform_spark.sources.http_transport import (
    HttpLakeTransport, LakeEndpoints, _next_url,
)
from luma_etl_data_platform_spark.sources.oauth import TokenProvider

EP = LakeEndpoints(
    split_url="https://lake/api/split?filter={filter}",
    list_url="https://lake/api/list?filter={filter}&n={num_records}",
    object_url="https://lake/api/object/{id}",
)


class FakeHttp:
    """Picklable scripted HTTP layer: url-prefix → list of
    (status, body) responses, served in order (last repeats)."""

    def __init__(self, routes: dict[str, list[tuple[int, bytes]]]):
        self.routes = dict(routes)
        self.calls: list[tuple[str, str]] = []

    def __call__(self, url, headers, timeout):
        self.calls.append((url, headers.get("Authorization", "")))
        for prefix, responses in self.routes.items():
            if url.startswith(prefix):
                resp = responses[0]
                if len(responses) > 1:
                    responses.pop(0)
                return resp
        return 404, b"no route"


def _tokens(token="tok0"):
    return TokenProvider(lambda: {"access_token": token, "expires_in": 3600})


def _page(records, next_href=None):
    links = [{"rel": "self", "href": "x"}]
    if next_href:
        links.append({"rel": "next", "href": next_href})
    header = {"_count": len(records), "_links": links}
    return json.dumps([header] + records).encode()


def test_query_split_quotes_filter_and_sends_bearer():
    http = FakeHttp({"https://lake/api/split": [(200, b'["f1", "f2"]')]})
    t = HttpLakeTransport(EP, _tokens("abc"), get_fn=http)
    assert t.query_split("dl_document_name eq 'GL'") == ["f1", "f2"]
    url, auth = http.calls[0]
    assert "(dl_document_name%20eq%20%27GL%27)" in url
    assert auth == "Bearer abc"


def test_list_objects_follows_next_links_and_stops():
    p1 = _page([{"dl_id": "a", "dl_instance_count": 2}], next_href="list2")
    p2 = _page([{"dl_id": "b"}])
    http = FakeHttp({
        "https://lake/api/list2": [(200, p2)],
        "https://lake/api/list": [(200, p1)],
    })
    t = HttpLakeTransport(EP, _tokens(), get_fn=http)
    objs = t.list_objects("c0")
    assert [(o.dl_id, o.dl_instance_count) for o in objs] == [("a", 2), ("b", 1)]
    assert len(http.calls) == 2


def test_list_objects_wraparound_guard():
    # server loops back to the same next URL forever: the base-class
    # seen-token guard must stop after one revisit
    looping = _page([{"dl_id": "x"}], next_href="list?loop=1")
    http = FakeHttp({"https://lake/api/list": [(200, looping)]})
    t = HttpLakeTransport(EP, _tokens(), get_fn=http)
    objs = t.list_objects("c0")
    assert [o.dl_id for o in objs] == ["x", "x"]  # page served twice, then stop


def test_retry_on_transient_then_success():
    slept = []
    http = FakeHttp({"https://lake/api/object": [
        (503, b"busy"), (500, b"err"), (200, b'{"k": 1}')]})
    t = HttpLakeTransport(EP, _tokens(), get_fn=http,
                          sleep_fn=slept.append, backoff_seconds=0.5)
    assert t.fetch_object("o1") == '{"k": 1}'
    assert slept == [0.5, 1.0]  # exponential backoff


def test_no_retry_on_4xx():
    http = FakeHttp({"https://lake/api/object": [(403, b"denied")]})
    t = HttpLakeTransport(EP, _tokens(), get_fn=http, sleep_fn=lambda s: None)
    with pytest.raises(RuntimeError, match="HTTP 403"):
        t.fetch_object("o1")
    assert len(http.calls) == 1


def test_connection_errors_retry_then_raise():
    def boom(url, headers, timeout):
        raise ConnectionError("refused")
    t = HttpLakeTransport(EP, _tokens(), get_fn=boom,
                          max_retries=2, sleep_fn=lambda s: None)
    with pytest.raises(RuntimeError, match="refused"):
        t.fetch_object("o1")


def test_token_refreshes_at_90pct_ttl():
    clock = [0.0]
    n = [0]

    def fetch():
        n[0] += 1
        return {"access_token": f"tok{n[0]}", "expires_in": 100}

    tokens = TokenProvider(fetch, clock=lambda: clock[0])
    http = FakeHttp({"https://lake/api/object": [(200, b"ok")]})
    t = HttpLakeTransport(EP, tokens, get_fn=http)
    t.fetch_object("o1")
    clock[0] = 89.0
    t.fetch_object("o1")          # still inside 90% TTL → same token
    clock[0] = 90.0
    t.fetch_object("o1")          # ≥ 90% → proactive refresh
    auths = [a for _, a in http.calls]
    assert auths == ["Bearer tok1", "Bearer tok1", "Bearer tok2"]


def test_next_url_positional_fallback_and_relative_resolve():
    # reference clients take _links[1] when no rel=next is present
    header = {"_count": 1, "_links": [{"href": "self"},
                                      {"href": "../page/2"}]}
    assert _next_url("https://lake/api/list/1", header) == "https://lake/api/page/2"
    assert _next_url("https://lake/api/list/1", {"_count": 0}) is None


def test_transport_is_picklable_with_token_provider():
    import pickle
    t = HttpLakeTransport(EP, TokenProvider(fetch_stub),
                          get_fn=requests_get_stub)
    t2 = pickle.loads(pickle.dumps(t))
    assert t2.endpoints == EP
    # the revived provider re-authenticates (lock/token not shipped)
    assert t2.tokens.get() == "ptok"


# module-level: picklable (a real deployment's fetch_fn is a module
# function or functools.partial over one, same constraint)
def fetch_stub():
    return {"access_token": "ptok", "expires_in": 3600}


def requests_get_stub(url, headers, timeout):
    return 200, b"[]"


def test_restlake_datasource_end_to_end_over_http(spark):
    """The DataSource planning path (S1 split → S2 paged list) driven
    entirely through HttpLakeTransport against the scripted wire."""
    split = json.dumps(["dl_document_name eq 'GL' and chunk eq '0'"]).encode()
    listing = _page([{"dl_id": "GL-obj-0", "dl_instance_count": 2}])
    payload = b'{"id": "r1", "amount": "10"}\n{"id": "r2", "amount": "20"}'
    http = FakeHttp({
        "https://lake/api/split": [(200, split)],
        "https://lake/api/list": [(200, listing)],
        "https://lake/api/object": [(200, payload)],
    })
    t = HttpLakeTransport(EP, _tokens(), get_fn=http)
    reader = __import__(
        "luma_etl_data_platform_spark.sources.rest_lake",
        fromlist=["RestLakeReader"],
    ).RestLakeReader(
        spark.createDataFrame([("x", "y")], "id string, amount string").schema,
        t, "GL", frozenset())
    parts = reader.partitions()
    assert [p.object_ids for p in parts] == [["GL-obj-0"]]
    rows = list(reader.read(parts[0]))
    assert rows == [("r1", "10"), ("r2", "20")]
