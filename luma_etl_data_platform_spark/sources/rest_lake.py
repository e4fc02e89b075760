"""REST data-lake source, rebuilt as a PySpark custom DataSource.

The reference extracts "business classes" from an ERP data-lake REST
API in three steps (reference: datalakewrapper.py):

- S1 split-query partition enumeration (datalakewrapper.py:69-86):
  ask the API for a set of query filters that partition a class;
- S2 object-properties listing (datalakewrapper.py:88-102): page
  object descriptors (id + instance count) per chunk;
- S3/S4 per-id JSON-lines fetch + decode (datalakewrapper.py:164-178,
  utilities/utilities.py:657-660).

Here that is a ``pyspark.sql.datasource.DataSource``: partition
planning happens on the driver via the same split-query call, and
each Spark task fetches + parses its chunk's objects — the
reference's serial per-id loop (datalakewrapper.py:283-297) becomes
embarrassingly parallel across executors. Document-name/property
filters are pushed into the API query string exactly like the
reference's pushdown builder (utilities/utilities.py:226-238).

Transport is injected (``LakeTransport``). The real network client is
``http_transport.HttpLakeTransport`` (requests-backed, Bearer auth,
retry/backoff, ``_links`` pagination); ``FakeLakeTransport`` is a
deterministic in-memory lake used by tests and demos. OAuth
token lifecycle (reference: oauth/datalakeoauth.py:125-229, refresh
at 90% TTL) is implemented for real in ``oauth.py`` with an
injectable fetcher/clock.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)
from pyspark.sql.types import StructType

DEFAULT_BATCH_SIZE = 10_000  # reference: datalakewrapper.py:88

# the reference's pushdown-builder operator set
# (utilities/utilities.py:226-238 builds "prop op 'value'"; the
# _lplFilter theta filter at fsmwrapper.py:169,180-189 is the same
# grammar with symbolic operators)
_PUSH_OPS: dict[type, str] = {
    EqualTo: "eq",
    GreaterThan: "gt",
    GreaterThanOrEqual: "ge",
    LessThan: "lt",
    LessThanOrEqual: "le",
}


def _filter_to_clause(f: Filter) -> str | None:
    """Translate a Catalyst filter into the reference's lake-API
    filter grammar ``prop op 'value'``; None when untranslatable
    (nested column, unsupported op, or a value the naive grammar
    cannot quote)."""
    op = _PUSH_OPS.get(type(f))
    if op is None:
        return None
    path = f.attribute
    if len(path) != 1:           # no nested-field grammar in the API
        return None
    v = f.value
    if isinstance(v, bool) or v is None:
        return None
    if isinstance(v, str):
        if "'" in v:             # the grammar has no quote escaping
            return None
        val = v
    elif isinstance(v, (int, float)):
        val = str(v)
    else:
        return None
    return f"{path[0]} {op} '{val}'"


# ---------------------------------------------------------------------------
# transport layer
# ---------------------------------------------------------------------------

@dataclass
class LakeObject:
    dl_id: str
    dl_instance_count: int


class LakeTransport:
    """What a concrete REST client must provide. All methods run on
    the driver except ``fetch_object``, which runs inside tasks and
    must be picklable."""

    def query_split(self, doc_filter: str) -> list[str]:
        raise NotImplementedError

    def list_objects_page(self, chunk_filter: str, page_token: str | None,
                          batch_size: int = DEFAULT_BATCH_SIZE
                          ) -> tuple[list[LakeObject], str | None]:
        """One page of object descriptors + the next-page token (None
        when exhausted) — the reference follows ``_links`` next-href
        pagination (fsmwrapper.py:38-39, 92-103)."""
        raise NotImplementedError

    def list_objects(self, chunk_filter: str,
                     batch_size: int = DEFAULT_BATCH_SIZE) -> list[LakeObject]:
        """Drain all pages, guarding against next-token wraparound
        loops the way the reference's pagination loop does
        (fsmwrapper.py:92-103 detects a repeated URL and stops)."""
        out: list[LakeObject] = []
        token: str | None = None
        seen_tokens: set[str] = set()
        while True:
            page, token = self.list_objects_page(chunk_filter, token, batch_size)
            out.extend(page)
            if token is None:
                return out
            if token in seen_tokens:   # wraparound — server looped
                return out
            seen_tokens.add(token)

    def fetch_object(self, object_id: str) -> str:
        """Returns the JSON-lines payload for one data object."""
        raise NotImplementedError


@dataclass
class FakeLakeTransport(LakeTransport):
    """Deterministic in-memory lake: ``docs`` maps business-class name
    → list of record dicts. Partitioned into ``n_chunks`` id ranges.
    Picklable (plain dataclass) so tasks can carry it."""

    docs: dict[str, list[dict]] = field(default_factory=dict)
    n_chunks: int = 4
    records_per_object: int = 50

    _CLAUSE_RE = re.compile(r"(\S+) (eq|ne|gt|ge|lt|le) '([^']*)'")

    @classmethod
    def _clauses(cls, filter_str: str) -> list[tuple[str, str, str]]:
        # filter grammar: "prop op 'value' and prop op 'value' ..."
        # (reference: utilities/utilities.py:226-238, datalakewrapper.py:141)
        return cls._CLAUSE_RE.findall(filter_str)

    def _bc_of(self, doc_filter: str) -> str:
        for prop, op, val in self._clauses(doc_filter):
            if prop == "dl_document_name" and op == "eq":
                return val
        raise ValueError(f"no dl_document_name clause in {doc_filter!r}")

    @staticmethod
    def _rec_matches(rec: dict, clauses: list[tuple[str, str, str]]) -> bool:
        """Server-side evaluation of pushed theta clauses against one
        record. The comparison type follows the RECORD value's type —
        numeric fields compare numerically, string fields
        lexicographically — which is exactly Spark's semantics for
        the column the filter came from; a server that compared by a
        DIFFERENT rule could over-filter, and dropped objects are
        unrecoverable even with Spark re-applying the predicate."""
        for prop, op, val in clauses:
            if prop in ("dl_document_name", "chunk"):
                continue
            a = rec.get(prop)
            if a is None or isinstance(a, bool):
                return False
            if isinstance(a, (int, float)):
                try:
                    b = int(val) if isinstance(a, int) else float(val)
                except ValueError:
                    return False
            else:
                a, b = str(a), val
            ok = {"eq": a == b, "ne": a != b,
                  "gt": a > b, "ge": a >= b,
                  "lt": a < b, "le": a <= b}[op]
            if not ok:
                return False
        return True

    def query_split(self, doc_filter: str) -> list[str]:
        return [f"{doc_filter} and chunk eq '{i}'" for i in range(self.n_chunks)]

    def _objects_for(self, bc: str) -> list[tuple[str, list[dict]]]:
        recs = self.docs.get(bc, [])
        out = []
        for start in range(0, len(recs), self.records_per_object):
            chunk = recs[start:start + self.records_per_object]
            out.append((f"{bc}-obj-{start // self.records_per_object}", chunk))
        return out

    page_size: int = 2  # deliberately tiny so tests exercise paging

    def _all_objects(self, chunk_filter: str) -> list[LakeObject]:
        clauses = self._clauses(chunk_filter)
        bc = self._bc_of(chunk_filter)
        chunk_id = int(next(v for p, o, v in clauses if p == "chunk"))
        objs = self._objects_for(bc)
        mine = [o for i, o in enumerate(objs) if i % self.n_chunks == chunk_id]
        # theta clauses filter server-side: an object none of whose
        # records match is not listed at all (and is never fetched)
        out = []
        for oid, recs in mine:
            n = sum(1 for r in recs if self._rec_matches(r, clauses))
            if n:
                out.append(LakeObject(oid, n))
        return out

    def list_objects_page(self, chunk_filter: str, page_token: str | None,
                          batch_size: int = DEFAULT_BATCH_SIZE
                          ) -> tuple[list[LakeObject], str | None]:
        objs = self._all_objects(chunk_filter)
        start = int(page_token) if page_token else 0
        page = objs[start:start + self.page_size]
        nxt = start + self.page_size
        return page, (str(nxt) if nxt < len(objs) else None)

    def fetch_object(self, object_id: str) -> str:
        bc = object_id.rsplit("-obj-", 1)[0]
        for oid, recs in self._objects_for(bc):
            if oid == object_id:
                return "\n".join(json.dumps(r) for r in recs)
        raise KeyError(object_id)


# ---------------------------------------------------------------------------
# DataSource
# ---------------------------------------------------------------------------

class _LakePartition(InputPartition):
    def __init__(self, object_ids: list[str]):
        self.object_ids = object_ids


class RestLakeReader(DataSourceReader):
    def __init__(self, schema: StructType, transport: LakeTransport,
                 business_class: str, exclude_ids: frozenset[str]):
        self._schema = schema
        self._transport = transport
        self._bc = business_class
        self._exclude = exclude_ids
        self._pushed_clauses: list[str] = []

    def pushFilters(self, filters):
        """Source-side theta-filter pushdown (SURVEY P6): equality and
        range predicates on top-level columns are translated into the
        reference's filter grammar (``prop op 'value'`` — the
        pushdown builder at utilities/utilities.py:226-238; the
        ``_lplFilter`` theta shape at fsmwrapper.py:169,180-189) and
        appended to every split-query / object-listing call, so the
        lake server filters BEFORE transfer.

        Every filter is also returned for Spark to re-evaluate: a
        REST endpoint's filtering is treated as an optimization, not
        a correctness contract (a server that ignores the clause
        still yields exact results) — the same belt-and-suspenders
        posture JDBC sources take with partial pushdown."""
        for f in filters:
            clause = _filter_to_clause(f)
            if clause is not None:
                self._pushed_clauses.append(clause)
            yield f

    @property
    def pushed_clauses(self) -> list[str]:
        """The filter clauses that will ride the API query string —
        exposed for plan-inspection tests."""
        return list(self._pushed_clauses)

    def partitions(self):
        # S1+S2 on the driver: split-query → per-chunk object listing;
        # one Spark partition per chunk keeps fetch parallelism equal
        # to the API's own partitioning of the class. Pushed theta
        # clauses join the document-name filter here, so chunks and
        # object listings are both server-side filtered.
        doc_filter = " and ".join(
            [f"dl_document_name eq '{self._bc}'"] + self._pushed_clauses)
        parts = []
        for chunk_filter in self._transport.query_split(doc_filter):
            objs = self._transport.list_objects(chunk_filter)
            ids = [o.dl_id for o in objs if o.dl_id not in self._exclude]
            if ids:
                parts.append(_LakePartition(ids))
        return parts or [_LakePartition([])]

    def read(self, partition: _LakePartition):
        # S3+S4 in the task: fetch each object's JSON-lines payload and
        # decode records; missing keys → None (schema-drift friendly).
        names = [f.name for f in self._schema.fields]
        for oid in partition.object_ids:
            payload = self._transport.fetch_object(oid)
            for line in payload.splitlines():
                if not line.strip():
                    continue
                rec = json.loads(line)
                yield tuple(rec.get(n) for n in names)


class RestLakeDataSource(DataSource):
    """Usage::

        spark.dataSource.register(RestLakeDataSource)
        df = (spark.read.format("restlake")
              .schema("id string, Amount string")
              .option("business_class", "FSM_GeneralLedgerTransactionDetail")
              .option("transport_pickle", base64_pickle)      # injected transport
              .load())

    ``exclude_ids`` (comma-joined) implements the incremental anti-join
    at the source: already-extracted object ids are skipped during
    partition planning (reference: utilities/utilities.py:208-224).
    """

    @classmethod
    def name(cls):
        return "restlake"

    def schema(self):
        raise NotImplementedError("restlake requires an explicit .schema(...)")

    def reader(self, schema: StructType) -> DataSourceReader:
        import base64
        bc = self.options.get("business_class")
        if not bc:
            raise ValueError("option 'business_class' is required")
        tp_b64 = self.options.get("transport_pickle")
        if not tp_b64:
            raise ValueError("option 'transport_pickle' is required "
                             "(no real HTTP transport in this build)")
        transport = _restricted_loads(base64.b64decode(tp_b64))
        exclude = frozenset(
            x for x in (self.options.get("exclude_ids") or "").split(",") if x)
        return RestLakeReader(schema, transport, bc, exclude)


def _restricted_loads(data: bytes):
    """Unpickle the transport option with a class allowlist: only
    LakeTransport subclasses (plus builtin containers, which need no
    class lookup) may be constructed. An unrestricted pickle.loads on
    a caller-controlled read option is arbitrary code execution on
    the driver — any other global is refused."""
    import importlib
    import io
    import pickle

    class _TransportUnpickler(pickle.Unpickler):
        def find_class(self, module, name):
            cls = getattr(importlib.import_module(module), name)
            if isinstance(cls, type) and issubclass(cls, LakeTransport):
                return cls
            raise pickle.UnpicklingError(
                f"transport_pickle may only contain LakeTransport "
                f"subclasses; refused {module}.{name}")

    obj = _TransportUnpickler(io.BytesIO(data)).load()
    if not isinstance(obj, LakeTransport):
        raise TypeError(f"transport_pickle decoded to {type(obj).__name__}, "
                        "not a LakeTransport")
    return obj


def transport_option(transport: LakeTransport) -> str:
    """Serialize a transport for the DataSource option channel
    (unpickled under the LakeTransport-only allowlist above)."""
    import base64
    import pickle
    return base64.b64encode(pickle.dumps(transport)).decode("ascii")
