"""ENCODE search-API client with pluggable transport (S1, the live source).

Reference semantics (extraction/src/main/scala/org/broadinstitute/monster/
encode/extraction/EncodeClient.scala:25-88):

* one GET per query: ``/search/?type=<Entity>&frame=object&status=released&
  limit=all&format=json`` plus ``k=v`` positive and ``k!=v`` negative
  filters, joined WITHOUT url-encoding (the reference string-joins too);
* HTTP 404 -> an empty ``@graph`` result (not an error);
* other non-2xx -> error (here: retried with exponential backoff first —
  the reference relies on Beam retry semantics above the client);
* at most ``MAX_IN_FLIGHT`` (8) concurrent requests
  (ExtractionPipelineBuilder.scala MaxConcurrentRequests).

The transport is pluggable so the pipeline is testable offline (the
reference mirrors this with MockEncodeClient.scala):

* :class:`HttpTransport` — the live client (stdlib urllib; no third-party
  HTTP dependency).  Built lazily and never exercised in tests — this
  sandbox has no network — but it is the real implementation, not a stub.
* :class:`FileTransport` — a deterministic mini-ENCODE serving
  ``<Entity>.jsonl`` fixture files, INCLUDING server-side link traversal
  for dotted filter paths (``library.biosample.accession=...`` resolves
  ``@id`` links through the fixture store exactly like the real API).

Key normalization: fetched objects have their ``@``-prefixed keys renamed
to ``at_`` (``@id`` -> ``at_id``) — the BigQuery/Parquet-safe dump dialect
the transformation driver consumes (pipelines/transform_driver.py).
"""

from __future__ import annotations

import json
import os
import time
import urllib.error
import urllib.request

import pyarrow as pa

ENCODE_BASE_URL = "https://www.encodeproject.org"

#: every search carries these (EncodeClient.scala:36 baseParams)
BASE_PARAMS = (
    ("frame", "object"),
    ("status", "released"),
    ("limit", "all"),
    ("format", "json"),
)

#: max concurrent requests (ExtractionPipelineBuilder.scala:330-337)
MAX_IN_FLIGHT = 8

#: keys in the query string that are request shaping, not record filters
_NON_FILTER_KEYS = {"frame", "limit", "format"}


def build_search_url(
    entity: str,
    pos: list[tuple[str, str]],
    neg: list[tuple[str, str]],
    base_url: str = ENCODE_BASE_URL,
) -> str:
    """The exact URL the reference builds (EncodeClient.scala:48-56):
    ``type=`` first, then the base params, then positives, then negatives."""
    parts = [f"type={entity}"]
    parts += [f"{k}={v}" for k, v in BASE_PARAMS]
    parts += [f"{k}={v}" for k, v in pos]
    parts += [f"{k}!={v}" for k, v in neg]
    return f"{base_url}/search/?{'&'.join(parts)}"


def normalize_at_keys(record: dict) -> dict:
    """``@id`` -> ``at_id`` etc. (top level only — nested objects don't
    occur under ``frame=object``)."""
    return {
        (f"at_{k[1:]}" if k.startswith("@") else k): v for k, v in record.items()
    }


class HttpTransport:
    """Live transport: stdlib urllib + timeout + capped exponential backoff.

    ``opener`` is injectable for tests (the sandbox has no network); the
    default is ``urllib.request.urlopen``.
    """

    def __init__(
        self,
        timeout_s: float = 60.0,
        max_retries: int = 3,
        backoff_s: float = 1.0,
        opener=None,
    ):
        self.timeout_s = timeout_s
        self.max_retries = max_retries
        self.backoff_s = backoff_s
        self.opener = opener or urllib.request.urlopen

    def fetch(self, url: str) -> dict:
        last_err: Exception | None = None
        for attempt in range(self.max_retries + 1):
            try:
                req = urllib.request.Request(
                    url, headers={"Accept": "application/json"}
                )
                with self.opener(req, timeout=self.timeout_s) as resp:
                    return json.loads(resp.read().decode("utf-8"))
            except urllib.error.HTTPError as e:
                if e.code == 404:
                    # reference: 404 == empty result set, not a failure
                    return {"@graph": []}
                last_err = e
                if e.code < 500:
                    break  # 4xx (other than 404) won't heal with retries
            except (urllib.error.URLError, OSError, TimeoutError) as e:
                last_err = e
            if attempt < self.max_retries:
                time.sleep(self.backoff_s * (2**attempt))
        raise RuntimeError(f"ENCODE lookup failed: {url}") from last_err


class FileTransport:
    """Deterministic mini-ENCODE over ``<root>/<Entity>.jsonl`` fixtures.

    Emulates the server's search semantics:

    * ``type=X`` selects the entity file (missing file == the live 404 ->
      empty ``@graph``);
    * repeated ``k=v`` for one key is OR; distinct keys AND;
    * ``k!=v`` excludes any record matching v on k;
    * dotted paths traverse ``@id`` links through the WHOLE fixture store
      (``biosample.accession`` on a Library resolves the linked Biosample),
      and list values match on any element;
    * records come back in fixture order (deterministic paging).
    """

    def __init__(self, root: str):
        self.root = root
        self._store: dict[str, list[dict]] = {}
        self._by_id: dict[str, dict] = {}
        self._loaded = False

    def _load(self) -> None:
        if self._loaded:
            return
        for path in sorted(os.listdir(self.root)):
            if not path.endswith(".jsonl"):
                continue
            entity = path[: -len(".jsonl")]
            with open(os.path.join(self.root, path)) as f:
                rows = [json.loads(line) for line in f if line.strip()]
            self._store[entity] = rows
            for r in rows:
                rid = r.get("@id")
                if rid:
                    self._by_id[rid] = r
        self._loaded = True

    def _resolve(self, record: dict, path: str) -> list[str]:
        """Values of a (possibly dotted, possibly link-crossing) path."""
        vals: list = [record]
        for seg in path.split("."):
            nxt: list = []
            for v in vals:
                if isinstance(v, str):
                    v = self._by_id.get(v)  # cross an @id link
                if isinstance(v, dict):
                    v = v.get(seg)
                    if v is None:
                        continue
                    nxt.extend(v if isinstance(v, list) else [v])
            vals = nxt
        return [v if isinstance(v, str) else json.dumps(v) for v in vals]

    def fetch(self, url: str) -> dict:
        self._load()
        query = url.split("/search/?", 1)[1]
        entity = None
        pos: dict[str, set] = {}
        neg: list[tuple[str, str]] = []
        for tok in query.split("&"):
            if "!=" in tok:
                k, v = tok.split("!=", 1)
                neg.append((k, v))
                continue
            k, v = tok.split("=", 1)
            if k == "type":
                entity = v
            elif k not in _NON_FILTER_KEYS:
                pos.setdefault(k, set()).add(v)
        rows = self._store.get(entity or "", None)
        if rows is None:
            return {"@graph": []}  # live server: 404 -> empty graph
        out = []
        for r in rows:
            if any(v in self._resolve(r, k) for k, v in neg):
                continue
            if all(self._resolve(r, k) and set(self._resolve(r, k)) & vs
                   for k, vs in pos.items()):
                out.append(r)
        return {"@graph": out}


class ExtractionFetcher:
    """Actor-pool ``map_batches`` stage: one input row per (pos, neg) filter
    batch, one output row per fetched ``@graph`` object.  The transport is
    built ONCE per actor (``__init__``), never per batch; run with
    ``concurrency=(1, MAX_IN_FLIGHT)`` and ``batch_size=1`` so at most 8
    requests are in flight — the reference's rate cap."""

    def __init__(self, transport_factory, entity: str, base_url: str = ENCODE_BASE_URL):
        self.transport = transport_factory()
        self.entity = entity
        self.base_url = base_url

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, payloads = [], []
        for pos_j, neg_j in zip(
            batch.column("pos").to_pylist(), batch.column("neg").to_pylist()
        ):
            pos = [tuple(p) for p in json.loads(pos_j)]
            neg = [tuple(p) for p in json.loads(neg_j)]
            url = build_search_url(self.entity, pos, neg, self.base_url)
            for obj in self.transport.fetch(url).get("@graph", []):
                rec = normalize_at_keys(obj)
                ids.append(rec.get("at_id", ""))
                payloads.append(json.dumps(rec, sort_keys=True))
        return pa.table(
            {
                "at_id": pa.array(ids, pa.string()),
                "payload": pa.array(payloads, pa.string()),
            }
        )
