"""Content-addressed parquet payloads for quantizer-scale geometry.

The geometry sidecar contract keeps a small JSON document per data
version label, re-parsed on every extend/load base resolution.  That is
the right shape for shard counts and band geometry — and the WRONG
shape for a production quantizer: a 10⁵-cluster × 768-dim SemDeDup /
IVF coarse quantizer is ~10⁸ floats, hundreds of MB as JSON text,
parsed repeatedly.  This module is the "right fix" half of the bound in
:func:`~chronicles_spark.operators.dedup_index._check_artifact_size`:

* on WRITE, when a sidecar document's serialized size exceeds
  ``PAYLOAD_INLINE_MAX``, the bulk fields (``centroids``,
  ``codebooks``) move into ONE content-addressed parquet file
  (``_artifact_payload_<sha>.parquet``, float64 columns — ~4× smaller
  than JSON and typed) next to the sidecars, and the JSON keeps only
  ``{"payload_ref": <sha>, "payload_fields": [...]}``;
* on LOAD, the reference resolves transparently (an in-process cache
  keyed by ``(location, sha)`` makes N-label agreement checks and
  repeated extends read each distinct payload once);
* re-stamping the same geometry under a new label (every extend does
  this) re-uses the SAME payload file by content hash — no per-extend
  payload writes, and the loader's cross-label agreement check
  compares tiny JSON documents;
* sweep: :func:`~chronicles_spark.operators.sidecars.
  vacuum_artifact_sidecars` reclaims payload files no surviving
  sidecar references (age-guarded like orphan sidecars).

The hash is over the CANONICAL JSON of the extracted fields (not the
parquet bytes), so the reference is stable across pyarrow versions and
a re-fit producing identical geometry dedupes.  Backends without the
binary capability (``FileSystem.supports_bytes``) keep geometry inline
— a degrade bounded by the 32 MB sidecar limit, never an error.

No reference counterpart: stettix/chronicles has no derived-state
sidecars (core/.../VersionTracker.scala tracks only table data).
"""

from __future__ import annotations

import hashlib
import io
import json

PAYLOAD_PREFIX = "_artifact_payload_"
PAYLOAD_SUFFIX = ".parquet"

# externalize when the full sidecar JSON would exceed this (the sidecar
# itself stays far smaller afterwards); small enough that every
# existing index's sidecar is byte-identical to the pre-payload format
PAYLOAD_INLINE_MAX = 4 * 1024 * 1024

# hard ceiling for one payload file — beyond this even the parquet
# payload is the wrong home (move the quantizer into a versioned table)
PAYLOAD_MAX_BYTES = 512 * 1024 * 1024

# the bulk fields the known families carry; shapes:
#   centroids: [[id, [float, ...]], ...]
#   codebooks: [[[float, ...], ...], ...]   (sub-quantizer × code × dims)
PAYLOAD_FIELDS = ("centroids", "codebooks")

# (location root, sha) -> {field: value}; payloads are immutable by
# construction (content-addressed), so the cache never invalidates
_CACHE: dict = {}
_CACHE_MAX = 8


def _payload_name(sha: str) -> str:
    return f"{PAYLOAD_PREFIX}{sha}{PAYLOAD_SUFFIX}"


def _content_sha(fields: dict) -> str:
    canon = json.dumps(fields, sort_keys=True, separators=(",", ":"))
    return hashlib.sha256(canon.encode()).hexdigest()[:32]


def _encode_payload(fields: dict) -> bytes:
    import pyarrow as pa
    import pyarrow.parquet as pq

    col_field, col_a, col_b, col_values = [], [], [], []
    for cid, vec in fields.get("centroids", ()):
        col_field.append("centroids")
        col_a.append(int(cid))
        col_b.append(None)
        col_values.append([float(x) for x in vec])
    for i, cb in enumerate(fields.get("codebooks", ())):
        for j, vec in enumerate(cb):
            col_field.append("codebooks")
            col_a.append(i)
            col_b.append(j)
            col_values.append([float(x) for x in vec])
    table = pa.table(
        {
            "field": pa.array(col_field, pa.string()),
            "a": pa.array(col_a, pa.int64()),
            "b": pa.array(col_b, pa.int64()),
            "values": pa.array(col_values, pa.list_(pa.float64())),
        }
    )
    buf = io.BytesIO()
    pq.write_table(table, buf)
    return buf.getvalue()


def _decode_payload(data: bytes) -> dict:
    import pyarrow.parquet as pq

    t = pq.read_table(io.BytesIO(data))
    rows = list(
        zip(
            t.column("field").to_pylist(),
            t.column("a").to_pylist(),
            t.column("b").to_pylist(),
            t.column("values").to_pylist(),
        )
    )
    out: dict = {}
    cents = sorted(
        ((a, v) for f, a, _b, v in rows if f == "centroids"), key=lambda r: r[0]
    )
    if cents:
        out["centroids"] = [[a, v] for a, v in cents]
    books: dict = {}
    for f, a, b, v in rows:
        if f == "codebooks":
            books.setdefault(a, {})[b] = v
    if books:
        out["codebooks"] = [
            [books[i][j] for j in sorted(books[i])] for i in sorted(books)
        ]
    return out


def externalize_doc(fs, root: str, doc: dict) -> dict:
    """The WRITE half: move bulk fields to a content-addressed payload
    file when the document is big and the backend can hold one.  Returns
    the (possibly smaller) document to persist as JSON — unchanged for
    every under-threshold document, so pre-payload sidecars stay
    byte-identical.  The payload lands BEFORE the sidecar referencing it
    (the families' sidecar-before-commit crash ordering extends one
    link: a crash leaves an unreferenced payload for the sweep, never a
    sidecar pointing at nothing)."""
    if "payload_ref" in doc:
        return doc
    if len(json.dumps(doc)) <= PAYLOAD_INLINE_MAX:
        return doc
    if not fs.supports_bytes():
        return doc  # degrade: inline, bounded by ARTIFACT_JSON_MAX_BYTES
    fields = {
        k: doc[k] for k in PAYLOAD_FIELDS if isinstance(doc.get(k), list)
    }
    if not fields:
        return doc
    sha = _content_sha(fields)
    path = fs.join(root, _payload_name(sha))
    if not fs.exists(path):
        data = _encode_payload(fields)
        if len(data) > PAYLOAD_MAX_BYTES:
            raise ValueError(
                f"artifact payload serializes to {len(data) / 1e6:.0f} MB "
                f"(> the {PAYLOAD_MAX_BYTES // (1024 * 1024)} MB payload "
                "bound) — a quantizer this large belongs in a versioned "
                "table, not a per-load artifact; reduce n_clusters or "
                "pre-reduce the embedding dim"
            )
        fs.mkdirs(root)
        fs.write_bytes(path, data)
    slim = {k: v for k, v in doc.items() if k not in fields}
    slim["payload_ref"] = sha
    slim["payload_fields"] = sorted(fields)
    return slim


def resolve_doc(fs, root: str, doc: dict) -> dict:
    """The LOAD half: re-inject externalized fields (cached per
    ``(root, sha)`` — payloads are immutable).  Documents without a
    reference pass through untouched.  A missing payload file raises
    with the sweep/rebuild guidance (the sidecar names a payload the
    store no longer holds — a manual deletion or a mis-scoped sweep)."""
    sha = doc.get("payload_ref")
    if sha is None:
        return doc
    key = (str(root), str(sha))
    fields = _CACHE.get(key)
    if fields is None:
        path = fs.join(root, _payload_name(sha))
        try:
            data = fs.read_bytes(path)
        except FileNotFoundError:
            raise ValueError(
                f"artifact sidecar references payload {sha} but "
                f"{path} is missing — restore it or rebuild the index"
            ) from None
        fields = _decode_payload(data)
        if len(_CACHE) >= _CACHE_MAX:
            _CACHE.pop(next(iter(_CACHE)))
        _CACHE[key] = fields
    out = {k: v for k, v in doc.items() if k not in ("payload_ref", "payload_fields")}
    for k in doc.get("payload_fields", sorted(fields)):
        if k not in fields:
            raise ValueError(
                f"artifact payload {sha} lacks field {k!r} the sidecar "
                "declares — the payload file was tampered with or "
                "mis-addressed; rebuild the index"
            )
        out[k] = fields[k]
    return out


def resolve_text(fs, root: str, text: str) -> str:
    """JSON-text convenience used by the loaders: parse, resolve, re-dump
    (a no-reference document round-trips to equivalent JSON)."""
    doc = json.loads(text)
    resolved = resolve_doc(fs, root, doc)
    return text if resolved is doc else json.dumps(resolved)
