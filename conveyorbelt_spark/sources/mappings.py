"""Mapping-JSON schema registry (S10): per-source field declarations drive
Spark StructTypes and analyzed/not_analyzed behavior, instead of hardcoded
field lists in each parser.

Reference parity: the reference declares per-type field schemas in
``mappings/*.json`` and pushes them to Elasticsearch before any write
(Scheduling/MasterScheduler.cs:205-239 SetupMappingsAsync,
ElasticsearchClient.cs:31-135, with ``___type_name___`` substituted per
source at :233). Here the same shape of JSON file yields:

- ``mapping_struct(name)``   → a typed StructType (date→timestamp,
  string→string, long/double→numeric) for per-source reads/casts
- ``analyzed_fields(name)``  → string fields WITHOUT ``index:
  not_analyzed`` — the full-text columns that feed the tokenizer →
  inverted index (ES "analyzed" ↔ our BM25 index input)
- ``not_analyzed_fields(name)`` → keyword columns (exact match / group-by)
- ``unstored_fields(name)``  → declared ``store: false`` (ES drops the
  source value; we surface the flag so sinks can prune the column)

Files ship inside the package (conveyorbelt_spark/mappings/*.json); a
``mappings_dir`` override lets deployments point at their own registry, and
``ensure_mapping`` copies the declaration next to an index (the
CreateIndexIfNotExists + PutMapping DDL analogue), memoized like the
reference's process-local cache (ElasticsearchClient.cs:22,44,61).
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import types as T  # noqa: N812

MAPPINGS_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "mappings"
)
TYPE_NAME_PLACEHOLDER = "___type_name___"

_ES_TO_SPARK = {
    "date": T.TimestampType(),
    "string": T.StringType(),
    "long": T.LongType(),
    "double": T.DoubleType(),
    "boolean": T.BooleanType(),
}

_cache: dict[str, dict] = {}


def available_mappings(mappings_dir: str | None = None) -> list[str]:
    d = mappings_dir or MAPPINGS_DIR
    return sorted(
        f[: -len(".json")] for f in os.listdir(d) if f.endswith(".json")
    )


def load_mapping(name: str, mappings_dir: str | None = None) -> dict:
    """Raw mapping JSON (memoized). The top-level key is the type-name
    placeholder, substituted per source by the reference — we key properties
    under it identically."""
    key = f"{mappings_dir or MAPPINGS_DIR}/{name}"
    if key not in _cache:
        path = os.path.join(mappings_dir or MAPPINGS_DIR, f"{name}.json")
        with open(path) as f:
            _cache[key] = json.load(f)
    return _cache[key]


def mapping_properties(name: str, mappings_dir: str | None = None) -> dict[str, dict]:
    """{field: spec} in declaration order."""
    m = load_mapping(name, mappings_dir)
    body = m.get(TYPE_NAME_PLACEHOLDER) or next(iter(m.values()))
    return body["properties"]


def mapping_struct(name: str, mappings_dir: str | None = None) -> T.StructType:
    props = mapping_properties(name, mappings_dir)
    return T.StructType(
        [T.StructField(f, _ES_TO_SPARK[spec["type"]], True) for f, spec in props.items()]
    )


def fields_of_type(name: str, es_type: str, mappings_dir: str | None = None) -> list[str]:
    return [f for f, s in mapping_properties(name, mappings_dir).items() if s["type"] == es_type]


def not_analyzed_fields(name: str, mappings_dir: str | None = None) -> list[str]:
    return [
        f
        for f, s in mapping_properties(name, mappings_dir).items()
        if s["type"] == "string" and s.get("index") == "not_analyzed"
    ]


def analyzed_fields(name: str, mappings_dir: str | None = None) -> list[str]:
    """Full-text columns — the tokenizer/BM25 input set."""
    return [
        f
        for f, s in mapping_properties(name, mappings_dir).items()
        if s["type"] == "string" and s.get("index") != "not_analyzed"
    ]


def unstored_fields(name: str, mappings_dir: str | None = None) -> list[str]:
    return [
        f for f, s in mapping_properties(name, mappings_dir).items() if s.get("store") is False
    ]


def apply_mapping(df, name: str, mappings_dir: str | None = None):
    """Cast a stringly/EAV frame to the mapping's declared types (columns
    absent from the mapping pass through untouched) — the typed-at-the-sink
    half of the reference's model (SURVEY §1.2)."""
    from pyspark.sql import functions as F  # noqa: N812

    props = mapping_properties(name, mappings_dir)
    cols = []
    for c in df.columns:
        if c in props:
            cols.append(F.col(c).cast(_ES_TO_SPARK[props[c]["type"]]).alias(c))
        else:
            cols.append(F.col(c))
    return df.select(*cols)


def ensure_mapping(index_dir: str, name: str, mappings_dir: str | None = None) -> str:
    """Copy the mapping declaration next to the index if absent (S10 DDL:
    CreateIndexIfNotExists + PutMapping, memoized by existence-check)."""
    dst_dir = os.path.join(index_dir, "mappings")
    os.makedirs(dst_dir, exist_ok=True)
    dst = os.path.join(dst_dir, f"{name}.json")
    if not os.path.exists(dst):
        shutil.copy(os.path.join(mappings_dir or MAPPINGS_DIR, f"{name}.json"), dst)
    return dst
