"""Arrow schemas for every table the engine reads or writes (SURVEY.md §1.4).

The ``pages`` schema is the exact ``input_hint`` shape from BASELINE.json;
everything else is engine-side.
"""

import pyarrow as pa

PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),  # raw MHTML/HTML bytes
        ("text", pa.string()),  # expected extracted text (oracle column)
        ("lang", pa.string()),
    ]
)

ANOMALY_TYPE = pa.struct([("type", pa.string()), ("id", pa.string())])
FAVICON_TYPE = pa.struct(
    [
        ("href", pa.string()),
        ("originalHref", pa.string()),
        ("media", pa.string()),
        ("type", pa.string()),
        ("sizes", pa.string()),
    ]
)

EXTRACT_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("lang", pa.string()),
        ("html_out", pa.large_binary()),  # converted standalone HTML (UTF-8)
        ("text_out", pa.string()),  # extracted plain text (the invariant)
        ("title", pa.string()),
        ("favicons", pa.list_(FAVICON_TYPE)),
        ("unfound_resources", pa.list_(pa.string())),
        ("anomalies", pa.list_(ANOMALY_TYPE)),
        ("resources_count", pa.int32()),
        ("index_id", pa.string()),
        ("error", pa.string()),
        ("n_bytes_in", pa.int64()),
        ("n_bytes_out", pa.int64()),
    ]
)

FRONTIER_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("canon_url", pa.string()),
        ("host", pa.string()),
        ("host_hash", pa.uint64()),
        ("depth", pa.int32()),
        ("priority", pa.float64()),
        ("discovered_ts", pa.int64()),  # deterministic discovery key, not wall time
        ("wave", pa.int32()),
        ("parent_url", pa.string()),
        ("discovery_index", pa.int64()),
    ]
)

FETCH_RESULT_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("canon_url", pa.string()),
        ("host", pa.string()),
        ("wave", pa.int32()),
        ("status", pa.int32()),
        ("attempts", pa.int32()),
        ("ok", pa.bool_()),
        ("content_type", pa.string()),
        ("body", pa.large_binary()),
        ("fetch_ms", pa.float64()),
    ]
)
