"""The fused parse+convert extraction stage (SURVEY.md §2.2-2.3).

The reference's whole per-document pipeline (MIME parse → charset cascade →
DOM/CSS rewrite → serialize, lib/parse.js + lib/convert.js) is ONE
``map_batches`` kernel here: the resources dict / DOM never cross a stage
boundary, so nothing expensive is serialized between stages.

Usage (stateless tasks by default; pass ``concurrency=`` for an actor pool —
the kernel's codec caches then persist per actor):

    ds = ray.data.read_parquet(pages_path)
    out = ds.map_batches(ExtractBatch(), batch_format="pyarrow",
                         batch_size=64, zero_copy_batch=True)

Error policy: a row that cannot be converted lands with ``error`` set and
empty outputs — never a task failure (mod.js:67-74 per-file error isolation,
re-expressed per row because a Ray task retry would redo the whole batch).

Known property (shared with the reference): nested ``@import`` chains inline
as nested base64 data URIs, so output size is exponential in chain depth
(×4/3 per level). Real pages nest a handful of levels; a hostile page burns
its own row's time/memory only, and a RecursionError beyond ~2500 levels is
trapped into the ``error`` column.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..kernel.convert import Config, ConvertError, convert
from ..kernel.mime import parse
from ..kernel.textextract import extract_text
from .schemas import ANOMALY_TYPE, EXTRACT_SCHEMA, FAVICON_TYPE


class ExtractBatch:
    """Callable batch kernel: Arrow in → Arrow out, one extraction per row.

    Construct once per actor (``map_batches(ExtractBatch, concurrency=N)``)
    so the charset-decoder LRU in kernel.charsets amortizes across batches
    (the reference's module-global TextDecoder cache, util.js:118)."""

    def __init__(self, enable_scripts: bool = False, keep_html: bool = True):
        self.config = Config(enable_scripts=enable_scripts)
        self.keep_html = keep_html

    def extract_row(self, html: bytes) -> dict:
        mhtml = parse(bytes(html))
        resources_count = len(mhtml.resources)
        index_id = mhtml.index
        result = convert(mhtml, self.config)
        return {
            "html_out": result.data.encode("utf-8"),
            "text_out": result.text if result.text is not None else extract_text(result.data),
            "title": result.title,
            "favicons": result.favicons,
            "unfound_resources": result.unfound_resources,
            "anomalies": [
                {"type": a.get("type"), "id": a.get("id")} for a in result.anomalies
            ],
            "resources_count": resources_count,
            "index_id": index_id,
            "error": None,
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url")
        html_column = batch.column("html")
        rows = []
        for i in range(batch.num_rows):
            html = html_column[i].as_py()
            try:
                rows.append(self.extract_row(html))
            except ConvertError as exc:
                rows.append(_error_row(str(exc)))
            except Exception as exc:  # pragma: no cover - defensive
                rows.append(_error_row(f"{type(exc).__name__}: {exc}"))
        arrays = [
            urls,
            batch.column("warc_ts") if "warc_ts" in batch.column_names else pa.nulls(batch.num_rows, pa.timestamp("us")),
            batch.column("lang") if "lang" in batch.column_names else pa.nulls(batch.num_rows, pa.string()),
            pa.array(
                [row["html_out"] if self.keep_html else b"" for row in rows], pa.large_binary()
            ),
            pa.array([row["text_out"] for row in rows], pa.string()),
            pa.array([row["title"] for row in rows], pa.string()),
            pa.array([row["favicons"] for row in rows], pa.list_(FAVICON_TYPE)),
            pa.array([row["unfound_resources"] for row in rows], pa.list_(pa.string())),
            pa.array([row["anomalies"] for row in rows], pa.list_(ANOMALY_TYPE)),
            pa.array([row["resources_count"] for row in rows], pa.int32()),
            pa.array([row["index_id"] for row in rows], pa.string()),
            pa.array([row["error"] for row in rows], pa.string()),
            # vectorized — re-materializing each multi-MB blob via as_py()
            # just to measure it would copy the whole column a second time
            pc.coalesce(
                pc.cast(pc.binary_length(html_column), pa.int64()),
                pa.scalar(0, pa.int64()),
            ).combine_chunks(),
            pa.array([len(row["html_out"]) for row in rows], pa.int64()),
        ]
        return pa.Table.from_arrays(arrays, schema=EXTRACT_SCHEMA)


def _error_row(message: str) -> dict:
    return {
        "html_out": b"",
        "text_out": "",
        "title": None,
        "favicons": [],
        "unfound_resources": [],
        "anomalies": [],
        "resources_count": 0,
        "index_id": None,
        "error": message,
    }
