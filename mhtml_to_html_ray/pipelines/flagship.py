"""Flagship pipeline: documents → synthetic MHTML pages → fused extraction.

The driver's testdata carries no raw pages table, so the pages table of
BASELINE.json's ``input_hint`` shape is synthesized deterministically from
``documents.parquet`` (doc_id, text, lang): each document is wrapped into an
MHTML archive whose extracted text is, by construction, exactly ``text`` —
which makes the whole MIME+DOM+serialize kernel verifiable against a DuckDB
oracle (SELECT ... FROM documents) at any scale.

Stages (all lazy, streaming):
  read_parquet(documents) → map_batches(synthesize) → map_batches(ExtractBatch)
"""

from __future__ import annotations

import html as _html

import pyarrow as pa

from ..stages.extract import ExtractBatch

PAGE_URL_PREFIX = "https://docs.fixture.invalid/"
_BOUNDARY = "----=_EngineDoc"


def wrap_mhtml(doc_id: int, body_html: str) -> bytes:
    """The shared single-resource MHTML envelope every synthetic page uses
    (flagship extraction, anchor-text corpus): one text/html part at
    Content-Location PAGE_URL_PREFIX/<doc_id>."""
    return (
        f"MIME-Version: 1.0\r\n"
        f'Content-Type: multipart/related; boundary="{_BOUNDARY}"\r\n\r\n'
        f"--{_BOUNDARY}\r\n"
        f"Content-Type: text/html; charset=utf-8\r\n"
        f"Content-Transfer-Encoding: 8bit\r\n"
        f"Content-Location: {PAGE_URL_PREFIX}{doc_id}\r\n\r\n"
        f"{body_html}\r\n"
        f"--{_BOUNDARY}--\r\n"
    ).encode("utf-8")


def synthesize_page(doc_id: int, text: str, lang: str) -> bytes:
    """One deterministic MHTML archive per document row. The converted page's
    extracted text round-trips to ``text`` exactly (pre-escaped into a
    <pre> block), and the title is ``doc-<doc_id>``."""
    escaped = _html.escape(text, quote=False)
    body = (
        f"<html><head><title>doc-{doc_id}</title></head>"
        f"<body><pre>{escaped}</pre></body></html>"
    )
    return wrap_mhtml(doc_id, body)


def synthesize_pages_batch(batch: pa.Table) -> pa.Table:
    """documents batch → pages batch (input_hint shape)."""
    doc_ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    langs = batch.column("lang").to_pylist()
    html = pa.array(
        [synthesize_page(d, t, lang) for d, t, lang in zip(doc_ids, texts, langs)],
        pa.binary(),
    )
    urls = pa.array([f"{PAGE_URL_PREFIX}{d}" for d in doc_ids], pa.string())
    warc_ts = pa.array([1_767_225_600_000_000 + int(d) for d in doc_ids], pa.int64()).cast(
        pa.timestamp("us")
    )
    return pa.Table.from_arrays(
        [urls, warc_ts, html, batch.column("text"), batch.column("lang")],
        names=["url", "warc_ts", "html", "text", "lang"],
    )


def pages_from_documents(documents_path: str, parallelism: int | None = None):
    """Dataset of synthetic pages from a documents parquet file."""
    import ray.data

    ds = ray.data.read_parquet(documents_path, columns=["doc_id", "text", "lang"])
    return ds.map_batches(synthesize_pages_batch, batch_format="pyarrow", zero_copy_batch=True)


def extract_pages(pages_ds, batch_size: int = 64, concurrency=None, keep_html: bool = True,
                  enable_scripts: bool = False):
    """The fused extraction stage over a pages Dataset.

    ``concurrency=None`` → stateless task pool (elastic, the default);
    an int/tuple → actor pool with per-actor codec caches. ``batch_size`` is
    deliberately small: rows carry multi-KB..MB html blobs (SURVEY.md §7)."""
    if concurrency is None:
        return pages_ds.map_batches(
            ExtractBatch(enable_scripts=enable_scripts, keep_html=keep_html),
            batch_format="pyarrow",
            batch_size=batch_size,
            zero_copy_batch=True,
        )
    return pages_ds.map_batches(
        ExtractBatch,
        fn_constructor_kwargs={"enable_scripts": enable_scripts, "keep_html": keep_html},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        zero_copy_batch=True,
    )


def run_flagship(sf_dir: str, keep_html: bool = True):
    """documents.parquet → synthetic pages → extraction output Dataset."""
    pages = pages_from_documents(f"{sf_dir}/documents.parquet")
    return extract_pages(pages, keep_html=keep_html)
