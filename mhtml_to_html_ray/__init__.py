"""mhtml_to_html_ray — a Ray-Data-native web-archive extraction + crawl engine.

Re-implements the query/data-processing capabilities of the reference
``gildas-lormeau/mhtml-to-html`` (MHTML/MIME document extraction to standalone
HTML) as a Ray Data pipeline over Common-Crawl-style Parquet page tables, and
pairs it with a from-scratch URL-frontier / fetch scheduler (sharded URL-seen
set, per-host politeness, robots gating, wave-synchronous priority re-scoring).

Layout:
  kernel/    pure-Python per-document kernel (MIME parse, charset, DOM, CSS,
             srcset, convert walk) — no Ray dependency, unit-testable alone
  stages/    Ray Data map_batches stages (zero-copy Arrow in/out)
  sources/   deterministic fixture/page-table generators and readers
  frontier/  URL canonicalizer, seen-set shards, politeness, wave scheduler
  functions/ training-data ops (dedup, similarity, text stats, multimodal)
  pipelines/ end-to-end pipelines + the queries()/oracle_sql() registry
  state/     checkpoint/lineage helpers
"""

__version__ = "0.1.0"


def convert_document(data, **config_kwargs):
    """Library convenience (the reference's `convert(data, config)` surface,
    lib/mod.js:35-43): one MHTML/HTML document in, PageData out. For bulk
    work use the Ray pipelines (pipelines.flagship / stages.extract)."""
    from .kernel.convert import Config, convert

    return convert(data, Config(**config_kwargs) if config_kwargs else None)


def parse_document(data):
    """The reference's `parse(data)` surface (lib/parse.js:68)."""
    from .kernel.mime import parse

    return parse(data)
