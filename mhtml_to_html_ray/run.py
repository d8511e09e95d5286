"""CLI driver (the engine's `mod.js:7-60` equivalent, Ray-native).

    python -m mhtml_to_html_ray.run extract --input pages/*.parquet --output out/
    python -m mhtml_to_html_ray.run crawl --seeds seeds.txt --routes routes.json \
        --checkpoint ckpt/ [--resume]

Extraction writes partitioned Parquet: one output directory per input
fragment with a _SUCCESS marker, so a rerun skips finished partitions instead
of redoing them (resumable output; the reference converts files sequentially
and a rerun redoes everything, mod.js:49-58). Per-row errors land in the
``error`` column — a bad archive never fails the job (mod.js:67-74 per-file
isolation, re-expressed per row).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys


def _init_ray(num_cpus: int | None) -> None:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )


def cmd_extract(args) -> int:
    import ray.data

    from .pipelines.flagship import extract_pages

    _init_ray(args.num_cpus)
    inputs: list[str] = []
    for pattern in args.input:
        matched = sorted(glob.glob(pattern))
        if matched:
            inputs.extend(matched)
        elif any(ch in pattern for ch in "*?["):
            # an unmatched glob would otherwise surface as a raw Ray
            # FileNotFoundError traceback mid-job
            print(f"no files match {pattern!r}", file=sys.stderr)
            return 1
        else:
            inputs.append(pattern)
    if not inputs:
        print("no input files", file=sys.stderr)
        return 1
    os.makedirs(args.output, exist_ok=True)
    done = skipped = failed_rows = total_rows = 0
    for index, path in enumerate(inputs):
        # partition name is a pure function of the INPUT PATH, not its list
        # position: adding/removing inputs between runs must never remap a
        # _SUCCESS marker onto a different file (silent skip/duplicate)
        import hashlib as _hashlib

        path_tag = _hashlib.sha1(os.path.abspath(path).encode()).hexdigest()[:12]
        stem = os.path.splitext(os.path.basename(path))[0]
        part_dir = os.path.join(args.output, f"part_{stem}_{path_tag}")
        if os.path.exists(os.path.join(part_dir, "_SUCCESS")):
            skipped += 1
            continue
        if path.endswith((".warc", ".warc.gz")):
            # Common Crawl's native format — same input_hint schema out
            from .sources.warc import read_warc

            ds = read_warc([path])
        else:
            ds = ray.data.read_parquet(path)
        out = extract_pages(
            ds,
            batch_size=args.batch_size,
            concurrency=args.concurrency,
            keep_html=not args.no_html,
            enable_scripts=args.enable_scripts,
        )
        tmp_dir = part_dir + ".tmp"
        if os.path.exists(tmp_dir):
            import shutil

            shutil.rmtree(tmp_dir)
        out.write_parquet(tmp_dir)
        # partition-atomic rename + completion marker → reruns skip finished
        # partitions and a half-written one is replaced wholesale
        if os.path.exists(part_dir):
            import shutil

            shutil.rmtree(part_dir)
        os.replace(tmp_dir, part_dir)
        open(os.path.join(part_dir, "_SUCCESS"), "w").close()
        summary = ray.data.read_parquet(part_dir, columns=["error"])
        rows = summary.count()

        def error_partials(t):
            import pyarrow as pa

            return pa.table(
                {"n": pa.array([len(t) - t.column("error").null_count], pa.int64())}
            )

        # distributed partial counts — only 1-row partials reach the driver
        errors = summary.map_batches(error_partials, batch_format="pyarrow").sum("n") or 0
        total_rows += rows
        failed_rows += int(errors)
        done += 1
        print(f"{path} -> {part_dir}: {rows} rows, {errors} errors", file=sys.stderr)
    print(
        json.dumps(
            {"partitions_done": done, "partitions_skipped": skipped,
             "rows": total_rows, "error_rows": failed_rows}
        )
    )
    return 0


def cmd_convert_files(args) -> int:
    """The reference CLI's own use case (mod.js:46-75): .mht files in,
    <stem>.html files out — but parallel over Ray (`read_binary_files`
    shards the file list) instead of a sequential loop. Per-file errors are
    logged and the run continues, exactly like the reference (mod.js:67-74).
    A single input honors --output as the target file, like `mhtml-to-html
    file.mht --output out.html`."""
    import pyarrow as pa
    import ray.data

    _init_ray(args.num_cpus)
    inputs: list[str] = []
    for pattern in args.inputs:
        matched = sorted(glob.glob(pattern))
        if matched:
            inputs.extend(matched)
        elif any(ch in pattern for ch in "*?["):
            print(f"no files match {pattern!r}", file=sys.stderr)
            return 1
        else:
            inputs.append(pattern)
    if not inputs:
        print("no input files", file=sys.stderr)
        print("usage: convert-files <input.mht>... [--output out]", file=sys.stderr)
        return 1
    single_output = args.output if args.output and len(inputs) == 1 else None
    out_dir = None
    if args.output and len(inputs) > 1:
        out_dir = args.output
        os.makedirs(out_dir, exist_ok=True)

    ds = ray.data.read_binary_files(inputs, include_paths=True)

    fetch_missing = bool(getattr(args, "fetch_missing_resources", False))

    def convert_batch(batch: pa.Table) -> pa.Table:
        from .frontier.transports import HttpTransport
        from .kernel.convert import Config, ConvertError, convert

        config = Config(
            enable_scripts=args.enable_scripts,
            # the reference's --fetch-missing-resources (mod.js:7-60):
            # collect-mode rounds fetch absent subresources over real HTTP
            # before the final rewrite (convert.js:129-163)
            fetch_missing_resources=fetch_missing,
            fetch=HttpTransport() if fetch_missing else None,
        )
        paths = batch.column("path").to_pylist()
        blobs = batch.column("bytes").to_pylist()
        htmls, errors = [], []
        for blob in blobs:
            try:
                htmls.append(convert(bytes(blob), config).data)
                errors.append(None)
            except ConvertError as exc:
                htmls.append("")
                errors.append(str(exc))
            except Exception as exc:  # per-file isolation, never a job failure
                htmls.append("")
                errors.append(f"{type(exc).__name__}: {exc}")
        return pa.table({"path": pa.array(paths, pa.string()),
                         "html": pa.array(htmls, pa.string()),
                         "error": pa.array(errors, pa.string())})

    # inputs sharing a basename stem would silently overwrite each other in
    # --output dir mode: collide → disambiguate with a short path hash
    import hashlib as _hashlib

    stem_counts: dict[str, int] = {}
    for source_path in inputs:
        source_stem = os.path.splitext(os.path.basename(source_path))[0]
        stem_counts[source_stem] = stem_counts.get(source_stem, 0) + 1

    converted = failed = 0
    # iter_batches streams converted pages to disk one block at a time — a
    # take_all() would hold every output html in driver memory at once
    rows = (
        row
        for batch in ds.map_batches(convert_batch, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
        for row in batch.to_pylist()
    )
    for row in rows:
        source = row["path"]
        if row["error"] is not None:
            failed += 1
            print(f"{source}: {row['error']}", file=sys.stderr)
            continue
        if single_output:
            target = single_output
        else:
            stem = os.path.splitext(os.path.basename(source))[0]
            directory = out_dir if out_dir else os.path.dirname(source)
            if out_dir and stem_counts.get(stem, 0) > 1:
                tag = _hashlib.sha1(os.path.abspath(source).encode()).hexdigest()[:8]
                stem = f"{stem}-{tag}"
            target = os.path.join(directory, stem + ".html")  # forced .html suffix
        with open(target, "w", encoding="utf-8") as handle:
            handle.write(row["html"])
        converted += 1
    print(json.dumps({"converted": converted, "failed": failed}))
    return 0


def cmd_crawl(args) -> int:
    from .frontier.scheduler import CrawlConfig, CrawlScheduler
    from .frontier.transports import DictTransportFactory, HttpTransportFactory

    _init_ray(args.num_cpus)
    with open(args.seeds) as handle:
        seeds = [line.strip() for line in handle if line.strip()]
    if args.transport == "http":
        transport_factory = HttpTransportFactory(user_agent=args.user_agent)
    else:
        if not args.routes:
            print("crawl: --routes is required with --transport dict", file=sys.stderr)
            return 1
        with open(args.routes) as handle:
            raw_routes = json.load(handle)
        routes = {
            url: (entry["content_type"], entry["body"].encode("utf-8"))
            for url, entry in raw_routes.items()
        }
        transport_factory = DictTransportFactory(routes)
    config = CrawlConfig(
        discovery_mode=args.discovery,
        max_waves=args.max_waves,
        wave_budget=args.wave_budget,
        checkpoint_dir=args.checkpoint,
        respect_robots=args.robots,
        min_host_gap_ms=args.host_gap_ms,
        fetch_concurrency=args.concurrency or 2,
        frontier_storage=args.frontier,
        per_host_wave_cap=args.per_host_cap,
        dedup_content=args.dedup_content,
        results_dir=args.results_dir,
        user_agent=args.user_agent,
    )
    scheduler = CrawlScheduler(transport_factory, config)
    try:
        result = scheduler.run(seeds, resume=args.resume)
    finally:
        scheduler.close()
    urls_fetched = (
        result.results.num_rows
        if result.results_dir is None
        else sum(m["rows_in"] for m in result.metrics)
    )
    print(
        json.dumps(
            {
                "urls_fetched": urls_fetched,
                "waves": result.waves,
                # shard-side count (content-hash registry keys excluded) —
                # all_seen_urls() would materialize the whole set on the
                # driver, defeating the parquet-frontier scale path
                "seen": result.seen_count,
                "metrics": result.metrics,
            }
        )
    )
    return 0


def main(argv: list[str] | None = None) -> int:
    from . import __version__

    parser = argparse.ArgumentParser(prog="mhtml_to_html_ray")
    parser.add_argument("--version", action="version", version=__version__)
    parser.add_argument("--num-cpus", type=int, default=None)
    sub = parser.add_subparsers(dest="command", required=True)

    p_extract = sub.add_parser("extract", help="pages parquet → converted HTML parquet")
    p_extract.add_argument("--input", nargs="+", required=True, help="parquet paths/globs")
    p_extract.add_argument("--output", required=True)
    p_extract.add_argument("--batch-size", type=int, default=64)
    p_extract.add_argument("--concurrency", type=int, default=None)
    p_extract.add_argument("--no-html", action="store_true", help="drop html_out (text only)")
    p_extract.add_argument("--enable-scripts", action="store_true")
    p_extract.set_defaults(func=cmd_extract)

    p_files = sub.add_parser("convert-files",
                             help=".mht/.mhtml files → standalone .html (the reference CLI's job)")
    p_files.add_argument("inputs", nargs="*", help="mhtml files / globs")
    p_files.add_argument("--output", default=None,
                         help="target file (single input) or directory (many)")
    p_files.add_argument("--enable-scripts", action="store_true")
    p_files.add_argument("--fetch-missing-resources", action="store_true",
                         dest="fetch_missing_resources",
                         help="fetch absent subresources over HTTP before the "
                              "final rewrite (reference mod.js flag)")
    p_files.set_defaults(func=cmd_convert_files)

    p_crawl = sub.add_parser("crawl", help="wave-synchronous crawl over a routes file")
    p_crawl.add_argument("--seeds", required=True, help="text file, one url per line")
    p_crawl.add_argument("--routes", default=None,
                         help="json: url → {content_type, body} (dict transport)")
    p_crawl.add_argument("--transport", default="dict", choices=["dict", "http"],
                         help="dict = scripted routes file; http = real network")
    p_crawl.add_argument("--user-agent", default="engine-crawler")
    p_crawl.add_argument("--results-dir", default=None,
                         help="stream per-wave results to Parquet here instead "
                              "of accumulating them in memory")
    p_crawl.add_argument("--checkpoint", default=None)
    p_crawl.add_argument("--resume", action="store_true")
    p_crawl.add_argument("--discovery", default="subresources",
                         choices=["subresources", "hyperlinks", "both"])
    p_crawl.add_argument("--max-waves", type=int, default=10)
    p_crawl.add_argument("--wave-budget", type=int, default=100_000)
    p_crawl.add_argument("--robots", action="store_true")
    p_crawl.add_argument("--host-gap-ms", type=float, default=0.0)
    p_crawl.add_argument("--concurrency", type=int, default=None)
    p_crawl.add_argument("--frontier", default="memory", choices=["memory", "parquet"],
                         help="backlog storage (parquet = Dataset-backed, the scale path)")
    p_crawl.add_argument("--per-host-cap", type=int, default=None,
                         help="max urls per host per wave (hot-host spill)")
    p_crawl.add_argument("--dedup-content", action="store_true",
                         help="skip link expansion of byte-identical (mirror) pages")
    p_crawl.set_defaults(func=cmd_crawl)

    args = parser.parse_args(argv)
    return args.func(args)


if __name__ == "__main__":
    sys.exit(main())
