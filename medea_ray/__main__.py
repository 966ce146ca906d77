"""CLI entry point — the ``ray job submit`` surface.

    python -m medea_ray validate-file schema.medea doc.json
    python -m medea_ray run --input 'data/*.parquet' --schema schema.medea \
        --out /out [--payload-col payload --id-col url --wave-size 64]
    python -m medea_ray report --out /out [--partitions]
    python -m medea_ray gen-pages --out /tmp/pages --rows 100000

``run`` is the distributed pipeline: on a cluster, submit with
``ray job submit -- python -m medea_ray run ...`` (the job driver calls
ray.init only if no session exists — guarded for the managed-driver case).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys


def _cmd_validate_file(args) -> int:
    from medea_ray import MedeaError, MedeaValidationError, compile_schema, validate

    from pathlib import Path

    try:
        # a CLI argument is always a path — bypass the str text-vs-path
        # heuristic (a bare name with no .medea suffix would be parsed
        # as schema TEXT)
        graph = compile_schema(Path(args.schema))
        with open(args.document, "rb") as f:
            payload = f.read()
    except OSError as e:
        print(f"cannot read input: {e}", file=sys.stderr)
        return 2
    except MedeaError as e:
        print(f"invalid schema {args.schema!r}: {e}", file=sys.stderr)
        return 2
    try:
        vj = validate(graph, payload)
    except MedeaValidationError as e:
        print(
            json.dumps(
                {
                    "valid": False,
                    "failed_specifier": e.code,
                    "schema_path": e.path,
                    "schema": e.schema,
                    "detail": e.detail,
                }
            )
        )
        return 1
    print(json.dumps({"valid": True, "valid_against": list(vj.valid_against())}))
    return 0


def _resolve_inputs(path: str) -> tuple[list[str] | None, str]:
    """Expand a file/dir/glob input into a homogeneous file list.
    Returns (files, format 'parquet'|'jsonl') on success, or
    (None, error message) — mixed-format dirs are an error, never a
    silent partial read."""
    exts = (".parquet", ".jsonl", ".json", ".jsonl.gz", ".json.gz")
    if os.path.isfile(path):
        files = [path]
    elif any(c in path for c in "*?["):
        files = sorted(glob.glob(path))
    elif os.path.isdir(path):
        files = sorted(
            os.path.join(path, f) for f in os.listdir(path) if f.endswith(exts)
        )
    else:
        return None, f"input {path!r} is not a file, directory or glob"
    if not files:
        return None, f"no parquet/jsonl inputs under {path!r}"
    # gz rides the jsonl path: Ray/Arrow auto-detect gzip by extension
    found = {
        "jsonl" if f.endswith((".jsonl", ".json", ".jsonl.gz", ".json.gz"))
        else "parquet"
        for f in files
    }
    if len(found) > 1:
        return None, f"mixed parquet and jsonl inputs under {path!r}"
    return files, found.pop()


def _cmd_run(args) -> int:
    # validate the schema before paying for a Ray session
    try:
        with open(args.schema) as f:
            schema_text = f.read()
    except OSError as e:
        print(f"cannot read schema {args.schema!r}: {e}", file=sys.stderr)
        return 2
    from medea_ray import MedeaError, compile_schema

    try:
        compile_schema(schema_text)
    except MedeaError as e:
        print(f"invalid schema {args.schema!r}: {e}", file=sys.stderr)
        return 2

    # resolve inputs BEFORE paying for Ray session startup — a bad --input
    # should error instantly, like a bad --schema does
    files, fmt = _resolve_inputs(args.input)
    if files is None:
        print(fmt, file=sys.stderr)
        return 2

    import ray

    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"), include_dashboard=False)
    from medea_ray.engine.pipeline import PipelineUsageError, run_validation_pipeline

    try:
        report = run_validation_pipeline(
            files,
            schema_text,
            args.out,
            payload_col=args.payload_col,
            id_col=args.id_col,
            batch_size=args.batch_size,
            wave_size=args.wave_size,
            resume=not args.no_resume,
            input_format=fmt,
            partition_unit=args.partition_unit,
            fragment_rows=args.fragment_rows,
            on_corrupt=args.on_corrupt,
        )
    except PipelineUsageError as e:
        # driver-side contract errors only (fragment×jsonl, unit/schema
        # switch on a populated out_dir) — clean exit 2, no Ray traceback.
        # Worker-side errors (e.g. ArrowInvalid under on_corrupt="fail",
        # which subclasses ValueError and arrives wrapped in RayTaskError)
        # deliberately propagate with their full traceback.
        print(str(e), file=sys.stderr)
        return 2
    report.pop("partitions", None)
    print(json.dumps(report))
    return 0


def _cmd_report(args) -> int:
    """Summarize a run directory from its committed manifests — no Ray
    session, safe to call while a run is in flight elsewhere."""
    from medea_ray.engine.pipeline import summarize_run

    s = summarize_run(args.out)
    if s["n_partitions"] == 0 and not s["failed_unresolved"]:
        print(f"no committed partitions under {args.out!r}", file=sys.stderr)
        return 2
    if args.partitions:
        from medea_ray.engine.pipeline import load_manifest

        s["partitions"] = sorted(
            load_manifest(args.out).values(), key=lambda r: r["partition_id"]
        )
    print(json.dumps(s))
    return 0


def _cmd_stats(args) -> int:
    files, fmt = _resolve_inputs(args.input)
    if files is None:
        print(fmt, file=sys.stderr)
        return 2

    import ray

    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"), include_dashboard=False)
    from medea_ray.engine.stats import sketch_summary

    ds = _read_table(files, fmt)
    out = sketch_summary(
        ds,
        stats_cols=[c for c in args.columns.split(",") if c],
        hll_cols=[c for c in args.hll.split(",") if c],
        tdigest_cols=[c for c in args.quantiles.split(",") if c],
    )
    print(json.dumps(out, default=str))
    return 0


def _cmd_export(args) -> int:
    """Re-partition a table into hive-partitioned parquet (the resumable
    output layout: one directory per partition value, bounded file sizes,
    so a downstream consumer — or a re-run — can skip finished
    partitions)."""
    files, fmt = _resolve_inputs(args.input)
    if files is None:
        print(fmt, file=sys.stderr)
        return 2

    import ray

    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"), include_dashboard=False)
    parts = [c for c in args.partition_by.split(",") if c]
    cols = [c for c in args.columns.split(",") if c] or None
    if cols:
        # partition columns must survive the projection to name the dirs
        cols += [p for p in parts if p not in cols]
    ds = _read_table(files, fmt, columns=cols)
    ds.write_parquet(
        args.out,
        partition_cols=parts or None,
        max_rows_per_file=args.max_rows_per_file,
    )
    print(json.dumps({"out": args.out, "partition_by": parts}))
    return 0


def _read_table(files, fmt, columns=None):
    import ray.data as rd

    if fmt == "jsonl":
        ds = rd.read_json(files, file_extensions=["jsonl", "json", "jsonl.gz", "json.gz"])
        if columns:
            ds = ds.select_columns(columns)
        return ds
    return rd.read_parquet(files, columns=columns)


def _cmd_infer_schema(args) -> int:
    """Induce a Medea schema from a JSON column (engine/infer.py) and
    print it (or write it to --out), plus a one-line JSON profile
    summary."""
    files, fmt = _resolve_inputs(args.input)
    if files is None:
        print(fmt, file=sys.stderr)
        return 2

    import ray

    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"), include_dashboard=False)

    from medea_ray.engine import infer

    ds = _read_table(files, fmt, columns=[args.col])
    try:
        text, prof = infer.infer_schema(
            ds,
            args.col,
            enum_cap=args.enum_cap,
            enum_max_len=args.enum_max_len,
            on_invalid=args.on_invalid,
        )
    except ValueError as e:
        print(str(e), file=sys.stderr)
        return 2
    summary = {
        "n_docs": prof.n_docs,
        "n_invalid": prof.n_invalid,
        "root_types": prof.root_type_counts,
        "n_props": len(prof.props),
        "enums": {p: len(pp.enum_values) for p, pp in prof.props.items()
                  if pp.enum_values is not None},
        "out": args.out,
    }
    if args.out:
        with open(args.out, "w") as f:
            f.write(text)
    else:
        summary["schema"] = text
    print(json.dumps(summary))
    return 0


def _cmd_suggest_suite(args) -> int:
    """Derive a check suite from the data (engine/checks.suggest_suite)
    and write it as a `check`-compatible JSON spec file: profile
    today's partition, enforce the suite on tomorrow's."""
    files, fmt = _resolve_inputs(args.input)
    if files is None:
        print(fmt, file=sys.stderr)
        return 2
    columns = [c for c in args.columns.split(",") if c]
    if not columns:
        print("--columns requires at least one column", file=sys.stderr)
        return 2

    import ray

    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"), include_dashboard=False)

    from medea_ray.engine import checks as ck

    ds = _read_table(files, fmt, columns=columns)
    try:
        suite = ck.suggest_suite(
            ds, columns, enum_cap=args.enum_cap, range_slack=args.range_slack
        )
    except ValueError as e:
        print(str(e), file=sys.stderr)
        return 2
    specs = []
    for c in suite:
        if c.kind == "not_null":
            specs.append({"kind": "not_null", "col": c.target,
                          "max_null_frac": c.params[0]})
        elif c.kind == "in_range":
            specs.append({"kind": "in_range", "col": c.target,
                          "min": c.params[0], "max": c.params[1]})
        elif c.kind == "unique":
            specs.append({"kind": "unique", "cols": list(c.params)})
        elif c.kind == "accepted_values":
            specs.append({"kind": "accepted_values", "col": c.target,
                          "values": list(c.params)})
        elif c.kind == "row_count":
            specs.append({"kind": "row_count", "min_rows": c.params[0],
                          "max_rows": c.params[1]})
    with open(args.out, "w") as f:
        json.dump(specs, f, indent=1)
    print(json.dumps({"out": args.out, "n_checks": len(specs),
                      "kinds": sorted({s["kind"] for s in specs})}))
    return 0


_CHECK_USAGE = (
    "suite entries: {kind: not_null|in_range|unique|accepted_values|"
    "row_count|matches_schema|max_psi|referential, ...kind-specific keys}"
)


def _build_check(spec: dict, fmt_resolver):
    from medea_ray.engine import checks as ck

    kind = spec.get("kind")
    if kind == "not_null":
        return ck.not_null(spec["col"], spec.get("max_null_frac", 0.0))
    if kind == "in_range":
        return ck.in_range(spec["col"], spec.get("min"), spec.get("max"))
    if kind == "unique":
        return ck.unique(*spec["cols"])
    if kind == "accepted_values":
        return ck.accepted_values(spec["col"], spec["values"])
    if kind == "row_count":
        return ck.row_count(spec.get("min_rows"), spec.get("max_rows"))
    if kind == "matches_schema":
        with open(spec["schema"]) as f:
            text = f.read()
        return ck.matches_schema(
            spec["col"], text, spec["id_col"], spec.get("max_invalid_frac", 0.0)
        )
    if kind == "max_psi":
        return ck.max_psi(spec["col"], spec["ts_col"], spec["threshold"])
    if kind == "referential":
        ref_files, ref_fmt = fmt_resolver(spec["ref_input"])
        if ref_files is None:
            raise ValueError(ref_fmt)
        ref_ds = _read_table(ref_files, ref_fmt, columns=[spec["ref_col"]])
        return ck.referential(
            spec["col"], ref_ds, spec["ref_col"], spec.get("max_orphans", 0)
        )
    raise ValueError(f"unknown check kind {kind!r} — {_CHECK_USAGE}")


def _cmd_check(args) -> int:
    """Run a declarative check suite (engine/checks.py) from a JSON
    spec file. Exit 0 = all checks passed, 1 = at least one failed,
    2 = usage / spec error."""
    files, fmt = _resolve_inputs(args.input)
    if files is None:
        print(fmt, file=sys.stderr)
        return 2
    try:
        with open(args.suite) as f:
            specs = json.load(f)
        if not isinstance(specs, list) or not specs:
            raise ValueError("suite file must hold a non-empty JSON list")
    except (OSError, ValueError) as e:
        print(f"bad suite file: {e}", file=sys.stderr)
        return 2

    import ray

    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"), include_dashboard=False)

    from medea_ray.engine import checks as ck

    try:
        suite = [_build_check(s, _resolve_inputs) for s in specs]
    except (KeyError, TypeError, ValueError, AttributeError, OSError) as e:
        # AttributeError: non-dict entry; OSError: matches_schema file —
        # all spec problems exit 2, never the exit-1 "checks failed" code
        print(f"bad suite entry: {e}", file=sys.stderr)
        return 2
    # project to the columns the suite touches: a url/lang suite must
    # not read+decode the dominant text column (same projection the
    # infer-schema / suggest-suite commands apply)
    cols = ck.suite_columns(suite)
    ds = _read_table(files, fmt, columns=cols or None)
    out = ck.run_checks(ds, suite)
    print(out.to_json(orient="records"))
    return 0 if bool(out["passed"].all()) else 1


def _cmd_pretrain(args) -> int:
    """Run the composed pretraining corpus-prep chain
    (engine/pretrain.py): C4 clean → Gopher filter → exact dedup →
    n-gram decontam → mixture re-sample → BPE token accounting. Writes
    the surviving corpus as parquet and prints the per-stage report."""
    files, fmt = _resolve_inputs(args.input)
    if files is None:
        print(fmt, file=sys.stderr)
        return 2
    bench_files, bench_fmt = _resolve_inputs(args.bench)
    if bench_files is None:
        print(bench_fmt, file=sys.stderr)
        return 2

    import ray

    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"), include_dashboard=False)

    from medea_ray.engine import pretrain as pt

    ds = _read_table(files, fmt, columns=[args.id_col, args.source_col, args.text_col])
    bench_ds = _read_table(bench_files, bench_fmt, columns=[args.text_col])
    try:
        corpus, report = pt.prepare_corpus(
            ds, bench_ds,
            id_col=args.id_col, text_col=args.text_col,
            source_col=args.source_col, target_rows=args.target_rows,
            temperature=args.temperature, ngram_n=args.ngram_n,
            min_lines=args.min_lines, bpe_merges=args.bpe_merges,
        )
    except ValueError as e:
        print(str(e), file=sys.stderr)
        return 2
    corpus.write_parquet(args.out)
    report["out"] = args.out
    print(json.dumps(report))
    return 0


def _cmd_gen_pages(args) -> int:
    from medea_ray.fixtures.gen import write_pages

    paths = write_pages(
        args.out, args.rows, rows_per_file=args.rows_per_file, workers=args.workers,
        fmt=args.format, row_group_rows=args.row_group_rows,
    )
    print(json.dumps({"files": len(paths), "rows": args.rows, "out": args.out}))
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="medea_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    v = sub.add_parser("validate-file", help="validate one JSON document (local kernel)")
    v.add_argument("schema")
    v.add_argument("document")
    v.set_defaults(fn=_cmd_validate_file)

    r = sub.add_parser("run", help="distributed validation pipeline")
    r.add_argument("--input", required=True, help="parquet dir or glob")
    r.add_argument("--schema", required=True, help=".medea schema-graph file")
    r.add_argument("--out", required=True)
    r.add_argument("--payload-col", default="payload")
    r.add_argument("--id-col", default="url")
    r.add_argument("--batch-size", type=int, default=8192)
    r.add_argument("--wave-size", type=int, default=64)
    r.add_argument("--no-resume", action="store_true")
    r.add_argument(
        "--partition-unit", choices=("file", "fragment"), default=None,
        help="resume granularity: manifest keyed per input file or per "
        "parquet row-group range (bounds lost work on huge files). "
        "Default: fragment for parquet (also measured faster), file for "
        "jsonl",
    )
    r.add_argument(
        "--fragment-rows", type=int, default=1 << 20,
        help="target rows per fragment when --partition-unit fragment",
    )
    r.add_argument(
        "--on-corrupt", choices=("fail", "skip"), default="fail",
        help="bad-shard policy: fail (abort on first unreadable partition) "
        "or skip (commit healthy partitions, log failures to "
        "failures.jsonl, leave failed ones unmanifested so resume retries "
        "them)",
    )
    r.set_defaults(fn=_cmd_run)

    rp = sub.add_parser(
        "report", help="summarize a run dir from its committed manifests (no Ray)"
    )
    rp.add_argument("--out", required=True, help="the run's output directory")
    rp.add_argument(
        "--partitions", action="store_true", help="include per-partition lineage rows"
    )
    rp.set_defaults(fn=_cmd_report)

    s = sub.add_parser("stats", help="column stats / sketches over parquet")
    s.add_argument("--input", required=True, help="parquet dir or glob")
    s.add_argument("--columns", required=True, help="comma-separated columns")
    s.add_argument("--hll", default="", help="comma-separated columns for approx distinct")
    s.add_argument("--quantiles", default="", help="comma-separated numeric columns")
    s.set_defaults(fn=_cmd_stats)

    e = sub.add_parser("export", help="re-partition a table to hive-partitioned parquet")
    e.add_argument("--input", required=True, help="parquet/jsonl file, dir or glob")
    e.add_argument("--out", required=True)
    e.add_argument("--partition-by", default="", help="comma-separated partition columns")
    e.add_argument("--columns", default="", help="comma-separated columns to keep")
    e.add_argument("--max-rows-per-file", type=int, default=200_000)
    e.set_defaults(fn=_cmd_export)

    inf = sub.add_parser(
        "infer-schema", help="induce a Medea schema from a JSON column"
    )
    inf.add_argument("--input", required=True, help="parquet/jsonl dir or glob")
    inf.add_argument("--col", default="payload")
    inf.add_argument("--enum-cap", type=int, default=16)
    inf.add_argument("--enum-max-len", type=int, default=128)
    inf.add_argument("--on-invalid", choices=("raise", "skip"), default="raise")
    inf.add_argument("--out", help="write the schema here instead of stdout")
    inf.set_defaults(fn=_cmd_infer_schema)

    c = sub.add_parser(
        "check", help="run a declarative check suite from a JSON spec"
    )
    c.add_argument("--input", required=True, help="parquet/jsonl dir or glob")
    c.add_argument("--suite", required=True, help="JSON list of check specs")
    c.set_defaults(fn=_cmd_check)

    sg = sub.add_parser(
        "suggest-suite",
        help="derive a check suite from the data, as a `check` spec file",
    )
    sg.add_argument("--input", required=True, help="parquet/jsonl dir or glob")
    sg.add_argument("--columns", required=True, help="comma-separated columns")
    sg.add_argument("--out", required=True, help="where to write the suite JSON")
    sg.add_argument("--enum-cap", type=int, default=16)
    sg.add_argument("--range-slack", type=float, default=0.0)
    sg.set_defaults(fn=_cmd_suggest_suite)

    pt = sub.add_parser(
        "pretrain",
        help="composed corpus prep: C4 → Gopher → dedup → decontam → "
        "mixture → BPE token accounting",
    )
    pt.add_argument("--input", required=True, help="corpus parquet/jsonl dir or glob")
    pt.add_argument("--bench", required=True,
                    help="benchmark-suite table to decontaminate against")
    pt.add_argument("--out", required=True, help="output parquet dir")
    pt.add_argument("--target-rows", type=int, required=True)
    pt.add_argument("--id-col", default="url")
    pt.add_argument("--source-col", default="lang")
    pt.add_argument("--text-col", default="text")
    pt.add_argument("--temperature", type=float, default=0.7)
    pt.add_argument("--ngram-n", type=int, default=13)
    pt.add_argument("--min-lines", type=int, default=3)
    pt.add_argument("--bpe-merges", type=int, default=200)
    pt.set_defaults(fn=_cmd_pretrain)

    g = sub.add_parser("gen-pages", help="generate the synthetic pages table")
    g.add_argument("--out", required=True)
    g.add_argument("--rows", type=int, required=True)
    g.add_argument("--rows-per-file", type=int, default=50_000)
    g.add_argument("--workers", type=int, default=1)
    g.add_argument(
        "--format", choices=["parquet", "jsonl", "jsonl.gz"], default="parquet"
    )
    g.add_argument(
        "--row-group-rows", type=int, default=None,
        help="parquet row-group size cap (multi-row-group files exercise "
        "run --partition-unit fragment)",
    )
    g.set_defaults(fn=_cmd_gen_pages)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
