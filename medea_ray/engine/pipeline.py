"""The distributed validation pipeline (SURVEY.md §2.5 E1-E5, E11-E12).

Ray-Data-first design:

- ``read_parquet(files, columns=[...], include_paths=True)`` — column-pruned
  source; the input *file* is the partition unit (a stable ``partition_id``
  derives from the file path and is carried to verdicts, violations,
  manifests — SURVEY.md §4.3).
- ``map_batches(ValidatorActor, batch_format="pyarrow", concurrency=...)``
  — a stateful actor pool; the compiled schema DAG is built once per actor
  in ``__init__`` (the reference's read-only Reader state,
  src/Data/Medea.hs:260-276, is exactly what makes this pool trivial).
- One pass, no shuffle: the actor emits violation rows *and* per-batch
  partial verdict rows in a single tagged stream (``kind`` column);
  ``write_parquet`` consumes it streaming. Per-partition verdicts roll up
  from the tiny partials on the driver (parquet predicate pushdown on
  ``kind``), never from the full stream.
- Checkpoint/resume: files are processed in waves; after each wave's sink
  completes, a manifest row per input file (partition) is committed
  atomically (tmp + rename). A restarted run skips manifested files. At
  cluster scale the wave bounds lost work; within a wave execution is fully
  streaming with backpressure.
"""

from __future__ import annotations

import json
import logging
import os
import shutil
import time

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from medea_ray.schema.compile import compile_schemata
from medea_ray.schema.parser import parse_specification
from medea_ray.validate.codegen import compile_fast_codegen
from medea_ray.validate.fastpath import compile_fast
from medea_ray.validate.kernel import (
    MedeaValidationError,
    loads_json,
    validate_obj,
)

logger = logging.getLogger(__name__)


class PipelineUsageError(ValueError):
    """Driver-side contract violation raised BEFORE any Ray work runs
    (bad option combination, resume into an incompatible out_dir). The
    CLI maps exactly this to a clean one-line exit 2; anything else —
    including worker-side errors like pyarrow's ArrowInvalid (a ValueError
    subclass) wrapped in RayTaskError — keeps its full traceback."""

# Unified output schema for the one-pass tagged stream.
RESULT_SCHEMA = pa.schema(
    [
        ("kind", pa.string()),  # "violation" | "verdict"
        ("partition_id", pa.int64()),
        ("url", pa.string()),
        ("schema_path", pa.string()),
        ("failed_specifier", pa.string()),
        ("detail", pa.string()),
        ("n_rows", pa.int64()),
        ("n_valid", pa.int64()),
    ]
)


class ValidatorKernel:
    """Shared per-actor state: compiled DAG + row loop. No Ray import —
    unit-testable standalone."""

    def __init__(self, schema_text: str, payload_col: str, id_col: str):
        self.graph = compile_schemata(parse_specification(schema_text))
        # specialized bool-only DAG lowering (VERDICT r03 item 3): may only
        # under-accept, so rejected rows re-run the generic kernel for the
        # authoritative verdict + exact violation (byte-identical outputs,
        # parity pinned against every conformance fixture). The source-
        # codegen variant (validate/codegen.py) inlines per-property checks
        # (~1.75x the closure lowering, ~6x the generic checker on the
        # flagship flat-object shape); the closure compiler stays as the
        # independently-tested fallback should codegen ever reject a DAG.
        try:
            self.fast = compile_fast_codegen(self.graph)
        except Exception:  # pragma: no cover - defensive; parity-tested
            logger.exception("fastpath codegen failed; closure fallback")
            self.fast = compile_fast(self.graph)
        self.payload_col = payload_col
        self.id_col = id_col

    def validate_payloads(self, payloads):
        """Returns (valid: list[bool], violations: list[tuple]) where each
        violation is (row_index, schema_path, failed_specifier, detail).
        Row ids are resolved by the caller via Arrow take on the violation
        indices only — the common all-valid batch never materialises ids."""
        graph = self.graph
        fast = self.fast
        validate, loads = validate_obj, loads_json
        valid = []
        append = valid.append
        violations = []
        for i, payload in enumerate(payloads):
            try:
                if payload is None:
                    raise MedeaValidationError("not_json", None, "$", "null payload")
                obj = loads(payload)
                try:
                    ok = fast(obj)
                except RecursionError:  # pragma: no cover - backstop only:
                    # fast paths defer deterministically at kernel.MAX_DEPTH
                    # before any stack could overflow
                    ok = False
                if not ok:
                    # authoritative re-check: produces the exact
                    # (path, code, detail) violation, and decides any value
                    # the fast path conservatively deferred on
                    validate(graph, obj)
                append(True)
            except MedeaValidationError as e:
                append(False)
                violations.append((i, e.path, e.code, e.detail))
        return valid, violations

    def validate_column(self, col):
        """``validate_payloads`` fed straight off the Arrow buffers: each
        payload reaches orjson as a zero-copy memoryview slice of the
        column's data buffer instead of a materialized Python str, so the
        batch's bytes cross the memory bus once (parse) rather than twice
        (``to_pylist`` copy + parse). Identical verdicts/violations —
        orjson validates UTF-8 on bytes input and Arrow string columns
        are valid UTF-8 by construction; the json-module fallback decodes
        explicitly. Measured: ~3% single-core, **+18% aggregate at 16
        contended cores** (the validation stage is bus-bound at high
        parallelism — BENCH/BASELINE.md round-5 note). Non-string /
        null-typed columns fall back to the list path."""
        from medea_ray.engine.arrow_util import string_buffer_parts

        a = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        if len(a) == 0:
            return [], []
        parts = string_buffer_parts(a)
        if parts is None:
            return self.validate_payloads(a.to_pylist())
        data, offsets, null_mask = parts
        graph = self.graph
        fast = self.fast
        validate, loads = validate_obj, loads_json
        valid = []
        append = valid.append
        violations = []
        for i in range(len(a)):
            try:
                if null_mask is not None and null_mask[i]:
                    raise MedeaValidationError("not_json", None, "$", "null payload")
                obj = loads(data[offsets[i] : offsets[i + 1]])
                try:
                    ok = fast(obj)
                except RecursionError:  # pragma: no cover - backstop only
                    ok = False
                if not ok:
                    validate(graph, obj)
                append(True)
            except MedeaValidationError as e:
                append(False)
                violations.append((i, e.path, e.code, e.detail))
        return valid, violations


class ValidatorActor:
    """map_batches callable-class: per-row validation over Arrow batches.

    mode="rows":   append per-row verdict columns (valid/specifier/path).
    mode="tagged": emit violation rows + one partial-verdict row per
                   (batch, partition) — the one-pass pipeline stream.
    ``path_to_pid``: file-path → partition_id mapping (small dict, shipped
    once per actor via constructor args).
    """

    def __init__(
        self,
        schema_text: str,
        payload_col: str = "payload",
        id_col: str = "url",
        mode: str = "rows",
        path_to_pid: dict | None = None,
    ):
        self.kernel = ValidatorKernel(schema_text, payload_col, id_col)
        self.mode = mode
        self.path_to_pid = path_to_pid or {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        valid, violations = self.kernel.validate_column(
            batch.column(self.kernel.payload_col)
        )
        bad_idx = [v[0] for v in violations]
        # ids only materialise for the (rare) violation rows — Arrow take,
        # never a full-column to_pylist.
        bad_ids = (
            batch.column(self.kernel.id_col).take(pa.array(bad_idx, pa.int64())).to_pylist()
            if bad_idx
            else []
        )

        if self.mode == "rows":
            n = len(valid)
            path = [None] * n
            spec = [None] * n
            detail = [None] * n
            for (k, p, c, d) in violations:
                path[k], spec[k], detail[k] = p, c, d
            return pa.table(
                {
                    self.kernel.id_col: batch.column(self.kernel.id_col),
                    "valid": pa.array(valid, pa.bool_()),
                    "schema_path": pa.array(path, pa.string()),
                    "failed_specifier": pa.array(spec, pa.string()),
                    "detail": pa.array(detail, pa.string()),
                }
            )

        # tagged mode: violations + per-(batch, partition) verdict partials.
        # The path column is constant per parquet fragment, so a batch has
        # 1-2 distinct values — resolve pids via unique(), not per row.
        n = len(valid)
        n_valid_total = sum(valid)
        if "path" in batch.column_names:
            path_col = batch.column("path")
            uniq = pc.unique(
                path_col.combine_chunks() if isinstance(path_col, pa.ChunkedArray) else path_col
            ).to_pylist()
            # A path Ray reports that the driver never mapped means the
            # path strings diverged (scheme/normalization change) — every
            # verdict would land on a phantom pid and the manifest would
            # commit n_rows=0 per file "successfully". Fail loudly instead.
            def _pid_of(p):
                pid = self.path_to_pid.get(p)
                if pid is None:
                    raise ValueError(
                        f"validation pipeline: batch path {p!r} not in the "
                        f"driver's input map — path normalization mismatch "
                        f"between ray.data include_paths and the input list"
                    )
                return pid

            if len(uniq) == 1:
                pid = _pid_of(uniq[0])
                row_pids = None
                per_pid = {pid: [n, n_valid_total]}
            else:
                row_pids = [_pid_of(p) for p in path_col.to_pylist()]
                per_pid = {}
                for k, ok in enumerate(valid):
                    s = per_pid.setdefault(row_pids[k], [0, 0])
                    s[0] += 1
                    s[1] += ok
        else:
            row_pids = None
            per_pid = {0: [n, n_valid_total]}
            pid = 0

        rows = {name: [] for name in RESULT_SCHEMA.names}
        for j, (k, p, c, d) in enumerate(violations):
            rows["kind"].append("violation")
            rows["partition_id"].append(row_pids[k] if row_pids is not None else pid)
            rows["url"].append(bad_ids[j])
            rows["schema_path"].append(p)
            rows["failed_specifier"].append(c)
            rows["detail"].append(d)
            rows["n_rows"].append(None)
            rows["n_valid"].append(None)
        for ppid, (n_rows, n_valid) in per_pid.items():
            rows["kind"].append("verdict")
            rows["partition_id"].append(ppid)
            rows["url"].append(None)
            rows["schema_path"].append(None)
            rows["failed_specifier"].append(None)
            rows["detail"].append(None)
            rows["n_rows"].append(n_rows)
            rows["n_valid"].append(n_valid)
        return pa.Table.from_pydict(rows, schema=RESULT_SCHEMA)


def default_pool() -> int:
    """Actor-pool sizing for CPU-bound kernels: a FIXED pool of
    (CPUs - headroom) actors at ACTOR_NUM_CPUS each. Measured on the
    9.6M-doc bench: Ray 2.49's actor-pool autoscaler plateaus ~1 actor
    above the pool minimum, so autoscaling (16,28) ran ~15 busy actors
    where fixed 28 runs ~19 (960k-1.0M vs ~700k docs/s). The fractional
    CPU request keeps slots free for source/sink tasks — a fixed pool of
    full-CPU actors equal to the CPU count starves the feed and can
    deadlock."""
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    # 3/4 of cores validate, 1/4 feed (reads/writes/raylet): sweeps on the
    # 9.6M-doc bench put the 22-28-actor band within noise of each other at
    # 32 cpus, while pools at/above (cpus-4) sometimes starve their own feed
    return max(2, (cpus * 3) // 4)


# Validator actors request 0.75 CPU: mild oversubscription overlaps the
# pure-Python kernel's object-store waits with read/write tasks. Measured
# on the 9.6M-doc bench at 32 cpus: ~900k docs/s vs ~860k at 1.0, with the
# same pool — and it keeps source/sink tasks schedulable when the pool is
# at max.
ACTOR_NUM_CPUS = 0.75


def validate_dataset(
    ds,
    schema_text: str,
    payload_col: str = "payload",
    id_col: str = "url",
    batch_size: int = 8192,
    concurrency=None,
    actor_num_cpus: float = ACTOR_NUM_CPUS,
):
    """Per-row validation as a composable Dataset→Dataset transform
    (mode="rows"): returns columns (id, valid, schema_path,
    failed_specifier, detail)."""
    if concurrency is None:
        concurrency = default_pool()
    return ds.map_batches(
        ValidatorActor,
        fn_constructor_kwargs=dict(
            schema_text=schema_text, payload_col=payload_col, id_col=id_col, mode="rows"
        ),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=actor_num_cpus,
        zero_copy_batch=True,
    )


# ---------------------------------------------------------------------------
# Checkpointed end-to-end pipeline


def _manifest_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "_manifest")


def load_manifest(out_dir: str) -> dict:
    """path → manifest record (dict). Empty if no manifest yet."""
    mdir = _manifest_dir(out_dir)
    if not os.path.isdir(mdir):
        return {}
    out = {}
    for f in sorted(os.listdir(mdir)):
        if f.endswith(".json"):
            with open(os.path.join(mdir, f)) as fh:
                for line in fh:
                    rec = json.loads(line)
                    out[rec["input_path"]] = rec
    return out


def _commit_manifest(out_dir: str, wave_id: int, records: list[dict]):
    mdir = _manifest_dir(out_dir)
    os.makedirs(mdir, exist_ok=True)
    path = os.path.join(mdir, f"wave_{wave_id:06d}.json")
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        for rec in records:
            f.write(json.dumps(rec) + "\n")
    os.replace(tmp, path)  # atomic commit: partitions never double-count


def run_validation_pipeline(
    input_files: list[str],
    schema_text: str,
    out_dir: str,
    *,
    payload_col: str = "payload",
    id_col: str = "url",
    batch_size: int = 8192,
    concurrency=None,
    wave_size: int = 64,
    resume: bool = True,
    schema_version: str = "v1",
    actor_num_cpus: float = ACTOR_NUM_CPUS,
    input_format: str = "parquet",
    partition_unit: str | None = None,
    fragment_rows: int = 1 << 20,
    on_corrupt: str = "fail",
) -> dict:
    """Read → validate (actor pool) → one-pass tagged sink, in waves of
    ``wave_size`` partitions with per-partition manifest commits. Returns
    the report: totals + per-partition verdicts. Ray must already be
    initialised.

    ``input_format="jsonl"`` reads newline-delimited JSON instead of
    parquet (same wave/manifest semantics; the needed columns are
    projected right after parse — JSONL, being a row format, has no
    storage-level column pruning, which is the cost of the format, not of
    the pipeline). Gzipped members (``.jsonl.gz`` / ``.json.gz``, the
    Common-Crawl export layout) ride the same path — Ray/Arrow detect
    gzip by extension; a gz file, like a plain one, is one partition
    (gzip streams are unsplittable, same parallel unit as the WARC
    source).

    ``partition_unit`` picks the resume granularity (VERDICT r03 item 9):
    ``"file"`` keys the manifest by input path; ``"fragment"`` keys it
    by consecutive row-group ranges of ~``fragment_rows`` rows
    (``path#rgLO-HI``), so a resumed run over multi-GB files loses at most
    one fragment of work, not a whole file. Fragment planning reads only
    parquet footers (driver-side, one metadata fetch per file — for
    million-file inputs shard the planning itself by calling the pipeline
    per input directory). Parquet only: JSONL has no row groups. The
    report's ``n_files``/``n_files_skipped`` then count fragments.
    Default (``None``): ``"fragment"`` for parquet — measured FASTER
    than file mode at the 600k-row bench shape (round-5 note in
    BENCH/BASELINE.md: the contiguous row-group read task beats the
    per-file read path) on top of the finer resume loss — and
    ``"file"`` for jsonl.

    ``on_corrupt`` picks the bad-shard policy. ``"fail"`` (default)
    surfaces the first read/decode error and aborts — nothing is committed
    for the failing wave. ``"skip"`` keeps the run going at web scale,
    where some shards of a 10^12-doc corpus WILL be unreadable: a failed
    wave is retried one partition at a time, healthy partitions commit
    normally, and each failing partition is logged, appended to
    ``<out_dir>/failures.jsonl``, reported under ``failed`` /
    ``n_failed``, and — deliberately — left OUT of the manifest, so a
    later resume (after the shard is repaired or replaced) retries exactly
    the failed partitions and nothing else. Any per-partition error is
    treated as "corrupt" under this policy, including transient ones; rerun
    with resume=True to retry the failures."""
    if input_format not in ("parquet", "jsonl"):
        raise PipelineUsageError(f"input_format must be 'parquet' or 'jsonl', got {input_format!r}")
    if on_corrupt not in ("fail", "skip"):
        raise PipelineUsageError(f"on_corrupt must be 'fail' or 'skip', got {on_corrupt!r}")
    if partition_unit is None:
        partition_unit = "fragment" if input_format == "parquet" else "file"
    if partition_unit not in ("file", "fragment"):
        raise PipelineUsageError(
            f"partition_unit must be 'file' or 'fragment', got {partition_unit!r}"
        )
    if partition_unit == "fragment" and input_format != "parquet":
        raise PipelineUsageError("partition_unit='fragment' requires parquet input (row groups)")
    import ray.data as rd

    import hashlib

    # Fail fast with a clean driver-side error on a bad schema; actors
    # compile their own copy but never see an invalid one.
    compile_schemata(parse_specification(schema_text))
    schema_digest = hashlib.md5(
        schema_text.encode() if isinstance(schema_text, str) else schema_text
    ).hexdigest()

    if concurrency is None:
        concurrency = default_pool()
    t_start = time.time()
    input_files = sorted(input_files)
    failed: dict[str, str] = {}

    def _record_failure(key: str, err: Exception):
        failed[key] = f"{type(err).__name__}: {err}"[:500]
        logger.error("on_corrupt=skip: partition %s failed: %s", key, failed[key])
        os.makedirs(out_dir, exist_ok=True)
        with open(os.path.join(out_dir, "failures.jsonl"), "a") as f:
            f.write(
                json.dumps(
                    {"when": time.time(), "input_path": key, "error": failed[key]}
                )
                + "\n"
            )

    frag_of: dict[str, tuple[str, int, int]] = {}
    if partition_unit == "fragment":
        # one footer read per file; fragments are CONSECUTIVE row-group
        # ranges so each read task does one contiguous scan
        keys = []
        for p in input_files:
            try:
                md = pq.ParquetFile(p).metadata
            except Exception as e:
                # a footer so broken the file can't even be planned
                if on_corrupt != "skip":
                    raise
                _record_failure(p, e)
                continue
            if md.num_row_groups == 0:
                # zero-row-group shard (external writers emit these): give
                # it an empty-range fragment so it is still validated (as 0
                # rows), manifested, and counted — exactly like file mode —
                # instead of silently vanishing from every resumed plan.
                # read_row_groups([]) yields the typed empty table.
                key = f"{p}#rg0--1"
                frag_of[key] = (p, 0, -1)
                keys.append(key)
                continue
            lo, acc = 0, 0
            for i in range(md.num_row_groups):
                acc += md.row_group(i).num_rows
                if acc >= fragment_rows or i == md.num_row_groups - 1:
                    key = f"{p}#rg{lo}-{i}"
                    frag_of[key] = (p, lo, i)
                    keys.append(key)
                    lo, acc = i + 1, 0
    else:
        keys = input_files
    if resume:
        done = load_manifest(out_dir)
        # The manifest stores schema_digest per record precisely so a
        # resumed run can't silently sum verdicts produced under a
        # DIFFERENT schema into one report. Mixing is never meaningful —
        # refuse rather than warn.
        stale = sorted({
            rec["schema_digest"] for rec in done.values()
            if rec.get("schema_digest") not in (None, schema_digest)
        })
        if stale:
            raise PipelineUsageError(
                f"resume=True but {out_dir!r} holds verdicts for a different "
                f"schema (digest {stale[0][:12]}… vs current "
                f"{schema_digest[:12]}…) — rerun with resume=False or a "
                f"fresh out_dir"
            )
        # same refusal for a partition-unit switch: file-keyed and
        # fragment-keyed records never match each other's keys, so a mixed
        # out_dir would re-validate everything and double-count in
        # read_verdicts/read_violations
        mixed = sorted({
            rec["partition_unit"] for rec in done.values()
            if rec.get("partition_unit", "file") != partition_unit
        })
        if mixed:
            raise PipelineUsageError(
                f"resume=True but {out_dir!r} holds {mixed[0]!r}-keyed "
                f"partitions and this run uses partition_unit="
                f"{partition_unit!r} — rerun with resume=False or a fresh "
                f"out_dir"
            )
        # same refusal for a fragment_rows change: fragment keys are a
        # pure function of (file row-group layout, fragment_rows), so a
        # different value yields a disjoint key set — nothing would be
        # skipped and read_verdicts/read_violations would double-count
        if partition_unit == "fragment":
            stale_fr = sorted({
                rec["fragment_rows"] for rec in done.values()
                if rec.get("partition_unit") == "fragment"
                and rec.get("fragment_rows") not in (None, fragment_rows)
            })
            if stale_fr:
                raise PipelineUsageError(
                    f"resume=True but {out_dir!r} holds fragments planned "
                    f"at fragment_rows={stale_fr[0]} and this run uses "
                    f"{fragment_rows} — rerun with resume=False or the "
                    f"original fragment_rows"
                )
    else:
        # a fresh (resume=False) run into a previously-used out_dir must
        # not inherit its manifest: the uncommitted-wave sweep below keys
        # off manifest records, so stale wave_*.json files would survive
        # the sweep and report phantom partitions with deleted result dirs
        # (plus stale pids mixed into the fresh numbering)
        done = {}
        mdir = _manifest_dir(out_dir)
        if os.path.isdir(mdir):
            shutil.rmtree(mdir)
    # partition_id assignment persists across resumes: manifested paths keep
    # their committed pid; only unseen paths get fresh ids. (Assigning pids
    # from the sorted file list alone would renumber everything when a file
    # is added/removed between runs, silently mixing two numberings in the
    # violation/manifest outputs.)
    pid_of = {p: rec["partition_id"] for p, rec in done.items()}
    next_pid = max(pid_of.values(), default=-1) + 1
    for p in keys:
        if p not in pid_of:
            pid_of[p] = next_pid
            next_pid += 1
    todo = [p for p in keys if p not in done]

    # Sweep ALL uncommitted wave dirs (no manifest record → a killed or
    # abandoned attempt), not just the one this run is about to reuse:
    # read_violations/read_verdicts scan everything under results/, so a
    # stale dir whose wave_id is never reached again would otherwise leak
    # phantom rows forever.
    committed_waves = {rec["wave_id"] for rec in done.values()}
    results_root = os.path.join(out_dir, "results")
    if os.path.isdir(results_root):
        for d in os.listdir(results_root):
            if d.startswith("wave_") and d[5:].isdigit() and int(d[5:]) not in committed_waves:
                shutil.rmtree(os.path.join(results_root, d))

    wave_id = max(
        (rec["wave_id"] for rec in done.values()), default=-1
    ) + 1

    def _run_wave(wave_files: list[str], wave_id: int) -> None:
        wave_started = time.time()
        if partition_unit == "fragment":
            items = [
                {
                    "path": frag_of[k][0],
                    "rg_lo": frag_of[k][1],
                    "rg_hi": frag_of[k][2],
                    "key": k,
                }
                for k in wave_files
            ]

            def read_fragments(t: pa.Table) -> pa.Table:
                outs = []
                for path, lo, hi, key in zip(
                    t.column("path").to_pylist(),
                    t.column("rg_lo").to_pylist(),
                    t.column("rg_hi").to_pylist(),
                    t.column("key").to_pylist(),
                ):
                    tb = pq.ParquetFile(path).read_row_groups(
                        list(range(lo, hi + 1)), columns=[id_col, payload_col]
                    )
                    outs.append(
                        tb.append_column(
                            "path", pa.array([key] * tb.num_rows, pa.string())
                        )
                    )
                return pa.concat_tables(outs)

            # one block per fragment: each read task scans exactly its
            # contiguous row-group range (the fragment key rides along as
            # the "path" column, so pid mapping/manifests work unchanged)
            ds = rd.from_items(
                items, override_num_blocks=max(1, len(items))
            ).map_batches(read_fragments, batch_format="pyarrow", num_cpus=0.5)
        elif input_format == "jsonl":
            ds = rd.read_json(
                wave_files,
                include_paths=True,
                file_extensions=["jsonl", "json", "jsonl.gz", "json.gz"],
                ray_remote_args={"num_cpus": 0.5},
            ).select_columns([id_col, payload_col, "path"])
        else:
            ds = rd.read_parquet(
                wave_files,
                columns=[id_col, payload_col],
                include_paths=True,
                # read tasks at half a slot: more feed parallelism in the slots
                # the actor pool leaves free (measured +25% pipeline throughput)
                ray_remote_args={"num_cpus": 0.5},
            )
        tagged = ds.map_batches(
            ValidatorActor,
            fn_constructor_kwargs=dict(
                schema_text=schema_text,
                payload_col=payload_col,
                id_col=id_col,
                mode="tagged",
                path_to_pid=pid_of,
            ),
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency,
            num_cpus=actor_num_cpus,
            # the actor only reads the batch and emits new tables — safe to
            # skip Ray's defensive copy of the input block
            zero_copy_batch=True,
        )
        wave_dir = os.path.join(out_dir, "results", f"wave_{wave_id:06d}")
        # A killed attempt may have left parquet here WITHOUT a manifest
        # commit (the manifest write is the last step) — those files are by
        # construction uncommitted, and reading them alongside this
        # attempt's output would double-count the wave. Clear first.
        if os.path.isdir(wave_dir):
            shutil.rmtree(wave_dir)
        tagged.write_parquet(wave_dir)
        try:  # observability artifact: Ray's per-operator stage stats
            with open(os.path.join(wave_dir, "_ray_stats.txt"), "w") as f:
                f.write(tagged.stats())
        except Exception:
            pass

        # Roll up this wave's partial verdicts (tiny: ~1 row per batch) and
        # commit one manifest record per input file. Predicate pushdown on
        # `kind` keeps this read small. A wave whose partitions are ALL
        # empty (0-row shards) produces an empty tagged stream, and Ray
        # 2.49's write_parquet then writes no files — and may not even
        # create the directory — so guard before reading: such waves
        # commit their n_rows=0 manifest records instead of crashing
        # (on_corrupt="fail") or being forever mis-skipped as corrupt
        # (on_corrupt="skip" would re-fail them on every resume).
        pq_files = (
            [f for f in os.listdir(wave_dir) if f.endswith(".parquet")]
            if os.path.isdir(wave_dir)
            else []
        )
        if pq_files:
            partials = pq.read_table(
                wave_dir, filters=[("kind", "=", "verdict")]
            )
            agg = (
                partials.group_by("partition_id")
                .aggregate([("n_rows", "sum"), ("n_valid", "sum")])
                .to_pylist()
            )
        else:
            agg = []
        by_pid = {r["partition_id"]: r for r in agg}
        now = time.time()
        records = []
        for p in wave_files:
            pid = pid_of[p]
            r = by_pid.get(pid, {"n_rows_sum": 0, "n_valid_sum": 0})
            records.append(
                {
                    "input_path": p,
                    "partition_id": pid,
                    "wave_id": wave_id,
                    "n_rows": int(r["n_rows_sum"]),
                    "n_valid": int(r["n_valid_sum"]),
                    "n_invalid": int(r["n_rows_sum"] - r["n_valid_sum"]),
                    "schema_version": schema_version,
                    "schema_digest": schema_digest,
                    "partition_unit": partition_unit,
                    "fragment_rows": (
                        fragment_rows if partition_unit == "fragment" else None
                    ),
                    "started_at": wave_started,
                    "finished_at": now,
                    "wall_s": round(now - wave_started, 3),
                }
            )
        _commit_manifest(out_dir, wave_id, records)

    for w0 in range(0, len(todo), wave_size):
        wave_files = todo[w0 : w0 + wave_size]
        if on_corrupt != "skip":
            _run_wave(wave_files, wave_id)
            wave_id += 1
            continue
        try:
            _run_wave(wave_files, wave_id)
            wave_id += 1
        except Exception as e:
            # retry-bisect: zero cost on the happy path; a poisoned wave
            # re-runs one partition at a time so every healthy partition
            # still commits, and only the truly bad ones are skipped
            logger.warning(
                "on_corrupt=skip: wave %d failed (%s) — retrying its %d "
                "partition(s) individually",
                wave_id,
                f"{type(e).__name__}: {e}"[:200],
                len(wave_files),
            )
            for p in wave_files:
                try:
                    _run_wave([p], wave_id)
                    wave_id += 1
                except Exception as e2:
                    _record_failure(p, e2)
                    # the failed attempt's uncommitted wave dir must not
                    # leak rows into read_violations/read_verdicts before
                    # the next run's sweep cleans it
                    bad_dir = os.path.join(
                        out_dir, "results", f"wave_{wave_id:06d}"
                    )
                    if os.path.isdir(bad_dir):
                        shutil.rmtree(bad_dir)

    manifest = load_manifest(out_dir)
    # Report over THIS run's input set only: a reused out_dir may hold
    # manifest records for files that are not in input_files this time,
    # and summing those would claim totals for inputs this run was never
    # given. (read_verdicts/read_violations still span the whole out_dir —
    # that is their documented cross-run contract.)
    run_records = [manifest[p] for p in keys if p in manifest]
    n_rows = sum(r["n_rows"] for r in run_records)
    n_valid = sum(r["n_valid"] for r in run_records)
    return {
        "n_files": len(keys),
        "n_files_skipped": sum(1 for p in keys if p in done),
        "n_failed": len(failed),
        "n_rows": n_rows,
        "n_valid": n_valid,
        "n_invalid": n_rows - n_valid,
        "wall_s": time.time() - t_start,
        "partitions": sorted(run_records, key=lambda r: r["partition_id"]),
        "failed": [
            {"input_path": k, "error": failed[k]} for k in sorted(failed)
        ],
    }


def summarize_run(out_dir: str) -> dict:
    """Driver-side summary of everything COMMITTED into ``out_dir`` so
    far — pure manifest/failures reads, no Ray session. This is the
    surface an operator polls between (or after) invocations of a long
    resumable run: totals span every run into the out_dir, unlike the
    per-run report ``run_validation_pipeline`` returns.

    ``failed_unresolved`` lists partitions with a failure record
    (``on_corrupt="skip"``) and still no manifest record — exactly the
    set a resume would retry."""
    manifest = load_manifest(out_dir)
    records = sorted(manifest.values(), key=lambda r: r["partition_id"])
    n_rows = sum(r["n_rows"] for r in records)
    n_valid = sum(r["n_valid"] for r in records)
    # wall_s is recorded per wave (duplicated on each of the wave's
    # records) — sum each wave once
    wave_wall = {r["wave_id"]: r.get("wall_s", 0.0) for r in records}

    def _resolved(path: str) -> bool:
        # exact manifest key (file key, or fragment key when the failure
        # was recorded mid-wave), OR a footer-planning failure whose file
        # was later repaired and committed under fragment keys
        return path in manifest or any(
            k.startswith(path + "#rg") for k in manifest
        )

    failed_unresolved = sorted(
        p for p in {f["input_path"] for f in read_failures(out_dir)}
        if not _resolved(p)
    )
    return {
        "out_dir": out_dir,
        "n_partitions": len(records),
        "n_rows": n_rows,
        "n_valid": n_valid,
        "n_invalid": n_rows - n_valid,
        "n_waves": len(wave_wall),
        "wall_s_committed": round(sum(wave_wall.values()), 3),
        "schema_digests": sorted(
            {r["schema_digest"] for r in records if r.get("schema_digest")}
        ),
        "partition_units": sorted(
            {r.get("partition_unit", "file") for r in records}
        ),
        "n_failed_unresolved": len(failed_unresolved),
        "failed_unresolved": failed_unresolved,
    }


def read_failures(out_dir: str) -> list[dict]:
    """Partitions skipped by ``on_corrupt="skip"`` across every run into
    ``out_dir`` (append-only ``failures.jsonl``; a partition later
    validated on resume still keeps its historical failure lines — check
    the manifest for current state)."""
    path = os.path.join(out_dir, "failures.jsonl")
    if not os.path.exists(path):
        return []
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]


def read_violations(out_dir: str) -> pa.Table:
    """All violation rows written so far: (partition_id, url, schema_path,
    failed_specifier, detail). Typed-empty when no wave has produced any
    output yet (all-empty input shards write no parquet at all)."""
    cols = ["partition_id", "url", "schema_path", "failed_specifier", "detail"]
    res = os.path.join(out_dir, "results")
    have = os.path.isdir(res) and any(
        f.endswith(".parquet") for _, _, fs in os.walk(res) for f in fs
    )
    if not have:
        return RESULT_SCHEMA.empty_table().select(cols)
    t = pq.read_table(res, filters=[("kind", "=", "violation")])
    return t.select(cols)


def read_verdicts(out_dir: str) -> pa.Table:
    """Per-partition verdicts from the manifest: (partition_id, n_rows,
    n_valid, n_invalid, passed)."""
    manifest = sorted(load_manifest(out_dir).values(), key=lambda r: r["partition_id"])
    return pa.table(
        {
            "partition_id": pa.array([r["partition_id"] for r in manifest], pa.int64()),
            "n_rows": pa.array([r["n_rows"] for r in manifest], pa.int64()),
            "n_valid": pa.array([r["n_valid"] for r in manifest], pa.int64()),
            "n_invalid": pa.array([r["n_invalid"] for r in manifest], pa.int64()),
            "passed": pa.array([r["n_invalid"] == 0 for r in manifest], pa.bool_()),
        }
    )
