"""End-to-end Ray pipeline tests on the synthetic web-page table:
violation-row exactness vs the per-row oracle, per-partition verdicts,
resume-from-checkpoint, and the byte-identical text invariant."""

import hashlib
import os
import shutil

import pyarrow.parquet as pq
import pytest

from medea_ray.fixtures.gen import (
    expected_violations_chunk,
    flagship_schema_text,
    gen_pages_chunk,
    write_pages,
)
from medea_ray.engine.pipeline import (
    load_manifest,
    read_verdicts,
    read_violations,
    run_validation_pipeline,
    validate_dataset,
)

N_ROWS = 4000
ROWS_PER_FILE = 1000


@pytest.fixture(scope="module")
def pages_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("pages")
    write_pages(str(d), N_ROWS, rows_per_file=ROWS_PER_FILE)
    return str(d)


def _mkey(manifest: dict, path: str) -> str:
    """Manifest key for an input file under either partition unit (the
    round-5 default keys parquet by fragment: 'path#rgLO-HI')."""
    if path in manifest:
        return path
    ks = [k for k in manifest if k.startswith(path + "#")]
    assert len(ks) == 1, (path, ks)
    return ks[0]


def _expected_violation_set():
    return {
        (url, path, spec)
        for url, path, spec in expected_violations_chunk(0, N_ROWS)
    }


def test_pipeline_end_to_end(ray_session, pages_dir, tmp_path):
    out = str(tmp_path / "out")
    files = sorted(
        os.path.join(pages_dir, f) for f in os.listdir(pages_dir) if f.endswith(".parquet")
    )
    report = run_validation_pipeline(
        files, flagship_schema_text(), out, wave_size=2, concurrency=2
    )
    assert report["n_rows"] == N_ROWS
    exp = _expected_violation_set()
    assert report["n_invalid"] == len(exp)

    got = read_violations(out)
    got_set = set(
        zip(
            got["url"].to_pylist(),
            got["schema_path"].to_pylist(),
            got["failed_specifier"].to_pylist(),
        )
    )
    assert got_set == exp

    # lineage completeness (SURVEY §4.3): every manifest record carries
    # partition identity, counts, schema identity and timing
    for rec in load_manifest(out).values():
        for field in (
            "input_path", "partition_id", "wave_id", "n_rows", "n_valid",
            "n_invalid", "schema_version", "schema_digest", "started_at",
            "finished_at", "wall_s",
        ):
            assert field in rec, field
        assert rec["finished_at"] >= rec["started_at"]

    verdicts = read_verdicts(out)
    assert verdicts.num_rows == N_ROWS // ROWS_PER_FILE
    assert sum(verdicts["n_rows"].to_pylist()) == N_ROWS
    # every partition has seeded defects → none passes clean
    assert not any(verdicts["passed"].to_pylist())

    # resume: a second run must skip every manifested file and change nothing
    before = load_manifest(out)
    report2 = run_validation_pipeline(
        files, flagship_schema_text(), out, wave_size=2, concurrency=2
    )
    assert report2["n_files_skipped"] == len(files)
    assert load_manifest(out) == before
    assert report2["n_rows"] == N_ROWS


def test_pipeline_resume_after_partial_run(ray_session, pages_dir, tmp_path):
    out = str(tmp_path / "out_partial")
    files = sorted(
        os.path.join(pages_dir, f) for f in os.listdir(pages_dir) if f.endswith(".parquet")
    )
    # simulate a killed run: only the first two files were processed
    run_validation_pipeline(
        files[:2], flagship_schema_text(), out, wave_size=2, concurrency=2
    )
    assert len(load_manifest(out)) == 2
    # resumed full run processes only the remaining files...
    report = run_validation_pipeline(
        files, flagship_schema_text(), out, wave_size=2, concurrency=2
    )
    assert report["n_files_skipped"] == 2
    # ...and the combined outputs are complete and exact
    assert report["n_rows"] == N_ROWS
    got = read_violations(out)
    got_set = set(
        zip(
            got["url"].to_pylist(),
            got["schema_path"].to_pylist(),
            got["failed_specifier"].to_pylist(),
        )
    )
    # resume-after-kill produces outputs identical (as a set) to a
    # single uninterrupted run — same violation rows, same verdicts
    assert got_set == _expected_violation_set()
    verdicts = read_verdicts(out)
    assert sum(verdicts["n_rows"].to_pylist()) == N_ROWS
    assert sum(verdicts["n_invalid"].to_pylist()) == len(got_set)


def test_resume_mid_wave_kill_never_double_counts(ray_session, pages_dir, tmp_path):
    """Regression (round-2 advisor, high): a driver killed mid-wave leaves
    uncommitted parquet in the upcoming wave dir; the resumed run must clear
    it, or the roll-up reads both attempts and inflates counts permanently."""
    out = str(tmp_path / "out_killed")
    files = sorted(
        os.path.join(pages_dir, f) for f in os.listdir(pages_dir) if f.endswith(".parquet")
    )
    run_validation_pipeline(
        files[:2], flagship_schema_text(), out, wave_size=2, concurrency=2
    )
    # simulate the killed attempt: stale (uncommitted) result parquet sits in
    # the wave dir the resume is about to reuse
    stale = os.path.join(out, "results", "wave_000001")
    shutil.copytree(os.path.join(out, "results", "wave_000000"), stale)
    report = run_validation_pipeline(
        files, flagship_schema_text(), out, wave_size=2, concurrency=2
    )
    assert report["n_rows"] == N_ROWS  # not N_ROWS + the stale wave's rows
    got = read_violations(out)
    got_set = set(
        zip(
            got["url"].to_pylist(),
            got["schema_path"].to_pylist(),
            got["failed_specifier"].to_pylist(),
        )
    )
    assert got_set == _expected_violation_set()
    assert got.num_rows == len(got_set)  # no duplicated violation rows either
    verdicts = read_verdicts(out)
    assert sum(verdicts["n_rows"].to_pylist()) == N_ROWS


def test_orphaned_uncommitted_wave_dirs_swept(ray_session, pages_dir, tmp_path):
    """A stale wave dir whose wave_id is never reused (input files removed
    between runs) must still be swept on resume — read_violations scans
    everything under results/, so it would leak phantom rows forever."""
    out = str(tmp_path / "out_orphan")
    files = sorted(
        os.path.join(pages_dir, f) for f in os.listdir(pages_dir) if f.endswith(".parquet")
    )
    run_validation_pipeline(
        files[:2], flagship_schema_text(), out, wave_size=2, concurrency=2
    )
    # an uncommitted attempt at a wave id the next (smaller) run never reaches
    stale = os.path.join(out, "results", "wave_000009")
    shutil.copytree(os.path.join(out, "results", "wave_000000"), stale)
    run_validation_pipeline(
        files[:2], flagship_schema_text(), out, wave_size=2, concurrency=2
    )
    assert not os.path.isdir(stale)
    got = read_violations(out)
    exp = {
        (url, path, spec)
        for url, path, spec in expected_violations_chunk(0, 2 * ROWS_PER_FILE)
    }
    assert got.num_rows == len(exp)


def test_resume_pid_stable_when_input_set_changes(ray_session, pages_dir, tmp_path):
    """Regression (round-2 advisor): partition ids are committed in the
    manifest and survive a resume with an added input file — earlier
    violation/manifest rows keep pointing at the right partitions."""
    out = str(tmp_path / "out_pids")
    files = sorted(
        os.path.join(pages_dir, f) for f in os.listdir(pages_dir) if f.endswith(".parquet")
    )
    run_validation_pipeline(
        files[1:], flagship_schema_text(), out, wave_size=4, concurrency=2
    )
    first = {p: r["partition_id"] for p, r in load_manifest(out).items()}
    # resume with a file that sorts BEFORE the processed ones
    report = run_validation_pipeline(
        files, flagship_schema_text(), out, wave_size=4, concurrency=2
    )
    assert report["n_files_skipped"] == len(files) - 1
    manifest = load_manifest(out)
    for p, pid in first.items():
        assert manifest[p]["partition_id"] == pid  # unchanged
    new_pid = manifest[_mkey(manifest, files[0])]["partition_id"]
    assert new_pid == max(first.values()) + 1  # fresh id, no renumbering
    assert report["n_rows"] == N_ROWS


def test_validate_dataset_transform(ray_session, pages_dir):
    import ray.data as rd

    ds = rd.read_parquet(pages_dir, columns=["url", "payload"])
    out = validate_dataset(ds, flagship_schema_text(), concurrency=2)
    df = out.to_pandas()
    assert len(df) == N_ROWS
    assert (~df["valid"]).sum() == len(_expected_violation_set())
    bad = df[~df["valid"]]
    assert set(bad["failed_specifier"]) == {
        "not_one_of_options",
        "additional_prop_banned",
        "required_prop_missing",
        "out_of_bounds_array_length",
    }


def test_text_byte_identity(pages_dir):
    # E12 (BASELINE.json input_hint): extracted text must round-trip
    # byte-identically — generation is pure in (seed, i), and the parquet
    # files pass through Arrow untouched.
    t1 = pq.read_table(os.path.join(pages_dir, "pages_00001.parquet"), columns=["url", "text"])
    t2 = gen_pages_chunk(ROWS_PER_FILE, ROWS_PER_FILE)
    def digest(tbl):
        return {
            u: (hashlib.sha256(x.encode()).hexdigest() if x is not None else None)
            for u, x in zip(tbl["url"].to_pylist(), tbl["text"].to_pylist())
        }
    assert digest(t1) == digest(t2.select(["url", "text"]))


def test_actor_death_mid_run_recovers(ray_session, pages_dir):
    """A validator actor process dying mid-batch (simulated worker/node
    loss) must not lose or duplicate rows — Ray restarts the actor and
    retries the task (SURVEY §4.2)."""
    import ray.data as rd
    import pyarrow as pa

    from medea_ray.engine.pipeline import ValidatorActor

    kill_flag = os.path.join(pages_dir, "killed.flag")
    if os.path.exists(kill_flag):
        os.unlink(kill_flag)

    class CrashyValidator(ValidatorActor):
        def __call__(self, batch: pa.Table) -> pa.Table:
            if not os.path.exists(kill_flag):
                try:
                    with open(kill_flag, "x") as f:
                        f.write(str(os.getpid()))
                    os._exit(1)  # hard process death, not an exception
                except FileExistsError:
                    pass
            return super().__call__(batch)

    ds = rd.read_parquet(pages_dir, columns=["url", "payload"])
    out = ds.map_batches(
        CrashyValidator,
        fn_constructor_kwargs=dict(schema_text=flagship_schema_text(), mode="rows"),
        batch_format="pyarrow",
        batch_size=512,
        concurrency=2,
        num_cpus=1,
        max_restarts=2,
        max_task_retries=2,
    )
    rows = out.take_all()
    assert os.path.exists(kill_flag)  # the kill really happened
    assert len(rows) == N_ROWS
    assert sum(not r["valid"] for r in rows) == len(_expected_violation_set())


def _copy_pages(pages_dir, dest) -> list[str]:
    shutil.copytree(pages_dir, dest)
    return sorted(
        os.path.join(dest, f) for f in os.listdir(dest) if f.endswith(".parquet")
    )


def test_on_corrupt_skip_commits_healthy_and_resume_retries(
    ray_session, pages_dir, tmp_path
):
    files = _copy_pages(pages_dir, str(tmp_path / "pages_bad"))
    bad = files[1]
    good_bytes = open(bad, "rb").read()
    with open(bad, "wb") as f:
        f.write(good_bytes[: len(good_bytes) // 2])  # truncated: no footer

    # default policy surfaces the error
    with pytest.raises(Exception):
        run_validation_pipeline(
            files, flagship_schema_text(), str(tmp_path / "out_fail"),
            wave_size=len(files), concurrency=2,
        )

    # skip policy: the poisoned wave bisects, healthy partitions commit
    out = str(tmp_path / "out_skip")
    report = run_validation_pipeline(
        files, flagship_schema_text(), out,
        wave_size=len(files), concurrency=2, on_corrupt="skip",
    )
    assert report["n_failed"] == 1
    assert report["failed"][0]["input_path"] == bad
    assert report["n_rows"] == N_ROWS - ROWS_PER_FILE
    assert len(load_manifest(out)) == len(files) - 1
    assert os.path.exists(os.path.join(out, "failures.jsonl"))
    from medea_ray.engine.checkpoint import read_failures

    fails = read_failures(out)
    assert len(fails) == 1 and fails[0]["input_path"] == bad and fails[0]["error"]
    # no phantom rows from the failed attempt
    assert sum(read_verdicts(out)["n_rows"].to_pylist()) == N_ROWS - ROWS_PER_FILE

    # repair the shard; resume retries EXACTLY the failed partition
    with open(bad, "wb") as f:
        f.write(good_bytes)
    report2 = run_validation_pipeline(
        files, flagship_schema_text(), out,
        wave_size=len(files), concurrency=2, on_corrupt="skip",
    )
    assert report2["n_failed"] == 0
    assert report2["n_files_skipped"] == len(files) - 1
    assert report2["n_rows"] == N_ROWS
    assert sum(read_verdicts(out)["n_rows"].to_pylist()) == N_ROWS


def test_on_corrupt_skip_fragment_planning_failure(ray_session, pages_dir, tmp_path):
    from medea_ray.engine.pipeline import summarize_run

    files = _copy_pages(pages_dir, str(tmp_path / "pages_bad_frag"))
    bad = files[0]
    good_bytes = open(bad, "rb").read()
    with open(bad, "wb") as f:
        f.write(b"PAR1 not really parquet")  # footer unreadable at planning
    out = str(tmp_path / "out_frag_skip")
    report = run_validation_pipeline(
        files, flagship_schema_text(), out,
        wave_size=8, concurrency=2,
        partition_unit="fragment", fragment_rows=500, on_corrupt="skip",
    )
    assert report["n_failed"] == 1
    assert report["failed"][0]["input_path"] == bad
    assert report["n_rows"] == N_ROWS - ROWS_PER_FILE
    # the summary flags the BARE failure path as unresolved...
    assert summarize_run(out)["failed_unresolved"] == [bad]
    # ...and resolves it after the shard is repaired and a resume commits
    # it under FRAGMENT keys (the failure was recorded under the bare
    # file path — prefix matching, not exact-key matching, decides)
    with open(bad, "wb") as f:
        f.write(good_bytes)
    report2 = run_validation_pipeline(
        files, flagship_schema_text(), out,
        wave_size=8, concurrency=2,
        partition_unit="fragment", fragment_rows=500, on_corrupt="skip",
    )
    assert report2["n_failed"] == 0 and report2["n_rows"] == N_ROWS
    s = summarize_run(out)
    assert s["failed_unresolved"] == [] and s["n_failed_unresolved"] == 0
    assert s["n_rows"] == N_ROWS


def test_jsonl_input_format_matches_parquet(ray_session, tmp_path):
    """The JSONL source path produces byte-identical verdicts and violation
    rows to the parquet path over the same generated rows."""
    jl_dir = str(tmp_path / "pages_jl")
    files = write_pages(jl_dir, 2000, rows_per_file=1000, fmt="jsonl")
    assert all(f.endswith(".jsonl") for f in files)
    out = str(tmp_path / "out_jl")
    report = run_validation_pipeline(
        files, flagship_schema_text(), out, wave_size=1, concurrency=2,
        input_format="jsonl",
    )
    assert report["n_rows"] == 2000
    exp = {(u, p, s) for u, p, s in expected_violations_chunk(0, 2000)}
    assert report["n_invalid"] == len(exp)
    got = read_violations(out)
    got_set = set(zip(
        got["url"].to_pylist(),
        got["schema_path"].to_pylist(),
        got["failed_specifier"].to_pylist(),
    ))
    assert got_set == exp
    # resume: a second run skips every committed file
    report2 = run_validation_pipeline(
        files, flagship_schema_text(), out, wave_size=1, concurrency=2,
        input_format="jsonl",
    )
    assert report2["n_files_skipped"] == len(files)


def test_gzipped_jsonl_output_is_byte_stable(tmp_path, monkeypatch):
    """The same (seed, index) chunk must produce the SAME BYTES wherever
    and whenever it is written — resume and parallel generation rely on
    it. A GzipFile opened by path embeds the (PID-suffixed tmp) filename
    in the gzip FNAME header and silently breaks this across worker
    processes, so the writer must gzip through a fileobj with an empty
    filename; the fake pids below reproduce the cross-process layout."""
    from medea_ray.fixtures import gen as genmod

    monkeypatch.setattr(genmod.os, "getpid", lambda: 11111)
    a = write_pages(str(tmp_path / "a"), 500, rows_per_file=500, fmt="jsonl.gz")
    monkeypatch.setattr(genmod.os, "getpid", lambda: 22222)
    b = write_pages(str(tmp_path / "b"), 500, rows_per_file=500, fmt="jsonl.gz")
    with open(a[0], "rb") as fa, open(b[0], "rb") as fb:
        assert fa.read() == fb.read()


def test_gzipped_jsonl_input_matches_parquet(ray_session, tmp_path):
    """.jsonl.gz inputs (the Common-Crawl export layout) ride the jsonl
    path — Ray/Arrow detect gzip by extension — and must produce the same
    verdict counts and violation rows as plain files, with per-file
    resume intact."""
    gz_dir = str(tmp_path / "pages_gz")
    files = write_pages(gz_dir, 2000, rows_per_file=1000, fmt="jsonl.gz")
    assert all(f.endswith(".jsonl.gz") for f in files)
    out = str(tmp_path / "out_gz")
    report = run_validation_pipeline(
        files, flagship_schema_text(), out, wave_size=1, concurrency=2,
        input_format="jsonl",
    )
    assert report["n_rows"] == 2000
    exp = {(u, p, s) for u, p, s in expected_violations_chunk(0, 2000)}
    assert report["n_invalid"] == len(exp)
    got = read_violations(out)
    got_set = set(zip(
        got["url"].to_pylist(),
        got["schema_path"].to_pylist(),
        got["failed_specifier"].to_pylist(),
    ))
    assert got_set == exp
    report2 = run_validation_pipeline(
        files, flagship_schema_text(), out, wave_size=1, concurrency=2,
        input_format="jsonl",
    )
    assert report2["n_files_skipped"] == len(files)


def test_bad_input_format_raises(ray_session, tmp_path):
    with pytest.raises(ValueError, match="input_format"):
        run_validation_pipeline(
            ["x.csv"], flagship_schema_text(), str(tmp_path / "o"),
            input_format="csv",
        )


def test_fresh_run_clears_stale_manifest(ray_session, pages_dir, tmp_path):
    """Regression (round-2 advisor): resume=False into a used out_dir must
    not inherit the old manifest — a smaller rerun would otherwise report
    phantom partitions whose result dirs the sweep deleted."""
    out = str(tmp_path / "out_fresh")
    files = sorted(
        os.path.join(pages_dir, f) for f in os.listdir(pages_dir) if f.endswith(".parquet")
    )
    run_validation_pipeline(
        files, flagship_schema_text(), out, wave_size=2, concurrency=2
    )
    assert len(load_manifest(out)) == len(files)
    # fresh (non-resume) rerun over FEWER files: manifest and verdicts must
    # describe only the new run
    report = run_validation_pipeline(
        files[:1], flagship_schema_text(), out, wave_size=2, concurrency=2,
        resume=False,
    )
    manifest = load_manifest(out)
    # keys are fragment-qualified under the round-5 default
    assert {k.split("#")[0] for k in manifest} == set(files[:1])
    assert report["n_files_skipped"] == 0
    verdicts = read_verdicts(out)
    assert verdicts.num_rows == 1
    assert sum(verdicts["n_rows"].to_pylist()) == report["n_rows"]


def test_resume_rejects_schema_change(ray_session, pages_dir, tmp_path):
    """A resumed run over verdicts produced under a DIFFERENT schema must
    refuse — summing two schemas' verdicts into one report is never
    meaningful, and the manifest carries schema_digest to detect it."""
    out = str(tmp_path / "out_schema_change")
    files = sorted(
        os.path.join(pages_dir, f) for f in os.listdir(pages_dir) if f.endswith(".parquet")
    )
    run_validation_pipeline(
        files[:1], flagship_schema_text(), out, wave_size=2, concurrency=2
    )
    # digest differs (loosened array bound); row counts are unaffected
    changed = flagship_schema_text().replace("$max-length 5", "$max-length 99")
    assert changed != flagship_schema_text()
    with pytest.raises(ValueError, match="different"):
        run_validation_pipeline(
            files, changed, out, wave_size=2, concurrency=2
        )
    # resume=False into the same out_dir accepts the new schema (fresh run)
    report = run_validation_pipeline(
        files, changed, out, wave_size=2, concurrency=2, resume=False
    )
    assert report["n_rows"] == N_ROWS


def test_report_scoped_to_this_runs_inputs(ray_session, pages_dir, tmp_path):
    """A reused out_dir holding manifest records for files OUTSIDE this
    run's input list must not leak them into the returned totals."""
    out = str(tmp_path / "out_scoped")
    files = sorted(
        os.path.join(pages_dir, f) for f in os.listdir(pages_dir) if f.endswith(".parquet")
    )
    full = run_validation_pipeline(
        files, flagship_schema_text(), out, wave_size=4, concurrency=2
    )
    # resumed run over a SUBSET: totals describe the subset, not the dir
    sub = run_validation_pipeline(
        files[:1], flagship_schema_text(), out, wave_size=4, concurrency=2
    )
    assert sub["n_files"] == 1
    assert sub["n_files_skipped"] == 1
    man = load_manifest(out)
    assert sub["n_rows"] == man[_mkey(man, files[0])]["n_rows"]
    assert sub["n_rows"] < full["n_rows"]
    paths = [r["input_path"] for r in sub["partitions"]]
    assert len(paths) == 1 and paths[0].split("#")[0] == files[0]


# -- fragment-level partitions (VERDICT r03 item 9) ---------------------------


@pytest.fixture(scope="module")
def big_file_dir(tmp_path_factory, pages_dir):
    """All N_ROWS pages in ONE parquet file with 250-row row groups — the
    multi-GB-file shape partition_unit="fragment" exists for (file mode
    makes the whole file one partition, so a kill loses all of it)."""
    import pyarrow as pa

    d = tmp_path_factory.mktemp("bigfile")
    files = sorted(
        os.path.join(pages_dir, f) for f in os.listdir(pages_dir) if f.endswith(".parquet")
    )
    t = pa.concat_tables([pq.read_table(f) for f in files])
    pq.write_table(t, os.path.join(str(d), "big.parquet"), row_group_size=250)
    return str(d)


def test_fragment_mode_matches_file_mode(ray_session, big_file_dir, tmp_path):
    big = [os.path.join(big_file_dir, "big.parquet")]
    out_file = str(tmp_path / "by_file")
    out_frag = str(tmp_path / "by_frag")
    rep_file = run_validation_pipeline(
        big, flagship_schema_text(), out_file, wave_size=2, concurrency=2
    )
    rep_frag = run_validation_pipeline(
        big, flagship_schema_text(), out_frag, wave_size=4, concurrency=2,
        partition_unit="fragment", fragment_rows=500,
    )
    # 4000 rows in 250-row groups, 500 rows/fragment -> 8 fragments
    assert rep_file["n_files"] == 1 and rep_frag["n_files"] == 8
    assert rep_frag["n_rows"] == rep_file["n_rows"] == N_ROWS
    assert rep_frag["n_invalid"] == rep_file["n_invalid"]

    def viol_set(out):
        got = read_violations(out)
        return set(
            zip(
                got["url"].to_pylist(),
                got["schema_path"].to_pylist(),
                got["failed_specifier"].to_pylist(),
            )
        )

    assert viol_set(out_frag) == viol_set(out_file) == _expected_violation_set()
    man = load_manifest(out_frag)
    assert all("#rg" in k for k in man)
    assert sorted(r["partition_id"] for r in man.values()) == list(range(8))
    assert sum(r["n_rows"] for r in man.values()) == N_ROWS


def test_fragment_resume_bounds_lost_work(ray_session, big_file_dir, tmp_path):
    """A driver killed before a wave commit loses only that wave's
    FRAGMENTS of the big file, never the whole file: the resumed run skips
    every committed fragment and the combined outputs stay exact."""
    big = [os.path.join(big_file_dir, "big.parquet")]
    out = str(tmp_path / "frag_kill")
    run_validation_pipeline(
        big, flagship_schema_text(), out, wave_size=3, concurrency=2,
        partition_unit="fragment", fragment_rows=500,
    )
    # simulate the kill: the LAST wave (2 of 8 fragments) never committed —
    # drop its manifest record, leave its now-uncommitted results behind
    mdir = os.path.join(out, "_manifest")
    waves = sorted(os.listdir(mdir))
    os.remove(os.path.join(mdir, waves[-1]))
    rep = run_validation_pipeline(
        big, flagship_schema_text(), out, wave_size=3, concurrency=2,
        partition_unit="fragment", fragment_rows=500,
    )
    assert rep["n_files_skipped"] == 6  # one wave of fragments lost, not the file
    assert rep["n_rows"] == N_ROWS
    got = read_violations(out)
    got_set = set(
        zip(
            got["url"].to_pylist(),
            got["schema_path"].to_pylist(),
            got["failed_specifier"].to_pylist(),
        )
    )
    assert got_set == _expected_violation_set()
    assert got.num_rows == len(got_set)  # no double-counted rows
    verdicts = read_verdicts(out)
    assert sum(verdicts["n_rows"].to_pylist()) == N_ROWS


def test_summarize_run_and_report_cli(ray_session, pages_dir, tmp_path):
    """summarize_run reads only committed manifests (cross-run totals,
    no Ray session) and the `report` CLI wraps it — an operator can poll
    a long resumable run without touching Ray or re-running anything."""
    import json as _json
    import subprocess
    import sys

    from medea_ray.engine.pipeline import summarize_run

    out = str(tmp_path / "out")
    rep = run_validation_pipeline(
        pages_dir_files(pages_dir), flagship_schema_text(), out,
        wave_size=2, concurrency=2,
    )
    s = summarize_run(out)
    assert s["n_partitions"] == 4
    assert s["n_rows"] == rep["n_rows"] == N_ROWS
    assert s["n_invalid"] == rep["n_invalid"]
    assert s["n_waves"] == 2
    assert s["partition_units"] == ["fragment"]  # the round-5 default
    assert len(s["schema_digests"]) == 1
    assert s["failed_unresolved"] == []
    # the CLI surface needs NO Ray session (pure file reads)
    r = subprocess.run(
        [sys.executable, "-m", "medea_ray", "report", "--out", out, "--partitions"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr
    cli = _json.loads(r.stdout)
    assert cli["n_rows"] == N_ROWS and len(cli["partitions"]) == 4
    # empty/unused dir: clean exit 2
    r2 = subprocess.run(
        [sys.executable, "-m", "medea_ray", "report", "--out", str(tmp_path / "nope")],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert r2.returncode == 2
    assert "no committed partitions" in r2.stderr


def pages_dir_files(pages_dir):
    return sorted(
        os.path.join(pages_dir, f)
        for f in os.listdir(pages_dir)
        if f.endswith(".parquet")
    )


def test_fragment_mode_includes_zero_row_group_files(
    ray_session, big_file_dir, tmp_path
):
    """A shard whose footer reports 0 row groups (external writers emit
    these; pyarrow's ParquetWriter does when closed without writing) must
    not vanish from the fragment plan: it gets an empty-range fragment,
    validates as 0 rows, and is manifested + counted exactly like file
    mode — so a resumed run never silently re-plans it to nothing."""
    import pyarrow as pa

    d = str(tmp_path / "in")
    os.makedirs(d)
    shutil.copy(
        os.path.join(big_file_dir, "big.parquet"), os.path.join(d, "big.parquet")
    )
    sch = pa.schema([("url", pa.string()), ("payload", pa.string())])
    pq.ParquetWriter(os.path.join(d, "empty.parquet"), sch).close()
    assert pq.ParquetFile(os.path.join(d, "empty.parquet")).metadata.num_row_groups == 0
    files = sorted(os.path.join(d, f) for f in os.listdir(d))
    out = str(tmp_path / "out")
    rep = run_validation_pipeline(
        files, flagship_schema_text(), out, wave_size=16, concurrency=2,
        partition_unit="fragment", fragment_rows=500,
    )
    assert rep["n_files"] == 9  # 8 fragments of big + the empty shard
    assert rep["n_rows"] == N_ROWS
    man = load_manifest(out)
    empty_keys = [k for k in man if "empty.parquet" in k]
    assert len(empty_keys) == 1
    assert man[empty_keys[0]]["n_rows"] == 0
    # resume: the empty shard is a committed partition, skipped not re-planned
    rep2 = run_validation_pipeline(
        files, flagship_schema_text(), out, wave_size=16, concurrency=2,
        partition_unit="fragment", fragment_rows=500,
    )
    assert rep2["n_files"] == 9 and rep2["n_files_skipped"] == 9


def test_all_empty_wave_commits_zero_row_manifests(ray_session, tmp_path):
    """A wave whose partitions are ALL empty writes no parquet at all
    (Ray 2.49 write_parquet skips empty datasets, without even creating
    the directory) — the manifest rollup must commit n_rows=0 records
    rather than crash (on_corrupt=fail) or mis-record healthy shards as
    corrupt forever (on_corrupt=skip). Covers both partition units, plus
    typed-empty read_violations and a resume that skips everything."""
    import pyarrow as pa

    d = str(tmp_path / "in")
    os.makedirs(d)
    sch = pa.schema([("url", pa.string()), ("payload", pa.string())])
    pq.ParquetWriter(os.path.join(d, "norg.parquet"), sch).close()  # 0 row groups
    pq.write_table(sch.empty_table(), os.path.join(d, "zero.parquet"))  # 1 rg, 0 rows
    files = sorted(os.path.join(d, f) for f in os.listdir(d))

    out = str(tmp_path / "by_file")
    rep = run_validation_pipeline(files, flagship_schema_text(), out, concurrency=2)
    assert rep["n_files"] == 2 and rep["n_rows"] == 0 and rep["n_failed"] == 0
    man = load_manifest(out)
    assert len(man) == 2 and all(r["n_rows"] == 0 for r in man.values())
    assert read_violations(out).num_rows == 0
    assert sum(read_verdicts(out)["n_rows"].to_pylist()) == 0
    rep2 = run_validation_pipeline(files, flagship_schema_text(), out, concurrency=2)
    assert rep2["n_files_skipped"] == 2

    out_frag = str(tmp_path / "by_frag")
    rep3 = run_validation_pipeline(
        files, flagship_schema_text(), out_frag, concurrency=2,
        partition_unit="fragment", fragment_rows=500,
    )
    assert rep3["n_files"] == 2 and rep3["n_rows"] == 0 and rep3["n_failed"] == 0


def test_fragment_rows_switch_on_resume_is_refused(
    ray_session, big_file_dir, tmp_path
):
    """Fragment keys are a pure function of (row-group layout,
    fragment_rows): resuming with a different fragment_rows would match
    no committed key, re-validate everything, and double-count in
    read_verdicts/read_violations — refused like a unit/schema switch."""
    from medea_ray.engine.pipeline import PipelineUsageError

    big = [os.path.join(big_file_dir, "big.parquet")]
    out = str(tmp_path / "fr")
    run_validation_pipeline(
        big, flagship_schema_text(), out, wave_size=4, concurrency=2,
        partition_unit="fragment", fragment_rows=500,
    )
    with pytest.raises(PipelineUsageError, match="fragment_rows"):
        run_validation_pipeline(
            big, flagship_schema_text(), out, wave_size=4, concurrency=2,
            partition_unit="fragment", fragment_rows=250,
        )
    # same value resumes cleanly
    rep = run_validation_pipeline(
        big, flagship_schema_text(), out, wave_size=4, concurrency=2,
        partition_unit="fragment", fragment_rows=500,
    )
    assert rep["n_files_skipped"] == 8


def test_fragment_mode_guards(ray_session, big_file_dir, tmp_path):
    from medea_ray.engine.pipeline import PipelineUsageError

    big = [os.path.join(big_file_dir, "big.parquet")]
    # usage errors are the dedicated subclass (the CLI maps exactly it to
    # exit 2; worker-side ValueErrors like ArrowInvalid keep tracebacks)
    with pytest.raises(PipelineUsageError, match="requires parquet"):
        run_validation_pipeline(
            big, flagship_schema_text(), str(tmp_path / "x"),
            partition_unit="fragment", input_format="jsonl",
        )
    with pytest.raises(PipelineUsageError, match="partition_unit"):
        run_validation_pipeline(
            big, flagship_schema_text(), str(tmp_path / "y"),
            partition_unit="rowgroup",
        )
    # switching units on a populated out_dir is refused, not mixed
    # (explicit file mode first: the default is fragment since round 5)
    out = str(tmp_path / "mixed")
    run_validation_pipeline(
        big, flagship_schema_text(), out, wave_size=2, concurrency=2,
        partition_unit="file",
    )
    with pytest.raises(PipelineUsageError, match="partition_unit"):
        run_validation_pipeline(
            big, flagship_schema_text(), out, wave_size=2, concurrency=2,
            partition_unit="fragment",
        )
