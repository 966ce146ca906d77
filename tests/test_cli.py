"""End-to-end CLI tests (python -m medea_ray)."""

import json
import os
import subprocess
import sys

from medea_ray.fixtures.gen import FLAGSHIP_SCHEMA_PATH, write_pages


def _run(*args, env=None):
    e = dict(os.environ)
    if env:
        e.update(env)
    return subprocess.run(
        [sys.executable, "-m", "medea_ray", *args],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        env=e,
    )


def test_cli_validate_file(tmp_path):
    doc = tmp_path / "doc.json"
    doc.write_text('{"url": "https://a/b", "lang": "en", "meta": {"len": 3}, "tags": []}')
    r = _run("validate-file", FLAGSHIP_SCHEMA_PATH, str(doc))
    assert r.returncode == 0, r.stderr
    assert json.loads(r.stdout)["valid"] is True

    bad = tmp_path / "bad.json"
    bad.write_text('{"url": "https://a/b", "tags": []}')  # missing required meta
    r = _run("validate-file", FLAGSHIP_SCHEMA_PATH, str(bad))
    assert r.returncode == 1
    out = json.loads(r.stdout)
    assert out["valid"] is False
    assert out["failed_specifier"] == "required_prop_missing"


def test_cli_gen_and_run(tmp_path):
    pages = tmp_path / "pages"
    r = _run("gen-pages", "--out", str(pages), "--rows", "2000", "--rows-per-file", "1000")
    assert r.returncode == 0, r.stderr
    assert json.loads(r.stdout)["files"] == 2

    out = tmp_path / "out"
    r = _run(
        "run",
        "--input",
        str(pages),
        "--schema",
        FLAGSHIP_SCHEMA_PATH,
        "--out",
        str(out),
        "--wave-size",
        "2",
        env={"RAY_ADDRESS": "local"},
    )
    assert r.returncode == 0, r.stderr
    report = json.loads(r.stdout.strip().splitlines()[-1])
    assert report["n_rows"] == 2000
    assert report["n_invalid"] == 100  # 5% seeded defects
    # resume: second invocation skips everything
    r2 = _run(
        "run",
        "--input",
        str(pages),
        "--schema",
        FLAGSHIP_SCHEMA_PATH,
        "--out",
        str(out),
        env={"RAY_ADDRESS": "local"},
    )
    assert r2.returncode == 0, r2.stderr
    report2 = json.loads(r2.stdout.strip().splitlines()[-1])
    assert report2["n_files_skipped"] == 2

    # --input pointing at a single parquet FILE (no glob chars) works too
    one = sorted(pages.glob("*.parquet"))[0]
    out2 = tmp_path / "out_one"
    r3 = _run(
        "run",
        "--input",
        str(one),
        "--schema",
        FLAGSHIP_SCHEMA_PATH,
        "--out",
        str(out2),
        env={"RAY_ADDRESS": "local"},
    )
    assert r3.returncode == 0, r3.stderr
    assert json.loads(r3.stdout.strip().splitlines()[-1])["n_rows"] == 1000

    # nonexistent input: clean driver-side error, exit 2
    r4 = _run(
        "run",
        "--input",
        str(tmp_path / "nope"),
        "--schema",
        FLAGSHIP_SCHEMA_PATH,
        "--out",
        str(tmp_path / "out_nope"),
        env={"RAY_ADDRESS": "local"},
    )
    assert r4.returncode == 2
    assert "not a file, directory or glob" in r4.stderr


def test_cli_run_worker_error_keeps_traceback(tmp_path):
    """A corrupt shard under the default on_corrupt=fail must surface the
    read error WITH its traceback: pyarrow's ArrowInvalid subclasses
    ValueError (and arrives wrapped in RayTaskError), so a broad
    `except ValueError` would swallow it into the same one-line exit 2 as
    a usage error — only PipelineUsageError gets that treatment."""
    bad_dir = tmp_path / "bad"
    bad_dir.mkdir()
    (bad_dir / "garbage.parquet").write_bytes(b"PAR1 this is not parquet")
    r = _run(
        "run",
        "--input",
        str(bad_dir),
        "--schema",
        FLAGSHIP_SCHEMA_PATH,
        "--out",
        str(tmp_path / "out"),
        env={"RAY_ADDRESS": "local"},
    )
    assert r.returncode not in (0, 2), r.stderr
    assert "Traceback" in r.stderr


def test_cli_export_partitioned(tmp_path):
    out = str(tmp_path / "by_lang")
    r = _run(
        "export", "--input", "/root/testdata/sf0.001/documents.parquet",
        "--out", out, "--partition-by", "lang", "--columns", "doc_id,lang",
    )
    assert r.returncode == 0, r.stderr[-800:]
    parts = sorted(d for d in os.listdir(out) if d.startswith("lang="))
    assert parts  # one hive directory per language
    import duckdb

    n = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{out}/**/*.parquet', hive_partitioning=1)"
    ).fetchone()[0]
    exact = duckdb.sql(
        "SELECT count(*) FROM read_parquet('/root/testdata/sf0.001/documents.parquet')"
    ).fetchone()[0]
    assert n == exact


def test_cli_export_missing_input_exits_2(tmp_path):
    r = _run("export", "--input", str(tmp_path / "nope.parquet"),
             "--out", str(tmp_path / "o"))
    assert r.returncode == 2
    assert "is not a file" in r.stderr


def test_cli_export_glob_and_column_autoadd(tmp_path):
    import shutil

    src = str(tmp_path / "in")
    os.makedirs(src)
    shutil.copy("/root/testdata/sf0.001/documents.parquet", src)
    out = str(tmp_path / "og")
    # glob input + --columns omitting the partition column (auto-added)
    r = _run("export", "--input", f"{src}/*.parquet", "--out", out,
             "--partition-by", "lang", "--columns", "doc_id")
    assert r.returncode == 0, r.stderr[-800:]
    assert any(d.startswith("lang=") for d in os.listdir(out))


def test_cli_export_mixed_dir_exits_2(tmp_path):
    import shutil

    src = str(tmp_path / "mixed")
    os.makedirs(src)
    shutil.copy("/root/testdata/sf0.001/documents.parquet", src)
    with open(os.path.join(src, "stray.jsonl"), "w") as f:
        f.write('{"a": 1}\n')
    r = _run("export", "--input", src, "--out", str(tmp_path / "o"))
    assert r.returncode == 2
    assert "mixed" in r.stderr


def test_cli_stats_glob_and_bad_input(tmp_path):
    """stats promises 'parquet dir or glob' — a glob must resolve (it was
    passed raw to read_parquet, which treats '*' literally), and a bad
    --input must exit 2 before paying for Ray startup."""
    pages = tmp_path / "pages"
    write_pages(str(pages), n_rows=200, rows_per_file=100)
    r = _run("stats", "--input", str(pages / "*.parquet"), "--columns", "lang")
    assert r.returncode == 0, r.stderr[-800:]
    out = json.loads(r.stdout)
    assert out["lang"]["n"] == 200

    r = _run("stats", "--input", str(tmp_path / "nope"), "--columns", "lang")
    assert r.returncode == 2
    assert "is not a file" in r.stderr


def test_cli_missing_or_bad_schema_exits_2(tmp_path):
    """A missing/unreadable schema file is a clean driver-side exit 2,
    never a raw FileNotFoundError traceback (and never a Ray startup)."""
    r = _run("run", "--input", "/root/testdata/sf0.001/documents.parquet",
             "--schema", str(tmp_path / "nope.medea"), "--out", str(tmp_path / "o"))
    assert r.returncode == 2, (r.returncode, r.stderr[-300:])
    assert "cannot read schema" in r.stderr and "Traceback" not in r.stderr

    doc = tmp_path / "d.json"
    doc.write_text("{}")
    r = _run("validate-file", str(tmp_path / "nope.medea"), str(doc))
    assert r.returncode == 2
    assert "cannot read" in r.stderr and "Traceback" not in r.stderr

    bad = tmp_path / "bad.medea"
    bad.write_text("not a medea schema\n")
    r = _run("validate-file", str(bad), str(doc))
    assert r.returncode == 2
    assert "invalid schema" in r.stderr and "Traceback" not in r.stderr


def test_cli_run_fragment_partition_unit(tmp_path):
    """run --partition-unit fragment over multi-row-group files: fragment
    counts in the report, resume skips fragments, and the fragment×jsonl
    contract error exits 2 driver-side."""
    pages = tmp_path / "pages"
    r = _run(
        "gen-pages", "--out", str(pages), "--rows", "2000",
        "--rows-per-file", "1000", "--row-group-rows", "250",
    )
    assert r.returncode == 0, r.stderr

    out = tmp_path / "out"
    args = (
        "run", "--input", str(pages), "--schema", FLAGSHIP_SCHEMA_PATH,
        "--out", str(out), "--wave-size", "3",
        "--partition-unit", "fragment", "--fragment-rows", "500",
    )
    r = _run(*args, env={"RAY_ADDRESS": "local"})
    assert r.returncode == 0, r.stderr
    report = json.loads(r.stdout.strip().splitlines()[-1])
    # 2 files x 4 row groups, 500 rows/fragment -> 4 fragments
    assert report["n_files"] == 4
    assert report["n_rows"] == 2000
    assert report["n_invalid"] == 100  # 5% seeded defects

    r = _run(*args, env={"RAY_ADDRESS": "local"})
    assert r.returncode == 0, r.stderr
    report = json.loads(r.stdout.strip().splitlines()[-1])
    assert report["n_files_skipped"] == 4 and report["n_rows"] == 2000

    # contract error (unit switch on a populated out_dir — explicit file
    # mode; the bare default is fragment since round 5): clean exit 2,
    # message on stderr, no worker traceback
    r = _run(
        "run", "--input", str(pages), "--schema", FLAGSHIP_SCHEMA_PATH,
        "--out", str(out), "--wave-size", "3", "--partition-unit", "file",
    )
    assert r.returncode == 2, (r.stdout, r.stderr)
    assert "partition_unit" in r.stderr and "Traceback" not in r.stderr

    # same contract for a fragment_rows change under the (default)
    # fragment unit: disjoint keys would double-count, so it refuses
    r = _run(
        "run", "--input", str(pages), "--schema", FLAGSHIP_SCHEMA_PATH,
        "--out", str(out), "--wave-size", "3",
    )
    assert r.returncode == 2, (r.stdout, r.stderr)
    assert "fragment_rows" in r.stderr and "Traceback" not in r.stderr


def test_cli_infer_schema_and_check(tmp_path):
    pages = tmp_path / "pages"
    r = _run("gen-pages", "--out", str(pages), "--rows", "2000",
             "--rows-per-file", "1000")
    assert r.returncode == 0, r.stderr

    # infer-schema: writes a compilable schema + prints a profile summary
    schema = tmp_path / "inferred.medea"
    r = _run("infer-schema", "--input", str(pages), "--col", "payload",
             "--out", str(schema), env={"RAY_ADDRESS": "local"})
    assert r.returncode == 0, r.stderr
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    assert summary["n_docs"] == 2000 and summary["n_invalid"] == 0
    assert summary["enums"].get("lang", 0) >= 1
    from medea_ray import compile_schema

    compile_schema(schema.read_text())

    # check: failing suite (planted dup urls) -> exit 1, verdict rows out
    suite = tmp_path / "suite.json"
    suite.write_text(json.dumps([
        {"kind": "not_null", "col": "url"},
        {"kind": "unique", "cols": ["url"]},
        {"kind": "row_count", "min_rows": 1},
        {"kind": "matches_schema", "col": "payload",
         "schema": str(schema), "id_col": "url"},
    ]))
    r = _run("check", "--input", str(pages), "--suite", str(suite),
             env={"RAY_ADDRESS": "local"})
    assert r.returncode == 1, (r.stdout, r.stderr)
    rows = json.loads(r.stdout.strip().splitlines()[-1])
    verdicts = {x["check"]: x for x in rows}
    assert verdicts["unique(url)"]["passed"] is False
    assert verdicts["unique(url)"]["value"] == 20  # 1% planted dups
    assert verdicts["matches_schema(payload)"]["passed"] is True

    # all-pass suite -> exit 0
    suite.write_text(json.dumps([{"kind": "not_null", "col": "url"}]))
    r = _run("check", "--input", str(pages), "--suite", str(suite),
             env={"RAY_ADDRESS": "local"})
    assert r.returncode == 0, (r.stdout, r.stderr)

    # error paths: clean exit 2, stderr message, no worker traceback
    suite.write_text(json.dumps([{"kind": "bogus"}]))
    r = _run("check", "--input", str(pages), "--suite", str(suite),
             env={"RAY_ADDRESS": "local"})
    assert r.returncode == 2 and "bad suite entry" in r.stderr
    assert "Traceback" not in r.stderr
    suite.write_text("not json")
    r = _run("check", "--input", str(pages), "--suite", str(suite))
    assert r.returncode == 2 and "bad suite file" in r.stderr
    # missing schema file inside a matches_schema entry and a non-dict
    # entry are SPEC errors (exit 2, no traceback), never exit-1
    # "checks failed" (review finding, tenth pass)
    suite.write_text(json.dumps([{"kind": "matches_schema", "col": "payload",
                                  "schema": "/nonexistent.medea", "id_col": "url"}]))
    r = _run("check", "--input", str(pages), "--suite", str(suite),
             env={"RAY_ADDRESS": "local"})
    assert r.returncode == 2 and "bad suite entry" in r.stderr
    assert "Traceback" not in r.stderr
    suite.write_text(json.dumps(["not_null"]))
    r = _run("check", "--input", str(pages), "--suite", str(suite),
             env={"RAY_ADDRESS": "local"})
    assert r.returncode == 2 and "bad suite entry" in r.stderr
    assert "Traceback" not in r.stderr
    r = _run("check", "--input", str(tmp_path / "missing"), "--suite", str(suite))
    assert r.returncode == 2


def test_cli_suggest_suite_roundtrip(tmp_path):
    pages = tmp_path / "pages"
    r = _run("gen-pages", "--out", str(pages), "--rows", "2000",
             "--rows-per-file", "1000")
    assert r.returncode == 0, r.stderr

    suite = tmp_path / "suite.json"
    r = _run("suggest-suite", "--input", str(pages), "--columns", "url,lang",
             "--out", str(suite), env={"RAY_ADDRESS": "local"})
    assert r.returncode == 0, r.stderr
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    assert summary["n_checks"] >= 2
    specs = json.loads(suite.read_text())
    kinds = {s["kind"] for s in specs}
    assert "accepted_values" in kinds  # lang enum
    assert {"kind": "not_null", "col": "url", "max_null_frac": 0.0} in specs
    # no unique(url): ~1% planted dup urls, and lang has nulls
    assert not any(s["kind"] == "unique" for s in specs)

    # the suggested suite passes on the data it came from (exit 0)
    r = _run("check", "--input", str(pages), "--suite", str(suite),
             env={"RAY_ADDRESS": "local"})
    assert r.returncode == 0, (r.stdout, r.stderr)

    # usage errors exit 2
    r = _run("suggest-suite", "--input", str(pages), "--columns", "",
             "--out", str(suite))
    assert r.returncode == 2
    r = _run("suggest-suite", "--input", str(tmp_path / "nope"),
             "--columns", "url", "--out", str(suite))
    assert r.returncode == 2


def test_cli_pretrain(tmp_path):
    # tiny corpus: clean multi-line docs + a planted benchmark overlap
    import pyarrow as pa
    import pyarrow.parquet as pq

    good = "\n".join(
        [
            "alpha beta gamma delta epsilon zeta.",
            "one two three four five six.",
            "seven eight nine ten eleven twelve more.",
            "red orange yellow green blue indigo violet done.",
            "north south east west upward downward sideways still.",
        ]
    )
    rows = {
        "url": [f"u{i}" for i in range(6)] + ["u_bad"],
        "lang": ["en", "de", "en", "de", "en", "de", "en"],
        "text": [good + f"\nunique tail line number {i} end." for i in range(6)]
        + [good + "\nleaked question text from bench suite."],
    }
    corpus_dir = tmp_path / "corpus"; corpus_dir.mkdir()
    pq.write_table(pa.table(rows), corpus_dir / "part0.parquet")
    bench_dir = tmp_path / "bench"; bench_dir.mkdir()
    pq.write_table(
        pa.table({"text": ["leaked question text from bench suite."]}),
        bench_dir / "bench.parquet",
    )
    out = tmp_path / "out"
    r = _run(
        "pretrain", "--input", str(corpus_dir), "--bench", str(bench_dir),
        "--out", str(out), "--target-rows", "1000", "--temperature", "1.0",
        "--ngram-n", "5", "--bpe-merges", "5",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    rep = json.loads(r.stdout.strip().splitlines()[-1])
    assert rep["n_input"] == 7
    assert rep["n_after_decontam"] == 6  # u_bad dropped
    assert rep["n_after_mixture"] == 6
    assert rep["n_tokens"] > 0
    import pyarrow.parquet as pq2

    got = pq2.read_table(str(out))
    assert got.num_rows == 6
    assert set(got.column_names) == {"url", "lang", "text"}

    # bad input exits 2 before Ray starts
    r = _run("pretrain", "--input", str(tmp_path / "nope"), "--bench",
             str(bench_dir), "--out", str(out), "--target-rows", "10")
    assert r.returncode == 2
