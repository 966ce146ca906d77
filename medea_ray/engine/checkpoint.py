"""Checkpoint / resume / lineage helpers (SURVEY.md §2.5 E11).

The implementation lives with the pipeline (medea_ray/engine/pipeline.py)
because manifest commits are interleaved with the wave loop; this module is
the stable import surface for the checkpoint layer:

- per-partition (= input file) manifest records with lineage fields
  (input_path, partition_id, wave_id, n_rows, n_valid, n_invalid,
  schema_version, finished_at),
- atomic commit via write-temp + rename (a killed run never double-counts),
- resume = set difference of input files vs manifested files, done on the
  driver before any read is scheduled.
"""

from medea_ray.engine.pipeline import (  # noqa: F401
    load_manifest,
    read_failures,
    read_verdicts,
    read_violations,
    run_validation_pipeline,
    summarize_run,
)
