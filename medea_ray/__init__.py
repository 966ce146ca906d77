"""medea_ray — a Ray-Data-native schema-graph + constraint validation engine.

A brand-new engine with the query/data-processing capabilities of the
reference Medea implementation (juspay/medea, read-only at /root/reference),
re-expressed Ray-Data-first:

- ``medea_ray.schema``   — .medea schema-graph parsing + compilation
  (driver-side, pure Python; reference: src/Data/Medea/Parser/*,
  src/Data/Medea/Analysis.hs).
- ``medea_ray.validate`` — the per-row validation kernel (pure Python, no Ray
  import; reference: src/Data/Medea.hs:258-425).
- ``medea_ray.engine``   — the distributed engine: Parquet sources/sinks,
  actor-pool validation over zero-copy Arrow batches, stats sketches
  (HLL / TDigest), uniqueness, drift, dedup, similarity search,
  checkpoint/resume.

Public API mirror of the reference exports (src/Data/Medea.hs:48-68):
``compile_schema`` ≈ buildSchema/loadSchemaFromFile,
``validate`` ≈ validate.
"""

from medea_ray.schema.errors import (
    MedeaError,
    MedeaParseError,
    MedeaSchemaError,
)
from medea_ray.schema.parser import parse_specification
from medea_ray.schema.compile import compile_schemata, CompiledSchema, Schema
from medea_ray.validate.kernel import (
    MedeaValidationError,
    ValidatedJSON,
    validate,
    validate_obj,
)

__all__ = [
    "MedeaError",
    "MedeaParseError",
    "MedeaSchemaError",
    "MedeaValidationError",
    "CompiledSchema",
    "Schema",
    "ValidatedJSON",
    "compile_schema",
    "compile_schema_from_handle",
    "compile_schemata",
    "parse_specification",
    "validate",
    "validate_from_file",
    "validate_from_handle",
    "validate_obj",
]


def validate_from_file(schema_map, path, annotate=True) -> "ValidatedJSON":
    """Mirror of the reference's validateFromFile (Data/Medea.hs:239-244):
    read the document bytes, then validate. ``annotate="subtree"`` gives
    reference-exact whole-subtree annotations (kernel deviation 2)."""
    with open(path, "rb") as f:
        return validate(schema_map, f.read(), annotate=annotate)


def validate_from_handle(schema_map, handle, annotate=True) -> "ValidatedJSON":
    """Mirror of the reference's validateFromHandle (Data/Medea.hs:251-256):
    read the rest of an open (binary or text) file object, then validate."""
    return validate(schema_map, handle.read(), annotate=annotate)


def compile_schema_from_handle(handle) -> "Schema":
    """Mirror of the reference's loadSchemaFromHandle (Loader.hs:118-121):
    read the rest of an open (binary or text) file object, then
    decode → parse → analyze (no path sniffing — content only)."""
    return compile_schemata(parse_specification(handle.read()))


def compile_schema(source) -> "Schema":
    """Parse + compile a Medea schema graph from text, bytes, or a path.

    Equivalent of the reference's ``buildSchema`` / ``loadSchemaFromFile``
    (src/Data/Medea/Loader.hs:100-112): decode UTF-8 → parse → analyze.
    Raises MedeaParseError / MedeaSchemaError.
    """
    import os

    if isinstance(source, os.PathLike):
        # a PathLike is unambiguously a path — no sniffing (a bare-name
        # Path("myschema") used to be parsed as schema TEXT)
        with open(source, "rb") as f:
            source = f.read()
    elif isinstance(source, str):
        if "\n" not in source and (source.endswith(".medea") or os.path.sep in source):
            with open(source, "rb") as f:
                source = f.read()
    spec = parse_specification(source)
    return compile_schemata(spec)
