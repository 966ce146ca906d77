"""Error taxonomy for schema loading.

Mirrors the reference's two load-time failure classes with stable
``code`` strings (reference: src/Data/Medea/Parser/Types.hs:8-24 for parse
errors, src/Data/Medea/Loader.hs:32-97 for the LoaderError list; the
parse-vs-schema split matches test/TestM.hs:13-36 ``isParseError`` /
``isSchemaError``).
"""

from __future__ import annotations


class MedeaError(Exception):
    """Base class for all schema-load errors."""

    def __init__(self, code: str, message: str = ""):
        self.code = code
        self.message = message
        super().__init__(f"{code}: {message}" if message else code)


class MedeaParseError(MedeaError):
    """The .medea file failed to decode or parse.

    Codes (superset renaming of Parser/Types.hs:8-24 + Loader.hs NotUtf8):
    ``not_utf8, parsing_failed, identifier_too_long,
    expected_reserved_identifier, leading_zero,
    conflicting_spec_requirements, empty_length_array_spec,
    empty_array_elements, empty_string_values_spec``.
    """


class MedeaSchemaError(MedeaError):
    """The file parsed, but schema-graph analysis rejected it.

    Codes (stable renaming of Loader.hs:32-97 constructors):
    ``start_schema_missing, self_typing_schema, multiple_schema_definition,
    missing_schema_definition, schema_name_reserved, isolated_schemata,
    missing_prop_schema_definition, minimum_length_greater_than_maximum,
    multiple_prop_schema_definition, missing_list_schema_definition,
    missing_tuple_schema_definition, property_spec_without_object_type,
    list_spec_without_array_type, tuple_spec_without_array_type,
    string_spec_without_string_type``.
    """
