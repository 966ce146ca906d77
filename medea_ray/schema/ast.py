"""Parsed-spec AST dataclasses.

One dataclass per reference parser spec module
(src/Data/Medea/Parser/Spec/{Schema,Type,String,Array,Object,Property}.hs).
These are the intermediate representation between parsing and compilation;
they never leave the driver.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class PropertySpec:
    # src/Data/Medea/Parser/Spec/Property.hs:24-29
    name: str
    schema: str | None  # identifier, or None → Any
    optional: bool


@dataclass(frozen=True)
class ObjectSpec:
    # src/Data/Medea/Parser/Spec/Object.hs:34-39
    properties: tuple[PropertySpec, ...]
    additional_allowed: bool
    additional_schema: str | None


@dataclass(frozen=True)
class ArraySpec:
    # src/Data/Medea/Parser/Spec/Array.hs:27-33; tuple_spec=() is the empty
    # tuple (unit), tuple_spec=None means "no tuple spec at all".
    min_length: int | None = None
    max_length: int | None = None
    element_type: str | None = None
    tuple_spec: tuple[str, ...] | None = None


@dataclass(frozen=True)
class SchemaSpec:
    # src/Data/Medea/Parser/Spec/Schema.hs:28-34
    name: str
    types: tuple[str, ...] = ()  # $type identifier lines, in file order
    string_vals: tuple[str, ...] = ()  # $string-values quoted strings
    array: ArraySpec = field(default_factory=ArraySpec)
    object: ObjectSpec | None = None


@dataclass(frozen=True)
class SchemataSpec:
    # src/Data/Medea/Parser/Spec/Schemata.hs:16
    schemata: tuple[SchemaSpec, ...]
