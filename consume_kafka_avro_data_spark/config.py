"""Job configuration — the reference's YAML config model, Spark-first.

The reference loads a YAML job file (``src/config/ConfigParser.cpp:14-16``)
describing: Kafka connection + schema-registry URL, per-topic column
lists with a key column (``type_map``, ConfigParser.cpp:85-106), input
column → Avro field renames (``column_map``, ConfigParser.cpp:108-120),
and per-column Avro type overrides defaulting to string
(``column_type_transforms``, ConfigParser.cpp:64-66,149-164), then
assembles an Avro record schema from them (``assemble_schema``,
ConfigParser.cpp:139-169).

Here the same declaration drives DataFrame construction instead: the
config compiles to (a) a Spark ``StructType``, (b) an Avro schema JSON
string (for wire encode/decode), and (c) a ``select``/``cast``/``alias``
projection applied to any input DataFrame.  Config errors raise
``ConfigError`` (the reference kills the process via
``kill(getpid(), SIGINT)``, ConfigParser.cpp:33,58,133 — we do not).
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import (
    DataType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)


#: Avro name grammar (spec: names start with [A-Za-z_], then word chars)
_AVRO_NAME_RE = re.compile(r"[A-Za-z_][A-Za-z0-9_]*")


def _avro_record_name(topic: str) -> str:
    """Kafka topic → valid Avro record name: '.'/'-' and any other
    non-word character map to '_'; a leading digit gets a '_' prefix.
    Deterministic, so the registered subject's schema name is stable."""
    name = re.sub(r"[^A-Za-z0-9_]", "_", topic)
    if not name or name[0].isdigit():
        name = "_" + name
    return name


class ConfigError(ValueError):
    """Invalid job configuration."""


# The reference's scalar type universe (ConfigParser.cpp:154-164):
# float, double, int, long, string — string is the default (:149-152).
_AVRO_TO_SPARK: dict[str, DataType] = {
    "string": StringType(),
    "int": IntegerType(),
    "long": LongType(),
    "float": FloatType(),
    "double": DoubleType(),
}


@dataclass(frozen=True)
class SchemaConfig:
    """One topic's schema declaration (mirrors the reference's
    ``SchemaConfig`` aggregate, src/config/SchemaConfig.h:17-26)."""

    name: str  # topic name
    key_column: str  # message-key field (post-rename)
    columns: tuple[str, ...]  # input column subset, pre-rename (P1)
    column_map: dict[str, str] = field(default_factory=dict)  # rename (P2)
    column_type_transforms: dict[str, str] = field(default_factory=dict)  # cast (P3)
    schema_id: int | None = None  # registry-assigned id, if fetched

    def field_name(self, input_col: str) -> str:
        return self.column_map.get(input_col, input_col)

    def field_type(self, input_col: str) -> str:
        t = self.column_type_transforms.get(input_col, "string")
        if t not in _AVRO_TO_SPARK:
            raise ConfigError(
                f"unsupported type {t!r} for column {input_col!r}; "
                f"expected one of {sorted(_AVRO_TO_SPARK)}"
            )
        return t

    def to_struct_type(self) -> StructType:
        """Assemble the Spark schema (the reference assembles an
        ``avro::ValidSchema`` the same way, ConfigParser.cpp:139-169)."""
        fields = [
            StructField(self.field_name(c), _AVRO_TO_SPARK[self.field_type(c)], True)
            for c in self.columns
        ]
        if not fields:
            raise ConfigError(f"topic {self.name!r} declares no columns")
        names = [f.name for f in fields]
        if len(set(names)) != len(names):
            raise ConfigError(f"duplicate field names after rename: {names}")
        if self.key_column not in names:
            raise ConfigError(
                f"key_column {self.key_column!r} not among fields {names}"
            )
        return StructType(fields)

    def to_avro_schema_json(self) -> str:
        """Avro record-schema JSON equivalent to the registry-registered
        schema (SchemaRegistry.cpp:144-161 registers under subject
        ``<topic>-value``).

        The record name is SANITIZED to the Avro name grammar
        ``[A-Za-z_][A-Za-z0-9_]*``: topic names routinely contain '.'
        and '-' (legal in Kafka, illegal in Avro), and a real Confluent
        registry rejects a spec-invalid schema at registration time.
        Field names come from user renames, so an invalid one is a
        config error, not something to silently rewrite."""
        for c in self.columns:
            f = self.field_name(c)
            if not _AVRO_NAME_RE.fullmatch(f):
                raise ConfigError(
                    f"column_map produces invalid Avro field name {f!r} "
                    "(must match [A-Za-z_][A-Za-z0-9_]*)"
                )
        return json.dumps(
            {
                "type": "record",
                "name": _avro_record_name(self.name),
                "fields": [
                    {"name": self.field_name(c), "type": self.field_type(c)}
                    for c in self.columns
                ],
            }
        )

    def projection(self) -> list[Column]:
        """The select-list implementing P1 (subset) + P2 (rename) +
        P3 (cast) over an input DataFrame."""
        return [
            F.col(c).cast(_AVRO_TO_SPARK[self.field_type(c)]).alias(self.field_name(c))
            for c in self.columns
        ]

    def apply(self, df: DataFrame) -> DataFrame:
        missing = [c for c in self.columns if c not in df.columns]
        if missing:
            raise ConfigError(f"input is missing configured columns {missing}")
        return df.select(*self.projection())


@dataclass(frozen=True)
class JobConfig:
    """Whole job file: kafka connection + one SchemaConfig per topic."""

    kafka: dict[str, str]
    schemas: tuple[SchemaConfig, ...]
    input_type: str = "csv"
    csv_options: dict[str, str] = field(default_factory=dict)

    @property
    def bootstrap_servers(self) -> str | None:
        return self.kafka.get("bootstrap.servers")

    @property
    def schema_registry_url(self) -> str | None:
        return self.kafka.get("schema.registry.url")

    def schema_for(self, topic: str) -> SchemaConfig:
        for s in self.schemas:
            if s.name == topic:
                return s
        raise ConfigError(f"no schema configured for topic {topic!r}")


def parse_config(doc: dict) -> JobConfig:
    """Build a JobConfig from a parsed YAML/JSON document with the
    reference's file shape (configs/SPO_2_kafka.yaml:1-29)."""
    if not isinstance(doc, dict):
        raise ConfigError("config root must be a mapping")

    def _mapping(key: str) -> dict:
        sec = doc.get(key) or {}
        if not isinstance(sec, dict):
            # a scalar here ('kafka: localhost:9092') must be a
            # ConfigError the CLI can report, not an AttributeError
            raise ConfigError(f"config section {key!r} must be a mapping")
        return sec

    kafka = {str(k): str(v) for k, v in _mapping("kafka").items()}
    column_map = {str(k): str(v) for k, v in _mapping("column_map").items()}
    transforms = {
        str(k): str(v) for k, v in _mapping("column_type_transforms").items()
    }
    type_map = doc.get("type_map") or {}
    if not isinstance(type_map, dict) or not type_map:
        raise ConfigError("config must declare a non-empty type_map")
    schemas = []
    for topic, spec in type_map.items():
        if not isinstance(spec, dict):
            raise ConfigError(f"type_map.{topic} must be a mapping")
        columns = spec.get("columns") or []
        if not isinstance(columns, list):
            raise ConfigError(f"type_map.{topic}.columns must be a list")
        key_column = spec.get("key_column")
        if not key_column:
            raise ConfigError(f"type_map.{topic} missing key_column")
        schemas.append(
            SchemaConfig(
                name=str(topic),
                key_column=str(key_column),
                columns=tuple(str(c) for c in columns),
                column_map=column_map,
                column_type_transforms=transforms,
            )
        )
    cfg = JobConfig(
        kafka=kafka,
        schemas=tuple(schemas),
        input_type=str(doc.get("input_type", "csv")),
        csv_options={str(k): str(v) for k, v in _mapping("csv_options").items()},
    )
    for s in cfg.schemas:
        s.to_struct_type()  # validate eagerly, like the reference's parse step
    return cfg


def load_config(path: str) -> JobConfig:
    """Load a YAML job file (gated import: pyyaml may be absent)."""
    try:
        import yaml
    except ImportError as e:  # pragma: no cover
        raise ConfigError("pyyaml not available; pass a parsed dict to parse_config") from e
    with open(path) as f:
        return parse_config(yaml.safe_load(f))
