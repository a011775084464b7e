"""Columnar wire format (SURVEY.md §1.2): the reference's "dfjson"
zero-copy transport (DataFrame.serialize()/deserialize(),
ElasticsearchReaderClient.ts:83, SpacesReaderClient.ts:308) maps to
Arrow IPC streams — the `response_type: raw` equivalent.

response_type mapping (interfaces.ts:319-323):
  data_entities → DataFrame rows (everything already is)
  data_frame    → the same DataFrame (Spark is columnar end to end)
  raw           → Arrow IPC bytes (this module)
"""

from __future__ import annotations

import io

import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def to_arrow_ipc(df: DataFrame) -> bytes:
    """Serialize a (small) DataFrame to an Arrow IPC stream — the dfjson
    analogue. Collects to the driver; intended for result transport, not
    bulk data."""
    table = df.toArrow()
    sink = io.BytesIO()
    with pa.ipc.new_stream(sink, table.schema) as writer:
        writer.write_table(table)
    return sink.getvalue()


def from_arrow_ipc(spark: SparkSession, payload: bytes) -> DataFrame:
    """Deserialize an Arrow IPC stream back into a DataFrame
    (DataFrame.deserialize analogue). PySpark 4 accepts Arrow tables
    directly — no pandas round trip."""
    with pa.ipc.open_stream(io.BytesIO(payload)) as reader:
        table = reader.read_all()
    return spark.createDataFrame(table)


# ---------------------------------------------------------------------------
# DataTypeConfig (reference @terascope/types): columnar frames REQUIRE a
# declared type config (ElasticsearchReaderAPI.ts:39-45 isValidDataTypeConfig,
# :65-69 constructor guard). Spark equivalent: validate the declared config
# and cast the frame into the declared schema.
# ---------------------------------------------------------------------------

# FieldType → Spark SQL type (the subset the reference's assets declare)
FIELD_TYPE_MAP = {
    "Date": "timestamp",
    "Keyword": "string",
    "KeywordCaseInsensitive": "string",
    "Text": "string",
    "IP": "string",
    "IPRange": "string",
    "Hostname": "string",
    "Domain": "string",
    "Boolean": "boolean",
    "Byte": "tinyint",
    "Short": "smallint",
    "Integer": "int",
    "Long": "bigint",
    "Float": "float",
    "Double": "double",
    "Number": "double",
    "String": "string",
    "GeoPoint": "struct<lat:double,lon:double>",
    "Object": "string",  # opaque JSON payload
}


def validate_type_config(cfg) -> dict:
    """isValidDataTypeConfig parity: require a numeric `version` and a
    `fields` mapping; unknown field types are a config error (fail at
    plan time, not mid-job)."""
    if not isinstance(cfg, dict):
        raise ValueError(
            'Parameter "type_config" must be set if DataFrames are being returned'
        )
    if not isinstance(cfg.get("version"), (int, float)) or isinstance(
        cfg.get("version"), bool
    ):
        raise ValueError('type_config requires a numeric "version"')
    fields = cfg.get("fields")
    if not isinstance(fields, dict) or not fields:
        raise ValueError('type_config requires a "fields" mapping')
    for name, spec in fields.items():
        ftype = (spec or {}).get("type") if isinstance(spec, dict) else None
        if ftype not in FIELD_TYPE_MAP:
            raise ValueError(f"unsupported field type {ftype!r} for field {name!r}")
    return cfg


def apply_type_config(df: DataFrame, cfg: dict) -> DataFrame:
    """Cast/select the frame into the declared schema: declared columns
    are cast to their declared Spark type (missing ones become typed
    nulls); undeclared columns are dropped — the declared type config IS
    the frame's contract."""
    cfg = validate_type_config(cfg)
    cols = []
    for name, spec in cfg["fields"].items():
        spark_type = FIELD_TYPE_MAP[spec["type"]]
        if name in df.columns:
            cols.append(F.col(name).cast(spark_type).alias(name))
        else:
            cols.append(F.lit(None).cast(spark_type).alias(name))
    return df.select(*cols)
