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
    (DataFrame.deserialize analogue)."""
    with pa.ipc.open_stream(io.BytesIO(payload)) as reader:
        table = reader.read_all()
    return spark.createDataFrame(table.to_pandas())
