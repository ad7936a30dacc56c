"""CSV codec with the reference's NULL convention (SURVEY.md §2.1 S3/S4).

The reference lands extracts as CSV with pandas
``to_csv(index=False, quoting=QUOTE_NONNUMERIC)`` (reference
``dags/flights_data_pipeline.py:126-127``) and reads them back with
``pd.read_csv(keep_default_na=False, na_values=['NaN', ''])``
(``:160``) — i.e. **both** the empty string and the literal ``'NaN'``
collapse to NULL, and nothing else does. That convention is part of the
engine contract (bug-for-bug, SURVEY.md §1.3): this codec reproduces it
on Spark's CSV source/sink.

Spark's reader takes a single ``nullValue``; the second sentinel is
normalized post-read with a ``when`` projection over the string columns
(JVM-side, codegen — not a UDF).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: write-side: quote everything non-numeric, encode NULL as empty field.
_WRITE_OPTS = {
    "header": "true",
    "quoteAll": "false",
    "escape": '"',
    "nullValue": "",
    "timestampFormat": "yyyy-MM-dd HH:mm:ss.SSSSSS",
}

#: read-side: empty field → NULL (the 'NaN' sentinel is handled after).
_READ_OPTS = {
    "header": "true",
    "escape": '"',
    "nullValue": "",
    "emptyValue": "",
    "timestampFormat": "yyyy-MM-dd HH:mm:ss.SSSSSS",
}


def _is_complex(dt: T.DataType) -> bool:
    return isinstance(dt, (T.StructType, T.ArrayType, T.MapType))


def write_csv(df: DataFrame, path: str) -> None:
    """Land a DataFrame as CSV (overwrite per run, reference ``:126-131``).

    Complex columns (struct/array/map) are serialized to JSON strings
    for CSV transit — the reference does exactly this for its json
    columns (``dags/flights_data_pipeline.py:120-123``, ``json.dumps``
    before ``to_csv``).
    """
    cols = [
        F.to_json(F.col(f.name)).alias(f.name) if _is_complex(f.dataType) else F.col(f.name)
        for f in df.schema.fields
    ]
    w = df.select(*cols).write.mode("overwrite")
    for k, v in _WRITE_OPTS.items():
        w = w.option(k, v)
    w.csv(path)


def read_csv(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """Read a landed CSV with the reference NULL convention.

    Empty fields arrive as NULL via the reader; the literal ``'NaN'``
    in string columns is collapsed to NULL in a post-projection —
    mirroring ``na_values=['NaN','']`` exactly. Complex columns ride
    as JSON strings and are restored with ``from_json``.
    """
    flat = T.StructType(
        [
            T.StructField(f.name, T.StringType() if _is_complex(f.dataType) else f.dataType, f.nullable)
            for f in schema.fields
        ]
    )
    r = spark.read.schema(flat)
    for k, v in _READ_OPTS.items():
        r = r.option(k, v)
    df = r.csv(path)
    restored = [
        F.from_json(F.col(f.name), f.dataType).alias(f.name)
        if _is_complex(f.dataType)
        else F.col(f.name)
        for f in schema.fields
    ]
    df = df.select(*restored)
    cols = []
    for f in schema.fields:
        if isinstance(f.dataType, T.StringType):
            cols.append(
                F.when(F.col(f.name) == "NaN", F.lit(None))
                .otherwise(F.col(f.name))
                .alias(f.name)
            )
        else:
            cols.append(F.col(f.name))
    return df.select(*cols)
