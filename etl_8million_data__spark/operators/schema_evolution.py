"""Schema evolution — the Spark analog of the reference's runtime
schema repair (SURVEY.md §1.3: Financilas.py:38-66 drops/retypes/re-adds
the PK when MySQL rejects the DDL; Summary.py tolerates missing
columns entirely).

Parquet-side: ``mergeSchema`` unions file footers across historical
writes; ``conform_to`` then projects any frame onto a target schema —
adding missing columns as NULLs and casting drifted types — so
downstream operators always see one stable shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def read_merged(spark: SparkSession, path: str) -> DataFrame:
    """Read a parquet dir whose files were written under different
    schema versions; the result schema is the union."""
    return spark.read.option("mergeSchema", "true").parquet(path)


def conform_to(df: DataFrame, target: StructType) -> DataFrame:
    """Project onto ``target``: missing columns -> typed NULLs, present
    columns cast to the target type, extras dropped. try_cast keeps
    drifted dirty values as NULL instead of failing the job (the
    reference's repair-not-crash stance)."""
    existing = {f.name.lower(): f.name for f in df.schema.fields}
    cols = []
    for field in target.fields:
        src = existing.get(field.name.lower())
        if src is None:
            cols.append(F.lit(None).cast(field.dataType).alias(field.name))
        else:
            cols.append(F.col(src).try_cast(field.dataType).alias(field.name))
    return df.select(*cols)
