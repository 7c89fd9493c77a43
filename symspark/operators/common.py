"""Shared frame-outcome struct for the enrichment operators.

Each operator (sourcemap / proguard / dsym) computes one outcome struct for
its frame kinds; the pipeline coalesces them into a single set of outcome
columns before the regroup.  All fields are JVM-side expressions — no
Python in the enrich stage.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F
from pyspark.sql import types as T

OUTCOME_SCHEMA = T.StructType(
    [
        T.StructField("chunk", T.StringType(), True),  # output line(s) for the frame
        T.StructField("f_failed", T.BooleanType(), True),  # frame marks partial failure
        T.StructField("proc_inc", T.IntegerType(), True),  # processed-frames counter inc
        T.StructField("fail_inc", T.IntegerType(), True),  # failed-frames counter inc
        T.StructField("fetch_key", T.StringType(), True),  # distinct fetch-failure key (A3)
        T.StructField("f_err", T.StringType(), True),  # MetricKit abort error
        T.StructField("miss_uuid", T.StringType(), True),  # dSYM store-miss uuid (quirk)
        T.StructField("miss_err", T.StringType(), True),  # cached FetchError text (quirk)
        # structured-route JS outputs (sentinels per processor.go:363-366)
        T.StructField("m_col", T.LongType(), True),
        T.StructField("m_func", T.StringType(), True),
        T.StructField("m_line", T.LongType(), True),
        T.StructField("m_url", T.StringType(), True),
        # structured-route proguard outputs (1->N)
        T.StructField(
            "m_jvm",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("class_name", T.StringType(), True),
                        T.StructField("method_name", T.StringType(), True),
                        T.StructField("line_number", T.LongType(), True),
                    ]
                )
            ),
            True,
        ),
    ]
)

_OUT_FIELDS = [(f.name, f.dataType.simpleString()) for f in OUTCOME_SCHEMA.fields]


def out_struct(**given: Column) -> Column:
    """Build a full outcome struct, nulling unspecified fields."""
    cols = []
    for name, typ in _OUT_FIELDS:
        c = given.get(name, F.lit(None))
        cols.append(c.cast(typ).alias(name))
    return F.struct(*cols)


MAX_UINT32 = 4294967295
