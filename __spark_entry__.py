"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship symbolication pipeline
(parse -> enrich -> route -> aggregate over synthetic multi-turn agent
transcripts, SURVEY.md §7 Stage 1) at sf0.001 scale and returns the
per-sink aggregate DataFrame.

``queries()``/``oracle_sql()`` expose the operator catalog
(symspark/plans/queries.py): every SQL-expressible operator family from
SURVEY.md §2 plus the training-data ops (dedup / ANN / text analysis) has
a DuckDB oracle; the transcript-pipeline runs are rows-only checks (their
byte-exact goldens live in tests/test_pipeline.py).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from symspark.plans import queries as Q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR_SMOKE", "/root/testdata/sf0.001")
    return Q.SPARK_QUERIES["pipeline_sink_counts"](spark, sf_dir)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(Q.SPARK_QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each SQL-expressible query."""
    return dict(Q.ORACLE_SQL)
