"""ksql-dialect entry point: run the reference's three REST payloads verbatim.

The reference drives ksqlDB over REST with exactly three statements
(reference: ci_cd/ksql/create_stream.json:2, create_table.json:2,
select_hotels.json:2; Makefile targets ci_cd/Makefile:112-127). This module
gives the same surface on Spark: ``KsqlContext.execute(payload_or_sql)``
accepts each payload's SQL string (ksql dialect) and maps it onto Spark SQL:

- ``CREATE STREAM name (cols...) WITH (KAFKA_TOPIC=..., VALUE_FORMAT=JSON)``
  -> schema-on-read projection over the registered source for that topic
  (a DataFrame registered under the topic name — batch or streaming), i.e.
  ksql's "stream = SQL view over a topic" semantics (SURVEY.md §1.1).
- ``CREATE TABLE name AS SELECT ... GROUP BY ...`` -> a Spark SQL view.
  ``COUNT_DISTINCT`` (ksql spelling) is rewritten to ANSI
  ``COUNT(DISTINCT ...)`` — exact in batch; the streaming variant lives in
  ``streaming.pipeline`` (approx HLL or exact two-phase, SURVEY.md §7).
- ``SELECT ... EMIT CHANGES`` -> the continuous form; in batch context the
  EMIT CHANGES suffix is stripped (a pull query over the current state —
  each batch evaluation IS the latest changelog snapshot).

Only the dialect subset the reference uses is translated; anything else
passes through to ``spark.sql`` untouched.
"""

from __future__ import annotations

import json
import re

from pyspark.sql import DataFrame, SparkSession

_KSQL_TO_SPARK_TYPES = {
    "BIGINT": "BIGINT",
    "INTEGER": "INT",
    "INT": "INT",
    "VARCHAR": "STRING",
    "STRING": "STRING",
    "DOUBLE": "DOUBLE",
    "BOOLEAN": "BOOLEAN",
}

_CREATE_STREAM_RE = re.compile(
    r"CREATE\s+STREAM\s+(?P<name>\w+)\s*\((?P<cols>.*?)\)\s*"
    r"WITH\s*\((?P<props>.*?)\)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_CREATE_TABLE_RE = re.compile(
    r"CREATE\s+TABLE\s+(?P<name>\w+)\s+AS\s+(?P<select>.*?);?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_EMIT_CHANGES_RE = re.compile(r"\s+EMIT\s+CHANGES\s*", re.IGNORECASE)
_COUNT_DISTINCT_RE = re.compile(r"\bCOUNT_DISTINCT\s*\(", re.IGNORECASE)


class KsqlContext:
    """Executes ksql-dialect statements against a SparkSession.

    Topics are modeled as registered DataFrames: ``register_topic("expedia_ext",
    df)`` is the analog of the topic existing on the broker. CREATE STREAM
    then projects its declared columns from that source (schema-on-read:
    undeclared fields are ignored), CREATE TABLE AS registers the aggregate
    as a view, and SELECT returns a DataFrame.
    """

    def __init__(self, spark: SparkSession) -> None:
        self.spark = spark
        self._topics: dict[str, DataFrame] = {}

    # -- topic registry (the "broker") ------------------------------------
    def register_topic(self, topic: str, df: DataFrame) -> None:
        self._topics[topic] = df

    # -- statement execution ----------------------------------------------
    def execute(self, payload_or_sql: str) -> DataFrame | None:
        """Accepts either the raw REST payload JSON ({"ksql": "..."}), as
        stored in the reference's ci_cd/ksql/*.json, or a bare SQL string."""
        sql = payload_or_sql.strip()
        if sql.startswith("{"):
            sql = json.loads(sql)["ksql"]
        sql = sql.strip()

        m = _CREATE_STREAM_RE.match(sql)
        if m:
            return self._create_stream(m["name"], m["cols"], m["props"])
        m = _CREATE_TABLE_RE.match(sql)
        if m:
            return self._create_table(m["name"], m["select"])
        return self._select(sql)

    # -- handlers ----------------------------------------------------------
    def _create_stream(self, name: str, cols: str, props: str) -> DataFrame:
        topic = None
        for p in props.split(","):
            k, _, v = p.partition("=")
            if k.strip().upper() == "KAFKA_TOPIC":
                topic = v.strip().strip("'\"")
        if topic is None or topic not in self._topics:
            raise ValueError(
                f"CREATE STREAM {name}: topic {topic!r} not registered "
                f"(known: {sorted(self._topics)})"
            )
        src = self._topics[topic]
        # schema-on-read projection: only the declared columns, cast to the
        # declared types; declared-but-missing columns come back as NULLs
        # (ksql JSON semantics), extra source columns are dropped.
        exprs = []
        for colspec in cols.split(","):
            parts = colspec.split()
            cname, ctype = parts[0], _KSQL_TO_SPARK_TYPES[parts[1].upper()]
            if cname in src.columns:
                exprs.append(f"CAST({cname} AS {ctype}) AS {cname}")
            else:
                exprs.append(f"CAST(NULL AS {ctype}) AS {cname}")
        out = src.selectExpr(*exprs)
        out.createOrReplaceTempView(name)
        return out

    def _create_table(self, name: str, select: str) -> DataFrame:
        select = _COUNT_DISTINCT_RE.sub("COUNT(DISTINCT ", select)
        out = self.spark.sql(select)
        out.createOrReplaceTempView(name)
        return out

    def _select(self, sql: str) -> DataFrame:
        # EMIT CHANGES: continuous push query. Over batch state, evaluating
        # the view IS the current changelog snapshot (the streaming update
        # path lives in streaming.pipeline).
        sql = _EMIT_CHANGES_RE.sub(" ", sql).rstrip().rstrip(";")
        return self.spark.sql(sql)
