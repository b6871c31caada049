"""SparkSession construction tuned for the validation workload.

Scale notes (the settings below are chosen for a multi-executor cluster
even though tests run on local[N]):

- AQE on: runtime coalescing of shuffle partitions + skew-join splitting
  (the corpus doc_id key space is prefix-clustered — see corpus.py).
- Arrow on: every pandas UDF crossing is Arrow-batched; we never use
  row-at-a-time Python UDFs.
- shuffle partitions default to cores locally; on a real cluster this is
  overridden by --conf at spark-submit time (engine code never assumes a
  fixed partition count).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "gwv_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
    master: str | None = None,
) -> SparkSession:
    """master overrides the default local[cpus] — e.g.
    'local-cluster[4,4,16384]' spawns 4 REAL executor JVMs with their own
    heaps and netty shuffle, the shape used for the N-vs-4N-executor
    scaling evidence (tools/scaling_bench.py).  cpus still sizes
    shuffle_partitions when not given explicitly."""
    cpus = cpus or DEFAULT_CPUS
    shuffle_partitions = shuffle_partitions or cpus
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        # Corpus self-joins must NEVER be planned as static broadcasts —
        # at the north rule's 10^12-doc scale no corpus-derived side fits
        # the driver.  Static auto-broadcast is therefore off; true
        # dimension tables are broadcast EXPLICITLY (F.broadcast in the
        # rule/dim code), and AQE may still convert a join to broadcast
        # at runtime from the MEASURED post-shuffle size ("broadcast or
        # sort-merge depending on cardinality") — exactly the decision a
        # real deployment wants, with no driver-side guess.
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "16m")
        # hive-style partitioned violation sinks: a resumed run must only
        # replace the partitions it actually recomputed
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
