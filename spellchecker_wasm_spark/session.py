"""SparkSession factory with scale-oriented defaults.

Local testing runs on local[N]; the conf is written for the 1000-executor /
100 TB case and degrades gracefully: AQE handles runtime re-planning and
skew-join splitting, shuffle partitions are sized from parallelism, Arrow
batches keep the pandas-UDF exchange vectorized.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "spellchecker_wasm_spark",
              cpus: int | None = None,
              shuffle_partitions: int | None = None,
              extra_conf: dict | None = None) -> SparkSession:
    # make the package importable on executor Python workers regardless of
    # the driver's cwd (workers read PYTHONPATH, not driver sys.path)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if repo_root not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (repo_root + os.pathsep + existing
                                    if existing else repo_root)
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        # ~2x cores locally; on a real cluster AQE coalesces from a high
        # initial count, so err high rather than low.  Override via env
        # when input size outgrows the per-partition memory budget (the
        # shuffle-hash build side scales with partition size).
        shuffle_partitions = int(os.environ.get(
            "SPARK_GRAFT_SHUFFLE_PARTITIONS", max(2 * cpus, 8)))
    # SPARK_GRAFT_MASTER overrides the default local[N] — used by the
    # scaling harness to run a true multi-process pair
    # (local-cluster[N,cores,mem]: one JVM per executor, real
    # netty/shuffle-service exchange) so a shared-JVM confound can't
    # explain a scaling reading.  Everything else (AQE, Arrow, UDS,
    # shuffle partitions) stays identical across masters.
    master = os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(cpus))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # AQE skips plans under a persisted relation unless this is on
        # (SPARK-35332): without it every cached-subtree materialization
        # runs with static shuffle widths and no runtime broadcast-join
        # conversion — measured 2-3x on the round-6 shared-subtree
        # persists (lookup dictionary, linkage scored pairs).  Output
        # partitioning of the cache may then vary with AQE's coalescing,
        # which is fine everywhere here (no consumer relies on a cached
        # frame's physical partitioning).
        .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
                "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # JVM↔Python-worker exchange over unix domain sockets: with many
        # concurrent Arrow streams, TCP loopback burns 70-90% of CPU in
        # kernel time — UDS measured 8-10× faster at 32 workers
        .config("spark.python.unix.domain.socket.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "100000")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.extraJavaOptions", "-Djava.net.preferIPv4Stack=true")
    )
    # env-supplied conf overrides (JSON object) — lets subprocess bench
    # legs trial spark confs (GC, compression codecs) without code edits;
    # applied before caller extra_conf so explicit args still win
    env_conf = os.environ.get("SPARK_GRAFT_EXTRA_CONF")
    if env_conf:
        import json
        for k, v in json.loads(env_conf).items():
            b = b.config(k, v)
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
