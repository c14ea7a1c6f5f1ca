"""SparkSession factory + engine configuration.

The reference exposed its config surface as ``-D``/``-jobconf`` JobConf
passthrough plus a handful of ``stream.*`` knobs
(MapStreamJob.java:325-332, MultiPipeMapRed.java:157,162-163,232-241).
Here the engine config is an explicit dataclass (no stringly smuggling)
and the SparkSession is tuned for OLAP-at-scale defaults: AQE on
(runtime re-plan, skew-join splitting, partition coalescing), UTC
session timezone (oracle comparability), Arrow for pandas interchange.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import SparkSession


@dataclass
class EngineConfig:
    """Engine-level knobs (reference: stream.* JobConf keys).

    non_zero_exit_is_failure  <- stream.non.zero.exit.is.failure
                                 (MultiPipeMapRed.java:162-163)
    min_records_before_skip   <- stream.minRecWrittenToEnableSkip_
                                 (MultiPipeMapRed.java:232-241)
    field_separator           <- stream.map.output.field.separator
                                 (MultiPipeMapper.java:117-122)
    num_key_fields            <- stream.num.map.output.key.fields
                                 (MultiPipeMapper.java:123-124)
    """

    non_zero_exit_is_failure: bool = True
    min_records_before_skip: int = 2**63 - 1  # skip disabled by default
    field_separator: str = "\t"
    num_key_fields: int = 1
    #: -D stream.tmpdir — ENGINE EXTENSION: overrides the child's
    #: always-exported TMPDIR (the reference always exports
    #: java.io.tmpdir, MultiPipeMapRed.java:204-205; its own
    #: stream.tmpdir, MapStreamJob.java:645, only staged client-side
    #: job jars). None = export parent TMPDIR / OS tempdir.
    tmpdir: str | None = None
    cmd_env: dict[str, str] = field(default_factory=dict)

    @classmethod
    def from_conf(cls, conf: dict[str, str]) -> "EngineConfig":
        """Map the reference's ``-D stream.*`` keys onto engine knobs
        (consumed by cli.parse_job -> JobSpec -> PipeOptions)."""
        cfg = cls()
        nz = conf.pop("stream.non.zero.exit.is.failure", None)
        if nz is not None:
            cfg.non_zero_exit_is_failure = nz.strip().lower() != "false"
        skip = conf.pop("stream.minrecwrittentoenableskip", None)
        if skip is not None:
            cfg.min_records_before_skip = int(skip)
        cfg.field_separator = conf.pop("stream.map.output.field.separator", cfg.field_separator)
        nkf = conf.pop("stream.num.map.output.key.fields", None)
        if nkf is not None:
            cfg.num_key_fields = int(nkf)
        cfg.tmpdir = conf.pop("stream.tmpdir", cfg.tmpdir)
        return cfg
    # scan sharing strategy for fan-out: "persist" (cache in executors,
    # right for inputs that fit cluster memory+disk) or "materialize"
    # (phase-1-style write of branch inputs, right at 100 TB where the
    # cache cannot hold the scan — mirrors the reference's mapoutput/
    # intermediate, MultiStreamJobRunner.java:48-73).
    share_mode: str = "persist"


def _default_driver_memory() -> str:
    """Heap sized to the machine: half of physical RAM, clamped to
    [4g, 64g]. local[N] runs the executors INSIDE the driver JVM, so
    a fixed small -Xmx starves every core at once (a flat 8g on a
    32-core/128 GiB host is 256 MB/core — measured OOM on the exact
    n-gram Jaccard pair stream at sf4.0, where any real cluster gives
    an executor 2-8 GB/core). $SPARK_DRIVER_MEMORY still overrides."""
    try:
        total = os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES")
        return f"{max(4, min(64, int(total // (1 << 30)) // 2))}g"
    except (ValueError, OSError, AttributeError):
        return "8g"


def get_spark(
    app_name: str = "hadoop-multiple-streaming-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with scale-minded defaults.

    Local test runs honor $SPARK_GRAFT_CPUS; on a real cluster pass
    ``master=None`` and let spark-submit decide.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "8")
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = max(int(cpus) if cpus.isdigit() else 8, 8)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.scheduler.mode", "FAIR")
        # static conf, read once at first codegen: the default 100-entry
        # generated-class cache thrashes when a session runs a whole
        # query catalog (each multi-stage query compiles several
        # WholeStageCodegen classes; eviction = multi-second Janino
        # recompiles on re-run)
        .config("spark.sql.codegen.cache.maxEntries", "2000")
        # A long-lived driver with a machine-sized heap almost never
        # runs a full GC, so the ContextCleaner (which cleans shuffle
        # files and broadcast blocks only after the driver GC collects
        # their references) effectively never fires; state from
        # COMPLETED jobs then accumulates until a later heavy job dies
        # with UNABLE_TO_ACQUIRE_MEMORY (measured: third consecutive
        # sf4.0 ngram-Jaccard run in one 64g session, after two clean
        # ~6-min passes). 5 min instead of the 30-min default bounds
        # that accumulation for exactly the session shape this engine
        # runs: one driver submitting many jobs back to back.
        .config(
            "spark.cleaner.periodicGC.interval",
            os.environ.get("SPARK_GRAFT_PERIODIC_GC", "5min"),
        )
        # lz4 (Spark's default) for shuffle/spill/broadcast blocks.
        # Round 10 defaulted this to zstd after it halved the sf8.0
        # ngram-Jaccard pair-shuffle disk footprint; a round-11
        # interleaved 4-config A/B on the FULL 40-query sf0.1 bench
        # (DEPLOY.md codec table) showed zstd costs ~6 s / +18% there —
        # family-shaped across 33/40 queries, i.e. a uniform per-stage
        # compression tax on floor-dominated work. lz4 is the right
        # default for compute-bound single-node runs; flip to zstd via
        # $SPARK_GRAFT_IO_CODEC (or spark.io.compression.codec on a
        # cluster) when shuffle BYTES are the scarce resource — disk
        # quotas, network-bound multi-node shuffles, the heavy-SF
        # crossover harness (tools/bench_crossover.py does this).
        .config(
            "spark.io.compression.codec",
            os.environ.get("SPARK_GRAFT_IO_CODEC", "lz4"),
        )
        # default-true, pinned EXPLICITLY (r13, the r12 verdict's
        # driver-host Arrow-inflation chase): every Arrow-fenced stage
        # (mapInPandas kernels, pandas_udfs) forks a Python worker per
        # core unless the pool is reused across jobs; an environment
        # that flipped this off would pay worker cold-start on every
        # rep and read as a sustained 3-6x Arrow-row inflation
        .config("spark.python.worker.reuse", "true")
        .config("spark.ui.enabled", "false")
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_DRIVER_MEMORY", _default_driver_memory()),
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    # ship the engine to executors unconditionally: module-level
    # closures (mapInPandas feature extractors, pandas_udf kernels,
    # the sentence UDTF) unpickle BY REFERENCE to engine modules, so a
    # worker whose cwd is not the repo (any real cluster; local runs
    # launched from another directory) dies with ModuleNotFoundError
    # unless the package zip rides sc.addPyFile. Idempotent per app.
    ensure_package_shipped(spark)
    return spark


_SHIPPED: set[str] = set()


def ensure_package_shipped(spark: SparkSession) -> None:
    """Ship this package to executors via ``sc.addPyFile`` (S10 — the
    reference ships user scripts/jars with -file/-cacheFile,
    MapStreamJob.java:282-288,890-906; here the engine ships ITSELF so
    closures that reference engine modules unpickle on any worker,
    local or cluster). Idempotent per SparkContext."""
    sc = spark.sparkContext
    app_id = sc.applicationId
    if app_id in _SHIPPED:
        return
    import tempfile
    import zipfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    pkg_name = os.path.basename(pkg_dir)
    fd, zip_path = tempfile.mkstemp(prefix="hms_spark_", suffix=".zip")
    os.close(fd)
    with zipfile.ZipFile(zip_path, "w") as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    rel = os.path.join(pkg_name, os.path.relpath(full, pkg_dir))
                    zf.write(full, rel)
    sc.addPyFile(zip_path)
    _SHIPPED.add(app_id)


def tune_session(spark: SparkSession) -> SparkSession:
    """Apply engine defaults to an externally-provided session (the
    driver harness hands us one); only runtime-settable confs."""
    for k, v in {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
    }.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # static confs on a running session — leave as-is
    # the driver's session needs the engine on its executors for the
    # same reason get_spark ships it (see ensure_package_shipped)
    ensure_package_shipped(spark)
    return spark
