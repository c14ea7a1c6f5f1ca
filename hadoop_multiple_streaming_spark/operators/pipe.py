"""The pipe operator — subprocess mapper/reducer with streaming-compatible
line semantics (reference P1-P9, SURVEY §2.2).

The reference delegates ALL row-level computation to user subprocesses:
each input record is written to the subprocess stdin as a line, each
stdout line becomes an output record (MultiPipeMapRed.java:153-230 spawn,
MultiPipeMapper.java:150-169 feed, MROutputThread :427-510 drain). This
module reproduces those semantics on Spark:

* ``pipe_lines(df, cmd)`` — DataFrame[line] -> DataFrame[line] through a
  subprocess, one subprocess per partition, async writer thread so the
  feed never deadlocks against a full stdout pipe (the reference's
  MROutputThread/MRErrorThread decoupling, MultiPipeMapRed.java:427-627).
* stderr side-channel: ``reporter:counter:group,name,amount`` lines
  increment Spark accumulators; ``reporter:status:...`` is logged; other
  stderr passes through to the executor log (P7,
  MultiPipeMapRed.java:512-627; prefix configurable).
* exit-code policy (P9, stream.non.zero.exit.is.failure,
  MultiPipeMapRed.java:162-163,365-376) and record-skip-on-failure (P8,
  MultiPipeMapper.java:183-197).
* env injection (P6, MultiPipeMapRed.java:266-322): sanitized conf
  ("[^0-9A-Za-z] -> _") + user cmdenv + task context.
* quoted command-line splitting (P4, splitArgs
  MultiPipeMapRed.java:107-151) via shlex.

Scale note: this is deliberately the ONLY Python-worker surface in the
engine, and it crosses the boundary in Arrow batches (mapInPandas) —
the earlier per-row RDD pipe spent ~90% of its time on Python<->JVM
row serialization, not subprocess I/O (measured 10x at sf0.1; the
8-branch cat fan-out dropped 46s -> 20s). Each Spark partition maps to
one subprocess, so parallelism == partition count; at 100 TB size
partitions via spark.sql.files.maxPartitionBytes and feed the pipe
from a column-pruned scan serialized with functions.kv.to_lines
(projection happens BEFORE the Python boundary, JVM-side).
"""

from __future__ import annotations

import os
import shlex
import subprocess
import tempfile
import threading
from dataclasses import dataclass, field
from typing import Iterator

from pyspark import AccumulatorParam
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType, StringType, StructField, StructType

from ..functions.kv import (
    join_key_val,
    join_key_val_bytes,
    with_key_val,
    with_key_val_bytes,
)
from ..session import ensure_package_shipped

LINE_SCHEMA = StructType([StructField("line", StringType(), True)])
BINARY_LINE_SCHEMA = StructType([StructField("line", BinaryType(), True)])

#: stderr report prefixes (stream.stderr.reporter.prefix, default
#: "reporter:" — MultiPipeMapRed.java:516-519,525-528)
COUNTER_PREFIX = "reporter:counter:"
STATUS_PREFIX = "reporter:status:"


@dataclass
class PipeOptions:
    """Knobs for one pipe invocation (reference stream.* conf surface)."""

    env: dict[str, str] = field(default_factory=dict)
    #: exit!=0 fails the task when True (stream.non.zero.exit.is.failure)
    non_zero_exit_is_failure: bool = True
    #: skip records on write failure once this many records were written
    #: (stream.minRecWrittenToEnableSkip_, MultiPipeMapRed.java:232-241);
    #: default disables skipping (fail the task).
    min_records_before_skip: int = 2**63 - 1
    #: export task/partition context env vars (mapred_task_partition etc.)
    export_context: bool = True
    #: child TMPDIR. The reference ALWAYS exports
    #: TMPDIR=java.io.tmpdir to the child (MultiPipeMapRed.java:204-205);
    #: None (the default) mirrors that — parent TMPDIR, else the OS
    #: tempdir. A non-None value is an ENGINE EXTENSION (surfaced as
    #: -D stream.tmpdir) overriding the export; the reference's
    #: stream.tmpdir (MapStreamJob.java:645) only staged client-side
    #: job jars and never reached the child env.
    tmpdir: str | None = None
    bufsize: int = 128 * 1024  # reference BUFFER_SIZE MultiPipeMapRed.java:79


def split_args(cmd: str) -> list[str]:
    """Quoted command-line splitting (P4). The reference implements a
    hand-rolled quote-aware tokenizer (splitArgs,
    MultiPipeMapRed.java:107-151); shlex in POSIX mode matches its
    observable behavior for '...'/"..." quoting."""
    return shlex.split(cmd)


def _build_env(opts: PipeOptions, partition_id: int, spark_conf: dict[str, str]) -> dict[str, str]:
    """P6: child env = parent env + sanitized engine conf + user cmdenv
    + task context. Hadoop exports the flattened JobConf with
    non-alphanumerics mapped to '_' (safeEnvVarName,
    MultiPipeMapRed.java:266-322)."""
    env = dict(os.environ)
    for k, v in spark_conf.items():
        safe = "".join(c if c.isalnum() else "_" for c in k)
        env[safe] = v
    env.update(opts.env)
    if opts.export_context:
        env["mapred_task_partition"] = str(partition_id)
        env["mapreduce_task_partition"] = str(partition_id)
    # Reference: TMPDIR is ALWAYS exported to the child
    # (MultiPipeMapRed.java:204-205 exports java.io.tmpdir). Extension:
    # stream.tmpdir (opts.tmpdir) overrides the exported value.
    env["TMPDIR"] = (
        opts.tmpdir
        if opts.tmpdir is not None
        else os.environ.get("TMPDIR", tempfile.gettempdir())
    )
    return env


def _resolve_executable(argv: list[str]) -> list[str]:
    """P5: relative program names resolve against the task's shipped
    files (the reference resolves via PATH + task cwd and chmods shipped
    scripts, MultiPipeMapRed.java:174-199). Absolute paths and
    PATH-resolvable names pass through."""
    prog = argv[0]
    if "/" not in prog:
        try:
            from pyspark import SparkFiles

            cand = os.path.join(SparkFiles.getRootDirectory(), prog)
            if os.path.isfile(cand):
                try:
                    os.chmod(cand, 0o755)
                except OSError:
                    pass
                return [cand, *argv[1:]]
        except Exception:
            pass
    return argv


#: lines per stdin write / per yielded output batch. Sub-chunking the
#: Arrow batches keeps P8's written-record accounting fine-grained
#: enough for skip-mode decisions while amortizing the Python call
#: overhead (one write per 1000 lines, not per line).
_FEED_CHUNK = 1000
_OUT_CHUNK = 10_000


def _pipe_partition(
    batches: Iterator,
    argv: list[str],
    opts: PipeOptions,
    partition_id: int,
    spark_conf: dict[str, str],
    counters,  # dict-accumulator or None
    binary: bool = False,
) -> Iterator:
    """Run one subprocess for this partition; feed Arrow batches on a
    writer thread, yield stdout lines as pandas batches, parse stderr
    reports. Mirrors the reference's thread layout: feed loop /
    MROutputThread / MRErrorThread (MultiPipeMapRunner.java:29-35
    starts drains before the feed).

    Arrow both ways: input arrives as pandas DataFrames (one string
    column), output is yielded as pandas DataFrames — measured ~10x
    faster than the per-row RDD pipe at sf0.1 (per-row Python<->JVM
    serialization dominated that path, not the subprocess I/O).

    ``binary=True`` is the byte-faithful path (the reference's
    Text-is-bytes / BytesWritable passthrough,
    MultiPipeMapRed.java:729-746): the single input column carries raw
    bytes per line, stdin gets them verbatim joined by b'\\n', and
    stdout lines are yielded as raw bytes — NO decode/encode anywhere
    on the record path, so latin-1 logs or mixed binary survive
    bit-exactly. The stderr reporter side-channel stays text-decoded
    (its protocol is ASCII)."""
    import pandas as pd

    proc = subprocess.Popen(
        _resolve_executable(argv),
        stdin=subprocess.PIPE,
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
        bufsize=opts.bufsize,
        env=_build_env(opts, partition_id, spark_conf),
    )

    state = {"written": 0, "skipped": 0, "write_error": None}

    def feed() -> None:
        try:
            assert proc.stdin is not None
            stop = False
            for pdf in batches:
                if stop:
                    break
                col = pdf.iloc[:, 0]
                if binary:
                    lines = [
                        b"" if v is None else bytes(v) for v in col.tolist()
                    ]
                else:
                    lines = col.fillna("").astype(str).tolist()
                for i in range(0, len(lines), _FEED_CHUNK):
                    chunk = lines[i : i + _FEED_CHUNK]
                    if binary:
                        data = b"\n".join(chunk) + b"\n"
                    else:
                        data = ("\n".join(chunk) + "\n").encode("utf-8")
                    try:
                        proc.stdin.write(data)
                        state["written"] += len(chunk)
                    except (BrokenPipeError, OSError) as e:
                        # P8: tolerate subprocess death mid-stream only
                        # once enough records were written (skip mode);
                        # else record the error so the task fails.
                        if state["written"] >= opts.min_records_before_skip:
                            state["skipped"] += len(chunk)
                        else:
                            state["write_error"] = e
                        stop = True
                        break
            try:
                proc.stdin.close()
            except (BrokenPipeError, OSError):
                pass
        except Exception as e:  # surface feeder crashes to the task
            state["write_error"] = e
            try:
                proc.stdin.close()
            except Exception:
                pass

    def drain_stderr() -> None:
        assert proc.stderr is not None
        local: dict[str, int] = {}
        for raw in proc.stderr:
            text = raw.decode("utf-8", errors="replace").rstrip("\n")
            if text.startswith(COUNTER_PREFIX):
                # reporter:counter:group,name,amount
                # (MultiPipeMapRed.java:590-616)
                body = text[len(COUNTER_PREFIX):]
                parts = body.split(",")
                if len(parts) == 3:
                    try:
                        amount = int(parts[2])
                    except ValueError:
                        continue
                    local[f"{parts[0]}.{parts[1]}"] = (
                        local.get(f"{parts[0]}.{parts[1]}", 0) + amount
                    )
            elif text.startswith(STATUS_PREFIX):
                print(f"[pipe status p{partition_id}] {text[len(STATUS_PREFIX):]}")
            else:
                print(f"[pipe stderr p{partition_id}] {text}")
        if counters is not None and local:
            counters.add({_attempt_key(): local})

    writer = threading.Thread(target=feed, daemon=True)
    err_thread = threading.Thread(target=drain_stderr, daemon=True)
    err_thread.start()
    writer.start()

    assert proc.stdout is not None
    n_out = 0
    buf: list = []
    for raw in proc.stdout:
        if binary:
            buf.append(raw[:-1] if raw.endswith(b"\n") else raw)
        else:
            buf.append(raw.decode("utf-8", errors="replace").rstrip("\n"))
        if len(buf) >= _OUT_CHUNK:
            n_out += len(buf)
            yield pd.DataFrame({"line": buf})
            buf = []
    if buf:
        n_out += len(buf)
        yield pd.DataFrame({"line": buf})

    writer.join()
    err_thread.join()
    rc = proc.wait()
    if state["write_error"] is not None:
        raise IOError(
            f"pipe subprocess {argv!r} failed while consuming input "
            f"(after {state['written']} records): {state['write_error']}"
        )
    if rc != 0 and opts.non_zero_exit_is_failure:
        # P9: subprocess exit != 0 fails the task unless tolerated
        raise IOError(f"pipe subprocess {argv!r} exited with code {rc}")
    if counters is not None:
        counters.add(
            {
                _attempt_key(): {
                    "pipe.records_written": state["written"],
                    "pipe.records_read": n_out,
                    "pipe.records_skipped": state["skipped"],
                }
            }
        )


def _attempt_key() -> str:
    """Key counter updates by (stage, partition, taskAttemptId) so
    retried / speculative task attempts can be deduplicated at read
    time — Hadoop discards failed attempts' counters
    (MultiPipeMapRed.java:512-627) and so must we, or every retry
    double-counts. taskAttemptId (globally unique, monotonically
    increasing) rather than attemptNumber: a stage RESUBMISSION after
    shuffle-fetch failure restarts attemptNumber at 0 in the new task
    set — two successful runs of the same partition would share a key
    and sum instead of dedup. The latest taskAttemptId wins."""
    from pyspark import TaskContext

    ctx = TaskContext.get()
    if ctx is None:  # driver-side / local testing path
        return "driver:0:0"
    return f"{ctx.stageId()}:{ctx.partitionId()}:{ctx.taskAttemptId()}"


class _DictAccumulator(AccumulatorParam):
    """AccumulatorParam merging {attempt_key: {name: count}} dicts
    (P7 counters, attempt-keyed for retry dedup)."""

    def zero(self, value):
        return {}

    def addInPlace(self, a, b):
        for key, vals in b.items():
            cur = a.setdefault(key, {})
            for name, n in vals.items():
                cur[name] = cur.get(name, 0) + n
        return a


def make_counters(spark: SparkSession):
    """Create a counters accumulator for the stderr reporter protocol."""
    return spark.sparkContext.accumulator({}, _DictAccumulator())


def read_counters(counters) -> dict[str, int]:
    """Collapse attempt-keyed updates into job totals, keeping only the
    LAST attempt (highest taskAttemptId) per (stage, partition). A task
    that fails mid-stream and is retried — or re-runs in a resubmitted
    stage — contributes exactly one attempt's worth of counts: Hadoop's
    successful-attempt-only counter semantics. (A partition recomputed
    in a *different* stage — lineage recompute after an evicted persist
    — still counts per stage; persist/materialize the piped stage to
    avoid recompute, as run_job's share modes do.)"""
    best: dict[tuple[str, str], tuple[int, dict]] = {}
    for key, vals in (counters.value or {}).items():
        stage, part, attempt = key.split(":")
        k = (stage, part)
        a = int(attempt)
        if k not in best or a > best[k][0]:
            best[k] = (a, vals)
    totals: dict[str, int] = {}
    for _, vals in best.values():
        for name, n in vals.items():
            totals[name] = totals.get(name, 0) + n
    return totals


def pipe_lines(
    df: DataFrame,
    cmd: str | list[str],
    opts: PipeOptions | None = None,
    counters=None,
    binary: bool = False,
) -> DataFrame:
    """DataFrame[line:string] -> DataFrame[line:string] through ``cmd``.

    One subprocess per partition (the reference spawns one per map task
    per branch, MultiPipeMapRed.java:171-221). The input DataFrame must
    have exactly one string column.

    NOTE (byte fidelity): the default string path encodes stdin as
    UTF-8 and decodes stdout with ``errors='replace'`` — a subprocess
    emitting non-UTF-8 bytes (latin-1 logs, mixed binary) gets its
    bytes U+FFFD-mangled SILENTLY. The reference passes raw bytes
    (Text is bytes; BytesWritable passthrough,
    MultiPipeMapRed.java:729-746); for that contract pass
    ``binary=True`` with a single BINARY column — lines then round-trip
    bit-exactly and the result column is ``line: binary``. Line framing
    still applies in binary mode (records are newline-separated, as in
    the reference): a 0x0A byte INSIDE a record splits it on read-back,
    exactly as it would in Hadoop streaming.
    """
    opts = opts or PipeOptions()
    argv = split_args(cmd) if isinstance(cmd, str) else list(cmd)
    if len(df.columns) != 1:
        raise ValueError(f"pipe_lines expects a single line column, got {df.columns}")
    col_type = df.schema[df.columns[0]].dataType
    if binary and not isinstance(col_type, BinaryType):
        raise TypeError(
            f"pipe_lines(binary=True) expects a single BINARY column, got "
            f"{col_type.simpleString()} — cast string lines with "
            f"encode(col, 'UTF-8') or read raw bytes"
        )

    spark = df.sparkSession
    ensure_package_shipped(spark)
    # export only engine-relevant conf (full flattened conf would be
    # thousands of vars); mirrors the spirit of P6 without the bloat.
    conf_export = {
        k: v
        for k, v in spark.sparkContext.getConf().getAll()
        if k.startswith(("spark.app", "spark.master"))
    }

    def run(batches: Iterator) -> Iterator:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else -1
        return _pipe_partition(
            batches, argv, opts, pid, conf_export, counters, binary=binary
        )

    # mapInPandas (Arrow both ways) keeps within-partition row order —
    # the sorted-stream reducer contract (G1) survives; one subprocess
    # per partition as before.
    return df.toDF("line").mapInPandas(
        run, schema=BINARY_LINE_SCHEMA if binary else LINE_SCHEMA
    )


def pipe_map(
    df_lines: DataFrame,
    cmd: str | list[str],
    separator: str = "\t",
    num_key_fields: int = 1,
    opts: PipeOptions | None = None,
    counters=None,
    binary: bool = False,
) -> DataFrame:
    """Pipe-map (P1 for one branch): lines -> subprocess -> (key, value).

    The stdout split uses splitKeyVal semantics (functions.kv). The
    reference then normalizes the intermediate to ``key\\tvalue``
    (MultiPipeMapRed.java:458-463); we keep (key, value) columns — the
    normalization happens if/when serialized by join_key_val.

    ``binary=True`` (r15): the byte-faithful KV path — input is a
    single BINARY line column, the subprocess sees raw bytes, and the
    stdout split scans bytes exactly as the reference's splitKeyVal
    does (MultiPipeMapRed.java:403-425), returning
    ``(key: binary, value: binary)`` — latin-1 keys survive bit-exact
    through the whole map→shuffle→reduce chain. ``separator`` is then
    interpreted as bytes (a str separator is encoded latin-1)."""
    out = pipe_lines(df_lines, cmd, opts=opts, counters=counters, binary=binary)
    if binary:
        sep_b = (
            separator.encode("iso-8859-1")
            if isinstance(separator, str)
            else bytes(separator)
        )
        return with_key_val_bytes(out, "line", sep_b, num_key_fields)
    return with_key_val(out, "line", separator, num_key_fields)


def pipe_reduce(
    df_kv: DataFrame,
    cmd: str | list[str],
    num_partitions: int | None = None,
    separator: str = "\t",
    num_key_fields: int = 1,
    opts: PipeOptions | None = None,
    counters=None,
    partition_fields: list[int] | None = None,
    sort_fields: list[tuple[int, bool]] | None = None,
    binary: bool = False,
) -> DataFrame:
    """Pipe-reduce (P2/G1): hash-partition by key, sort by key within
    partitions, stream the whole sorted partition (`key\\tvalue` lines)
    through the reducer subprocess — Hadoop-reducer semantics where one
    subprocess sees ALL groups of its partition in key order
    (RedStreamJob.java:745-762; SURVEY §7 'hard' #3).

    partition_fields / sort_fields reproduce the G2/G5 surface
    (KeyFieldBasedPartitioner / KeyFieldBasedComparator): partition on
    chosen key subfields, sort within partitions on chosen subfields —
    one Exchange + one Sort either way.

    Returns (key, value) columns split from the reducer's stdout.

    ``binary=True`` (r15): byte-faithful reduce — (key, value) are
    BINARY columns, the shuffle hash-partitions and sorts on raw bytes
    (Spark's BinaryType ordering is unsigned-lexicographic, the same
    order Hadoop's Text/BytesWritable comparators use), lines are
    rebuilt by binary concat, and the reducer's stdout re-splits on
    bytes (MultiPipeMapRed.java:403-425). partition_fields/sort_fields
    are a text-subfield surface and are not supported in binary mode.
    """
    if set(df_kv.columns) != {"key", "value"}:
        raise ValueError(f"pipe_reduce expects (key, value) columns, got {df_kv.columns}")
    n = num_partitions or df_kv.sparkSession.sparkContext.defaultParallelism
    if binary:
        if partition_fields or sort_fields:
            raise ValueError(
                "pipe_reduce(binary=True) does not support partition_fields/"
                "sort_fields (text subfield semantics); pre-arrange the bytes"
            )
        sep_b = (
            separator.encode("iso-8859-1")
            if isinstance(separator, str)
            else bytes(separator)
        )
        arranged = df_kv.repartition(n, "key").sortWithinPartitions("key")
        lines = arranged.select(
            join_key_val_bytes("key", "value", sep_b).alias("line")
        )
        out = pipe_lines(lines, cmd, opts=opts, counters=counters, binary=True)
        return with_key_val_bytes(out, "line", sep_b, num_key_fields)
    if partition_fields or sort_fields:
        from .shuffle import partition_sort

        arranged = partition_sort(df_kv, n, partition_fields, sort_fields, separator)
    else:
        arranged = df_kv.repartition(n, "key").sortWithinPartitions("key")
    lines = arranged.select(join_key_val("key", "value", separator).alias("line"))
    out = pipe_lines(lines, cmd, opts=opts, counters=counters)
    return with_key_val(out, "line", separator, num_key_fields)


def grouped_pipe_reduce(
    df_kv: DataFrame,
    cmd: str | list[str],
    separator: str = "\t",
    num_key_fields: int = 1,
    opts: PipeOptions | None = None,
) -> DataFrame:
    """Per-GROUP pipe reduce (the applyInPandas flavor of P2): one
    subprocess invocation per key group, fed only that group's sorted
    lines — full isolation between keys, unlike Hadoop's
    whole-partition streaming (pipe_reduce). Use when a reducer keeps
    state it must not leak across keys, at the cost of one process
    spawn per key.

    Grouped-map pandas path (Arrow batches both ways); the subprocess
    contract is identical to pipe_reduce: `key SEP value` lines on
    stdin (value-sorted within the group), stdout lines re-split by
    splitKeyVal.
    """
    opts = opts or PipeOptions()
    argv = split_args(cmd) if isinstance(cmd, str) else list(cmd)
    ensure_package_shipped(df_kv.sparkSession)

    def run_group(pdf):
        import pandas as pd

        pdf = pdf.sort_values(["key", "value"], kind="mergesort")
        payload = "".join(
            f"{k}{separator}{v}\n" for k, v in zip(pdf["key"], pdf["value"])
        )
        proc = subprocess.run(
            _resolve_executable(argv),
            input=payload.encode("utf-8"),
            capture_output=True,
        )
        if proc.returncode != 0 and opts.non_zero_exit_is_failure:
            raise IOError(
                f"grouped pipe {argv!r} exited {proc.returncode}: "
                f"{proc.stderr.decode('utf-8', 'replace')[:500]}"
            )
        keys, values = [], []
        for line in proc.stdout.decode("utf-8", "replace").splitlines():
            k, sep_found, v = line.partition(separator)
            if num_key_fields > 1:
                parts = line.split(separator)
                if len(parts) > num_key_fields:
                    k = separator.join(parts[:num_key_fields])
                    v = separator.join(parts[num_key_fields:])
                else:
                    k, v = line, ""
            elif not sep_found:
                k, v = line, ""
            keys.append(k)
            values.append(v)
        return pd.DataFrame({"key": keys, "value": values})

    return df_kv.groupBy("key").applyInPandas(run_group, schema="key string, value string")
