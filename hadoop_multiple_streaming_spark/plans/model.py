"""The engine's plan IR — explicit dataclasses instead of the
reference's stringly JobConf smuggling (stream.dir.key<i>,
stream.*.streamprocessor<i>, MapStreamJob.java:751-777; SURVEY §1.2).

A Branch is the reference's novel abstraction: a (dirKey, mapper,
reducer) triple parsed from ``-mapred "DIRKEY/mapCmd/redCmd"``
(MapStreamJob.java:266-278). The reference's '/'-delimited encoding
cannot express absolute paths — per SURVEY §1.2 we keep the concept
and fix the encoding ('|' delimiter, or construct Branch directly).

Mapper/reducer may each be:
  * a command string / argv list  -> subprocess pipe (P1/P2)
  * a Python callable             -> native branch (F3's Java-class
        branch, generalized): mapper f(DataFrame[line])->DataFrame
        with (key,value) or a single column; reducer
        f(DataFrame[key,value])->DataFrame[key,value]
  * None / "NONE"                 -> identity map / map-only branch
        (S11, -reducer NONE -> numReduceTasks(0),
        RedStreamJob.java:744-746,813-815)
  * reducer "aggregate"           -> the §2.5 aggregate family
        (RedStreamJob.java:747-749)
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Union

PipeCmd = Union[str, list[str]]
Transform = Callable  # DataFrame -> DataFrame

NONE = "NONE"
AGGREGATE = "aggregate"


@dataclass
class Branch:
    dir_key: str
    mapper: PipeCmd | Transform | None = None
    reducer: PipeCmd | Transform | None = None
    #: reducer parallelism == number of output files (G3)
    num_reduce_tasks: int | None = None
    #: accepted for CLI compatibility; a no-op because Catalyst's hash
    #: aggregation is already partial+final (G4, SURVEY §4.1)
    combiner: str | None = None
    env: dict[str, str] = field(default_factory=dict)

    @classmethod
    def parse(cls, spec: str, delimiter: str = "|") -> "Branch":
        """Parse ``DIRKEY|mapperCmd|reducerCmd`` (README's advertised
        encoding, /root/reference/README.md:8-11; the reference's
        actual '/' delimiter is accepted as a fallback when the spec
        contains no '|')."""
        if delimiter not in spec and "/" in spec:
            delimiter = "/"
        parts = spec.split(delimiter)
        if not 1 <= len(parts) <= 3:
            raise ValueError(f"bad branch spec {spec!r}: want DIRKEY|mapper|reducer")
        dir_key = parts[0]
        mapper = parts[1] if len(parts) > 1 and parts[1] else None
        reducer = parts[2] if len(parts) > 2 and parts[2] else None
        if not dir_key:
            raise ValueError(f"bad branch spec {spec!r}: empty dirKey")
        return cls(dir_key=dir_key, mapper=mapper, reducer=reducer)

    @property
    def is_map_only(self) -> bool:
        return self.reducer is None or self.reducer == NONE


@dataclass
class JobSpec:
    """One fan-out job: N branches over one input, one scan."""

    inputs: list[str]
    output: str
    branches: list[Branch]
    input_format: str = "text"  # text | keyvalue | parquet | csv | json
    input_options: dict[str, str] = field(default_factory=dict)
    #: for typed inputs: project to these columns BEFORE serializing to
    #: lines, so the pruning reaches the parquet scan (a scan that reads
    #: all columns for a 2-column pipe feed is wrong at 100 TB)
    input_columns: list[str] | None = None
    #: parallelism floor for the scan: pipe subprocess count == partition
    #: count, so a small single-file input would otherwise run every
    #: branch through ONE subprocess (the reference's parallelism came
    #: from HDFS splits; at 100 TB the scan yields plenty — this knob is
    #: for small/medium inputs with expensive mappers)
    min_input_partitions: int | None = None
    #: G2 (KeyFieldBasedPartitioner): partition the reduce shuffle on
    #: these 1-based key subfields instead of the whole key
    partition_fields: list[int] | None = None
    #: G5 (KeyFieldBasedComparator): sort within partitions on these
    #: (field, ascending) pairs — Hadoop secondary sort
    sort_fields: list[tuple[int, bool]] | None = None
    #: serialize typed inputs to lines with this separator before piping
    separator: str = "\t"
    num_key_fields: int = 1
    cmd_env: dict[str, str] = field(default_factory=dict)
    files: list[str] = field(default_factory=list)  # -file shipping (S10)
    #: -cacheArchive: archives unpacked into task working dirs (S10)
    archives: list[str] = field(default_factory=list)
    #: "persist" = cache the scan in executors; "materialize" = write
    #: per-branch mapoutput/<dirKey>/ like the reference's phase 1
    #: (right at 100 TB, SURVEY §4.1); "none" = re-scan per branch
    #: (input already fast/columnar and branches prune differently).
    share_mode: str = "persist"
    #: S9 (-outputformat, RedStreamJob.java:785-797): final sink format
    #: per branch output. "text" = the reference's TextOutputFormat
    #: (`key SEP value` lines via write_kv_text); any other name is a
    #: DataSourceV2 format (parquet/csv/json/orc/...) written from the
    #: (key, value) frame via write_table — the reflective
    #: class-for-name load, Spark-style.
    output_format: str = "text"
    non_zero_exit_is_failure: bool = True
    #: P8: skip records on subprocess write failure once this many were
    #: written (stream.minRecWrittenToEnableSkip_,
    #: MultiPipeMapRed.java:232-241); default = skipping disabled.
    min_records_before_skip: int = 2**63 - 1
    #: stream.tmpdir (extension): overrides the child's always-exported
    #: TMPDIR (None = export parent TMPDIR / OS tempdir, matching the
    #: reference's unconditional export, MultiPipeMapRed.java:204-205)
    tmpdir: str | None = None
    overwrite: bool = False
    #: materialize mode only: branches whose mapoutput/<dirKey>/ already
    #: exists WITH a _SUCCESS marker skip phase 1 and reduce straight
    #: from the existing intermediate — the restart story at 100 TB (a
    #: failed run's completed map work is never repeated; the reference
    #: gets this from HDFS job recovery). Half-written intermediates
    #: (no _SUCCESS) are rewritten.
    resume: bool = False

    def __post_init__(self) -> None:
        if not self.branches:
            raise ValueError("JobSpec needs at least one branch")
        keys = [b.dir_key for b in self.branches]
        if len(set(keys)) != len(keys):
            raise ValueError(f"duplicate branch dirKeys: {keys}")
