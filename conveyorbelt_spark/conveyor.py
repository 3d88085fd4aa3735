"""The conveyor: source registry + end-to-end scheduled ingest→parse→filter→
index runs — the user-facing surface a reference operator would switch to.

Reference analogues:
- DiagnosticsSource config row (Configuration/DiagnosticsSource.cs:9-196,
  README.md:55-68)                        → ``SourceSpec``
- TableStorageConfigurationSource (S8)    → ``SourceRegistry`` (JSON file)
- MasterScheduler.ScheduleSourcesAsync    → ``run_sources`` (driver is the
  sole planner; no leases/queues needed — SURVEY §2.2 P5)
- FactoryHelper parser-by-name reflection (Internal/FactoryHelper.cs:13-28)
  → ``PARSER_REGISTRY``
- per-source Filter (SimpleFilter)        → planner.simple_filter
- NestBatchPusher → ES                    → index_batch delta segments
- LastOffsetPoint advance after push      → offset updated after commit
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict, dataclass, field
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: N812

from .sources.parsers import (
    parse_akamai_logs,
    parse_generic_json,
    parse_iis_logs,
    parse_insight_metrics,
    parse_sitecore_logs,
)
from .sources.planner import minute_shard_keys, shard_key_time, simple_filter
from .streaming.incremental import index_batch

# name-resolved parser registry (default IisLogParser — BlobFileActor.cs:72)
PARSER_REGISTRY = {
    "IisLogParser": parse_iis_logs,
    "AkamaiLogParser": parse_akamai_logs,
    "SitecoreLogParser": parse_sitecore_logs,
    "GenericJsonParser": parse_generic_json,
    "InsightMetricsParser": parse_insight_metrics,
}

# name-resolved ingest pipelines (the reference's server-side ES ingest
# pipeline on bulk writes — NestBatchPusher.cs:76-77 routes the batch
# through a named pipeline when EsPipelineEnabled,
# ConfigurationKeys.cs:33). Here a pipeline is any DataFrame→DataFrame
# transform applied between parse/filter and index_batch; register by name
# like parsers, or declare ES-processor JSON via build_ingest_pipeline.
PIPELINE_REGISTRY: dict = {}


def register_pipeline(name: str, fn) -> None:
    PIPELINE_REGISTRY[name] = fn


def build_ingest_pipeline(processors: list[dict]):
    """Compile an ES-ingest-pipeline processor list into a declarative
    DataFrame transform (all JVM-side column expressions — no Python row
    UDFs, so Catalyst folds the pipeline into the ingest plan). Supported
    processors (the common ES set):

      {"set":       {"field": f, "value": v}}          — constant column
      {"copy":      {"field": f, "target_field": t}}   — duplicate a column
      {"rename":    {"field": f, "target_field": t}}
      {"remove":    {"field": f}}                      — f or list of fs
      {"lowercase": {"field": f}} / {"uppercase": {"field": f}}
      {"trim":      {"field": f}}
      {"gsub":      {"field": f, "pattern": p, "replacement": r}}
      {"convert":   {"field": f, "type": "long"|"double"|"string"|...}}
    """

    def _one(df: DataFrame, kind: str, body: dict) -> DataFrame:
        f = body.get("field")
        if kind == "set":
            return df.withColumn(f, F.lit(body["value"]))
        if kind == "copy":
            return df.withColumn(body["target_field"], F.col(f))
        if kind == "rename":
            return df.withColumnRenamed(f, body["target_field"])
        if kind == "remove":
            return df.drop(*(f if isinstance(f, list) else [f]))
        if kind == "lowercase":
            return df.withColumn(f, F.lower(F.col(f)))
        if kind == "uppercase":
            return df.withColumn(f, F.upper(F.col(f)))
        if kind == "trim":
            return df.withColumn(f, F.trim(F.col(f)))
        if kind == "gsub":
            return df.withColumn(
                f, F.regexp_replace(F.col(f), body["pattern"], body["replacement"])
            )
        if kind == "convert":
            return df.withColumn(f, F.col(f).cast(body["type"]))
        raise ValueError(f"unsupported ingest processor {kind!r}")

    def apply(df: DataFrame) -> DataFrame:
        for proc in processors:
            (kind, body), = proc.items()
            df = _one(df, kind, body)
        return df

    return apply


@dataclass
class SourceSpec:
    """One registered source (the DiagnosticsSource row, Spark-shaped)."""

    partition_key: str
    row_key: str
    table_path: str  # parquet path of the raw table (lines / docs / pages)
    scheduler_type: str = "MinuteTableShardScheduler"
    parser: str | None = None  # PARSER_REGISTRY key; None = already-typed docs
    filter: str | None = None  # SimpleFilter expression ('|' = OR)
    ts_col: str = "warc_ts"
    last_offset_point: str | None = None  # ISO, seconds zero
    stop_offset_point: str | None = None
    grace_period_minutes: int = 3
    max_items_in_a_schedule_run: int = 100000
    is_active: bool = True
    # ingest pipeline between parse/filter and the index write (the ES
    # server-side pipeline the reference enables per environment,
    # NestBatchPusher.cs:76-77): a PIPELINE_REGISTRY name, or None; an
    # inline ES-processor list may live in custom["pipeline_processors"]
    pipeline: str | None = None
    # True = route each doc to a day=YYYYMMDD sub-index under index_dir —
    # the reference's per-day ES indices (IndexNamer.cs:21-41, created by
    # MasterScheduler.cs:205-239); False = one flat index
    daily_index: bool = False
    custom: dict = field(default_factory=dict)

    @property
    def key(self) -> str:
        return f"{self.partition_key}_{self.row_key}"

    @property
    def type_key(self) -> str:
        """ES type name: AlternateTypeName override, else pk_rk
        (DiagnosticsSource.cs:96-99 ToTypeKey)."""
        return self.custom.get("AlternateTypeName") or self.key

    def to_summary(self) -> "SourceSummary":
        """The wire DTO handed to actors/parsers
        (DiagnosticsSource.cs:175-193 ToSummary): identity + routing
        fields plus every config knob flattened into dynamic_properties."""
        dyn = dict(self.custom)
        for k in (
            "table_path", "scheduler_type", "parser", "ts_col",
            "grace_period_minutes", "max_items_in_a_schedule_run",
            "is_active", "daily_index", "pipeline",
        ):
            dyn.setdefault(k, getattr(self, k))
        return SourceSummary(
            partition_key=self.partition_key,
            row_key=self.row_key,
            type_name=self.type_key,
            index_name=self.custom.get("IndexName") or self.key,
            filter=self.filter,
            last_time_offset=self.last_offset_point,
            dynamic_properties=dyn,
        )


@dataclass
class SourceSummary:
    """Wire-DTO twin of the reference's DiagnosticsSourceSummary
    (DiagnosticsSourceSummary.cs:12-49): the flattened, serializable view
    of a source that actors receive — identity (pk/rk), ES routing
    (type_name/index_name), the SimpleFilter expression, the parsed
    last-offset time, and a dynamic property bag with typed lookup."""

    partition_key: str
    row_key: str
    type_name: str
    index_name: str
    filter: str | None = None
    last_time_offset: str | None = None
    dynamic_properties: dict = field(default_factory=dict)

    def get_dynamic_property(self, name: str, default=None):
        """DiagnosticsSourceSummary.cs:44-48 GetDynamicProperty."""
        v = self.dynamic_properties.get(name)
        return default if v is None else v

    def to_json(self) -> str:
        return json.dumps(asdict(self), default=str)

    @classmethod
    def from_json(cls, s: str) -> "SourceSummary":
        return cls(**json.loads(s))


class SourceRegistry:
    """JSON-file-backed source table (S8: TableStorageConfigurationSource)."""

    def __init__(self, path: str):
        self.path = path

    def get_sources(self) -> list[SourceSpec]:
        if not os.path.exists(self.path):
            return []
        with open(self.path) as f:
            return [SourceSpec(**row) for row in json.load(f)]

    def save(self, sources: list[SourceSpec]) -> None:
        with open(self.path, "w") as f:
            json.dump([asdict(s) for s in sources], f, indent=2, default=str)

    def update(self, spec: SourceSpec) -> None:
        sources = [s for s in self.get_sources() if s.key != spec.key]
        sources.append(spec)
        self.save(sources)


def plan_source(spec: SourceSpec, now: datetime) -> tuple[list[str], datetime | None]:
    """One scheduling pass: minute shard keys past grace, capped
    (MinuteTableShardScheduler.cs:20-46 + BaseScheduler guards)."""
    if not spec.is_active or spec.last_offset_point is None:
        return [], None
    last = datetime.fromisoformat(spec.last_offset_point)
    if spec.stop_offset_point and spec.last_offset_point >= spec.stop_offset_point:
        return [], None  # string-order stop check (BaseScheduler.cs:28)
    salted = spec.scheduler_type.startswith("Modulo10")
    keys, new_last = minute_shard_keys(
        last,
        now,
        grace_minutes=spec.grace_period_minutes,
        max_items=spec.max_items_in_a_schedule_run,
        key_style="salted" if salted else "d19",
    )
    return keys, new_last


def run_source(
    spark: SparkSession,
    spec: SourceSpec,
    index_dir: str,
    registry: SourceRegistry | None = None,
    now: datetime | None = None,
) -> int:
    """One conveyor cycle for one source: plan shards → pruned scan →
    parse → filter → index delta segment → advance offset (AFTER the
    commit — MinuteTableShardScheduler.cs:44 ordering). Returns rows
    ingested."""
    now = now or datetime.now(timezone.utc)
    keys, new_last = plan_source(spec, now)
    if not keys:
        return 0
    lo = shard_key_time(keys[0]).replace(tzinfo=None)
    hi = shard_key_time(keys[-1]).replace(tzinfo=None)

    if spec.scheduler_type == "SqlShardKeyQuery":
        # S3: predicate-partitioned JDBC scan, one pushed predicate per
        # shard key (SqlShardKeyQuery.cs:19-77; env-gated like the
        # reference's IntegrationTests — needs a reachable database)
        from .sources.jdbc import read_sql_shards

        raw = read_sql_shards(
            spark,
            spec.custom["jdbc_url"],
            spec.table_path,
            spec.custom.get("shard_field", "shard_key"),
            keys,
            **spec.custom.get("jdbc_options", {}),
        )
    else:
        raw = spark.read.parquet(spec.table_path)
        # shard keys become ONE pruned range predicate (the scheduler's N
        # point scans collapse into a partition-pruned scan — SURVEY §2.2 P1)
        raw = raw.where(
            (F.col(spec.ts_col) >= F.lit(lo))
            & (F.col(spec.ts_col) < F.lit(hi) + F.expr("INTERVAL 1 MINUTE"))
        )
    if spec.parser:
        parsed = PARSER_REGISTRY[spec.parser](raw)
    else:
        parsed = raw
    if spec.filter:
        parsed = parsed.where(simple_filter(spec.filter))
    # ingest pipeline LAST before the index write (ES applies pipelines at
    # bulk time, after the pusher has formed the batch)
    if spec.pipeline:
        parsed = PIPELINE_REGISTRY[spec.pipeline](parsed)
    elif spec.custom.get("pipeline_processors"):
        parsed = build_ingest_pipeline(spec.custom["pipeline_processors"])(parsed)

    # index the batch as a delta segment keyed by the schedule window
    run_id = f"{spec.key}_{keys[-1]}"
    if "url" not in {c.lower() for c in parsed.columns}:  # resolution is
        # case-insensitive (JDBC sources often upcase identifiers)
        parsed = parsed.withColumn("url", F.col("RowKey"))
    # W6/A3 telemetry rides ON the indexing job via observe() — zero extra
    # Spark jobs per cycle (ShardKeyActor.cs:69-101; warn ≥120 s at :76-83)
    from pyspark.sql import Observation

    tcol = spec.ts_col if spec.ts_col in parsed.columns else None
    obs = Observation(f"cb_{spec.key}")
    metrics = [F.count(F.lit(1)).alias("n")]
    if tcol:
        metrics += [F.min(tcol).alias("min_ts"), F.max(tcol).alias("max_ts")]
    parsed = parsed.observe(obs, *metrics)
    if spec.daily_index:
        # the reference's daily-index write path: each doc lands in its
        # event day's sub-index (searchable with DailySearcher time_range)
        from .index.daily import daily_index_batch

        # parsers rename the event-time column to "ts" (X7); fall back to it
        day_ts = spec.ts_col if spec.ts_col in parsed.columns else "ts"
        done_by_day = daily_index_batch(
            spark, parsed, index_dir, run_id,
            ts_col=day_ts, url_col="url",
            text_col=spec.custom.get("text_col", "text"),
        )
        did_work = any(done_by_day.values())
    else:
        did_work = index_batch(spark, parsed, index_dir, run_id, url_col="url",
                               text_col=spec.custom.get("text_col", "text"))
    if not did_work:
        # replayed epoch (crash after manifest commit, before the registry
        # update): index_batch never touched `parsed`, so obs.get would
        # block forever — just advance the offset past the committed run
        spec.last_offset_point = new_last.isoformat()
        if registry is not None:
            registry.update(spec)
        return 0
    m = obs.get  # available after index_batch's first action
    n = int(m["n"])
    # delay telemetry only applies to timestamp-typed ts cols (a SQL shard
    # source's ts_col is a tick STRING — the key itself, not an event time)
    if tcol and n and isinstance(m.get("max_ts"), datetime):
        delay = (now.replace(tzinfo=None) - m["max_ts"]).total_seconds()
        if delay >= 120:
            print(f"[conveyor] WARN {spec.key}: shard delay {delay:.0f}s >= 120s", flush=True)
    # offset advances ONLY after the segment+manifest commit
    spec.last_offset_point = new_last.isoformat()
    if registry is not None:
        registry.update(spec)
    return n


def scheduling_stopped(index_dir: str) -> bool:
    """W7 kill-switch: a ``stop_scheduling`` marker file pauses the conveyor
    between cycles (MasterScheduler.cs:53-56 / WorkerRole.cs:172-187)."""
    return os.path.exists(os.path.join(index_dir, "stop_scheduling"))


def run_sources(
    spark: SparkSession,
    registry: SourceRegistry,
    index_dir: str,
    now: datetime | None = None,
) -> dict[str, int]:
    """The master loop body (MasterScheduler.ScheduleSourcesAsync): one pass
    over every active source. Call from a 30 s loop or a scheduler.
    Honors the ``stop_scheduling`` marker (W7)."""
    if scheduling_stopped(index_dir):
        return {}
    out = {}
    for spec in registry.get_sources():
        out[spec.key] = run_source(spark, spec, index_dir, registry, now)
    return out
