"""Partition planning, shard keys, filters, index naming, offsets —
the reference's scheduling layer re-expressed (SURVEY.md §2.2, §2.4).

In Spark the scheduler becomes partition planning: shard keys become
partition predicates, the master loop becomes the driver, leases/queues
disappear (driver is the sole planner)."""

from __future__ import annotations

import re
from dataclasses import dataclass
from datetime import datetime, timedelta, timezone

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F  # noqa: N812

# --------------------------------------------------------------------------
# .NET tick helpers (100ns units since 0001-01-01; DateTimeOffset.Ticks)
# --------------------------------------------------------------------------
DOTNET_EPOCH_TICKS = 621355968000000000
MAX_TICKS = 3155378975999999999  # DateTimeOffset.MaxValue.Ticks


def to_ticks(dt: datetime) -> int:
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    return DOTNET_EPOCH_TICKS + int(dt.timestamp() * 10**7)


def from_ticks(ticks: int) -> datetime:
    return datetime.fromtimestamp((ticks - DOTNET_EPOCH_TICKS) / 10**7, tz=timezone.utc)


def drop_seconds(dt: datetime) -> datetime:
    """DropSecondAndMilliseconds (DateTimeOffsetExtensions.cs:21-31)."""
    return dt.replace(second=0, microsecond=0)


# --------------------------------------------------------------------------
# P1-P3 — minute shard schedulers (MinuteTableShardScheduler.cs:20-51,
#         Modulo10MinuteTableShardScheduler.cs:13-28,
#         D18/ReverseTimestamp variants)
# --------------------------------------------------------------------------

def minute_shard_keys(
    last_offset: datetime,
    now: datetime,
    grace_minutes: int = 3,
    max_items: int | None = None,
    *,
    key_style: str = "d19",
    n_salt: int = 10,
) -> tuple[list[str], datetime]:
    """Enumerate shard keys for elapsed minutes past the grace window.

    Returns (keys, new_last_offset). Planner math parity: 1h backlog with
    grace 3 ⇒ 57 shards (MinuteTableShardSchedulerTests.cs:22-39).
    key_style ∈ {'d19', 'd18', 'reverse', 'salted'}."""
    now = drop_seconds(now)
    keys: list[str] = []
    new_last = last_offset
    n = 1  # start from a minute after (MinuteTableShardScheduler.cs:33)
    while now >= last_offset + timedelta(minutes=grace_minutes + n):
        new_last = drop_seconds(last_offset + timedelta(minutes=n))
        ticks = to_ticks(new_last)
        if key_style == "d19":
            keys.append(f"{ticks:019d}")
        elif key_style == "d18":
            keys.append(f"{ticks:018d}")  # D18MinuteTableShardScheduler.cs:14-17
        elif key_style == "reverse":
            keys.append(f"{MAX_TICKS - ticks:019d}")  # ReverseTimestamp...cs:14-17
        elif key_style == "salted":
            # 10-way pre-salted hot partitions (Modulo10...cs:13-28)
            keys.extend(f"{i:019d}___{ticks:019d}" for i in range(n_salt))
        else:
            raise ValueError(key_style)
        if max_items is not None and n >= max_items:
            break
        n += 1
    return keys, new_last


def shard_key_time(shard_key: str) -> datetime:
    """Inverse: shard key → minute (DateTimeOffsetExtensions.cs:33-47:
    4-segment salted keys use the 4th segment)."""
    parts = shard_key.split("_")
    ticks = int(parts[3]) if len(parts) == 4 and parts[3] else int(shard_key)
    return from_ticks(ticks)


def minute_shards_df(df: DataFrame, ts_col: str, grace_minutes: int = 3) -> DataFrame:
    """DataFrame variant: one row per scheduled minute between min(ts) and
    max(ts) - grace — the planner as a Spark op (used by q07)."""
    bounds = df.agg(
        F.date_trunc("minute", F.min(ts_col)).alias("lo"),
        F.date_trunc("minute", F.max(ts_col)).alias("hi"),
    )
    return bounds.select(
        F.explode(
            F.sequence(
                F.col("lo"),
                F.col("hi") - F.expr(f"INTERVAL {grace_minutes} MINUTES"),
                F.expr("INTERVAL 1 MINUTE"),
            )
        ).alias("shard_minute")
    )


# --------------------------------------------------------------------------
# F1 — SimpleFilter (Internal/SimpleFilter.cs) → Catalyst Column
# --------------------------------------------------------------------------

_OPS = [" > ", " < ", " >= ", " <= ", " != ", " == "]  # spaces mandatory
_GUID_RE = re.compile(
    r"^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$"
)


def _literal_and_type(right: str):
    """RHS type-inference ladder: int → float → DateTime → Guid → bool →
    string (SimpleFilter.cs:109-157)."""
    try:
        return int(right), "int"
    except ValueError:
        pass
    try:
        return float(right), "float"
    except ValueError:
        pass
    try:
        return datetime.fromisoformat(right), "datetime"
    except ValueError:
        pass
    if _GUID_RE.match(right):
        return right.lower(), "guid"
    if right.lower() in ("true", "false"):
        return right.lower() == "true", "bool"
    return right, "string"


def simple_filter(expression: str | None) -> Column:
    """Parse 'Field <op> literal' to a Column predicate. Invalid / multi-op /
    empty expressions accept everything; a missing (null) property PASSES
    (SimpleFilter.cs:54-55 — filters only constrain rows that carry the
    property). Pipe ('|') joins multiple expressions with OR."""
    if expression is None or not expression.strip():
        return F.lit(True)
    parts = [p for p in expression.split("|") if p.strip()]
    if len(parts) > 1:
        out = F.lit(False)
        for p in parts:
            out = out | simple_filter(p)
        return out
    expr = parts[0]
    syms = [s for s in _OPS if s in expr]
    if len(syms) != 1:
        return F.lit(True)
    sym = syms[0]
    left, _, right = expr.partition(sym)
    left, right = left.strip(), right.strip()
    if not left or not right:
        return F.lit(True)
    lit, kind = _literal_and_type(right)
    col = F.col(left)
    if kind in ("int", "float"):
        col = col.cast("double")
        lit_c = F.lit(float(lit))
    elif kind == "datetime":
        col = col.cast("timestamp")
        lit_c = F.lit(lit)
    elif kind == "bool":
        col = col.cast("boolean")
        lit_c = F.lit(lit)
    elif kind == "guid":
        col = F.lower(col.cast("string"))
        lit_c = F.lit(lit)
    else:
        col = col.cast("string")
        lit_c = F.lit(lit)
    op = sym.strip()
    pred = {
        ">": col > lit_c,
        "<": col < lit_c,
        ">=": col >= lit_c,
        "<=": col <= lit_c,
        "!=": col != lit_c,
        "==": col == lit_c,
    }[op]
    return F.when(col.isNull(), F.lit(True)).otherwise(pred)


# --------------------------------------------------------------------------
# IndexNamer (IndexNamer.cs:21-41) — daily partition naming
# --------------------------------------------------------------------------

def index_name(
    time_iso: str | None, type_name: str, prefix: str = "", one_index_per_type: bool = False
) -> str:
    type_name = type_name.lower()
    if time_iso is None or len(time_iso) < 10:
        return f"{prefix}{type_name}" if one_index_per_type else prefix
    d = time_iso[0:4] + time_iso[5:7] + time_iso[8:10]
    return f"{prefix}{type_name}-{d}" if one_index_per_type else f"{prefix}{d}"


def index_name_col(
    ts_col, type_name: str, prefix: str = "", one_index_per_type: bool = False
) -> Column:
    """Column variant: partition-name per row (daily index ↔ days(ts))."""
    d = F.date_format(ts_col if not isinstance(ts_col, str) else F.col(ts_col), "yyyyMMdd")
    if one_index_per_type:
        return F.concat(F.lit(prefix), F.lit(type_name.lower()), F.lit("-"), d)
    return F.concat(F.lit(prefix), d)


# --------------------------------------------------------------------------
# FileOffset (FileOffset.cs:12-80) — '{ISO}\t{fileName}\t{position}'
# --------------------------------------------------------------------------

@dataclass
class FileOffset:
    time_offset: datetime
    file_name: str = ""
    position: int = 0

    def render(self) -> str:
        iso = self.time_offset.strftime("%Y-%m-%dT%H:%M:%S.%f0")
        tz = self.time_offset.strftime("%z")
        iso += f"{tz[:3]}:{tz[3:]}" if tz else "+00:00"
        return f"{iso}\t{self.file_name}\t{self.position}"

    @staticmethod
    def parse(offset: str | None) -> "FileOffset | None":
        if offset is None or not offset.strip():
            return None
        segments = offset.split("\t")
        if len(segments) > 3:
            return None
        try:
            t = datetime.fromisoformat(segments[0])
        except ValueError:
            return None
        fo = FileOffset(t)
        if len(segments) > 1:
            fo.file_name = segments[1]
        if len(segments) > 2:
            try:
                fo.position = int(segments[2])
            except ValueError:
                return None
        return fo
