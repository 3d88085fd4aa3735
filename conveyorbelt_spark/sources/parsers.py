"""Parsers — the reference's UDTF surface re-expressed as Arrow-batched
Spark operators (SURVEY.md §2.3).

Reference contract: ``IParser.Parse(stream) -> rows``
(src/ConveyorBelt.Tooling/Parsing/IParser.cs:7-10). Here each parser is a
DataFrame→DataFrame function over a raw-line/raw-doc table; per-file logic
runs in ``applyInPandas`` groups (a file is the reference's work unit), all
hot loops vectorized in pandas.

Semantics parity (cited per function):
- IIS W3C header-driven parse       IisLogParser.cs
- Akamai tab-split variant          AkamaiLogParser.cs:9-15
- Sitecore multiline stitch         SitecoreLogParser.cs, SitecoreLogLineParser.cs
- Generic JSON + ts heuristic       GenericJsonParser.cs:13-93
- Insight metrics                   InsightMetricsParser.cs:14-60
- EAV→doc projection                TableEntityExtensions.cs:51-88
- event-time coalesce               TableEntityExtensions.cs:12-49
"""

from __future__ import annotations

import json
import re
from datetime import datetime

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: N812
from pyspark.sql import types as T  # noqa: N812

# --------------------------------------------------------------------------
# X1/X2 — IIS W3C log parser (IisLogParser.cs) + Akamai variant
# --------------------------------------------------------------------------

# canonical typed field set DERIVED FROM the mapping declaration
# (conveyorbelt_spark/mappings/AzureIisLog.json — the reference pushes the
# same shape of file to ES before writes, MasterScheduler.cs:205-239;
# '-' and '(' → '_', ')' dropped per IisLogParser.cs:230-234)
from .mappings import fields_of_type  # noqa: E402

IIS_LONG_FIELDS = set(fields_of_type("AzureIisLog", "long"))
IIS_STR_FIELDS = fields_of_type("AzureIisLog", "string")
IIS_ALL_FIELDS = IIS_STR_FIELDS + sorted(IIS_LONG_FIELDS)

_IIS_SCHEMA = T.StructType(
    [T.StructField("ts", T.TimestampType())]
    + [T.StructField(f, T.StringType()) for f in IIS_STR_FIELDS]
    + [T.StructField(f, T.LongType()) for f in sorted(IIS_LONG_FIELDS)]
    + [
        T.StructField("custom", T.MapType(T.StringType(), T.StringType())),
        T.StructField("extra", T.MapType(T.StringType(), T.StringType())),
        T.StructField("PartitionKey", T.StringType()),
        T.StructField("RowKey", T.StringType()),
        T.StructField("cb_type", T.StringType()),
    ]
)

TS_RE = re.compile(r"^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}$")  # IsSortableDateTime, IisLogParser.cs:131-156
CUSTOM_ATTRS_FIELD = "CustomAttributes"


def _iis_field_names(header_line: str) -> list[str]:
    """'#Fields: date time x cs(User-Agent) ...' → canonical names.

    Must start 'date time' (IisLogParser.cs:225-228 throws otherwise);
    '(' → '_', ')' dropped, then '-' → '_' (FIXTURES normalization)."""
    if not header_line.startswith("#Fields: date time "):
        raise ValueError("Does not contain date time as the first fields.")
    rest = header_line[len("#Fields: date time "):]
    rest = rest.replace(")", "").replace("(", "_")
    return [f.replace("-", "_") for f in rest.split(" ") if f]


def _make_iis_kernel(
    source_type: str,
    sep: str,
    strip_quotes: bool,
    strict: bool,
    headers_by_file: dict[str, list[tuple[int, str]]] | None = None,
):
    """``headers_by_file`` carries each file's '#Fields:' lines (offset →
    header) so a byte-range split that starts mid-file can parse under its
    governing header — the reference's ParseCursor resume contract
    (ParseCursor.cs:3-15; header re-read IisLogParser.cs:121-128)."""

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("line_no")
        fname = pdf["file"].iloc[0]
        parts = [p for p in fname.split("/") if p]
        partition_key = "_".join(parts[:-1])
        stem = parts[-1].rsplit(".", 1)[0]

        lines = pdf["line"]
        is_hdr = lines.str.startswith("#Fields: ")
        grp = is_hdr.cumsum()  # header generation id; 0 = before first in-split header
        out_frames = []
        for gid, gpdf in pdf.groupby(grp.values):
            glines = gpdf["line"]
            if gid == 0:
                # governing header = latest '#Fields:' line BEFORE this
                # split's first line; carried either by the broadcast-joined
                # per-file header array (split path — no driver state) or
                # the single-file map (cursor resume). Without one, fields
                # == null → lines dropped (IisLogParser.cs:95)
                hdr = None
                first_off = int(gpdf["byte_offset"].iloc[0])
                if headers_by_file:
                    for off, h in headers_by_file.get(fname, ()):
                        if off < first_off:
                            hdr = h
                        else:
                            break
                elif "hdrs" in gpdf.columns:
                    arr = gpdf["hdrs"].iloc[0]
                    if arr is not None:
                        for item in arr:  # sorted by h_off
                            off = int(item["h_off"])
                            if off < first_off:
                                hdr = item["h_line"]
                            else:
                                break
                if hdr is None:
                    continue
                fields = _iis_field_names(hdr)
            else:
                fields = _iis_field_names(glines.iloc[0])
            data = gpdf[
                ~glines.str.startswith("#") & (glines.str.strip() != "")
            ]
            if not len(data):
                continue
            toks = data["line"]
            if strip_quotes:
                # Akamai: values wrapped in double quotes (AkamaiLogParser.cs:13)
                split = toks.str.split(sep).map(
                    lambda xs: [x.strip('"') for x in xs if x != ""]
                )
            else:
                split = toks.str.split(sep).map(lambda xs: [x for x in xs if x != ""])
            nexp = len(fields) + 2  # date+time collapse into ts (IisLogParser.cs:102)
            ok_count = split.str.len() == nexp
            if strict and not ok_count.all():
                bad = data.loc[~ok_count, "line_no"].iloc[0]
                raise ValueError(f"fields column mismatch at {fname}:{bad}")
            data = data[ok_count]
            split = split[ok_count]
            if not len(data):
                continue

            cells = pd.DataFrame(split.tolist(), index=data.index)
            ts_str = cells[0] + "T" + cells[1]
            ok_ts = ts_str.str.match(TS_RE)  # malformed timestamp ⇒ drop row
            data, cells, ts_str = data[ok_ts], cells[ok_ts], ts_str[ok_ts]
            if not len(data):
                continue

            row = {
                "ts": pd.to_datetime(ts_str, format="%Y-%m-%dT%H:%M:%S"),
                "PartitionKey": partition_key,
                # RowKey = {fileNoExt}_{offset after line incl newline}
                # (IisLogParser.cs:86,114)
                "RowKey": stem + "_" + (
                    data["byte_offset"] + data["line"].str.len() + 1
                ).astype(str),
                "cb_type": source_type,
            }
            extra_cols: dict[str, pd.Series] = {}
            custom = pd.Series([None] * len(data), index=data.index, dtype=object)
            for i, name in enumerate(fields):
                vals = cells[i + 2].where(cells[i + 2] != "-")  # '-' = missing
                if name == CUSTOM_ATTRS_FIELD:
                    # k=v;k=v exploded (IisLogParser.cs:181-196)
                    custom = vals.map(
                        lambda v: dict(
                            p.split("=", 1) for p in v.split(";") if "=" in p
                        )
                        if isinstance(v, str) and v.strip()
                        else None
                    )
                elif name in IIS_LONG_FIELDS:
                    row[name] = pd.to_numeric(vals, errors="coerce").astype("Int64")
                elif name in set(IIS_STR_FIELDS):
                    row[name] = vals
                else:
                    extra_cols[name] = vals
            row["custom"] = custom
            if extra_cols:
                ex = pd.DataFrame(extra_cols, index=data.index)
                row["extra"] = ex.apply(
                    lambda r: {k: v for k, v in r.items() if pd.notna(v)} or None,
                    axis=1,
                )
            else:
                row["extra"] = pd.Series([None] * len(data), index=data.index, dtype=object)
            frame = pd.DataFrame(row)
            for f in IIS_ALL_FIELDS:
                if f not in frame.columns:
                    frame[f] = pd.Series(
                        [None] * len(frame), index=frame.index,
                        dtype="Int64" if f in IIS_LONG_FIELDS else object,
                    )
            out_frames.append(frame)
        if not out_frames:
            return pd.DataFrame({f.name: pd.Series(dtype=object) for f in _IIS_SCHEMA})
        return pd.concat(out_frames)[[f.name for f in _IIS_SCHEMA]]

    return kernel


DEFAULT_SPLIT_BYTES = 64 * 1024 * 1024  # one task per 64 MiB byte window


def _collect_headers(lines: DataFrame) -> dict[str, list[tuple[int, str]]]:
    """Per-file '#Fields:' lines (offset-sorted), collected on the driver —
    used ONLY for single-file cursor resume (bounded: the caller filters to
    the cursor's file first). The split path carries headers through a
    broadcast JOIN instead (``_iis_parse``), so million-file batches never
    accumulate driver state."""
    rows = (
        lines.where(F.col("line").startswith("#Fields: "))
        .select("file", "byte_offset", "line")
        .collect()
    )
    out: dict[str, list[tuple[int, str]]] = {}
    for r in rows:
        out.setdefault(r.file, []).append((int(r.byte_offset), r.line))
    for v in out.values():
        v.sort()
    return out


def _iis_parse(
    lines: DataFrame, source_type: str, sep: str, strip_quotes: bool,
    strict: bool, split_bytes: int | None, cursor=None,
) -> DataFrame:
    headers = None
    hdr_dim = None
    if split_bytes:
        # governing headers as a broadcast-joined DIMENSION, not a driver
        # dict: one filtered scan → per-file sorted (h_off, h_line) arrays
        # (O(1) headers per file) joined onto the lines by file. The
        # header map never materializes on the driver, so a batch of
        # millions of log files adds no driver memory term.
        hdr_dim = (
            lines.where(F.col("line").startswith("#Fields: "))
            .select(
                "file",
                F.struct(
                    F.col("byte_offset").alias("h_off"), F.col("line").alias("h_line")
                ).alias("h"),
            )
            .groupBy("file")
            .agg(F.sort_array(F.collect_list("h")).alias("hdrs"))
        )
    elif cursor is not None and cursor.file_name:
        # whole-file grouping + resume: only the CURSOR's file needs its
        # pre-cursor headers re-read (IisLogParser.cs:121-128) — filter
        # before collecting, so the driver holds one file's headers
        headers = _collect_headers(lines.where(F.col("file") == cursor.file_name))
    if cursor is not None and cursor.file_name:
        # resume semantics: headers are (re-)read from byte 0, DATA restarts
        # at the cursor — with ParseCursor mid-line landing
        from .filescan import apply_parse_cursor

        lines = apply_parse_cursor(lines, cursor)
    if split_bytes:
        split = (F.col("byte_offset") / F.lit(int(split_bytes))).cast("long")
        return (
            lines.withColumn("split", split)
            .join(F.broadcast(hdr_dim), "file", "left")
            .groupBy("file", "split")
            .applyInPandas(
                _make_iis_kernel(source_type, sep, strip_quotes, strict, None),
                schema=_IIS_SCHEMA,
            )
        )
    return lines.groupBy("file").applyInPandas(
        _make_iis_kernel(source_type, sep, strip_quotes, strict, headers), schema=_IIS_SCHEMA
    )


def parse_iis_logs(
    lines: DataFrame,
    source_type: str = "AzureIisLog",
    *,
    strict: bool = True,
    split_bytes: int | None = DEFAULT_SPLIT_BYTES,
    cursor=None,
) -> DataFrame:
    """W3C IIS log lines → typed rows. Input: (file, line_no, byte_offset,
    line). Header-driven schema with mid-file '#Fields:' changes honored —
    each line parses under its governing header (the net effect of
    IisLogParser.cs:86-128's re-read dance, computed in one pass).

    Parallelism is per (file, byte-window): a line belongs to the split
    containing its START byte, so a split boundary landing mid-line assigns
    the whole line to the earlier split (ParseCursor mid-line landing,
    IisLogParser.cs:74-79) and a multi-GB log no longer serializes into one
    task. ``split_bytes=None`` restores whole-file groups.

    ``cursor`` (a planner.FileOffset) resumes the cursor's file from its
    byte position: headers are re-read from byte 0, data lines before the
    cursor are skipped (X8 mid-file resume, ParseCursor.cs:3-15)."""
    return _iis_parse(lines, source_type, " ", False, strict, split_bytes, cursor)


def parse_akamai_logs(
    lines: DataFrame, source_type: str = "Akamai", *, strict: bool = True,
    split_bytes: int | None = DEFAULT_SPLIT_BYTES, cursor=None,
) -> DataFrame:
    """Akamai variant: tab-separated, values quoted (AkamaiLogParser.cs:9-15)."""
    return _iis_parse(lines, source_type, "\t", True, strict, split_bytes, cursor)


# --------------------------------------------------------------------------
# X3 — Sitecore multiline log parser (SitecoreLogParser.cs,
#      Internal/SitecoreLogLineParser.cs)
# --------------------------------------------------------------------------

_SITECORE_SCHEMA = (
    "ts timestamp, SitecoreLevel string, SitecoreProcessId string, "
    "Payload string, PartitionKey string, RowKey string, cb_type string"
)
# entry start: <source> <HH:mm:ss> <LEVEL> <message...>; the reference scans
# word-by-word for the first valid time token (SitecoreLogLineParser.cs:31-52)
_SC_LINE_RE = re.compile(r"^(?P<src>.*?)\s(?P<h>[0-2]\d):(?P<m>[0-5]\d):(?P<s>[0-5]\d)(?:\s(?P<level>\S+)(?:\s(?P<msg>.*))?)?$")
_REDACTIONS = (
    (re.compile(r"(?i)(password=)[^;]*"), r"\1**PASSWORD**REDACTED**"),
    (re.compile(r"(?i)(user id=)[^;]*"), r"\1**USER**REDACTED**"),
)


def _sitecore_file_date(fname: str) -> tuple[datetime, int]:
    """date from '<name>.log.YYYYMMDD[.hhmmss]' (SitecoreLogParser.cs:131-154);
    also returns the file's start hour when hhmmss present (rollover base)."""
    stem = fname.rsplit("/", 1)[-1]
    stem = re.sub(r"\.txt$", "", stem)
    segs = [s for s in stem.split(".") if s]
    date = None
    hour = 0
    for part in segs[-2:]:
        if date is None and re.fullmatch(r"\d{8}", part):
            try:
                date = datetime.strptime(part, "%Y%m%d")
            except ValueError:
                pass
        elif re.fullmatch(r"\d{6}", part):
            hour = int(part[:2])
    if date is None:
        raise ValueError(
            f"File ID doesn't appear to be a sitecore log file name: '{stem}'"
        )
    return date, hour


_SC_CLASSIFY_SCHEMA = (
    "file string, split long, line_no long, kind int, local_idx long, "
    "piece string, src string, level string, h int, mi int, sec int"
)
_KIND_SKIP, _KIND_START, _KIND_CONT = 0, 1, 2


def _sc_classify(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-(file, split) vectorized line classifier: redact secrets, detect
    entry-start lines, extract (src, time, level, msg), and number entry
    starts within the split. No per-line Python loop — pandas str ops only."""
    pdf = pdf.sort_values("line_no")
    s = pdf["line"].fillna("")
    # first-occurrence redaction per secret kind (SitecoreLogParser.cs:101-116)
    red = s.str.replace(_REDACTIONS[0][0], _REDACTIONS[0][1], n=1, regex=True).str.replace(
        _REDACTIONS[1][0], _REDACTIONS[1][1], n=1, regex=True
    )
    stripped = red.str.strip()
    ext = stripped.str.extract(_SC_LINE_RE)
    hh = pd.to_numeric(ext["h"], errors="coerce")
    matched = hh.notna() & (hh < 24)
    msg = ext["msg"].fillna("")
    msg_ok = msg.str.strip().ne("") & ~msg.str.startswith("*****")
    is_start = matched & msg_ok
    # valid entry shape but blank/banner message → swallowed entirely
    # (SitecoreLogParser.cs:64-66); blank lines likewise
    swallowed = (matched & ~msg_ok & ext["level"].notna()) | (stripped == "")
    kind = pd.Series(_KIND_CONT, index=pdf.index)
    kind[is_start] = _KIND_START
    kind[swallowed & ~is_start] = _KIND_SKIP
    return pd.DataFrame(
        {
            "file": pdf["file"],
            "split": pdf["split"],
            "line_no": pdf["line_no"].astype("int64"),
            "kind": kind.astype("int32"),
            "local_idx": is_start.cumsum().astype("int64"),
            "piece": msg.where(is_start, red),  # start→msg, cont→raw redacted
            "src": ext["src"],
            "level": ext["level"],
            "h": hh.astype("Int64"),
            "mi": pd.to_numeric(ext["m"], errors="coerce").astype("Int64"),
            "sec": pd.to_numeric(ext["s"], errors="coerce").astype("Int64"),
        }
    )


def parse_sitecore_logs(
    lines: DataFrame,
    source_type: str = "Sitecore",
    *,
    split_lines: int = 100_000,
) -> DataFrame:
    """Sitecore logs: multiline stitch + secret redaction. Input:
    (file, line_no, line).

    Distributed stitch (no per-file serial task): lines are classified per
    (file, line-window) split by a vectorized kernel; a global entry id per
    file = (Σ entry starts in prior splits, a tiny windowed prefix sum) +
    the within-split running count — so an entry whose stack trace crosses
    a split boundary is stitched back together by the groupBy(entry_id)
    aggregation, exactly like the reference's sequential state machine
    (SitecoreLogParser.cs:44-91) but shuffle-parallel."""
    from pyspark.sql import Window as W  # noqa: N817

    spark = lines.sparkSession
    # per-file date + start hour from the filename (driver-side: #files is
    # planner-scale metadata) → broadcast dim
    files = [r.file for r in lines.select("file").distinct().collect()]
    fmeta = spark.createDataFrame(
        [(f, _sitecore_file_date(f)[0].date(), _sitecore_file_date(f)[1]) for f in files],
        "file string, fdate date, fhour int",
    )

    classified = (
        lines.withColumn("split", (F.col("line_no") / F.lit(int(split_lines))).cast("long"))
        .groupBy("file", "split")
        .applyInPandas(_sc_classify, schema=_SC_CLASSIFY_SCHEMA)
        # feeds two branches (counts + numbered); localCheckpoint, not
        # persist — the returned frame outlives this call, and persist()
        # would pin CacheManager entries for the session (the r2 lesson);
        # checkpoint blocks are GC-released with the plan
        .localCheckpoint(eager=True)
    )
    counts = classified.groupBy("file", "split").agg(
        F.sum(F.when(F.col("kind") == _KIND_START, 1).otherwise(0)).alias("n_starts")
    )
    w = W.partitionBy("file").orderBy("split").rowsBetween(W.unboundedPreceding, -1)
    offsets = counts.withColumn("prior", F.coalesce(F.sum("n_starts").over(w), F.lit(0))).select(
        "file", "split", "prior"
    )
    numbered = (
        classified.join(F.broadcast(offsets), ["file", "split"])
        .withColumn("entry_id", F.col("prior") + F.col("local_idx"))
        .where((F.col("entry_id") > 0) & (F.col("kind") != _KIND_SKIP))
    )
    agg = numbered.groupBy("file", "entry_id").agg(
        F.max(
            F.when(
                F.col("kind") == _KIND_START,
                F.struct("line_no", "src", "level", "h", "mi", "sec"),
            )
        ).alias("start"),
        F.array_sort(F.collect_list(F.struct("line_no", "piece"))).alias("pieces"),
    ).where(F.col("start").isNotNull())

    path_parts = F.filter(F.split("file", "/"), lambda p: p != "")
    partition_key = F.array_join(F.slice(path_parts, 1, F.size(path_parts) - 1), "_")
    stem = F.regexp_replace(F.element_at(path_parts, -1), "\\.[^.]*$", "")
    day = F.date_add(
        F.col("fdate"), F.when(F.col("start.h") < F.col("fhour"), 1).otherwise(0)
    )
    ts = F.make_timestamp(
        F.year(day), F.month(day), F.dayofmonth(day),
        F.col("start.h"), F.col("start.mi"), F.col("start.sec"),
    )
    return (
        agg.join(F.broadcast(fmeta), "file")
        .select(
            ts.alias("ts"),
            F.col("start.level").alias("SitecoreLevel"),
            F.col("start.src").alias("SitecoreProcessId"),
            F.array_join(F.transform("pieces", lambda p: p["piece"]), "\n").alias("Payload"),
            partition_key.alias("PartitionKey"),
            F.concat(stem, F.lit("_"), F.col("start.line_no").cast("string")).alias("RowKey"),
            F.lit(source_type).alias("cb_type"),
        )
    )


# --------------------------------------------------------------------------
# X4 — Generic JSON parser (GenericJsonParser.cs:13-93)
# --------------------------------------------------------------------------

_JSON_SCHEMA = (
    "ts string, PartitionKey string, RowKey string, cb_type string, "
    "doc map<string,string>"
)
_ISO_DT_RE = re.compile(
    r"^\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}:\d{2}(\.\d+)?(Z|[+-]\d{2}:?\d{2})?$"
)


def _render_o(dt: datetime) -> str:
    """.NET 'O' round-trip format: 7 fractional digits."""
    frac = f"{dt.microsecond * 10:07d}"
    base = dt.strftime(f"%Y-%m-%dT%H:%M:%S.{frac}")
    if dt.tzinfo is not None:
        off = dt.strftime("%z")
        base += "Z" if off in ("+0000", "") else f"{off[:3]}:{off[3:]}"
    return base


def _json_doc_to_row(doc: str, source_type: str, deterministic_ids: bool):
    parsed = json.loads(doc)
    objs = parsed if isinstance(parsed, list) else [parsed]
    out = []
    for idx, obj in enumerate(objs):
        if not isinstance(obj, dict):
            continue
        d: dict[str, str] = {}
        good = ok = anyd = None
        for k, v in obj.items():
            if v is None or isinstance(v, (dict, list)):
                continue
            date_value = None
            if isinstance(v, str) and _ISO_DT_RE.match(v):
                # Newtonsoft auto-parses ISO strings to DateTime and the
                # parser re-renders with 'O' (GenericJsonParser.cs:55-66)
                dt = datetime.fromisoformat(v.replace("Z", "+00:00"))
                d[k] = date_value = _render_o(dt)
            elif isinstance(v, bool):
                d[k] = "True" if v else "False"  # C# bool.ToString()
            else:
                d[k] = str(v)
            if date_value:
                kl = k.lower()
                if kl in ("timestamp", "eventdate"):
                    good = good or date_value
                if "date" in kl or "time" in kl:
                    ok = ok or date_value
                anyd = anyd or date_value
        # heuristic ladder (GenericJsonParser.cs:69-81); 'now' fallback is
        # made deterministic here (epoch marker) for testability
        ts = good or ok or anyd or "1970-01-01T00:00:00.0000000Z"
        if "PartitionKey" in d and "RowKey" in d:
            pk, rk = d["PartitionKey"], d["RowKey"]
        else:
            import hashlib
            import uuid

            pk = "nopart_"
            rk = (
                hashlib.md5(f"{doc}#{idx}".encode()).hexdigest()
                if deterministic_ids
                else uuid.uuid4().hex
            )
        out.append((ts, pk, rk, source_type, d))
    return out


def parse_generic_json(
    docs: DataFrame,
    source_type: str = "GenericJson",
    doc_col: str = "doc",
    deterministic_ids: bool = True,
) -> DataFrame:
    """JSON object/array docs → rows with @timestamp heuristic. The one
    non-deterministic id in the reference (Guid.NewGuid,
    GenericJsonParser.cs:84-88) is replaced by md5(doc,idx) unless
    ``deterministic_ids=False``."""

    def run(batches):
        for pdf in batches:
            rows = []
            for doc in pdf[doc_col]:
                rows.extend(_json_doc_to_row(doc, source_type, deterministic_ids))
            yield pd.DataFrame(
                rows, columns=["ts", "PartitionKey", "RowKey", "cb_type", "doc"]
            )

    return docs.mapInPandas(run, schema=_JSON_SCHEMA)


# --------------------------------------------------------------------------
# X5 — Insight metrics parser (InsightMetricsParser.cs:14-60) — pure
#      DataFrame ops: from_json + explode + key synthesis
# --------------------------------------------------------------------------

INSIGHT_RECORD_SCHEMA = T.StructType(
    [
        T.StructField("count", T.LongType()),
        T.StructField("total", T.DoubleType()),
        T.StructField("minimum", T.DoubleType()),
        T.StructField("maximum", T.DoubleType()),
        T.StructField("average", T.DoubleType()),
        T.StructField("resourceId", T.StringType()),
        T.StructField("time", T.TimestampType()),
        T.StructField("metricName", T.StringType()),
        T.StructField("timeGrain", T.StringType()),
    ]
)
_INSIGHT_SCHEMA = T.StructType([T.StructField("records", T.ArrayType(INSIGHT_RECORD_SCHEMA))])


def parse_insight_metrics(blobs: DataFrame, records_col: str = "records") -> DataFrame:
    """'{"records":[...]}' blobs → one row per metric record with the
    reference's PK/RK recipe: PK = {subGuidHead}_{resourceTail3Reversed}_
    {metric}, RK = yyyyMMddHHmmss (InsightMetricsParser.cs:41-43)."""
    r = blobs.select(
        F.explode(F.from_json(F.col(records_col), _INSIGHT_SCHEMA)["records"]).alias("r")
    ).select("r.*")
    segs = F.split(F.col("resourceId"), "/")
    sub_head = F.split(F.element_at(segs, 3), "-")[0]
    tail3 = F.concat_ws(
        "_", F.element_at(segs, -1), F.element_at(segs, -2), F.element_at(segs, -3)
    )
    return r.select(
        F.col("time").alias("ts"),
        F.concat_ws("_", sub_head, tail3, F.col("metricName")).alias("PartitionKey"),
        F.date_format("time", "yyyyMMddHHmmss").alias("RowKey"),
        "metricName", "resourceId", "timeGrain",
        "count", "total", "minimum", "maximum", "average",
    )


# --------------------------------------------------------------------------
# X6/X7 — EAV→doc projection + event-time extraction
#         (TableEntityExtensions.cs:12-88)
# --------------------------------------------------------------------------

DOTNET_EPOCH_TICKS = 621355968000000000  # ticks at 1970-01-01


def ticks_to_timestamp(ticks_col):
    """.NET ticks (100ns since 0001-01-01) → timestamp."""
    micros = ((F.col(ticks_col) if isinstance(ticks_col, str) else ticks_col) - F.lit(
        DOTNET_EPOCH_TICKS
    )) / F.lit(10)
    return F.timestamp_micros(micros.cast("long"))


def timestamp_to_ticks(ts_col):
    c = F.col(ts_col) if isinstance(ts_col, str) else ts_col
    return (F.unix_micros(c) * F.lit(10) + F.lit(DOTNET_EPOCH_TICKS)).cast("long")


def event_time(df: DataFrame, timestamp_field: str | None = None):
    """Column: EventDate ≻ EventTickCount (ticks) ≻ storage Timestamp
    (TableEntityExtensions.cs:12-31); ``timestamp_field`` override mirrors
    the per-source TimestampFieldName knob (:33-49)."""
    cands = []
    if timestamp_field and timestamp_field in df.columns:
        cands.append(F.col(timestamp_field).cast("timestamp"))
    if "EventDate" in df.columns:
        cands.append(F.col("EventDate").cast("timestamp"))
    if "EventTickCount" in df.columns:
        cands.append(ticks_to_timestamp("EventTickCount"))
    cands.append(F.col("Timestamp").cast("timestamp"))
    return F.coalesce(*cands)


def eav_to_doc(df: DataFrame, source_type: str, timestamp_field: str | None = None) -> DataFrame:
    """Typed entity rows → stringly doc rows with the canonical quadruple
    injected (TableEntityExtensions.cs:51-88): dates ISO 's', bools
    lowercase, empty/',' values dropped (rendered as null)."""
    keep = [c for c in df.columns if c not in ("PartitionKey", "RowKey", "Timestamp")]
    cols = [
        F.col("PartitionKey"),
        F.col("RowKey"),
        F.lit(source_type).alias("cb_type"),
        F.date_format(event_time(df, timestamp_field), "yyyy-MM-dd'T'HH:mm:ss").alias("ts"),
    ]
    for c in keep:
        dt = dict(df.dtypes)[c]
        if dt.startswith("timestamp"):
            v = F.date_format(F.col(c), "yyyy-MM-dd'T'HH:mm:ss")
        elif dt == "boolean":
            v = F.lower(F.col(c).cast("string"))
        else:
            v = F.col(c).cast("string")
        # empty or bare ',' values are dropped (TableEntityExtensions.cs:81-82)
        cols.append(F.when(F.trim(v).isin("", ","), None).otherwise(v).alias(c))
    return df.select(*cols)
