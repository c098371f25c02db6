"""Prometheus text exposition format ("scrape text") — distributed parse.

The format is public (prometheus docs, exposition_formats.md): one
sample per line, ``metric{name="value",...} value [timestamp_ms]``,
``#``-comment lines with structured ``# HELP`` / ``# TYPE`` metadata,
label values escaping ``\\\\``, ``\\"`` and ``\\n``, Go-style float
values (``+Inf``/``-Inf``/``NaN``, scientific notation), optional
int64-millisecond timestamps.

Relation to the reference: fpetkovski/tsdb-parquet ingests finished
TSDB blocks only; scrape text is what every exporter and Pushgateway
actually serves.  Parsing it here means raw scrape captures (fleets of
``GET /metrics`` bodies) can be loaded into a store with no Prometheus
server in between — completing the ingest triangle (blocks: `tsdb_block`,
WAL: `tsdb_wal`, remote-write: `remote_write`, scrape text: here).

Scale shape — the parse is ENTIRELY JVM-side (split / regexp /
``from_json``; no Python UDF anywhere), so it runs inside whole-stage
codegen and scales like any other columnar expression:

* a body splits into lines with ``split``/``explode``;
* the label block is the greedy ``\\{(.*)\\}`` span — label VALUES may
  contain ``{``/``}``/spaces/commas, but everything after the closing
  brace (value + optional timestamp) never contains ``}``, so the
  greedy match is exact, and individual pairs are lifted with
  ``regexp_extract_all`` over a quote-aware pattern
  (``(?:[^"\\\\]|\\\\.)*`` never crosses an unescaped quote);
* unescaping uses ``from_json('"' || raw || '"')`` — the format's
  escape set (``\\\\  \\"  \\n``) is a subset of JSON's, so the JVM's
  JSON string decoder is a correct, codegen-friendly unescaper;
* ``+Inf``/``-Inf``/``NaN`` map through a CASE to the double casts.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "escape_label_value",
    "format_exposition",
    "parse_exposition",
    "parse_exemplars",
    "exposition_samples",
    "exposition_exemplars",
    "scrape_samples",
    "scrape_metadata",
    "scrape_targets_once",
]

_METRIC_RE = r"^([a-zA-Z_:][a-zA-Z0-9_:]*)"
#: Prometheus 3.x UTF-8 syntax: a `{`-led line carries the metric name
#: as the FIRST brace element, a bare quoted string.  BOUND (documented,
#: shared by the reference and distributed parsers): quoted label/metric
#: NAMES contain no raw `"` or `\` — escapes stay legal in VALUES,
#: where they actually occur; a name needing escapes is vanishingly
#: rare and fails loudly, never silently misparses.
_METRIC_UTF8_RE = r'^\{"([^"\\]*)"[ \t]*[,}]'
#: one 'name="value"' pair — the name either classic or quoted UTF-8;
#: the value part never crosses an unescaped quote
_PAIR_RE = r'(?:[a-zA-Z_][a-zA-Z0-9_]*|"[^"\\]*")="(?:[^"\\]|\\.)*"'
#: an OpenMetrics exemplar suffix, ANCHORED at end of line:
#: ' # {pairs} value [ts]'.  The anchor + quote-aware pairs make this
#: unspoofable by label values: a value containing ' # {...}' sits
#: inside the sample's label block, where its quotes arrive ESCAPED
#: (\\") and therefore cannot satisfy the pair pattern's raw '="'.
_EXEMPLAR_RE = (
    r" # \{((?:" + _PAIR_RE + r"(?:," + _PAIR_RE + r")*)?)\}"
    r" ([^ \t]+)(?:[ \t]+([^ \t]+))?$"
)


# ---------------------------------------------------------------------------
# writer + reference parser (pure python: fixtures, tests, small payloads)
# ---------------------------------------------------------------------------


def escape_label_value(value: str) -> str:
    """The format's label-value escaping: backslash, double-quote, LF."""
    return (
        value.replace("\\", "\\\\").replace('"', '\\"').replace("\n", "\\n")
    )


def _format_value(value: float) -> str:
    if value != value:  # NaN
        return "NaN"
    if value == float("inf"):
        return "+Inf"
    if value == float("-inf"):
        return "-Inf"
    return repr(float(value))


def format_exposition(
    samples: Sequence[tuple],
    metadata: Sequence[tuple] = (),
) -> str:
    """Render ``[(labels-with-__name__, value, ts_ms|None), ...]`` (and
    optional ``[(metric, type, help[, unit]), ...]``) as exposition
    text.  A sample tuple may carry a FOURTH element — an OpenMetrics
    exemplar ``(labels, value, ts_s|None)`` or None — rendered as the
    ``# {...} value [ts]`` suffix.  A metadata unit emits the
    OpenMetrics ``# UNIT`` line; non-legacy metric names are quoted in
    metadata lines exactly as in sample lines (Prometheus 3.x)."""
    from tsdb_parquet_spark.names import is_legacy_name

    lines = []
    for entry in metadata:
        metric, mtype, mhelp = entry[0], entry[1], entry[2]
        unit = entry[3] if len(entry) > 3 else ""
        mname = (
            metric
            if is_legacy_name(metric)
            else f'"{escape_label_value(metric)}"'
        )
        if mhelp:
            esc = mhelp.replace("\\", "\\\\").replace("\n", "\\n")
            lines.append(f"# HELP {mname} {esc}")
        lines.append(f"# TYPE {mname} {mtype}")
        if unit:
            lines.append(f"# UNIT {mname} {unit}")

    def _pair(k: str, v: str) -> str:
        # Prometheus 3.x text syntax: non-legacy label NAMES are quoted
        key = k if is_legacy_name(k) else f'"{escape_label_value(k)}"'
        return f'{key}="{escape_label_value(v)}"'

    for entry in samples:
        labels, value, ts_ms = entry[0], entry[1], entry[2]
        exemplar = entry[3] if len(entry) > 3 else None
        metric = labels["__name__"]
        rest = {k: v for k, v in labels.items() if k != "__name__"}
        if not is_legacy_name(metric):
            # UTF-8 metric name rides inside the braces as a bare
            # quoted string (Prometheus 3.x exposition syntax)
            parts = [f'"{escape_label_value(metric)}"'] + [
                _pair(k, rest[k]) for k in sorted(rest)
            ]
            head = "{" + ",".join(parts) + "}"
        elif rest:
            body = ",".join(_pair(k, rest[k]) for k in sorted(rest))
            head = f"{metric}{{{body}}}"
        else:
            head = metric
        line = f"{head} {_format_value(value)}"
        if ts_ms is not None:
            line += f" {ts_ms}"
        if exemplar is not None:
            ex_labels, ex_value, ex_ts = exemplar
            body = ",".join(
                f'{k}="{escape_label_value(ex_labels[k])}"'
                for k in sorted(ex_labels)
            )
            line += f" # {{{body}}} {_format_value(ex_value)}"
            if ex_ts is not None:
                line += f" {ex_ts!r}"
        lines.append(line)
    return "\n".join(lines) + "\n"


def _unescape(raw: str) -> str:
    out = []
    i = 0
    while i < len(raw):
        c = raw[i]
        if c == "\\" and i + 1 < len(raw):
            nxt = raw[i + 1]
            out.append({"\\": "\\", '"': '"', "n": "\n"}.get(nxt, "\\" + nxt))
            i += 2
        else:
            out.append(c)
            i += 1
    return "".join(out)


def _split_label_block(body: str) -> list[str]:
    """Split a brace body on commas OUTSIDE quoted strings
    (escape-aware) — shared by the classic and UTF-8 label grammars."""
    items: list[str] = []
    cur: list[str] = []
    in_q = esc = False
    for ch in body:
        if esc:
            cur.append(ch)
            esc = False
            continue
        if ch == "\\" and in_q:
            cur.append(ch)
            esc = True
            continue
        if ch == '"':
            in_q = not in_q
            cur.append(ch)
            continue
        if ch == "," and not in_q:
            items.append("".join(cur).strip())
            cur = []
            continue
        cur.append(ch)
    tail = "".join(cur).strip()
    if tail:
        items.append(tail)
    return [i for i in items if i]


def _parse_label_element(el: str) -> tuple[str | None, str]:
    """One brace element -> ``(name, value)``; ``(None, metric)`` for a
    bare quoted string (the Prometheus 3.x UTF-8 metric name)."""
    if el.startswith('"'):
        i = 1
        while i < len(el) and el[i] != '"':
            i += 2 if el[i] == "\\" else 1
        if i >= len(el):
            raise ValueError(f"unterminated quoted name: {el!r}")
        name = _unescape(el[1:i])
        rest = el[i + 1 :].strip()
        if not rest:
            return None, name  # bare quoted metric name
        v = rest[1:].strip()
        if not (
            rest.startswith("=")
            and len(v) >= 2
            and v[0] == '"'
            and v[-1] == '"'
        ):
            raise ValueError(f"bad quoted-name pair: {el!r}")
        return name, _unescape(v[1:-1])
    k, eq, v = el.partition("=")
    v = v.strip()
    if not eq or len(v) < 2 or v[0] != '"' or v[-1] != '"':
        raise ValueError(f"bad label pair: {el!r}")
    return k.strip(), _unescape(v[1:-1])


def parse_exposition(
    text: str,
) -> list[tuple[dict, float, int | None]]:
    """Reference single-process parser (same grammar as the distributed
    path; property tests pin the two against each other).  Understands
    the Prometheus 3.x UTF-8 name syntax: a ``{``-led line whose first
    brace element is the bare quoted metric name, and quoted label
    NAMES in any label block (see the ``_METRIC_UTF8_RE`` bound)."""
    import re

    exemplar_re = re.compile(_EXEMPLAR_RE)
    out = []
    for line in text.split("\n"):
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        # OpenMetrics tolerance: drop an exemplar suffix before the
        # value parse (parse_exemplars reads it); the ' # ' guard keeps
        # the pair-aware regex off classic lines, mirroring the
        # distributed plan's contains() gate
        if " # " in line:
            line = exemplar_re.sub("", line)
        if line.startswith("{"):
            labels = {}
            rest = line
        else:
            m = re.match(_METRIC_RE, line)
            if not m:
                raise ValueError(f"bad exposition line: {line!r}")
            labels = {"__name__": m.group(1)}
            rest = line[m.end():]
        lb, rb = rest.find("{"), rest.rfind("}")
        if lb >= 0:
            if rb < lb:
                raise ValueError(f"unclosed label block: {line!r}")
            for i, el in enumerate(
                _split_label_block(rest[lb + 1 : rb])
            ):
                k, v = _parse_label_element(el)
                if k is None:
                    if i != 0 or "__name__" in labels:
                        raise ValueError(
                            "metric name must be the first brace "
                            f"element, set once: {line!r}"
                        )
                    k = "__name__"
                labels[k] = v
            rest = rest[rb + 1 :]
        if "__name__" not in labels:
            raise ValueError(f"line has no metric name: {line!r}")
        parts = rest.split()
        if not parts or len(parts) > 2:
            raise ValueError(f"bad value/timestamp: {line!r}")
        val = {"+Inf": float("inf"), "-Inf": float("-inf"),
               "Inf": float("inf"), "NaN": float("nan")}.get(parts[0])
        value = float(parts[0]) if val is None else val
        ts_ms = int(parts[1]) if len(parts) == 2 else None
        out.append((labels, value, ts_ms))
    return out


def parse_exemplars(
    text: str,
) -> list[tuple[dict, dict, float, float | None]]:
    """OpenMetrics exemplars: ``[(sample_labels, exemplar_labels,
    value, ts_seconds|None), ...]`` for every sample line carrying the
    ``# {...} value [ts]`` suffix.  Exemplar timestamps are SECONDS
    (floats) per the OpenMetrics spec — unlike the sample line's
    Prometheus-format millisecond integers."""
    import re

    pair_re = re.compile(_PAIR_RE)
    exemplar_re = re.compile(_EXEMPLAR_RE)
    out = []
    for line in text.split("\n"):
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        m = exemplar_re.search(line)
        if not m:
            continue
        (sample_labels, _v, _t), = parse_exposition(line)
        ex_labels = {}
        for el in _split_label_block(m.group(1)):
            k, v = _parse_label_element(el)
            if k is not None:
                ex_labels[k] = v
        val = {"+Inf": float("inf"), "-Inf": float("-inf"),
               "Inf": float("inf"), "NaN": float("nan")}.get(m.group(2))
        value = float(m.group(2)) if val is None else val
        ts_s = float(m.group(3)) if m.group(3) is not None else None
        out.append((sample_labels, ex_labels, value, ts_s))
    return out


# ---------------------------------------------------------------------------
# distributed parse (JVM-side, codegen)
# ---------------------------------------------------------------------------


def _json_unescape(raw: Column) -> Column:
    # the exposition escape set is a subset of JSON's, so the JVM JSON
    # string decoder IS the unescaper (and stays JVM-side).  from_json
    # needs a container schema, hence the one-element array wrapper;
    # allowUnquotedControlChars admits raw tabs (legal in label values —
    # only \\ " and LF are escaped by the format)
    return F.from_json(
        F.concat(F.lit('["'), raw, F.lit('"]')),
        "array<string>",
        {"allowUnquotedControlChars": "true"},
    ).getItem(0)


def exposition_samples(
    payloads: DataFrame, body_col: str = "body", openmetrics: bool = False
) -> DataFrame:
    """Explode scrape bodies into one row per sample:
    ``(__name__ string, labels map<string,string>, value double,
    ts long)`` — ``ts`` null where the line has no timestamp, ``labels``
    excluding ``__name__``.  All other input columns pass through (tag
    payloads with target/scrape-time columns and they stay attached).
    Entirely built-in expressions — no Python in the plan.

    ``openmetrics=True`` reads timestamps as the OpenMetrics unit
    (SECONDS, possibly fractional -> ms); the default is the Prometheus
    text format's integer milliseconds.  Exemplar suffixes are dropped
    either way (``exposition_exemplars`` reads them); ``# EOF`` is a
    comment like any other."""
    passthrough = [c for c in payloads.columns if c != body_col]
    line = (
        payloads.select(
            *passthrough,
            F.explode(F.split(F.col(body_col), "\n")).alias("__line"),
        )
        .select(*passthrough, F.trim("__line").alias("__line"))
        .where((F.col("__line") != "") & ~F.col("__line").startswith("#"))
        # OpenMetrics tolerance: an exemplar suffix would otherwise sit
        # in the value/timestamp tail (exposition_exemplars reads it).
        # The suffix always starts with ' # ' — gate the expensive
        # pair-aware regex behind that contains() so the classic fast
        # path (the 99% case) never evaluates it
        .select(
            *passthrough,
            F.when(
                F.col("__line").contains(" # "),
                F.regexp_replace("__line", _EXEMPLAR_RE, ""),
            )
            .otherwise(F.col("__line"))
            .alias("__line"),
        )
    )
    labelstr = F.regexp_extract("__line", r"\{(.*)\}", 1)
    tail = F.trim(
        F.when(
            F.col("__line").contains("{"),
            F.regexp_extract("__line", r"\}([^}]*)$", 1),
        ).otherwise(F.regexp_replace("__line", _METRIC_RE, ""))
    )
    parts = F.split(tail, r"[ \t]+")
    rawval = parts.getItem(0)
    value = _parse_value(rawval)
    rawts = F.when(F.size(parts) > 1, parts.getItem(1))
    if openmetrics:
        # OpenMetrics timestamps are SECONDS (possibly fractional)
        ts = (rawts.cast("double") * 1000).cast("long")
    else:
        ts = rawts.cast("long")
    labels = _labels_map(F.col("__labelstr"))
    # Prometheus 3.x UTF-8 syntax: a `{`-led line names the metric as
    # the first brace element (bare quoted string, no escapes per the
    # _METRIC_UTF8_RE bound); classic lines keep the ident prefix
    name = F.when(
        F.col("__line").startswith("{"),
        F.regexp_extract("__line", _METRIC_UTF8_RE, 1),
    ).otherwise(F.regexp_extract("__line", _METRIC_RE, 1))
    return (
        line.withColumn("__labelstr", labelstr)
        .select(
            *passthrough,
            name.alias("__name__"),
            labels.alias("labels"),
            value.alias("value"),
            ts.alias("ts"),
        )
    )


def _parse_value(rawval: Column) -> Column:
    return (
        F.when(rawval == "+Inf", F.lit(float("inf")))
        .when(rawval == "Inf", F.lit(float("inf")))
        .when(rawval == "-Inf", F.lit(float("-inf")))
        .when(rawval == "NaN", F.lit(float("nan")))
        .otherwise(rawval.cast("double"))
    )


def _labels_map(labelstr: Column) -> Column:
    """'k1="v1",k2="v2"' -> map<string,string>, escape-aware."""
    # Column-typed pattern: no SQL string-literal escaping layer to get
    # the backslashes wrong in
    pairs = F.regexp_extract_all(labelstr, F.lit(_PAIR_RE), F.lit(0))

    def entry(p: Column) -> Column:
        # p is 'key="raw"' — key either classic ([A-Za-z0-9_], so the
        # value span is pure offset arithmetic) or a quoted UTF-8 name
        # (no raw quotes/escapes inside per the _PAIR_RE bound, so the
        # first quoted span IS the key); no second regex per pair for
        # the classic shape
        is_quoted = p.startswith('"')
        key = F.when(
            is_quoted, F.regexp_extract(p, r'^"([^"]*)"', 1)
        ).otherwise(F.substring_index(p, '="', 1))
        klen = F.length(key) + F.when(is_quoted, F.lit(2)).otherwise(
            F.lit(0)
        )
        raw = p.substr(
            klen + F.lit(3), F.length(p) - klen - F.lit(3)
        )
        # unescape only when an escape is present: the JSON-decoder hop
        # costs ~3x a contains() and real label values are mostly clean
        value = F.when(
            raw.contains("\\"), _json_unescape(raw)
        ).otherwise(raw)
        return F.struct(key.alias("key"), value.alias("value"))

    return F.map_from_entries(F.transform(pairs, entry))


def exposition_exemplars(
    payloads: DataFrame, body_col: str = "body"
) -> DataFrame:
    """One row per OpenMetrics exemplar (``# {...} value [ts]`` sample
    suffix): ``(__name__ string, labels map, exemplar map, value
    double, ts double)`` — ``ts`` in SECONDS (the OpenMetrics unit; may
    be fractional), null when absent.  Same all-JVM plan shape as
    :func:`exposition_samples`; the anchored exemplar pattern cannot be
    spoofed by label values (their quotes arrive escaped)."""
    passthrough = [c for c in payloads.columns if c != body_col]
    line = (
        payloads.select(
            *passthrough,
            F.explode(F.split(F.col(body_col), "\n")).alias("__line"),
        )
        .select(*passthrough, F.trim("__line").alias("__line"))
        .where(
            (F.col("__line") != "")
            & ~F.col("__line").startswith("#")
            # cheap literal pre-filter keeps the pair-aware exemplar
            # regex off the (vast) majority of exemplar-less lines
            & F.col("__line").contains(" # ")
            & F.col("__line").rlike(_EXEMPLAR_RE)
        )
    )
    stripped = F.regexp_replace("__line", _EXEMPLAR_RE, "")
    rawts = F.nullif(
        F.regexp_extract("__line", _EXEMPLAR_RE, 3), F.lit("")
    )
    return line.select(
        *passthrough,
        F.regexp_extract(stripped, _METRIC_RE, 1).alias("__name__"),
        _labels_map(F.regexp_extract(stripped, r"\{(.*)\}", 1)).alias(
            "labels"
        ),
        _labels_map(F.regexp_extract("__line", _EXEMPLAR_RE, 1)).alias(
            "exemplar"
        ),
        _parse_value(F.regexp_extract("__line", _EXEMPLAR_RE, 2)).alias(
            "value"
        ),
        rawts.cast("double").alias("ts"),
    )


def scrape_samples(
    payloads: DataFrame,
    label_names: Sequence[str],
    body_col: str = "body",
    openmetrics: bool = False,
) -> DataFrame:
    """The chunk-frame-shaped view: requested labels pivoted to string
    columns (missing -> "", `schema/chunk.go:109-112` semantics), plus
    ``__name__``, ``value``, ``ts``."""
    from tsdb_parquet_spark.names import escape_name

    base = exposition_samples(payloads, body_col, openmetrics=openmetrics)
    # ``label_names`` are the RAW (possibly UTF-8) wire names; columns
    # come out as their U__ value-encoded form (`names.py` — identity
    # for classic names), the same contract as `otlp.otlp_frame`
    cols = [
        F.coalesce(F.try_element_at("labels", F.lit(n)), F.lit("")).alias(
            escape_name(n)
        )
        for n in label_names
        if n != "__name__"
    ]
    return base.select("__name__", *cols, "ts", "value")


def scrape_metadata(
    payloads: DataFrame, body_col: str = "body"
) -> DataFrame:
    """The ``# HELP`` / ``# TYPE`` / ``# UNIT`` comment structure as a
    frame: ``(metric string, type string, help string, unit string)``
    per distinct metric (help unescaped; UNIT is the OpenMetrics
    metadata line Prometheus surfaces via its metadata API; metrics
    appear only if they carry at least one metadata line)."""
    lines = (
        payloads.select(
            F.explode(F.split(F.col(body_col), "\n")).alias("l")
        )
        .select(F.trim("l").alias("l"))
        .where(
            F.col("l").startswith("# TYPE ")
            | F.col("l").startswith("# HELP ")
            | F.col("l").startswith("# UNIT ")
        )
        .select(
            # metric either classic or a quoted UTF-8 name ("my.metric")
            F.coalesce(
                F.nullif(
                    F.regexp_extract(
                        "l",
                        r'^# (?:TYPE|HELP|UNIT) "([^"\\]*)"', 1,
                    ),
                    F.lit(""),
                ),
                F.regexp_extract(
                    "l",
                    r"^# (?:TYPE|HELP|UNIT) ([a-zA-Z_:][a-zA-Z0-9_:]*)",
                    1,
                ),
            ).alias("metric"),
            F.regexp_extract("l", r"^# (TYPE|HELP|UNIT)", 1).alias("kind"),
            F.regexp_extract(
                "l",
                r'^# (?:TYPE|HELP|UNIT) '
                r'(?:"[^"\\]*"|[a-zA-Z_:][a-zA-Z0-9_:]*)'
                r" ?(.*)$",
                1,
            ).alias("payload"),
        )
        .where(F.col("metric") != "")
    )
    return (
        lines.groupBy("metric")
        .agg(
            F.max(F.when(F.col("kind") == "TYPE", F.col("payload"))).alias(
                "type"
            ),
            # HELP escapes only \\ and \n — a literal double-quote
            # arrives raw, so JSON-escape quotes before the decoder
            F.max(
                F.when(
                    F.col("kind") == "HELP",
                    _json_unescape(
                        F.regexp_replace("payload", '"', '\\\\"')
                    ),
                )
            ).alias("help"),
            F.max(F.when(F.col("kind") == "UNIT", F.col("payload"))).alias(
                "unit"
            ),
        )
    )


def scrape_targets_once(
    targets: "Sequence[tuple[str, dict[str, str]] | str]",
    spool_dir: str,
    scrape_ts_ms: int,
    timeout_s: float = 10.0,
) -> list[dict]:
    """One scrape tick over ``targets``: GET each ``/metrics`` URL and
    spool the body for `streaming.receiver.scrape_spool_ingestor` — the
    pull half of a Prometheus, as the one-shot a cron/driver loop calls
    (the reference has no scraper at all; its data arrives
    pre-converted).

    A target is a URL or ``(url, {label: value})``; target labels (the
    ``job``/``instance`` a Prometheus attaches) are woven in by
    REWRITING each sample line's label block through
    `parse_exposition` + `format_exposition` — exposition-exact, so the
    spool stays plain scrape text and the existing all-JVM drain parses
    it untouched.  Every line gets the scrape timestamp unless it
    carries its own.  Bodies land via write-to-temp + rename (the spool
    contract: a concurrent drain never reads a torn file).  Returns one
    report dict per target (url, ok, samples or error) — a failed
    target is reported, never spooled (no poison pills), matching a
    real scraper marking the target down."""
    import os
    import tempfile
    import urllib.request

    reports = []
    for idx, entry in enumerate(targets):
        url, extra = (entry, {}) if isinstance(entry, str) else entry
        try:
            with urllib.request.urlopen(url, timeout=timeout_s) as resp:
                body = resp.read().decode("utf-8", "replace")
            samples = parse_exposition(body)
        except Exception as exc:
            reports.append({"url": url, "ok": False, "error": str(exc)})
            continue
        rewritten = format_exposition(
            [
                ({**labels, **extra}, value,
                 ts_ms if ts_ms is not None else scrape_ts_ms)
                for labels, value, ts_ms in samples
            ]
        )
        # hidden ('.'-prefixed) temp INSIDE spool_dir: Spark file
        # sources skip hidden files, so a concurrent spool drain can
        # never read the torn half-written temp; same filesystem, so
        # the publishing rename below stays atomic
        fd, tmp = tempfile.mkstemp(
            dir=spool_dir, prefix=".scrape-tmp-", suffix=".tmp"
        )
        with os.fdopen(fd, "w") as fh:
            fh.write(rewritten)
        final = os.path.join(
            spool_dir, f"scrape-{scrape_ts_ms}-{idx}.txt"
        )
        os.rename(tmp, final)
        reports.append({"url": url, "ok": True, "samples": len(samples)})
    return reports
