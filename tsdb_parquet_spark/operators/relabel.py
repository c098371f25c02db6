"""Prometheus relabeling (``model/relabel``) as pure column operations.

The relabel pipeline is Prometheus's universal label rewrite/routing
language — scrape configs (``relabel_configs`` /
``metric_relabel_configs``), remote-write ``write_relabel_configs``,
alert relabeling and federation all share it.  Semantics from the
public docs (configuration.md#relabel_config) and model/relabel:

* each rule concatenates ``source_labels`` values with ``separator``
  (absent labels read "", the engine-wide convention), fully anchors
  ``regex`` against the result, and then applies its ``action``;
* rules apply IN ORDER, each seeing its predecessors' output;
* ``replace`` writes the expanded ``replacement`` (``$1``/``${1}``
  group refs) into ``target_label`` only when the regex matches — a
  non-match leaves the row's labels untouched (it never clears);
* ``keep``/``drop`` filter ROWS by regex match; ``keepequal`` /
  ``dropequal`` compare the concatenation against ``target_label``'s
  value; an entirely-dropped series simply vanishes from the frame;
* ``lowercase``/``uppercase`` rewrite ``target_label`` from the
  concatenation; ``hashmod`` sets ``target_label`` to
  ``sum64(md5(src)) % modulus`` — the LAST 8 bytes of the MD5 as an
  unsigned 64-bit integer (Prometheus's historical ``sum64`` shifted
  bytes 0-7 by >=64 bits, which in Go zeroes them, so only bytes 8-15
  ever counted; modern relabel.go keeps
  ``binary.BigEndian.Uint64(hash[8:])`` for compatibility) —
  Prometheus's horizontal-sharding primitive;
* ``labelmap`` copies every label whose NAME matches ``regex`` to the
  expanded replacement name; ``labeldrop``/``labelkeep`` remove/retain
  label COLUMNS by name.  These act on the (static) schema, so they
  compile to column selection, not row work.

Scale shape: every action is a Catalyst column expression or a static
schema projection — no shuffle, no Python, applied before chunk
encoding so keep/drop prune rows ahead of any store write.  ``hashmod``
uses ``md5`` (JVM intrinsic) rather than xxhash so the DuckDB oracle
and any other SQL engine can reproduce shard assignment bit-for-bit.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["RelabelConfig", "apply_relabel", "parse_relabel_configs"]

_ACTIONS = {
    "replace",
    "keep",
    "drop",
    "keepequal",
    "dropequal",
    "lowercase",
    "uppercase",
    "hashmod",
    "labelmap",
    "labeldrop",
    "labelkeep",
}


@dataclass(frozen=True)
class RelabelConfig:
    """One relabel rule — field names and defaults exactly as the
    Prometheus config schema (configuration.md#relabel_config)."""

    action: str = "replace"
    source_labels: tuple[str, ...] = ()
    separator: str = ";"
    regex: str = "(.*)"
    modulus: int = 0
    target_label: str = ""
    replacement: str = "$1"

    def __post_init__(self):
        if self.action not in _ACTIONS:
            raise ValueError(f"unknown relabel action {self.action!r}")
        if self.action == "hashmod" and self.modulus <= 0:
            raise ValueError("hashmod requires a positive modulus")
        if self.action in (
            "replace", "keepequal", "dropequal",
            "lowercase", "uppercase", "hashmod",
        ) and not self.target_label:
            raise ValueError(f"{self.action} requires target_label")


def parse_relabel_configs(specs: Sequence[dict]) -> list[RelabelConfig]:
    """Relabel rules from the Prometheus YAML/JSON mapping shape (the
    list under ``relabel_configs:``)."""
    out = []
    for s in specs:
        out.append(
            RelabelConfig(
                action=s.get("action", "replace"),
                source_labels=tuple(s.get("source_labels", ())),
                separator=s.get("separator", ";"),
                regex=s.get("regex", "(.*)"),
                modulus=int(s.get("modulus", 0)),
                target_label=s.get("target_label", ""),
                replacement=s.get("replacement", "$1"),
            )
        )
    return out


def _src(df: DataFrame, cfg: RelabelConfig) -> Column:
    from tsdb_parquet_spark.names import escape_name

    # rule fields address RAW (possibly UTF-8) label names; a dotted
    # source arrives as its U__ value-encoded column (identity for
    # classic names — `names.py`)
    parts = [
        F.coalesce(F.col(c).cast("string"), F.lit(""))
        if c in df.columns
        else F.lit("")
        for c in (escape_name(s) for s in cfg.source_labels)
    ]
    if not parts:
        return F.lit("")
    return F.concat_ws(cfg.separator, *parts)


def _expand_tokens(template: str):
    """Tokenize a Go ``Regexp.Expand`` replacement template with the
    exact rules of Go's ``regexp.extract`` (Prometheus ``replace`` /
    ``labelmap`` go through ``Regexp.ExpandString``,
    prometheus/prometheus model/relabel/relabel.go): ``$$`` is a
    literal ``$``; ``$name`` / ``${name}`` reference a capture where
    the name is the LONGEST run of ``[A-Za-z0-9_]`` — so ``$1x`` is
    the NAME "1x", never group 1 followed by "x"; a purely-numeric
    name with no leading zero and < 1e8 is a group INDEX; anything
    malformed (``$`` at end of string, ``$-``, ``${`` with no closing
    brace) emits a literal ``$`` and parsing resumes after it.

    Yields ``('lit', s)`` / ``('num', n)`` / ``('name', s)``."""
    i, n = 0, len(template)
    lit = []
    while i < n:
        c = template[i]
        if c != "$":
            lit.append(c)
            i += 1
            continue
        if i + 1 < n and template[i + 1] == "$":
            lit.append("$")
            i += 2
            continue
        j = i + 1
        brace = j < n and template[j] == "{"
        if brace:
            j += 1
        k = j
        # Go allows unicode letters/digits in names (unicode.IsLetter)
        while k < n and (template[k].isalnum() or template[k] == "_"):
            k += 1
        name = template[j:k]
        if not name or (brace and (k >= n or template[k] != "}")):
            # malformed ref: the $ is raw text (Go's `!ok` branch)
            lit.append("$")
            i += 1
            continue
        if lit:
            yield ("lit", "".join(lit))
            lit = []
        if name.isdigit() and not (name[0] == "0" and len(name) > 1) and int(name) < 10**8:
            yield ("num", int(name))
        else:
            yield ("name", name)
        i = k + (1 if brace else 0)
    if lit:
        yield ("lit", "".join(lit))


def _regex_groups(regex: str):
    """(group count, named-group set) of ``regex``, or (None, None)
    when Python ``re`` cannot compile it (keep refs unvalidated then —
    Go RE2 and Python share the ``(?P<name>...)`` spelling, so this is
    rare)."""
    import re as _re

    try:
        pat = _re.compile(f"(?:{regex})")
    except _re.error:
        return None, None
    return pat.groups, set(pat.groupindex)


def _java_replacement(repl: str, regex: str) -> str:
    """Render a Go Expand template for Java ``regexp_replace``:
    surviving numeric refs stay ``$n``, named refs become ``${name}``
    (Java's only named spelling), literal ``$`` / ``\\`` are escaped.
    Refs to out-of-range indices or absent names expand to the EMPTY
    string exactly like Go's ``Regexp.Expand`` — Prometheus runs a
    ``replacement: "$3"`` with a 2-group regex silently, so a sloppy
    fleet config must not throw INVALID_REGEXP_REPLACE here.  (Refs to
    groups that exist but did not participate in the match already
    yield "" in Java, Python and Go alike.)"""
    ngroups, names = _regex_groups(regex)
    out = []
    for kind, val in _expand_tokens(repl):
        if kind == "lit":
            out.append(val.replace("\\", "\\\\").replace("$", "\\$"))
        elif kind == "num":
            if ngroups is None or val <= ngroups:
                out.append(f"${val}")
        else:
            if names is None or val in names:
                out.append(f"${{{val}}}")
    return "".join(out)


def _py_replacement(repl: str, regex: str) -> str:
    """Render a Go Expand template for Python ``re.sub`` (the
    ``labelmap`` label-NAME path): refs become ``\\g<n>`` /
    ``\\g<name>``, out-of-range / unknown refs expand to ""."""
    ngroups, names = _regex_groups(regex)
    out = []
    for kind, val in _expand_tokens(repl):
        if kind == "lit":
            out.append(val.replace("\\", "\\\\"))
        elif kind == "num":
            if ngroups is None or val <= ngroups:
                out.append(f"\\g<{val}>")
        else:
            if names is None or val in names:
                out.append(f"\\g<{val}>")
    return "".join(out)


def _java_regex(regex: str) -> str:
    """Go (RE2) named groups are ``(?P<name>...)``; Java spells them
    ``(?<name>...)``.  Translate so real Prometheus configs run."""
    return regex.replace("(?P<", "(?<")


def _anchored(regex: str) -> str:
    return f"^(?:{_java_regex(regex)})$"


def _hashmod(src: Column, modulus: int) -> Column:
    # sum64(md5(src)): the LAST 8 bytes of the MD5 digest as an
    # unsigned 64-bit integer, mod the shard count — Prometheus's
    # model/relabel is binary.BigEndian.Uint64(hash[8:]) (the historical
    # sum64 shifted bytes 0-7 by >=64 bits, which in Go yields 0, so
    # only bytes 8-15 ever counted; modern relabel.go preserves that
    # "to give the same result as earlier versions").  Hex chars 17-32
    # = digest bytes 8-15.  conv() parses the 16 hex chars as unsigned;
    # decimal(38,0) holds the full uint64 range exactly, then pmod
    # brings it into range.
    low64 = F.conv(F.substring(F.md5(src), 17, 16), 16, 10).cast(
        "decimal(38,0)"
    )
    return F.pmod(low64, F.lit(modulus)).cast("long")


def apply_relabel(
    df: DataFrame,
    configs: Sequence[RelabelConfig],
    protected: Sequence[str] = ("ts", "value"),
) -> DataFrame:
    """Apply relabel rules in order.  ``protected`` names non-label
    columns (sample payload) no rule may touch; ``labeldrop`` /
    ``labelkeep`` never remove them."""
    from tsdb_parquet_spark.names import escape_name, unescape_name

    protected = tuple(protected)
    for cfg in configs:
        # Prometheus 3.x: relabel rules see RAW label names.  A UTF-8
        # target writes to its U__ value-encoded column; classic names
        # pass through untouched (escape_name is the identity for them)
        tgt = escape_name(cfg.target_label)
        if tgt in protected:
            # 'value'/'ts' are legal Prometheus LABEL names, but here
            # they are the sample payload columns — a write action
            # targeting one would silently corrupt every sample.
            # Fail loudly like the $-in-target_label guard.
            raise ValueError(
                f"{cfg.action} target_label {cfg.target_label!r} is a "
                "protected sample column in this engine"
            )
        anchored = _anchored(cfg.regex)
        if cfg.action in ("keep", "drop"):
            m = _src(df, cfg).rlike(anchored)
            df = df.filter(m if cfg.action == "keep" else ~m)
            continue
        if cfg.action in ("keepequal", "dropequal"):
            tgt_val = (
                F.coalesce(F.col(tgt).cast("string"), F.lit(""))
                if tgt in df.columns
                else F.lit("")
            )
            eq = _src(df, cfg) == tgt_val
            df = df.filter(eq if cfg.action == "keepequal" else ~eq)
            continue
        if cfg.action == "replace":
            if "$" in cfg.target_label:
                # upstream expands $refs in target_label too, which
                # yields a per-row DYNAMIC label name — impossible on a
                # static column schema.  Fail loudly rather than write
                # to a literal "$1" column.
                raise ValueError(
                    "replace with capture refs in target_label "
                    f"({cfg.target_label!r}) is not supported: label "
                    "names are static columns in this engine"
                )
            src = _src(df, cfg)
            expanded = F.regexp_replace(
                src, anchored, _java_replacement(cfg.replacement, cfg.regex)
            )
            old = (
                F.col(tgt) if tgt in df.columns else F.lit("")
            )
            df = df.withColumn(
                tgt,
                F.when(src.rlike(anchored), expanded).otherwise(old),
            )
            continue
        if cfg.action in ("lowercase", "uppercase"):
            fn = F.lower if cfg.action == "lowercase" else F.upper
            df = df.withColumn(tgt, fn(_src(df, cfg)))
            continue
        if cfg.action == "hashmod":
            df = df.withColumn(
                tgt,
                _hashmod(_src(df, cfg), cfg.modulus).cast("string"),
            )
            continue
        # schema-level actions: label NAMES are static columns,
        # matched driver-side with Python re (Go's (?P<name>...) named
        # groups are already Python syntax — no Java translation here).
        # The regex sees RAW names (Prometheus 3.x semantics): a dotted
        # OTLP label is stored as its U__ column, so `(.+)\.version`
        # must match via unescape_name, and a produced name re-escapes
        # to its physical column.
        label_cols = [c for c in df.columns if c not in protected]
        import re as _re

        rx = _re.compile(f"^(?:{cfg.regex})$")
        if cfg.action == "labelmap":
            # Go Expand group refs -> Python re backrefs, with Go's
            # out-of-range/unknown-name -> "" semantics
            pyrepl = _py_replacement(cfg.replacement, cfg.regex)
            # Prometheus iterates the labelset in SORTED name order and
            # lb.Set()s per series, so when several source labels map
            # to the same new name, the alphabetically-LAST one that is
            # PRESENT on that series wins — and a series where every
            # source is absent ("") keeps the target's existing value.
            # A sequential whole-column copy gets both wrong (r15 fuzz
            # finding): group sources per target and fold a per-row
            # last-present-wins CASE chain instead.  Sort order is the
            # RAW labelset order, matching upstream's lbls.Range.
            targets: dict[str, list[str]] = {}
            for c in sorted(label_cols, key=unescape_name):
                raw = unescape_name(c)
                if rx.match(raw):
                    new = rx.sub(pyrepl, raw)
                    new_phys = escape_name(new) if new else ""
                    if new_phys in protected:
                        raise ValueError(
                            f"labelmap would overwrite protected "
                            f"sample column {new!r}"
                        )
                    if new:
                        targets.setdefault(new_phys, []).append(c)
            for new_phys, srcs in targets.items():
                if srcs == [new_phys]:
                    continue  # self-map is a no-op
                expr = (
                    F.coalesce(F.col(new_phys).cast("string"), F.lit(""))
                    if new_phys in df.columns
                    else F.lit("")
                )
                for c in srcs:  # ascending: the last wrap wins
                    src_c = F.coalesce(F.col(c).cast("string"), F.lit(""))
                    expr = F.when(src_c != "", src_c).otherwise(expr)
                df = df.withColumn(new_phys, expr)
            continue
        if cfg.action == "labeldrop":
            drop = [c for c in label_cols if rx.match(unescape_name(c))]
            df = df.drop(*drop)
            continue
        if cfg.action == "labelkeep":
            drop = [
                c for c in label_cols if not rx.match(unescape_name(c))
            ]
            df = df.drop(*drop)
            continue
    return df
