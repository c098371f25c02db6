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
    parts = [
        F.coalesce(F.col(c).cast("string"), F.lit(""))
        if c in df.columns
        else F.lit("")
        for c in cfg.source_labels
    ]
    if not parts:
        return F.lit("")
    return F.concat_ws(cfg.separator, *parts)


def _java_replacement(repl: str) -> str:
    """Prometheus uses Go's Regexp.Expand syntax (``$1`` / ``${1}``,
    ``$$`` for a literal dollar); Java's ``regexp_replace`` shares
    ``$1`` but rejects a NUMERIC ``${1}`` (braces are for named groups
    only) and needs a literal ``$`` escaped as ``\\$`` — normalize
    both, and escape backslashes defensively."""
    import re as _re

    repl = repl.replace("\\", "\\\\")
    # Go's $$ == literal $; translate BEFORE group-ref normalization so
    # the $ it produces is never mistaken for a ref.
    repl = repl.replace("$$", "\\$")
    return _re.sub(r"\$\{(\d+)\}", r"$\1", repl)


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
    protected = tuple(protected)
    for cfg in configs:
        if cfg.target_label in protected:
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
            tgt = (
                F.coalesce(F.col(cfg.target_label).cast("string"), F.lit(""))
                if cfg.target_label in df.columns
                else F.lit("")
            )
            eq = _src(df, cfg) == tgt
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
                src, anchored, _java_replacement(cfg.replacement)
            )
            old = (
                F.col(cfg.target_label)
                if cfg.target_label in df.columns
                else F.lit("")
            )
            df = df.withColumn(
                cfg.target_label,
                F.when(src.rlike(anchored), expanded).otherwise(old),
            )
            continue
        if cfg.action in ("lowercase", "uppercase"):
            fn = F.lower if cfg.action == "lowercase" else F.upper
            df = df.withColumn(cfg.target_label, fn(_src(df, cfg)))
            continue
        if cfg.action == "hashmod":
            df = df.withColumn(
                cfg.target_label,
                _hashmod(_src(df, cfg), cfg.modulus).cast("string"),
            )
            continue
        # schema-level actions: label NAMES are static columns,
        # matched driver-side with Python re (Go's (?P<name>...) named
        # groups are already Python syntax — no Java translation here)
        label_cols = [c for c in df.columns if c not in protected]
        import re as _re

        rx = _re.compile(f"^(?:{cfg.regex})$")
        if cfg.action == "labelmap":
            # Go Expand group refs ($1 / ${1}) -> Python re backrefs;
            # $$ is Go's literal $ (translate first so it's never
            # mistaken for a ref)
            pyrepl = cfg.replacement.replace("$$", "\x00")
            pyrepl = _re.sub(r"\$\{(\w+)\}", r"\\\1", pyrepl)
            pyrepl = _re.sub(r"\$(\w+)", r"\\\1", pyrepl)
            pyrepl = pyrepl.replace("\x00", "$")
            for c in label_cols:
                if rx.match(c):
                    new = rx.sub(pyrepl, c)
                    if new in protected:
                        raise ValueError(
                            f"labelmap would overwrite protected "
                            f"sample column {new!r}"
                        )
                    if new and new != c:
                        df = df.withColumn(new, F.col(c))
            continue
        if cfg.action == "labeldrop":
            drop = [c for c in label_cols if rx.match(c)]
            df = df.drop(*drop)
            continue
        if cfg.action == "labelkeep":
            drop = [c for c in label_cols if not rx.match(c)]
            df = df.drop(*drop)
            continue
    return df
