"""Predicate / matcher surface (reference P2-P7).

The reference supports three predicate shapes — equality, >=, <= — combined
only by AND (`compute/scan.go:21-49`, `dataset/predicate.go:14-42`), and its
Prometheus querier maps *every* matcher type to equality
(`prometheus/querier.go:71-73`, a documented fidelity gap).  Here each
predicate is a Catalyst ``Column`` expression, so pushdown, reordering,
bloom/zone-map/dictionary pruning (reference P8-P13) all happen inside the
Parquet scan for free; we additionally implement `!=` and regex matchers
correctly rather than reproducing the reference's bug.

All helpers return ``Column``s; :func:`conjunction` folds them with AND —
the only combinator the reference has (`dataset/predicate.go:24-42`).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import reduce
from typing import Iterable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: matcher operator names, mirroring PromQL's =, !=, =~, !~
EQ, NEQ, RE, NRE = "=", "!=", "=~", "!~"


@dataclass(frozen=True)
class Matcher:
    """A label matcher: (name, op, value) — the unit of series selection
    in the reference querier (`prometheus/querier.go:66-73`)."""

    name: str
    op: str
    value: str

    def to_column(self) -> Column:
        col = F.col(self.name)
        if self.op == EQ:
            return col == F.lit(self.value)
        if self.op == NEQ:
            return col != F.lit(self.value)
        if self.op == RE:
            # PromQL regexes are fully anchored
            return col.rlike(f"^(?:{self.value})$")
        if self.op == NRE:
            return ~col.rlike(f"^(?:{self.value})$")
        raise ValueError(f"unsupported matcher op {self.op!r}")


def equals(column: str, value) -> Column:
    """P2 — `compute/scan.go:21-29`."""
    return F.col(column) == F.lit(value)


def not_equals(column: str, value) -> Column:
    return F.col(column) != F.lit(value)


def regex_match(column: str, pattern: str) -> Column:
    return F.col(column).rlike(f"^(?:{pattern})$")


def regex_not_match(column: str, pattern: str) -> Column:
    return ~F.col(column).rlike(f"^(?:{pattern})$")


def gte(column: str, value) -> Column:
    """P3 — `compute/scan.go:31-39`."""
    return F.col(column) >= F.lit(value)


def lte(column: str, value) -> Column:
    """P4 — `compute/scan.go:41-49`."""
    return F.col(column) <= F.lit(value)


def conjunction(predicates: Iterable[Column]) -> Column:
    """P5 — AND of all predicates (`dataset/predicate.go:14-42`).

    Catalyst reorders and pushes the conjuncts down to the Parquet scan,
    which subsumes the reference's hand-rolled predicate ordering (P6,
    `compute/scan.go:60`).
    """
    preds = list(predicates)
    if not preds:
        return F.lit(True)
    return reduce(lambda a, b: a & b, preds)


def apply_matchers(df: DataFrame, matchers: Iterable[Matcher]) -> DataFrame:
    """P7 scan driver — the whole filter pipeline (`compute/scan.go:51-78`)."""
    return df.filter(conjunction(m.to_column() for m in matchers))
