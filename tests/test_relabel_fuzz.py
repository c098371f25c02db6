"""Seeded fuzz twin for the relabel pipeline (`operators/relabel.py`):
random rule chains over random label frames, checked row-for-row
against an independent pure-Python evaluator implementing Prometheus
``model/relabel`` semantics under this engine's static-column reading
("" == absent, columns persist).  Same style as tests/test_promql_fuzz.

The generated regexes stay inside the Java/Python-common dialect
(literals, classes, groups, alternation, ``.*``); hashmod recomputes
``binary.BigEndian.Uint64(md5[8:])`` — the Prometheus read."""

import hashlib
import random
import re

from tsdb_parquet_spark.operators.relabel import (
    RelabelConfig,
    apply_relabel,
)

PROTECTED = ("ts", "value")
LABEL_POOL = ["job", "instance", "env", "zone", "tier"]
VALUE_POOL = ["api", "web", "prod-1:9090", "prod-2:9100", "eu", "us",
              "canary", ""]


def _ref_apply(rows, configs):
    """Pure-Python reference: rows are dicts over a shared column set
    (the static-schema reading); "" means absent."""
    cols = set(rows[0]) if rows else set()
    out = [dict(r) for r in rows]
    for cfg in configs:
        anchored = re.compile(f"^(?:{cfg.regex})$")

        def src(r):
            return cfg.separator.join(
                str(r.get(l, "")) for l in cfg.source_labels
            )

        if cfg.action in ("keep", "drop"):
            keep = cfg.action == "keep"
            out = [r for r in out if bool(anchored.match(src(r))) == keep]
            continue
        if cfg.action in ("keepequal", "dropequal"):
            keep = cfg.action == "keepequal"
            out = [
                r for r in out
                if (src(r) == str(r.get(cfg.target_label, ""))) == keep
            ]
            continue
        if cfg.action == "replace":
            pyrepl = re.sub(r"\$\{(\w+)\}", r"\\g<\1>", cfg.replacement)
            pyrepl = re.sub(r"\$(\w+)", r"\\g<\1>", pyrepl)
            for r in out:
                m = anchored.match(src(r))
                if m:
                    r[cfg.target_label] = m.expand(pyrepl)
                else:
                    r.setdefault(cfg.target_label, "")
            cols.add(cfg.target_label)
            continue
        if cfg.action in ("lowercase", "uppercase"):
            fn = str.lower if cfg.action == "lowercase" else str.upper
            for r in out:
                r[cfg.target_label] = fn(src(r))
            cols.add(cfg.target_label)
            continue
        if cfg.action == "hashmod":
            for r in out:
                digest = hashlib.md5(src(r).encode()).digest()
                r[cfg.target_label] = str(
                    int.from_bytes(digest[8:], "big") % cfg.modulus
                )
            cols.add(cfg.target_label)
            continue
        label_cols = sorted(c for c in cols if c not in PROTECTED)
        if cfg.action == "labelmap":
            pyrepl = re.sub(r"\$\{(\w+)\}", r"\\g<\1>", cfg.replacement)
            pyrepl = re.sub(r"\$(\w+)", r"\\g<\1>", pyrepl)
            for c in label_cols:
                m = anchored.match(c)
                if m:
                    new = anchored.sub(pyrepl, c)
                    if new and new != c:
                        for r in out:
                            r[new] = r.get(c, "")
                        cols.add(new)
            continue
        if cfg.action == "labeldrop":
            dead = [c for c in label_cols if anchored.match(c)]
        else:  # labelkeep
            dead = [c for c in label_cols if not anchored.match(c)]
        for c in dead:
            cols.discard(c)
            for r in out:
                r.pop(c, None)
    return out, cols


def _canon(rows, cols):
    """Order-insensitive comparison form: per row, the non-empty
    non-payload labels plus the payload identity."""
    canon = []
    for r in rows:
        canon.append(tuple(sorted(
            (c, str(r[c]))
            for c in cols
            if c in r and (c in PROTECTED or str(r.get(c, "")) != "")
        )))
    return sorted(canon)


def _random_case(rng: random.Random):
    labels = rng.sample(LABEL_POOL, rng.randint(2, 4))
    rows = []
    for i in range(rng.randint(4, 10)):
        row = {l: rng.choice(VALUE_POOL) for l in labels}
        row["ts"] = 1000 + i
        row["value"] = float(i)
        rows.append(row)
    configs = []
    for _ in range(rng.randint(2, 5)):
        action = rng.choice([
            "replace", "keep", "drop", "lowercase", "uppercase",
            "hashmod", "labelmap", "labeldrop", "labelkeep",
            "keepequal", "dropequal",
        ])
        srcs = tuple(rng.sample(labels, rng.randint(1, 2)))
        regex = rng.choice([
            "(.*)", "(a.*)", "(.*):(.*)", "(prod|api).*",
            "[a-z]+-?[0-9:]*", "(.*)(9090|9100)?",
        ])
        if action in ("keep", "drop"):
            configs.append(RelabelConfig(
                action=action, source_labels=srcs,
                regex=rng.choice(["(.*)", "a.*", ".*9.*", "eu|us",
                                  "prod.*"]),
            ))
        elif action == "replace":
            n_groups = re.compile(regex).groups
            repl = rng.choice(
                ["$1", "x-$1", "${1}-y"] if n_groups else ["fixed"]
            )
            configs.append(RelabelConfig(
                action=action, source_labels=srcs, regex=regex,
                target_label=rng.choice(["out", "tier", "dst"]),
                replacement=repl,
            ))
        elif action in ("lowercase", "uppercase"):
            configs.append(RelabelConfig(
                action=action, source_labels=srcs,
                target_label=rng.choice(["cased", "tier"]),
            ))
        elif action == "hashmod":
            configs.append(RelabelConfig(
                action=action, source_labels=srcs,
                modulus=rng.choice([2, 5, 7, 16]),
                target_label="shard",
            ))
        elif action == "labelmap":
            configs.append(RelabelConfig(
                action=action, regex="(jo.*|en.*)",
                replacement=rng.choice(["meta_$1", "m_${1}"]),
            ))
        elif action in ("labeldrop", "labelkeep"):
            configs.append(RelabelConfig(
                action=action,
                regex=rng.choice(["meta_.*", "zone", "t.*",
                                  "job|instance|env|zone|tier|out|dst|"
                                  "cased|shard|meta_.*|m_.*"]),
            ))
        else:  # keepequal / dropequal
            configs.append(RelabelConfig(
                action=action, source_labels=(srcs[0],),
                target_label=srcs[-1],
            ))
    return labels, rows, configs


def test_relabel_fuzz_vs_python_reference(spark):
    rng = random.Random(0xE14)
    n_checked = 0
    for case in range(25):
        labels, rows, configs = _random_case(rng)
        schema = ", ".join(f"`{l}` STRING" for l in labels)
        schema += ", ts LONG, value DOUBLE"
        data = [
            tuple(r[l] for l in labels) + (r["ts"], r["value"])
            for r in rows
        ]
        df = spark.createDataFrame(data, schema)
        got_df = apply_relabel(df, configs, protected=PROTECTED)
        got_rows = [r.asDict() for r in got_df.collect()]
        want_rows, want_cols = _ref_apply(rows, configs)
        got = _canon(got_rows, set(got_df.columns))
        want = _canon(want_rows, want_cols)
        assert got == want, (
            f"case {case}: configs={configs}\n got={got}\nwant={want}"
        )
        n_checked += len(want)
    assert n_checked > 50  # the generator produced real work
