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
# "svc.env" is a Prometheus 3.x UTF-8 name: the REFERENCE evaluator
# works on raw names throughout, while the engine stores it as its
# U__ value-encoded column — the harness escapes on the way in and
# unescapes on the way out, pinning the raw-name relabel contract
LABEL_POOL = ["job", "instance", "env", "zone", "tier", "svc.env"]
VALUE_POOL = ["api", "web", "prod-1:9090", "prod-2:9100", "eu", "us",
              "canary", ""]


def _go_expand(m, template):
    """Independent twin of Go's ``Regexp.ExpandString`` (regexp.go
    ``extract``/``expand``), which Prometheus ``replace``/``labelmap``
    use: ``$$`` is a literal ``$``; ``$name``/``${name}`` take the
    LONGEST ``[\\w]`` ident (``$1x`` is the NAME "1x"); purely-numeric
    non-leading-zero names < 1e8 are group indices; malformed refs
    (``$`` at end, ``$-``, unclosed ``${``) emit a raw ``$``; refs to
    out-of-range indices, unknown names, or unmatched groups expand to
    the empty string."""
    out = []
    i, n = 0, len(template)
    while i < n:
        c = template[i]
        if c != "$":
            out.append(c)
            i += 1
            continue
        if i + 1 < n and template[i + 1] == "$":
            out.append("$")
            i += 2
            continue
        j = i + 1
        brace = j < n and template[j] == "{"
        if brace:
            j += 1
        k = j
        while k < n and (template[k].isalnum() or template[k] == "_"):
            k += 1
        name = template[j:k]
        if not name or (brace and (k >= n or template[k] != "}")):
            out.append("$")
            i += 1
            continue
        i = k + (1 if brace else 0)
        if (
            name.isdigit()
            and not (name[0] == "0" and len(name) > 1)
            and int(name) < 10**8
        ):
            g = int(name)
            if g <= m.re.groups:
                out.append(m.group(g) or "")
        elif name in m.re.groupindex:
            out.append(m.group(name) or "")
    return "".join(out)


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
            for r in out:
                m = anchored.match(src(r))
                if m:
                    r[cfg.target_label] = _go_expand(m, cfg.replacement)
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
            # Prometheus: sorted labelset iteration, lb.Set per SERIES
            # — only labels PRESENT on the series are visited, so the
            # alphabetically-last present source wins and all-absent
            # rows keep the target's existing value
            for c in label_cols:  # label_cols is sorted
                m = anchored.match(c)
                if m:
                    new = _go_expand(m, cfg.replacement)
                    if new:
                        for r in out:
                            if str(r.get(c, "")) != "":
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
            if rng.random() < 0.25:
                # named-group arm ($h bare / ${h} braced / $nope absent)
                regex = "(?P<h>.*):(?P<p>.*)"
                repl = rng.choice(
                    ["$h", "${h}-x", "$p:$h", "$nope", "h=$h$"]
                )
            else:
                n_groups = re.compile(regex).groups
                repl = rng.choice(
                    # sloppy-but-legal Go Expand forms on purpose:
                    # out-of-range ($3), longest-ident ($1x == name
                    # "1x" -> ""), leading-zero ($01 -> name), $$,
                    # trailing/malformed $ -> literal
                    ["$1", "x-$1", "${1}-y", "$3", "$1x", "${1}x",
                     "$01", "$$1", "a$", "$-z", "${1", "$0"]
                    if n_groups else ["fixed", "$1", "f$"]
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
                action=action,
                regex=rng.choice(["(jo.*|en.*)", r"(sv.*|jo.*)",
                                  r"svc\.(.*)"]),
                replacement=rng.choice(
                    ["meta_$1", "m_${1}", "meta_$2", "m$1x", "mm_$1$",
                     "m.${1}"]  # dotted NEW name -> U__ column
                ),
            ))
        elif action in ("labeldrop", "labelkeep"):
            configs.append(RelabelConfig(
                action=action,
                regex=rng.choice(["meta_.*", "zone", "t.*", r"svc\..*",
                                  r"job|instance|env|zone|tier|out|dst|"
                                  r"cased|shard|meta_.*|m_.*|m\..*|"
                                  r"svc\..*"]),
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
        from tsdb_parquet_spark.names import escape_name, unescape_name

        schema = ", ".join(f"`{escape_name(l)}` STRING" for l in labels)
        schema += ", ts LONG, value DOUBLE"
        data = [
            tuple(r[l] for l in labels) + (r["ts"], r["value"])
            for r in rows
        ]
        df = spark.createDataFrame(data, schema)
        got_df = apply_relabel(df, configs, protected=PROTECTED)
        got_rows = [
            {unescape_name(c): v for c, v in r.asDict().items()}
            for r in got_df.collect()
        ]
        want_rows, want_cols = _ref_apply(rows, configs)
        got = _canon(
            got_rows, {unescape_name(c) for c in got_df.columns}
        )
        want = _canon(want_rows, want_cols)
        assert got == want, (
            f"case {case}: configs={configs}\n got={got}\nwant={want}"
        )
        n_checked += len(want)
    assert n_checked > 50  # the generator produced real work
