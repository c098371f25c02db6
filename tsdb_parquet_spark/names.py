"""Lossless UTF-8 <-> legacy-charset name escaping.

Prometheus 3.x allows arbitrary UTF-8 metric and label names; systems
whose storage layer needs classic ``[a-zA-Z_:][a-zA-Z0-9_:]*`` names
round-trip them through the PUBLIC value-encoding escape scheme of
``prometheus/common`` ``model/metric.go`` (``EscapeName`` /
``UnescapeName`` with ``ValueEncodingEscaping``): a non-legacy name
becomes ``U__`` + its runes, where legacy runes pass through, ``_``
doubles to ``__``, and anything else becomes ``_<hex codepoint>_``.

This engine stores label names as DataFrame COLUMNS, and Spark's
analyzer reads an unquoted dot as struct-field access — so dotted OTLP
attribute names (``service.version``) ride this exact scheme as their
physical column names (``U__service_2e_version``: identifier-safe,
pushdown-friendly, no backtick audit needed across the engine), and
the parse/render boundaries escape/unescape so users only ever see the
raw UTF-8 names.  A legacy-valid name is ALWAYS its own escaping, so
the scheme is a no-op for every classic store.

Asymmetry shared with upstream: a label literally NAMED with a valid
``U__...`` escape body (legacy charset, so ``escape_name`` passes it
through) decodes on the way out — ``UnescapeName`` cannot tell it from
an escaped name.  prometheus/common has the same property; such names
do not occur outside adversarial input.
"""

from __future__ import annotations

__all__ = ["is_legacy_name", "escape_name", "unescape_name"]


def _legacy_rune(ch: str, i: int) -> bool:
    # model/metric.go isValidLegacyRune: letters/underscore/colon
    # anywhere, digits only past position 0
    return (
        "a" <= ch <= "z"
        or "A" <= ch <= "Z"
        or ch == "_"
        or ch == ":"
        or ("0" <= ch <= "9" and i > 0)
    )


def is_legacy_name(name: str) -> bool:
    """True when ``name`` is already a classic Prometheus name
    (``model.IsValidLegacyMetricName``) — escaping is the identity."""
    if not name:
        return False
    return all(_legacy_rune(ch, i) for i, ch in enumerate(name))


def escape_name(name: str) -> str:
    """``EscapeName(name, ValueEncodingEscaping)``: identity for
    legacy names, else ``U__`` + doubled underscores + ``_hex_``
    codepoints for non-legacy runes."""
    if not name or is_legacy_name(name):
        return name
    out = ["U__"]
    for i, ch in enumerate(name):
        if ch == "_":
            out.append("__")
        elif _legacy_rune(ch, i):
            out.append(ch)
        else:
            out.append(f"_{ord(ch):x}_")
    return "".join(out)


def unescape_name(name: str) -> str:
    """Reverse of :func:`escape_name`.  Like upstream ``UnescapeName``,
    a name without the ``U__`` prefix — or with a malformed escape
    body — is returned unchanged."""
    if not name.startswith("U__"):
        return name
    body = name[3:]
    out: list[str] = []
    i, n = 0, len(body)
    while i < n:
        ch = body[i]
        if ch != "_":
            out.append(ch)
            i += 1
            continue
        if i + 1 < n and body[i + 1] == "_":
            out.append("_")
            i += 2
            continue
        j = i + 1
        while j < n and body[j] != "_":
            j += 1
        hexpart = body[i + 1 : j]
        if j >= n or not hexpart:
            return name  # trailing/empty escape: malformed
        try:
            cp = int(hexpart, 16)
            out.append(chr(cp))
        except (ValueError, OverflowError):
            return name
        i = j + 1
    return "".join(out)
