"""PII scrubbing — regex redaction of emails / URLs / IPs / phone
numbers, the compliance pass a training-data pipeline runs before
anything ships to a trainer.

Map-only `regexp_replace` chains (JVM-side, codegen'd, zero shuffle).
Pattern dialect is the intersection of Java regex (Spark) and RE2
(DuckDB): character classes, bounded repeats, alternation, \\b — no
backreferences, no lookaround — so every pattern behaves identically in
both engines and the op is oracle-checkable. Order matters: URLs are
redacted before emails so `http://a@b.com/x` can't leak a half-redacted
email out of a URL.

At 100 TB: linear in scan bandwidth; production swaps the pattern list
for a vetted policy pack (and adds an entropy/NER pass for names), but
the plan shape — one projection, all patterns fused into one codegen
stage — is exactly this.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: (token, pattern) in application order. Conservative shared-dialect
#: regexes; see module docstring.
PII_PATTERNS: list[tuple[str, str]] = [
    ("<URL>", r"https?://[^\s]+"),
    ("<EMAIL>", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("<IP>", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"),
    ("<PHONE>", r"\+\d[\d ()-]{6,}\d"),
]


def scrub_pii(text: Column,
              patterns: list[tuple[str, str]] | None = None) -> Column:
    """Redact every pattern occurrence with its token."""
    out = text
    for token, pat in (patterns or PII_PATTERNS):
        out = F.regexp_replace(out, pat, token)
    return out


def redaction_counts(text: Column,
                     patterns: list[tuple[str, str]] | None = None) -> Column:
    """Total number of redactions ``scrub_pii`` would make (audit
    metric), counted pattern-by-pattern on the progressively-scrubbed
    text — same order as scrub_pii, so counts match what it replaces."""
    total = F.lit(0)
    cur = text
    for token, pat in (patterns or PII_PATTERNS):
        total = total + F.size(F.regexp_extract_all(cur, F.lit(pat), 0))
        cur = F.regexp_replace(cur, pat, token)
    return total.cast("long")
