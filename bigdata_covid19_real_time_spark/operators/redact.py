"""PII redaction: regex scrubbing for the pre-training privacy pass.

Chained JVM-side ``regexp_replace`` — a pure narrow map (no UDF, no
shuffle) that runs at scan speed over a 100 TB corpus.  Patterns are
deliberately conservative ASCII classes (portable across regex engines
and cheap to evaluate); a production deployment swaps in its compliance
team's pattern set via the ``patterns`` argument without touching the
plan shape.

The synthetic test corpus contains no PII, so this operator is gated by
unit tests with planted matches rather than a corpus query — the same
policy as the multimodal decode kernels.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: name -> regex. Order matters: longer/more-specific first so e.g. an
#: email is redacted as one token before the digit rules see its parts.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ssn_like": r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b",
    "ipv4": r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b",
    "phone_like": r"\+?[0-9][0-9()\- ]{7,}[0-9]",
}


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    patterns: dict[str, str] | None = None,
    replacement: str = "[PII:{name}]",
    out_col: str | None = None,
) -> DataFrame:
    """Scrub ``patterns`` from ``text_col`` and count hits per pattern.

    Adds ``redacted_<name>`` count columns (pre-redaction occurrence
    counts on the original text, for audit/filter decisions) and writes
    the scrubbed text to ``out_col`` (default: in place).
    ``replacement`` may reference ``{name}`` to keep redactions typed —
    typed placeholders preserve the token-count shape for downstream
    budget estimates.
    """
    from bigdata_covid19_real_time_spark.operators.fanout import fan_out_scan

    patterns = PII_PATTERNS if patterns is None else patterns
    out_col = out_col or text_col
    # scale-adaptive fan-out (no-op on session-parallel/derived inputs):
    # the per-pattern regex scans are a multi-second single-task map on
    # under-split scans
    df = fan_out_scan(df)
    counts = {
        f"redacted_{name}": F.regexp_count(F.col(text_col), F.lit(rx))
        for name, rx in patterns.items()
    }
    scrubbed = F.col(text_col)
    for name, rx in patterns.items():
        scrubbed = F.regexp_replace(scrubbed, rx, replacement.format(name=name))
    return df.withColumns(counts).withColumn(out_col, scrubbed)
