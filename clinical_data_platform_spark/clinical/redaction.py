"""PHI redaction / tokenization as column operators.

Parity with security/phi_redaction.py:10-41 (salted SHA-256, HMAC
tokenization, date shifting) and compliance/phi_redaction.py:14-44 (regex
battery -> [REDACTED]). Everything except HMAC is a JVM builtin; HMAC has
no Spark builtin, so it's an Arrow-batched pandas UDF — acceptable off the
hot path (tokenization is a one-time transform per column).
"""

from __future__ import annotations

import pandas as pd  # noqa: F401  (pandas_udf type-hint resolution)
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

REDACTION_TOKEN = "[REDACTED]"

# Same pattern battery as compliance/phi_redaction.py:_PATTERNS (Java regex
# dialect; the lookahead-based MRN pattern is ported as-is).
PHI_PATTERNS = [
    r"\b\d{3}-\d{2}-\d{4}\b",                                   # SSN
    r"\b\d{9}\b",                                               # bare 9-digit id
    r"(?i)\b[a-z0-9]{6,12}\b(?=.*\bmrn\b)",                     # MRN (lookahead)
    r"\b(?:\+?1[-.\s]?)?\(?\d{3}\)?[-.\s]\d{3}[-.\s]\d{4}\b",   # phone
    r"\b[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}\b",      # email
    r"\b\d{4}-\d{2}-\d{2}\b",                                   # ISO date
    r"\b\d{1,2}/\d{1,2}/\d{2,4}\b",                             # US date
    r"(?i)(name|patient|first_name|last_name)\s*=\s*[^,;]+",    # kv leaks
]


def redact_text(col: Column) -> Column:
    """Chained regexp_replace over the PHI battery — one codegen stage."""
    out = col
    for pat in PHI_PATTERNS:
        out = F.regexp_replace(out, pat, REDACTION_TOKEN)
    return out


def redact_columns(df: DataFrame, columns: list[str]) -> DataFrame:
    for c in columns:
        df = df.withColumn(c, redact_text(F.col(c)))
    return df


def irreversible_hash(col: Column, salt: str) -> Column:
    """Salted SHA-256 (phi_redaction.py:10-15): sha256(salt || value)."""
    return F.sha2(F.concat(F.lit(salt), col), 256)


def tokenize_column(df: DataFrame, column: str, key: str) -> DataFrame:
    """Deterministic reversible HMAC tokenization (phi_redaction.py:18-37).
    Pandas UDF: no HMAC builtin exists; Arrow batching keeps it usable."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _tok(s: "pd.Series") -> "pd.Series":
        import base64
        import hashlib
        import hmac as hmac_mod

        def one(v):
            if v is None:
                return None
            mac = hmac_mod.new(key.encode(), v.encode(), hashlib.sha256).digest()
            return base64.urlsafe_b64encode(mac + b"::" + v.encode()).decode("ascii")

        return s.map(one)

    return df.withColumn(column, _tok(F.col(column)))


def detokenize_value(token: str, key: str) -> str | None:
    """Driver-side inverse (round-trip tests)."""
    import base64
    import hashlib
    import hmac as hmac_mod

    try:
        raw = base64.urlsafe_b64decode(token.encode("ascii"))
        mac, _, value = raw.partition(b"::")
        expected = hmac_mod.new(key.encode(), value, hashlib.sha256).digest()
        return value.decode() if hmac_mod.compare_digest(mac, expected) else None
    except Exception:
        return None


def shift_dates(df: DataFrame, column: str, days: int) -> DataFrame:
    """Date-shift de-identification (phi_redaction.py:40-41)."""
    return df.withColumn(column, F.date_add(F.col(column), days))


def redact_text_str(value: str) -> str:
    """Driver-side string redaction (log/error scrubbing — the non-column
    twin of redact_text, compliance/phi_redaction.py:26-44). Java and
    Python regex dialects agree for this battery."""
    import re

    if not isinstance(value, str):
        return value
    out = value
    for pat in PHI_PATTERNS:
        out = re.sub(pat, REDACTION_TOKEN, out)
    return out
