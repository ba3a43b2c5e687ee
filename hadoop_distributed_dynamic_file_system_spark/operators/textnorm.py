"""Unicode text normalization — the cleanup pass every web-scale
corpus runs before dedup/quality (C4/CCNet normalize before hashing:
decomposed accents, control bytes, and whitespace runs otherwise make
byte-identical texts hash differently).

Stages and where they run:
- NFC canonical composition: genuinely not expressible as Catalyst
  expressions, so it is the documented Arrow tier — a vectorized
  pandas_udf over pandas' str.normalize (ICU-grade tables via Python's
  unicodedata, C implementation). Scan-local, no shuffle.
- control-char strip, whitespace collapse, trim: JVM regexp columns.

NOTE: this module intentionally has no `from __future__ import
annotations` — pandas_udf resolves type hints at decoration time and
stringified annotations break it (see operators/udaf.py).

Reference parity: the reference's Text/UTF8 normalization surface is
byte-level only (src/core/org/apache/hadoop/io/Text.java validation);
corpus-grade Unicode canonicalization is part of the additive LLM
family. The regex class below is spelled out explicitly (not `\\s`)
because Java and RE2 disagree on `\\s` (`\\x0B`), and the DuckDB
oracle must match byte for byte.
"""

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

# identical in Java regex and RE2 — the portable whitespace class
WS_CLASS = r"[ \t\n\x0B\f\r]+"
# C0 controls minus whitespace, plus DEL
CTRL_CLASS = r"[\x00-\x08\x0E-\x1F\x7F]"


def unicode_normalize(col: Column, form: str = "NFC") -> Column:
    """NFC/NFKC/NFD/NFKD canonicalization of a string column (fresh
    pandas_udf per call: a module-level udf would capture a
    SparkSession at import time)."""

    @pandas_udf("string")
    def norm(s: pd.Series) -> pd.Series:
        return s.str.normalize(form)

    return norm(col)


def clean_text(
    df: DataFrame,
    text_col: str,
    out_col: str = "clean_text",
    form: str = "NFC",
) -> DataFrame:
    """NFC-compose, strip control bytes, collapse whitespace runs to a
    single space, trim. Scan-local: the plan is one Arrow projection
    followed by JVM regexps — no shuffle, so at 100 TB this is a pure
    map stage pipelined into whatever follows."""
    c = unicode_normalize(F.col(text_col), form)
    c = F.regexp_replace(c, CTRL_CLASS, "")
    c = F.regexp_replace(c, WS_CLASS, " ")
    return df.withColumn(out_col, F.trim(c))


# portable char classes (Java regex and RE2 agree on every one)
_CLASS_RES = {
    "letter": r"[A-Za-z]",
    "digit": r"[0-9]",
    "space": r"[ \t\n\x0B\f\r]",
    "nonascii": r"[^\x00-\x7F]",
}


def script_profile(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document character-class profile: fractions of ASCII
    letters, digits, whitespace, non-ASCII, and (by remainder) ASCII
    punctuation/symbols — the cheap charset/script diagnostic a crawl
    pipeline uses to route documents (binary-ish payloads spike the
    punctuation residue, non-Latin scripts spike nonascii_frac,
    boilerplate code spikes digits+punct).

    Counting is `length(text) − length(regexp_replace(text, class,
    ''))` per class — pure codegen regexps over one scan, no shuffle,
    and the identical expression runs in the DuckDB oracle (the
    classes avoid `\\s`/`\\w`, where Java and RE2 disagree).
    Zero-length documents are absent (n-gram family convention)."""
    t = F.col(text_col)
    n = F.length(t)

    def frac(cls: str) -> Column:
        kept = n - F.length(F.regexp_replace(t, _CLASS_RES[cls], ""))
        return F.round(kept / n.cast("double"), 6)

    out = df.filter(n > 0).select(
        F.col(id_col),
        n.cast("bigint").alias("n_chars"),
        frac("letter").alias("letter_frac"),
        frac("digit").alias("digit_frac"),
        frac("space").alias("space_frac"),
        frac("nonascii").alias("nonascii_frac"),
    )
    other = F.round(
        F.lit(1.0)
        - F.col("letter_frac")
        - F.col("digit_frac")
        - F.col("space_frac")
        - F.col("nonascii_frac"),
        6,
    )
    return out.withColumn("other_frac", other)


# ------------------------------------------------------------- mojibake
# UTF-8 bytes misdecoded as Latin-1 leave a distinctive fingerprint:
# 'Ã'/'Â' followed by a continuation-range character, or the 'â€¦'
# family (misdecoded punctuation). Detection is a portable regexp
# count; repair is the inverse transcode (encode back to Latin-1
# bytes, decode as UTF-8), which is exact whenever the text really
# was double-decoded.
MOJIBAKE_RX = "(Ã.|Â.|â€.)"


def mojibake_count(col: Column) -> Column:
    """Number of suspicious double-decoded sequences in the text —
    the encoding-hygiene signal a crawl pipeline thresholds before
    deciding to transcode. Scan-local regexp count."""
    return F.regexp_count(col, F.lit(MOJIBAKE_RX))


def repair_mojibake(col: Column) -> Column:
    """Inverse transcode for UTF-8-misdecoded-as-Latin-1 text:
    re-encode the characters as Latin-1 bytes and decode those bytes
    as UTF-8. Exact inverse when the damage really was one Latin-1
    double-decode of Latin-1-RANGE codepoints; CP1252-specific damage
    (the 'â€¦' family, whose '€' has no ISO-8859-1 byte) is flagged by
    the detector but not invertible with the JVM's supported charset
    set. Applied unconditionally it would corrupt genuine
    Latin-1-range characters, so callers gate on mojibake_count > 0
    (see mojibake_stats). JVM charset kernels, zero Python."""
    return F.decode(F.encode(col, "ISO-8859-1"), "UTF-8")


def mojibake_repaired(
    df: DataFrame, id_col: str, text_col: str, min_hits: int = 1
) -> DataFrame:
    """Per-row gated repair: rows whose mojibake_count >= min_hits AND
    whose transcode is provably safe are repaired; everything else
    passes through unchanged (repaired = 0). Two crash modes the
    detector alone would admit are excluded per row (review-r6
    finding — one bad document must never kill a corpus-wide hygiene
    pass):

    - text containing codepoints above U+00FF ('â€¦'-family CP1252
      damage, or genuine non-Latin text): ISO-8859-1 ENCODE raises
      MALFORMED_CHARACTER_CODING under ANSI mode — gated by a
      Latin-1-range rlike, and the encode itself only evaluates
      inside that CaseWhen branch (branch evaluation is lazy;
      a bare AND could be CSE'd eagerly);
    - Latin-1 text that merely LOOKS damaged ('NÃO'): its re-encoded
      bytes are not valid UTF-8, so DECODE would raise — gated by
      is_valid_utf8 on the branch-guarded bytes (NULL bytes → NULL
      condition → fall through to the unrepaired branch).

    Output: id, n_mojibake, repaired (int flag — 1 only when the
    transcode actually ran), text."""
    n = mojibake_count(F.col(text_col))
    latin1_only = F.col(text_col).rlike(r"^[\x00-\xff]*$")
    safe_bytes = F.when(
        (n >= F.lit(min_hits)) & latin1_only,
        F.encode(F.col(text_col), "ISO-8859-1"),
    )
    can_repair = F.coalesce(F.is_valid_utf8(safe_bytes), F.lit(False))
    return df.select(
        F.col(id_col),
        n.alias("n_mojibake"),
        can_repair.cast("int").alias("repaired"),
        F.when(can_repair, F.decode(safe_bytes, "UTF-8"))
        .otherwise(F.col(text_col))
        .alias("text"),
    )
