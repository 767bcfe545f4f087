"""M10 — domain-knowledge injection into serialized text, model-free.

Re-expresses the reference's spaCy-based DK injector
(``vendor/FAIR-DA4ER/ditto/ditto_light/knowledge.py:53-160``) with the
same output grammar — entity tags inserted *before* the token, numbers
canonicalized in place, long digit-bearing tokens prefixed ``ID`` — but
driven by deterministic regex/heuristic rules instead of a 700 MB NER
model (not shippable to executors here, and a per-row spaCy call is
exactly the kind of Python hot loop a 100 TB pipeline cannot afford).
The transform is a single Catalyst expression chain:
``split → transform(token → array<token'>) → flatten → array_join`` —
whole-stage codegen, zero Python per row, and SQL-portable (the DuckDB
oracle runs the identical rules).

Rules, in the reference's evaluation order (knowledge.py:86-105):

1. structure tokens ``COL``/``VAL``/``[SEP]``/``[CLS]`` pass through;
2. date-shaped tokens (``YYYY-MM-DD`` / ``YYYY/MM/DD``) → ``DATE <tok>``
   (stand-in for the spaCy DATE span tag);
3. pure numbers → whole values as integers, fractional as ``%.2f``
   (knowledge.py:91-98 ``like_num`` branch);
4. tokens of length ≥ 7 containing a digit → ``ID <tok>``
   (knowledge.py:100-102);
5. Capitalized words → ``PRODUCT <tok>`` (stand-in for the
   NORP/GPE/LOC/PERSON/PRODUCT span tags; no-op on lowercased
   pipeline text, fires on raw source text);
6. everything else passes through.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["inject_domain_knowledge"]

_STRUCTURE = ("COL", "VAL", "[SEP]", "[CLS]")
_DATE_RE = r"^\d{4}[-/]\d{1,2}[-/]\d{1,2}$"
_NUM_RE = r"^\d+(\.\d+)?$"
_LONG_ID_RE = r"^(?=.{7,})(?=.*\d).*$"
_CAP_RE = r"^[A-Z][a-z]"


def _transform_token(t: Column) -> Column:
    """token -> array of output tokens (tag + token, or normalized token).

    try_cast + the 15-char cap keep ANSI mode safe: a >15-digit token
    would overflow the double→long cast (ANSI throws); such tokens fall
    through to the ``ID`` rule instead, which is where a 16-digit serial
    number belongs anyway.
    """
    num = t.try_cast("double")
    is_whole = num == F.floor(num)
    canon_num = F.when(is_whole, num.cast("long").cast("string")).otherwise(
        F.format_string("%.2f", num)
    )
    return (
        F.when(t.isin(*_STRUCTURE), F.array(t))
        .when(t.rlike(_DATE_RE), F.array(F.lit("DATE"), t))
        .when(t.rlike(_NUM_RE) & (F.length(t) <= 15), F.array(canon_num))
        .when(t.rlike(_LONG_ID_RE), F.array(F.lit("ID"), t))
        .when(t.rlike(_CAP_RE), F.array(F.lit("PRODUCT"), t))
        .otherwise(F.array(t))
    )


def inject_domain_knowledge(c) -> Column:
    """DK-injected copy of a text column (serialized entries or raw text).

    NULL in -> NULL out; empty string -> empty string.
    """
    c = F.col(c) if isinstance(c, str) else c
    out = F.array_join(
        F.flatten(F.transform(F.split(c, r"\s+"), _transform_token)), " "
    )
    return F.when(c.isNull(), F.lit(None).cast("string")).otherwise(out)
