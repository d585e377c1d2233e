"""PII detection and redaction over a document stream.

A training-data hygiene stage the reference has no counterpart for
(SURVEY.md §2.8): counts and redacts email addresses, NANP-style
phone numbers and IPv4 literals.  The patterns are deliberately
simple character-class regexes with identical semantics under
Python ``re`` and DuckDB's RE2 (no lookaround, no unicode classes,
no word boundaries), so the SQL oracle mirrors the engine
byte-for-byte: counts via ``len(regexp_extract_all(...))``,
redaction via chained ``regexp_replace(..., 'g')`` in the same
email → phone → ip order.

Scale shape: one stateful actor-pool ``map_batches`` pass — regexes
compiled once per worker in ``__init__``, counting and replacement in
pandas' C string kernels, no shuffle, Dataset in / Dataset out.
"""

from __future__ import annotations

import re

import pandas as pd
import ray.data

from pgd_ray.util import bound_cls

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"[0-9]{3}-[0-9]{3}-[0-9]{4}"
IPV4_RE = r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}"

EMAIL_TOKEN = "[EMAIL]"
PHONE_TOKEN = "[PHONE]"
IP_TOKEN = "[IP]"


class _PIIScan:
    """Per-worker compiled patterns; per-batch vectorized count +
    chained redaction (email first: its pattern can contain digits
    and dots that the later patterns must not re-match)."""

    def __init__(self, redact: bool):
        self.redact = redact
        self.email = re.compile(EMAIL_RE, re.ASCII)
        self.phone = re.compile(PHONE_RE, re.ASCII)
        self.ip = re.compile(IPV4_RE, re.ASCII)

    def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
        text = b["text"].fillna("")
        out = {
            "doc_id": b["doc_id"],
            "n_emails": text.str.count(self.email).astype("int64"),
            "n_phones": text.str.count(self.phone).astype("int64"),
            "n_ips": text.str.count(self.ip).astype("int64"),
        }
        if self.redact:
            clean = text.str.replace(self.email, EMAIL_TOKEN, regex=True)
            clean = clean.str.replace(self.phone, PHONE_TOKEN, regex=True)
            clean = clean.str.replace(self.ip, IP_TOKEN, regex=True)
            out["clean_text"] = clean
        return pd.DataFrame(out)


def pii_scan(
    docs: ray.data.Dataset,
    redact: bool = True,
    concurrency=(1, 16),
    batch_size: int = 4096,
) -> ray.data.Dataset:
    """Columns (doc_id, n_emails, n_phones, n_ips[, clean_text])."""
    return docs.select_columns(["doc_id", "text"]).map_batches(
        bound_cls(_PIIScan, redact=redact), batch_format="pandas",
        batch_size=batch_size, concurrency=concurrency,
    )
