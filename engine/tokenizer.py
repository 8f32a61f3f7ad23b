"""Pinned analyzer: NFKC normalize → lowercase → UAX#29-subset word break.

Targets the documented semantics of the Elasticsearch `standard` analyzer
(UAX#29 word boundaries, lowercase filter, 255-char max token, no stopwords
by default) [public: ES standard analyzer docs]. Full ICU UAX#29 is not
available offline, so the word-break rule is a pinned, documented subset
(SURVEY.md §7 risk 2):

  * a token is a maximal run of Unicode word characters (letters, digits,
    marks — Python regex ``[^\\W_]`` semantics) excluding CJK ideographs;
  * each CJK ideograph is its own token (Lucene StandardTokenizer emits
    unigrams for Han [public]);
  * tokens longer than 255 chars are dropped;
  * text is NFKC-normalized and lowercased first.

The golden fixtures (tests/oracle_bm25.py) use this same function, making
rank-identity internally consistent (no live ES in the sandbox).

Both a plain-Python form (driver-side query analysis, oracle) and a
vectorized pandas_udf form (refine stage) are provided.
"""

from __future__ import annotations

import re
import unicodedata

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

MAX_TOKEN_LEN = 255

_CJK = "㐀-䶿一-鿿豈-﫿"
# one CJK ideograph OR a run of word chars that are not underscore/CJK
TOKEN_RE = re.compile(rf"[{_CJK}]|[^\W_{_CJK}]+", re.UNICODE)


def normalize(text: str) -> str:
    """NFKC + lowercase (B2)."""
    return unicodedata.normalize("NFKC", text).lower()


def tokenize(text: str) -> list[str]:
    """Analyze one string → token list (B2 + B3). Pure-Python reference form."""
    if text is None:
        return []
    toks = TOKEN_RE.findall(normalize(text))
    return [t for t in toks if len(t) <= MAX_TOKEN_LEN]


@F.pandas_udf(T.ArrayType(T.StringType()))
def tokenize_udf(s: pd.Series) -> pd.Series:
    """Vectorized analyzer: pandas .str ops, Arrow-batched (BASELINE.json:15)."""
    norm = s.fillna("").str.normalize("NFKC").str.lower()
    toks = norm.str.findall(TOKEN_RE)
    return toks.map(lambda ts: [t for t in ts if len(t) <= MAX_TOKEN_LEN])


@F.pandas_udf(T.StringType())
def normalize_udf(s: pd.Series) -> pd.Series:
    """Vectorized NFKC + lowercase (B2)."""
    return s.str.normalize("NFKC").str.lower()


_TC_SCHEMA = T.StructType(
    [
        T.StructField("terms", T.ArrayType(T.StringType())),
        T.StructField("tfs", T.ArrayType(T.IntegerType())),
    ]
)


@F.pandas_udf(_TC_SCHEMA)
def term_counts_udf(s: pd.Series) -> pd.Series:
    """Analyzer + per-doc term counting fused in one Arrow pass (the
    map-side combiner): same pinned tokenization as tokenize_udf, then a
    C-speed Counter per doc. Returns parallel (terms, tfs) arrays — struct
    of two arrays, NOT array of structs, so no per-entry Python dicts cross
    the Arrow boundary."""
    from collections import Counter

    norm = s.fillna("").str.normalize("NFKC").str.lower()
    toks = norm.str.findall(TOKEN_RE)
    terms, tfs = [], []
    for ts in toks:
        c = Counter(t for t in ts if len(t) <= MAX_TOKEN_LEN)
        terms.append(list(c.keys()))
        tfs.append(list(c.values()))
    # StructType scalar UDFs return a DataFrame (one column per field)
    return pd.DataFrame({"terms": terms, "tfs": tfs}, index=toks.index)
