"""Pinned-merges byte-pair encoding for exact token accounting (VERDICT r03
#6; [public: Sennrich et al. 2016, "Neural Machine Translation of Rare Words
with Subword Units"; the GPT-2 encoder applies merges lowest-rank-first]).

The merges table is trained ONCE at import from a literal seed corpus (a
checked-in constant — data-independent of the driver fixtures) and pinned by
tests/test_bpe.py, so the encoder is a pure function of its inputs forever.
No end-of-word marker (pure inner-word BPE) — documented simplification; the
accounting contract is "same merges table ⇒ same counts everywhere",
including the DuckDB oracle, which replays the SAME table via a recursive
CTE (see registry._bpe_*).

Encoding loop (canonical): repeatedly find the lowest-rank adjacent symbol
pair present and merge ALL its occurrences leftmost-first, until no ranked
pair remains. A single left-to-right merge-all pass per chosen pair is
exhaustive: merging (a, b) → ab cannot create a new (a, b) adjacency since
ab is a distinct symbol.

The Spark surface is a scalar pandas UDF over text (Arrow-batched; per-word
results memoized process-wide — web corpora are Zipfian, so the cache hit
rate is ~1 after the first few thousand docs per worker)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

# literal seed corpus for the one-time training run: generic high-frequency
# English words with counts (NOT derived from any fixture). Changing this
# constant changes the merges table — tests pin the trained table itself.
SEED_CORPUS: dict[str, int] = {
    "the": 50, "and": 35, "that": 20, "with": 18, "this": 15,
    "table": 12, "stream": 10, "window": 10, "filter": 9, "value": 9,
    "order": 8, "query": 8, "batch": 8, "merge": 7, "index": 7,
    "search": 7, "vector": 6, "column": 6, "string": 6, "number": 5,
    "running": 5, "scanning": 5, "sorting": 5, "joining": 4, "hashing": 4,
    "partition": 4, "shuffle": 4, "cluster": 4, "storage": 3, "writer": 3,
    "reader": 3, "builder": 3, "counter": 3, "pointer": 3, "scatter": 2,
    "gather": 2, "matter": 2, "letter": 2, "better": 2,
}
N_MERGES = 48


def train_bpe(corpus: dict[str, int], n_merges: int) -> list[tuple[str, str]]:
    """Classic BPE training: n_merges most-frequent adjacent pairs, ties
    broken lexicographically (pinned, deterministic)."""
    words = {w: list(w) for w in corpus if len(w) >= 2}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for w, syms in words.items():
            f = corpus[w]
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pairs[p] = pairs.get(p, 0) + f
        if not pairs:
            break
        best = min(pairs, key=lambda p: (-pairs[p], p))
        if pairs[best] < 2:
            break
        merges.append(best)
        a, b = best
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    return merges


MERGES: list[tuple[str, str]] = train_bpe(SEED_CORPUS, N_MERGES)
_RANKS: dict[tuple[str, str], int] = {p: i for i, p in enumerate(MERGES)}

_ENCODE_CACHE: dict[str, int] = {}


def bpe_encode(word: str) -> list[str]:
    """Canonical BPE encode of one word → symbol list."""
    syms = list(word)
    while len(syms) > 1:
        best_rank, best_pair = None, None
        for i in range(len(syms) - 1):
            r = _RANKS.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, (syms[i], syms[i + 1])
        if best_pair is None:
            break
        a, b = best_pair
        out, i = [], 0
        while i < len(syms):
            if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def bpe_word_tokens(word: str) -> int:
    n = _ENCODE_CACHE.get(word)
    if n is None:
        n = len(bpe_encode(word))
        _ENCODE_CACHE[word] = n
    return n


def bpe_token_count(text: str) -> int:
    """Exact BPE token count of a whitespace-split text (pure-Python
    reference form — the oracle generator and tests use this)."""
    return sum(bpe_word_tokens(w) for w in text.split() if w)


@F.pandas_udf(T.LongType())
def bpe_count_udf(s: pd.Series) -> pd.Series:
    """Vectorized exact BPE token counting (Arrow-batched, memoized
    per-word)."""
    return s.fillna("").map(bpe_token_count).astype("int64")


# Symbol delimiter for the SQL replay: the ASCII unit separator, a control
# character that cannot occur in tokenized text (ADVICE r04: ';' was unsafe —
# a word containing ';' broke the (len(state)-len(strip))/2 symbol-count
# formula; the old delimiter was safe only by fixture luck).
SQL_SYM_DELIM = "\x1f"


def bpe_apply_case_sql(state_expr: str) -> str:
    """One canonical-BPE step as a DuckDB expression over a symbol string
    where EVERY symbol is wrapped in SQL_SYM_DELIM (shown as ';' here:
    ';s;;t;;i;;r;'): apply the LOWEST-RANK merge whose pair occurs —
    replace() merges all occurrences leftmost-first, which is exhaustive
    for one pair (see module docstring). Both-side delimiters make matches
    boundary-safe (a terminator-only encoding would let 't;i;' match inside
    ';st;;i;' and would drop every other merge in an 'aaaa' run because the
    shared boundary is consumed); the wrapped replacement ';ab;' restores
    the delimiter for the next occurrence. Iterated to fixpoint by the
    recursive CTE the registry builds around it."""
    D = SQL_SYM_DELIM
    branches = []
    for a, b in MERGES:
        pat = f"{D}{a}{D}{D}{b}{D}"
        rep = f"{D}{a}{b}{D}"
        branches.append(
            f"WHEN contains({state_expr}, '{pat}') "
            f"THEN replace({state_expr}, '{pat}', '{rep}')"
        )
    return "CASE " + " ".join(branches) + f" ELSE {state_expr} END"
