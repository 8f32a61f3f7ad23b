"""Nested boolean query trees + relevance combinators (SURVEY.md §2.D tail:
ES `bool` with nested must/should/must_not/filter and per-clause
minimum_should_match, `dis_max`, `constant_score`, `boosting`
[public: ES query DSL docs; Lucene BooleanQuery/DisjunctionMaxQuery]).

Two evaluators, required to agree:

* **score_tree** — DataFrame composition over per-(doc, term) BM25 partials
  (`search.score_terms` output): each node is a join/aggregate shape, all
  JVM-side, DuckDB-oracle-checkable. Clause frames always carry ONE row per
  matching doc, so Bool is inner-joins (must) + one hash aggregate (should)
  + anti-joins (must_not) — no windows, no explode.
* **eval_tree** — the per-document kernel the index path's WAND loop calls
  (engine/wand.py wand_tree_topk): given which leaf terms matched a doc and
  their partial scores, walk the tree once. Trees are tiny; the per-doc cost
  is O(nodes).

ES scoring semantics implemented [public ES docs]:
  bool: score = Σ must scores + Σ matching-should scores; filter/must_not
  contribute 0; a should sub-clause that fails its own minimum_should_match
  contributes nothing; with no must/filter, at least max(1, min_should)
  should clauses must match.
  dis_max: max of clause scores + tie_breaker · (sum − max of the rest).
  constant_score: boost for every doc matching the filter.
  boosting: positive score, multiplied by negative_boost when the negative
  clause also matches (down-rank, not exclude).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .search import score_terms
from .tokenizer import tokenize


@dataclass(frozen=True)
class Term:
    term: str


@dataclass(frozen=True)
class Bool:
    must: tuple = ()
    should: tuple = ()
    must_not: tuple = ()
    filter: tuple = ()
    min_should: int | None = None  # None → ES default (1 iff no must/filter)

    def effective_min_should(self) -> int:
        if self.min_should is not None:
            # a pure-should bool can't match on zero clauses (ES never
            # returns the whole corpus for it) — clamp explicit 0 up to 1
            if not self.must and not self.filter:
                return max(1, self.min_should)
            return self.min_should
        return 1 if (not self.must and not self.filter) else 0


@dataclass(frozen=True)
class DisMax:
    clauses: tuple
    tie_breaker: float = 0.0


@dataclass(frozen=True)
class ConstantScore:
    filter: "Term | Bool | DisMax | ConstantScore | Boosting"
    boost: float = 1.0


@dataclass(frozen=True)
class Boosting:
    positive: "Term | Bool | DisMax | ConstantScore | Boosting"
    negative: "Term | Bool | DisMax | ConstantScore | Boosting"
    negative_boost: float = 0.5


@dataclass(frozen=True)
class DocSet:
    """Opaque doc-id membership leaf, resolved from the `docsets` dict passed
    to score_tree — for predicates the per-term partial frame can't express
    (phrase adjacency from simple_query_string). Scores 0.0 (filter-context
    semantics); exact path only (is_pure_bool → False keeps it off WAND)."""

    name: str


@dataclass(frozen=True)
class Boost:
    """Score multiplier on a subtree — the `clause^N` boost of the Lucene
    query_string grammar / the `boost` parameter of every ES query clause.
    Match semantics are the child's; only the score scales. Exact path only
    (a boost > 1 breaks the Σ-of-leaf-partials WAND bound, so is_pure_bool
    stays False and the tree routes through score_tree)."""

    node: "Node"
    factor: float = 1.0


Node = Term | Bool | DisMax | ConstantScore | Boosting | DocSet | Boost


def term(s: str) -> Term:
    """Analyzed single-token leaf (same analyzer as indexing, D1)."""
    toks = tokenize(s)
    if len(toks) != 1:
        raise ValueError(f"Term leaf must analyze to one token: {s!r} -> {toks}")
    return Term(toks[0])


def collect_leaves(node: Node, negated: bool = False) -> tuple[set[str], set[str]]:
    """(positive-context terms, negated-context terms). A term is
    positive-context when its match can CONTRIBUTE to a doc matching/scoring
    (must/should/filter/dis_max clause/constant_score filter/boosting either
    side — boosting.negative only modifies score, candidates still come from
    positive), negated-context when it appears under a must_not. A term can
    be both."""
    pos: set[str] = set()
    neg: set[str] = set()

    def add(n: Node, under_not: bool) -> None:
        if isinstance(n, Term):
            (neg if under_not else pos).add(n.term)
        elif isinstance(n, Bool):
            for c in n.must + n.should + n.filter:
                add(c, under_not)
            for c in n.must_not:
                add(c, not under_not)
        elif isinstance(n, DisMax):
            for c in n.clauses:
                add(c, under_not)
        elif isinstance(n, ConstantScore):
            add(n.filter, under_not)
        elif isinstance(n, Boosting):
            add(n.positive, under_not)
            # the negative side only scales score — its terms must be
            # readable (a cursor exists) but never drive candidates
            add(n.negative, True)
        elif isinstance(n, Boost):
            add(n.node, under_not)
        elif isinstance(n, DocSet):
            pass  # membership leaf: no terms to read
        else:
            raise TypeError(f"unknown query node: {n!r}")

    add(node, negated)
    return pos, neg


def scoring_multiplicity(node: Node) -> dict[str, int]:
    """term → number of SCORING-context occurrences (paths from the root
    through must/should edges only; filter and must_not cut the path — their
    leaves can never add score). A doc's tree score is ≤
    Σ_t mult[t] · partial[t]: each Term evaluation in a scoring context
    contributes that leaf's partial at most once, and there are exactly
    mult[t] such evaluations. This is the sound per-cursor weight for the
    WAND pruning bound — a term repeated across clauses (ES scores each
    clause separately) counts once PER CLAUSE, not once."""
    out: dict[str, int] = {}

    def walk(n: Node) -> None:
        if isinstance(n, Term):
            out[n.term] = out.get(n.term, 0) + 1
        elif isinstance(n, Bool):
            for c in n.must + n.should:
                walk(c)
        # DisMax/ConstantScore/Boosting never reach the WAND path

    walk(node)
    return out


def is_pure_bool(node: Node) -> bool:
    """True when the tree is Bool/Term only — the shape the block-max WAND
    path supports with a sound Σ-of-leaf-bounds pruning bound (any bool
    score is ≤ the sum of its matched positive leaves' partials; dis_max /
    constant_score / boosting break that bound and run on the exact path)."""
    if isinstance(node, Term):
        return True
    if isinstance(node, Bool):
        return all(
            is_pure_bool(c)
            for c in node.must + node.should + node.must_not + node.filter
        )
    return False


# ---------------------------------------------------------------------------
# per-document kernel (index/WAND path)


def eval_tree(
    node: Node, matched: dict[str, bool], partial: dict[str, float]
) -> tuple[bool, float]:
    """One doc's (matches?, score) under the tree, given per-term match flags
    and BM25 partials (idf · tf-norm) for the terms present in the doc."""
    if isinstance(node, Term):
        return bool(matched.get(node.term)), partial.get(node.term, 0.0)
    if isinstance(node, Bool):
        score = 0.0
        for c in node.must:
            ok, s = eval_tree(c, matched, partial)
            if not ok:
                return False, 0.0
            score += s
        for c in node.filter:
            ok, _ = eval_tree(c, matched, partial)
            if not ok:
                return False, 0.0
        for c in node.must_not:
            ok, _ = eval_tree(c, matched, partial)
            if ok:
                return False, 0.0
        n_should = 0
        for c in node.should:
            ok, s = eval_tree(c, matched, partial)
            if ok:
                n_should += 1
                score += s
        if n_should < node.effective_min_should():
            return False, 0.0
        return True, score
    if isinstance(node, DisMax):
        best, total, any_ok = 0.0, 0.0, False
        for c in node.clauses:
            ok, s = eval_tree(c, matched, partial)
            if ok:
                any_ok = True
                best = max(best, s)
                total += s
        if not any_ok:
            return False, 0.0
        return True, best + node.tie_breaker * (total - best)
    if isinstance(node, ConstantScore):
        ok, _ = eval_tree(node.filter, matched, partial)
        return ok, (node.boost if ok else 0.0)
    if isinstance(node, Boosting):
        ok, s = eval_tree(node.positive, matched, partial)
        if not ok:
            return False, 0.0
        neg_ok, _ = eval_tree(node.negative, matched, partial)
        return True, s * (node.negative_boost if neg_ok else 1.0)
    if isinstance(node, Boost):
        ok, s = eval_tree(node.node, matched, partial)
        return ok, s * node.factor if ok else 0.0
    raise TypeError(f"unknown query node: {node!r}")


# ---------------------------------------------------------------------------
# DataFrame composition (exact path)


def _score_node(
    parts: DataFrame, node: Node, docsets: dict[str, DataFrame] | None = None
) -> DataFrame:
    """(doc_id, score) — one row per doc matching `node`. `parts` is the
    per-(doc_id, term, partial) frame covering every leaf term; `docsets`
    resolves DocSet leaves to doc-id frames."""
    if isinstance(node, Term):
        return parts.filter(F.col("term") == node.term).select(
            "doc_id", F.col("partial").alias("score")
        )
    if isinstance(node, DocSet):
        if not docsets or node.name not in docsets:
            raise ValueError(f"unresolved DocSet leaf: {node.name!r}")
        return docsets[node.name].select("doc_id", F.lit(0.0).alias("score"))
    if isinstance(node, Bool):
        base: DataFrame | None = None
        for i, c in enumerate(node.must):
            f = _score_node(parts, c, docsets).select("doc_id", F.col("score").alias(f"_m{i}"))
            base = f if base is None else base.join(f, "doc_id")
        base_score = (
            sum(F.col(f"_m{i}") for i in range(len(node.must)))
            if node.must
            else F.lit(0.0)
        )
        for c in node.filter:
            base_f = _score_node(parts, c, docsets).select("doc_id")
            base = base_f if base is None else base.join(base_f, "doc_id", "left_semi")
        m = node.effective_min_should()
        if node.should:
            sh = None
            for c in node.should:
                f = _score_node(parts, c, docsets)
                sh = f if sh is None else sh.unionByName(f)
            sh_agg = sh.groupBy("doc_id").agg(
                F.sum("score").alias("_ss"), F.count("*").alias("_ns")
            )
            if base is None:
                out = sh_agg.filter(F.col("_ns") >= m).select(
                    "doc_id", F.col("_ss").alias("score")
                )
            else:
                joined = base.join(sh_agg, "doc_id", "left")
                if m > 0:
                    joined = joined.filter(F.coalesce(F.col("_ns"), F.lit(0)) >= m)
                out = joined.select(
                    "doc_id",
                    (base_score + F.coalesce(F.col("_ss"), F.lit(0.0))).alias("score"),
                )
        else:
            if base is None:
                raise ValueError("Bool with no positive clauses cannot match")
            out = base.select("doc_id", base_score.alias("score"))
        for c in node.must_not:
            out = out.join(_score_node(parts, c, docsets).select("doc_id"), "doc_id", "left_anti")
        return out
    if isinstance(node, DisMax):
        u = None
        for c in node.clauses:
            f = _score_node(parts, c, docsets)
            u = f if u is None else u.unionByName(f)
        return u.groupBy("doc_id").agg(
            (
                F.max("score")
                + F.lit(node.tie_breaker) * (F.sum("score") - F.max("score"))
            ).alias("score")
        )
    if isinstance(node, ConstantScore):
        return _score_node(parts, node.filter, docsets).select(
            "doc_id", F.lit(float(node.boost)).alias("score")
        )
    if isinstance(node, Boosting):
        p = _score_node(parts, node.positive, docsets)
        nm = _score_node(parts, node.negative, docsets).select(
            "doc_id", F.lit(1).alias("_neg")
        )
        return p.join(nm, "doc_id", "left").select(
            "doc_id",
            (
                F.col("score")
                * F.when(F.col("_neg").isNotNull(), F.lit(node.negative_boost))
                .otherwise(F.lit(1.0))
            ).alias("score"),
        )
    if isinstance(node, Boost):
        return _score_node(parts, node.node, docsets).select(
            "doc_id", (F.col("score") * F.lit(float(node.factor))).alias("score")
        )
    raise TypeError(f"unknown query node: {node!r}")


def score_tree(
    tf: DataFrame,
    doc_stats: DataFrame,
    term_stats: DataFrame,
    n_docs: int,
    avgdl: float,
    tree: Node,
    docsets: dict[str, DataFrame] | None = None,
) -> DataFrame:
    """Exact-path tree scorer → (doc_id, score), one row per matching doc.
    ONE pruned tf scan covers every leaf term (the per-term partial frame is
    shared across all branches); each tree node adds a join/aggregate.
    docsets resolves DocSet membership leaves (phrase adjacency sets)."""
    pos, neg = collect_leaves(tree)
    terms = sorted(pos | neg)
    if not terms:
        if docsets:
            # filter-only query (e.g. a pure `field:value` query_string):
            # no Term leaf needs partials, so _score_node walks the tree
            # over the DocSet frames alone — matches score 0.0 (Lucene
            # filter context), never silently-empty
            empty = tf.sparkSession.createDataFrame(
                [], "doc_id long, term string, partial double"
            )
            return _score_node(empty, tree, docsets)
        return tf.sparkSession.createDataFrame([], "doc_id long, score double")
    parts = score_terms(tf, doc_stats, term_stats, n_docs, avgdl, terms)
    return _score_node(parts, tree, docsets)


def tree_search(
    tf: DataFrame,
    doc_stats: DataFrame,
    term_stats: DataFrame,
    n_docs: int,
    avgdl: float,
    tree: Node,
    k: int = 10,
    round_to: int | None = 4,
    docsets: dict[str, DataFrame] | None = None,
) -> DataFrame:
    """Exact top-k under a query tree — the tree analog of search.exact_search
    (score DESC, doc_id ASC; rounded for driver-hash stability)."""
    scored = score_tree(tf, doc_stats, term_stats, n_docs, avgdl, tree, docsets)
    score_col = (
        F.round(F.col("score"), round_to) if round_to is not None else F.col("score")
    )
    return (
        scored.select("doc_id", score_col.alias("score"))
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(k)
    )


def msearch_trees(
    tf: DataFrame,
    doc_stats: DataFrame,
    term_stats: DataFrame,
    n_docs: int,
    avgdl: float,
    specs: dict[str, Node],
    k: int = 10,
    round_to: int | None = 4,
    docsets: dict[str, DataFrame] | None = None,
) -> DataFrame:
    """ES `_msearch`: N heterogeneous queries answered in ONE pass [public:
    ES multi-search API]. The union of every query's leaf terms prunes a
    SINGLE tf scan into one shared per-(doc, term) partial frame; each
    query then composes its own join/aggregate shape over that frame and
    contributes its top-k under a qid label. At scale this turns N scans
    into one — the exact-path analog of the batched WAND path
    (searcher.search_batch), with the same amortization argument.

    Returns (qid, doc_id, score) ordered by qid, score DESC, doc_id ASC."""
    all_terms: set[str] = set()
    for tree in specs.values():
        pos, neg = collect_leaves(tree)
        all_terms |= pos | neg
    if not all_terms:
        return tf.sparkSession.createDataFrame(
            [], "qid string, doc_id long, score double"
        )
    parts = score_terms(
        tf, doc_stats, term_stats, n_docs, avgdl, sorted(all_terms)
    )
    out: DataFrame | None = None
    for qid in sorted(specs):
        scored = _score_node(parts, specs[qid], docsets)
        score_col = (
            F.round(F.col("score"), round_to)
            if round_to is not None
            else F.col("score")
        )
        top = (
            scored.select(
                F.lit(qid).alias("qid"), "doc_id", score_col.alias("score")
            )
            .orderBy(F.col("score").desc(), F.col("doc_id").asc())
            .limit(k)
        )
        out = top if out is None else out.unionByName(top)
    return out.orderBy("qid", F.col("score").desc(), F.col("doc_id").asc())
