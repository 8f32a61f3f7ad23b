"""ES ingest-pipeline processors compiled to Catalyst column transforms
(SURVEY.md §2.D: ingest surface) [public: ES ingest pipeline / processor
reference].

An ES ingest pipeline is an ordered list of processors applied to every
document before indexing. The expression-shaped subset maps 1:1 onto
Catalyst `Column` transforms — the whole pipeline compiles into ONE
projection over the input (Catalyst collapses the chained withColumns), so
at 100 TB it is a zero-shuffle, whole-stage-codegen map with no UDF
anywhere. Processors needing a runtime the sandbox lacks are explicit
divergences: `script` (Painless) raises, `inference` is out of scope;
conditional `if` accepts a Spark SQL boolean expression instead of a
Painless snippet (pinned divergence, documented).

Supported processors (config keys follow the ES reference):
  set, copy (set+copy_from), rename, remove, convert, lowercase, uppercase,
  trim, gsub, split, join, append, csv, date, dissect, grok, fingerprint,
  drop, enrich.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .esql import _compile_dissect, _compile_grok

_CONVERT_TYPES = {
    "integer": "int",
    "long": "long",
    "float": "float",
    "double": "double",
    "string": "string",
    "boolean": "boolean",
}


def apply_pipeline(
    df: DataFrame,
    processors: list[dict],
    resolve: Callable[[str], DataFrame] | None = None,
) -> DataFrame:
    """Apply an ES-style ingest pipeline (ordered processor list) to `df`.

    Each element is {processor_type: config}, exactly the ES JSON shape.
    `resolve(table)` supplies enrich lookup tables (broadcast; the ES enrich
    index is small by contract). Unknown processors raise — never misparse.
    """
    for step in processors:
        if len(step) != 1:
            raise ValueError(f"ingest: each step is one processor, got {step}")
        (kind, cfg), = step.items()
        if "if" in cfg:
            # pinned divergence: the condition is a Spark SQL boolean
            # expression over the row, not Painless
            cond = F.expr(cfg["if"])
        else:
            cond = None
        if kind == "drop":
            if cond is None:
                raise ValueError("ingest: drop without `if` drops everything")
            df = df.where(~cond)
            continue
        df = _apply_one(df, kind, cfg, cond, resolve)
    return df


def _guard(df, field, col, cond):
    """Apply `col` to `field`, keeping the old value where `cond` is false."""
    if cond is None:
        return df.withColumn(field, col)
    old = F.col(field) if field in df.columns else F.lit(None)
    return df.withColumn(field, F.when(cond, col).otherwise(old))


def _apply_one(df, kind, cfg, cond, resolve):
    if kind == "set":
        val = (
            F.col(cfg["copy_from"]) if "copy_from" in cfg else F.lit(cfg["value"])
        )
        if cfg.get("override", True) is False and cfg["field"] in df.columns:
            val = F.coalesce(F.col(cfg["field"]), val)
        return _guard(df, cfg["field"], val, cond)
    if kind == "rename":
        return df.withColumnRenamed(cfg["field"], cfg["target_field"])
    if kind == "remove":
        fields = cfg["field"]
        return df.drop(*(fields if isinstance(fields, list) else [fields]))
    if kind == "convert":
        t = _CONVERT_TYPES.get(cfg["type"])
        if t is None:
            raise ValueError(f"ingest convert: unsupported type {cfg['type']!r}")
        tgt = cfg.get("target_field", cfg["field"])
        return _guard(df, tgt, F.col(cfg["field"]).cast(t), cond)
    if kind in ("lowercase", "uppercase", "trim"):
        fn = {"lowercase": F.lower, "uppercase": F.upper, "trim": F.trim}[kind]
        tgt = cfg.get("target_field", cfg["field"])
        return _guard(df, tgt, fn(F.col(cfg["field"])), cond)
    if kind == "gsub":
        tgt = cfg.get("target_field", cfg["field"])
        return _guard(
            df, tgt,
            F.regexp_replace(F.col(cfg["field"]), cfg["pattern"], cfg["replacement"]),
            cond,
        )
    if kind == "split":
        tgt = cfg.get("target_field", cfg["field"])
        return _guard(df, tgt, F.split(F.col(cfg["field"]), cfg["separator"]), cond)
    if kind == "join":
        tgt = cfg.get("target_field", cfg["field"])
        return _guard(
            df, tgt, F.array_join(F.col(cfg["field"]), cfg["separator"]), cond
        )
    if kind == "append":
        # ES append: scalar fields become arrays; missing fields start empty
        base = (
            F.col(cfg["field"])
            if cfg["field"] in df.columns
            else F.array().cast("array<string>")
        )
        vals = cfg["value"]
        vals = vals if isinstance(vals, list) else [vals]
        col = F.concat(base, F.array(*[F.lit(v) for v in vals]))
        if not cfg.get("allow_duplicates", True):
            col = F.array_distinct(col)
        return _guard(df, cfg["field"], col, cond)
    if kind == "csv":
        parts = F.split(F.col(cfg["field"]), cfg.get("separator", ","))
        for i, tgt in enumerate(cfg["target_fields"]):
            df = _guard(df, tgt, F.element_at(parts, i + 1), cond)
        return df
    if kind == "date":
        # ES date processor: first matching format wins; subset pinned to
        # Spark datetime patterns (ES uses Java time — same pattern language)
        tgt = cfg.get("target_field", "@timestamp")
        cols = [
            F.try_to_timestamp(F.col(cfg["field"]), F.lit(fmt))
            for fmt in cfg["formats"]
        ]
        return _guard(df, tgt, F.coalesce(*cols), cond)
    if kind in ("dissect", "grok"):
        compiler = _compile_dissect if kind == "dissect" else _compile_grok
        patterns = cfg.get("patterns") or [cfg["pattern"]]
        regex, names = compiler(patterns[0])
        for i, nm in enumerate(names, start=1):
            df = _guard(df, nm, F.regexp_extract(F.col(cfg["field"]), regex, i), cond)
        return df
    if kind == "fingerprint":
        # pinned to md5 over '|'-joined fields (ES default method is
        # SHA-1/murmur — divergence documented; md5 exists in both engines)
        col = F.md5(F.concat_ws("|", *[F.col(f) for f in cfg["fields"]]))
        return _guard(df, cfg.get("target_field", "fingerprint"), col, cond)
    if kind == "enrich":
        if resolve is None:
            raise ValueError("ingest enrich: no resolve() provided")
        # ES enrich executes a lookup against a small enrich index —
        # broadcast left join on the match field, never a main-stream shuffle
        lookup = resolve(cfg["policy_name"])
        return df.join(F.broadcast(lookup), on=cfg["match_field"], how="left")
    if kind == "script":
        raise NotImplementedError(
            "ingest script processor is Painless — not supported; use the "
            "expression processors or a registry-level transform instead"
        )
    raise ValueError(f"ingest: unsupported processor {kind!r}")
