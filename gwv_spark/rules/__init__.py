"""Rule framework: each validation rule compiles to a DataFrame plan.

A rule is a function ``(RuleContext) -> DataFrame[VIOLATIONS_SCHEMA]``
registered under its rule_id.  This replaces the reference's dynamically
imported ``Validator`` classes (validator.py:16-23,
validators/__init__.py:16-35) with a declarative registry: the engine
unions the violation plans and lets Catalyst share the underlying scan.

Violations schema (FIXTURES.md §6):

    rule_id STRING, errcode STRING, doc_id STRING,
    detail ARRAY<STRING>, sortkey STRING

``detail`` holds the reference's error params, each element tagged with a
one-char type prefix so the report writer can rebuild the reference's
exact JSON params:  'S<str>', 'I<int>', 'L<offset>:<line text>'
(a KageLine serializes as (line_number, strdata),
validators/__init__.py:57-60).  ``sortkey`` fixes within-errcode order
(the reference emits in sorted-doc iteration order, validator.py:42).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

VIOLATION_COLS = ["rule_id", "errcode", "doc_id", "detail", "sortkey"]

VIOLATIONS_DDL = (
    "rule_id STRING, errcode STRING, doc_id STRING, "
    "detail ARRAY<STRING>, sortkey STRING"
)


@dataclass
class RuleContext:
    spark: SparkSession
    docs: DataFrame  # prepared documents (derive.prepare)
    spans: DataFrame  # exploded spans (derive.exploded_spans)
    attrs: DataFrame | None = None  # doc_attrs(doc_id, related, ts)
    dims: dict[str, DataFrame] = field(default_factory=dict)
    # --ignore-error (gwv.py:28-32): quarantine per-record UDF crashes
    # as __error__ violation rows instead of failing the job
    ignore_error: bool = False
    # Prepared-plan cache: rule_id -> built violations DataFrame.  A
    # DataFrame is an immutable logical plan, so one build per context is
    # sound; re-building per execution costs 0.2-0.6 s of py4j traffic
    # PER RULE (measured: ids 0.6 s/build), which dominates the suite's
    # fixed cost on repeated runs (long-running service / bench sustained).
    plan_cache: dict[str, DataFrame] = field(default_factory=dict)

    def plan(self, rule_id: str) -> DataFrame:
        df = self.plan_cache.get(rule_id)
        if df is None:
            df = RULES[rule_id](self)
            self.plan_cache[rule_id] = df
        return df


RuleFn = Callable[[RuleContext], DataFrame]

RULES: dict[str, RuleFn] = {}

# Reference registry order (validators/__init__.py:16-35) — report order.
ALL_RULE_IDS = [
    "corner", "related", "illegal", "skew", "donotuse", "kosekitoki",
    "mj", "ucsalias", "dup", "naming", "ids", "order", "delquote",
    "delvar", "numexp", "mustrenew", "j", "width",
]


def rule(rule_id: str):
    def deco(fn: RuleFn) -> RuleFn:
        RULES[rule_id] = fn
        return fn

    return deco


def tag_s(c: Column) -> Column:
    return F.concat(F.lit("S"), c)


def tag_i(c: Column) -> Column:
    return F.concat(F.lit("I"), c.cast("string"))


def tag_f(c: Column) -> Column:
    return F.concat(F.lit("F"), c.cast("double").cast("string"))


def tag_line(offset: Column, text: Column) -> Column:
    return F.concat(F.lit("L"), offset.cast("string"), F.lit(":"), text)


def default_sortkey(doc_id: Column, offset: Column | None = None) -> Column:
    if offset is None:
        return doc_id
    return F.concat(doc_id, F.lit("#"), F.lpad(offset.cast("string"), 6, "0"))


def shape(
    df: DataFrame,
    rule_id: str,
    errcode: Column,
    detail: Column,
    sortkey: Column | None = None,
) -> DataFrame:
    """Project a rule's intermediate frame onto the violations schema."""
    sk = sortkey if sortkey is not None else default_sortkey(F.col("doc_id"))
    return df.select(
        F.lit(rule_id).alias("rule_id"),
        errcode.cast("string").alias("errcode"),
        F.col("doc_id").cast("string").alias("doc_id"),
        detail.cast("array<string>").alias("detail"),
        sk.cast("string").alias("sortkey"),
    )


def decode_detail(elem: str):
    """Inverse of the tag_* encoders (Python side, report writer only)."""
    tag, rest = elem[0], elem[1:]
    if tag == "S":
        return rest
    if tag == "I":
        return int(rest)
    if tag == "F":
        return float(rest)
    if tag == "N":
        return None
    if tag == "A":  # list of strings, US-separated
        return rest.split("\x1f") if rest else []
    if tag == "L":
        off, _, text = rest.partition(":")
        return [int(off), text]
    raise ValueError(f"unknown detail tag in {elem!r}")


def entity_raw(ctx: RuleContext, df: DataFrame, name_col: str, out_col: str) -> DataFrame:
    """dump.get_entity_name semantics (dump.py:59-61): the alias target
    *string* (even if dangling) or the name itself; NULL if name_col is
    not a doc.  Adds out_col and out_col+'_exists'."""
    targets = ctx.docs.select(
        F.col("doc_id").alias(name_col),
        F.coalesce(F.col("entity_ref"), F.col("doc_id")).alias(out_col),
    )
    return df.join(targets, name_col, "left").withColumn(
        out_col + "_exists", F.col(out_col).isNotNull()
    )


def entity_checked(ctx: RuleContext, df: DataFrame, out_col: str = "entity") -> DataFrame:
    """ValidatorContext.entity semantics (validatorctx.py:32-37): the
    alias target if it exists in the corpus, else the doc itself.  df must
    carry doc_id/is_alias/entity_ref."""
    existing = ctx.docs.select(F.col("doc_id").alias("__tgt"))
    return (
        df.join(existing, df["entity_ref"] == existing["__tgt"], "left")
        .withColumn(
            out_col,
            F.when(F.col("__tgt").isNotNull(), F.col("entity_ref")).otherwise(
                F.col("doc_id")
            ),
        )
        .drop("__tgt")
    )


def load_all_rules() -> None:
    """Import every rule module so the registry is populated."""
    import importlib

    for mod in [
        "numexp", "delquote", "delvar", "order", "kosekitoki", "donotuse",
        "ucsalias", "mustrenew", "skew", "illegal", "width", "naming",
        "related", "ids", "dup", "corner", "j", "mj",
    ]:
        try:
            importlib.import_module(f"gwv_spark.rules.{mod}")
        except ModuleNotFoundError:
            pass  # not yet implemented
