"""gwv_spark — a PySpark-native schema + constraint validation engine.

A from-scratch rebuild of the *capabilities* of kurgm/gwv (reference at
/root/reference, read-only) as an idiomatic Spark engine:

- corpus = ``documents(doc_id STRING, spans ARRAY<STRUCT<kind, text,
  media_ref, offset>>)`` (shape pinned by BASELINE.json.input_hint);
- validation rules compile to DataFrame plans (Catalyst-native predicates,
  broadcast dimension joins, anti joins for referential integrity, shuffle
  aggregations for global rules) — vectorized pandas/Arrow UDFs only where
  the semantics are genuinely non-relational (per-doc geometry);
- a stats layer (null rates, HLL distinct, quantiles, uniqueness, RI,
  KS/PSI drift) as first-class checks;
- violations output ``(rule_id, errcode, doc_id, detail)`` plus
  per-partition pass/fail verdicts, reproducing the reference's result
  JSON shape for parity testing.
"""

__version__ = "0.1.0"
