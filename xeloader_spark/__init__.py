"""xeloader_spark — a PySpark-native analytics engine with the capabilities
of the reference `suresh-kandoth/XELoader` (an XEvent-trace bulk loader),
re-expressed Spark-first.

The reference (see SURVEY.md) is an ingest dataflow: scan → schema-infer →
demux-by-event-type → flatten/transform → micro-batch → columnar sink, plus
the query surface its columnstore output is designed for (time-bucketed
aggregation, event ordering, lineage/hash joins, top-k). Here:

- the ingest dataflow is `xeloader_spark.operators.ingest` (DataFrame ops,
  `partitionBy("event_type")` demux, lineage stamping, write modes,
  error budget via PERMISSIVE-style filtering, `observe()` run statistics);
- the scalar transform library (timestamps, truncation, hash byte-order,
  callstack decode, XML/map coercion) is `xeloader_spark.functions`;
- the query surface (SURVEY §2.2) and the relational operators Catalyst
  supplies are `xeloader_spark.queries`;
- LLM-data-pipeline extension operators (dedup incl. cluster resolution
  and decontamination, similarity search, text analysis, multimodal
  plumbing, deterministic sampling/splitting/packing) are
  `xeloader_spark.operators.{dedup, similarity, text, multimodal,
  sampling}`; skew/co-location levers in `operators.skew`.

Everything is DataFrame-declarative so Catalyst handles pushdown, pruning,
join selection and AQE; Python UDFs appear only where semantics require
(callstack decode, multimodal feature stubs), always Arrow-batched.
"""

__version__ = "0.1.0"
