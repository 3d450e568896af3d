"""docetl_spark — a from-scratch PySpark-native CDC / incremental-ingest
engine with DocETL operator semantics.

Two faces (SURVEY.md §7.0):

* a **batch operator library** (``docetl_spark.operators``): every DocETL
  operator re-expressed as a pure ``DataFrame -> DataFrame`` function built
  on Spark SQL / pandas UDFs / ``applyInPandas`` — never per-row Python;
* a **CDC merge-apply loop** (``docetl_spark.cdc`` + ``docetl_spark.lake``):
  a binlog/WAL replayer that runs vectorized operator stages per microbatch
  and MERGEs results into a snapshot-isolated lake table with
  last-writer-wins by LSN, batch-id fencing (exactly-once), in-flight schema
  evolution, salted skew handling and per-batch lineage metrics.

Reference semantics: SiriusHsh/docetl (see SURVEY.md for file:line cites).
Nothing here is a port — the reference is a single-node threaded Python
engine; this is a Catalyst-first distributed design.
"""

__version__ = "0.1.0"
