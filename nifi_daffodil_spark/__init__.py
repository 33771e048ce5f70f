"""nifi_daffodil_spark — a from-scratch PySpark-native CDC / incremental-ingest
engine with the record parse/validate/normalize/route/commit semantics of
OwlCyberDefense/nifi-daffodil (reference, read-only at /root/reference),
re-expressed columnar over Spark DataFrames + Structured Streaming.

Reference semantics carried over (SURVEY.md §2.a inventory):
  * schema-driven parse  (DaffodilParse.java:83-100)      -> from_json / Arrow UDF
  * exactly-consumed     (DaffodilParse.java:92-98)       -> payload-length invariant
  * validation tiers     (AbstractDaffodilProcessor.java:142-153) -> check expressions
  * success/failure route(AbstractDaffodilProcessor.java:164-172) -> valid/quarantine split
  * external variables   (AbstractDaffodilProcessor.java:359-371) -> EngineConfig params
  * schema cache         (AbstractDaffodilProcessor.java:209)     -> SchemaRegistry
  * provenance           (AbstractDaffodilProcessor.java:496)     -> per-epoch lineage rows
  * @SideEffectFree replay (DaffodilParse.java:47)        -> idempotent epoch commits

What the reference does NOT have (no distribution, no state, no lake sink) is
the engine's own design: LWW dedup windows, salted bucket-partitioned MERGE,
checkpointed exactly-once streaming, in-flight schema evolution.
"""

__version__ = "0.1.0"

from nifi_daffodil_spark.config import EngineConfig
from nifi_daffodil_spark.engine import CdcEngine

__all__ = ["EngineConfig", "CdcEngine", "__version__"]
