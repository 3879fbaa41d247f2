package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries._
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Pipeline.estimateQueue(spark, "/root/testdata/sf0.001")
  /** All query families contributing to the operator surface.
    * private[graft]: OutputContractSpec guards name uniqueness on the
    * pre-Map Seq (a duplicate name silently shadows in the Map). */
  private[graft] def families: Seq[QueryDef] =
    Relational.all ++ Analytic.all ++ TextOps.all ++ SimOps.all ++
      CorpusOps.all ++ ProfileOps.all ++ streaming.Streams.all ++
      Extras.all ++ Scale.all ++ StatsOps.all ++ GraphOps.all ++
      Warehouse.all ++ MiningOps.all ++ OlapOps.all ++ CurateOps.all ++
      VisionOps.all ++ SqlOps4.all ++ SqlDefOps.all ++ Seq(
    // Model-scoring head chain (S4/F2): trains + scores MLlib heads —
    // not ANSI-SQL-expressible, so no oracle; MlSpec pins semantics.
    QueryDef("q_model_score", (s, d) => graft.ml.Scoring.scoreAndEstimate(s, d), None),
    // IVF ANN (KMeans coarse quantizer + probe-cell scan) — quantizer
    // training isn't SQL-expressible; AnnSpec pins candidate-scan
    // exactness instead.
    QueryDef("q_ann_ivf", (s, d) => graft.ml.Ann.ivfTopK(s, d), None),
    // Batched-probe IVF: N probes in one distributed pass (broadcast
    // centroid table + cell-pruned join + per-probe GroupTopK), zero
    // per-probe driver round-trips. Same no-oracle reason as
    // q_ann_ivf; AnnSpec pins full-probe exactness and single-probe
    // agreement with ivfTopK.
    QueryDef("q_ann_ivf_batch", (s, d) => graft.ml.Ann.ivfTopKBatch(s, d), None))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    QueryDef.queriesOf(families) +
      ("estimate_queue" -> (Pipeline.estimateQueue _))
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    QueryDef.oraclesOf(families) +
      ("estimate_queue" -> Pipeline.estimateQueueSql)
}
