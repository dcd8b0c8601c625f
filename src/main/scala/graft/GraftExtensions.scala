package graft

import graft.functions.{BlocklistExpressions, BloomExpressions, HilbertExpressions, HtmlExtractExpressions, IvfExpressions, NormalizeExpressions, PqExpressions, QuantizeExpressions, SetSimExpressions, ShingleExpressions, SimHashExpressions, TokenStatsExpressions, VectorExpressions, WinnowExpressions, ZOrderExpressions}
import org.apache.spark.sql.SparkSessionExtensions

/** Engine extension point, wired the public way:
  * `SparkSession.builder.withExtensions(new GraftExtensions)` or
  * `.config("spark.sql.extensions", "graft.GraftExtensions")`.
  *
  * Registers the engine's native Catalyst expressions (currently
  * `dot_product`; the natural home for future custom rules/strategies).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(VectorExpressions.dotProductDescriptor)
    ext.injectFunction(ShingleExpressions.wordShinglesDescriptor)
    ext.injectFunction(SimHashExpressions.simhash60Descriptor)
    ext.injectFunction(SetSimExpressions.sortedCommonCountDescriptor)
    ext.injectFunction(ShingleExpressions.wordNgramsDescriptor)
    ext.injectFunction(QuantizeExpressions.quantizeI8Descriptor)
    ext.injectFunction(ZOrderExpressions.zorder2Descriptor)
    ext.injectFunction(HilbertExpressions.hilbert2Descriptor)
    ext.injectFunction(IvfExpressions.ivfAssignDescriptor)
    ext.injectFunction(NormalizeExpressions.stripAccentsNfcDescriptor)
    ext.injectFunction(PqExpressions.sqDistDescriptor)
    ext.injectFunction(PqExpressions.pqCodeDescriptor)
    ext.injectFunction(PqExpressions.pqLutDescriptor)
    ext.injectFunction(PqExpressions.pqAdcDescriptor)
    ext.injectFunction(BlocklistExpressions.blocklistHitsDescriptor)
    ext.injectFunction(HtmlExtractExpressions.htmlExtractDescriptor)
    ext.injectFunction(graft.functions.UrlExpressions.urlCanonDescriptor)
    ext.injectFunction(graft.functions.AbttExpressions.abttMicroDescriptor)
    ext.injectFunction(BloomExpressions.bloomAggDescriptor)
    ext.injectFunction(BloomExpressions.mightContainDescriptor)
    ext.injectFunction(WinnowExpressions.md5LongsDescriptor)
    ext.injectFunction(WinnowExpressions.gramMd5sDescriptor)
    ext.injectFunction(WinnowExpressions.winnowFpsDescriptor)
    ext.injectFunction(WinnowExpressions.winnowSummaryDescriptor)
    ext.injectFunction(TokenStatsExpressions.entropyStatsDescriptor)
    ext.injectFunction(TokenStatsExpressions.repetitionStatsDescriptor)
    // conf-gated (spark.graft.rangeJoin.bucketWidth): rewrites naive
    // inequality-only range joins into the bucketed equi-join form
    ext.injectOptimizerRule(graft.plans.RangeJoinBucketing(_))
  }
}

object GraftSession {
  /** Session builder preconfigured for the graft engine: extensions
    * registered, UTC, AQE, sane local shuffle parallelism. */
  def builder(master: String = "local[*]", shufflePartitions: Int = 32)
      : org.apache.spark.sql.SparkSession.Builder =
    org.apache.spark.sql.SparkSession.builder()
      .master(master)
      .config("spark.sql.extensions", classOf[GraftExtensions].getName)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
  // NOTE: spark.sql.legacy.parquet.nanosAsLong is no longer preset here —
  // Tables.events turns it on at runtime only when it actually meets an
  // INT64 TIMESTAMP(NANOS) file (r7 verdict: no unconditional mutation).
}
