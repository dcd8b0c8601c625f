package graft

import graft.functions.TextFunctions.{tokens, wordNgrams}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Round-16 parity net for the per-document token-statistic kernels
  * ([[graft.functions.TokenStatsUtil]]): `entropy_stats` and
  * `repetition_stats` must reproduce the relational explode→groupBy
  * formulations they replaced BIT-FOR-BIT — including the round(_,9)
  * freeze inside the entropy sum, the pivot's null→coalesce(0.0) path
  * for bigram/trigram-less docs, and the inner-join doc spine (token-less
  * docs absent). Relational replicas below are verbatim pre-round-16. */
class TokenStatsKernelSpec extends SparkSpec {

  private def relationalEntropy(docsDf: DataFrame): DataFrame = {
    val tf = docsDf
      .select(col("doc_id"), explode(tokens(col("text"))).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val dl = tf.groupBy("doc_id").agg(sum(col("tf")).as("n_tokens"),
      count(lit(1)).as("n_distinct"))
    val p = col("tf").cast("double") / col("n_tokens").cast("double")
    tf.join(dl, Seq("doc_id"))
      .withColumn("term", round(-(p * log(p)), 9))
      .groupBy("doc_id", "n_tokens", "n_distinct")
      .agg(sum(col("term").cast("decimal(28,9)")).as("hsum"))
      .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
        round(col("hsum").cast("double"), 6).as("entropy"),
        round(when(col("n_tokens") > 1,
          col("hsum").cast("double") / log(col("n_tokens").cast("double")))
          .otherwise(lit(0.0)), 6).as("norm_entropy"))
  }

  private def relationalRepetition(docsDf: DataFrame): DataFrame = {
    val base = docsDf.select(col("doc_id"), tokens(col("text")).as("t"))
    val grams = Seq(1, 2, 3).map(n => base.select(col("doc_id"),
        lit(n).as("n"), explode(wordNgrams(col("t"), n)).as("g")))
      .reduce(_ unionByName _)
    val stats = grams.groupBy("doc_id", "n", "g").agg(count(lit(1)).as("c"))
      .groupBy("doc_id", "n").agg(
        sum(col("c")).as("total"), count(lit(1)).as("dis"),
        max(col("c")).as("maxc"),
        sum(when(col("c") >= 2, col("c")).otherwise(0L)).as("dup"))
    def pick(n: Int, c: String): Column =
      first(when(col("n") === n, col(c)), ignoreNulls = true)
    stats.groupBy("doc_id").agg(
      pick(1, "total").as("n_tokens"),
      round(lit(1.0) - pick(1, "dis") / pick(1, "total"), 6)
        .as("dup_token_frac"),
      round(coalesce(pick(2, "maxc") / pick(2, "total"), lit(0.0)), 6)
        .as("top_bigram_frac"),
      round(coalesce(pick(3, "dup") / pick(3, "total"), lit(0.0)), 6)
        .as("dup_trigram_frac"))
  }

  private lazy val edgeFixture = {
    import spark.implicits._
    Seq(
      (0L, "the quick brown fox jumps over the lazy dog the quick brown fox"),
      (1L, "one"), // single token: no bigrams, no trigrams
      (2L, "two tokens"), // bigram but no trigram
      (3L, ""), // empty → absent from both outputs
      (4L, null.asInstanceOf[String]), // null text → absent
      (5L, "a a a a a a a a a a"), // maximal repetition
      (6L, "  spaced\t\tout   tokens  with   runs  "),
      (7L, "Unicode tökens 木漏れ日 mixed ascii tökens again"))
      .toDF("doc_id", "text")
  }

  test("entropy_stats kernel == relational formulation (edge + corpus)") {
    for (d <- Seq(edgeFixture, Tables.documents(spark, sf))) {
      val kernel = graft.ops.TextQueries.textEntropyOf(d)
      val rel = relationalEntropy(d)
      assert(kernel.exceptAll(rel).isEmpty && rel.exceptAll(kernel).isEmpty)
    }
  }

  test("repetition_stats kernel == relational formulation (edge fixture)") {
    val viaKernel = {
      // the registered face reads Tables.documents; drive the same body
      // over the fixture through the kernel expression directly
      edgeFixture
        .select(col("doc_id"),
          call_function("repetition_stats", tokens(col("text"))).as("st"))
        .filter(col("st").isNotNull)
        .select(col("doc_id"),
          col("st.total1").as("n_tokens"),
          round(lit(1.0) - col("st.dis1") / col("st.total1"), 6)
            .as("dup_token_frac"),
          round(coalesce(col("st.max2") / col("st.total2"), lit(0.0)), 6)
            .as("top_bigram_frac"),
          round(coalesce(col("st.dup3") / col("st.total3"), lit(0.0)), 6)
            .as("dup_trigram_frac"))
    }
    val rel = relationalRepetition(edgeFixture)
    assert(viaKernel.exceptAll(rel).isEmpty && rel.exceptAll(viaKernel).isEmpty)
  }

  test("repetition face == relational formulation on the sf corpus") {
    val viaKernel = graft.ops.TextQueries.repetition(spark, sf)
    val rel = relationalRepetition(Tables.documents(spark, sf))
    assert(viaKernel.exceptAll(rel).isEmpty && rel.exceptAll(viaKernel).isEmpty)
  }
}
