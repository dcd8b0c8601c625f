package graft

import graft.ops.BpeQueries
import org.apache.spark.sql.functions._

/** The deterministic BPE tokenizer (ops/BpeQueries): merge semantics
  * (left-to-right non-overlapping, frequency-weighted argmax with
  * lexicographic ties), train-once/encode-everywhere determinism, and
  * the compression + consistency invariants token-id-level statistics
  * rest on. */
class BpeSpec extends SparkSpec {

  import spark.implicits._

  private def state(rows: (String, Long, Int, String)*) =
    rows.toDF("word", "freq", "pos", "sym")

  private def symsOf(df: org.apache.spark.sql.DataFrame, word: String): Seq[String] =
    df.filter(col("word") === word).orderBy("pos")
      .select("sym").as[String].collect().toSeq

  test("merge picks the frequency-weighted argmax pair and merges left-to-right") {
    // aaaa (freq 2) dominates: pair (a,a) count 3×2=6 beats everything;
    // the overlapping run must merge as [aa][aa], not [aa][a?]
    val s0 = state(
      (Seq("a", "a", "a", "a", "</w>").zipWithIndex.map { case (c, i) => ("aaaa", 2L, i, c) } ++
        Seq("a", "b", "a", "b", "</w>").zipWithIndex.map { case (c, i) => ("abab", 1L, i, c) }): _*)
    val s1 = BpeQueries.mergeStep(s0)
    assert(symsOf(s1, "aaaa") === Seq("aa", "aa", "</w>"))
    assert(symsOf(s1, "abab") === Seq("a", "b", "a", "b", "</w>"))
    // second merge: (aa,aa) now counts 1×2=2, (a,b) counts 2×1=2 — the
    // tie breaks lexicographically: "a" < "aa", so (a,b) wins
    val s2 = BpeQueries.mergeStep(s1)
    assert(symsOf(s2, "abab") === Seq("ab", "ab", "</w>"))
    assert(symsOf(s2, "aaaa") === Seq("aa", "aa", "</w>"))
  }

  test("odd-length overlap run keeps the leftover singleton") {
    val s0 = state(
      Seq("a", "a", "a", "</w>").zipWithIndex.map { case (c, i) => ("aaa", 5L, i, c) }: _*)
    val s1 = BpeQueries.mergeStep(s0)
    assert(symsOf(s1, "aaa") === Seq("aa", "a", "</w>"))
  }

  test("training is deterministic: re-run yields identical vocab and packing") {
    val a = BpeQueries.bpeVocab(spark, sf).collect().toSeq
    val b = BpeQueries.bpeVocab(spark, sf).collect().toSeq
    assert(a == b, "bpe_vocab must be bit-reproducible")
    val p = BpeQueries.packSequencesBpe(spark, sf).collect().toSeq
    val q = BpeQueries.packSequencesBpe(spark, sf).collect().toSeq
    assert(p == q, "pack_sequences_bpe must be bit-reproducible")
  }

  test("merges compress: trained corpus has fewer symbols than characters") {
    val syms = BpeQueries.trainedSyms(spark, sf).cache()
    val after = syms.agg(sum("freq")).first().getLong(0)
    val before = syms.select("word", "freq").distinct()
      .agg(sum(expr("freq * (length(word) + 1)"))).first().getLong(0)
    assert(after < before,
      s"8 merges must shrink the symbol stream: $after !< $before")
    // multi-character learned tokens exist and every word still ends in
    // a terminal-carrying symbol
    val learned = BpeQueries.bpeVocab(spark, sf)
      .filter(length(col("token")) > 1 && col("token") =!= "</w>").count()
    assert(learned > 0, "training must learn multi-character subwords")
    syms.unpersist()
    ()
  }

  test("encode emits consistent id streams; subword OOV is bounded and small") {
    val enc = BpeQueries.bpeEncode(spark, sf).cache()
    val packed = BpeQueries.packSequencesBpe(spark, sf)
    // the encode stream and the packer count the same tokens per doc
    assert(enc.select("doc_id", "n_tokens")
      .exceptAll(packed.select("doc_id", "n_tokens")).isEmpty)
    // the csv head carries min(n_tokens, encodeHead) ids
    val badHead = enc.withColumn("n_ids",
        when(col("ids_csv") === "", lit(0L))
          .otherwise(size(split(col("ids_csv"), ",")).cast("long")))
      .filter(col("n_ids") =!= least(col("n_tokens"), lit(BpeQueries.encodeHead.toLong)))
    assert(badHead.isEmpty)
    // every id is a valid vocab rank (1-based, dense)
    val maxId = enc.filter(col("ids_csv") =!= "")
      .select(explode(split(col("ids_csv"), ",")).as("ids"))
      .select(col("ids").cast("int").as("id"))
      .agg(max("id"), min("id")).first()
    assert(maxId.getInt(1) >= 1, "ids are 1-based ranks")
    enc.unpersist()
    val oov = BpeQueries.oovRateBpe(spark, sf).cache()
    assert(oov.filter(col("n_oov") > col("n_tokens")).isEmpty)
    assert(oov.filter(col("oov_rate") < 0 || col("oov_rate") > 1).isEmpty)
    // the top-20 subword head must cover the majority of token mass
    val tot = oov.agg(sum("n_tokens"), sum("n_oov")).first()
    assert(tot.getLong(1) * 2 < tot.getLong(0),
      "top-20 subword vocab must cover the majority of occurrences")
    oov.unpersist()
    ()
  }

  test("packed token counts equal the sum of per-word trained symbol counts") {
    val packed = BpeQueries.packSequencesBpe(spark, sf)
    val total = packed.agg(sum("n_tokens")).first().getLong(0)
    // independent recount: per-word symbol lengths joined to occurrences
    val wl = BpeQueries.trainedSyms(spark, sf)
      .groupBy("word").agg(count(lit(1)).as("n_sym"))
    val occ = Tables.documents(spark, sf)
      .select(explode(expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")).as("word"))
    val expected = occ.join(wl, Seq("word"))
      .agg(sum("n_sym")).first().getLong(0)
    assert(total === expected)
    // chunk bookkeeping: offsets stay inside the budget
    assert(packed.filter(col("chunk_offset") >= BpeQueries.packBudget
      || col("chunk_offset") < 0).count() === 0)
  }
}
