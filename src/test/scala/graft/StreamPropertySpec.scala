package graft

import graft.ops.CurationQueries
import graft.streaming.{CurationStream, EmbedStream, EvalStream}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based stream ≡ batch invariants for the counts-backed
  * monitors: the fixed-batching equalities in EvalStreamSpec /
  * EmbedStreamSpec / CurationStreamSpec, driven over ARBITRARY
  * batchings (and, where the contract is order-free, arbitrary
  * ORDERINGS) — the linearity claims hold by algebra (integer sums
  * commute), so any counterexample here is an implementation bug in
  * the commit/merge path, not a semantics choice. Deterministic seed
  * sequence, the Scd2PropertySpec harness. */
class StreamPropertySpec extends SparkSpec {
  import spark.implicits._

  private def forSamples[T](gen: Gen[T], n: Int)(body: T => Unit): Unit = {
    var seed = Seed(42L)
    (0 until n).foreach { _ =>
      body(gen.pureApply(Gen.Parameters.default, seed))
      seed = seed.next
    }
  }

  private def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-prop-$tag")
      .toString + "/state"

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)

  // ---- EmbedStream: ANY partition into batches, ANY order -----------------

  private val genVecs: Gen[List[(Long, Int, Array[Float])]] = for {
    n <- Gen.choose(20, 120)
    nLabels <- Gen.choose(1, 6)
  } yield (0 until n).toList.map { i =>
    val e = Array.tabulate(6) { d =>
      (((i * 2654435761L + d * 40503L) % 2001L) - 1000L).toFloat / 997f
    }
    (i.toLong, i % nLabels, e)
  }

  test("EmbedStream: drift report invariant under arbitrary batch membership") {
    // membership is UNRESTRICTED (not contiguous ranges): vectors land
    // in any batch in any interleaving — the integer-sum state must
    // not care
    val gen = for {
      vecs <- genVecs
      parts <- Gen.choose(1, 6)
      assign <- Gen.listOfN(vecs.length, Gen.choose(0, parts - 1))
    } yield (vecs, parts, assign)
    forSamples(gen, 6) { case (vecs, _, assign) =>
      val d = freshDir("embed")
      val batches = vecs.zip(assign).groupBy(_._2).toSeq.sortBy(_._1)
        .map { case (i, xs) => (i, xs.map(_._1)) }
      batches.foreach { case (i, xs) =>
        EmbedStream.applyMicroBatch(spark,
          xs.toDF("vec_id", "label", "embedding"), d, i.toLong)
      }
      val got = rows(EmbedStream.embeddingDriftLive(spark, d, lastK = 99))
      val want = rows(EmbedStream.driftFromCounts(
        EmbedStream.embedCounts(vecs.toDF("vec_id", "label", "embedding")),
        EmbedStream.embedCounts(vecs.toDF("vec_id", "label", "embedding"))))
      assert(got === want,
        s"merged drift diverged for ${batches.length} arbitrary batches")
    }
  }

  // ---- EvalStream: ANY partition of scored rows ----------------------------

  test("EvalStream: gate report invariant under arbitrary batching") {
    val genScored = for {
      n <- Gen.choose(30, 200)
      rows <- Gen.listOfN(n, for {
        score <- Gen.choose(0L, 50L) // collision-heavy
        label <- Gen.oneOf(true, false)
        dec <- Gen.oneOf(true, false)
      } yield (score, label, dec))
      parts <- Gen.choose(1, 6)
      assign <- Gen.listOfN(n, Gen.choose(0, parts - 1))
    } yield (rows, assign)
    forSamples(genScored, 6) { case (scored, assign) =>
      val d = freshDir("eval")
      scored.zip(assign).groupBy(_._2).toSeq.sortBy(_._1)
        .foreach { case (i, xs) =>
          EvalStream.applyMicroBatch(spark,
            xs.map(_._1).toDF("score", "label", "decision"), d, i.toLong)
        }
      val got = rows(EvalStream.gateEvalLive(spark, d, "p"))
      val want = rows(graft.ops.EvalQueries.gateEval("p",
        scored.toDF("score", "label", "decision")))
      assert(got === want, "merged gate eval diverged for arbitrary batches")
    }
  }

  // ---- CurationStream: arbitrary CONTIGUOUS id-ordered splits --------------

  private val genDocs: Gen[List[(Long, String)]] = for {
    n <- Gen.choose(20, 80)
    motifs <- Gen.choose(3, 12) // heavy exact-dup pressure
  } yield (0 until n).toList.map { i =>
    val m = i % motifs
    val text = m match {
      case 0 => "tiny"
      case 1 => ("un deux trois quatre " * 10).trim
      case _ => (s"the steady brown fox m$m walks the long road home and " +
        s"the calm dog m$m watches from the porch every day ") * 3
    }
    (i.toLong, text)
  }

  test("CurationStream: verdicts + funnel invariant under arbitrary id-ordered splits") {
    val gen = for {
      docs <- genDocs
      cuts <- Gen.listOfN(3, Gen.choose(0, docs.length))
    } yield (docs, cuts)
    forSamples(gen, 6) { case (docs, cuts) =>
      val d = freshDir("curation")
      val bounds = (Seq(0, docs.length) ++ cuts).distinct.sorted
      val slices = bounds.zip(bounds.tail).map { case (a, b) =>
        docs.filter(x => x._1 >= a && x._1 < b)
      }.filter(_.nonEmpty)
      slices.zipWithIndex.foreach { case (s, i) =>
        CurationStream.applyMicroBatch(spark,
          s.toDF("doc_id", "text"), d, i.toLong)
      }
      // batch twin over the same rows
      import org.apache.spark.sql.expressions.Window
      val base = CurationQueries.scoredDocs(docs.toDF("doc_id", "text"))
        .withColumn("is_canonical", col("doc_id") ===
          min(col("doc_id")).over(Window.partitionBy(md5(col("text")))))
      val batch = base.select(col("doc_id"), col("n_tokens"),
        col("pred_lang"), col("quality"), col("is_canonical"),
        CurationQueries.rejectReason.isNull.as("keep"),
        CurationQueries.rejectReason.as("reject_reason"))
      assert(rows(CurationStream.readVerdicts(spark, d)
          .drop("content_hash") // the round-15 takedown bookkeeping column
          .orderBy("doc_id"))
        === rows(batch.orderBy("doc_id")),
        s"stream verdicts diverged for ${slices.length} id-ordered splits")
      assert(rows(CurationStream.funnelLive(spark, d)) ===
        rows(CurationQueries.funnelFromCounts(
          CurationQueries.funnelCounts(batch))),
        "live funnel diverged from the batch funnel")
    }
  }
}
