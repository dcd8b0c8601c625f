package graft

import graft.ops.CurationQueries
import org.apache.spark.sql.functions._

/** Deterministic logistic-GD trainer: training moves the weights and
  * reduces the train-half logistic loss below the w=0 baseline, the
  * held-out gate separates the classes, and two runs are bit-identical
  * (the integer-micro freeze points, not luck). */
class GdTrainSpec extends SparkSpec {

  private def weights(): Map[Long, Long] =
    CurationQueries.clfGdTrain(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("training moves weights and reduces the train logistic loss") {
    import graft.functions.TextFunctions.{md5Long, tokens}
    val w = weights()
    assert(w.size === CurationQueries.clfGdDim + 1)
    assert(w.values.exists(_ != 0L), "training left all weights at zero")
    // train-half margins under the final weights
    val train = Tables.documents(spark, sf)
      .filter(col("doc_id") % 2 === 0)
      .select(col("doc_id"), (col("lang") === "en").as("y"), col("text"))
    val margins = train
      .select(col("doc_id"), col("y"), explode(tokens(col("text"))).as("t"))
      .select(col("doc_id"), col("y"),
        pmod(md5Long(concat(lit("gd:"), col("t"))),
          lit(CurationQueries.clfGdDim)).as("bucket"))
      .distinct()
      .collect().groupBy(r => (r.getLong(0), r.getBoolean(1)))
      .toSeq.map { case ((_, y), rows) =>
        val s = (rows.map(_.getLong(2)).distinct :+
          CurationQueries.clfGdDim.toLong).map(w(_)).sum / 1e6
        (y, s)
      }
    def loss(ms: Seq[(Boolean, Double)]): Double =
      ms.map { case (y, s) =>
        val yy = if (y) 1.0 else -1.0
        math.log1p(math.exp(-yy * s))
      }.sum
    val l = loss(margins)
    val l0 = margins.size * math.log(2.0) // w = 0 baseline
    assert(l < l0 - 5.0, s"loss did not genuinely improve: $l vs $l0")
  }

  test("held-out gate separates the classes; reruns are bit-identical") {
    val scores = CurationQueries.clfGdScores(spark, sf).collect()
    val acc = scores.count(r =>
      r.getBoolean(2) === r.getBoolean(3)).toDouble / scores.length
    assert(acc > 0.5, s"held-out accuracy $acc not better than chance")
    assert(weights() === weights(), "two training runs diverged")
  }
}
