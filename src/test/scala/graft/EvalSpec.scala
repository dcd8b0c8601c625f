package graft

import graft.Tables
import graft.ops.{CurationQueries, EvalQueries, PrepQueries}
import org.apache.spark.sql.functions._

/** [[graft.ops.EvalQueries]] — the gate-evaluation core (exact
  * Mann–Whitney AUC + confusion metrics) on hand-checkable fixtures,
  * plus consistency of the two registered gate faces. */
class EvalSpec extends SparkSpec {
  import spark.implicits._

  private def eval1(rows: Seq[(Long, Boolean, Boolean)]) =
    EvalQueries.gateEval("t",
      rows.toDF("score", "label", "decision")).collect()(0)

  test("perfectly separable gate scores AUC = precision = recall = f1 = 1") {
    val r = eval1((1L to 10L).map(s => (s, s > 5, s > 5)))
    assert(r.getDouble(3) === 1.0)                      // auc
    assert((8 to 10).map(r.getDouble) === Seq(1.0, 1.0, 1.0))
    assert((4 to 7).map(r.getLong) === Seq(5L, 0L, 0L, 5L)) // tp fp fn tn
  }

  test("anti-separable gate scores AUC = 0 and zero precision/recall") {
    val r = eval1((1L to 10L).map(s => (s, s <= 5, s > 5)))
    assert(r.getDouble(3) === 0.0)
    assert((8 to 10).map(r.getDouble) === Seq(0.0, 0.0, 0.0))
  }

  test("label-independent scores give AUC exactly 0.5 (tie credit)") {
    // constant score: every pos/neg pair is a tie -> U = np*nn/2 exactly
    val r = eval1(Seq.tabulate(12)(i => (7L, i % 3 == 0, i % 2 == 0)))
    assert(r.getDouble(3) === 0.5)
  }

  test("single-class labels degrade to the AUC = 0.5 convention") {
    val r = eval1((1L to 6L).map(s => (s, true, s > 3)))
    assert(r.getLong(2) === 0L && r.getDouble(3) === 0.5)   // n_neg, auc
    assert(r.getDouble(9) === 0.5)                          // recall 3/6
  }

  test("hand-checked tie case: U counts half credit at equal scores") {
    // pos scores {1,2,3}, neg {2}: U = 1(3>2) + 0.5(2=2) = 1.5 -> 0.5
    val r = eval1(Seq((1L, true, true), (2L, false, false),
      (2L, true, true), (3L, true, false)))
    assert(r.getDouble(3) === 0.5)
    assert((4 to 7).map(r.getLong) === Seq(2L, 0L, 1L, 1L))
    assert(r.getDouble(8) === 1.0)        // precision 2/2
    assert(r.getDouble(9) === 0.666667)   // recall 2/3
    assert(r.getDouble(10) === 0.8)       // f1 = 2*2/(4+0+1)
  }

  test("AUC ≡ quadratic brute force on a deterministic mixed fixture") {
    // hash-scattered scores/labels: exercises ties and both classes
    val rows = (0 until 64).map { i =>
      val score = (i * 2654435761L % 17L).abs
      (score, i % 3 != 0, score > 8)
    }
    val pos = rows.filter(_._2).map(_._1)
    val neg = rows.filterNot(_._2).map(_._1)
    val u2 = (for { p <- pos; n <- neg } yield
      if (p > n) 2L else if (p == n) 1L else 0L).sum
    val expect = BigDecimal(u2.toDouble / (2.0 * pos.size * neg.size))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(eval1(rows).getDouble(3) === expect)
  }

  test("prCurve ≡ quadratic brute force; recall monotone in threshold") {
    def rh(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val rows = (0 until 40).map { i =>
      (i * 2654435761L % 11L, i % 3 != 0)
    }
    val nPos = rows.count(_._2)
    val expect = rows.map(_._1).distinct.sorted.map { t =>
      val tp = rows.count(r => r._2 && r._1 >= t).toLong
      val fp = rows.count(r => !r._2 && r._1 >= t).toLong
      val fn = nPos - tp
      val p = if (tp + fp == 0) 0.0 else rh(tp.toDouble / (tp + fp))
      val r = if (nPos == 0) 0.0 else rh(tp.toDouble / nPos)
      val f1 = if (2 * tp + fp + fn == 0) 0.0
        else rh(2.0 * tp / (2 * tp + fp + fn))
      (t, tp, fp, fn, (rows.size - nPos) - fp, p, r, f1)
    }
    val got = EvalQueries.prCurve(rows.toDF("score", "label")).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3),
        x.getLong(4), x.getDouble(5), x.getDouble(6), x.getDouble(7)))
      .toSeq
    assert(got === expect)
    // PR-curve shape: recall non-increasing as the threshold rises
    assert(got.map(_._7).sliding(2).forall(w => w(0) >= w(1)))
  }

  test("high-NDV scores (near-unique, corpus-scale histogram) stay exact") {
    // the open-vocabulary regime the distributed prefix sum exists for:
    // ~n distinct scores, so the histogram is corpus-sized and a
    // single-partition ordered window would be the bottleneck — the
    // split cumsum must agree with quadratic brute force bit for bit
    val rows = (0 until 2000).map { i =>
      val score = i * 2654435761L % 999983L // near-unique (prime mod)
      (score, i % 3 != 0, score > 500000L)
    }
    assert(rows.map(_._1).distinct.size > 1900) // really high NDV
    val pos = rows.filter(_._2).map(_._1)
    val neg = rows.filterNot(_._2).map(_._1)
    val u2 = (for { p <- pos; n <- neg } yield
      if (p > n) 2L else if (p == n) 1L else 0L).sum
    val expect = BigDecimal(u2.toDouble / (2.0 * pos.size * neg.size))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(eval1(rows).getDouble(3) === expect)
    // and the PR sweep's running tp at the smallest threshold = n_pos
    val pr = EvalQueries.prCurve(
      rows.map(r => (r._1, r._2)).toDF("score", "label")).collect()
    assert(pr.length === rows.map(_._1).distinct.size)
    assert(pr.head.getLong(1) === pos.size.toLong) // min threshold: all pos
    assert(pr.map(_.getLong(1)).max === pos.size.toLong)
  }

  test("curation_funnel: shares sum to 1, survivors strictly decrease to kept") {
    val rows = CurationQueries.curationFunnel(spark, sf).collect()
    assert(rows.nonEmpty && rows.map(_.getInt(0)).toSeq.sorted ===
      rows.map(_.getInt(0)).toSeq)
    val docShare = rows.map(_.getDouble(4)).sum
    val tokShare = rows.map(_.getDouble(5)).sum
    assert(math.abs(docShare - 1.0) < 1e-4 && math.abs(tokShare - 1.0) < 1e-4)
    // the funnel invariant: survivors non-increasing, and the last
    // (kept) row's survivors equal its own doc count
    val surv = rows.map(_.getLong(6)).toSeq
    assert(surv.sliding(2).forall(w => w.size < 2 || w(0) >= w(1)))
    val kept = rows.find(_.getString(1) == "kept")
    assert(kept.forall(k => k.getLong(6) === k.getLong(2)))
    // totals reconcile with the per-doc pipeline
    val n = CurationQueries.curationPipeline(spark, sf).count()
    assert(rows.map(_.getLong(2)).sum === n)
  }

  test("gateEvalBy ≡ whole-corpus gateEval run per slice (high-NDV mix)") {
    // near-unique scores within every slice: the sliced prefix sum runs
    // in the same corpus-scale-histogram regime the unsliced witness
    // pins, and must agree with filtering to each slice independently
    val rows = (0 until 900).map { i =>
      val score = i * 2654435761L % 999983L
      (s"s${i % 3}", score, i % 3 != i % 2, score > 500000L)
    }
    val df = rows.toDF("slice", "score", "label", "decision")
    val got = EvalQueries.gateEvalBy("g", df).collect().sortBy(_.getString(1))
    assert(got.map(_.getString(1)).toSeq === Seq("s0", "s1", "s2"))
    for (r <- got) {
      val slice = r.getString(1)
      val one = EvalQueries.gateEval("g",
        rows.filter(_._1 == slice).map(x => (x._2, x._3, x._4))
          .toDF("score", "label", "decision")).collect()(0)
      // same metric schema after the slice column: compare field-wise
      assert((2 to 11).map(r.get).toSeq === (1 to 10).map(one.get).toSeq,
        s"slice $slice diverges")
    }
  }

  test("gate_eval_by_source reconciles with the lifetime highndv row") {
    val by = CurationQueries.gateEvalBySource(spark, sf).collect()
    val life = CurationQueries.gateEvalHighNdv(spark, sf).collect()(0)
    val nSrc = Tables.documents(spark, sf).select("source").distinct().count()
    assert(by.length === nSrc)
    // confusion counters and class counts are LINEAR in the slices
    for (i <- Seq(2, 3, 5, 6, 7, 8)) // n_pos n_neg tp fp fn tn
      assert(by.map(_.getLong(i)).sum === life.getLong(i - 1),
        s"column $i does not sum to the lifetime row")
    for (r <- by) assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
  }

  test("calibrationReport ≡ brute-force bands; totals reconcile") {
    val rows = (0 until 500).map { i =>
      val score = i * 2654435761L % 100000L
      (score, i % 3 != 0, score >= 50000L)
    }
    val w = 10000L
    val got = EvalQueries.calibrationReport("g",
      rows.toDF("score", "label", "decision"), w).collect()
      .sortBy(_.getLong(1))
    val expect = rows.groupBy(_._1 / w).toSeq.sortBy(_._1).map {
      case (bin, rs) =>
        def rh(x: Double) = BigDecimal(x)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        (bin, bin * w, rs.size.toLong, rs.count(_._2).toLong,
          rh(rs.count(_._2).toDouble / rs.size),
          rh(rs.count(_._3).toDouble / rs.size),
          rh(rs.map(_._1).sum.toDouble / rs.size))
    }
    assert(got.map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getDouble(5), r.getDouble(6), r.getDouble(7)))
      .toSeq === expect)
    assert(got.map(_.getLong(3)).sum === rows.size.toLong)
  }

  test("classifier_calibration bands cover the test split exactly") {
    val bands = CurationQueries.classifierCalibration(spark, sf).collect()
    val nTest = Tables.documents(spark, sf)
      .filter(col("doc_id") % 2 === 1).count()
    assert(bands.map(_.getLong(3)).sum === nTest)
    // the en-label volume across bands is the lifetime n_pos
    val ce = CurationQueries.classifierEval(spark, sf).collect()(0)
    assert(bands.map(_.getLong(4)).sum === ce.getLong(1))
    for (b <- bands) {
      assert(b.getLong(4) <= b.getLong(3))
      assert(b.getDouble(5) >= 0.0 && b.getDouble(5) <= 1.0)
      // mean score falls inside its own band
      assert(b.getDouble(7) >= b.getLong(2) &&
        b.getDouble(7) < (b.getLong(1) + 1) * CurationQueries.calibrationBinWidth)
    }
  }

  test("classifier_eval and dsir_eval rows are internally consistent") {
    val ce = CurationQueries.classifierEval(spark, sf).collect()(0)
    val nTest = Tables.documents(spark, sf)
      .filter(col("doc_id") % 2 === 1).count()
    assert(ce.getLong(1) + ce.getLong(2) === nTest, "n_pos + n_neg = n_test")
    assert((4 to 7).map(ce.getLong).sum === nTest, "confusion covers test")
    // NOTE: no beats-chance assertion — the synthetic corpus draws text
    // from one shared 31-word vocabulary, so lang labels are close to
    // independent of content and gate AUC hovers around 0.5 by design;
    // the separable/anti-separable fixtures above pin the metric itself
    assert(ce.getDouble(3) >= 0.0 && ce.getDouble(3) <= 1.0)

    val de = PrepQueries.dsirEval(spark, sf).collect()(0)
    val nDocs = Tables.documents(spark, sf).count()
    assert(de.getLong(1) + de.getLong(2) === nDocs)
    assert((4 to 7).map(de.getLong).sum === nDocs)
    assert(de.getDouble(3) >= 0.0 && de.getDouble(3) <= 1.0)
  }
}
