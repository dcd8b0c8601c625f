package graft

import graft.ops.{CurationQueries, EvalQueries}
import graft.streaming.{EvalStream, StreamFs}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [[graft.streaming.EvalStream]] — streaming gate evaluation: the
  * merged live report must equal the batch operator EXACTLY (count
  * linearity), replay must no-op, crash debris must sweep. */
class EvalStreamSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("graft-evalstream")
      .toString + "/state"

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)

  private val fixture: Seq[(Long, Boolean, Boolean)] =
    (0 until 600).map { i =>
      val score = i * 2654435761L % 999983L // high-NDV, ties included
      (score % 4000, i % 3 != 0, score > 500000L)
    }

  private def scoredDf(s: Seq[(Long, Boolean, Boolean)]): DataFrame =
    s.toDF("score", "label", "decision")

  test("stream-merged gate eval ≡ one-shot batch gateEval, any batching") {
    val batch = rows(EvalQueries.gateEval("g", scoredDf(fixture)))
    Seq(1, 4).foreach { parts =>
      val d = freshDir()
      (0 until parts).foreach(i => EvalStream.applyMicroBatch(spark,
        scoredDf(fixture.zipWithIndex.filter(_._2 % parts == i).map(_._1)),
        d, i.toLong))
      assert(rows(EvalStream.gateEvalLive(spark, d, "g")) === batch,
        s"$parts-batch merged eval diverged from the batch operator")
    }
  }

  test("live PR curve ≡ batch prCurve over the same rows") {
    val d = freshDir()
    (0 until 3).foreach(i => EvalStream.applyMicroBatch(spark,
      scoredDf(fixture.zipWithIndex.filter(_._2 % 3 == i).map(_._1)),
      d, i.toLong))
    val batch = rows(EvalQueries.prCurve(
      scoredDf(fixture).select("score", "label")))
    assert(rows(EvalStream.prCurveLive(spark, d)) === batch)
  }

  private def binSorted(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.sortBy(_.getLong(1)).map(_.toSeq)

  test("live calibration ≡ batch calibrationReport, any batching") {
    val batch = binSorted(EvalQueries.calibrationReport("g",
      scoredDf(fixture), 500L))
    Seq(1, 5).foreach { parts =>
      val d = freshDir()
      (0 until parts).foreach(i => EvalStream.applyMicroBatch(spark,
        scoredDf(fixture.zipWithIndex.filter(_._2 % parts == i).map(_._1)),
        d, i.toLong))
      assert(binSorted(EvalStream.calibrationLive(spark, d, "g", 500L))
        === batch,
        s"$parts-batch merged calibration diverged from the batch operator")
    }
  }

  test("registered live-calibration face equals the batch report") {
    val scored = CurationQueries.highNdvScored(spark, sf)
    val batch = binSorted(EvalQueries.calibrationReport("highndv", scored,
      EvalStream.calibrationLiveBinWidth))
    assert(binSorted(EvalStream.calibrationLiveQuery(spark, sf)) === batch)
  }

  test("calibration drift: window leg ≡ batch bands over the window rows") {
    val d = freshDir()
    (0 until 4).foreach(i => EvalStream.applyMicroBatch(spark,
      scoredDf(fixture.filter(_._1 % 4 == i)), d, i.toLong))
    val drift = EvalStream.calibrationDrift(spark, d, "g", 500L, lastK = 2)
      .collect().sortBy(_.getLong(1))
    // lifetime leg = the live face's bands
    val life = EvalStream.calibrationLive(spark, d, "g", 500L)
      .collect().sortBy(_.getLong(1))
    assert(drift.map(r => (r.getLong(1), r.getLong(3), r.getDouble(5)))
      .toSeq === life.map(r => (r.getLong(1), r.getLong(3),
        r.getDouble(5))).toSeq)
    // window leg = the batch report over exactly the window's rows
    val winBatch = EvalQueries.calibrationReport("g",
      scoredDf(fixture.filter(x => x._1 % 4 == 2 || x._1 % 4 == 3)), 500L)
      .collect().map(r => r.getLong(1) -> (r.getLong(3), r.getDouble(5)))
      .toMap
    for (r <- drift) {
      val (nw, pw) = winBatch.getOrElse(r.getLong(1), (0L, 0.0))
      assert(r.getLong(4) === nw, s"bin ${r.getLong(1)} n_window")
      assert(r.getDouble(6) === pw, s"bin ${r.getLong(1)} pos_rate_window")
      // the delta column is the subtraction of the two rounded rates
      assert(r.getDouble(7) === BigDecimal(r.getDouble(6) - r.getDouble(5))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
  }

  test("takedown subtracts a batch; window timeline keeps its positions; compact folds") {
    val parts = 3
    val slices = (0 until parts).map(i =>
      fixture.zipWithIndex.filter(_._2 % parts == i).map(_._1))
    val d = freshDir()
    slices.zipWithIndex.foreach { case (sl, i) =>
      EvalStream.applyMicroBatch(spark, scoredDf(sl), d, i.toLong)
    }
    EvalStream.applyTakedown(spark, d, Seq(1L), takedownId = 0L)
    // post-takedown live report ≡ the batch operator over SURVIVING rows
    val surv = rows(EvalQueries.gateEval("g",
      scoredDf(slices(0) ++ slices(2))))
    assert(rows(EvalStream.gateEvalLive(spark, d, "g")) === surv,
      "post-takedown eval must equal a survivors-only rebuild")
    // idempotent replay
    EvalStream.applyTakedown(spark, d, Seq(1L), takedownId = 0L)
    assert(rows(EvalStream.gateEvalLive(spark, d, "g")) === surv)
    // trailing window keeps its TIMELINE: last-2 = batches {1, 2}, with
    // the removed batch 1 an EMPTY member — i.e. exactly batch 2's rows
    val w2 = rows(EvalQueries.gateEvalFromCounts("g",
      EvalQueries.scoredCounts(scoredDf(slices(2)))))
    assert(rows(EvalQueries.gateEvalFromCounts("g",
      EvalStream.readCountsWindow(spark, d, lastK = 2))) === w2,
      "a removed batch must be an empty window member, not a shift")
    // compact folds physically: same report, no td dirs survive
    EvalStream.compact(spark, d)
    assert(rows(EvalStream.gateEvalLive(spark, d, "g")) === surv)
    assert(!new java.io.File(s"$d/takedown").exists() ||
      new java.io.File(s"$d/takedown").listFiles().forall(
        !_.getName.startsWith("td=")))
    // the removed id stays committed: a replay of batch 1 still no-ops
    EvalStream.applyMicroBatch(spark, scoredDf(slices(1)), d, 1L)
    assert(rows(EvalStream.gateEvalLive(spark, d, "g")) === surv,
      "a removed batch id must stay replay-recognizable after compact")
  }

  test("replay no-ops; unmarked crash debris is swept") {
    val d = freshDir()
    EvalStream.applyMicroBatch(spark, scoredDf(fixture), d, 0L)
    val before = rows(EvalStream.gateEvalLive(spark, d, "g"))
    // replay the SAME batch id with different data: must not double-count
    EvalStream.applyMicroBatch(spark, scoredDf(fixture), d, 0L)
    assert(rows(EvalStream.gateEvalLive(spark, d, "g")) === before)
    // a marker-less dir (crash between write and commit) is ignored by
    // readers and swept by the next micro-batch's recover()
    StreamFs.createMarker(s"$d/counts/batch=9/part-junk")
    assert(rows(EvalStream.gateEvalLive(spark, d, "g")) === before)
    EvalStream.recover(d)
    assert(!StreamFs.exists(s"$d/counts/batch=9"))
  }

  test("a real StreamingQuery drives the monitor end to end") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-evalstream-q").toString
    val mem = MemoryStream[(Long, Boolean, Boolean)]
    val q = EvalStream.start(spark,
      mem.toDF().toDF("score", "label", "decision"),
      s"$tmp/state", s"$tmp/ckpt")
    try {
      val (h1, h2) = fixture.splitAt(fixture.length / 2)
      mem.addData(h1: _*)
      q.processAllAvailable()
      mem.addData(h2: _*)
      q.processAllAvailable()
    } finally q.stop()
    assert(rows(EvalStream.gateEvalLive(spark, s"$tmp/state", "g")) ===
      rows(EvalQueries.gateEval("g", scoredDf(fixture))),
      "stream-driven monitor diverged from the batch operator")
  }

  test("compact: one summed dir, report unchanged, ingest continues") {
    val d = freshDir()
    (0 until 4).foreach(i => EvalStream.applyMicroBatch(spark,
      scoredDf(fixture.zipWithIndex.filter(_._2 % 4 == i).map(_._1)),
      d, i.toLong))
    val before = rows(EvalStream.gateEvalLive(spark, d, "g"))
    EvalStream.compact(spark, d)
    // one data dir; earlier committed ids stay recognizable (markers)
    val dataDirs = StreamFs.listNames(s"$d/counts")
      .filter(_.startsWith("batch="))
      .filter(b => StreamFs.listNames(s"$d/counts/$b")
        .exists(_.endsWith(".parquet")))
    assert(dataDirs === Seq("batch=3"))
    (0 until 4).foreach(i => assert(
      StreamFs.exists(s"$d/counts/batch=$i/_GRAFT_COMMIT")))
    assert(rows(EvalStream.gateEvalLive(spark, d, "g")) === before,
      "compaction changed the live report")
    // replay of a compacted-away id still no-ops; new batches land
    EvalStream.applyMicroBatch(spark, scoredDf(fixture), d, 1L)
    assert(rows(EvalStream.gateEvalLive(spark, d, "g")) === before)
    EvalStream.applyMicroBatch(spark,
      scoredDf(Seq((123456L, true, true))), d, 9L)
    assert(rows(EvalStream.gateEvalLive(spark, d, "g")) !== before)
  }

  test("drift window ≡ batch gateEval over exactly the window's rows; deltas line up") {
    val d = freshDir()
    val slices = (0 until 6).map(i =>
      fixture.zipWithIndex.filter(_._2 % 6 == i).map(_._1))
    slices.zipWithIndex.foreach { case (s, i) =>
      EvalStream.applyMicroBatch(spark, scoredDf(s), d, i.toLong) }
    // window = the trailing 2 batches' rows, nothing else
    val winBatch = rows(EvalQueries.gateEval("g",
      scoredDf(slices(4) ++ slices(5))))
    assert(rows(EvalStream.gateEvalWindow(spark, d, "g", 2)) === winBatch,
      "trailing-window report diverged from the batch operator")
    // fewer dirs than the window: trailing-window semantics = all so far
    assert(rows(EvalStream.gateEvalWindow(spark, d, "g", 99)) ===
      rows(EvalStream.gateEvalLive(spark, d, "g")))
    // the drift row is the two legs' own numbers plus exact deltas
    val drift = EvalStream.gateEvalDrift(spark, d, "g", 2).collect().head
    val life = EvalStream.gateEvalLive(spark, d, "g").collect().head
    val win = EvalStream.gateEvalWindow(spark, d, "g", 2).collect().head
    assert(drift.getAs[Long]("n_life") ===
      life.getAs[Long]("n_pos") + life.getAs[Long]("n_neg"))
    assert(drift.getAs[Long]("n_window") ===
      win.getAs[Long]("n_pos") + win.getAs[Long]("n_neg"))
    assert(drift.getAs[Double]("auc_life") === life.getAs[Double]("auc"))
    assert(drift.getAs[Double]("auc_window") === win.getAs[Double]("auc"))
    assert(drift.getAs[Double]("auc_delta") ===
      BigDecimal(win.getAs[Double]("auc") - life.getAs[Double]("auc"))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("compaction with keepLast ≥ window preserves the drift report exactly") {
    val d = freshDir()
    val slices = (0 until 6).map(i =>
      fixture.zipWithIndex.filter(_._2 % 6 == i).map(_._1))
    slices.zipWithIndex.foreach { case (s, i) =>
      EvalStream.applyMicroBatch(spark, scoredDf(s), d, i.toLong) }
    val before = rows(EvalStream.gateEvalDrift(spark, d, "g", 2))
    val lifeBefore = rows(EvalStream.gateEvalLive(spark, d, "g"))
    // the drift horizon: batches 0-3 collapse, 4 and 5 carry over
    EvalStream.compact(spark, d, keepLast = 2)
    assert(StreamFs.listNames(s"$d/counts").count(_.startsWith("batch=")) === 6,
      "every committed id survives as at least a tombstone")
    assert(rows(EvalStream.gateEvalDrift(spark, d, "g", 2)) === before,
      "window boundaries inside the horizon must survive compaction")
    assert(rows(EvalStream.gateEvalLive(spark, d, "g")) === lifeBefore)
    // replay of an already-compacted id still no-ops
    EvalStream.applyMicroBatch(spark, scoredDf(slices(0)), d, 0L)
    assert(rows(EvalStream.gateEvalLive(spark, d, "g")) === lifeBefore)
    // a FULL merge (keepLast = 0) collapses history: the documented
    // degradation — the trailing window now reads the single merged dir
    EvalStream.compact(spark, d)
    assert(rows(EvalStream.gateEvalWindow(spark, d, "g", 2)) ===
      rows(EvalStream.gateEvalLive(spark, d, "g")))
  }

  test("a live compaction lock blocks ingest loudly; a stale one doesn't") {
    import graft.streaming.CompactionLock
    val d = freshDir()
    EvalStream.applyMicroBatch(spark, scoredDf(fixture.take(100)), d, 0L)
    StreamFs.writeAtomicString(d + ".clock", "")
    intercept[IllegalStateException](EvalStream.applyMicroBatch(spark,
      scoredDf(fixture.drop(100)), d, 1L))
    intercept[java.io.IOException](EvalStream.compact(spark, d))
    StreamFs.touchAt(d + ".clock",
      System.currentTimeMillis() - CompactionLock.StaleMs - 1000)
    EvalStream.applyMicroBatch(spark, scoredDf(fixture.drop(100)), d, 1L)
    val before = rows(EvalStream.gateEvalLive(spark, d, "g"))
    EvalStream.compact(spark, d)
    assert(!StreamFs.exists(d + ".clock"), "lock released after compact")
    assert(rows(EvalStream.gateEvalLive(spark, d, "g")) === before)
  }

  test("bench face: live monitor equals the registered high-NDV gate row") {
    val live = EvalStream.gateEvalLiveBench(spark, sf).collect()(0).toSeq
    val batch = CurationQueries.gateEvalHighNdv(spark, sf).collect()(0).toSeq
    assert(live === batch, "live monitor diverged from the batch gate")
  }
}
