package graft.streaming

import graft.ops.SimilarityQueries
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** STREAMING kNN-GRAPH MAINTENANCE — the graph twin of [[AnnStream]]:
  * keep a searchable kNN graph current as vectors arrive, without ever
  * re-reading the committed corpus. Same batch-dir commit protocol
  * (marker files, replay no-op, crash sweep via [[recover]]).
  *
  *  - [[init]] persists the cell centroids and the hash-bucket stride
  *    from a bootstrap corpus — fixed meta, so candidate generation
  *    depends only on (vector, meta), never on arrival order.
  *  - [[applyMicroBatch]] assigns each new vector its IVF cell and its
  *    md5 hash bucket, generates candidate edges against the COMMITTED
  *    nodes sharing either key (both orientations, plus within-batch
  *    pairs), scores them, and appends each src's batch-local top-k.
  *    Per batch nothing corpus-wide runs: two equi-joins keyed by
  *    cell/hbkt against the committed node table, one bounded window.
  *  - [[readGraph]] is the live adjacency: the global per-src top-k
  *    over all committed batch edge files. Candidate generation is
  *    MONOTONE (cosines are static, batches only add candidates) and
  *    every co-cell/co-bucket pair is generated in exactly the batch
  *    where its later member arrives, so the live graph is
  *    **batch-count-INVARIANT**: ingesting a corpus in 1 batch or in N
  *    equals the same edge list row for row (a global top-k element is
  *    a fortiori in its own batch's top-k — GraphStreamSpec pins this).
  *  - Graph quality: the candidate set is a SUPERSET of
  *    [[SimilarityQueries.knnGraphBlocked]]'s (co-cell pairs ∪ co-bucket
  *    pairs), and per-src top-k recall against the exact graph is
  *    monotone in the candidate set — so the streamed graph's recall is
  *    ≥ the blocked twin's by construction (also spec-pinned). The
  *    NN-Descent refinement rounds stay the BATCH operator's job
  *    ([[SimilarityQueries.knnGraphAnn]]): descent iterates the whole
  *    evolving graph, which is exactly what an incremental ingest must
  *    not re-touch; a deployment re-runs it as a periodic compaction.
  *  - [[searchLive]] serves queries from the committed graph: the
  *    [[SimilarityQueries.annGraphSearch]] hops over readGraph's edges
  *    ∪ the committed hash-RING edges (`rings/batch=N` — k pseudo-random
  *    long links per node, kept UNPRUNED because cosine-ranked top-k
  *    would strand greedy search exactly as it did the batch face).
  *
  * Scale notes (100 TB): ingest cost per batch = |batch| × (cell +
  * bucket co-members) scored pairs, two shuffles keyed by cell/hbkt;
  * the committed node table is read pruned to (cell, hbkt, vec_id, e,
  * norm); search is query-load-bound over the committed edge files. */
object GraphStream {

  import graft.functions.TextFunctions.md5Long
  import graft.functions.VectorFunctions.dotProduct

  private val kNN = SimilarityQueries.knnK

  private def withNorm(df: DataFrame): DataFrame =
    df.withColumn("norm", sqrt(dotProduct(col("e"), col("e"))))

  private def cos(e: org.apache.spark.sql.Column,
                  ce: org.apache.spark.sql.Column,
                  n: org.apache.spark.sql.Column,
                  cn: org.apache.spark.sql.Column) =
    round(dotProduct(e, ce) / (n * cn), 4)

  /** Train-once: persist the cell centroids and the √n hash stride from
    * a bootstrap corpus (vec_id, embedding). No-op when committed. */
  def init(spark: SparkSession, bootstrap: DataFrame, indexDir: String): Unit = {
    if (committedMeta(indexDir)) return
    val v = withNorm(bootstrap.select(col("vec_id"),
      col("embedding").cast("array<double>").as("e")))
    val stride = SimilarityQueries.seedStrideOf(v.count())
    val cents = v.filter(col("vec_id") % stride === 1)
      .select(col("vec_id").as("cell"), col("e").as("ce"),
        col("norm").as("cn"))
    DedupStream.writeAtomically(cents, s"$indexDir/meta/centroids",
      mark = true)
    import spark.implicits._
    DedupStream.writeAtomically(Seq(stride).toDF("stride"),
      s"$indexDir/meta/stride", mark = true)
  }

  private def committedMeta(indexDir: String): Boolean =
    StreamFs.exists(s"$indexDir/meta/centroids/${DedupStream.Marker}") &&
      StreamFs.exists(s"$indexDir/meta/stride/${DedupStream.Marker}")

  /** Start the ingest stream: `vectors` must carry
    * (vec_id long, embedding array). [[init]] must have run. */
  def start(spark: SparkSession, vectors: DataFrame, indexDir: String,
            checkpoint: String, triggerMs: Long = 200L): StreamingQuery =
    vectors.writeStream
      .trigger(Trigger.ProcessingTime(triggerMs))
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyMicroBatch(spark, batch, indexDir, batchId)
      }
      .start()

  /** The committed node table (vec_id, cell, hbkt, e, norm). */
  def readNodes(spark: SparkSession, indexDir: String): DataFrame =
    readBatches(spark, indexDir, "nodes").getOrElse(
      spark.range(0).select(col("id").as("vec_id"), lit(0L).as("cell"),
        lit(0L).as("hbkt"), array().cast("array<double>").as("e"),
        lit(0.0).as("norm")))

  private def readBatches(spark: SparkSession, indexDir: String,
      kind: String): Option[DataFrame] = {
    val dirs = StreamFs.listNames(s"$indexDir/$kind")
      .filter(_.startsWith("batch="))
      .filter(b =>
        StreamFs.exists(s"$indexDir/$kind/$b/${DedupStream.Marker}"))
      .map(b => s"$indexDir/$kind/$b")
    if (dirs.isEmpty) None
    // drop the synthetic batch= partition column — the live view is the
    // UNION of batches; which batch contributed a row is irrelevant
    else Some(spark.read.option("basePath", s"$indexDir/$kind")
      .parquet(dirs: _*).drop("batch"))
  }

  /** One micro-batch: key the new vectors, generate candidate edges
    * against committed ∪ batch nodes sharing a cell or a hash bucket,
    * keep each src's batch-local top-k. Idempotent per `batchId`. */
  def applyMicroBatch(spark: SparkSession, batch: DataFrame,
                      indexDir: String, batchId: Long): Unit = {
    recover(indexDir)
    val nodesDst = s"$indexDir/nodes/batch=$batchId"
    if (StreamFs.exists(s"$nodesDst/${DedupStream.Marker}")) return // replay
    require(committedMeta(indexDir),
      s"GraphStream.init has not run for $indexDir")
    val cents = broadcast(spark.read.parquet(s"$indexDir/meta/centroids"))
    val stride = spark.read.parquet(s"$indexDir/meta/stride")
      .head().getLong(0)
    val v = withNorm(batch.select(col("vec_id"),
      col("embedding").cast("array<double>").as("e")))
    val wAssign = Window.partitionBy(col("vec_id"))
      .orderBy(col("scos").desc, col("cell"))
    val newNodes = v.join(cents)
      .select(col("vec_id"), col("e"), col("norm"), col("cell"),
        cos(col("e"), col("ce"), col("norm"), col("cn")).as("scos"))
      .withColumn("r", row_number().over(wAssign)).filter(col("r") === 1)
      .select(col("vec_id"), col("cell"),
        pmod(md5Long(concat(lit("nnd:"), col("vec_id").cast("string"))),
          lit(stride)).as("hbkt"),
        col("e"), col("norm"))
      .localCheckpoint() // feeds 4 candidate legs + the node write
    val all = readNodes(spark, indexDir).unionByName(newNodes)
    def leg(key: String): DataFrame = {
      val a = newNodes.select(col(key).as("k"), col("vec_id").as("av"),
        col("e").as("ae"), col("norm").as("an"))
      val b = all.select(col(key).as("k"), col("vec_id").as("bv"),
        col("e").as("be"), col("norm").as("bn"))
      a.join(b, Seq("k")).filter(col("av") =!= col("bv"))
        .select(col("av"), col("bv"),
          cos(col("ae"), col("be"), col("an"), col("bn")).as("cosine"))
    }
    // both orientations via one explode (the knnGraphAnn transpose trick)
    val pairs = leg("cell").unionByName(leg("hbkt"))
      .select(explode(array(
        struct(col("av").as("src"), col("bv").as("dst"), col("cosine")),
        struct(col("bv").as("src"), col("av").as("dst"), col("cosine"))))
        .as("p"))
      .select(col("p.src"), col("p.dst"), col("p.cosine"))
      .distinct()
    val wTop = Window.partitionBy(col("src"))
      .orderBy(col("cosine").desc, col("dst"))
    val edges = pairs.withColumn("rk", row_number().over(wTop))
      .filter(col("rk") <= kNN).select("src", "dst", "cosine")
    // hash-RING long links for search: the batch's co-bucket successors
    // by vec_id order, k per node, cosine-UNPRUNED (see scaladoc)
    val wRing = Window.partitionBy(col("hbkt")).orderBy(col("vec_id"))
    val mem = all.select(col("hbkt"), col("vec_id"))
      .withColumn("p", row_number().over(wRing))
    val newIds = newNodes.select(col("vec_id").as("nid"))
    val rings = mem.select(col("hbkt"), col("vec_id").as("src"), col("p"))
      .join(broadcast(newIds), col("src") === col("nid"))
      .withColumn("j", explode(sequence(lit(1), lit(kNN))))
      .select(col("hbkt"), col("src"), (col("p") + col("j")).as("p"))
      .join(mem.withColumnRenamed("vec_id", "dst"), Seq("hbkt", "p"))
      .select("src", "dst")
    writeBatch(edges, s"$indexDir/edges/batch=$batchId")
    writeBatch(rings, s"$indexDir/rings/batch=$batchId")
    writeBatch(newNodes, nodesDst) // nodes LAST: its marker gates replay
  }

  private def writeBatch(df: DataFrame, dst: String): Unit = {
    val tmp = dst + ".tmp"
    StreamFs.delete(tmp)
    df.write.mode("overwrite").parquet(tmp)
    StreamFs.delete(dst)
    StreamFs.renameOrThrow(tmp, dst)
    StreamFs.createMarker(s"$dst/${DedupStream.Marker}")
  }

  /** Sweep unmarked (crashed) batch dirs and stale temp dirs. */
  def recover(indexDir: String): Unit =
    Seq("nodes", "edges", "rings").foreach { kind =>
      StreamFs.listNames(s"$indexDir/$kind").foreach { n =>
        val p = s"$indexDir/$kind/$n"
        if (n.endsWith(".tmp")) StreamFs.delete(p)
        else if (n.startsWith("batch=") &&
          !StreamFs.exists(s"$p/${DedupStream.Marker}")) StreamFs.delete(p)
      }
    }

  /** The LIVE adjacency: global per-src top-k over every committed
    * batch's candidate edges — exact by the monotone-candidates
    * argument in the object scaladoc. */
  def readGraph(spark: SparkSession, indexDir: String): DataFrame = {
    val edges = readBatches(spark, indexDir, "edges").getOrElse(
      return spark.range(0).select(col("id").as("src"),
        lit(1).as("rank"), col("id").as("dst"), lit(0.0).as("cosine")))
    val w = Window.partitionBy(col("src"))
      .orderBy(col("cosine").desc, col("dst"))
    edges.select("src", "dst", "cosine").distinct()
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= kNN)
      .select("src", "rank", "dst", "cosine")
  }

  /** Greedy graph search over the COMMITTED graph + ring long links —
    * [[SimilarityQueries.annGraphSearch]]'s hops against the live
    * streamed index; queries strided from the corpus exactly as the
    * batch faces stride them. */
  def searchLive(spark: SparkSession, dir: String,
      indexDir: String): DataFrame = {
    val g = readGraph(spark, indexDir).select("src", "dst")
      .unionByName(readBatches(spark, indexDir, "rings")
        .map(_.select("src", "dst"))
        .getOrElse(spark.range(0).select(col("id").as("src"),
          col("id").as("dst"))))
    val edges = g.union(g.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().localCheckpoint()
    SimilarityQueries.searchOverGraph(spark, dir, edges)
  }

  // ---- bench-only steady-state face -------------------------------------

  private val streamedDirs =
    scala.collection.concurrent.TrieMap.empty[String, String]

  /** BENCH-ONLY: search over the STREAMED graph index — built lazily
    * once per sf dir by ingesting the corpus in 4 micro-batches (the
    * warmup pass pays it); timed passes report the live-index search
    * cost. GraphStreamSpec pins the index's batch-count invariance and
    * its recall floor. */
  def annGraphSearchStreamed(s: SparkSession, dir: String): DataFrame = {
    val idx = streamedDirs.getOrElseUpdate(dir, {
      val d = java.nio.file.Files.createTempDirectory("graft-graph-stream")
        .toString + "/index"
      val corpus = graft.Tables.embeddings(s, dir)
        .select("vec_id", "embedding")
      init(s, corpus, d)
      (0 until 4).foreach(i => applyMicroBatch(s,
        corpus.filter(pmod(col("vec_id"), lit(4)) === i), d, i.toLong))
      d
    })
    searchLive(s, dir, idx)
  }
}
