package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** North-rule resumability applied to the round-5 streaming kernels: the
  * CEP sequence detector and the historical-dedup operator must resume
  * from a checkpoint — a NEW query over the same source + checkpoint dir
  * reconstructs the flatMapGroupsWithState state store, continues from the
  * committed offset, emits no duplicates, and the union of pre- and
  * post-restart output equals the batch form over the final data. */
class CheckpointRestartSpec extends AnyFunSuite
    with org.scalatest.BeforeAndAfterAll with SparkTestBase {

  // deleteOnExit cannot remove non-empty directories, so the dirs are
  // tracked and recursively deleted when the suite finishes
  private val dirs = scala.collection.mutable.ArrayBuffer.empty[java.io.File]
  private def tmpDir(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft-restart-$tag").toFile
    dirs += d
    d.getAbsolutePath
  }
  override def afterAll(): Unit = {
    def rmrf(f: java.io.File): Unit = {
      if (f.isDirectory) { val fs = f.listFiles(); if (fs != null) fs.foreach(rmrf) }
      f.delete(); ()
    }
    dirs.foreach(rmrf)
    super.afterAll()
  }

  test("CEP detectStream resumes from checkpoint without duplicates") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    // 3 keys × repeating a→b→c runs at 1s spacing (ms-resolution ts)
    val evs = (for {
      key <- 0L until 3L
      i <- 0 until 30
    } yield Patterns.Ev(key, new Timestamp(1700000000000L + i * 1000L),
      key * 1000 + i, Seq("a", "b", "c")(i % 3))).sortBy(e => (e.ts.getTime, e.evId))
    val steps = Seq("a", "b", "c")
    val span = 10000L

    val src = MemoryStream[Patterns.Ev]
    val cp = tmpDir("cep")
    val outDir = tmpDir("cep-out")
    // parquet file sink: fault-tolerant (memory sink refuses checkpoint
    // recovery), with its own commit log — reading the dir back yields
    // exactly the committed rows across both query incarnations
    def start() =
      // 1 ms delay, not 0: Spark's pre-operator late filter drops rows
      // tying the watermark at a batch boundary (see Patterns scaladoc)
      Patterns.detectStream(src.toDS().withWatermark("ts", "1 millisecond"), steps, span)
        .writeStream.format("parquet").option("path", outDir)
        .option("checkpointLocation", cp).outputMode("append").start()

    val q1 = start()
    src.addData(evs.take(40))
    q1.processAllAvailable()
    q1.stop()
    assert(spark.read.parquet(outDir).count() > 0, "pre-restart output expected")

    val q2 = start()
    src.addData(evs.drop(40))
    // sentinel closes every real window under the watermark
    src.addData(Patterns.Ev(-1L, new Timestamp(1700000000000L + 1000000L), -1L, "z"))
    q2.processAllAvailable()
    src.addData(Patterns.Ev(-1L, new Timestamp(1700000000000L + 2000000L), -2L, "z"))
    q2.processAllAvailable()
    q2.stop()

    val streamed = spark.read.parquet(outDir)
      .where(col("key") =!= -1L)
      .collect().map(_.toSeq).toSeq
    assert(streamed.distinct.size == streamed.size, "restart must not duplicate matches")
    val rows = evs.map(e => (e.key, e.ts, e.evId, e.tag))
      .toDF("key", "ts", "ev_id", "tag")
    val batch = Patterns.detectBatch(rows, steps, span)
      .select(col("key"), col("start_ts").as("startTs"), col("end_ts").as("endTs"),
        col("start_id").as("startId"))
      .collect().map(_.toSeq).toSeq
    assert(streamed.toSet == batch.toSet)
    assert(batch.nonEmpty)
  }

  test("dedupStream resumes from checkpoint without duplicates") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rnd = new scala.util.Random(29L)
    def words(k: Int, tag: String) =
      (0 until k).map(_ => s"$tag${rnd.nextInt(100000)}").mkString(" ")
    val bases = (0 until 10).map(i => (i.toLong, words(25, s"b$i")))
    // mutants arrive AFTER the restart so their keepers come from state
    // rebuilt out of the checkpoint, not from the same micro-batch
    val mutants = bases.map { case (id, t) => (100L + id, t + " zz") }

    val src = MemoryStream[(Long, String)]
    val cp = tmpDir("dedup")
    val outDir = tmpDir("dedup-out")
    def start() =
      DedupStream.dedupStream(src.toDF().toDF("doc_id", "text"), "doc_id", "text")
        .writeStream.format("parquet").option("path", outDir)
        .option("checkpointLocation", cp).outputMode("append").start()

    val q1 = start()
    src.addData(bases)
    q1.processAllAvailable()
    q1.stop()

    val q2 = start()
    src.addData(mutants)
    q2.processAllAvailable()
    q2.stop()

    val streamed = spark.read.parquet(outDir)
      .groupBy("doc_id").agg(min("dup_of").as("dup_of"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every mutant must resolve to its base — provable only if the bucket
    // state (the bases' signatures) survived the restart
    val expectedKeepers = mutants.map { case (id, _) => id -> (id - 100L) }.toMap
    assert(streamed.view.filterKeys(_ >= 100L).toMap == expectedKeepers)
  }

  test("resample stream resumes from checkpoint: grid hours emitted after restart carry pre-restart values") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val H = ResampleStream.HourUs
    // key 1: value 1.5 set pre-restart; every later event arrives
    // post-restart, so grid hours 1..3 are emitted by the restarted query
    // and hour 1's value (1.5) is provable only from checkpointed state
    val pre = Seq(ResampleStream.ev(1L, 5L * 60 * 1000000, 10L, 1.5))
    val post = Seq(
      ResampleStream.ev(1L, H + 40L * 60 * 1000000, 11L, 2.5),
      ResampleStream.ev(1L, 3 * H + 1L, 12L, 3.5))
    val all = pre ++ post

    val src = MemoryStream[ResampleStream.RsEv]
    val cp = tmpDir("rs")
    val outDir = tmpDir("rs-out")
    def start() =
      ResampleStream.resampleStream(
          src.toDS().withWatermark("ts", "1 millisecond"))
        .writeStream.format("parquet").option("path", outDir)
        .option("checkpointLocation", cp).outputMode("append").start()

    val q1 = start()
    src.addData(pre)
    q1.processAllAvailable()
    q1.stop()

    val q2 = start()
    src.addData(post)
    q2.processAllAvailable()
    q2.stop()

    val streamed = spark.read.parquet(outDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(streamed.distinct.size == streamed.size,
      "restart must not duplicate grid rows")
    // batch reference over the final data
    val want = Set((1L, H, 1.5), (1L, 2 * H, 2.5), (1L, 3 * H, 2.5))
    assert(streamed.toSet == want)
    assert(all.size == 3) // fixture shape guard
  }

  test("funnel state machine resumes from checkpoint: stages attained pre-restart survive") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = 1700000000000L
    def fev(u: Long, ms: Long, tag: String) =
      FunnelStream.Ev(u, new Timestamp(base + ms), tag)
    // u1 attains view+click pre-restart, purchase post-restart: depth 3 is
    // provable only if the checkpointed stage timestamps survived. u2's
    // click post-restart must respect the PRE-restart view's strict
    // inequality. u3 exists only post-restart.
    val pre = Seq(fev(1, 1000, "view"), fev(1, 2000, "click"), fev(2, 2500, "view"))
    val post = Seq(fev(1, 3000, "purchase"), fev(2, 4000, "click"), fev(3, 5000, "view"))

    val src = MemoryStream[FunnelStream.Ev]
    val cp = tmpDir("funnel")
    val outDir = tmpDir("funnel-out")
    def start() =
      FunnelStream.funnelStream(
          src.toDS().withWatermark("ts", "1 minute"),
          Seq("view", "click", "purchase"), gapMs = 60000L)
        .toDF()
        .writeStream.format("parquet").option("path", outDir)
        .option("checkpointLocation", cp).outputMode("append").start()

    val q1 = start()
    src.addData(pre)
    q1.processAllAvailable()
    q1.stop()

    val q2 = start()
    src.addData(post)
    q2.processAllAvailable()
    val far = base + 10000000L
    for (off <- Seq(0L, 1000L)) {
      src.addData(FunnelStream.Ev(-1L, new Timestamp(far + off), "view"))
      q2.processAllAvailable()
    }
    q2.stop()

    val streamed = spark.read.parquet(outDir)
      .where(col("user_id") =!= -1L)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toSeq
    assert(streamed.distinct.size == streamed.size,
      "restart must not duplicate funnel rows")
    assert(streamed.toMap == Map(1L -> 3, 2L -> 2, 3L -> 1))
  }

  test("trajectory assembly resumes from checkpoint: turns buffered pre-restart survive") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = 1700000000000L
    def tt(c: Long, tie: Long, a: String, ms: Long) =
      TrajectoryStream.TTurn(c, tie, a, new Timestamp(base + ms))
    // conv 1 straddles the restart (a,b pre + c post): its full trajectory
    // is provable only if the buffered actions survived the checkpoint.
    // conv 2 is entirely pre-restart (timeout fires post-restart), conv 3
    // entirely post-restart.
    val pre = Seq(tt(1, 1, "a", 1000), tt(1, 2, "b", 2000),
      tt(2, 1, "p", 1500), tt(2, 2, "q", 2500))
    val post = Seq(tt(1, 3, "c", 3000), tt(3, 1, "z", 4000))

    val src = MemoryStream[TrajectoryStream.TTurn]
    val cp = tmpDir("traj")
    val outDir = tmpDir("traj-out")
    def start() =
      TrajectoryStream.trajStream(
          src.toDS().withWatermark("ts", "1 minute"), gapMs = 60000L).toDF()
        .writeStream.format("parquet").option("path", outDir)
        .option("checkpointLocation", cp).outputMode("append").start()

    val q1 = start()
    src.addData(pre)
    q1.processAllAvailable()
    q1.stop()

    val q2 = start()
    src.addData(post)
    q2.processAllAvailable()
    val far = base + 10000000L
    for (off <- Seq(0L, 1000L)) {
      src.addData(TrajectoryStream.TTurn(-1L, 0L, "", new Timestamp(far + off)))
      q2.processAllAvailable()
    }
    q2.stop()

    val streamed = spark.read.parquet(outDir).where(col("conv_id") =!= -1L)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toSeq
    assert(streamed.distinct.size == streamed.size,
      "restart must not duplicate trajectories")
    assert(streamed.toMap == Map(1L -> "a|b|c", 2L -> "p|q", 3L -> "z"))
  }

  test("native stream-stream interval join resumes from checkpoint") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = 1700000000000L
    // 3 keys; lefts every 2s, rights every 3s — rights match lefts up to 5s
    // ahead of them, with plenty of cross-restart pairs (a right buffered
    // pre-restart joining a left that only arrives post-restart, and vice
    // versa — provable only if BOTH sides' join state survived)
    val lefts = for (k <- 0L until 3L; i <- 0 until 20)
      yield (k, new Timestamp(base + i * 2000L), k * 1000 + i)
    val rights = for (k <- 0L until 3L; i <- 0 until 14)
      yield (k, new Timestamp(base + i * 3000L), 10000 + k * 1000 + i)
    val lSorted = lefts.sortBy(_._2.getTime)
    val rSorted = rights.sortBy(_._2.getTime)

    val srcL = MemoryStream[(Long, Timestamp, Long)]
    val srcR = MemoryStream[(Long, Timestamp, Long)]
    val cp = tmpDir("ssj")
    val outDir = tmpDir("ssj-out")
    def start() = {
      val l = srcL.toDF().toDF("k", "lts", "lid").withWatermark("lts", "1 minute")
      val r = srcR.toDF().toDF("k2", "rts", "rid").withWatermark("rts", "1 minute")
      l.join(r, col("k") === col("k2") &&
          col("rts") >= col("lts") - expr("INTERVAL 5 SECONDS") &&
          col("rts") <= col("lts"))
        .select("lid", "rid")
        .writeStream.format("parquet").option("path", outDir)
        .option("checkpointLocation", cp).outputMode("append").start()
    }

    // hold back each key's i==2 right until after the restart: it arrives
    // ~10-30 s late (inside the 1-minute watermark delay) and must still
    // join PRE-restart lefts — the reverse straddle direction, impossible
    // with purely time-sorted feeds since the condition needs rt <= lt
    val held = rSorted.filter(_._3 % 1000 == 2) // i == 2 for every key
    val heldIds = held.map(_._3).toSet
    val q1 = start()
    srcL.addData(lSorted.take(25))
    srcR.addData(rSorted.take(18).filterNot(r => heldIds(r._3)))
    q1.processAllAvailable()
    q1.stop()

    val q2 = start()
    srcR.addData(held) // late but within the watermark delay
    srcL.addData(lSorted.drop(25)); srcR.addData(rSorted.drop(18))
    q2.processAllAvailable()
    q2.stop()

    val streamed = spark.read.parquet(outDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(streamed.distinct.size == streamed.size,
      "restart must not duplicate join results")
    val expected = (for {
      (lk, lt, lid) <- lefts
      (rk, rt, rid) <- rights
      if lk == rk && rt.getTime >= lt.getTime - 5000L && rt.getTime <= lt.getTime
    } yield (lid, rid)).toSet
    assert(streamed.toSet == expected)
    // non-vacuous: pairs exist that straddle the restart in BOTH directions
    val preL = lSorted.take(25).map(_._3).toSet
    val preR = rSorted.take(18).map(_._3).toSet -- heldIds
    assert(expected.exists { case (l, r) => preR(r) && !preL(l) },
      "expected a pre-restart right joining a post-restart left")
    assert(expected.exists { case (l, r) => preL(l) && heldIds(r) },
      "expected a pre-restart left joining a held-back late right")
  }

  test("incremental SFT kernel resumes from checkpoint: pruned context survives") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = 1767225600000L
    def turn(c: String, i: Int): SftStream.Turn =
      SftStream.Turn(c, i, if (i % 2 == 0) "assistant" else "user",
        s"$c-t$i", new Timestamp(base + i * 120000L))
    val all = for (c <- Seq("a", "b", "c"); i <- 1 to 9) yield turn(c, i)

    val src = MemoryStream[SftStream.Turn]
    val cp = tmpDir("sft")
    val outDir = tmpDir("sft-out")
    // 3-minute delay over 2-minute turn spacing: the watermark seals (and
    // the kernel PRUNES) early turns during phase 1, so phase 2's pairs
    // depend on context that only exists in the checkpointed, pruned state
    def start() =
      SftStream.sftStream(
          src.toDS().withWatermark("ts", "3 minutes"),
          targetRole = "assistant", ctxTurns = 4, gapMs = 60000L)
        .writeStream.format("parquet").option("path", outDir)
        .option("checkpointLocation", cp).outputMode("append").start()

    val ordered = all.sortBy(t => (t.ts.getTime, t.convId))
    val (pre, post) = ordered.splitAt(18) // through turn 6 of each conv
    val q1 = start()
    pre.grouped(6).foreach { b => src.addData(b); q1.processAllAvailable() }
    q1.stop()
    val preRows = spark.read.parquet(outDir).count()
    assert(preRows > 0, "sealed-prefix pairs must be on disk before the restart")

    val q2 = start()
    src.addData(post)
    q2.processAllAvailable()
    for (off <- Seq(0L, 1000L)) {
      src.addData(SftStream.Turn("~s", 1, "", "",
        new Timestamp(base + 9 * 120000L + 180000L + 7200000L + off)))
      q2.processAllAvailable()
    }
    q2.stop()

    val streamed = spark.read.parquet(outDir).where(col("conv_id") =!= "~s")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getString(3)))
      .toSeq
    assert(streamed.distinct.size == streamed.size,
      "restart must not duplicate pairs")
    import scala.jdk.CollectionConverters._
    val batchDf = spark.createDataFrame(
      all.map(t => org.apache.spark.sql.Row(t.convId, t.turnIdx, t.role, t.text)).asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("conv_id", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("turn_idx", org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("role", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType))))
    val batch = graft.transcripts.TranscriptDocs.sftPairs(batchDf, "assistant", 4)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getString(3)))
      .toSet
    assert(streamed.toSet == batch)
    // non-vacuous: a post-restart pair whose prompt references pre-restart
    // turns — the context recovered from the checkpointed pruned state
    assert(batch.exists { case (_, idx, prompt, _) =>
      idx == 8L && prompt.contains("t4") },
      "turn 8's prompt must carry context sealed before the restart")
    assert(streamed.size.toLong > preRows,
      "pairs must also be emitted after the restart")
  }
}
