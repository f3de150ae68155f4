package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** Pins the DSv2 edge connector: rows equal the text-projection reader on
  * the same shards (comments/blanks/malformed skipped, default weight),
  * filters actually reach the scan (PushedFilters in the plan, no
  * residual Filter node for pushed predicates), projection prunes the
  * read schema, and parallelism is one partition per shard file. */
class EdgeTextV2Spec extends AnyFunSuite with SparkTestBase {

  private def writeShards(): String = {
    val dir = Files.createTempDirectory("graft_edges_v2_spec").toFile
    val shards = Seq(
      Seq("# comment", "1 2", "2 3 5", "", "  7   9  ", "bad line x", "3 1"),
      Seq("4 5", "5 6 -1", "# more", "6 4"),
      Seq("10 11", "11 12", "12 10 2"))
    shards.zipWithIndex.foreach { case (lines, i) =>
      val f = new java.io.File(dir, f"part-$i%05d.txt")
      val w = new java.io.PrintWriter(f, "UTF-8")
      try lines.foreach(w.println) finally w.close()
    }
    dir.getAbsolutePath
  }

  private def v2(path: String) =
    spark.read.format("graft.sources.v2.EdgeTextV2")
      .option("path", path).load()

  test("rows == EdgeTextSource on the same shards") {
    val path = writeShards()
    val got = v2(path).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val expect = EdgeTextSource.read(spark, path).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expect && got.contains((7L, 9L, 1L)) && got.contains((5L, 6L, -1L)))
  }

  test("filters are pushed to the scan and rows are correct") {
    val path = writeShards()
    val q = v2(path).where(col("src") >= 4L && col("w") === 1L)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("GreaterThanOrEqual(src,4)"),
      s"src filter must reach the scan:\n$plan")
    assert(plan.contains("EqualTo(w,1)"), s"w filter must reach the scan:\n$plan")
    assert(!plan.contains("Filter ("), // pushed exactly: no residual Filter node
      s"pushed predicates must not replan as a post-scan Filter:\n$plan")
    val got = q.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((4L, 5L), (6L, 4L), (7L, 9L), (10L, 11L), (11L, 12L)))
  }

  test("compound predicates (OR/AND/NOT) push whole and evaluate in the reader") {
    val path = writeShards()
    val q = v2(path).where((col("src") === 1L || col("dst") === 4L) && !(col("w") === 5L))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("Or(EqualTo(src,1),EqualTo(dst,4))"),
      s"OR must reach the scan:\n$plan")
    assert(!plan.contains("Filter ("),
      s"compound pushed predicates must leave no residual Filter:\n$plan")
    assert(q.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((1L, 2L), (6L, 4L)))
  }

  test("OR-of-ranges is refuted by shard stats at planning") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_edges_v2_or").toFile.getAbsolutePath
    Seq.tabulate(30)(i => (i.toLong, (i + 1000).toLong, 1L))
      .toDF("src", "dst", "w")
      .write.format("graft.sources.v2.EdgeTextV2")
      .option("path", dir).option("layout", "src")
      .option("layoutPartitions", "3").mode("append").save()
    // both disjuncts land in the LAST shard: the other two are skipped
    val q = v2(dir).where(col("src") === 22L || col("src") >= 28L)
    assert(q.rdd.getNumPartitions == 1,
      "stats must refute the whole disjunction for non-matching shards")
    assert(q.collect().map(_.getLong(0)).sorted.toSeq == Seq(22L, 28L, 29L))
    // a disjunct matching an earlier shard keeps that shard planned
    val q2 = v2(dir).where(col("src") === 2L || col("src") >= 28L)
    assert(q2.rdd.getNumPartitions == 2)
    assert(q2.collect().map(_.getLong(0)).sorted.toSeq == Seq(2L, 28L, 29L))
  }

  test("micro-batch stream: file-count offsets replay each shard exactly once") {
    val path = writeShards()
    val name = "edge_v2_stream_sink"
    val q = spark.readStream.format("graft.sources.v2.EdgeTextV2")
      .option("path", path).load()
      .writeStream.format("memory").queryName(name).outputMode("append")
      .start()
    try {
      q.processAllAvailable()
      val afterFirst = spark.table(name).count()
      assert(afterFirst == 10, s"expected all 10 parsed edges, got $afterFirst")
      // a shard arriving later is picked up as its own increment — and
      // earlier shards are NOT re-emitted (offset is the file count)
      val w = new java.io.PrintWriter(new java.io.File(path, "part-99999.txt"), "UTF-8")
      try { w.println("100 200"); w.println("200 300 4") } finally w.close()
      q.processAllAvailable()
      val rows = spark.table(name).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(rows.length == 12, s"expected 12 rows after the late shard, got ${rows.length}")
      assert(rows.count(_ == ((100L, 200L, 1L))) == 1)
      assert(rows.count(_ == ((1L, 2L, 1L))) == 1, "early shard must not re-emit")
    } finally q.stop()
  }

  test("write path: staged-then-renamed shards round-trip; overwrite truncates") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_edges_v2_write").toFile.getAbsolutePath
    val edges = Seq((1L, 2L, 1L), (2L, 3L, 5L), (3L, 1L, 1L))
      .toDF("src", "dst", "w")
    edges.write.format("graft.sources.v2.EdgeTextV2")
      .option("path", dir).mode("append").save()
    assert(!new java.io.File(dir, "_staging").exists(), "staging must be cleaned")
    val back = v2(dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(back == Set((1L, 2L, 1L), (2L, 3L, 5L), (3L, 1L, 1L)))
    // overwrite replaces prior shards atomically at commit
    Seq((9L, 9L, 2L)).toDF("src", "dst", "w")
      .write.format("graft.sources.v2.EdgeTextV2")
      .option("path", dir).mode("overwrite").save()
    val after = v2(dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(after == Set((9L, 9L, 2L)))
  }

  test("streaming sink: epoch-committed shards; replayed epoch is a no-op") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = Files.createTempDirectory("graft_edges_v2_ssink").toFile.getAbsolutePath
    val ckpt = Files.createTempDirectory("graft_edges_v2_ckpt").toFile.getAbsolutePath
    val src = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long, Long)]
    val q = src.toDF().toDF("src", "dst", "w")
      .writeStream.format("graft.sources.v2.EdgeTextV2")
      .option("path", dir).option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try {
      src.addData((1L, 2L, 1L), (2L, 3L, 5L)); q.processAllAvailable()
      src.addData((3L, 1L, 1L)); q.processAllAvailable()
    } finally q.stop()
    val back = v2(dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(back == Set((1L, 2L, 1L), (2L, 3L, 5L), (3L, 1L, 1L)))

    // epoch replay after recovery: re-committing the same epoch with a
    // freshly staged duplicate must NOT double the shard
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(dir), new org.apache.hadoop.conf.Configuration())
    val published = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .filter(_.isFile).map(_.getPath.getName).sorted
    val replayedName = published.head
    val staged = new org.apache.hadoop.fs.Path(s"$dir/_staging/$replayedName-replay")
    val w = fs.create(staged, true)
    w.write("999 999 999\n".getBytes("UTF-8")); w.close()
    new graft.sources.v2.EdgeStreamingWrite(dir).commit(0L,
      Array(graft.sources.v2.EdgeCommitMessage(staged.toString, replayedName)))
    val after = v2(dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(after == back, "replayed epoch must not change published shards")
    assert(!fs.exists(staged), "replayed staging file must be dropped")
  }

  test("time travel (asOfEpoch), _epoch metadata column, snapshots listing") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = Files.createTempDirectory("graft_edges_v2_tt").toFile.getAbsolutePath
    val ckpt = Files.createTempDirectory("graft_edges_v2_tt_ckpt").toFile.getAbsolutePath
    // base snapshot: one batch-committed shard (epoch -1)
    Seq((1L, 2L, 1L)).toDF("src", "dst", "w")
      .write.format("graft.sources.v2.EdgeTextV2")
      .option("path", dir).mode("append").save()
    // two streaming commit epochs on top
    val src = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long, Long)]
    val q = src.toDF().toDF("src", "dst", "w")
      .writeStream.format("graft.sources.v2.EdgeTextV2")
      .option("path", dir).option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try {
      src.addData((10L, 11L, 1L)); q.processAllAvailable() // epoch 0
      src.addData((20L, 21L, 1L)); q.processAllAvailable() // epoch 1
    } finally q.stop()

    assert(v2(dir).count() == 3, "live read sees base + both epochs")

    // as-of snapshot: epoch-1 shards are not planned, not filtered
    val asOf0 = spark.read.format("graft.sources.v2.EdgeTextV2")
      .option("path", dir).option("asOfEpoch", "0").load()
    assert(asOf0.collect().map(_.getLong(0)).toSet == Set(1L, 10L))

    // _epoch: hidden from *, selectable by name, per-shard constant
    assert(!v2(dir).schema.fieldNames.contains("_epoch"))
    val withE = v2(dir).select(col("src"), col("_epoch")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(withE == Map(1L -> -1L, 10L -> 0L, 20L -> 1L))

    // an _epoch predicate reaches the scan AND prunes shards at planning
    val pruned = v2(dir).where(col("_epoch") === 1L).select("src")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("EqualTo(_epoch,1)"),
      s"_epoch predicate must reach the scan:\n$plan")
    assert(pruned.rdd.getNumPartitions == 1,
      "shards of other epochs must be pruned before reading")
    assert(pruned.collect().map(_.getLong(0)).toSeq == Seq(20L))

    // snapshots metadata listing — one row per commit epoch
    val snaps = graft.sources.v2.EdgeTextV2.snapshots(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(snaps.map(_._1) == Seq(-1L, 0L, 1L), s"epochs wrong: $snaps")
    assert(snaps.forall(_._2 >= 1L), s"every epoch has >=1 shard: $snaps")
  }

  test("compaction: fold epochs into a new base; atomic marker; expiry") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = Files.createTempDirectory("graft_edges_v2_cmp").toFile.getAbsolutePath
    val ckpt = Files.createTempDirectory("graft_edges_v2_cmp_ckpt").toFile.getAbsolutePath
    Seq((1L, 2L, 1L)).toDF("src", "dst", "w")
      .write.format("graft.sources.v2.EdgeTextV2")
      .option("path", dir).mode("append").save()
    val src = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long, Long)]
    val q = src.toDF().toDF("src", "dst", "w")
      .writeStream.format("graft.sources.v2.EdgeTextV2")
      .option("path", dir).option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try {
      src.addData((10L, 11L, 1L)); q.processAllAvailable() // epoch 0
      src.addData((20L, 21L, 1L)); q.processAllAvailable() // epoch 1
      src.addData((30L, 31L, 1L)); q.processAllAvailable() // epoch 2
    } finally q.stop()
    def all() = v2(dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val before = all()
    assert(before.size == 4)

    // crash window A: a compaction that died BEFORE its marker leaves
    // uncommitted data files — they must be invisible
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(dir), new org.apache.hadoop.conf.Configuration())
    val orphan = new org.apache.hadoop.fs.Path(s"$dir/compact-1-00000.txt")
    val w0 = fs.create(orphan, true)
    w0.write("777 777 777\n".getBytes("UTF-8")); w0.close()
    assert(all() == before, "uncommitted compact data must be invisible")

    // real compaction of epochs <= 1 (the retry path also clears orphan)
    graft.sources.v2.EdgeTextV2.compact(spark, dir, upToEpoch = 1L)
    assert(all() == before, "compaction must preserve the row multiset")
    val epochs = v2(dir).select(col("src"), col("_epoch")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(epochs == Map(1L -> -1L, 10L -> -1L, 20L -> -1L, 30L -> 2L),
      s"compacted history must read as base: $epochs")
    val snaps = graft.sources.v2.EdgeTextV2.snapshots(spark, dir).collect()
      .map(_.getLong(0)).toSeq
    assert(snaps == Seq(-1L, 2L), s"snapshots after compaction: $snaps")

    // crash window B: marker committed, a consumed shard's delete lost —
    // recreate a stale base shard; it must stay invisible
    val stale = new org.apache.hadoop.fs.Path(s"$dir/part-99999.txt")
    val w1 = fs.create(stale, true)
    w1.write("888 888 888\n".getBytes("UTF-8")); w1.close()
    assert(all() == before, "shards consumed by a committed compaction stay invisible")
    fs.delete(stale, false)

    // expired snapshots are unreadable; the boundary epoch still is
    val ex = intercept[Exception] {
      spark.read.format("graft.sources.v2.EdgeTextV2")
        .option("path", dir).option("asOfEpoch", "0").load().collect()
    }
    assert(ex.getMessage.contains("expired"), s"got: ${ex.getMessage}")
    val asOf1 = spark.read.format("graft.sources.v2.EdgeTextV2")
      .option("path", dir).option("asOfEpoch", "1").load()
    assert(asOf1.collect().map(_.getLong(0)).toSet == Set(1L, 10L, 20L))

    // idempotent re-run, then a later generation consumes everything
    graft.sources.v2.EdgeTextV2.compact(spark, dir, upToEpoch = 1L)
    assert(all() == before)
    graft.sources.v2.EdgeTextV2.compact(spark, dir, upToEpoch = 2L)
    assert(all() == before)
    val snaps2 = graft.sources.v2.EdgeTextV2.snapshots(spark, dir).collect()
      .map(_.getLong(0)).toSeq
    assert(snaps2 == Seq(-1L), s"single base generation after full compaction: $snaps2")
  }

  test("stats trailer: non-matching shards are skipped at planning; " +
    "legacy shards never are; compaction preserves skipping") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_edges_v2_stats").toFile.getAbsolutePath
    // three connector-written shards with disjoint src ranges
    Seq.tabulate(30)(i => (i.toLong, (i + 1000).toLong, 1L))
      .toDF("src", "dst", "w")
      .repartitionByRange(3, col("src"))
      .write.format("graft.sources.v2.EdgeTextV2")
      .option("path", dir).mode("append").save()
    val unfiltered = v2(dir)
    val total = unfiltered.rdd.getNumPartitions
    assert(total == 3, s"expected 3 range shards, got $total")

    // a pushed src bound provably excludes two of the three shards:
    // they are dropped at planning, before any data byte is read
    val hi = v2(dir).where(col("src") >= 25L)
    assert(hi.rdd.getNumPartitions == 1,
      "stats-pruned scan must plan only the matching shard")
    assert(hi.collect().map(_.getLong(0)).sorted.toSeq == (25L to 29L).toSeq)
    // bounds that exclude every shard plan an empty scan
    assert(v2(dir).where(col("src") > 999L).count() == 0)
    assert(v2(dir).where(col("src") > 999L).rdd.getNumPartitions == 0)
    // a predicate on a non-stat column cannot skip anything
    assert(v2(dir).select(col("src"), col("_epoch"))
      .where(col("_epoch") === -1L).rdd.getNumPartitions == 3)

    // a hand-written (trailer-less) shard is never skipped — its rows
    // still surface through the reader's row-level filter backstop
    val w = new java.io.PrintWriter(new java.io.File(dir, "part-zz.txt"), "UTF-8")
    try { w.println("50 60"); w.println("3 4") } finally w.close()
    val mixed = v2(dir).where(col("src") >= 25L)
    assert(mixed.rdd.getNumPartitions == 2,
      "legacy shard must stay planned alongside the one matching stats shard")
    assert(mixed.collect().map(_.getLong(0)).sorted.toSeq ==
      ((25L to 29L) :+ 50L).toSeq)

    // compaction rewrites through the connector's own writer, so the new
    // generation carries fresh trailers and skipping still works
    graft.sources.v2.EdgeTextV2.compact(spark, dir, upToEpoch = 0L)
    val afterCompact = v2(dir).where(col("src") === 50L)
    assert(afterCompact.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((50L, 60L)))
    assert(afterCompact.rdd.getNumPartitions < v2(dir).rdd.getNumPartitions,
      "post-compaction shards must again be stats-skippable")
  }

  test("layout-on-write: the Write's required distribution range-clusters " +
    "shards, so stats skipping needs no caller repartition") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_edges_v2_lay").toFile.getAbsolutePath
    // deliberately scrambled input partitioning: the connector itself
    // must declare the ordered distribution for the shards to be tight
    Seq.tabulate(40)(i => ((i * 17 % 40).toLong, (i + 1000).toLong, 1L))
      .toDF("src", "dst", "w")
      .repartition(4) // hash-scatter, ranges fully overlap without layout
      .write.format("graft.sources.v2.EdgeTextV2")
      .option("path", dir).option("layout", "src")
      .option("layoutPartitions", "4").mode("append").save()
    // every shard's stats interval is pairwise disjoint on src
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(dir), new org.apache.hadoop.conf.Configuration())
    val bounds = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_"))
      .flatMap(s => graft.sources.v2.EdgeTextV2.readStats(s.getPath.toString))
      .filter(_.count > 0)
      .map(st => (st.minSrc, st.maxSrc)).sortBy(_._1)
    assert(bounds.length > 1, s"layout write must produce multiple shards: ${bounds.toSeq}")
    bounds.sliding(2).foreach { case Array((_, aHi), (bLo, _)) =>
      assert(aHi < bLo, s"shard src ranges must be disjoint: ${bounds.toSeq}")
    case _ => () }
    // and a selective read therefore plans a strict subset of the shards
    val sel = v2(dir).where(col("src") === 0L)
    assert(sel.rdd.getNumPartitions < bounds.length,
      "range-layouted shards must be stats-skippable")
    assert(sel.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((0L, 1000L)))
    // rows survive the connector-planned exchange + sort intact
    assert(v2(dir).count() == 40)
    // a layout column outside the schema is rejected up front
    val ex = intercept[Exception] {
      Seq((1L, 2L, 1L)).toDF("src", "dst", "w")
        .write.format("graft.sources.v2.EdgeTextV2")
        .option("path", dir).option("layout", "nope").mode("append").save()
    }
    assert(ex.getMessage.contains("layout columns"), ex.getMessage)
  }

  test("two batch appends with colliding partition ids both survive") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_edges_v2_app").toFile.getAbsolutePath
    Seq((1L, 2L, 1L)).toDF("src", "dst", "w").coalesce(1)
      .write.format("graft.sources.v2.EdgeTextV2")
      .option("path", dir).mode("append").save()
    Seq((3L, 4L, 1L)).toDF("src", "dst", "w").coalesce(1)
      .write.format("graft.sources.v2.EdgeTextV2")
      .option("path", dir).mode("append").save()
    val back = v2(dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(back == Set((1L, 2L, 1L), (3L, 4L, 1L)),
      "second append must not replace the first append's shard")
    // both read as the base snapshot (no accidental epoch parse)
    assert(v2(dir).select(col("_epoch")).collect().map(_.getLong(0)).toSet == Set(-1L))
  }

  test("scan reports post-pruning statistics; pruned snapshot reads shrink") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = Files.createTempDirectory("graft_edges_v2_st").toFile.getAbsolutePath
    val ckpt = Files.createTempDirectory("graft_edges_v2_st_ckpt").toFile.getAbsolutePath
    val src = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long, Long)]
    val q = src.toDF().toDF("src", "dst", "w")
      .writeStream.format("graft.sources.v2.EdgeTextV2")
      .option("path", dir).option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try {
      src.addData((1L, 2L, 1L), (2L, 3L, 1L)); q.processAllAvailable() // epoch 0
      src.addData((10L, 11L, 1L)); q.processAllAvailable()             // epoch 1
    } finally q.stop()

    def scanStats(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
          (r.stats.sizeInBytes, r.stats.rowCount)
      }.head

    val (fullBytes, _) = scanStats(v2(dir))
    assert(fullBytes > 0 && fullBytes < Long.MaxValue,
      s"scan must report real bytes, got $fullBytes")
    // epoch pruning shrinks the REPORTED size, not just the read
    val (prunedBytes, _) = scanStats(v2(dir).where(col("_epoch") === 1L))
    assert(prunedBytes < fullBytes,
      s"epoch-pruned scan must report fewer bytes: $prunedBytes vs $fullBytes")
    // when every planned shard has a trailer, the exact row count surfaces
    val (_, rowCount) = scanStats(v2(dir).where(col("src") >= 10L))
    assert(rowCount.contains(BigInt(1)),
      s"stats-planned scan must report the trailer row count, got $rowCount")

    // end to end: the small connector table wins a broadcast join on
    // REPORTED stats (a DSv2 relation without them defaults to
    // Long.MaxValue and can never be the broadcast side)
    // the other side's estimate must EXCEED the broadcast threshold, so
    // the only broadcastable side is the connector's — the plan (never
    // executed) can only pick BroadcastHashJoin via the reported stats
    val big = spark.range(0, 10000000L).select(col("id").as("src"))
    val joined = big.join(v2(dir), "src")
    val static = joined.queryExecution.sparkPlan
    val broadcastSides = static.collect {
      case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec =>
        b.buildSide.toString
    }
    assert(broadcastSides.nonEmpty,
      s"small edge table must auto-broadcast on reported stats:\n$static")
  }

  test("projection prunes the read schema; one partition per shard file") {
    val path = writeShards()
    val q = v2(path).select("src")
    assert(q.queryExecution.executedPlan.toString.contains("ReadSchema: struct<src:bigint>") ||
      q.schema.fieldNames.sameElements(Array("src")))
    assert(q.rdd.getNumPartitions == 3, "expected one partition per shard")
    assert(q.collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 10L, 11L, 12L))
  }
}
