package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** Pins the connector's two manifest-driven execution shortcuts:
  *
  *   - AGGREGATE PUSHDOWN: COUNT/MIN/MAX (optionally GROUP BY `_epoch`)
  *     answer ENTIRELY from the per-shard stats trailers — the plan
  *     carries a METADATA-ONLY scan and no data file is opened. The
  *     pushdown must DECLINE (and stay exact through the row scan)
  *     whenever exactness can't be proven: a row-level predicate, or a
  *     shard without a trailer.
  *   - RUNTIME FILTERING (DPP): a broadcast join on src hands the scan
  *     the build side's key set at execution; shards whose stats bounds
  *     exclude every key are dropped before a byte is read. */
class EdgeV2PushdownSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def v2(path: String) =
    spark.read.format("graft.sources.v2.EdgeTextV2")
      .option("path", path).load()

  /** n rows (i, i+1000, i%7), range-layouted on src into `parts` shards
    * — connector-written, so every shard carries a stats trailer. */
  private def writeLayout(n: Int, parts: Int): String = {
    val dir = Files.createTempDirectory("graft_v2_aggp").toFile.getAbsolutePath
    Seq.tabulate(n)(i => (i.toLong, (i + 1000).toLong, (i % 7).toLong))
      .toDF("src", "dst", "w")
      .write.format("graft.sources.v2.EdgeTextV2")
      .option("path", dir).option("layout", "src")
      .option("layoutPartitions", parts.toString).mode("append").save()
    dir
  }

  /** Hand-written epoch shard (`part-<epoch>-<n>.txt`), optionally with
    * the stats trailer the connector's own writers always produce. */
  private def writeEpochShard(dir: java.io.File, epoch: Long, n: Int,
                              rows: Seq[(Long, Long, Long)],
                              trailer: Boolean = true): Unit = {
    val f = new java.io.File(dir, s"part-$epoch-$n.txt")
    val w = new java.io.PrintWriter(f, "UTF-8")
    try {
      rows.foreach { case (s0, d, ww) => w.println(s"$s0 $d $ww") }
      if (trailer && rows.nonEmpty)
        w.println(s"# graft-stats v1 count=${rows.length} " +
          s"src=${rows.map(_._1).min}..${rows.map(_._1).max} " +
          s"dst=${rows.map(_._2).min}..${rows.map(_._2).max} " +
          s"w=${rows.map(_._3).min}..${rows.map(_._3).max}")
    } finally w.close()
  }

  test("COUNT/MIN/MAX answer from shard stats, metadata-only plan") {
    val dir = writeLayout(40, 4)
    val q = v2(dir).agg(count(lit(1)).as("n"), min("src").as("mns"),
      max("src").as("mxs"), min("dst").as("mnd"), max("w").as("mxw"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("METADATA-ONLY AGGREGATE"),
      s"aggregate must push into the scan:\n$plan")
    val r = q.collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) == (40L, 0L, 39L, 1000L, 6L))
  }

  test("GROUP BY _epoch aggregates per commit epoch from the manifest") {
    val dir = Files.createTempDirectory("graft_v2_agge").toFile
    writeEpochShard(dir, 0, 0, Seq((1L, 2L, 1L), (3L, 4L, 1L)))
    writeEpochShard(dir, 1, 0, Seq((5L, 6L, 2L)))
    writeEpochShard(dir, 2, 0, Seq((7L, 8L, 3L), (9L, 10L, 3L), (11L, 12L, 3L)))
    val q = v2(dir.getAbsolutePath)
      .groupBy(col("_epoch")).agg(count(lit(1)).as("n"), max("dst").as("mx"))
      .orderBy(col("_epoch"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("METADATA-ONLY AGGREGATE"),
      s"epoch grouping must push into the scan:\n$plan")
    assert(q.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq == Seq((0L, 2L, 4L), (1L, 1L, 6L), (2L, 3L, 12L)))
  }

  test("pushed _epoch predicate keeps the pushdown exact (whole-shard prune)") {
    val dir = Files.createTempDirectory("graft_v2_aggf").toFile
    writeEpochShard(dir, 0, 0, Seq((1L, 2L, 1L), (3L, 4L, 1L)))
    writeEpochShard(dir, 1, 0, Seq((5L, 6L, 2L)))
    val q = v2(dir.getAbsolutePath).where(col("_epoch") <= 0L)
      .agg(count(lit(1)).as("n"), max("src").as("mx"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("METADATA-ONLY AGGREGATE"), s"\n$plan")
    val r = q.collect()(0)
    assert((r.getLong(0), r.getLong(1)) == (2L, 3L))
  }

  test("aggregate over a pruned-to-empty table: count 0, min NULL") {
    val dir = Files.createTempDirectory("graft_v2_agg0").toFile
    writeEpochShard(dir, 0, 0, Seq((1L, 2L, 1L)))
    val q = v2(dir.getAbsolutePath).where(col("_epoch") > 99L)
      .agg(count(lit(1)).as("n"), min("src").as("mn"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("METADATA-ONLY AGGREGATE"), s"\n$plan")
    val r = q.collect()(0)
    assert(r.getLong(0) == 0L && r.isNullAt(1))
  }

  test("row-level predicate declines the pushdown; row scan stays exact") {
    val dir = writeLayout(40, 4)
    val q = v2(dir).where(col("src") >= 10L).agg(count(lit(1)).as("n"))
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("METADATA-ONLY"),
      s"a src predicate makes trailer sums inexact — must decline:\n$plan")
    assert(q.collect()(0).getLong(0) == 30L)
  }

  test("a trailer-less shard declines the pushdown; row scan stays exact") {
    val dir = Files.createTempDirectory("graft_v2_aggn").toFile
    writeEpochShard(dir, 0, 0, Seq((1L, 2L, 1L), (3L, 4L, 1L)))
    writeEpochShard(dir, 1, 0, Seq((5L, 6L, 2L)), trailer = false)
    val q = v2(dir.getAbsolutePath).agg(count(lit(1)).as("n"), max("src").as("mx"))
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("METADATA-ONLY"),
      s"exactness unprovable without every trailer — must decline:\n$plan")
    val r = q.collect()(0)
    assert((r.getLong(0), r.getLong(1)) == (3L, 5L))
  }

  test("LIMIT pushes into the readers (partial): per-shard early stop") {
    val dir = writeLayout(200, 4)
    val q = v2(dir).limit(7)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedLimit: 7"),
      s"limit must reach the scan:\n$plan")
    assert(q.collect().length == 7)
    // post-filter semantics: the cap counts EMITTED rows, not read rows
    val qf = v2(dir).where(col("src") >= 100L).limit(5)
    val rows = qf.collect()
    assert(rows.length == 5 && rows.forall(_.getLong(0) >= 100L))
  }

  test("DPP: broadcast join on src prunes shards at runtime via stats") {
    val dir = writeLayout(400, 8) // src 0..399 in 8 range shards of ~50
    val dimDir = Files.createTempDirectory("graft_v2_dim").toFile.getAbsolutePath
    Seq.tabulate(400)(i => (i.toLong, (i / 100).toLong)).toDF("src", "grp")
      .write.mode("overwrite").parquet(dimDir)
    val adaptiveWas = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val dim = spark.read.parquet(dimDir).where(col("grp") === 0L) // src 0..99
      val q = v2(dir).join(broadcast(dim), "src")
        .agg(count(lit(1)).as("n"), sum("dst").as("sd"))
      val r = q.collect()(0)
      assert((r.getLong(0), r.getLong(1)) == (100L, 104950L))
      val scans = q.queryExecution.executedPlan
        .collect { case b: BatchScanExec => b }
      val fact = scans.find(_.output.exists(_.name == "dst"))
        .getOrElse(fail(s"no v2 fact scan in:\n${q.queryExecution.executedPlan}"))
      assert(fact.runtimeFilters.nonEmpty,
        s"DPP must attach a runtime filter to the v2 scan:\n" +
          q.queryExecution.executedPlan.toString)
      // `partitions` is the static (pre-filter) set; the executed RDD is
      // built from the runtime-filtered replan — that's where the
      // pruning must show
      assert(fact.partitions.map(_.size).sum == 8)
      val planned = fact.inputRDDs().head.getNumPartitions
      assert(planned < 8 && planned >= 2,
        s"runtime In(src, keys of 0..99) must prune shards by stats " +
          s"bounds, planned=$planned of 8")
    } finally spark.conf.set("spark.sql.adaptive.enabled", adaptiveWas)
  }

  test("SQL COUNT(*) over a catalog table plans metadata-only") {
    val wh = Files.createTempDirectory("graft_v2_aggcat").toFile.getAbsolutePath
    spark.conf.set("spark.sql.catalog.graft_aggcat",
      classOf[graft.sources.v2.EdgeCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_aggcat.warehouse", wh)
    try {
      spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_aggcat.db")
      spark.sql("CREATE TABLE graft_aggcat.db.e (src BIGINT, dst BIGINT, w BIGINT)")
      Seq.tabulate(25)(i => (i.toLong, (i + 5).toLong, 1L))
        .toDF("src", "dst", "w").createOrReplaceTempView("graft_aggcat_src")
      spark.sql("INSERT INTO graft_aggcat.db.e SELECT * FROM graft_aggcat_src")
      val q = spark.sql(
        "SELECT count(*) AS n, min(src) AS mn, max(dst) AS mx FROM graft_aggcat.db.e")
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("METADATA-ONLY AGGREGATE"),
        s"catalog tables must inherit the pushdown:\n$plan")
      val r = q.collect()(0)
      assert((r.getLong(0), r.getLong(1), r.getLong(2)) == (25L, 0L, 29L))
    } finally {
      spark.conf.unset("spark.sql.catalog.graft_aggcat")
      spark.conf.unset("spark.sql.catalog.graft_aggcat.warehouse")
    }
  }

  test("runtime filter is an optimization only: join result equals no-DPP run") {
    val dir = writeLayout(120, 4)
    val dimDir = Files.createTempDirectory("graft_v2_dim2").toFile.getAbsolutePath
    Seq.tabulate(120)(i => (i.toLong, (i / 30).toLong)).toDF("src", "grp")
      .write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir).where(col("grp") === 1L)
    def run(): Set[(Long, Long)] =
      v2(dir).join(broadcast(dim), "src").select("src", "dst")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val dppWas = spark.conf.get("spark.sql.optimizer.dynamicPartitionPruning.enabled")
    val withDpp = run()
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "false")
    try assert(run() == withDpp && withDpp.size == 30)
    finally spark.conf.set(
      "spark.sql.optimizer.dynamicPartitionPruning.enabled", dppWas)
  }
}
