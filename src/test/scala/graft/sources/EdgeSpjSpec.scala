package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** Pins the connector's STORAGE-PARTITIONED JOIN path: bucketed
  * layout-on-write (`option("buckets","N,col")` → per-bucket shard files
  * with stats trailers), the scan's KeyGroupedPartitioning report over
  * the catalog's canonical `bucket` function, and the payoff — two
  * bucketed edge tables joined on the bucket column plan with ZERO
  * shuffle exchanges under `spark.sql.sources.v2.bucketing.enabled`,
  * with results identical to the shuffled plan. This is Iceberg's SPJ
  * contract re-expressed on the shard-name-encoded layout. */
class EdgeSpjSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def withCatalog[A](tag: String)(body: String => A): A = {
    val wh = Files.createTempDirectory(s"graft_spj_$tag").toFile.getAbsolutePath
    val cat = s"graft_spj_$tag"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.v2.EdgeCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    try {
      spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db")
      body(cat)
    } finally {
      spark.conf.unset(s"spark.sql.catalog.$cat")
      spark.conf.unset(s"spark.sql.catalog.$cat.warehouse")
    }
  }

  private def edges(rows: Int, seed: Int) =
    Seq.tabulate(rows)(i => ((i * 7 + seed).toLong % 101, i.toLong, 1L))
      .toDF("src", "dst", "w")

  /** Executes the frame and counts shuffles in the FINAL plan. A naive
    * `executedPlan.collect` is VACUOUS here twice over: AQE wraps the
    * plan in a leaf AdaptiveSparkPlanExec, and its final plan nests the
    * tree inside leaf QueryStageExec wrappers that `collect` cannot
    * cross either — so it reports zero exchanges for every query. The
    * rendered final-plan string does show the whole nested tree; count
    * exchange nodes there. */
  private def shuffleCount(df: DataFrame): Int = {
    df.collect()
    val p = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case other => other
    }
    "Exchange (hash|range)partitioning".r.findAllIn(p.toString).length
  }

  test("bucketed write round-trips; shards are per-bucket with one spec") {
    withCatalog("rt") { cat =>
      val wh = spark.conf.get(s"spark.sql.catalog.$cat.warehouse")
      spark.sql(s"CREATE TABLE $cat.db.e (src BIGINT, dst BIGINT, w BIGINT)")
      edges(500, 3).writeTo(s"$cat.db.e").option("buckets", "8,src").append()
      val files = new java.io.File(s"$wh/db/e").listFiles().map(_.getName)
        .filter(n => !n.startsWith("_") && !n.startsWith("."))
      assert(files.nonEmpty && files.forall(_.matches("bucket-src-\\d+of8-.*\\.txt")),
        files.mkString(","))
      val got = spark.table(s"$cat.db.e")
        .select($"src", $"dst").as[(Long, Long)].collect().toSet
      val want = edges(500, 3).select($"src", $"dst")
        .as[(Long, Long)].collect().toSet
      assert(got == want)
      // every row landed in the shard of ITS bucket (floor-mod contract)
      for (f <- files; (_, b, n) <- graft.sources.v2.EdgeTextV2.bucketOf(f)) {
        val srcs = scala.io.Source.fromFile(s"$wh/db/e/$f").getLines()
          .filterNot(l => l.isEmpty || l.startsWith("#"))
          .map(_.split(" ")(0).toLong)
        assert(srcs.forall(s0 =>
          graft.sources.v2.EdgeBucketFunction.bucketOf(n, s0) == b))
      }
    }
  }

  test("plain INSERT INTO inherits the table's bucket spec") {
    withCatalog("inh") { cat =>
      val wh = spark.conf.get(s"spark.sql.catalog.$cat.warehouse")
      spark.sql(s"CREATE TABLE $cat.db.e (src BIGINT, dst BIGINT, w BIGINT)")
      edges(100, 1).writeTo(s"$cat.db.e").option("buckets", "8,src").append()
      edges(100, 2).createOrReplaceTempView("graft_spj_inh_more")
      spark.sql(s"INSERT INTO $cat.db.e SELECT * FROM graft_spj_inh_more")
      val files = new java.io.File(s"$wh/db/e").listFiles().map(_.getName)
        .filter(n => !n.startsWith("_") && !n.startsWith("."))
      assert(files.forall(_.matches("bucket-src-\\d+of8-.*\\.txt")),
        s"the inherited layout must survive plain INSERT INTO: ${files.mkString(",")}")
      assert(spark.table(s"$cat.db.e").count() == 200)
    }
  }

  test("the catalog's bucket function is SQL-addressable and floor-mod") {
    withCatalog("fn") { cat =>
      val got = spark.sql(s"SELECT $cat.system.bucket(8, 13L)")
        .collect().head.getInt(0)
      assert(got == 5)
      assert(spark.sql(s"SELECT $cat.bucket(8, -3L)").collect().head.getInt(0) == 5)
    }
  }

  test("CREATE TABLE PARTITIONED BY (bucket) declares the layout for every write") {
    withCatalog("ddl") { cat =>
      val wh = spark.conf.get(s"spark.sql.catalog.$cat.warehouse")
      spark.sql(s"""CREATE TABLE $cat.db.e (src BIGINT, dst BIGINT, w BIGINT)
                    PARTITIONED BY (bucket(4, src))""")
      edges(100, 1).createOrReplaceTempView("graft_spj_ddl_src")
      spark.sql(s"INSERT INTO $cat.db.e SELECT * FROM graft_spj_ddl_src")
      val files = new java.io.File(s"$wh/db/e").listFiles().map(_.getName)
        .filter(n => !n.startsWith("_") && !n.startsWith("."))
      assert(files.nonEmpty && files.forall(_.matches("bucket-src-\\d+of4-.*\\.txt")),
        s"the declared spec must bucket plain INSERTs: ${files.mkString(",")}")
      // a conflicting write option is refused, not silently applied
      val ex = intercept[Exception] {
        edges(10, 2).writeTo(s"$cat.db.e").option("buckets", "8,dst").append()
      }
      assert(ex.getMessage.contains("declared"), ex.getMessage)
    }
  }

  test("rewrites preserve the bucket layout: UPDATE keeps SPJ eligibility") {
    withCatalog("rw") { cat =>
      val wh = spark.conf.get(s"spark.sql.catalog.$cat.warehouse")
      spark.sql(s"CREATE TABLE $cat.db.e (src BIGINT, dst BIGINT, w BIGINT)")
      edges(200, 9).writeTo(s"$cat.db.e").option("buckets", "4,src").append()
      spark.sql(s"UPDATE $cat.db.e SET w = w + 1 WHERE dst < 50")
      val files = new java.io.File(s"$wh/db/e").listFiles().map(_.getName)
        .filter(n => n.endsWith(".txt"))
      assert(files.nonEmpty &&
        files.forall(_.matches("compact-\\d+-bucket-src-\\d+of4-.*\\.txt")),
        s"the rewritten generation must keep the bucket segment: ${files.mkString(",")}")
      // and the table still reports bucket(4, src)
      val part = spark.sql(s"DESCRIBE TABLE EXTENDED $cat.db.e")
        .collect().map(_.mkString(" ")).mkString("\n")
      assert(part.contains("bucket(4, src)"), part)
      // rows of each compact shard still satisfy the floor-mod contract
      for (f <- files; (_, b, n) <- graft.sources.v2.EdgeTextV2.bucketOf(f)) {
        val srcs = scala.io.Source.fromFile(s"$wh/db/e/$f").getLines()
          .filterNot(l => l.isEmpty || l.startsWith("#"))
          .map(_.split(" ")(0).toLong)
        assert(srcs.forall(s0 =>
          graft.sources.v2.EdgeBucketFunction.bucketOf(n, s0) == b))
      }
      assert(spark.table(s"$cat.db.e").where($"w" === 2L).count() ==
        edges(200, 9).where($"dst" < 50).count())
    }
  }

  test("groupBy on the bucket column aggregates with zero shuffles") {
    withCatalog("agg") { cat =>
      spark.sql(s"CREATE TABLE $cat.db.e (src BIGINT, dst BIGINT, w BIGINT)")
      edges(500, 7).writeTo(s"$cat.db.e").option("buckets", "8,src").append()
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      try {
        val df = spark.table(s"$cat.db.e").groupBy("src")
          .agg(count(lit(1)).as("n"), sum("dst").as("s"))
        val got = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
        val want = edges(500, 7).groupBy("src")
          .agg(count(lit(1)).as("n"), sum("dst").as("s"))
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
        assert(got == want)
        // equal src implies equal bucket, so KeyGroupedPartitioning
        // already satisfies the aggregation's clustering: both
        // HashAggregates fuse into one codegen span over the scan
        assert(shuffleCount(df) == 0, df.queryExecution.executedPlan)
      } finally spark.conf.unset("spark.sql.sources.v2.bucketing.enabled")
    }
  }

  test("co-bucketed tables join with zero shuffles; results match shuffled plan") {
    withCatalog("j") { cat =>
      spark.sql(s"CREATE TABLE $cat.db.a (src BIGINT, dst BIGINT, w BIGINT)")
      spark.sql(s"CREATE TABLE $cat.db.b (src BIGINT, dst BIGINT, w BIGINT)")
      edges(800, 5).writeTo(s"$cat.db.a").option("buckets", "8,src").append()
      edges(600, 11).writeTo(s"$cat.db.b").option("buckets", "8,src").append()

      def agg = spark.table(s"$cat.db.a").alias("a")
        .join(spark.table(s"$cat.db.b").alias("b"), "src")
        .groupBy("src")
        .agg(count(lit(1)).as("pairs"), sum($"a.dst" + $"b.dst").as("s"))

      // baseline: v2 bucketing off -> ordinary shuffled join (the
      // positive exchange count also proves the counter isn't vacuous)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
      try {
        val base = agg
        val want = base.collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
        assert(want.nonEmpty)
        assert(shuffleCount(base) > 0,
          "the shuffled baseline must carry exchanges — otherwise the " +
            "zero-shuffle assertion below proves nothing")

        spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
        val df = agg
        val got = df.collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
        assert(got == want)
        assert(shuffleCount(df) == 0,
          s"storage-partitioned join must plan no exchange:\n" +
            df.queryExecution.executedPlan)
      } finally {
        spark.conf.unset("spark.sql.sources.v2.bucketing.enabled")
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      }
    }
  }
}
