package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** Pins the DSv2 TableCatalog over the edge format: SQL DDL (CREATE/DROP/
  * RENAME TABLE, namespaces), INSERT INTO through the connector's commit
  * protocol, SELECT with pushdown, and `VERSION AS OF` time travel
  * resolving to an epoch-pinned snapshot that refuses writes. */
class EdgeCatalogSpec extends AnyFunSuite with SparkTestBase {

  private def withCatalog[A](f: String => A): A = {
    val wh = Files.createTempDirectory("graft_cat_wh").toFile.getAbsolutePath
    val cat = s"graftcat${System.nanoTime() % 100000}"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.v2.EdgeCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    try f(cat)
    finally {
      spark.conf.unset(s"spark.sql.catalog.$cat")
      spark.conf.unset(s"spark.sql.catalog.$cat.warehouse")
    }
  }

  test("SQL DDL + INSERT + SELECT round-trip through the catalog") {
    withCatalog { cat =>
      spark.sql(s"CREATE NAMESPACE $cat.db")
      spark.sql(s"CREATE TABLE $cat.db.edges (src BIGINT, dst BIGINT, w BIGINT)")
      assert(spark.sql(s"SHOW TABLES IN $cat.db").collect()
        .map(_.getString(1)).toSeq == Seq("edges"))
      spark.sql(s"INSERT INTO $cat.db.edges VALUES (1, 2, 1), (2, 3, 5), (3, 1, 1)")
      spark.sql(s"INSERT INTO $cat.db.edges VALUES (4, 5, 1)") // second append
      val rows = spark.sql(s"SELECT src, dst, w FROM $cat.db.edges").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(rows == Set((1L, 2L, 1L), (2L, 3L, 5L), (3L, 1L, 1L), (4L, 5L, 1L)))
      // pushdown works through the SQL path too
      val q = spark.sql(s"SELECT src FROM $cat.db.edges WHERE src >= 3")
      assert(q.queryExecution.executedPlan.toString
        .contains("GreaterThanOrEqual(src,3)"))
      assert(q.collect().map(_.getLong(0)).toSet == Set(3L, 4L))

      // duplicate create rejected; fixed schema enforced
      intercept[Exception] {
        spark.sql(s"CREATE TABLE $cat.db.edges (src BIGINT, dst BIGINT, w BIGINT)")
      }
      intercept[Exception] {
        spark.sql(s"CREATE TABLE $cat.db.bad (a STRING)")
      }

      // RENAME TO takes a catalog-relative multipart name
      spark.sql(s"ALTER TABLE $cat.db.edges RENAME TO db.edges2")
      assert(spark.sql(s"SELECT count(*) AS n FROM $cat.db.edges2")
        .collect().head.getLong(0) == 4L)
      spark.sql(s"DROP TABLE $cat.db.edges2")
      assert(spark.sql(s"SHOW TABLES IN $cat.db").count() == 0)
    }
  }

  test("SQL DELETE: copy-on-write rewrite, marker-committed, exact rows") {
    withCatalog { cat =>
      import spark.implicits._
      implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
      spark.sql(s"CREATE NAMESPACE $cat.db")
      spark.sql(s"CREATE TABLE $cat.db.del (src BIGINT, dst BIGINT, w BIGINT)")
      spark.sql(s"INSERT INTO $cat.db.del VALUES (1, 2, 1), (5, 6, 1), (9, 9, 2)")
      // plus one streaming epoch so the delete consumes real history
      val wh = spark.conf.get(s"spark.sql.catalog.$cat.warehouse")
      val ckpt = Files.createTempDirectory("graft_cat_del_ckpt").toFile.getAbsolutePath
      val src = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long, Long)]
      val q = src.toDF().toDF("src", "dst", "w")
        .writeStream.format("graft.sources.v2.EdgeTextV2")
        .option("path", s"$wh/db/del").option("checkpointLocation", ckpt)
        .outputMode("append").start()
      try { src.addData((5L, 50L, 1L)); q.processAllAvailable() } finally q.stop()
      assert(spark.sql(s"SELECT count(*) FROM $cat.db.del").collect().head.getLong(0) == 4L)

      spark.sql(s"DELETE FROM $cat.db.del WHERE src = 5")
      val left = spark.sql(s"SELECT src, dst, w FROM $cat.db.del").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(left == Set((1L, 2L, 1L), (9L, 9L, 2L)),
        s"both src=5 rows (base AND epoch shard) must be gone: $left")

      // the rewrite published a fresh generation: single base snapshot,
      // with fresh stats trailers (skipping still works post-delete)
      val snaps = spark.sql(s"SELECT epoch FROM $cat.db.del.snapshots")
        .collect().map(_.getLong(0)).toSeq
      assert(snaps == Seq(-1L), s"delete must fold history into a base: $snaps")
      val sel = spark.sql(s"SELECT src FROM $cat.db.del WHERE src >= 9")
      assert(sel.collect().map(_.getLong(0)).toSeq == Seq(9L))

      // a second delete is a new generation (no idempotence collision)
      spark.sql(s"DELETE FROM $cat.db.del WHERE w >= 2")
      assert(spark.sql(s"SELECT src FROM $cat.db.del").collect()
        .map(_.getLong(0)).toSeq == Seq(1L))

      // an untranslatable predicate no longer errors: canDeleteWhere
      // declines the metadata path and the row-level copy-on-write
      // rewrite (SupportsRowLevelOperations) applies it exactly
      spark.sql(s"DELETE FROM $cat.db.del WHERE src + dst = 3")
      assert(spark.sql(s"SELECT count(*) FROM $cat.db.del")
        .collect().head.getLong(0) == 0L,
        "row-level fallback must delete the (1,2,1) row")
    }
  }

  test("VERSION AS OF resolves an epoch-pinned snapshot; writes refused") {
    withCatalog { cat =>
      import spark.implicits._
      implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
      spark.sql(s"CREATE NAMESPACE $cat.db")
      spark.sql(s"CREATE TABLE $cat.db.ev (src BIGINT, dst BIGINT, w BIGINT)")
      spark.sql(s"INSERT INTO $cat.db.ev VALUES (1, 2, 1)") // base, epoch -1
      // two streaming commit epochs land in the same table directory
      val wh = spark.conf.get(s"spark.sql.catalog.$cat.warehouse")
      val dir = s"$wh/db/ev"
      val ckpt = Files.createTempDirectory("graft_cat_ckpt").toFile.getAbsolutePath
      val src = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long, Long)]
      val q = src.toDF().toDF("src", "dst", "w")
        .writeStream.format("graft.sources.v2.EdgeTextV2")
        .option("path", dir).option("checkpointLocation", ckpt)
        .outputMode("append").start()
      try {
        src.addData((10L, 11L, 1L)); q.processAllAvailable() // epoch 0
        src.addData((20L, 21L, 1L)); q.processAllAvailable() // epoch 1
      } finally q.stop()

      assert(spark.sql(s"SELECT count(*) FROM $cat.db.ev")
        .collect().head.getLong(0) == 3L)
      val asOf0 = spark.sql(s"SELECT src FROM $cat.db.ev VERSION AS OF 0")
      assert(asOf0.collect().map(_.getLong(0)).toSet == Set(1L, 10L),
        "VERSION AS OF 0 must plan only base + epoch-0 shards")
      // later epochs are pruned at planning, not filtered per row
      assert(asOf0.rdd.getNumPartitions == 2)

      // a snapshot is read-only
      val ex = intercept[Exception] {
        spark.sql(s"INSERT INTO $cat.db.ev VERSION AS OF 0 VALUES (9, 9, 9)")
      }
      // (the parser itself may reject; either way nothing is written)
      assert(spark.sql(s"SELECT count(*) FROM $cat.db.ev")
        .collect().head.getLong(0) == 3L, s"snapshot write must not land: $ex")

      // TIMESTAMP AS OF has no wall-clock meaning on logical epochs
      val ts = intercept[Exception] {
        spark.sql(s"SELECT * FROM $cat.db.ev TIMESTAMP AS OF '2026-01-01'").collect()
      }
      assert(ts.getMessage.contains("VERSION AS OF") ||
        ts.getMessage.contains("TIMESTAMP"), ts.getMessage)

      // the `.snapshots` metadata table: one row per commit epoch, SQL-
      // addressable (Iceberg's table.snapshots analog), driver-local scan
      val snaps = spark.sql(s"SELECT epoch, n_shards FROM $cat.db.ev.snapshots ORDER BY epoch")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(snaps.map(_._1).toSeq == Seq(-1L, 0L, 1L), s"snapshots: ${snaps.toSeq}")
      assert(snaps.forall(_._2 >= 1L))

      // streaming read THROUGH the catalog name (micro-batch file replay)
      val qname = s"graft_cat_stream_${System.nanoTime()}"
      val sq2 = spark.readStream.table(s"$cat.db.ev")
        .writeStream.format("memory").queryName(qname).outputMode("append").start()
      try sq2.processAllAvailable() finally sq2.stop()
      assert(spark.table(qname).count() == 3L,
        "readStream.table must replay every committed shard exactly once")
    }
  }
}
