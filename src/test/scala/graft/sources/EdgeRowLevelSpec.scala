package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** Pins SQL UPDATE / MERGE INTO on catalog edge tables
  * (SupportsRowLevelOperations, group-based copy-on-write): the command
  * rewrites as a whole-table read + a staged write published as ONE
  * marker-committed generation — the same atomic swap as DELETE FROM and
  * compaction — so a reader never sees a half-applied command. Also pins
  * the row-level fallback for DELETEs whose predicates don't translate
  * to pushable filters, and the read-only VERSION AS OF contract. */
class EdgeRowLevelSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def withCatalog[A](tag: String)(body: String => A): A = {
    val wh = Files.createTempDirectory(s"graft_rl_$tag").toFile.getAbsolutePath
    val cat = s"graft_rl_$tag"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.v2.EdgeCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    try {
      spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db")
      spark.sql(s"CREATE TABLE $cat.db.e (src BIGINT, dst BIGINT, w BIGINT)")
      Seq.tabulate(20)(i => (i.toLong, (i + 100).toLong, 1L))
        .toDF("src", "dst", "w").createOrReplaceTempView(s"graft_rl_${tag}_src")
      spark.sql(s"INSERT INTO $cat.db.e SELECT * FROM graft_rl_${tag}_src")
      body(cat)
    } finally {
      spark.conf.unset(s"spark.sql.catalog.$cat")
      spark.conf.unset(s"spark.sql.catalog.$cat.warehouse")
    }
  }

  test("SQL UPDATE rewrites as one copy-on-write generation") {
    withCatalog("upd") { cat =>
      spark.sql(s"UPDATE $cat.db.e SET w = w + 100 WHERE src < 10")
      val rows = spark.sql(s"SELECT src, w FROM $cat.db.e")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(rows.size == 20)
      assert((0L until 10L).forall(rows(_) == 101L))
      assert((10L until 20L).forall(rows(_) == 1L))
      // the publish is a marker-committed generation: only compact-*
      // data shards + marker remain, the pre-update shards expired
      val wh = spark.conf.get(s"spark.sql.catalog.$cat.warehouse")
      val files = new java.io.File(s"$wh/db/e").listFiles()
        .map(_.getName).filter(n => !n.startsWith("_") && !n.startsWith(".")).sorted
      assert(files.exists(_.matches("compact-\\d+\\.commit")), files.mkString(","))
      assert(files.forall(_.startsWith("compact-")),
        s"pre-update shards must expire with the marker: ${files.mkString(",")}")
    }
  }

  test("SQL MERGE INTO: matched-update, matched-delete, not-matched-insert") {
    withCatalog("mrg") { cat =>
      Seq(
        (1L, 101L, 7L),   // matched, w>0  -> update w += 7
        (2L, 102L, -1L),  // matched, w<0  -> delete
        (50L, 999L, 5L))  // not matched   -> insert
        .toDF("src", "dst", "w").createOrReplaceTempView("graft_rl_mrg_upd")
      spark.sql(
        s"""MERGE INTO $cat.db.e t USING graft_rl_mrg_upd s
           |ON t.src = s.src AND t.dst = s.dst
           |WHEN MATCHED AND s.w < 0 THEN DELETE
           |WHEN MATCHED THEN UPDATE SET w = t.w + s.w
           |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      val rows = spark.sql(s"SELECT src, dst, w FROM $cat.db.e")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(rows.size == 20, s"20 - 1 delete + 1 insert, got ${rows.size}")
      assert(rows.contains((1L, 101L, 8L)), "matched-update must apply")
      assert(!rows.exists(_._1 == 2L), "matched-delete must drop the row")
      assert(rows.contains((50L, 999L, 5L)), "not-matched-insert must land")
      assert(rows.count(_._3 == 1L) == 18)
    }
  }

  test("non-translatable DELETE falls back to the row-level rewrite") {
    withCatalog("del") { cat =>
      // src % 2 = 0 is not a pushable filter -> canDeleteWhere declines,
      // the copy-on-write rewrite must take over instead of erroring
      spark.sql(s"DELETE FROM $cat.db.e WHERE src % 2 = 0")
      val srcs = spark.sql(s"SELECT src FROM $cat.db.e")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(srcs == (1L until 20L by 2L).toSeq)
    }
  }

  test("successive row-level commands stack generations; older ones expire") {
    withCatalog("gen") { cat =>
      spark.sql(s"UPDATE $cat.db.e SET w = w + 1")                 // gen 0
      spark.sql(s"UPDATE $cat.db.e SET w = w * 10 WHERE src = 0")  // gen 1
      val rows = spark.sql(s"SELECT src, w FROM $cat.db.e")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(rows(0L) == 20L && (1L until 20L).forall(rows(_) == 2L))
      val wh = spark.conf.get(s"spark.sql.catalog.$cat.warehouse")
      val files = new java.io.File(s"$wh/db/e").listFiles()
        .map(_.getName).filter(n => !n.startsWith("_") && !n.startsWith("."))
      val markers = files.filter(_.matches("compact-\\d+\\.commit"))
      assert(markers.toSeq == Seq("compact-1.commit"),
        s"exactly the latest generation's marker must survive: ${files.mkString(",")}")
      assert(files.filter(_.endsWith(".txt")).forall(_.startsWith("compact-1-")),
        s"gen-0 data must expire with gen-1's commit: ${files.mkString(",")}")
    }
  }
}
