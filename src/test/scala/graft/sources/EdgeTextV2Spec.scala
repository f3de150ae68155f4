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
    assert(plan.contains("PushedFilters: [GreaterThanOrEqual(src,4)"),
      s"src filter must reach the scan:\n$plan")
    assert(plan.contains("EqualTo(w,1)"), s"w filter must reach the scan:\n$plan")
    val got = q.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((4L, 5L), (6L, 4L), (7L, 9L), (10L, 11L), (11L, 12L)))
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
