package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** Pins the Catalyst-integrated WCO operator: identical rows to the
  * direct library call, the custom node visible at both plan levels, and
  * composition with operators above and below the node. */
class WcoPlanSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def randomEdges(n: Int, m: Long) = {
    val rows = (0 until n).map { i =>
      val h = graft.gen.TranscriptGen.splitmix64(515L + i)
      (math.abs(h) % m, math.abs(h >> 17) % m)
    }.filter(e => e._1 != e._2).distinct
    rows.toDF("src", "dst")
  }

  test("plan-integrated triangles == direct GenericJoin.enumerate") {
    val edges = randomEdges(3000, 60L)
    val viaPlan = Wco.triangles(edges).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val direct = graft.batch.GenericJoin
      .enumerate(edges, graft.plan.Planner.triangle).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(viaPlan.nonEmpty && viaPlan == direct)
  }

  test("the node is a plan citizen: visible in EXPLAIN, composes above/below") {
    val edges = randomEdges(2000, 50L)
    val q = Wco.triangles(edges.where(col("src") < 40L)) // below: child filter
      .where(col("x0") % 2 === 0) // above: plain Catalyst filter on output
      .groupBy("x0").agg(count(lit(1)).as("n_tri"))
    assert(q.queryExecution.analyzed.toString.contains("TriangleEnumerate"))
    val phys = q.queryExecution.executedPlan.toString
    // physical nodes print with the Exec suffix stripped; "!" would mark
    // an invalid (missing-input) node
    assert(phys.contains("TriangleEnumerate") && !phys.contains("!TriangleEnumerate"),
      s"expected a valid planned TriangleEnumerate node:\n$phys")
    val got = q.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expect = graft.batch.GenericJoin
      .enumerate(edges.where(col("src") < 40L), graft.plan.Planner.triangle)
      .where(col("x0") % 2 === 0)
      .groupBy("x0").agg(count(lit(1)).as("n_tri"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expect && got.nonEmpty)
  }

  test("rejects a child that is not (long, long)") {
    intercept[IllegalArgumentException] {
      Wco.triangles(Seq(("a", 1L)).toDF("src", "dst"))
    }
  }
}
