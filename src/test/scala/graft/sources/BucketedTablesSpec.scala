package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** Pins the bucketed-layout claim: a co-located join of two tables
  * bucketed by the key plans with NO shuffle exchange on either side
  * (broadcast disabled so the plan can't cheat), and returns exactly the
  * rows of the plain join. */
class BucketedTablesSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def withConf[T](kvs: (String, String)*)(f: => T): T = {
    val old = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  private val base =
    s"${System.getProperty("java.io.tmpdir")}/graft_bucketed_spec"

  test("co-located join: exchange-free plan, plain-join rows") {
    val a = (0L until 400L).map(i => (i % 37, i)).toDF("k", "va")
    val b = (0L until 300L).map(i => (i % 41, i * 3)).toDF("k", "vb")
    val ab = BucketedTables.writeBucketed(a, "spec_a", "k", 4, base)
    val bb = BucketedTables.writeBucketed(b, "spec_b", "k", 4, base)
    withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val joined = BucketedTables.colocatedJoin(ab, bb, "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ, got:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed sides must satisfy the join distribution at scan time:\n$plan")
      val got = joined.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val expect = a.join(b, Seq("k")).collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == expect)
    }
  }

  test("mismatched bucket counts still join correctly (plan may exchange)") {
    val a = (0L until 100L).map(i => (i % 11, i)).toDF("k", "va")
    val b = (0L until 100L).map(i => (i % 13, i + 7)).toDF("k", "vb")
    val ab = BucketedTables.writeBucketed(a, "spec_c", "k", 4, base)
    val bb = BucketedTables.writeBucketed(b, "spec_d", "k", 2, base)
    val got = BucketedTables.colocatedJoin(ab, bb, "k").count()
    assert(got == a.join(b, Seq("k")).count())
  }
}
