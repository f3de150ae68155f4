package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** Bucketed co-located joins — the layout-level shuffle elimination the
  * engine's 100-TB story leans on: two tables bucketed AND sorted by the
  * join key meet in a sort-merge join with NO Exchange on either side
  * (each bucket pair joins locally), while the same join over plain
  * parquet shuffles both inputs. Result equality pins that the layout
  * changes the PLAN, never the answer. */
class BucketingSpec extends AnyFunSuite with SparkTestBase {

  /** Shuffle nodes strictly below the first sort-merge join of the
    * FINALIZED plan. AQE wraps both the whole plan (AdaptiveSparkPlanExec)
    * and each materialized stage (QueryStageExec) with the subtree held as
    * a FIELD, not a child — a plain `collect` sees none of it, so descend
    * through the wrappers explicitly. */
  private def shufflesUnderJoin(df: org.apache.spark.sql.DataFrame): Int = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec, ShuffleQueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    df.collect() // force AQE to finalize
    def findJoin(p: SparkPlan): Option[SortMergeJoinExec] = p match {
      case a: AdaptiveSparkPlanExec => findJoin(a.executedPlan)
      case q: QueryStageExec => findJoin(q.plan)
      case j: SortMergeJoinExec => Some(j)
      case other => other.children.view.flatMap(findJoin(_)).headOption
    }
    def countShuffles(p: SparkPlan): Int = p match {
      case q: ShuffleQueryStageExec => 1 + countShuffles(q.plan)
      case q: QueryStageExec => countShuffles(q.plan)
      case e: ShuffleExchangeLike => 1 + e.children.map(countShuffles).sum
      case other => other.children.map(countShuffles).sum
    }
    val exec = df.queryExecution.executedPlan
    val smj = findJoin(exec)
    assert(smj.nonEmpty, s"no sort-merge join in:\n${exec.toString.take(800)}")
    smj.get.children.map(countShuffles).sum
  }

  test("bucketed-by-key join plans with zero shuffles; plain parquet shuffles") {
    // warehouse.dir is a static conf — use the default warehouse with
    // throwaway table names and clean up the managed-table files after
    val s = spark.newSession()
    // force shuffle-based joins so the layout, not a broadcast, is what
    // removes the exchange (AQE has its own threshold knob)
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    import s.implicits._

    val edges = (0L until 4000L).map(i => (i % 97, i % 89, i)).toDF("k", "v", "w")
    val dim = (0L until 97L).map(k => (k, s"name_$k")).toDF("k", "name")
    try {
      edges.write.bucketBy(8, "k").sortBy("k").mode("overwrite")
        .saveAsTable("b_edges")
      dim.write.bucketBy(8, "k").sortBy("k").mode("overwrite")
        .saveAsTable("b_dim")

      val bucketed = s.table("b_edges").join(s.table("b_dim"), "k")
        .groupBy("name").agg(sum("w").as("tot"))
      // the JOIN itself must be exchange-free: both sides arrive
      // pre-partitioned by bucket. (The groupBy above it may shuffle.)
      assert(shufflesUnderJoin(bucketed) == 0, "bucketed join still shuffles")

      // identical answer from the unbucketed form — which DOES shuffle
      val plain = edges.join(dim.as("d"), "k")
        .groupBy("name").agg(sum("w").as("tot"))
      assert(shufflesUnderJoin(plain) > 0, "plain join unexpectedly shuffle-free")
      val b = bucketed.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val p = plain.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(b == p)
    } finally {
      s.sql("DROP TABLE IF EXISTS b_edges")
      s.sql("DROP TABLE IF EXISTS b_dim")
      def rm(f: java.io.File): Unit = if (f.exists()) {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      // delete ONLY this test's table dirs — wiping the whole shared
      // warehouse would race any other suite's managed tables
      for (t <- Seq("b_edges", "b_dim"))
        rm(new java.io.File(s"spark-warehouse/$t"))
    }
  }
}
