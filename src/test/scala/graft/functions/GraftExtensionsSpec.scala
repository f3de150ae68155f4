package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.dedup.Dedup

/** SQL surface for the native expressions: the registered functions must be
  * the same Catalyst nodes the Column API builds (value-equal to the HOF
  * oracles), reachable from plain `spark.sql`. */
class GraftExtensionsSpec extends AnyFunSuite with SparkTestBase {

  private def docs = {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    spark.createDataFrame(
      Seq(Row(1L, "the quick brown fox jumps over the lazy dog"),
        Row(2L, "pack my box with five dozen liquor jugs"),
        Row(3L, "")).asJava,
      StructType(Seq(StructField("id", LongType), StructField("text", StringType))))
  }

  test("register() exposes the native expressions to spark.sql") {
    GraftExtensions.register(spark)
    docs.createOrReplaceTempView("ext_docs")
    val viaSql = spark.sql(
      """SELECT id,
        |  graft_polyhash(text) AS ph,
        |  graft_minhash_sig(transform(split(text, ' '), t -> graft_polyhash(t)), 4) AS mh,
        |  graft_simhash_sig(transform(split(text, ' '), t -> graft_polyhash(t))) AS sh
        |FROM ext_docs""".stripMargin)
      .collect().map(r => (r.getLong(0), r.get(1), r.getSeq[Long](2), r.getSeq[Long](3)))
      .sortBy(_._1)
    val toks = transform(split(col("text"), " "), t => PolyHash(t))
    val viaApi = docs.select(col("id"), PolyHash(col("text")).as("ph"),
        MinHashSig(toks, 4).as("mh"), SimHashSig(toks).as("sh"))
      .collect().map(r => (r.getLong(0), r.get(1), r.getSeq[Long](2), r.getSeq[Long](3)))
      .sortBy(_._1)
    assert(viaSql.toSeq == viaApi.toSeq)
    // and the API nodes equal their interpreted HOF oracles
    val hof = docs.select(col("id"),
        Dedup.minhashSignatureHof(split(col("text"), " "), 4).as("mh"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).sortBy(_._1)
    assert(viaSql.map(t => (t._1, t._3)).toSeq == hof.toSeq)
    // registration is idempotent
    GraftExtensions.register(spark)
    assert(spark.sql("SELECT graft_polyhash('abc')").collect().nonEmpty)
  }

  test("extension class wires the same functions (spark.sql.extensions path)") {
    // apply the extension to a fresh SparkSessionExtensions and check the
    // builders produce the same expression nodes as the shared list
    val ext = new SparkSessionExtensions
    new GraftExtensions()(ext) // must not throw; functions list is the contract
    assert(GraftExtensions.functions.map(_._1.funcName).toSet ==
      Set("graft_polyhash", "graft_minhash_sig", "graft_simhash_sig",
        "graft_hll_registers", "graft_hll_estimate"))
    val mh = GraftExtensions.functions.find(_._1.funcName == "graft_minhash_sig").get._3
    val built = mh(Seq(org.apache.spark.sql.catalyst.expressions.Literal.create(
      Array(1L, 2L), org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.LongType)),
      org.apache.spark.sql.catalyst.expressions.Literal(8)))
    assert(built.isInstanceOf[MinHashSig] && built.asInstanceOf[MinHashSig].k == 8)
    intercept[IllegalArgumentException] {
      mh(Seq(org.apache.spark.sql.catalyst.expressions.Literal(1L),
        org.apache.spark.sql.catalyst.expressions.Literal("x")))
    }
  }

  test("graft_hll_registers aggregate == DataFrame registers form") {
    GraftExtensions.register(spark)
    import spark.implicits._
    // enough distinct keys that every m=32 register is contended, spread
    // over 8 partitions so ObjectHashAggregate partial merges are real
    val keys = (0 until 500).map(i => s"key_$i")
    val df = spark.createDataset(keys).toDF("text").repartition(8)
    df.createOrReplaceTempView("hll_agg_docs")
    val viaSql = spark.sql(
        "SELECT graft_hll_registers(graft_polyhash(text), 32) AS regs " +
          "FROM hll_agg_docs")
      .select(posexplode(col("regs")).as(Seq("bucket", "rho")))
      .where(col("rho") > 0L)
      .select(col("bucket").cast("long"), col("rho"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val viaDf = graft.sketch.HyperLogLog.registers(df, "text", m = 32)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(viaSql.toSeq == viaDf.toSeq)
    assert(viaSql.length > 20) // registers genuinely contended
    // grouped form: per-group buffers stay independent
    val grouped = spark.createDataset(keys.map(k => (k.hashCode % 3, k)))
      .toDF("g", "text").repartition(8)
    grouped.createOrReplaceTempView("hll_agg_grouped")
    val perGroup = spark.sql(
        "SELECT g, graft_hll_registers(graft_polyhash(text), 32) AS regs " +
          "FROM hll_agg_grouped GROUP BY g")
      .select(col("g"), posexplode(col("regs")).as(Seq("bucket", "rho")))
      .where(col("rho") > 0L)
      .select(col("g"), col("bucket").cast("long"), col("rho"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sorted
    val perGroupDf = grouped.select(col("g"),
        graft.text.TextOps.polyHash(col("text")).as("h"))
      .groupBy(col("g"),
        graft.sketch.HyperLogLog.bucket(col("h"), 32).as("bucket"))
      .agg(max(graft.sketch.HyperLogLog.rho(col("h"))).cast("long").as("rho"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sorted
    assert(perGroup.toSeq == perGroupDf.toSeq)
    // the scalar finalizer composes: SQL estimate == DataFrame estimate
    val estSql = spark.sql(
        "SELECT round(graft_hll_estimate(" +
          "graft_hll_registers(graft_polyhash(text), 32), 32), 6) AS est " +
          "FROM hll_agg_docs")
      .collect().head.getDouble(0)
    val estDf = graft.sketch.HyperLogLog.distinctEstimate(df, "text", m = 32)
      .collect().head.getDouble(0)
    assert(estSql == estDf)
  }
}
