package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.text.TextOps

/** Phase decomposition of the minhash near-dup pipeline at a given SF —
  * diagnostics only. */
object MinhashProf {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
    val d2 = d.unionByName(d.select((col("doc_id") + 100000L).as("doc_id"),
      concat(col("text"), lit(" xyzzy")).as("text"))).persist()
    println(s"docs2 rows: ${d2.count()}")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[minhashprof] $name: ${(System.nanoTime() - t0) / 1e9}%.1fs ($n)")
    }
    time("tokens only") {
      d2.select(size(TextOps.tokens(col("text"))).as("n")).agg(sum("n")).collect()(0).getLong(0)
    }
    time("shingles (no distinct)") {
      d2.select(size(transform(sequence(lit(0), size(TextOps.tokens(col("text"))) - 3),
        i => concat_ws(" ", slice(TextOps.tokens(col("text")), i + 1, lit(3))))).as("n"))
        .agg(sum("n")).collect()(0).getLong(0)
    }
    time("shingles (with distinct)") {
      d2.select(size(Dedup.shingles(col("text"), 3)).as("n"))
        .agg(sum("n")).collect()(0).getLong(0)
    }
    time("shingle hashes (portable)") {
      d2.select(size(transform(Dedup.shingles(col("text"), 3),
        s => TextOps.polyHash(s))).as("n")).agg(sum("n")).collect()(0).getLong(0)
    }
    time("full signatures k=16 (portable)") {
      Dedup.minhashSignatures(d2, "doc_id", "text", 3, 16, Dedup.PortableHash).count()
    }
    time("full signatures k=16 (fast)") {
      Dedup.minhashSignatures(d2, "doc_id", "text", 3, 16, Dedup.FastHash).count()
    }
    time("pairs end-to-end (portable)") {
      Dedup.minhashPairs(d2, "doc_id", "text", 3, 16, 4, 0.5, Dedup.PortableHash).count()
    }
    // decompose the join: candidate volume without the jaccard/groupBy tail
    val sigs = Dedup.minhashSignatures(d2, "doc_id", "text", 3, 16, Dedup.PortableHash)
      .persist()
    println(s"sigs materialized: ${sigs.count()}")
    val banded = sigs.withColumn("band", explode(
        transform(sequence(lit(0), lit(3)), j => struct(j.as("bidx"),
          aggregate(slice(col("sig"), j * 4 + 1, lit(4)), lit(0L),
            (acc, v) => (acc * 131L + v) % TextOps.P).as("bkey")))))
      .select(col("id"), col("sig"), col("band.bidx"), col("band.bkey"))
      .persist()
    println(s"banded rows: ${banded.count()}")
    time("bucket join candidate count (cached sides)") {
      val a = banded.select(col("id").as("id_a"), col("bidx"), col("bkey"))
      val b = banded.select(col("id").as("id_b"), col("bidx"), col("bkey"))
      a.join(b, Seq("bidx", "bkey")).where(col("id_a") < col("id_b")).count()
    }
    time("bucket join + sigJaccard + groupBy (cached sides)") {
      val a = banded.select(col("id").as("id_a"), col("sig").as("sig_a"), col("bidx"), col("bkey"))
      val b = banded.select(col("id").as("id_b"), col("sig").as("sig_b"), col("bidx"), col("bkey"))
      a.join(b, Seq("bidx", "bkey")).where(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"),
          Dedup.sigJaccard(col("sig_a"), col("sig_b"), 16).as("est_jaccard"))
        .groupBy("id_a", "id_b").agg(max("est_jaccard").as("est_jaccard"))
        .where(col("est_jaccard") >= 0.5).count()
    }
    spark.stop()
  }
}
