package graft.tools

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._
import graft.dedup.Dedup

/** Corpus-shape A/B for exact Jaccard pair mining: the naive inverted-index
  * aggregation vs the AllPairs prefix-filtered form, on
  *  (a) a near-unique corpus (per-shingle df ≈ 1-2 — the sandbox documents
  *      table's shape), and
  *  (b) a boilerplate-heavy corpus (documents share large template blocks,
  *      so per-shingle df is in the hundreds and the naive Σ df² candidate
  *      aggregation goes superlinear — the real-web dedup shape).
  * Prints wall seconds per (corpus, algorithm) and checks both algorithms
  * agree pair-for-pair. Numbers feed BASELINE.md's negative-result note. */
object JaccardShape {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val schema = StructType(Seq(StructField("id", LongType), StructField("text", StringType)))

    def mkDf(rows: Seq[(Long, String)]) = {
      import scala.jdk.CollectionConverters._
      spark.createDataFrame(rows.map { case (i, t) => Row(i, t) }.asJava, schema)
        .repartition(cpus.toInt)
    }
    val rnd = new scala.util.Random(5)
    def words(n: Int, vocab: Int, tag: String) =
      (0 until n).map(_ => s"$tag${rnd.nextInt(vocab)}").mkString(" ")

    val nDocs = 4000
    // (a) near-unique: 150 random words from a huge vocabulary
    val unique = (0 until nDocs).map(i => (i.toLong, words(150, 2000000, "u")))
    // (b) SUB-threshold boilerplate: 40% of EVERY doc is one corpus-wide
    // template (the site-chrome / license-header shape) — template-only
    // pairs score J ≈ 0.24 < 0.5, so the naive join aggregates
    // Σ df² ≈ 58 shingles × (6000 docs)² ≈ 2×10^9 shared-shingle rows that
    // ALL fail the threshold, while the df-ordered prefixes exclude the
    // template shingles entirely. This is the regime prefix filtering
    // exists for — and unlike the df-cut it keeps the jaccard EXACT.
    val nBoiler = 6000
    val template40 = words(60, 2000000, "t")
    val subThreshold = (0 until nBoiler).map { i =>
      (i.toLong, template40 + " " + words(90, 2000000, "b"))
    }
    // (c) ABOVE-threshold duplication: 70% templates — the output itself is
    // quadratic (~10^6 true pairs), so no candidate filter can win and the
    // per-pair array verification loses to the count aggregation
    val templates70 = (0 until 8).map(_ => words(105, 2000000, "t"))
    val dupHeavy = (0 until nDocs).map { i =>
      (i.toLong, templates70(i % 8) + " " + words(45, 2000000, "b"))
    }

    for ((name, corpus) <- Seq(("near_unique", unique),
        ("sub_threshold_boilerplate", subThreshold), ("dup_heavy", dupHeavy))) {
      val df = mkDf(corpus).localCheckpoint()
      def time(label: String)(f: => Array[Row]): Array[Row] = {
        val t0 = System.nanoTime()
        val out = f
        println(f"[jshape] $name $label: ${(System.nanoTime() - t0) / 1e9}%.1fs (${out.length} pairs)")
        out
      }
      val naive = time("naive ")(
        Dedup.jaccardPairs(df, "id", "text", n = 3, threshold = 0.5).collect())
      val prefix = time("prefix")(
        Dedup.jaccardPairsPrefix(df, "id", "text", n = 3, threshold = 0.5).collect())
      val key = (r: Row) => (r.getLong(0), r.getLong(1), r.getDouble(2))
      assert(naive.map(key).toSet == prefix.map(key).toSet,
        s"$name: algorithms disagree")
      // the auto strategy must pick each regime's measured winner (naive /
      // prefix / naive) and produce the identical pair set
      val stats = Dedup.jaccardStats(df, "id", "text", n = 3)
      val pick = Dedup.chooseJaccardStrategy(stats, threshold = 0.5)
      val expectPick =
        if (name == "sub_threshold_boilerplate") "prefix" else "naive"
      println(s"[jshape] $name auto-pick=$pick (expected $expectPick) stats=$stats")
      assert(pick == expectPick, s"$name: auto picked $pick, measured winner is $expectPick")
      val auto = time("auto  ")(
        Dedup.jaccardPairsAuto(df, "id", "text", n = 3, threshold = 0.5).collect())
      assert(auto.map(key).toSet == naive.map(key).toSet, s"$name: auto output differs")
    }
    spark.stop()
  }
}
