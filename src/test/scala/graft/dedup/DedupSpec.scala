package graft.dedup

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** Pins the shingle-frequency cap (document-frequency cut) of jaccardPairs
  * against a brute-force Scala mirror, on a corpus with a PLANTED hot
  * shingle shared by every document. */
class DedupSpec extends AnyFunSuite with SparkTestBase {

  private val docSchema = StructType(Seq(
    StructField("id", LongType), StructField("text", StringType)))

  /** Two near-dup clusters + singletons, every doc carrying the same hot
    * 3-token phrase (one shared shingle across the whole corpus). */
  private def corpus: Seq[(Long, String)] = {
    val hot = "hot hot hot"
    val clusterA = (0 until 4).map(i =>
      (i.toLong, s"$hot alpha beta gamma delta epsilon zeta eta theta v$i"))
    val clusterB = (0 until 4).map(i =>
      (10L + i, s"$hot one two three four five six seven w$i"))
    val singles = (0 until 6).map(i =>
      (20L + i, s"$hot s${i}a s${i}b s${i}c s${i}d s${i}e s${i}f s${i}g"))
    clusterA ++ clusterB ++ singles
  }

  private def shinglesOf(text: String, n: Int): Set[String] = {
    val t = text.trim.split("\\s+").toSeq
    if (t.size < n) Set.empty
    else (0 to t.size - n).map(i => t.slice(i, i + n).mkString(" ")).toSet
  }

  /** Brute-force df-cut jaccard pairs (the contract jaccardPairs implements). */
  private def expectedPairs(docs: Seq[(Long, String)], n: Int, threshold: Double,
                            cap: Long): Set[(Long, Long, Double)] = {
    val sh = docs.map { case (id, t) => id -> shinglesOf(t, n) }.toMap
    val df = sh.values.flatten.groupBy(identity).map { case (s, xs) => s -> xs.size }
    val keep: Set[String] =
      if (cap <= 0) df.keySet.toSet
      else df.filter(_._2 <= cap).keySet.toSet
    (for {
      (a, sa) <- sh.toSeq; (b, sb) <- sh.toSeq if a < b
      inter = (sa intersect sb intersect keep).size
      if inter > 0
      j = inter.toDouble / (sa.size + sb.size - inter)
      if j >= threshold
    } yield (a, b, j)).toSet
  }

  private def run(cap: Long): Set[(Long, Long, Double)] = {
    import scala.jdk.CollectionConverters._
    val df = spark.createDataFrame(
      corpus.map { case (id, t) => Row(id, t) }.asJava, docSchema)
    Dedup.jaccardPairs(df, "id", "text", n = 3, threshold = 0.3, maxShingleFreq = cap)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
  }

  private def runPrefix(cap: Long, threshold: Double = 0.3): Set[(Long, Long, Double)] = {
    import scala.jdk.CollectionConverters._
    val df = spark.createDataFrame(
      corpus.map { case (id, t) => Row(id, t) }.asJava, docSchema)
    Dedup.jaccardPairsPrefix(df, "id", "text", n = 3, threshold = threshold,
        maxShingleFreq = cap)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
  }

  test("prefix-filtered jaccard == naive jaccard (uncapped and capped)") {
    for (cap <- Seq(0L, 5L)) {
      assert(runPrefix(cap) == run(cap), s"cap=$cap")
      assert(runPrefix(cap) == expectedPairs(corpus, 3, 0.3, cap), s"cap=$cap mirror")
    }
  }

  test("xxhash64 index keys reproduce the string-keyed jaccard exactly") {
    import scala.jdk.CollectionConverters._
    val df = spark.createDataFrame(
      corpus.map { case (id, t) => Row(id, t) }.asJava, docSchema)
    for (cap <- Seq(0L, 5L)) {
      val hashed = Dedup.jaccardPairs(df, "id", "text", n = 3, threshold = 0.3,
          maxShingleFreq = cap, hashKeys = true)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(hashed == run(cap), s"cap=$cap")
    }
  }

  test("auto strategy: regime picks + identical output on all three shapes") {
    import scala.jdk.CollectionConverters._
    def mk(rows: Seq[(Long, String)]) = spark.createDataFrame(
      rows.map { case (id, t) => Row(id, t) }.asJava, docSchema)
    val rnd = new scala.util.Random(41L)
    def words(n: Int, tag: String) =
      (0 until n).map(_ => s"$tag${rnd.nextInt(1000000)}").mkString(" ")
    // (a) near-unique: df ≈ 1 → work ≈ postings → naive
    val unique = (0L until 60L).map(i => (i, words(40, "u")))
    // (b) sub-threshold boilerplate: 40% shared template, pairs score ~0.25
    val tmpl40 = words(24, "t")
    val boiler = (0L until 200L).map(i => (i, tmpl40 + " " + words(36, "b")))
    // (c) above-threshold duplication: 70% shared template, pairs ~0.54
    val tmpl70 = words(42, "t")
    val dup = (0L until 200L).map(i => (i, tmpl70 + " " + words(18, "b")))
    val picks = Seq(("near_unique", unique, "naive"),
      ("boilerplate", boiler, "prefix"), ("dup_heavy", dup, "naive"))
    for ((name, rows, expect) <- picks) {
      val df = mk(rows)
      val stats = Dedup.jaccardStats(df, "id", "text", n = 3)
      val pick = Dedup.chooseJaccardStrategy(stats, threshold = 0.5)
      assert(pick == expect, s"$name: picked $pick (stats=$stats)")
      val key = (r: Row) => (r.getLong(0), r.getLong(1), r.getDouble(2))
      val auto = Dedup.jaccardPairsAuto(df, "id", "text", n = 3, threshold = 0.5)
        .collect().map(key).toSet
      val naive = Dedup.jaccardPairs(df, "id", "text", n = 3, threshold = 0.5)
        .collect().map(key).toSet
      assert(auto == naive, s"$name: auto output differs from naive")
    }
  }

  test("prefix-filtered jaccard == naive on a random corpus at several thresholds") {
    import scala.jdk.CollectionConverters._
    val rnd = new scala.util.Random(97L)
    val vocab = (0 until 40).map(i => s"w$i")
    val bases = (0 until 60).map { _ =>
      (0 until 12).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    // 60 random docs + 10 planted near-dups of the first ten
    val all = bases.zipWithIndex.map { case (t, i) => (i.toLong, t) } ++
      (0 until 10).map(i => (100L + i, bases(i) + " extra"))
    val df = spark.createDataFrame(
      all.map { case (id, t) => Row(id, t) }.asJava, docSchema)
    for (t <- Seq(0.3, 0.5, 0.8)) {
      val naive = Dedup.jaccardPairs(df, "id", "text", n = 3, threshold = t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val prefix = Dedup.jaccardPairsPrefix(df, "id", "text", n = 3, threshold = t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(prefix == naive, s"threshold=$t")
      if (t <= 0.5) assert(naive.nonEmpty) // the planted near-dups are found
    }
  }

  test("uncapped: hot shingle creates cross-cluster candidate pairs") {
    val got = run(0L)
    assert(got == expectedPairs(corpus, 3, 0.3, 0L))
    // the hot shingle alone is not enough to cross the threshold, but the
    // within-cluster near-dups are found
    assert(got.exists { case (a, b, _) => a < 10 && b < 10 })
  }

  test("capped: df-cut drops the planted hot shingle, pairs match the mirror") {
    val got = run(5L)
    val expect = expectedPairs(corpus, 3, 0.3, 5L)
    assert(got == expect)
    assert(expect.nonEmpty) // within-cluster pairs survive the cut
    // the cut changes scores: capped jaccard of a surviving pair is lower
    val gotMap = got.map(t => (t._1, t._2) -> t._3).toMap
    val uncapped = run(0L).map(t => (t._1, t._2) -> t._3).toMap
    val shared = gotMap.keySet intersect uncapped.keySet
    assert(shared.nonEmpty && shared.forall(k => gotMap(k) <= uncapped(k)))
  }

  test("decontaminate: n-gram overlap vs brute-force mirror, broadcast on/off equal") {
    import scala.jdk.CollectionConverters._
    // benchmark: two "eval" docs; corpus: a verbatim leak, a partial-phrase
    // leak, a doc sharing only shorter-than-n overlap, and clean docs
    val bench = Seq(
      (100L, "what is the capital of france paris obviously"),
      (101L, "list the first five prime numbers please"))
    val corp = Seq(
      (1L, "what is the capital of france paris obviously"), // verbatim
      (2L, "intro words then the first five prime numbers appear here"),
      (3L, "capital of france is lovely"), // only 3-gram overlap, n=4 → clean
      (4L, "completely unrelated text about spark shuffles and joins"))
    def mk(rows: Seq[(Long, String)]) = spark.createDataFrame(
      rows.map { case (i, t) => Row(i, t) }.asJava, docSchema)
    def mirror(minHits: Long): Map[Long, Long] = {
      val bs = bench.flatMap { case (_, t) => shinglesOf(t, 4) }.toSet
      corp.map { case (id, t) => id -> shinglesOf(t, 4).count(bs).toLong }
        .filter(_._2 >= minHits).toMap
    }
    for (minHits <- Seq(1L, 3L)) {
      val got = Dedup.decontaminate(mk(corp), mk(bench), "id", "text",
          n = 4, minHits = minHits)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == mirror(minHits), s"minHits=$minHits")
      // the fallback arm must actually exercise a NON-broadcast join: with
      // a 4-doc bench set the optimizer would auto-broadcast it regardless
      // of the dropped hint, so disable auto-broadcast for this arm
      val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val noBcastDf = Dedup.decontaminate(mk(corp), mk(bench), "id", "text",
          n = 4, minHits = minHits, broadcastBench = false)
        assert(!noBcastDf.queryExecution.executedPlan.toString
          .contains("BroadcastHashJoin"), "fallback arm still broadcasts")
        val noBcast = noBcastDf
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(noBcast == got)
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
    }
    // non-vacuous: the verbatim leak is flagged with its full shingle count,
    // the short-overlap and clean docs are not
    val m = mirror(1L)
    assert(m(1L) == shinglesOf(corp.head._2, 4).size && !m.contains(3L) && !m.contains(4L))
  }

  test("substringDedup excises covered tokens; within-doc repeats count; short/empty docs pass through") {
    import spark.implicits._
    val docs = Seq(
      (0L, "a b c d e"),       // "b c d" shared with doc 1 → remove b,c,d
      (1L, "x b c d y"),       // → "x y"
      (2L, "q r"),             // under n → untouched
      (3L, ""),                // empty → 0/0/""
      (4L, "m n o m n o"))     // within-doc repeat of "m n o" → all covered
      .toDF("doc_id", "text")
    val got = graft.dedup.Dedup.substringDedup(docs, "doc_id", "text", n = 3)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got === Map(
      0L -> ((5L, 3L, "a e")),
      1L -> ((5L, 3L, "x y")),
      2L -> ((2L, 0L, "q r")),
      3L -> ((0L, 0L, "")),
      4L -> ((6L, 6L, ""))))
  }

  test("substringDedup removal is a per-position union: overlapping dup spans merge") {
    import spark.implicits._
    // "u v w x" duplicated AND "v w x y" duplicated → doc 0 loses u..y
    val docs = Seq(
      (0L, "s u v w x y t"),
      (1L, "u v w x"),
      (2L, "v w x y")).toDF("doc_id", "text")
    val got = graft.dedup.Dedup.substringDedup(docs, "doc_id", "text", n = 4)
      .collect().map(r => (r.getLong(0), r.getString(3))).toMap
    assert(got(0L) === "s t")
  }
}
