package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.dedup.Dedup
import graft.sim.Embeddings
import graft.text.TextOps
import graft.multimodal.Multimodal

class OpsSpec extends AnyFunSuite with SparkTestBase {
  import org.apache.spark.sql.DataFrame

  lazy val docs: DataFrame = {
    import spark.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (2L, "the quick brown fox jumps over the lazy dog near the river bank tonight"),
      (3L, "der hund und die katze sind ein gutes team im garten heute"),
      (4L, "completely different words about spark query engines and columnar scans"),
      (5L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (6L, "")
    ).toDF("doc_id", "text")
  }

  test("polyHash matches the pinned portable value") {
    import spark.implicits._
    val h = Seq("abc").toDF("s").select(TextOps.polyHash(col("s"))).collect()(0).getLong(0)
    assert(h == 677551L) // ((97*131+98)*131+99) mod 1000003
  }

  test("tokenCount handles empty and multi-space text") {
    import spark.implicits._
    val r = Seq(("", 0L), ("  ", 0L), ("a", 1L), ("a  b\tc", 3L)).toDF("t", "want")
      .select(TextOps.tokenCount(col("t")).as("got"), col("want")).collect()
    r.foreach(row => assert(row.getLong(0) == row.getLong(1)))
  }

  test("langId picks marker-dominant language; und when none") {
    val got = docs.select(col("doc_id"), TextOps.langId(col("text"))).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "en"); assert(got(3L) == "de"); assert(got(6L) == "und")
  }

  test("exact dedup groups identical texts by fingerprint") {
    val g = Dedup.exactGroups(docs, "doc_id", "text").collect()
      .map(r => r.getLong(1) -> r.getLong(2)).toMap // keeper -> members
    assert(g(1L) == 2L) // docs 1 and 5 identical
    assert(g(2L) == 1L)
  }

  test("minhash LSH finds the near-identical pair and not the distinct one") {
    val pairs = Dedup.minhashPairs(docs.where(col("doc_id") =!= 6), "doc_id", "text",
      n = 3, k = 16, bands = 4, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L))) // one-word difference
    assert(pairs.contains((1L, 5L))) // identical
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L)) // unrelated doc
  }

  test("ngram jaccard: identical docs = 1.0; near pair above 0.5") {
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs((1L, 5L)) == 1.0)
    assert(pairs((1L, 2L)) > 0.5 && pairs((1L, 2L)) < 1.0)
  }

  test("simhash: identical docs hamming 0, near pair small, distinct large") {
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs((1L, 5L)) == 0L)
    assert(pairs((1L, 2L)) <= 8L)
    pairs.get((1L, 4L)).foreach(h => assert(h > 8L))
  }

  test("brute-force topk returns the planted nearest neighbor first") {
    import spark.implicits._
    val vecs = Seq(
      (0L, Array(1f, 0f, 0f, 0f)),
      (1L, Array(0.99f, 0.1f, 0f, 0f)), // nearest to 0
      (2L, Array(0f, 1f, 0f, 0f)),
      (3L, Array(-1f, 0f, 0f, 0f))
    ).toDF("vec_id", "embedding")
    val top = Embeddings.bruteForceTopK(vecs.where(col("vec_id") === 0), vecs, k = 2)
      .orderBy("rank").collect()
    assert(top(0).getLong(1) == 1L)
    assert(top(1).getLong(1) == 2L)
    assert(top.length == 2)
  }

  test("lsh cosine pairs are a subset of brute force and recover identicals") {
    import spark.implicits._
    val r = new scala.util.Random(3)
    val base = (0L until 40L).map(i => i -> Array.fill(16)(r.nextFloat() * 2 - 1))
    val planted = Seq(100L -> base(5)._2.map(x => x * 1.001f)) // near-identical to 5
    val df = (base ++ planted).toDF("vec_id", "embedding")
    val brute = Embeddings.bruteForcePairs(df, 0.9, vecCol = "embedding")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Embeddings.lshCosinePairs(df, 0.9, nPlanes = 8, tables = 6, dim = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(brute))
    assert(lsh.contains((5L, 100L)))
  }

  test("multimodal stub features have modality-specific shapes, deterministic") {
    val assets = Multimodal.assetsFromText(docs.where(length(col("text")) > 0), "doc_id", "text")
    val f1 = Multimodal.extractFeatures(assets, 4).collect()
      .map(a => a.asset_id -> a).toMap
    val f2 = Multimodal.extractFeatures(assets.repartition(2), 7).collect()
      .map(a => a.asset_id -> a).toMap
    assert(f1.keySet == f2.keySet && f1.nonEmpty)
    for ((id, a) <- f1) {
      val want = a.modality match {
        case "image" => 16; case "audio" => 8; case _ => 64
      }
      assert(a.features.length == want)
      assert(a.features.toSeq == f2(id).features.toSeq) // partition-invariant
      assert(a.n_bytes > 0)
    }
  }

  test("salted join equals plain join; salted sum equals plain sum") {
    import spark.implicits._
    val fact = (1 to 500).map(i => (i % 7L, i.toLong)).toDF("k", "v")
    val dim = Seq((0L, "a"), (1L, "b"), (2L, "c"), (3L, "d"), (4L, "e"), (5L, "f"), (6L, "g"))
      .toDF("k", "name")
    val plain = fact.join(dim, "k").groupBy("name").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedJoin(fact, dim, Seq("k"), 4, col("v"))
      .groupBy("name").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(plain == salted)
    val s1 = Skew.saltedSum(fact, Seq("k"), "v", 4, col("v")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val s2 = fact.groupBy("k").agg(sum("v").as("v")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(s1 == s2)
  }
}
