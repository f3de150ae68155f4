package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** TF-IDF document-pair cosine similarity over an inverted index — the
  * lexical doc-to-doc companion to [[Bm25]] (query-to-doc) and to the
  * embedding pair generators (`sim.Embeddings.lshCosinePairs`): a
  * boilerplate/mirror detector that needs no embeddings.
  *
  * Weights stay in exact integer arithmetic so both engines agree
  * hash-for-hash: w(d,t) = tf(d,t) · (N·SCALE div df(t)) — one floor per
  * term, everything else exact long sums. The only doubles are the final
  * cosine = dot / (√n2_a·√n2_b), computed from exact longs in both
  * engines and rounded to 6 dp.
  *
  * Scale shape: tokenize → one groupBy(doc, term) with map-side partials
  * → df and the (N) stat ride broadcasts → candidate pairs come from the
  * inverted index (docs meet ONLY on shared terms — never an all-pairs
  * join), with a document-frequency cut dropping terms with df > maxDf:
  * the same quadratic-hot-bucket defense as the Jaccard suite's shingle
  * cap (`dedup.Dedup`), and the standard stop-word move — a term in half
  * the corpus carries ~no idf weight but would dominate join cost.
  * Norms are computed over the kept (post-cut) terms on both engines.
  *
  * Overflow envelope: dot terms are tf²·(N·SCALE/df)² — with SCALE 10³
  * fine through N·tf products ~10^9; past that swap the dot/norm sums to
  * decimal(38,0) (same arithmetic, wider register).
  */
object TfIdf {

  val Scale = 1000L

  /** (id_a, id_b, dot, cos) for every pair with cosine ≥ `threshold`
    * (id_a < id_b). `dot` is the exact integer tf-idf dot product. */
  def cosinePairs(docs: DataFrame, idCol: String, textCol: String,
                  maxDf: Long, threshold: Double): DataFrame = {
    require(maxDf >= 1, "maxDf must be positive")
    val toks = docs.select(col(idCol).cast("long").as("doc_id"),
      TextOps.tokens(col(textCol)).as("t"))
    val tf = toks.select(col("doc_id"), explode(col("t")).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfs = tf.groupBy("term").agg(count(lit(1)).as("df"))
      .where(col("df") <= maxDf)
    val stats = toks.agg(count(lit(1)).cast("long").as("n"))
    // materialize the weight table ONCE: it feeds the norm aggregation and
    // BOTH sides of the candidate self-join — without this the whole
    // tokenize→tf→df pipeline (two shuffles) is recomputed four times in
    // the plan (a real pipeline at scale persists or writes out exactly
    // this posting list)
    val w = tf.join(broadcast(dfs), "term")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), col("term"),
        (col("tf") * expr(s"(n * $Scale) div df")).as("w"))
      .localCheckpoint()
    val norms = w.groupBy("doc_id").agg(sum(col("w") * col("w")).as("n2"))
    val dots = w.select(col("doc_id").as("id_a"), col("term"), col("w").as("wa"))
      .join(w.select(col("doc_id").as("id_b"), col("term"), col("w").as("wb")), "term")
      .where(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(sum(col("wa") * col("wb")).as("dot"))
    dots
      .join(norms.select(col("doc_id").as("id_a"), col("n2").as("na2")), "id_a")
      .join(norms.select(col("doc_id").as("id_b"), col("n2").as("nb2")), "id_b")
      .withColumn("cos", round(col("dot") /
        (sqrt(col("na2").cast("double")) * sqrt(col("nb2").cast("double"))), 6))
      .where(col("cos") >= threshold)
      .select("id_a", "id_b", "dot", "cos")
  }

  /** DuckDB replay appended after a `tok(doc_id, t)` CTE — identical
    * floors, sums and the one rounded double. */
  def oracleCtes(maxDf: Long, threshold: Double): String =
    ", tf AS (SELECT doc_id, tok AS term, CAST(count(*) AS BIGINT) AS tf " +
      "FROM (SELECT doc_id, unnest(t) AS tok FROM tok) GROUP BY 1, 2)" +
      s", dfs AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1 " +
      s"HAVING count(*) <= $maxDf)" +
      ", stats AS (SELECT CAST(count(*) AS BIGINT) AS n FROM tok)" +
      s", w AS (SELECT doc_id, term, tf * ((n * $Scale) // df) AS w " +
      "FROM tf JOIN dfs USING (term) CROSS JOIN stats)" +
      ", norms AS (SELECT doc_id, CAST(sum(w*w) AS BIGINT) AS n2 FROM w GROUP BY 1)" +
      ", dots AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, " +
      "CAST(sum(a.w*b.w) AS BIGINT) AS dot FROM w a " +
      "JOIN w b ON a.term = b.term AND a.doc_id < b.doc_id GROUP BY 1, 2) " +
      "SELECT id_a, id_b, dot, cos FROM (SELECT id_a, id_b, dot, " +
      "round(dot / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))), 6) AS cos " +
      "FROM dots JOIN norms na ON na.doc_id = id_a JOIN norms nb ON nb.doc_id = id_b) " +
      s"WHERE cos >= $threshold"
}
