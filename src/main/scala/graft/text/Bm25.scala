package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BM25 document retrieval in EXACT integer-rational arithmetic — the
  * lexical-search companion to the embedding ANN suite (`sim.Embeddings`):
  * a training pipeline uses it to pull topical slices out of a corpus and
  * to mine hard negatives for retrieval training.
  *
  * Standard BM25 is float-laden twice over (ln() in the idf, doubles in
  * the tf normalization), so two engines disagree in the last ulp and no
  * hash gate can hold. This form keeps the exact BM25 structure but stays
  * rational end to end, with ONE floor per (doc, term):
  *
  *   k1 = 6/5, b = 3/4 (the textbook defaults, as exact rationals)
  *   avgdl = L / N  (L = total tokens, N = docs — kept as the pair (L, N))
  *   tf-component = tf·(k1+1) / (tf + k1·(1 − b + b·len/avgdl))
  *                = 44·tf·L / (20·tf·L + 6·L + 18·len·N)
  *   idf surrogate = (N − df + ½) / (df + ½) = (2N − 2df + 1) / (2df + 1)
  *     — the exact ODDS the textbook idf takes ln() of; ln is monotone, so
  *     per-term ordering is preserved and the value stays rational.
  *   score(d) = Σ_t  (SCALE · idfNum · 44·tf·L)  div  (idfDen · den)
  *
  * Overflow envelope: SCALE·(2N+1)·44·tf·L must fit a long — fine through
  * corpus·N products ~10^9 at SCALE 10^6; past that, swap the two products
  * to decimal(38,0) (same floors, wider register). Deterministic top-k:
  * ties at the k boundary break by doc_id in BOTH engines.
  *
  * Scale shape: tokenize → explode only the query terms (the filter is
  * pushed inside the explode's generator input, so non-query tokens never
  * become rows) → one groupBy(doc, term) with map-side partials → df and
  * corpus stats ride broadcasts → final top-k is orderBy+limit =
  * TakeOrderedAndProject (parallel partial top-k, no global sort).
  */
object Bm25 {

  val Scale = 1000000L

  /** Top-`k` (doc, score) for `queryTerms` over `docs(idCol, textCol)`,
    * scored by the integer BM25 form above. Only docs containing at least
    * one query term are scored. */
  def topK(docs: DataFrame, idCol: String, textCol: String,
           queryTerms: Seq[String], k: Int): DataFrame = {
    require(queryTerms.nonEmpty, "need at least one query term")
    val toks = docs.select(col(idCol).cast("long").as("doc_id"),
      TextOps.tokens(col(textCol)).as("t"))
    val lens = toks.select(col("doc_id"), size(col("t")).cast("long").as("len"))
    // corpus stats as a broadcast 1-row table: stays in the plan (no
    // driver collect), every executor gets (n, l) as a map-side constant
    val stats = lens.agg(count(lit(1)).cast("long").as("n"),
      coalesce(sum("len"), lit(0L)).as("l"))
    // drop non-query tokens BEFORE exploding: the generator's input array
    // is pre-filtered, so the explode emits only query-term hits
    val termArr = array(queryTerms.map(lit): _*)
    val tf = toks
      .select(col("doc_id"),
        explode(filter(col("t"), tk => array_contains(termArr, tk))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfs = tf.groupBy("term").agg(count(lit(1)).as("df"))

    val scored = tf
      .join(lens, "doc_id")
      .join(broadcast(dfs), "term")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), expr(
        s"($Scale * (2*n - 2*df + 1) * (44*tf*l)) div " +
          "((2*df + 1) * (20*tf*l + 6*l + 18*len*n))").as("s"))
      .groupBy("doc_id").agg(sum("s").as("score"))
    scored.orderBy(col("score").desc, col("doc_id").asc).limit(k)
  }

  /** DuckDB replay appended after a `tok(doc_id, t)` CTE; `termsSql` is a
    * SQL list literal like `['spark','hash','join']`. */
  def oracleCtes(termsSql: String, k: Int): String =
    ", lens AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS len FROM tok)" +
      ", stats AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(coalesce(sum(len), 0) AS BIGINT) AS l FROM lens)" +
      ", tf AS (SELECT doc_id, tok AS term, CAST(count(*) AS BIGINT) AS tf " +
      "FROM (SELECT doc_id, unnest(t) AS tok FROM tok) " +
      s"WHERE tok IN (SELECT unnest($termsSql)) GROUP BY 1, 2)" +
      ", dfs AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1)" +
      // CAST the sum: DuckDB SUM(BIGINT) widens to HUGEINT, which the
      // driver's comparator reads as float
      s", sc AS (SELECT tf.doc_id, CAST(SUM(($Scale * (2*n - 2*df + 1) * (44*tf*l)) // " +
      "((2*df + 1) * (20*tf*l + 6*l + 18*len*n))) AS BIGINT) AS score " +
      "FROM tf JOIN dfs USING (term) JOIN lens USING (doc_id) CROSS JOIN stats GROUP BY 1) " +
      s"SELECT doc_id, score FROM sc ORDER BY score DESC, doc_id LIMIT $k"
}
