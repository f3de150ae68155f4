package graft.sources

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.DataFrame

/** Co-located (bucketed) storage for shuffle-free big-big joins — the
  * layout counterpart of [[Layout]]'s degree relabel: where the reference
  * pre-arranges its static graph for mmap locality
  * (`/root/reference/src/graph.rs` layout step), a Spark warehouse
  * pre-arranges fact tables for JOIN locality.
  *
  * Writing both join sides `bucketBy(n, key)` means every later equi-join
  * on that key plans a SortMergeJoin with NO Exchange on either side:
  * task i reads bucket i of each table directly (Spark records the
  * bucketing in the catalog and the scan reports `HashPartitioning(key,
  * n)`, satisfying the join's distribution requirement at read time).
  *
  * The 100-TB shape: a fact table joined k times a day pays ONE layout
  * shuffle at ingest instead of k full-table exchanges — the same
  * trade the reference makes when it builds its forward/reverse indices
  * once and serves every query from them. Bucket count is a layout-time
  * choice: pick n so a single bucket of the LARGER table fits an
  * executor's scan budget (n grows with data, never with query count).
  */
object BucketedTables {

  private val tableCounter = new AtomicInteger(0)

  /** Writes `df` bucketed (and per-file sorted) by `key` into `nBuckets`
    * buckets as an EXTERNAL parquet table under `basePath`, and returns
    * the catalog-backed re-read (which carries the bucketing spec — a
    * plain `spark.read.parquet` of the same files would not). The table
    * name is suffixed with a session-unique id so repeated driver runs
    * never collide. */
  def writeBucketed(df: DataFrame, baseName: String, key: String,
                    nBuckets: Int, basePath: String): DataFrame = {
    require(nBuckets > 0, s"nBuckets $nBuckets must be positive")
    val spark = df.sparkSession
    val name = s"${baseName}_${tableCounter.incrementAndGet()}"
    spark.sql(s"DROP TABLE IF EXISTS $name")
    df.write.bucketBy(nBuckets, key).sortBy(key)
      .option("path", s"$basePath/$name")
      .format("parquet").mode("overwrite").saveAsTable(name)
    spark.table(name)
  }

  /** Equi-join of two tables bucketed by `key` with the SAME bucket
    * count: plans exchange-free (spec-pinned with broadcast disabled —
    * each side's scan already satisfies the join's required
    * distribution). */
  def colocatedJoin(a: DataFrame, b: DataFrame, key: String): DataFrame =
    a.join(b, Seq(key))
}
