package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Bucketed warehouse layout — the storage-side half of shuffle
  * elimination. Writing both sides of a recurring join bucketed (and
  * sorted) by the join key means every subsequent join/aggregation on
  * that key is planned WITHOUT an Exchange: at 100 TB the one-time
  * bucketed write amortizes across every downstream query, which is the
  * single biggest shuffle saving available to a pipeline that joins the
  * same fact tables daily.
  *
  * Bucket count guidance: target file sizes of 128MB–1GB per bucket per
  * partition; too few buckets bounds parallelism, too many makes small
  * files. Must match on both sides for the exchange-free join (Spark
  * also accepts one side being a multiple of the other).
  */
object Warehouse {

  /** Save as a bucketed+sorted managed table (native Spark bucketing,
    * works on the in-memory session catalog — no Hive required). */
  def saveBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
      numBuckets: Int, sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }
}
