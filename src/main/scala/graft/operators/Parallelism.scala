package graft.operators

import org.apache.spark.sql.DataFrame

/** Partition-count hygiene for compute-heavy narrow stages.
  *
  * A small parquet file arrives as ONE input partition, which pins every
  * downstream narrow transformation (shingling, hashing, cosine math) to a
  * single task — measured 7.8s single-threaded vs ~1s parallel for MinHash
  * signatures over 5k docs on local[32]. At 100 TB the scan already has
  * thousands of partitions, so [[ensure]] is a no-op there: it only
  * repartitions when the source has FEWER partitions than the session's
  * default parallelism, i.e. it never adds a shuffle to a big scan.
  */
object Parallelism {

  /** Repartition up to the session default parallelism iff the plan's
    * current partitioning is smaller. Driver-side planning only — no job
    * is triggered by the partition-count check. */
  def ensure(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
