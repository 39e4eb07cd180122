package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Distinct, Join, RepartitionOperation, Sort, Window => LWindow}

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

  /** Repartition up to the session default parallelism iff the plan is a
    * narrow (scan-rooted) lineage with fewer partitions than the target.
    *
    * Plans containing a wide operator (join/aggregate/window/sort/
    * distinct/repartition) are returned untouched for two reasons: their
    * output partitioning is already `spark.sql.shuffle.partitions`-wide,
    * and — the sharp edge — calling `.rdd` on an AQE plan with exchanges
    * MATERIALIZES the upstream shuffle stages eagerly at construction
    * time, doubling work when the real action runs. On narrow plans
    * `.rdd` only plans; no job is triggered. */
  def ensure(df: DataFrame): DataFrame = {
    val hasWideOp = df.queryExecution.optimizedPlan.collectFirst {
      case _: Join | _: Aggregate | _: LWindow | _: Sort | _: Distinct => ()
      case _: RepartitionOperation => ()
    }.isDefined
    if (hasWideOp) df
    else {
      val target = df.sparkSession.sparkContext.defaultParallelism
      if (df.rdd.getNumPartitions < target) df.repartition(target) else df
    }
  }
}
