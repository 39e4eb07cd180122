package graft.operators

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Distinct, Join, LogicalPlan, RepartitionOperation, Sort, Window => LWindow}

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

  /** The probe (optimize + physical-plan via `.rdd`) is a driver-side
    * planning cost paid per [[ensure]] call. Query builders construct
    * the same scan lineage over and over (every declared query re-reads
    * the same tables), so the probed result is memoized by the
    * CANONICALIZED analyzed plan: same semantic plan → same scan files →
    * same partition count. The value is the probed partition count
    * (-1 = wide plan, leave untouched), NOT the decision — the decision
    * also depends on the calling session's parallelism, which is
    * compared fresh each call. Bounded: cleared wholesale at [[CacheCap]]
    * entries (plans are small and the cap is generous; an LRU would be
    * ceremony for a driver-side planning cache). */
  private val CacheCap = 256
  private val probeCache = new ConcurrentHashMap[(LogicalPlan, Long), Integer]()

  /** File-level fingerprint of every scan leaf — part of the cache key
    * because canonicalized-plan equality is PATH-based for file scans: a
    * re-read of a path whose files were overwritten canonicalizes equal
    * to the old plan but scans different physical data, and a stale
    * partition count would defeat the repartition this operator exists
    * to apply. `inputFiles` comes from the relation's already-cached
    * listing (a new `spark.read` of a rewritten path builds a fresh
    * index), so this costs a fold over file-name strings, not an
    * re-listing. */
  private def scanFingerprint(plan: LogicalPlan): Option[Long] = {
    var known = true
    val fp = plan.collectLeaves().foldLeft(0L) { (acc, leaf) =>
      val h = leaf match {
        case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          lr.relation match {
            case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
              fs.location.inputFiles.foldLeft(fs.sizeInBytes.toLong)(
                (a, p) => a * 31L + p.hashCode)
            case other => other.hashCode.toLong
          }
        case _: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => 0L
        case other =>
          // a leaf whose file listing we can't see (DSv2 relation, RDD
          // scan): its hashCode need not change when the underlying
          // path is rewritten, so a cached count could go stale — mark
          // the plan uncacheable and re-probe each time
          known = false
          other.hashCode.toLong
      }
      acc * 31L + h
    }
    if (known) Some(fp) else None
  }

  private def probedPartitions(df: DataFrame): Int = {
    val plan = df.queryExecution.optimizedPlan
    val hasWideOp = plan.collectFirst {
      case _: Join | _: Aggregate | _: LWindow | _: Sort | _: Distinct => ()
      case _: RepartitionOperation => ()
    }.isDefined
    // a scalar/IN subquery hides its Aggregate INSIDE an expression, not
    // the operator tree — and `.rdd` on such a plan runs the subquery's
    // whole job synchronously (prepare()/waitForSubqueries()), the exact
    // eager-execution trap the wide-op guard exists to avoid. Treat it
    // like a wide plan: already-planned subqueries imply a shuffle-wide
    // stage anyway.
    val hasSubquery = plan.exists(_.expressions.exists(_.exists(
      _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.PlanExpression[_]])))
    if (hasWideOp || hasSubquery) -1 else df.rdd.getNumPartitions
  }

  /** A predicate Catalyst will NOT move: `cond` OR'd with an
    * always-false non-deterministic term (`spark_partition_id() < 0`).
    * Optimizer pushdown rules refuse to relocate conditions containing
    * non-deterministic expressions — and because the term is a
    * DISJUNCT, the condition cannot be split into pushable conjuncts
    * either — so a filter built from this stays exactly where it is
    * written. This is the escape hatch for the one case [[ensure]]
    * cannot cover: a pushable predicate ABOVE the repartition gets
    * substituted through the projection and pushed below the exchange,
    * dragging the heavy narrow compute it guards (JSON parse, regex)
    * back onto the single scan task. Runtime semantics are identical
    * (partition ids are non-negative, the disjunct is constant-false,
    * and codegen short-circuits it when `cond` holds); only the
    * plan-time mobility changes. `spark_partition_id`, not `rand`:
    * Spark 4 constant-folds out-of-range rand comparisons, which
    * silently dissolves the barrier. Use ONLY above an [[ensure]] on a
    * deliberately-widened stage: on an already-wide scan the same
    * predicate should stay pushable so it reaches the parquet reader. */
  def unpushable(cond: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    cond || (org.apache.spark.sql.functions.spark_partition_id() <
      org.apache.spark.sql.functions.lit(0))

  /** [[unpushable]] for VALUES: pins an expensive projected expression
    * where it is written. The hazard is INFERRED filters — e.g.
    * `InferFiltersFromGenerate` derives `size(arr) > 0` above an
    * explode, and predicate pushdown then SUBSTITUTES the whole array
    * expression into the predicate and drags it below the widening
    * exchange onto the single scan task (with any inlined token split
    * re-evaluated per element — measured 2.5 s of q144's 2.9 s). A
    * nondeterministic term makes the projection non-substitutable, so
    * inferred predicates stay put and reference the COMPUTED column.
    * Runtime semantics identical: partition ids are non-negative, the
    * branch is constant-false, codegen short-circuits it. */
  def opaque(value: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    when(spark_partition_id() < lit(0), lit(null)).otherwise(value)
  }

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
    val analyzed = df.queryExecution.analyzed
    val n = scanFingerprint(analyzed) match {
      case Some(fp) =>
        val key = (analyzed.canonicalized, fp)
        var cached = probeCache.get(key)
        if (cached == null) {
          cached = Integer.valueOf(probedPartitions(df))
          if (probeCache.size >= CacheCap) probeCache.clear()
          probeCache.put(key, cached)
        }
        cached.intValue()
      case None => probedPartitions(df) // uncacheable leaf: probe fresh
    }
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (n >= 0 && n < target) {
      // hash-repartition on the row CONTENT, not round-robin: a keyless
      // repartition(n) pays a local sort of its whole input first
      // (sortBeforeRepartition, on since SPARK-23207 so retried tasks
      // reproduce their row-to-partition assignment) — measured ~500 ms
      // serialized on the 3-task lineitem scan at sf0.1, the single
      // largest stage of every co-purchase graph query (round 14).
      // Hashing the output attributes is deterministic per ROW (retry-
      // safe with no sort) and spreads as evenly as the content varies;
      // every ensure call site feeds row-independent compute, so
      // placement is semantically irrelevant. Map-typed columns are not
      // hashable (ANSI) and drop out of the key; an all-map projection
      // falls back to the sorted round-robin path.
      val hashable = df.queryExecution.analyzed.output
        .filterNot(a => containsMap(a.dataType))
      if (hashable.nonEmpty)
        df.repartition(target,
          hashable.map(a => org.apache.spark.sql.GraftShims.columnOf(a)): _*)
      else df.repartition(target)
    } else df
  }

  private def containsMap(dt: org.apache.spark.sql.types.DataType): Boolean =
    dt match {
      case _: org.apache.spark.sql.types.MapType => true
      case s: org.apache.spark.sql.types.StructType =>
        s.fields.exists(f => containsMap(f.dataType))
      case a: org.apache.spark.sql.types.ArrayType => containsMap(a.elementType)
      case _ => false
    }
}
