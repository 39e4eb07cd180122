package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality gate: declarative expectations evaluated in ONE pass —
  * the validation stage an ETL pipeline runs between extract and load
  * (the reference's pipelines load unchecked; a 100 TB ingest can't).
  *
  * Each rule is a boolean Column over the row; the operator reports one
  * row per rule with its violation count and rate. A NULL rule result
  * counts as a violation (an expectation that cannot be evaluated is not
  * met — the same contract as SQL `CHECK` under `coalesce(c, false)`),
  * so `col.isNotNull && col > 0` behaves as written on null data.
  */
object Quality {

  /** Evaluate all `rules` in one scan: a single global aggregate of
    * conditional sums (narrow, codegen'd, map-side partial — the
    * exchange carries ONE row of counters per partition regardless of
    * corpus size), then a tiny explode to one row per rule. Adding a
    * rule adds a counter, not a pass. */
  def expectations(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "at least one expectation")
    val aggs = count(lit(1)).as("__n") +: rules.zipWithIndex.map {
      case ((_, c), i) =>
        sum(when(!coalesce(c, lit(false)), 1L).otherwise(0L)).as(s"__v$i")
    }
    val pairs = rules.zipWithIndex.map { case ((name, _), i) =>
      struct(lit(name).as("rule"), col(s"__v$i").as("n_violations"))
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(col("__n"), explode(array(pairs: _*)).as("r"))
      .select(col("r.rule").as("rule"),
        col("r.n_violations").as("n_violations"),
        col("__n").as("n_rows"),
        (col("r.n_violations").cast("double") / col("__n"))
          .as("violation_rate"))
  }

  /** Bucketed table checksum for replica/anti-entropy verification:
    * per-bucket row count + XOR of a row content hash. XOR is
    * order-independent AND incrementally maintainable (re-XOR a changed
    * row's old and new hash), so two 100 TB replicas compare by
    * exchanging ≤ nBuckets tiny rows, and a mismatch narrows to a
    * bucket without re-reading the table. One codegen'd hash aggregate;
    * the caller's `rowHash` must render doubles through an exact
    * integer domain (cents, micros) — engine double-to-string
    * formatting is NOT portable. */
  def checksum(df: DataFrame, bucket: Column, rowHash: Column): DataFrame =
    df.groupBy(bucket.as("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        expr_bitxor(rowHash).as("xor_hash"))

  private def expr_bitxor(c: Column): Column = {
    // functions._ has no bit_xor wrapper; route through the SQL name
    import org.apache.spark.sql.functions.{call_function}
    call_function("bit_xor", c)
  }

  /** Referential-integrity expectation as a COUNT (orphan fact keys not
    * present in the dim key set) — the one common rule [[expectations]]'
    * single-pass shape can't express. One left-anti join; broadcast when
    * the dim fits, shuffle otherwise — or feed the dim through
    * [[Bloom.keyBloom]] first at 100 TB for the prefiltered form. */
  def orphanCount(fact: DataFrame, factKey: String,
      dim: DataFrame, dimKey: String): DataFrame =
    // SQL referential integrity: a NULL foreign key is not a violation
    // (it could never equal any dim key) — don't count it as an orphan
    fact.filter(col(factKey).isNotNull)
      .join(dim.select(col(dimKey).as("__dk")),
        col(factKey) === col("__dk"), "left_anti")
      .agg(count(lit(1)).as("n_orphans"))
}
