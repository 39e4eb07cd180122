package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

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

  /** Per-slice corpus datasheet (Gebru et al. 2018, "Datasheets for
    * Datasets": the composition/provenance summary every released
    * corpus should ship; Dodge et al. 2021 ran exactly this profile
    * over C4): one row per slice (source) with size, token volume,
    * mean document length, exact-duplicate exposure, language spread,
    * and null-text count — the first artifact a curation run produces
    * and the one a consumer reads before training.
    *
    * Shape: one narrow per-doc projection (fingerprint, token count,
    * char count), a corpus-wide fingerprint-count aggregate (the q28
    * exact-dedup shuffle — duplicate exposure is CROSS-slice identity,
    * so it must see the whole corpus), a co-partitioned join back on
    * the fingerprint key, then one per-slice aggregate whose shuffle
    * carries slice-count rows. Ratios cross as exact integer micro
    * units. NULL text: counted in n_docs and n_null_text, zero tokens/
    * chars, never a duplicate (no fingerprint). */
  def datasheet(df: DataFrame, sliceCol: String, idCol: String,
      text: Column, lang: Column): DataFrame = {
    val perDoc = df.select(col(sliceCol).as("slice"), col(idCol).as("doc"),
        lang.as("__lang"), text.as("__t"))
      .select(col("slice"), col("doc"), col("__lang"),
        md5(col("__t")).as("__fp"),
        when(col("__t").isNull, 0L)
          .otherwise(size(TextAnalysis.tokens(col("__t"))).cast(LongType))
          .as("__nt"),
        when(col("__t").isNull, 0L)
          .otherwise(length(col("__t")).cast(LongType)).as("__nc"))
    val dupFp = perDoc.filter(col("__fp").isNotNull)
      .groupBy("__fp").agg(count(lit(1)).as("__c"))
      .filter(col("__c") >= 2L).select(col("__fp"), lit(true).as("__dup"))
    perDoc.join(dupFp, Seq("__fp"), "left")
      .groupBy("slice")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("__nt")).as("n_tokens"),
        expr("sum(__nt) * 1000000 div count(1)").as("mean_toks_micro"),
        sum(when(col("__dup"), 1L).otherwise(0L)).as("n_dup_docs"),
        expr("sum(CASE WHEN __dup THEN 1 ELSE 0 END) * 1000000 div count(1)")
          .as("dup_micro"),
        count_distinct(col("__lang")).as("n_langs"),
        sum(when(col("__fp").isNull, 1L).otherwise(0L)).as("n_null_text"),
        sum(col("__nc")).as("n_chars"))
  }
}
