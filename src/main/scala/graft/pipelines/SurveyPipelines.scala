package graft.pipelines

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.operators.Relational

/** The reference's three survey pipelines (SURVEY.md §3), re-expressed as
  * composed lazy stages over the export shape of FIXTURES.md §1. Each
  * pipeline is one Catalyst plan end-to-end — the reference materializes
  * eagerly after every operation
  * (/root/reference/lime_survey_orders_shipped.py:48-74).
  *
  * `updatedTs` is injected (fixed literal in tests) per the determinism
  * rule of SURVEY.md §7.4.4; production passes
  * `date_format(current_timestamp(), "yyyy-MM-dd HH:mm:ss")`, which
  * Catalyst folds to a single per-query value — exactly the reference's
  * same-literal-for-all-rows semantics (O13).
  */
object SurveyPipelines {

  /** Typed output rows (SURVEY.md §1.3: `Dataset[T]` after projection /
    * rename gives the compile-time column safety the reference lacks;
    * all-string except the coerced numeric, matching the reference's
    * in-flight types). */
  case class OrdersShippedRow(id_answer: String, date_sent: String,
      grade: Double, email: String, order_number: String, updated_ts: String)
  case class NpsRow(id_answer: String, date_sent: String, last_page: String,
      language: String, start_date: String, last_action_date: String,
      nps: Option[Double], email: String, cohort: String, updated_ts: String)
  case class ReturnsRow(id_answer: String, date_sent: String,
      grade: Option[Double], email: String, order_number: String,
      return_order_number: String, language: String, updated_ts: String,
      return_channel: String)

  def ordersShippedTyped(export: DataFrame, updatedTs: Column): Dataset[OrdersShippedRow] = {
    val spark = export.sparkSession
    import spark.implicits._
    ordersShipped(export, updatedTs).as[OrdersShippedRow]
  }

  def npsTyped(export: DataFrame, updatedTs: Column): Dataset[NpsRow] = {
    val spark = export.sparkSession
    import spark.implicits._
    nps(export, updatedTs).as[NpsRow]
  }

  def returnsTyped(export: DataFrame, updatedTs: Column): Dataset[ReturnsRow] = {
    val spark = export.sparkSession
    import spark.implicits._
    returns(export, updatedTs).as[ReturnsRow]
  }

  /** O7/O20 — nested-response un-nest: one output row per response, with
    * the map key exposed as `index` and the array position kept as
    * `_ingest_pos` (the deterministic keep-last tie-breaker, SURVEY.md
    * §7.4.1; the reference gets this implicitly from pandas' stable
    * positional order, /root/reference/lime_survey_orders_shipped.py:50-52).
    *
    * Input: `responses: array<map<responseId, map<col, value>>>`.
    * Output: `_ingest_pos: long, index: string, rec: map<string,string>`.
    * Both explodes are built-in generators — executor-parallel, the
    * antithesis of the reference's O(n²) driver loop. */
  def unnest(export: DataFrame): DataFrame =
    export
      .select(posexplode(col("responses")).as(Seq("_ingest_pos", "r")))
      .select(col("_ingest_pos").cast("long").as("_ingest_pos"),
        explode(col("r")).as(Seq("index", "rec")))

  /** Widen the dynamic per-survey question keys to columns (SURVEY.md
    * §1.2: the map is the one non-DataFrame-native shape; the column set
    * is fixed per survey at projection time). */
  private def widen(unnested: DataFrame, keys: Seq[String]): DataFrame =
    unnested.select(
      Seq(col("_ingest_pos"), col("index")) ++
        keys.map(k => col("rec").getItem(k).as(k)): _*)

  /** Orders-shipped pipeline
    * (/root/reference/lime_survey_orders_shipped.py:48-74): project →
    * dropna → rename → stamp → sort → keep-last per order_number →
    * grade∈A1..A5 → strip-"A" cast. Output columns: id_answer, date_sent,
    * grade (double), email, order_number, updated_ts. */
  def ordersShipped(export: DataFrame, updatedTs: Column): DataFrame = {
    val wide = widen(unnest(export), Seq("id", "datestamp", "q01", "q03", "q06"))
    val cleaned = (
      Relational.project(Seq("_ingest_pos", "id", "datestamp", "q01", "q03", "q06")) _
        andThen (df => df.na.drop("any",
          Seq("id", "datestamp", "q01", "q03", "q06"))) // O10 over the 5 data cols
        andThen Relational.renameAll(Map(
          "id" -> "id_answer", "datestamp" -> "date_sent", "q01" -> "grade",
          "q03" -> "email", "q06" -> "order_number"))
        andThen Relational.auditStamp("updated_ts", updatedTs)
      )(wide)
    // O18+O19: sort by (order_number, date_sent) then keep last ⇒ max
    // date_sent per order_number, ties to the latest ingest position.
    val deduped = Relational.keepLast(Seq("order_number"),
      Seq(col("date_sent").desc, col("_ingest_pos").desc))(cleaned)
    (Relational.membership("grade",
        Seq("A1", "A2", "A3", "A4", "A5")) _ // O16 before cast (cast safety)
      andThen Relational.regexStripCast("grade", "A") // O14
      )(deduped)
      .select("id_answer", "date_sent", "grade", "email", "order_number",
        "updated_ts")
  }

  /** NPS pipeline (/root/reference/lime_survey_nps.py:54-73): the
    * response-id map key (`index`) is the id column; 9-column projection;
    * subset dropna on {email, nps} (O11); alternation regex "A|N" (O15);
    * no sort/dedup/membership. */
  def nps(export: DataFrame, updatedTs: Column): DataFrame = {
    val wide = widen(unnest(export),
      Seq("submitdate", "lastpage", "startlanguage", "startdate",
        "datestamp", "q01", "q03", "q06"))
    (Relational.project(Seq("index", "submitdate", "lastpage",
        "startlanguage", "startdate", "datestamp", "q01", "q03", "q06")) _
      andThen Relational.renameAll(Map(
        "index" -> "id_answer", "submitdate" -> "date_sent",
        "lastpage" -> "last_page", "startlanguage" -> "language",
        "startdate" -> "start_date", "datestamp" -> "last_action_date",
        "q01" -> "nps", "q03" -> "email", "q06" -> "cohort"))
      andThen Relational.auditStamp("updated_ts", updatedTs)
      andThen Relational.dropNulls(Seq("email", "nps")) // O11
      andThen Relational.regexStripCast("nps", "A|N") // O15
      )(wide)
  }

  /** Returns pipeline (/root/reference/lime_survey_returns.py:55-73):
    * 8-column projection, full dropna, strip-"A" cast, final re-order
    * (the reference's explicit re-projection at line 73). */
  def returns(export: DataFrame, updatedTs: Column): DataFrame = {
    val wide = widen(unnest(export),
      Seq("id", "datestamp", "q01", "q03", "q06", "q12", "q22", "startlanguage"))
    (Relational.project(Seq("id", "datestamp", "q01", "q03", "q06",
        "q12", "q22", "startlanguage")) _
      andThen Relational.dropNullsAny _ // O10, all columns
      andThen Relational.renameAll(Map(
        "id" -> "id_answer", "datestamp" -> "date_sent", "q01" -> "grade",
        "q03" -> "email", "q06" -> "order_number", "q12" -> "return_channel",
        "q22" -> "return_order_number", "startlanguage" -> "language"))
      andThen Relational.auditStamp("updated_ts", updatedTs)
      andThen Relational.regexStripCast("grade", "A") // O14
      andThen Relational.project(Seq("id_answer", "date_sent", "grade",
        "email", "order_number", "return_order_number", "language",
        "updated_ts", "return_channel")) // final order, reference line 73
      )(wide)
  }
}
