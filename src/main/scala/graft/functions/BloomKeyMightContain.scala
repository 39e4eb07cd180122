package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Native membership probe against a pre-built key Bloom filter — the
  * predicate half of [[graft.operators.Bloom.prefilterJoin]]'s semi-join
  * reduction.
  *
  * Why a custom `Expression`: the probe must run inside whole-stage
  * codegen on the FACT side of a join (it exists to cut shuffle volume,
  * so it sits in the hottest scan in the query), and the filter itself
  * lives on the driver as a query-construction artifact. Spark's own
  * `BloomFilterMightContain` is internal to AQE's runtime-filter rewrite
  * and not constructible from the public API; a UDF would box every key
  * and break codegen. This expression carries the built filter as a
  * plan-time constant (`BloomFilterImpl` is `Serializable`), evaluates
  * `mightContainLong` on the primitive, and exposes the object to
  * generated code via `addReferenceObj` — zero allocation per row.
  *
  * Contract: input key as LONG (callers cast — integral join keys only;
  * the sketch hashes longs and strings differently, so one canonical
  * key type keeps the probe portable). Null key → null (the filter
  * drops it, matching inner-join semantics on a null key). False
  * positives pass by design; the join that follows re-checks exactly.
  */
case class BloomKeyMightContain(child: Expression, bloom: BloomFilter)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_key_might_contain expects BIGINT key, got ${child.dataType.catalogString}")

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def prettyName: String = "bloom_key_might_contain"

  override def nullSafeEval(key: Any): Any =
    bloom.mightContainLong(key.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, k => {
      val bf = ctx.addReferenceObj("bloom", bloom,
        classOf[BloomFilter].getName)
      s"${ev.value} = $bf.mightContainLong($k);"
    })

  override protected def withNewChildInternal(newChild: Expression): BloomKeyMightContain =
    copy(child = newChild)
}
