package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Codegen'd Bloom-filter probe over a BROADCAST filter — the
  * fact-sized companion to `Bridge.bloomMightContain` (which inlines
  * the serialized filter into the plan as a Binary literal, fine for
  * dim-sized sketches but shipped with EVERY task's serialized plan).
  * Here the filter rides a torrent broadcast: published once per
  * filter version, fetched once per executor, referenced from
  * generated code via `ctx.addReferenceObj` — the right shape when
  * the filter covers an ever-growing accepted corpus (the streaming
  * dedup-ingest gate) rather than a small dimension. Probes via
  * `mightContainLong`, matching `putLong`/`stat.bloomFilter` key
  * material. */
case class BloomProbe(filter: Broadcast[BloomFilter], child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_probe"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_probe expects a BIGINT key, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any =
    filter.value.mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bc = ctx.addReferenceObj("bloomBc", filter)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = ((org.apache.spark.util.sketch.BloomFilter) $bc.value())" +
        s".mightContainLong($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomProbe =
    copy(child = newChild)
}

object BloomProbe {
  def column(filter: Broadcast[BloomFilter], key: Column): Column =
    org.apache.spark.sql.graft.Bridge.columnOf(
      BloomProbe(filter, org.apache.spark.sql.graft.Bridge.expressionOf(key)))
}
