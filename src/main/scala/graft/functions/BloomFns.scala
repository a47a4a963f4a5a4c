package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Bloom prefilter machinery built on Spark's OWN runtime-filter
  * sketch (`BloomFilterAggregate` — the aggregate behind
  * `InjectRuntimeFilter`), used as an explicit operator-plan step.
  *
  * The build side stays fully distributed: group the key set by
  * `hash(key) % B` and aggregate ONE Bloom per bucket (partial+final
  * typed aggregate, map-side combinable). The B serialized sketches
  * are a bounded control-plane transfer (B × bloomBytes — the same
  * pattern as a broadcast-join build), and [[BloomBankContainsExpr]]
  * probes the right bucket's sketch per row inside whole-stage
  * codegen. Spark's own `might_contain` expression demands a
  * CONSTANT/scalar-subquery sketch, so a bucket-dispatched probe needs
  * this native form; each task deserializes each sketch once
  * (transient lazy bank), not per row.
  *
  * A Bloom can produce false POSITIVES only — consumers needing
  * exactness re-verify survivors against the real key set; the sketch
  * is a bandwidth valve, not an oracle.
  */
object BloomFns {

  /** Aggregate: builds a Bloom filter over `xxhash64(item)` with the
    * given capacity; returns the serialized sketch (binary).
    */
  def bloomAgg(item: Column, expectedItems: Long, numBits: Long): Column =
    ColumnShim.column(
      new BloomFilterAggregate(new XxHash64(Seq(ColumnShim.expression(item))),
        Literal(expectedItems), Literal(numBits)).toAggregateExpression())

  /** Probe: true iff bucket `bucket`'s sketch in `bank` might contain
    * `item` (hashed with xxhash64, matching [[bloomAgg]]'s insert
    * path). `bank(i)` must be the serialized sketch for bucket i.
    */
  def bankContains(bank: Seq[Array[Byte]], bucket: Column,
                   item: Column): Column =
    ColumnShim.column(BloomBankContainsExpr(bank,
      ColumnShim.expression(bucket),
      new XxHash64(Seq(ColumnShim.expression(item)))))
}

/** Membership probe against a BANK of per-bucket Bloom sketches:
  * `bank(bucket).mightContainLong(hash)`. The serialized bank rides
  * the expression (captured at plan time — bounded, B × bloomBytes);
  * deserialization happens once per task via the transient lazy
  * field, and the probe is a single virtual call under whole-stage
  * codegen.
  */
case class BloomBankContainsExpr(bankBytes: Seq[Array[Byte]],
    left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (b, h) => TypeCheckResult.TypeCheckFailure(
        s"bloom_bank_contains requires (bigint, bigint) inputs, got $b / $h")
    }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_bank_contains"

  @transient private lazy val bank: Array[BloomFilter] =
    bankBytes.map(b => BloomFilter.readFrom(new ByteArrayInputStream(b))).toArray

  /** Generated-code entry point: bucket ids outside the bank are a
    * caller bug — fail loudly rather than return a wrong membership.
    */
  def test(b: Long, h: Long): Boolean = bank(b.toInt).mightContainLong(h)

  override def nullSafeEval(b: Any, h: Any): Any =
    test(b.asInstanceOf[Long], h.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomBank", this,
      classOf[BloomBankContainsExpr].getName)
    defineCodeGen(ctx, ev, (b, h) => s"$ref.test($b, $h)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomBankContainsExpr =
    copy(left = newLeft, right = newRight)
}
