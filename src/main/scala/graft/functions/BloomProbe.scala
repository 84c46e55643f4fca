package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{BooleanType, DataType}

/** Bloom-filter membership probe whose filter bytes travel as a
  * BROADCAST VARIABLE, not a plan literal.
  *
  * Why: embedding the serialized filter as a base64 SQL literal works at
  * fixture scale but is a scale-killer pattern — a real blocklist's
  * filter is hundreds of MB, and a literal that size bloats every plan
  * copy, re-parses per use, and ships with every task closure. A
  * broadcast handle is bytes-small in the serialized expression; the
  * filter itself moves through Spark's torrent broadcast ONCE per
  * executor and deserializes lazily there (the same distribution path
  * the reference uses for its UnorderedKVOutput BROADCAST edge,
  * tez-runtime-library/.../broadcast). Bit-compatible with
  * graft_bloom_agg's output: both sides speak the spark-sketch
  * BloomFilter serialization format, so swapping literal → broadcast
  * changes no result (same oracle).
  *
  * Codegen: the expression registers ITSELF as a codegen reference
  * object, so whole-stage codegen calls `probe(h)` directly on the
  * per-executor instance with its lazily-built filter — no per-row
  * deserialization, no interpreted fallback in the hot scan loop.
  */
case class BloomMightContainBroadcast(
    bloom: Broadcast[Array[Byte]],
    child: Expression) extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_probe"

  @transient private lazy val filter =
    org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(bloom.value))

  /** Executor-side probe; also the codegen entry point. */
  def probe(h: Long): Boolean = filter.mightContainLong(h)

  override def nullSafeEval(h: Any): Any = probe(h.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloomProbe", this,
      classOf[BloomMightContainBroadcast].getName)
    nullSafeCodeGen(ctx, ev, h => s"${ev.value} = $ref.probe($h);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContainBroadcast =
    copy(child = newChild)
}
