package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.util.sketch.BloomFilter

/** Per-row membership probe against a MAP of bloom filters keyed by
  * bucket — the probe shape [[graft.streaming.ReplayGuard]]'s sharded
  * sidecars need: each row tests ONLY its own bucket's filter, in O(1)
  * per row regardless of how many buckets the batch touches.
  *
  * The alternative — a nested CASE WHEN chain over the touched buckets,
  * each branch holding one sidecar's bytes as a literal — evaluates
  * O(buckets) branch predicates PER ROW (CaseWhen is sequential) and
  * builds an expression tree whose depth and embedded-literal mass make
  * analysis and codegen themselves the bottleneck past ~100 buckets
  * (measured: the chain form tripled the streaming-sink bench entries
  * at 256 buckets). Here the filters ride the expression as one
  * serialized map (the same touched-buckets × sidecar-size bytes the
  * chain would ship), deserialized lazily ONCE per executor instance,
  * then probed by hash lookup.
  *
  * CodegenFallback is deliberate: the per-row work is a map lookup plus
  * a bloom probe — interpretation overhead is noise next to it, and the
  * expression sits in batch-sized streaming admission scans, not in the
  * wide analytical paths PlanShapeSpec keeps inside codegen spans.
  *
  * A bucket absent from the map is DEFINITELY NEW (its sidecar does not
  * exist ⇒ nothing was ever recorded there) — the probe returns false,
  * mirroring the guard's contract that a bloom miss is proof of
  * novelty. */
case class BucketedBloomMightContain(bucket: Expression, hash: Expression,
                                     blooms: Map[Long, Array[Byte]])
  extends BinaryExpression with CodegenFallback {

  override def left: Expression = bucket
  override def right: Expression = hash
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bucketed_bloom_might_contain"

  @transient private lazy val filters: Map[Long, BloomFilter] =
    blooms.map { case (k, bytes) =>
      k -> BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))
    }

  override protected def nullSafeEval(b: Any, h: Any): Any =
    filters.get(b.asInstanceOf[Long]) match {
      case Some(bf) => bf.mightContainLong(h.asInstanceOf[Long])
      case None => false
    }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(bucket = newLeft, hash = newRight)
}

object BucketedBloom {
  /** Column form: true iff `hash` might be in `bucket`'s filter. */
  def might_contain(bucket: Column, hash: Column,
                    blooms: Map[Long, Array[Byte]]): Column =
    GraftFunctions.toColumn(BucketedBloomMightContain(
      GraftFunctions.toExpression(bucket), GraftFunctions.toExpression(hash),
      blooms))
}
