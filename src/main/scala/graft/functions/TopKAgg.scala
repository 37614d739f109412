package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded-heap per-group TOP-K aggregate: `graft_topk(score, id, k)`
  * returns the group's k highest-scoring (score, id) pairs as a sorted
  * array of structs (score desc, id asc).
  *
  * This is the scale-right form of "top N per group": a window
  * `row_number() ≤ k` must shuffle and SORT every row of every group,
  * while this aggregate carries at most k entries per group per
  * partition (a `TypedImperativeAggregate`, so it rides Spark's
  * ObjectHashAggregate with map-side partial aggregation and
  * buffer-to-buffer merge). For a group with n rows the state is O(k)
  * and the work O(n log k) — no per-group sort, no window exchange.
  *
  * The heap keeps the WORST retained entry on top (min-score, then
  * max-id), so admission is one peek and replacement one dequeue.
  *
  * Null handling: rows with a null score or id are DROPPED (a window
  * form would rank null scores nulls-last instead — callers that can
  * see null scores and want them retained must coalesce first).
  * Signed zero: scores are canonicalized `-0.0 → 0.0` on enqueue so
  * the heap's total order agrees with Spark SQL / DuckDB comparisons,
  * which treat the two as equal and fall through to the id tiebreak. */
case class TopKByAgg(
    score: Expression, id: Expression, kExpr: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[
    scala.collection.mutable.PriorityQueue[(Double, Long)]] {

  private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue()

  override def children: Seq[Expression] = Seq(score, id, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    new StructType().add("score", DoubleType).add("id", LongType),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (score.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_topk score must be DOUBLE, got ${score.dataType.sql}")
    else if (id.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_topk id must be BIGINT, got ${id.dataType.sql}")
    else if (!kExpr.foldable || kExpr.dataType != IntegerType ||
      kExpr.eval() == null)
      TypeCheckResult.TypeCheckFailure(
        "graft_topk k must be a non-null foldable INT literal")
    else TypeCheckResult.TypeCheckSuccess

  /** The one ordering both heap and output use, so retention and
    * presentation cannot disagree: as a COMPARATOR its maximum is the
    * group's worst retained entry (dequeue target); as a SORT it
    * yields score desc (NaN first, as both Spark and DuckDB order a
    * DESC sort), then id asc — exactly the `row_number()` window
    * order the oracles equate this aggregate with. */
  private val heapOrd: Ordering[(Double, Long)] =
    new Ordering[(Double, Long)] {
      override def compare(a: (Double, Long), b: (Double, Long)): Int = {
        val c = java.lang.Double.compare(b._1, a._1)
        if (c != 0) c else java.lang.Long.compare(a._2, b._2)
      }
    }

  override def createAggregationBuffer()
      : scala.collection.mutable.PriorityQueue[(Double, Long)] =
    scala.collection.mutable.PriorityQueue.empty(heapOrd)

  override def update(
      buf: scala.collection.mutable.PriorityQueue[(Double, Long)],
      input: InternalRow)
      : scala.collection.mutable.PriorityQueue[(Double, Long)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      // + 0.0 canonicalizes -0.0 so heap order matches SQL comparison
      buf.enqueue((s.asInstanceOf[Double] + 0.0, i.asInstanceOf[Long]))
      if (buf.size > k) { buf.dequeue(); () }
    }
    buf
  }

  override def merge(
      buf: scala.collection.mutable.PriorityQueue[(Double, Long)],
      other: scala.collection.mutable.PriorityQueue[(Double, Long)])
      : scala.collection.mutable.PriorityQueue[(Double, Long)] = {
    other.foreach { t =>
      buf.enqueue(t)
      if (buf.size > k) { buf.dequeue(); () }
    }
    buf
  }

  override def eval(
      buf: scala.collection.mutable.PriorityQueue[(Double, Long)]): Any = {
    val sorted = buf.toArray.sorted(heapOrd)
    new GenericArrayData(sorted.map { case (s, i) =>
      InternalRow(s, i)
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(
      buf: scala.collection.mutable.PriorityQueue[(Double, Long)])
      : Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    buf.foreach { case (s, i) => bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte])
      : scala.collection.mutable.PriorityQueue[(Double, Long)] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var j = 0
    while (j < n) { buf.enqueue((bb.getDouble, bb.getLong)); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKByAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKByAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByAgg =
    copy(score = newChildren(0), id = newChildren(1),
      kExpr = newChildren(2))
  override def prettyName: String = "graft_topk"
}
