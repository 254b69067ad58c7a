package graft.functions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k state: a worst-at-head priority queue over
  * (score, id), capped at k. Total order: higher score is better;
  * equal scores prefer the SMALLER id (deterministic, engine-portable
  * — matches `ORDER BY score DESC, id` in SQL replays). */
final class TopKState(val k: Int) {
  private[functions] val worstFirst: Ordering[(Double, Long)] =
    new Ordering[(Double, Long)] {
      def compare(a: (Double, Long), b: (Double, Long)): Int = {
        val c = java.lang.Double.compare(b._1, a._1) // lower score = worse = "larger"
        if (c != 0) c else java.lang.Long.compare(a._2, b._2) // larger id = worse
      }
    }
  private[functions] val heap =
    scala.collection.mutable.PriorityQueue.empty[(Double, Long)](worstFirst)

  def add(score: Double, id: Long): Unit = {
    val cand = (score, id)
    if (heap.size < k) heap.enqueue(cand)
    else if (worstFirst.compare(cand, heap.head) < 0) { heap.dequeue(); heap.enqueue(cand) }
  }

  /** Best-first snapshot. */
  def sortedDesc: Array[(Double, Long)] = heap.toArray.sorted(worstFirst)
}

/** Grouped top-k as a single-pass aggregate — the scale-correct
  * replacement for the row_number()-window idiom: a window must
  * shuffle and SORT every row of every group, while this aggregate
  * keeps a k-bounded heap per group and, crucially, participates in
  * MAP-SIDE partial aggregation, so each input partition forwards at
  * most k rows per group across the exchange. At 100 TB the window
  * sorts the corpus; this forwards k·partitions·groups heap entries.
  *
  * Returns array<struct<score double, id bigint>> sorted best-first
  * (score desc, id asc on ties) — posexplode to get ranked rows.
  */
case class TopKPairs(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKState] {

  require(k >= 1 && k <= (1 << 20), "k must be in [1, 2^20]")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = score.dataType == DoubleType && id.dataType == LongType
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      "top_k_pairs expects (double score, bigint id), got " +
        s"(${score.dataType.simpleString}, ${id.dataType.simpleString}) — " +
        "cast inputs (the TopKAgg.topK wrapper does)")
  }

  // NULL rows are DROPPED, not ranked: a SQL `ORDER BY score DESC, id
  // LIMIT k` replay keeps null-score rows NULLS LAST when a group has
  // fewer than k scored rows — oracles over nullable scores must add
  // `WHERE score IS NOT NULL` to match (current callers are non-null)
  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", DoubleType), StructField("id", LongType))),
    containsNull = false)

  override def createAggregationBuffer(): TopKState = new TopKState(k)

  override def update(b: TopKState, input: InternalRow): TopKState = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      b.add(s.asInstanceOf[Double], i.asInstanceOf[Long])
    b
  }

  override def merge(b: TopKState, o: TopKState): TopKState = {
    o.heap.foreach { case (s, i) => b.add(s, i) }
    b
  }

  override def eval(b: TopKState): Any =
    new GenericArrayData(b.sortedDesc.map { case (s, i) =>
      InternalRow(s, i)
    }.asInstanceOf[Array[Any]])

  override def serialize(b: TopKState): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    val arr = b.heap.toArray
    out.writeInt(arr.length)
    arr.foreach { case (s, i) => out.writeDouble(s); out.writeLong(i) }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKState = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val st = new TopKState(k)
    var j = 0
    while (j < n) { st.add(in.readDouble(), in.readLong()); j += 1 }
    st
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKPairs =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKPairs =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKPairs =
    copy(score = newChildren(0), id = newChildren(1))

  override def prettyName: String = "top_k_pairs"
}

object TopKAgg {
  import org.apache.spark.sql.{Column, GraftShim}

  /** Column form: top-k (score, id) pairs per group, best-first. */
  def topK(score: Column, id: Column, k: Int): Column =
    GraftShim.column(TopKPairs(
      GraftShim.expression(score.cast("double")),
      GraftShim.expression(id.cast("long")), k).toAggregateExpression())
}
