package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Bounded top-k aggregate (SURVEY.md §7.3): keeps the k best
  * (score desc, id asc) pairs per group in a size-k heap.
  *
  * Replaces the `row_number().over(Window.orderBy(score.desc))` + filter
  * pattern for per-group top-k: the window form shuffles and SORTS every
  * candidate row per group (O(n log n) rows through the exchange), while
  * a TypedImperativeAggregate does map-side partial top-k — each input
  * partition forwards at most k rows per group, so the exchange carries
  * O(groups × k × partitions) rows no matter how large the candidate set
  * grows. At 100 TB that difference is the whole shuffle.
  *
  * Output: array<struct<score double, id bigint>> sorted best-first;
  * explode with posexplode to recover (rank, id, score) rows. Null
  * scores/ids are skipped (matching desc ordering, which ranks nulls
  * last — they can never enter a full top-k).
  */
case class TopKByScore(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]] {

  require(k > 0, s"k must be positive, got $k")

  /** Heap ordering with the WORST kept pair at the head (smaller score is
    * worse; on ties the larger id is worse, so ties keep the smaller id —
    * identical to ORDER BY score DESC, id ASC under row_number).
    */
  private val worstFirst: Ordering[(Double, Long)] = new Ordering[(Double, Long)] {
    override def compare(a: (Double, Long), b: (Double, Long)): Int = {
      val c = java.lang.Double.compare(b._1, a._1)
      if (c != 0) c else java.lang.Long.compare(a._2, b._2)
    }
  }

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType), StructField("id", LongType))))

  override def checkInputDataTypes(): TypeCheckResult =
    if (score.dataType == DoubleType && id.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (double, bigint), got " +
        s"(${score.dataType.simpleString}, ${id.dataType.simpleString})")

  override def prettyName: String = "top_k_by_score"

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty(worstFirst)

  private def offer(buf: mutable.PriorityQueue[(Double, Long)],
      cand: (Double, Long)): Unit =
    if (buf.size < k) buf.enqueue(cand)
    else if (worstFirst.compare(cand, buf.head) < 0) { buf.dequeue(); buf.enqueue(cand) }

  override def update(buf: mutable.PriorityQueue[(Double, Long)],
      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) offer(buf, (s.asInstanceOf[Double], i.asInstanceOf[Long]))
    buf
  }

  override def merge(buf: mutable.PriorityQueue[(Double, Long)],
      other: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    other.foreach(offer(buf, _))
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any = {
    val bestFirst: Seq[(Double, Long)] = buf.clone().dequeueAll.reverse
    new GenericArrayData(bestFirst.map(t => InternalRow(t._1, t._2)).toArray[Any])
  }

  override def serialize(buf: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    out.writeInt(buf.size)
    buf.foreach { case (s, i) => out.writeDouble(s); out.writeLong(i) }
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    var i = 0
    while (i < n) { buf.enqueue((in.readDouble(), in.readLong())); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(score = newChildren(0), id = newChildren(1))
}

object TopKByScore {
  /** Column form: `TopKByScore(cosine, neighborId, 5)` in an `agg(...)`. */
  def apply(score: Column, id: Column, k: Int): Column =
    Bridge.column(TopKByScore(
      Bridge.expression(score), Bridge.expression(id), k).toAggregateExpression())
}
