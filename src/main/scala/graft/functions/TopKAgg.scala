package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Bounded top-k aggregate: `graft_topk(score BIGINT, tag STRING, k INT)` →
  * `ARRAY<STRUCT<score BIGINT, tag STRING>>`, the k largest scores per
  * group, ordered score desc then tag asc (the tag also breaks score ties,
  * so the result is fully deterministic).
  *
  * This is the scale-right alternative to the `row_number() OVER
  * (PARTITION BY g ORDER BY s DESC) <= k` window idiom: the window plan
  * shuffles EVERY row to its group's partition and sorts the whole group;
  * this aggregate keeps an O(k) heap per group that partial-aggregates
  * map-side, so only ≤ k·groups rows ever cross the exchange. At 100 TB
  * with k = 3 that is the difference between sorting the corpus and
  * shipping a few rows per group. (`q_topk_parts` is driver-verified
  * against the window form's oracle; TopKAggSpec proves plan shape.)
  *
  * Buffer = min-heap of (score, tag) whose head is the WEAKEST retained
  * element (lowest score; ties: largest tag), giving O(log k) insert and
  * O(1) should-replace tests; serialization is a plain length-prefixed
  * (long, UTF) stream for the partial-aggregate exchange.
  */
case class TopKAgg(
    scoreChild: Expression,
    tagChild: Expression,
    kChild: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Long, String)]] {

  // Dequeues the weakest retained element: max under (score reversed, tag).
  private val weakestFirst: Ordering[(Long, String)] =
    Ordering.Tuple2(Ordering.Long.reverse, Ordering.String)

  private lazy val k: Int = {
    require(kChild.foldable, "graft_topk: k must be a literal")
    val v = kChild.eval().asInstanceOf[Int]
    require(v > 0, s"graft_topk: k must be positive, got $v")
    v
  }

  override def prettyName: String = "graft_topk"
  override def children: Seq[Expression] = Seq(scoreChild, tagChild, kChild)

  // ExpectsInputTypes is off-limits (AbstractDataType is private[sql]), so
  // the exact-type contract is enforced here: BIGINT score, STRING tag,
  // literal INT k — callers cast explicitly, no implicit coercions.
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = scoreChild.dataType == LongType &&
      tagChild.dataType == StringType && kChild.dataType == IntegerType
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_topk expects (BIGINT, STRING, INT literal), got " +
        s"(${scoreChild.dataType.sql}, ${tagChild.dataType.sql}, ${kChild.dataType.sql})")
  }

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", LongType, nullable = false),
      StructField("tag", StringType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): mutable.PriorityQueue[(Long, String)] =
    mutable.PriorityQueue.empty(weakestFirst)

  private def offer(
      buf: mutable.PriorityQueue[(Long, String)],
      score: Long, tag: String): Unit = {
    if (buf.size < k) { buf.enqueue((score, tag)); return }
    val (ws, wt) = buf.head
    if (score > ws || (score == ws && tag < wt)) {
      buf.dequeue(); buf.enqueue((score, tag))
    }
  }

  override def update(
      buf: mutable.PriorityQueue[(Long, String)],
      input: InternalRow): mutable.PriorityQueue[(Long, String)] = {
    val s = scoreChild.eval(input)
    val t = tagChild.eval(input)
    if (s != null && t != null) {
      offer(buf, s.asInstanceOf[Long], t.asInstanceOf[UTF8String].toString)
    }
    buf
  }

  override def merge(
      buf: mutable.PriorityQueue[(Long, String)],
      other: mutable.PriorityQueue[(Long, String)]): mutable.PriorityQueue[(Long, String)] = {
    other.foreach { case (s, t) => offer(buf, s, t) }
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(Long, String)]): Any = {
    val sorted = buf.toArray.sortBy { case (s, t) => (-s, t) }
    new GenericArrayData(sorted.map { case (s, t) =>
      InternalRow(s, UTF8String.fromString(t))
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: mutable.PriorityQueue[(Long, String)]): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    out.writeInt(buf.size)
    buf.foreach { case (s, t) => out.writeLong(s); out.writeUTF(t) }
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(data: Array[Byte]): mutable.PriorityQueue[(Long, String)] = {
    val in = new DataInputStream(new ByteArrayInputStream(data))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    var i = 0
    while (i < n) { buf.enqueue((in.readLong(), in.readUTF())); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): TopKAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKAgg =
    copy(scoreChild = newChildren(0), tagChild = newChildren(1),
      kChild = newChildren(2))
}

object TopKAgg {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.GraftColumnBridge

  /** DataFrame-side constructor: `TopKAgg.topK(score, tag, 3)`. */
  def topK(score: Column, tag: Column, k: Int): Column =
    GraftColumnBridge.column(
      TopKAgg(
        GraftColumnBridge.expression(score),
        GraftColumnBridge.expression(tag),
        org.apache.spark.sql.catalyst.expressions.Literal(k))
        .toAggregateExpression())
}
