package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k aggregate: keeps the k best (score DESC, key ASC)
  * pairs per group in a fixed-size buffer.
  *
  * Why a custom TypedImperativeAggregate (SURVEY §4 preference (b)):
  * the window-function formulation (q07) must shuffle EVERY row to its
  * group and sort full partitions; this aggregate's partial (map-side)
  * buffers carry at most k entries per group per partition, so at
  * 100 TB the shuffle volume is |groups| × k × partitions instead of
  * the whole table. Result: array<struct<score double, key bigint>>
  * sorted best-first.
  */
case class TopKAggregate(
    score: Expression,
    key: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKAggregate.Buffer] {

  import TopKAggregate.Buffer

  override def children: Seq[Expression] = Seq(score, key)

  /** Fail at ANALYSIS time on wrong input types — update() does raw
    * asInstanceOf, which would otherwise surface as a mid-job
    * ClassCastException. (The SQL registry below inserts Casts, so
    * numeric inputs of any width still work there.) */
  override def checkInputDataTypes(): TypeCheckResult =
    if (score.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_topk score must be DOUBLE, got ${score.dataType.sql}")
    else if (key.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_topk key must be BIGINT, got ${key.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType), StructField("key", LongType))))
  override def prettyName: String = "graft_topk"

  override def createAggregationBuffer(): Buffer = new Buffer(k)

  override def update(buf: Buffer, input: InternalRow): Buffer = {
    val s = score.eval(input)
    val kk = key.eval(input)
    if (s != null && kk != null)
      buf.insert(s.asInstanceOf[Double], kk.asInstanceOf[Long])
    buf
  }

  override def merge(buf: Buffer, other: Buffer): Buffer = {
    var i = 0
    while (i < other.size) { buf.insert(other.scores(i), other.keys(i)); i += 1 }
    buf
  }

  override def eval(buf: Buffer): Any = {
    val sorted = buf.sortedEntries
    new GenericArrayData(sorted.map { case (s, kk) =>
      InternalRow(s, kk)
    })
  }

  override def serialize(buf: Buffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    var i = 0
    while (i < buf.size) { out.writeDouble(buf.scores(i)); out.writeLong(buf.keys(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Buffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new Buffer(k)
    var i = 0
    while (i < n) { buf.insert(in.readDouble(), in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(score = newChildren(0), key = newChildren(1))
}

object TopKAggregate {
  /** Fixed-capacity buffer of (score, key), keeping the k best under
    * (score DESC, key ASC). Small k → simple arrays beat a heap. */
  final class Buffer(k: Int) {
    val scores = new Array[Double](k)
    val keys = new Array[Long](k)
    var size: Int = 0

    /** NaN-aware score compare: NaN ranks GREATEST and equal to
      * itself — the ordering both Spark's sort and DuckDB's ORDER BY
      * DESC apply — and −0.0 == 0.0 (Spark sort semantics). Plain
      * `>`/`==` would make a NaN entry unorderable: never better,
      * never worse, so an unfilled buffer could trap it and results
      * became insertion-order dependent (r7 ADVICE on s18). */
    @inline private def cmpScore(s1: Double, s2: Double): Int = {
      val n1 = java.lang.Double.isNaN(s1)
      val n2 = java.lang.Double.isNaN(s2)
      if (n1 && n2) 0 else if (n1) 1 else if (n2) -1
      else if (s1 == s2) 0 else if (s1 > s2) 1 else -1
    }

    /** true if (s1,k1) ranks better than (s2,k2). */
    @inline private def better(s1: Double, k1: Long, s2: Double, k2: Long): Boolean = {
      val c = cmpScore(s1, s2)
      c > 0 || (c == 0 && k1 < k2)
    }

    def insert(s: Double, kk: Long): Unit = {
      if (size < k) {
        scores(size) = s; keys(size) = kk; size += 1
      } else {
        // find current worst
        var worst = 0
        var i = 1
        while (i < k) {
          if (better(scores(worst), keys(worst), scores(i), keys(i))) worst = i
          i += 1
        }
        if (better(s, kk, scores(worst), keys(worst))) {
          scores(worst) = s; keys(worst) = kk
        }
      }
    }

    // same total order as better() — a divergent comparator here could
    // throw TimSort contract violations on NaN entries
    def sortedEntries: Array[(Double, Long)] =
      (0 until size).map(i => (scores(i), keys(i))).toArray
        .sortWith { case ((s1, k1), (s2, k2)) => better(s1, k1, s2, k2) }
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_topk",
      // widen any numeric score/key (INT, DECIMAL, …) to the buffer's
      // native types so SQL callers don't hit the strict type check
      exprs => TopKAggregate(Cast(exprs(0), DoubleType), Cast(exprs(1), LongType),
        exprs(2).eval(null).asInstanceOf[Number].intValue()),
      "built-in")
}
