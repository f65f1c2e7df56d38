package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.GraftShims
import org.apache.spark.sql.types._

import TopKAggregator.Heap

/** [[TopKAggregator]]'s bounded heap as a catalyst
  * `TypedImperativeAggregate` — the same map-side-partial top-k, minus the
  * typed-Dataset toll booth.
  *
  * The `groupByKey(...).mapValues(...).agg(aggregator)` formulation plans as
  * AppendColumns (a per-row Scala lambda materializing a `Tuple2`) feeding
  * an ObjectHashAggregate whose input side deserializes every scored row to
  * an external `Tuple2` again, then DeserializeToObject → MapPartitions →
  * SerializeFromObject to flatten the hits — five object-boundary operators
  * around the ONE hot loop every kNN/BM25/ADC serving path funnels through
  * (the r20 q32 plan: operators (8)-(16)). This aggregate reads (id, score)
  * straight from the codegen'd child's unsafe rows via bound attribute
  * references and returns the hits as an internal array, so the plan is
  * Project → ObjectHashAggregate(partial) → Exchange(q×k×parts rows) →
  * ObjectHashAggregate(final) → Generate(explode) — zero per-row lambdas,
  * zero external-object round trips, same bounded-heap shuffle contract.
  *
  * Semantics are bit-identical to [[TopKAggregator.topK]]: keep the k
  * highest-scoring (id, score) pairs, ties prefer the smaller id, output
  * sorted score desc then id asc. Null id/score inputs are skipped (the
  * typed path never saw them — its non-nullable encoder made them
  * impossible by construction).
  */
case class TopKAgg(
    idExpr: Expression,
    scoreExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Heap] {

  require(k > 0, s"top_k needs k > 0, got $k")

  override def children: Seq[Expression] = Seq(idExpr, scoreExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = TopKAgg.ResultType
  override def prettyName: String = "top_k"

  override def createAggregationBuffer(): Heap = TopKAggregator.newHeap(k)

  override def update(h: Heap, input: InternalRow): Heap = {
    val id = idExpr.eval(input)
    if (id != null) {
      val s = scoreExpr.eval(input)
      if (s != null)
        TopKAggregator.push(h, id.asInstanceOf[Long], s.asInstanceOf[Double])
    }
    h
  }

  override def merge(b1: Heap, b2: Heap): Heap = {
    var i = 0
    while (i < b2.size) {
      TopKAggregator.push(b1, b2.ids(i), b2.scores(i)); i += 1
    }
    b1
  }

  override def eval(h: Heap): Any = {
    // heap order is partial; the contract output is score desc, id asc
    val idx = Array.range(0, h.size).sortWith { (i, j) =>
      h.scores(i) > h.scores(j) ||
        (h.scores(i) == h.scores(j) && h.ids(i) < h.ids(j))
    }
    new GenericArrayData(idx.map { i =>
      new GenericInternalRow(Array[Any](h.ids(i), h.scores(i)))
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(h: Heap): Array[Byte] = {
    val buf = ByteBuffer.allocate(8 + 16 * h.size)
    buf.putInt(h.k).putInt(h.size)
    var i = 0
    while (i < h.size) { buf.putLong(h.ids(i)); buf.putDouble(h.scores(i)); i += 1 }
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): Heap = {
    val buf = ByteBuffer.wrap(bytes)
    val kk = buf.getInt(); val n = buf.getInt()
    val ids = new Array[Long](kk); val scores = new Array[Double](kk)
    var i = 0
    while (i < n) { ids(i) = buf.getLong(); scores(i) = buf.getDouble(); i += 1 }
    Heap(kk, ids, scores, n)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKAgg =
    copy(idExpr = newChildren(0), scoreExpr = newChildren(1))
}

object TopKAgg {
  private[functions] val ResultType: DataType = ArrayType(
    StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("score", DoubleType, nullable = false))),
    containsNull = false)

  /** `top_k(id, score, k)` as an aggregate Column. */
  def column(id: Column, score: Column, k: Int): Column =
    GraftShims.column(TopKAgg(
      GraftShims.expression(id), GraftShims.expression(score), k)
      .toAggregateExpression())

  /** The shared batch-serving tail: per-`qidCol` bounded-heap top-k over
    * (idCol, scoreCol), flattened back to (qid, id, score) rows with the
    * caller's column names. Replaces the typed
    * `groupByKey/mapValues/agg/flatMap` pattern at every batch call site. */
  def perQuery(scored: DataFrame, qidCol: String, idCol: Column,
      scoreCol: Column, k: Int, outId: String,
      outScore: String = "score"): DataFrame =
    scored.groupBy(col(qidCol))
      .agg(column(idCol, scoreCol, k).as("__topk"))
      .select(col(qidCol), explode(col("__topk")).as("__hit"))
      .select(col(qidCol), col("__hit.id").as(outId),
        col("__hit.score").as(outScore))
}
