package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Column, Encoder, functions => F}

import graft.geom.Overlay

/** Exact polygon-union AGGREGATE (X3) as a true Catalyst `Aggregator`
  * — `unary_union` as a group-by aggregate with map-side partial
  * aggregation, built on the exact vector overlay.
  *
  * Buffer = a list of even-odd ring GROUPS (each group is one valid
  * polygon-with-holes description): reduce appends the incoming ring as
  * its own group; merge concatenates and — past `CompactAt` groups —
  * COMPACTS by unioning into a single traced group, so hot keys shrink
  * their buffers during partial aggregation instead of shipping every
  * input ring through the shuffle (the map-side-combine shape the
  * flatMapGroups form cannot express). finish() unions the remaining
  * groups and returns traced rings (outer CCW, holes CW).
  *
  * A traced overlay result is itself a valid even-odd group (holes are
  * CW rings whose parity cancels), which is what makes compaction
  * closed under merge.
  */
object UnionAgg extends Aggregator[Seq[Double], Seq[Seq[Seq[Double]]], Seq[Seq[Double]]] {

  private val CompactAt = 32

  private def unionGroups(groups: Seq[Seq[Seq[Double]]]): Seq[Seq[Double]] =
    Overlay.unionGroups(groups.map(_.map(_.toArray)).toIndexedSeq).map(_.toSeq)

  override def zero: Seq[Seq[Seq[Double]]] = Nil

  override def reduce(b: Seq[Seq[Seq[Double]]], ring: Seq[Double]): Seq[Seq[Seq[Double]]] =
    maybeCompact(if (ring != null && ring.length >= 6) b :+ Seq(ring) else b)

  override def merge(b1: Seq[Seq[Seq[Double]]], b2: Seq[Seq[Seq[Double]]]): Seq[Seq[Seq[Double]]] =
    maybeCompact(b1 ++ b2)

  /** Geometric compaction: past `CompactAt` groups, only re-trace once
    * the UNCOMPACTED tail carries at least as many vertices as the
    * traced head — so the head at least doubles (in absorbed input)
    * between compactions and each ring is re-traced O(log n) times,
    * not once per `CompactAt` subsequent inputs (quadratic-in-vertices
    * per compaction × n/32 compactions on a hot key). The buffer stays
    * within ~2× the traced result's size, keeping the map-side-combine
    * shuffle benefit. */
  private def maybeCompact(b: Seq[Seq[Seq[Double]]]): Seq[Seq[Seq[Double]]] =
    if (b.size <= CompactAt) b
    else {
      val headV = b.head.iterator.map(_.length).sum
      var tailV = 0
      val it = b.iterator.drop(1)
      while (it.hasNext && tailV < headV) tailV += it.next().iterator.map(_.length).sum
      if (tailV >= headV) Seq(unionGroups(b)) else b
    }

  /** Always re-traces, so output rings are canonical (outer CCW, holes
    * CW, exact vertices) regardless of input orientation. */
  override def finish(b: Seq[Seq[Seq[Double]]]): Seq[Seq[Double]] =
    if (b.isEmpty) Nil else unionGroups(b)

  override def bufferEncoder: Encoder[Seq[Seq[Seq[Double]]]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Seq[Double]]] = ExpressionEncoder()
}

object UnionAggApi {
  /** DataFrame-facing column: `df.groupBy(...).agg(st_union_agg($"poly"))`. */
  def st_union_agg(ring: Column): Column = F.udaf(UnionAgg).apply(ring)
}
