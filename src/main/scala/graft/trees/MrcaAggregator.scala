package graft.trees

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Distributed MRCA as a typed Aggregator (reference:
  * operators/most_recent_common_ancestor_node.cpp — there a driver-side
  * walk; here the root-path longest-common-prefix is computed as a proper
  * partial aggregate, so MRCA needs no collect step: executors reduce
  * their partition's common prefix, the driver merges P prefixes).
  *
  * Buffer = (common root-path prefix so far, node names not in the tree,
  * null-row count). Null rows contribute to missingNodeCount (reference
  * counts them as num_empty, most_recent_common_ancestor_node.cpp:47-56)
  * but never to the not-in-tree name list.
  */
final case class MrcaBuf(prefix: Option[Seq[String]], missing: Set[String],
    nulls: Long)

/** (mrca node or null, sorted not-in-tree names, null-row count). */
final case class MrcaOut(mrca: String, missing: Seq[String], nulls: Long)

object MrcaAggregator {
  /** Spark's typed-Aggregator path never calls reduce for null inputs, so
    * callers `coalesce` null rows to this sentinel (NUL never appears in a
    * tree node label) to keep them countable.
    */
  val NullSentinel = "\u0000"
}

final class MrcaAggregator(tree: PhyloTree)
    extends Aggregator[String, MrcaBuf, MrcaOut] {

  override def zero: MrcaBuf = MrcaBuf(None, Set.empty, 0L)

  private def lcp(a: Seq[String], b: Seq[String]): Seq[String] =
    a.zip(b).takeWhile { case (x, y) => x == y }.map(_._1)

  override def reduce(b: MrcaBuf, name: String): MrcaBuf =
    if (name == null || name == MrcaAggregator.NullSentinel)
      b.copy(nulls = b.nulls + 1)
    else if (!tree.contains(name)) b.copy(missing = b.missing + name)
    else {
      val path = tree.pathToRoot(name).reverse // root-first
      b.copy(prefix = Some(b.prefix.map(lcp(_, path)).getOrElse(path)))
    }

  override def merge(a: MrcaBuf, b: MrcaBuf): MrcaBuf =
    MrcaBuf(
      (a.prefix, b.prefix) match {
        case (Some(x), Some(y)) => Some(lcp(x, y))
        case (x, y) => x.orElse(y)
      },
      a.missing ++ b.missing,
      a.nulls + b.nulls)

  override def finish(r: MrcaBuf): MrcaOut =
    MrcaOut(r.prefix.flatMap(_.lastOption).orNull, r.missing.toSeq.sorted,
      r.nulls)

  override def bufferEncoder: Encoder[MrcaBuf] = Encoders.product[MrcaBuf]
  override def outputEncoder: Encoder[MrcaOut] = Encoders.product[MrcaOut]
}
