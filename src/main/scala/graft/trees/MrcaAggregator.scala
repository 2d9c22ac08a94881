package graft.trees

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Distributed MRCA as a typed Aggregator (reference:
  * operators/most_recent_common_ancestor_node.cpp — there a driver-side
  * walk; here the root-path longest-common-prefix is computed as a proper
  * partial aggregate, so MRCA needs no collect step: executors reduce
  * their partition's common prefix, the driver merges P prefixes).
  *
  * Buffer = (common root-path prefix so far, node names not in the tree).
  * Nulls are ignored (matching the engine's distinct-values behavior).
  */
final case class MrcaBuf(prefix: Option[Seq[String]], missing: Set[String])

final class MrcaAggregator(tree: PhyloTree)
    extends Aggregator[String, MrcaBuf, (String, Seq[String])] {

  override def zero: MrcaBuf = MrcaBuf(None, Set.empty)

  private def lcp(a: Seq[String], b: Seq[String]): Seq[String] =
    a.zip(b).takeWhile { case (x, y) => x == y }.map(_._1)

  override def reduce(b: MrcaBuf, name: String): MrcaBuf =
    if (name == null) b
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
      a.missing ++ b.missing)

  override def finish(r: MrcaBuf): (String, Seq[String]) =
    (r.prefix.flatMap(_.lastOption).orNull, r.missing.toSeq.sorted)

  override def bufferEncoder: Encoder[MrcaBuf] = Encoders.product[MrcaBuf]
  override def outputEncoder: Encoder[(String, Seq[String])] =
    Encoders.product[(String, Seq[String])]
}
