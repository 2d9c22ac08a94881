package graft.seq

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.seq.Ambiguity.Mode

/** Position predicates over the diffed sequence representation — the WHERE
  * surface of the reference's filter layer (reference:
  * scalar_expressions/symbol_equals.cpp, has_mutation.cpp,
  * insertion_contains.cpp, mutation_profile.cpp; physical case analysis
  * symbol_in_set.cpp:129-264).
  *
  * Each predicate is a plain Column over (cov_start, cov_end, muts,
  * missing), O(|diffs|) per row, fully codegen-friendly — at scale these
  * can be routed through the pre-aggregated `mut_index` as a semi-join
  * instead (same results; planner's choice, ≙ IndexScan vs Selection).
  */
object SeqPredicates {

  private def covered(pos: Int, p: String): Column =
    lit(pos) >= col(s"${p}cov_start") && lit(pos) <= col(s"${p}cov_end") &&
      !array_contains(col(s"${p}missing"), pos)

  private def mutAt(pos: Int, p: String): Column =
    exists(col(s"${p}muts"), m => m.getField("pos") === pos)

  private def mutAtIn(pos: Int, syms: Set[String], p: String): Column = {
    val symsLit = array(syms.toSeq.sorted.map(lit): _*)
    exists(col(s"${p}muts"), m =>
      m.getField("pos") === pos && array_contains(symsLit, m.getField("sym")))
  }

  /** `nucleotideEquals`/`aminoAcidEquals(position, symbol)`: symbol at
    * 1-based `pos` equals `sym`; `'.'` matches the reference symbol
    * (reference: symbol_equals.cpp:96-100 rewrites to SymbolInSet).
    * The four cases of symbol_in_set.cpp:129-264 collapse to:
    * ref-symbol ∈ set → covered ∧ no-diff-outside-set; else → diff ∈ set.
    */
  def symbolEquals(pos: Int, sym: String, ref: String, prefix: String = ""): Column = {
    val s = if (sym == ".") ref.charAt(pos - 1).toString else sym
    symbolInSet(pos, Set(s), ref, prefix)
  }

  /** Symbol at `pos` is a member of `syms` (the SymbolInSet physical op). */
  def symbolInSet(pos: Int, syms: Set[String], ref: String, prefix: String = ""): Column = {
    val refSym = ref.charAt(pos - 1).toString
    val diffMatch = mutAtIn(pos, syms - refSym, prefix)
    if (syms.contains(refSym))
      diffMatch || (covered(pos, prefix) && !mutAt(pos, prefix))
    else diffMatch
  }

  /** maybe/exact ambiguity: expand the target symbol to its matching
    * stored-symbol set at plan time (see [[Ambiguity]]), then SymbolInSet.
    */
  def symbolEqualsMode(
      pos: Int, sym: Char, ref: String,
      codesFor: Map[Char, Set[Char]], mode: Mode, prefix: String = ""): Column =
    symbolInSet(pos, Ambiguity.matchingSymbols(codesFor, sym, mode).map(_.toString),
      ref, prefix)

  /** `hasMutation(position)`: symbol at pos ∉ {reference symbol, missing}
    * (reference: has_mutation.cpp:72-75).
    */
  def hasMutation(pos: Int, prefix: String = ""): Column = mutAt(pos, prefix)

  /** `insertionContains(position, regexValue)` over an
    * `ins: array<struct<pos,ins>>` column (reference:
    * insertion_contains.cpp; the 3-mer index acceleration becomes an
    * ins_index semi-join at scale).
    */
  def insertionContains(pos: Int, pattern: String, insCol: String = "ins"): Column =
    exists(col(insCol), i =>
      i.getField("pos") === pos && i.getField("ins").rlike(pattern))

  /** `mutationProfile(distance, profile)` — conservative Hamming-like
    * distance from a profile string, computed from the DIFF representation
    * in O(|diffs| + |profile−ref diffs|) per row (reference:
    * mutation_profile.cpp — the hardest predicate).
    *
    * Let D = positions where profile differs from ref (excluding profile
    * `skip` positions). Starting from "row equals ref":
    *   distance = |D ∩ covered| − |missing ∩ D|
    *            − #(muts at D with sym = profile[pos])     (diff repaired it)
    *            + #(muts outside D with profile[pos] ≠ skip) (new mismatch)
    */
  def profileDistance(profile: String, ref: String, skip: Char = 'n',
      prefix: String = ""): Column = {
    require(profile.length == ref.length, "profile must span the reference")
    val dPositions = (1 to profile.length)
      .filter(p => profile(p - 1) != skip && profile(p - 1) != ref(p - 1))
    val dLit = array(dPositions.map(lit): _*)
    val skipLit = lit(skip.toString)

    val base = size(filter(dLit, p =>
      p >= col(s"${prefix}cov_start") && p <= col(s"${prefix}cov_end")))
    val missInD = size(filter(col(s"${prefix}missing"), p => array_contains(dLit, p)))
    val repaired = size(filter(col(s"${prefix}muts"), m =>
      array_contains(dLit, m.getField("pos")) &&
        m.getField("sym") === SequenceModel.refAt(profile, m.getField("pos"))))
    val added = size(filter(col(s"${prefix}muts"), m =>
      !array_contains(dLit, m.getField("pos")) &&
        SequenceModel.refAt(profile, m.getField("pos")) =!= skipLit))
    base - missInD - repaired + added
  }
}
