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
  *
  * Predicates always evaluate to non-null booleans: a row with a null
  * sequence (null cov_start) matches nothing, and its complement under
  * `!` therefore matches — exactly the reference's excludeNullSequences +
  * bitmap-Complement behavior (symbol_in_set.cpp:106-126).
  */
object SeqPredicates {

  private def covered(pos: Int, p: String): Column =
    lit(pos) >= col(s"${p}cov_start") && lit(pos) <= col(s"${p}cov_end") &&
      !array_contains(col(s"${p}missing"), pos)

  private def mutAt(pos: Int, p: String): Column =
    exists(col(s"${p}muts"), m => m.getField("pos") === pos)

  private def mutAtIn(pos: Int, syms: Set[String], p: String): Column =
    if (syms.isEmpty) lit(false)
    else {
      val symsLit = array(syms.toSeq.sorted.map(lit): _*)
      exists(col(s"${p}muts"), m =>
        m.getField("pos") === pos && array_contains(symsLit, m.getField("sym")))
    }

  /** `nucleotideEquals`/`aminoAcidEquals(position, symbol)`: symbol at
    * 1-based `pos` equals `sym`; `'.'` matches the reference symbol
    * (reference: symbol_equals.cpp:96-100 rewrites to SymbolInSet).
    */
  def symbolEquals(pos: Int, sym: String, ref: String, prefix: String = "",
      missingSym: String = "N", localRef: String = ""): Column = {
    val s = if (sym == ".") ref.charAt(pos - 1).toString else sym
    symbolInSet(pos, Set(s), ref, prefix, missingSym, localRef)
  }

  /** Symbol at `pos` is a member of `syms` — the SymbolInSet physical op.
    * The reference's four compile cases (symbol_in_set.cpp:129-264)
    * collapse to a union of three clauses:
    *  - diff stored at pos with symbol ∈ syms (IndexScan);
    *  - syms ∋ reference symbol → covered ∧ no diff (complement case);
    *  - syms ∋ missing symbol (N/X) → NOT covered at pos, i.e. outside
    *    the covered range or an interior-missing position
    *    (compileWithMissingSymbol) — null sequences excluded
    *    (excludeNullSequences).
    */
  def symbolInSet(pos: Int, syms: Set[String], ref: String,
      prefix: String = "", missingSym: String = "N",
      localRef: String = ""): Column = {
    // storage may be re-based onto an adapted local reference
    // (SequenceModel.adaptLocalReference): the symbol a row carries with
    // NO stored diff is the LOCAL reference symbol, and back-mutations to
    // the global reference are ordinary stored diffs
    val lr = if (localRef.isEmpty) ref else localRef
    val impliedSym = lr.charAt(pos - 1).toString
    val diffMatch = mutAtIn(pos, syms - impliedSym - missingSym, prefix)
    val refMatch =
      if (syms.contains(impliedSym) && impliedSym != missingSym)
        Some(covered(pos, prefix) && !mutAt(pos, prefix))
      else None
    val missingMatch =
      if (syms.contains(missingSym))
        Some(col(s"${prefix}cov_start").isNotNull &&
          (lit(pos) < col(s"${prefix}cov_start") ||
            lit(pos) > col(s"${prefix}cov_end") ||
            array_contains(col(s"${prefix}missing"), pos)))
      else None
    coalesce((Seq(diffMatch) ++ refMatch ++ missingMatch).reduce(_ || _),
      lit(false))
  }

  /** maybe/exact ambiguity: expand the target symbol to its matching
    * stored-symbol set at plan time (see [[Ambiguity]]), then SymbolInSet.
    */
  def symbolEqualsMode(
      pos: Int, sym: Char, ref: String,
      codesFor: Map[Char, Set[Char]], mode: Mode, prefix: String = "",
      missingSym: String = "N", localRef: String = ""): Column =
    symbolInSet(pos, Ambiguity.matchingSymbols(codesFor, sym, mode).map(_.toString),
      ref, prefix, missingSym, localRef)

  /** `hasMutation(position)`: symbol at pos ∉ {GLOBAL reference symbol,
    * missing} (reference: has_mutation.cpp:34-67 rewrite to SymbolInSet of
    * everything-but-ref). With adapted local storage a row matches when it
    * stores a diff that is not the global symbol, or stores no diff at a
    * covered position whose local reference differs from the global one.
    */
  def hasMutation(pos: Int, prefix: String = "", ref: String = "",
      localRef: String = ""): Column = {
    val lr = if (localRef.isEmpty) ref else localRef
    val base =
      if (ref.isEmpty || lr == ref)
        // unadapted storage: any stored diff IS a mutation
        mutAt(pos, prefix)
      else {
        val globalSym = ref.charAt(pos - 1).toString
        val diffNotGlobal = exists(col(s"${prefix}muts"), m =>
          m.getField("pos") === pos && m.getField("sym") =!= globalSym)
        if (lr.charAt(pos - 1).toString == globalSym) diffNotGlobal
        else diffNotGlobal || (covered(pos, prefix) && !mutAt(pos, prefix))
      }
    coalesce(base, lit(false))
  }

  /** Literal runs of an insertion search pattern: split on `.*`, with a
    * backslash escaping the next character to a LITERAL symbol — the
    * reference's stringToSymbolVector/splitBy parse
    * (insertion_index.cpp:24-41,48), where `\X` maps to symbol X (the
    * documented use is `\*` for the stop codon) and never to a regex
    * class. Shared by the 3-mer extraction (Planner.insertionKmers) and
    * the verification regex below so the candidate filter and the
    * verifier agree on every pattern by construction.
    */
  def insertionRuns(pattern: String): Seq[String] = {
    val runs = scala.collection.mutable.ArrayBuffer[String]()
    val cur = new StringBuilder
    var i = 0
    while (i < pattern.length) {
      if (pattern(i) == '\\' && i + 1 < pattern.length) {
        cur += pattern(i + 1); i += 2
      } else if (pattern(i) == '.' && i + 1 < pattern.length &&
          pattern(i + 1) == '*') {
        runs += cur.result(); cur.clear(); i += 2
      } else { cur += pattern(i); i += 1 }
    }
    runs += cur.result()
    runs.toSeq
  }

  /** Insertion search is a FULL match, not a substring search: the
    * reference evaluates every candidate insertion value with
    * `RE2::FullMatch` (insertion_index.cpp:121,134,148), so
    * `value := 'CCC'` matches only an insertion that IS `CCC` and users
    * write `.*CCC.*` for contains semantics. Spark's `rlike` is Java
    * `find()` (unanchored), so the pattern is rebuilt here from its
    * parsed literal runs — each `Pattern.quote`d, joined by `.*`, wrapped
    * in `\A(?:…)\z`. Rebuilding (rather than passing the raw pattern to
    * Java regex) keeps `\X` a literal in the VERIFIER exactly as it is in
    * the 3-mer candidate extraction; feeding the raw pattern to a regex
    * engine would reinterpret e.g. `\A` as an anchor and silently drop
    * rows the index route admits. The ONE translation the row-wise
    * predicate and both routed scans (Planner.InsRoute/InsKmerRoute)
    * share.
    */
  def anchoredInsertionRegex(pattern: String): String =
    "\\A" + insertionRuns(pattern)
      .map(r => if (r.isEmpty) "" else java.util.regex.Pattern.quote(r))
      .mkString(".*") + "\\z"

  /** `insertionContains(position, regexValue)` over an
    * `ins: array<struct<pos,ins>>` column (reference:
    * insertion_contains.cpp; the 3-mer index acceleration becomes an
    * ins_index semi-join at scale). Full-match semantics via
    * [[anchoredInsertionRegex]].
    */
  def insertionContains(pos: Int, pattern: String, insCol: String = "ins"): Column =
    coalesce(exists(col(insCol), i =>
      i.getField("pos") === pos &&
        i.getField("ins").rlike(anchoredInsertionRegex(pattern))), lit(false))

  /** `mutationProfile(distance, profile)` — conservative ambiguity-aware
    * difference count from a profile string, computed from the DIFF
    * representation in O(|D| + |diffs|) per row (reference:
    * mutation_profile.cpp:198-258 rewrite).
    *
    * Reference semantics: for every position where the profile is not the
    * missing symbol, a row counts one difference iff its stored symbol is
    * NOT ambiguity-compatible with the profile symbol — i.e. stored ∉
    * AMBIGUITY_SYMBOLS[profile[pos]]. Missing/uncovered positions are
    * never differences (N/X is compatible with everything), and null
    * sequences have zero differences (every per-position SymbolInSet is
    * false after excludeNullSequences).
    *
    * Decomposition over the diff representation, with
    * D = { p : profile[p] ≠ missing ∧ ref[p] ∉ compat(profile[p]) }:
    *   refDiff = #(p ∈ D covered with no stored diff)
    *           = #(p ∈ D within [cov_start,cov_end]) − #(missing ∩ D)
    *             − #(diffs at D)
    *   mutDiff = #(diffs m with profile[m.pos] ≠ missing ∧
    *               m.sym ∉ compat(profile[m.pos]))
    *   distance = refDiff + mutDiff
    *
    * `codesFor` empty ⇒ no ambiguity system: compat(s) = {s, missing}
    * (plain mismatch counting, still skipping missing).
    */
  def profileDistance(profile: String, ref: String,
      codesFor: Map[Char, Set[Char]] = Map(), missingSym: Char = 'N',
      prefix: String = "", localRef: String = ""): Column = {
    require(profile.length == ref.length, "profile must span the reference")
    def compat(s: Char): Set[Char] =
      if (codesFor.nonEmpty) Ambiguity.ambiguitySymbols(codesFor, s)
      else Set(s, missingSym)

    // D is the set of positions where the IMPLIED (no-stored-diff) symbol
    // is incompatible with the profile — with adapted storage that implied
    // symbol is the local reference's (SequenceModel.adaptLocalReference)
    val lr = if (localRef.isEmpty) ref else localRef
    val dPositions = (1 to profile.length).filter { p =>
      val ps = profile(p - 1)
      ps != missingSym && !compat(ps).contains(lr(p - 1))
    }
    // D as a position-mask string + prefix-count array, each ONE literal
    // node: membership is substr(mask,p,1)='1' (O(1) per element) and
    // #(D ∩ [s,e]) is two element_at lookups — plan size and per-row cost
    // stay O(1)+O(|muts|+|missing|) even when D covers a 30k genome (a
    // per-position literal array made both O(genome))
    val dSet = dPositions.toSet
    val dMask = (1 to profile.length).map(p => if (dSet(p)) '1' else '0').mkString
    val dCum = (0 to profile.length)
      .scanLeft(0)((acc, p) => acc + (if (p > 0 && dSet(p)) 1 else 0)).tail.toArray
    def dIn(p: Column): Column = lit(dMask).substr(p, lit(1)) === "1"
    // dCum is 0-indexed by position: element_at(lit(dCum), pos+1) = #D ≤ pos
    def dCountUpTo(p: Column): Column =
      element_at(lit(dCum), (greatest(least(p, lit(profile.length)), lit(0)) + 1)
        .cast("int"))

    val refDiff =
      if (dPositions.isEmpty) lit(0)
      else
        (dCountUpTo(col(s"${prefix}cov_end")) -
          dCountUpTo(col(s"${prefix}cov_start") - 1)) -
          size(filter(col(s"${prefix}missing"), p => dIn(p))) -
          size(filter(col(s"${prefix}muts"), m => dIn(m.getField("pos"))))

    // per-diff compatibility: CASE over the (≤ alphabet-size) distinct
    // profile symbols; the profile itself is a single string literal so
    // the plan stays O(alphabet), not O(genome)
    val distinctProfileSyms = profile.toSet.filter(_ != missingSym)
    def compatOf(pc: Column): Column =
      distinctProfileSyms.toSeq.sorted.foldLeft(lit("")) { (acc, c) =>
        when(pc === c.toString, lit(compat(c).toSeq.sorted.mkString))
          .otherwise(acc)
      }
    val mutDiff = size(filter(col(s"${prefix}muts"), m => {
      val pc = lit(profile).substr(m.getField("pos"), lit(1))
      pc =!= missingSym.toString && !compatOf(pc).contains(m.getField("sym"))
    }))

    coalesce(refDiff + mutDiff, lit(0))
  }
}
