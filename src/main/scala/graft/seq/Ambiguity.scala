package graft.seq

/** IUPAC ambiguity system for nucleotide and amino-acid symbols.
  *
  * Mirrors the reference's maybe/exact semantics
  * (reference: documentation/maybe_documentation.md:1-40,
  * src/silo/query_engine/scalar_expressions/{maybe,exact}.cpp):
  * `CODES_FOR[S]` is the set of concrete symbols S codes for; under
  * `maybe`, a stored symbol Y matches target S iff CODES_FOR[S] ∩
  * CODES_FOR[Y] ≠ ∅; under `exact`, iff CODES_FOR[Y] ⊆ CODES_FOR[S].
  * Expansion happens entirely at PLAN time — predicates become plain
  * symbol-set membership, no runtime machinery (reference rewrites
  * symbol_equals to SymbolInSet the same way, symbol_equals.cpp:96-100).
  */
object Ambiguity {

  sealed trait Mode
  case object ModeNone extends Mode
  case object ModeMaybe extends Mode  // UPPER_BOUND in the reference
  case object ModeExact extends Mode  // LOWER_BOUND in the reference

  /** Nucleotide CODES_FOR (IUPAC). '-' is a concrete deletion symbol. */
  val nucCodesFor: Map[Char, Set[Char]] = Map(
    '-' -> Set('-'),
    'A' -> Set('A'), 'C' -> Set('C'), 'G' -> Set('G'), 'T' -> Set('T'),
    'R' -> Set('A', 'G'), 'Y' -> Set('C', 'T'), 'S' -> Set('G', 'C'),
    'W' -> Set('A', 'T'), 'K' -> Set('G', 'T'), 'M' -> Set('A', 'C'),
    'B' -> Set('C', 'G', 'T'), 'D' -> Set('A', 'G', 'T'),
    'H' -> Set('A', 'C', 'T'), 'V' -> Set('A', 'C', 'G'),
    'N' -> Set('A', 'C', 'G', 'T'))

  /** Amino-acid CODES_FOR (IUPAC). '*' is stop, '-' deletion. */
  val aaCodesFor: Map[Char, Set[Char]] = {
    val concrete = "ACDEFGHIKLMNPQRSTVWY*-".toSet
    concrete.map(c => c -> Set(c)).toMap ++ Map(
      'B' -> Set('D', 'N'), 'Z' -> Set('E', 'Q'), 'J' -> Set('L', 'I'),
      'X' -> "ACDEFGHIKLMNPQRSTVWY".toSet)
  }

  /** The stored symbols that match target `s` under the given mode. */
  def matchingSymbols(codesFor: Map[Char, Set[Char]], s: Char, mode: Mode): Set[Char] = {
    val target = codesFor.getOrElse(s, Set(s))
    mode match {
      case ModeNone  => Set(s)
      case ModeMaybe => codesFor.collect {
        case (y, c) if (c & target).nonEmpty => y
      }.toSet
      case ModeExact => codesFor.collect {
        case (y, c) if c.subsetOf(target) => y
      }.toSet
    }
  }

  /** Negation flips the ambiguity bound (reference:
    * scalar_expression.h:92 `invertMode`): NOT(maybe(x)) ≙ exact-complement.
    */
  def invert(mode: Mode): Mode = mode match {
    case ModeMaybe => ModeExact
    case ModeExact => ModeMaybe
    case ModeNone  => ModeNone
  }
}
