package graft.seq

/** IUPAC ambiguity system for nucleotide and amino-acid symbols.
  *
  * Mirrors the reference exactly (reference:
  * src/silo/common/nucleotide_symbols.cpp CODES_FOR /
  * deriveAmbiguitySymbols, aa_symbols.cpp, maybe_documentation.md):
  *
  *  - `CODES_FOR[S]` is the primary definition — the symbols S codes for.
  *    Concrete symbols code for themselves; N (nuc) / X (aa) code for ALL
  *    symbols of their alphabet (including GAP and the ambiguity codes).
  *  - `AMBIGUITY_SYMBOLS[S] = {Y : CODES_FOR[S] ⊆ CODES_FOR[Y]}` — all
  *    symbols at least as general as S.
  *  - `maybe` (UPPER_BOUND) rewrites symbolEquals(S) to
  *    SymbolInSet(AMBIGUITY_SYMBOLS[S]); `exact` (LOWER_BOUND) and the
  *    default mode match the single symbol S
  *    (symbol_equals.cpp:84-93). Negation flips the bound
  *    (scalar_expression.cpp:7-14 invertMode).
  *
  * Expansion happens entirely at PLAN time — predicates become plain
  * symbol-set membership, no runtime machinery.
  */
object Ambiguity {

  sealed trait Mode
  case object ModeNone extends Mode
  case object ModeMaybe extends Mode  // UPPER_BOUND in the reference
  case object ModeExact extends Mode  // LOWER_BOUND in the reference

  /** Nucleotide alphabet in the reference's enum order
    * (nucleotide_symbols.h:22-39). '-' is GAP; 'N' is SYMBOL_MISSING.
    */
  val nucSymbols: Seq[Char] = "-ACGTRYSWKMBDHVN".toSeq
  val nucMissing: Char = 'N'

  /** Nucleotide symbols storable as mutations — ambiguity codes are
    * excluded from mutations() coverage and output
    * (nucleotide_symbols.h VALID_MUTATION_SYMBOLS).
    */
  val nucValidMutation: Set[Char] = Set('-', 'A', 'C', 'G', 'T')

  /** Nucleotide CODES_FOR (nucleotide_symbols.cpp:11-44). N codes for
    * EVERY symbol, including GAP and the other ambiguity codes.
    */
  val nucCodesFor: Map[Char, Set[Char]] = Map(
    '-' -> Set('-'),
    'A' -> Set('A'), 'C' -> Set('C'), 'G' -> Set('G'), 'T' -> Set('T'),
    'R' -> Set('A', 'G'), 'Y' -> Set('C', 'T'), 'S' -> Set('G', 'C'),
    'W' -> Set('A', 'T'), 'K' -> Set('G', 'T'), 'M' -> Set('A', 'C'),
    'B' -> Set('C', 'G', 'T'), 'D' -> Set('A', 'G', 'T'),
    'H' -> Set('A', 'C', 'T'), 'V' -> Set('A', 'C', 'G'),
    'N' -> nucSymbols.toSet)

  /** Amino-acid alphabet (aa_symbols.h, 28 symbols incl. O/U, '*' stop,
    * '-' gap); 'X' is SYMBOL_MISSING.
    */
  val aaSymbols: Seq[Char] = "-ACDEFGHIKLMNOPQRSTUVWYBJZ*X".toSeq
  val aaMissing: Char = 'X'

  /** AA symbols storable as mutations (aa_symbols.h:71-103: everything
    * except B, J, Z, X).
    */
  val aaValidMutation: Set[Char] = "-ACDEFGHIKLMNOPQRSTUVWY*".toSet

  /** Amino-acid CODES_FOR (aa_symbols.cpp:14-48). X codes for EVERY symbol. */
  val aaCodesFor: Map[Char, Set[Char]] = {
    val concrete = "-ACDEFGHIKLMNOPQRSTUVWY*".toSet
    concrete.map(c => c -> Set(c)).toMap ++ Map(
      'B' -> Set('D', 'N'), 'J' -> Set('L', 'I'), 'Z' -> Set('Q', 'E'),
      'X' -> aaSymbols.toSet)
  }

  /** AMBIGUITY_SYMBOLS[s] = {y : CODES_FOR[s] ⊆ CODES_FOR[y]} — derived
    * exactly as the reference's deriveAmbiguitySymbols
    * (nucleotide_symbols.cpp:46-66). N/X is always a member (its code set
    * is the full alphabet).
    */
  def ambiguitySymbols(codesFor: Map[Char, Set[Char]], s: Char): Set[Char] = {
    val target = codesFor.getOrElse(s, Set(s))
    codesFor.collect { case (y, c) if target.subsetOf(c) => y }.toSet
  }

  /** The stored symbols that match target `s` under the given mode
    * (symbol_equals.cpp:84-93: UPPER_BOUND → AMBIGUITY_SYMBOLS[s]; both
    * LOWER_BOUND and NONE → the single symbol).
    */
  def matchingSymbols(codesFor: Map[Char, Set[Char]], s: Char, mode: Mode): Set[Char] =
    mode match {
      case ModeMaybe => ambiguitySymbols(codesFor, s)
      case _         => Set(s)
    }

  /** Negation flips the ambiguity bound (reference:
    * scalar_expression.cpp:7-14 `invertMode`).
    */
  def invert(mode: Mode): Mode = mode match {
    case ModeMaybe => ModeExact
    case ModeExact => ModeMaybe
    case ModeNone  => ModeNone
  }
}
