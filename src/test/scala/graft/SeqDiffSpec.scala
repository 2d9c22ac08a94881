package graft

import org.apache.spark.sql.functions._
import graft.seq.SequenceModel

/** Equivalence property suite for the SeqDiff codegen kernel vs the
  * higher-order-function chain it replaced (SequenceModel.diffLegacy):
  * identical schema and identical rows on adversarial UTF-8 input —
  * multi-byte code points, combining marks, astral-plane symbols, empty
  * and null sequences — plus corpus-like text, under both codegen and
  * interpreted evaluation.
  */
class SeqDiffSpec extends SparkSpec {

  private val REF = "sartearaeeaaaeaoaeaaerarrerrreeeeaaeaeraraeartaraerraaaererr"
  // a reference that itself contains multi-byte and astral code points
  private val REF_UNI = "aéb𝄞c你N-xyz"

  private def corpus: Seq[String] = Seq(
    "", // split("","") == [""] -> one empty symbol at position 1
    "a",
    "sartear",
    "exact match of the reference prefix sartearaeeaaaeao",
    "héllo wörld", // 2-byte code points
    "éx", // combining mark: separate code point, separate piece
    "a𝄞b𝄞", // astral (4-byte) symbols
    "你好世界", // CJK
    "NNNNN", // missing symbols only
    "aNaéN𝄞N", // missing interleaved with multi-byte
    REF, // zero diffs against REF
    REF_UNI,
    "x" * 200, // longer than both references
    "é" * 61 // multi-byte, one past the 60-char probe window
  )

  private def frames(ref: String, missing: Set[String]) = {
    import spark.implicits._
    val base = (corpus.map(Option(_)) :+ (None: Option[String]))
      .zipWithIndex.toDF("seq", "id")
    val kernel = SequenceModel.diff(base, "seq", ref, missing)
    val legacy = SequenceModel.diffLegacy(base, "seq", ref,
      missing, lit(0), "")
    (kernel, legacy)
  }

  private def assertSame(ref: String, missing: Set[String]): Unit = {
    val (kernel, legacy) = frames(ref, missing)
    assert(kernel.schema === legacy.schema,
      s"schema drift for ref=$ref missing=$missing")
    val k = kernel.orderBy("id").collect().toSeq
    val l = legacy.orderBy("id").collect().toSeq
    assert(k === l, s"row drift for ref=$ref missing=$missing")
  }

  test("kernel path is ACTUALLY selected for the literal-zero offset") {
    // guards the dispatch itself: a silently-failing gate would make every
    // equivalence test below pass trivially (legacy == legacy)
    val (kernel, legacy) = frames(REF, Set("N"))
    assert(kernel.queryExecution.analyzed.toString.contains("seqdiff"),
      "diff() did not route through the SeqDiff kernel")
    assert(!legacy.queryExecution.analyzed.toString.contains("seqdiff"))
  }

  test("kernel == HOF chain: ascii reference, no missing symbols") {
    assertSame(REF, Set())
  }

  test("kernel == HOF chain: ascii reference, missing symbol N") {
    assertSame(REF, Set("N"))
  }

  test("kernel == HOF chain: multi-byte reference, two missing symbols") {
    assertSame(REF_UNI, Set("N", "é"))
  }

  test("kernel == HOF chain under interpreted (non-codegen) eval") {
    val (kernel, legacy) = frames(REF, Set("N"))
    val conf = spark.conf
    val oldWs = conf.get("spark.sql.codegen.wholeStage", "true")
    val oldFm = conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
    try {
      conf.set("spark.sql.codegen.wholeStage", "false")
      conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      assert(kernel.orderBy("id").collect().toSeq ===
        legacy.orderBy("id").collect().toSeq)
    } finally {
      conf.set("spark.sql.codegen.wholeStage", oldWs)
      conf.set("spark.sql.codegen.factoryMode", oldFm)
    }
  }

  test("kernel == HOF chain on seeded random unicode strings") {
    import spark.implicits._
    val alphabet: IndexedSeq[String] = ("abcde" + "NRY-").map(_.toString) ++
      Seq("é", "́", "𝄞", "你", " ", "q")
    val rnd = new scala.util.Random(42)
    val rows = (1 to 300).map { i =>
      val n = rnd.nextInt(80)
      (Seq.fill(n)(alphabet(rnd.nextInt(alphabet.size))).mkString, i)
    }
    val base = rows.toDF("seq", "id")
    val kernel = SequenceModel.diff(base, "seq", REF, Set("N"))
    val legacy = SequenceModel.diffLegacy(base, "seq", REF, Set("N"),
      lit(0), "")
    assert(kernel.schema === legacy.schema)
    assert(kernel.orderBy("id").collect().toSeq ===
      legacy.orderBy("id").collect().toSeq)
  }

  test("non-zero / non-literal offset falls back to the legacy chain") {
    import spark.implicits._
    val base = Seq(("abc", 7), ("sNa", 0)).toDF("seq", "off")
    val viaCol = SequenceModel.diff(base, "seq", REF, Set("N"),
      offset = col("off"))
    val viaLegacy = SequenceModel.diffLegacy(base, "seq", REF, Set("N"),
      col("off"), "")
    assert(viaCol.schema === viaLegacy.schema)
    assert(viaCol.orderBy("off").collect().toSeq ===
      viaLegacy.orderBy("off").collect().toSeq)
  }
}
