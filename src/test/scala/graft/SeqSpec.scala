package graft

import org.apache.spark.sql.functions._
import graft.seq._
import graft.seq.Ambiguity._

class SeqSpec extends SparkSpec {
  import spark.implicits._

  val ref = "ACGTACGT"

  def diffed(seqs: (Long, String)*) =
    SequenceModel.diff(seqs.toSeq.toDF("id", "seq"), "seq", ref,
      missingSyms = Set("N"))

  test("diff stores only mismatches; missing tracked separately") {
    val df = diffed(1L -> "ACGTACGT", 2L -> "ACCTNCGT", 3L -> "ACG")
    val rows = df.select($"id", $"cov_start", $"cov_end",
      transform($"muts", m => concat(m.getField("pos"), m.getField("sym"))),
      $"missing").collect().sortBy(_.getLong(0))
    assert(rows(0).getSeq[String](3).isEmpty)           // exact ref match
    assert(rows(1).getSeq[String](3) === Seq("3C"))     // one diff
    assert(rows(1).getSeq[Int](4) === Seq(5))           // N at 5
    assert(rows(2).getInt(2) === 3)                     // short read cov_end
  }

  test("reconstruct round-trips the original sequence") {
    val df = diffed(1L -> "ACCTNCGT", 2L -> "ACG")
    val out = df.select($"id", SequenceModel.reconstruct(ref).as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) === "ACCTNCGT")
    assert(out(2L) === "ACG")
  }

  test("reconstructFull pads uncovered positions with the missing symbol") {
    val df = diffed(1L -> "ACCTNCGT", 2L -> "ACG")
    val out = df.select($"id", SequenceModel.reconstructFull(ref).as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) === "ACCTNCGT")
    assert(out(2L) === "ACGNNNNN") // short read: N outside coverage
  }

  test("symbolAt reads diff/ref/missing/uncovered/past-end/null correctly") {
    val df = SequenceModel.diff(
      Seq((1L, Some("ACCTNCGT")), (2L, Some("ACG")), (3L, None))
        .toDF("id", "seq"), "seq", ref, missingSyms = Set("N"))
    def at(p: Int) = df.select($"id", SequenceModel.symbolAt(ref, p, "N").as("s"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(at(3) === Map(1L -> Some("C"), 2L -> Some("G"), 3L -> None)) // diff / ref
    assert(at(5) === Map(1L -> Some("N"), 2L -> Some("N"), 3L -> None)) // missing / uncovered
    assert(at(9) === Map(1L -> Some(""), 2L -> Some(""), 3L -> None))   // past genome end
  }

  test("mutations: counts, coverage subtraction, proportions") {
    // pos3: row2 has C (diff); coverage at pos3 = 3 rows cover, row4 short
    val df = diffed(1L -> "ACGTACGT", 2L -> "ACCTNCGT", 3L -> "ACGAACGT", 4L -> "AC")
    val out = Mutations.mutations(df, ref, 0.0)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4))).toSet
    // pos 3 G->C by row2, coverage 3 (rows 1,2,3)
    assert(out.contains((3, "G", "C", 1L, 3L)))
    // pos 4 T->A by row3, coverage 3
    assert(out.contains((4, "T", "A", 1L, 3L)))
    // pos 5 coverage excludes row2's N: covered = rows 1,3 = 2 → no diffs ⇒ absent
    assert(!out.exists(m => m._1 == 5))
  }

  test("mutations minProportion filter uses proportion over coverage") {
    val df = diffed(1L -> "ACGTACGT", 2L -> "ACCTACGT", 3L -> "ACGTACGT")
    val out = Mutations.mutations(df, ref, 0.5)
    assert(out.count() === 0)   // 1/3 < 0.5
    val out2 = Mutations.mutations(df, ref, 0.3)
    assert(out2.count() === 1)
  }

  test("symbolEquals: ref-match is complement of diffs within coverage") {
    val df = diffed(1L -> "ACGTACGT", 2L -> "TCGTACGT", 3L -> "NC", 4L -> "AC")
    def ids(c: org.apache.spark.sql.Column) =
      df.filter(c).select("id").as[Long].collect().toSet
    assert(ids(SeqPredicates.symbolEquals(1, "A", ref)) === Set(1L, 4L))
    assert(ids(SeqPredicates.symbolEquals(1, "T", ref)) === Set(2L))
    assert(ids(SeqPredicates.symbolEquals(1, ".", ref)) === Set(1L, 4L))
    assert(ids(SeqPredicates.hasMutation(1)) === Set(2L))
    // row3 has N at 1: neither ref-equal nor hasMutation
    assert(!ids(SeqPredicates.symbolEquals(1, "A", ref)).contains(3L))
  }

  test("maybe/exact ambiguity expansion") {
    // stored symbols: row1 R (=A/G), row2 A, row3 C
    val df = diffed(1L -> "RCGTACGT", 2L -> "ACGTACGT", 3L -> "CCGTACGT")
    def ids(c: org.apache.spark.sql.Column) =
      df.filter(c).select("id").as[Long].collect().toSet
    // maybe(equals A) = AMBIGUITY_SYMBOLS[A] = {A,R,W,M,D,H,V,N} → R and A
    assert(ids(SeqPredicates.symbolEqualsMode(1, 'A', ref, nucCodesFor, ModeMaybe))
      === Set(1L, 2L))
    // exact(equals A): the single symbol A (symbol_equals.cpp:90-92)
    assert(ids(SeqPredicates.symbolEqualsMode(1, 'A', ref, nucCodesFor, ModeExact))
      === Set(2L))
    // maybe(equals R) = AMBIGUITY_SYMBOLS[R] = {R,D,V,N}: symbols at least
    // as general as R — NOT the concretes A/G → only the stored R
    assert(ids(SeqPredicates.symbolEqualsMode(1, 'R', ref, nucCodesFor, ModeMaybe))
      === Set(1L))
    // exact(equals R): the single symbol R
    assert(ids(SeqPredicates.symbolEqualsMode(1, 'R', ref, nucCodesFor, ModeExact))
      === Set(1L))
  }

  test("profileDistance from diff representation matches naive count") {
    val profile = "ACGAACGA" // differs from ref at pos 4 (T->A) and 8 (T->A)
    val seqs = Seq(1L -> "ACGTACGT", 2L -> "ACGAACGA", 3L -> "TTTT", 4L -> "ACGN")
    val df = diffed(seqs: _*)
    val out = df.select($"id",
      SeqPredicates.profileDistance(profile, ref, missingSym = 'N').as("d"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    def naive(s: String) = s.zipWithIndex.count { case (c, i) =>
      c != 'N' && c != profile(i)
    }
    seqs.foreach { case (id, s) =>
      assert(out(id) === naive(s), s"id=$id seq=$s")
    }
  }

  test("local-reference adaptation: majority re-base, invariant results") {
    // pos 3: G in ref but 4/5 rows carry C → adapts to C; pos 4: 3/5 carry
    // A → adapts to A; other positions keep the global symbol
    val seqs = Seq(
      1L -> "ACCAACGT", 2L -> "ACCAACGT", 3L -> "ACCANCGT",
      4L -> "ACCTACGT", 5L -> "ACGTACGT")
    val raw = diffed(seqs: _*)
    val (adapted, localRef) =
      SequenceModel.adaptLocalReference(raw, ref, candidateSyms = Set('A', 'C', 'G', 'T'))
    assert(localRef === "ACCAACGT")

    // storage shrinks: diffs now stored only for the minority rows
    def totalDiffs(df: org.apache.spark.sql.DataFrame) =
      df.select(sum(size($"muts"))).head().getLong(0)
    assert(totalDiffs(raw) === 7)     // rows 1,2,3 carry 2 each; row 4 one
    assert(totalDiffs(adapted) === 3) // row 4: {4T}; row 5: {3G,4T}

    // row-level: row 5 (= global ref) now stores explicit back-diffs at
    // the adapted positions; rows 1/2 (= local ref) store nothing
    val perRow = adapted.select($"id",
      transform($"muts", m => concat(m.getField("pos"), m.getField("sym"))))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(perRow(1L).isEmpty && perRow(2L).isEmpty)
    assert(perRow(5L) === Seq("3G", "4T"))
    assert(perRow(4L) === Seq("4T"))
    assert(perRow(3L).isEmpty)                // N at 5 stays in missing

    // mutations() translates back to the GLOBAL reference: identical
    // output from raw and adapted storage
    val fromRaw = Mutations.mutations(raw, ref, 0.0)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4))).toSet
    val fromAdapted = Mutations.mutations(adapted, ref, 0.0, localRef = localRef)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(fromAdapted === fromRaw)
    assert(fromRaw.contains((3, "G", "C", 4L, 5L)))

    // predicates translate too: equals / '.' / hasMutation / profile
    def ids(df: org.apache.spark.sql.DataFrame, c: org.apache.spark.sql.Column) =
      df.filter(c).select("id").as[Long].collect().toSet
    assert(ids(adapted, SeqPredicates.symbolEquals(3, "C", ref, localRef = localRef))
      === ids(raw, SeqPredicates.symbolEquals(3, "C", ref)))
    assert(ids(adapted, SeqPredicates.symbolEquals(3, ".", ref, localRef = localRef))
      === Set(5L))
    assert(ids(adapted, SeqPredicates.hasMutation(3, "", ref, localRef))
      === ids(raw, SeqPredicates.hasMutation(3, "", ref)))
    assert(ids(adapted, SeqPredicates.hasMutation(4, "", ref, localRef))
      === Set(1L, 2L, 3L))
    val profile = "ACCAACGT"
    assert(
      adapted.select($"id", SeqPredicates.profileDistance(profile, ref,
        missingSym = 'N', localRef = localRef).as("d"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      === raw.select($"id", SeqPredicates.profileDistance(profile, ref,
        missingSym = 'N').as("d"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap)

    // reconstruction uses the local reference for fill-in
    val rec = adapted.select($"id",
      SequenceModel.reconstruct(localRef).as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    seqs.foreach { case (id, s) => assert(rec(id) === s, s"id=$id") }

    // a dataset where no symbol beats the residual returns untouched
    val (same, lr2) = SequenceModel.adaptLocalReference(
      diffed(1L -> "ACGTACGT", 2L -> "ACCTACGT"), ref)
    assert(lr2 === ref)
    assert(totalDiffs(same) === 1)
  }

  test("insertionContains and insertions() aggregation") {
    val base = Seq(
      (1L, Seq((3, "ACT")), "x"),
      (2L, Seq((3, "ACT"), (5, "GG")), "x"),
      (3L, Seq.empty[(Int, String)], "x"))
      .toDF("id", "raw", "pad")
    val df = base.withColumn("ins",
      transform($"raw", r => struct(r.getField("_1").as("pos"), r.getField("_2").as("ins"))))
    val hit = df.filter(SeqPredicates.insertionContains(3, "AC.*"))
      .select("id").as[Long].collect().toSet
    assert(hit === Set(1L, 2L))
    // FULL-match semantics (RE2::FullMatch): a substring of the insertion
    // is NOT a match — users write .*CT.* for contains
    assert(df.filter(SeqPredicates.insertionContains(3, "CT"))
      .select("id").as[Long].collect().isEmpty)
    assert(df.filter(SeqPredicates.insertionContains(3, "ACT"))
      .select("id").as[Long].collect().toSet === Set(1L, 2L))
    assert(df.filter(SeqPredicates.insertionContains(3, ".*CT.*"))
      .select("id").as[Long].collect().toSet === Set(1L, 2L))
    val agg = Mutations.insertions(df)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSet
    assert(agg === Set((3, "ACT", 2L), (5, "GG", 1L)))
  }
}
