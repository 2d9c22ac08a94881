package graft

import graft.core.Database
import graft.lang.Planner

/** Value-level golden fixtures on the reference's unitTestDummyDataset —
  * expectations hand-computed independently from the raw NDJSON (see
  * mainRef=ACGTACGT; key2 carries A at pos 2/6, N at pos 4/8), pinning the
  * reference query surface to exact results, not just executability.
  */
class GoldenValuesSpec extends SparkSpec {

  val dir = "/root/reference/testBaseData/unitTestDummyDataset"
  lazy val catalog = Database.build(spark, dir, s"$dir/input.ndjson")
  def run(q: String) = Planner.plan(q, catalog)

  test("filter+count by metadata") {
    assert(run("default.filter(age > 5).groupBy({count := count()})")
      .head().getLong(0) === 2) // key3 (6), key5 (54)
    assert(run("default.filter(qc_value >= 0.96).groupBy({count := count()})")
      .head().getLong(0) === 3)
    assert(run("""default.filter(between(date, '2021-04-01'::date, '2021-04-30'::date))
        .groupBy({count := count()})""").head().getLong(0) === 3)
  }

  test("nucleotideEquals: diff, ref-match, missing, maybe/exact") {
    def cnt(q: String) = run(q).head().getLong(0)
    // pos 2 ref C: key2 has A; N never matches plainly
    assert(cnt("default.filter(nucleotideEquals(position := 2, symbol := 'A', sequenceName := 'main')).groupBy({c := count()})") === 1)
    assert(cnt("default.filter(nucleotideEquals(position := 2, symbol := 'C', sequenceName := 'main')).groupBy({c := count()})") === 4)
    // pos 4 ref T: key2 has N — missing ⇒ neither T nor hasMutation
    assert(cnt("default.filter(nucleotideEquals(position := 4, symbol := 'T', sequenceName := 'main')).groupBy({c := count()})") === 4)
    assert(cnt("default.filter(hasMutation(position := 4, sequenceName := 'main')).groupBy({c := count()})") === 0)
    // maybe at pos 4: N ∈ AMBIGUITY_SYMBOLS[T] and symbolInSet now matches
    // missing positions when the set contains N ⇒ key2 matches too (5 rows)
    assert(cnt("default.filter(maybe(nucleotideEquals(position := 4, symbol := 'T', sequenceName := 'main'))).groupBy({c := count()})") === 5)
    // plain equals N = "is missing at pos 4" — exactly key2
    assert(cnt("default.filter(nucleotideEquals(position := 4, symbol := 'N', sequenceName := 'main')).groupBy({c := count()})") === 1)
    // '.' matches the reference symbol
    assert(cnt("default.filter(nucleotideEquals(position := 6, symbol := '.', sequenceName := 'main')).groupBy({c := count()})") === 4)
  }

  test("mutationProfile: ambiguity-compatible distances on the dummy dataset") {
    def cnt(q: String) = run(q).head().getLong(0)
    def profile(d: Int, in: String) =
      cnt(s"default.filter(nucleotideMutationProfile(distance := $d, sequenceName := 'main', $in)).groupBy({c := count()})")
    // key2 = AAGNAAGN: diffs at 2/6 (C→A), missing at 4/8; others = ref
    assert(profile(0, "querySequence := 'ACGTACGT'") === 4)
    assert(profile(2, "querySequence := 'ACGTACGT'") === 5)
    // profile pos 4 = A: stored T is a difference for key1/3/4/5 (dist 1),
    // but key2's MISSING pos 4 is compatible (dist stays 2) — the exact-char
    // counting this replaces would have said dist 3 for key2
    assert(profile(1, "querySequence := 'ACGAACGT'") === 4)
    assert(profile(2, "querySequence := 'ACGAACGT'") === 5)
    // sequenceId: key2's reconstructed profile is AAGNAAGN (N at 4/8
    // skipped) ⇒ others differ at 2 and 6 only
    assert(profile(0, "sequenceId := 'key2'") === 1)
    assert(profile(2, "sequenceId := 'key2'") === 5)
    // mutations: ref + {2→A, 6→A} = key2's concrete diffs
    assert(profile(0,
      "mutations := {{position := 2, symbol := 'A'}, {position := 6, symbol := 'A'}}") === 1)
  }

  test("mutations(): exact rows (counts, coverage, proportions)") {
    val rows = run("default.mutations(minProportion := 0.1, sequenceNames := {main})")
      .collect().map(r => (r.getInt(2), r.getString(0), r.getString(1),
        r.getLong(6), r.getLong(5), r.getDouble(4))).toSet
    assert(rows === Set(
      (2, "C", "A", 1L, 5L, 0.2),
      (6, "C", "A", 1L, 5L, 0.2)))
  }

  test("aminoAcidInsertions: exact rows") {
    val rows = run("default.aminoAcidInsertions(sequenceNames := {E}).orderBy({position})")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getLong(3))).toSet
    assert(rows === Set(("EPE", 4, "E", 2L))) // key1 and key5
  }

  test("details pipeline: orderBy + offset + limit exact rows") {
    val keys = run("default.orderBy({desc(age), asc(primaryKey)})")
      .select("primaryKey").collect().map(_.getString(0)).toSeq
    assert(keys === Seq("key5", "key3", "key2", "key1", "key4"))
    val window = run("default.orderBy({desc(age), asc(primaryKey)}).offset(1).limit(2)")
      .select("primaryKey").collect().map(_.getString(0)).toSeq
    assert(window === Seq("key3", "key2"))
  }

  test("schema(): one STRING row per sequence, internals hidden, name order") {
    // reference semantics: operators/schema_node.test.cpp TABLE_SCHEMA —
    // aligned sequences and genes surface as single STRING fields, the
    // diff/coverage representation never leaks, fields sort by name.
    // Dummy dataset: nuc sequences main/testSecondSequence, genes E/M,
    // metadata per database_config.yaml.
    val rows = run("default.schema()")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(rows === Seq(
      "E" -> "STRING",
      "M" -> "STRING",
      "age" -> "INT32",
      "country" -> "STRING",
      "date" -> "DATE32",
      "division" -> "STRING",
      "main" -> "STRING",
      "pango_lineage" -> "STRING",
      "primaryKey" -> "STRING",
      "qc_value" -> "FLOAT",
      "region" -> "STRING",
      "testSecondSequence" -> "STRING",
      "test_boolean_column" -> "BOOL",
      "unaligned_main" -> "STRING",
      "unaligned_testSecondSequence" -> "STRING",
      "unsorted_date" -> "DATE32"))
    // filter preserves the table binding; project controls selection+order
    // afterwards (SCHEMA_AFTER_PROJECT_ORDER scenario)
    assert(run("default.filter(age > 5).schema()").count() === 16)
    val proj = run("default.project({age, country}).schema()")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(proj === Seq("age" -> "INT32", "country" -> "STRING"))
  }

  test("in / like / isNull / boolean equals: exact counts") {
    def cnt(q: String) = run(q).head().getLong(0)
    assert(cnt("default.filter(in(division, {'Bern', 'Aargau'})).groupBy({c := count()})") === 3)
    // like is RE2 SEARCH (substring match), not anchored SQL LIKE
    assert(cnt("default.filter(like(division, 'Ba')).groupBy({c := count()})") === 1)
    assert(cnt("default.filter(like(division, 'B.sel')).groupBy({c := count()})") === 1)
    assert(cnt("default.filter(like(division, '^Bern$')).groupBy({c := count()})") === 2)
    assert(cnt("default.filter(isNull(unsorted_date)).groupBy({c := count()})") === 1)
    assert(cnt("default.filter(isNull(test_boolean_column)).groupBy({c := count()})") === 1)
    assert(cnt("default.filter(test_boolean_column = true).groupBy({c := count()})") === 3)
    assert(cnt("default.filter(test_boolean_column = false).groupBy({c := count()})") === 1)
  }

  test("float between is from-inclusive, to-exclusive") {
    assert(run("default.filter(between(qc_value, 0.95, 0.97)).groupBy({c := count()})")
      .head().getLong(0) === 2) // 0.95 (key4) and 0.96 (key3); 0.97 excluded
  }

  test("nOf over heterogeneous predicates: exact count") {
    assert(run("""default.filter(nOf(2, {age > 4, between(qc_value, 0.90, 0.97),
        division = 'Bern'})).groupBy({c := count()})""")
      .head().getLong(0) === 4) // key2 key3 key4 key5; key1 matches 0 of 3
  }

  test("map with isoWeek and at: exact values") {
    val weeks = run("default.map({w := isoWeek(date)}).groupBy({c := count()}, {w}).orderBy({w})")
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(weeks === Seq((11, 2L), (15, 2L), (16, 1L))) // 03-18/19 wk11, 04-13×2 wk15, 04-25 wk16
    val at2 = run("default.map({s := main.at(2)}).groupBy({c := count()}, {s}).orderBy({s})")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(at2 === Seq(("A", 1L), ("C", 4L))) // key2 stores A at pos 2
  }

  test("aminoAcidInsertionContains + aminoAcidEquals: exact counts") {
    def cnt(q: String) = run(q).head().getLong(0)
    // E gene: key1 and key5 carry insertion 4:EPE
    assert(cnt("default.filter(aminoAcidInsertionContains(position:=4, value:='EP.*', sequenceName:='E')).groupBy({c := count()})") === 2)
    assert(cnt("default.filter(aminoAcidInsertionContains(position:=4, value:='Z.*', sequenceName:='E')).groupBy({c := count()})") === 0)
    // FULL-match semantics (RE2::FullMatch, insertion_index.cpp:121,134,148):
    // a strict substring of the insertion must NOT match — these cases
    // DISTINGUISH anchored from unanchored (Java find() would say 2)
    assert(cnt("default.filter(aminoAcidInsertionContains(position:=4, value:='EPE', sequenceName:='E')).groupBy({c := count()})") === 2)
    assert(cnt("default.filter(aminoAcidInsertionContains(position:=4, value:='PE', sequenceName:='E')).groupBy({c := count()})") === 0)
    assert(cnt("default.filter(aminoAcidInsertionContains(position:=4, value:='EP', sequenceName:='E')).groupBy({c := count()})") === 0)
    assert(cnt("default.filter(aminoAcidInsertionContains(position:=4, value:='.*PE', sequenceName:='E')).groupBy({c := count()})") === 2)
    assert(cnt("default.filter(aminoAcidInsertionContains(position:=4, value:='E.*E', sequenceName:='E')).groupBy({c := count()})") === 2)
    // M gene: key5 stores XXXX* (ref MADS*)
    assert(cnt("default.filter(aminoAcidEquals(position := 1, symbol := 'X', sequenceName := 'M')).groupBy({c := count()})") === 1)
    assert(cnt("default.filter(aminoAcidEquals(position := 1, symbol := '.', sequenceName := 'M')).groupBy({c := count()})") === 4)
  }

  test("mutations() on the second nucleotide sequence: exact rows") {
    val rows = run("default.mutations(minProportion := 0.1, sequenceNames := {testSecondSequence})")
      .collect().map(r => (r.getInt(2), r.getString(0), r.getString(1),
        r.getLong(6), r.getLong(5), r.getDouble(4))).toSet
    assert(rows === Set((2, "C", "A", 1L, 5L, 0.2))) // key2 AAGN vs ACGT; pos4 is missing, not a mutation
  }

  test("phyloDescendantOf and MRCA on the dummy tree: exact results") {
    // tree: ((key1,key2)inner1, ((key3,key4)inner2, key5)inner3)root
    def cnt(q: String) = run(q).head().getLong(0)
    assert(cnt("default.filter(primaryKey.phyloDescendantOf('inner2')).groupBy({c := count()})") === 2)
    assert(cnt("default.filter(primaryKey.phyloDescendantOf('inner3')).groupBy({c := count()})") === 3)
    val mrca34 = run("default.filter(in(primaryKey, {'key3', 'key4'})).mostRecentCommonAncestor('primaryKey')")
      .select("mrcaNode").head().getString(0)
    assert(mrca34 === "inner2")
    val mrca14 = run("default.filter(age = 4).mostRecentCommonAncestor('primaryKey')")
      .select("mrcaNode").head().getString(0)
    assert(mrca14 === "root") // key1 (inner1) ∪ key4 (inner2) → root
  }

  test("randomize(seed) is deterministic and a permutation") {
    val a = run("default.randomize(seed := 321).project({primaryKey})")
      .collect().map(_.getString(0)).toSeq
    val b = run("default.randomize(seed := 321).project({primaryKey})")
      .collect().map(_.getString(0)).toSeq
    assert(a === b)
    assert(a.sorted === Seq("key1", "key2", "key3", "key4", "key5"))
  }

  test("groupBy on two keys incl. a null group") {
    val g = run("default.groupBy({c := count()}, {test_boolean_column, pango_lineage})")
      .collect().map(r => (Option(r.get(0)), r.getString(1), r.getLong(2))).toSet
    assert(g === Set(
      (Some(true), "B.1.1.7", 1L),  // key1
      (Some(false), "B.1.1.7", 1L), // key2
      (None, "B.1.1.7", 1L),        // key3 (null bool is its own group)
      (Some(true), "XBB", 2L)))     // key4 key5
  }

  test("lineage counts and unionAll") {
    assert(run("""default.filter(lineage(pango_lineage, 'B.1.1.7',
        includeSublineages := false)).groupBy({c := count()})""")
      .head().getLong(0) === 3)
    val u = run("""unionAll(default.filter(age = 4).project({country}),
        default.filter(age = 54).project({country}))
        .groupBy({c := count()}, {country})""")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(u === Set(("Switzerland", 3L)))
  }
}
