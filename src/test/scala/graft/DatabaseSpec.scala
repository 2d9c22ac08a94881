package graft

import org.apache.spark.sql.functions._
import graft.core.Database
import graft.lang.Planner

/** End-to-end preprocessing against the reference's own
  * unitTestDummyDataset: real database_config.yaml, reference_genomes.json,
  * lineage definition (with aliases), phylogenetic tree, and NDJSON input.
  */
class DatabaseSpec extends SparkSpec {

  val dir = "/root/reference/testBaseData/unitTestDummyDataset"
  lazy val catalog = Database.build(spark, dir, s"$dir/input.ndjson")

  def run(q: String) = Planner.plan(q, catalog)

  test("builds the default table with all 5 records") {
    assert(catalog.tables("default").count() === 5)
  }

  test("build registers a posting index per sequence binding") {
    // ingest-time index registration (≙ the reference building its
    // vertical index during preprocessing); the 5-row dummy dataset never
    // passes the 10% routing gate, so queries here stay row-wise — the
    // routing itself is plan-verified in PlanSpec at real selectivities
    assert(catalog.mutIndexes("default").keySet ===
      catalog.sequences("default").keySet)
    val main = catalog.mutIndexes("default")("main")
    assert(main.tableRows === 5L)
    assert(main.counts.nonEmpty)
  }

  test("metadata filter + groupBy over ingested NDJSON") {
    val n = run("default.filter(country = 'Switzerland').groupBy({count := count()})")
      .collect().head.getLong(0)
    assert(n === 5)
  }

  test("sequence predicates work against the ingested diffs") {
    // record key2 has main = AAGNAAGN vs ref ACGTACGT → pos1 A matches ref
    val withMut = run("default.filter(hasMutation(position := 2, sequenceName := 'main'))")
      .select("primaryKey").collect().map(_.getString(0)).toSet
    assert(withMut.contains("key2")) // A at pos2 vs ref C
  }

  test("mutations() across the ingested sequences") {
    val muts = run("default.mutations(minProportion := 0.1, sequenceNames := {main})")
    assert(muts.count() > 0)
    val cols = muts.columns.toSeq
    assert(cols === Seq("mutationFrom", "mutationTo", "position",
      "sequenceName", "proportion", "coverage", "count"))
  }

  test("insertions parsed from pos:seq entries") {
    val ins = run("default.aminoAcidInsertions(sequenceNames := {E})")
      .collect()
    assert(ins.exists(r => r.getString(0) == "EPE" && r.getInt(1) == 4))
  }

  test("unaligned projection and aligned reconstruction") {
    val row = run(
      "default.filter(primaryKey = 'key1').project({primaryKey, unaligned_main, main})")
      .collect().head
    assert(row.getString(1) === "ACGTACGT")
    assert(row.getString(2) === "ACGTACGT") // reconstructed from diffs
  }

  test("lineage tree attached from config (aliases not parents)") {
    val n = run("""default.filter(lineage(pango_lineage, 'B.1.1.7',
        includeSublineages := true)).groupBy({count := count()})""")
      .collect().head.getLong(0)
    assert(n >= 3) // three B.1.1.7 rows at minimum
    // alias entries must NOT have been read as parent edges
    assert(catalog.lineageTrees("pango_lineage").parents.get("AA.1")
      .exists(_ == Seq("B.1.177.15")))
  }

  test("lineage alias names resolve to their canonical lineage") {
    // AA.1 is an alias target; querying by its alias B.1.177.15.1 must
    // reach the same rows as the canonical name
    val byCanon = run("default.filter(lineage(pango_lineage, 'AA.1', includeSublineages := true))").count()
    val byAlias = run("default.filter(lineage(pango_lineage, 'B.1.177.15.1', includeSublineages := true))").count()
    assert(byCanon === byAlias)
  }

  test("sequenceCompressed ingestion (base64 zstd against the reference)") {
    import graft.sources.ZstdStringColumn
    val tmp = java.nio.file.Files.createTempDirectory("zstddb")
    // reuse the dummy dataset's config/refs, but provide main via
    // sequenceCompressed on one record
    Seq("database_config.yaml", "reference_genomes.json",
      "phylogenetic_tree.nwk", "test_lineage_definition.yaml").foreach { f =>
      java.nio.file.Files.copy(java.nio.file.Paths.get(dir, f), tmp.resolve(f))
    }
    val mainRef = graft.core.Database.parseReferenceGenomes(
      spark, s"$dir/reference_genomes.json")._1("main")
    val blob = java.util.Base64.getEncoder.encodeToString(
      ZstdStringColumn.compressBytes("AGGTACGT", mainRef.getBytes("UTF-8")))
    val line = ("{\"primaryKey\":\"z1\",\"date\":\"2021-01-01\",\"unsorted_date\":\"2021-01-01\"," +
      "\"region\":\"Europe\",\"country\":\"CH\",\"pango_lineage\":\"A\",\"division\":\"X\"," +
      "\"age\":1,\"qc_value\":0.5,\"test_boolean_column\":true," +
      "\"main\":{\"sequenceCompressed\":\"" + blob + "\",\"insertions\":[]}," +
      "\"testSecondSequence\":{\"sequence\":\"ACGT\",\"insertions\":[]}," +
      "\"E\":{\"sequence\":\"MYSF*\",\"insertions\":[]}," +
      "\"M\":{\"sequence\":\"MADS*\",\"insertions\":[]}}")
    java.nio.file.Files.writeString(tmp.resolve("in.ndjson"), line + "\n")
    val cat = Database.build(spark, tmp.toString, tmp.resolve("in.ndjson").toString)
    val row = Planner.plan("default.project({primaryKey, main})", cat).collect().head
    assert(row.getString(1) === "AGGTACGT") // decompressed, diffed, reconstructed
  }

  test("posting indexes persist to stateDir parquet and LOAD on rebuild") {
    import java.nio.file.{Files, Paths}
    val state = Files.createTempDirectory("graft_state").toString
    val c1 = Database.build(spark, dir, s"$dir/input.ndjson", Some(state))
    // every binding wrote a complete index (meta present = commit marker)
    c1.mutIndexes("default").keySet.foreach { b =>
      assert(Files.exists(Paths.get(state, "index", b, "meta.json")), b)
    }
    val meta = Paths.get(state, "index", "main", "meta.json")
    val t0 = Files.getLastModifiedTime(meta)
    val m1 = c1.mutIndexes("default")("main")
    // a SECOND build against the same state LOADS the persisted index —
    // the reference's serialize-indexes-with-state property
    // (sequence_column.h:147-163) — instead of re-deriving the postings
    val c2 = Database.build(spark, dir, s"$dir/input.ndjson", Some(state))
    assert(Files.getLastModifiedTime(meta) === t0) // not rewritten
    val m2 = c2.mutIndexes("default")("main")
    assert(m2.tableRows === m1.tableRows)
    assert(m2.counts === m1.counts)
    assert(m2.postings.collect().map(_.toString).sorted.toSeq ===
      m1.postings.collect().map(_.toString).sorted.toSeq)
    // the loaded posting frame is a plain partitioned-parquet scan: a
    // routed `pos = p` filter prunes partition directories at scan time
    val pruned = m2.postings.filter(col("pos") === 2)
    val p = pruned.queryExecution.explainString(
      org.apache.spark.sql.execution.SimpleMode)
    assert(p.contains("PartitionFilters"), p.take(800))
    assert(p.contains("(pos"), p.take(800))
    // and query results through the loaded catalog match the built one
    val q = "default.filter(hasMutation(position := 2, sequenceName := 'main'))"
    assert(Planner.plan(q, c2).select("primaryKey").collect().map(_.getString(0)).toSet ===
      Planner.plan(q, c1).select("primaryKey").collect().map(_.getString(0)).toSet)
  }

  test("persisted index invalidates when the input changes (fingerprint)") {
    import java.nio.file.{Files, Paths}
    val state = Files.createTempDirectory("graft_state_fp").toString
    val c1 = Database.build(spark, dir, s"$dir/input.ndjson", Some(state))
    val meta = Paths.get(state, "index", "main", "meta.json")
    val t0 = Files.getLastModifiedTime(meta)
    // same input → loaded, meta untouched
    Database.build(spark, dir, s"$dir/input.ndjson", Some(state))
    assert(Files.getLastModifiedTime(meta) === t0)
    // different input (one record dropped) → fingerprint miss → the index
    // REBUILDS instead of serving stale postings for the old data
    val lines = Files.readAllLines(Paths.get(s"$dir/input.ndjson"))
    val tmpIn = Files.createTempDirectory("graft_in").resolve("in.ndjson")
    Files.write(tmpIn, lines.subList(0, lines.size - 1))
    val c2 = Database.build(spark, dir, tmpIn.toString, Some(state))
    assert(c2.mutIndexes("default")("main").tableRows ===
      c1.mutIndexes("default")("main").tableRows - 1)
    assert(Files.getLastModifiedTime(meta) !== t0) // rewritten
  }

  test("corrupt meta.json loads as None (rebuild), not a crash") {
    import java.nio.file.{Files, Paths}
    val state = Files.createTempDirectory("graft_state_bad")
    Files.writeString(state.resolve("meta.json"), "{\"tableRows\":") // torn write
    assert(Planner.SeqIndex.load(spark, state.toString).isEmpty)
    Files.writeString(state.resolve("meta.json"), "not json at all")
    assert(Planner.SeqIndex.load(spark, state.toString).isEmpty)
  }

  test("persisted index invalidates when the CONFIG changes (fingerprint)") {
    import java.nio.file.{Files, Paths}
    val cfg = Files.createTempDirectory("graft_cfg")
    Seq("database_config.yaml", "reference_genomes.json",
      "phylogenetic_tree.nwk", "test_lineage_definition.yaml").foreach { f =>
      Files.copy(Paths.get(dir, f), cfg.resolve(f))
    }
    val state = Files.createTempDirectory("graft_state_cfg").toString
    Database.build(spark, cfg.toString, s"$dir/input.ndjson", Some(state))
    val meta = Paths.get(state, "index", "main", "meta.json")
    val t0 = Files.getLastModifiedTime(meta)
    // an edit to reference_genomes.json changes every diff the postings
    // were derived from even though the NDJSON is untouched — the
    // fingerprint spans the config dir, so the load must miss and rebuild
    val rg = cfg.resolve("reference_genomes.json")
    Files.writeString(rg, Files.readString(rg) + "\n")
    Database.build(spark, cfg.toString, s"$dir/input.ndjson", Some(state))
    assert(Files.getLastModifiedTime(meta) !== t0) // rewritten, not served stale
  }

  test("phylo tree from the dataset's newick file") {
    val m = run(
      "default.filter(country = 'Switzerland').mostRecentCommonAncestor('primaryKey')")
      .collect().head
    assert(m.getAs[String]("mrcaNode") === "root")
    assert(m.isNullAt(m.fieldIndex("mrcaParent"))) // root has no parent
    assert(m.getAs[Int]("mrcaDepth") === 0)
    val sub = run(
      "default.filter((primaryKey = 'key1') || (primaryKey = 'key2')).phyloSubtree('primaryKey')")
      .collect().head
    // subtree roots at the MRCA (inner1), reverse declaration order
    assert(sub.getAs[String]("subtreeNewick") === "(key2,key1)inner1;")
    assert(sub.getAs[Int]("missingNodeCount") === 0)
  }
}
