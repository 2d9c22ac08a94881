package graft

import java.io.File
import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import graft.lang.{Lexer, Parser, Planner}
import graft.lang.Planner.{Catalog, SeqBinding}
import graft.seq.SequenceModel
import graft.trees.{LineageTree, PhyloTree}

/** Compatibility surface check against the reference's end-to-end corpus
  * (reference: endToEndTests/test/queries/ — 111 golden queries;
  * endToEndTests/test/invalidQueries/ — 19 must-fail queries).
  *
  * The reference's actual input dataset (`input_file.ndjson`) is not
  * shipped, so expected VALUES cannot be replayed; what this spec pins down
  * is the full LANGUAGE surface: every golden query must lex, parse, plan,
  * and execute on a schema-conforming synthetic dataset (built from
  * testBaseData/exampleDataset/database_config.yaml, the real
  * lineage_definition.yaml, and the real phylogenetic_tree.nwk), and every
  * invalid query must be rejected.
  */
class GoldenCorpusSpec extends SparkSpec {
  import spark.implicits._

  val base = "/root/reference/endToEndTests/test"
  val exampleDir = "/root/reference/testBaseData/exampleDataset"

  // ---- minimal extractors for the corpus JSON files (no JSON dep) ----
  def jsonString(src: String, key: String): Option[String] = {
    val m = ("\"" + key + "\"\\s*:\\s*\"").r.findFirstMatchIn(src)
    m.map { mm =>
      val sb = new StringBuilder
      var i = mm.end
      var done = false
      while (!done) src(i) match {
        case '\\' =>
          sb += (src(i + 1) match {
            case 'n' => '\n'; case 't' => '\t'; case 'r' => '\r'
            case other => other
          })
          i += 2
        case '"' => done = true
        case c => sb += c; i += 1
      }
      sb.toString
    }
  }

  // ---- reference config artifacts (real files) ----
  lazy val lineageDef: LineageTree.Definition =
    LineageTree.fromYamlFile(s"$exampleDir/lineage_definition.yaml")
  lazy val lineageTree: LineageTree = lineageDef.tree

  lazy val phylo: PhyloTree = PhyloTree.fromNewick(
    Files.readString(java.nio.file.Paths.get(s"$exampleDir/phylogenetic_tree.nwk")))

  // ---- synthetic, schema-conforming dataset (100 rows) ----
  val L = 29903
  lazy val mainRef: String = {
    val syms = "ACGT"
    val sb = new StringBuilder
    var x = 42L
    (0 until L).foreach { _ =>
      x = x * 6364136223846793005L + 1442695040888963407L
      sb += syms(((x >>> 33) % 4).toInt)
    }
    sb.toString
  }
  val secondRef = "ACGT"
  val geneNames = Seq("E", "M", "N", "ORF1a", "ORF1b", "S")
  lazy val geneRefs: Map[String, String] = geneNames.map { g =>
    g -> ("M" + Seq.tabulate(99)(i => "ARNDCQEGHILKMFPSTWYV"((i * 7 + g.length) % 20)).mkString)
  }.toMap

  def mutate(ref: String, i: Int, k: Int): String = {
    val b = ref.toCharArray
    val syms = if (ref == mainRef || ref == secondRef) "ACGT" else "ARNDCQEGHILKMFPSTWYV"
    (0 until k).foreach { j =>
      val p = (i * 97 + j * 131) % ref.length
      b(p) = syms((i + j + 1) % syms.length)
    }
    new String(b)
  }

  /** One synthetic row, kept as plain Scala data so replay tests can
    * compute expected values NAIVELY (string/char-level, no Spark) and
    * compare them against the planner running the real corpus query text.
    */
  final case class NRow(
      i: Int, pk: String, usher: String, dateS: String, unsortedS: String,
      region: String, country: String, lineage: String, division: String,
      age: Integer, qc: java.lang.Double, bool: Boolean,
      main: String, second: String, genes: Map[String, String])

  lazy val naiveRows: Seq[NRow] = {
    val leaves = phylo.parent.keySet.filterNot(phylo.children.contains).toSeq.sorted
    val lineages = lineageTree.nodes.toSeq.sorted
    val regions = Seq("Europe", "NorthAmerica", "Asia")
    val countries = Seq("Switzerland", "Germany", "USA", "China")
    val divisions = Seq("Aargau", "Bern", "Zurich", "Bayern", "Solothurn")
    (1 to 100).map { i =>
      NRow(i, s"key_$i",
        if (i == 29) null else leaves((i - 1) % leaves.size),
        f"2021-${(i % 12) + 1}%02d-${(i % 27) + 1}%02d",
        f"2021-${((i * 7) % 12) + 1}%02d-${((i * 3) % 27) + 1}%02d",
        regions(i % regions.size),
        countries(i % countries.size),
        lineages(i % lineages.size),
        if (i % 17 == 0) null else divisions(i % divisions.size),
        if (i % 10 == 0) null else Integer.valueOf(20 + i % 60),
        if (i % 13 == 0) null else java.lang.Double.valueOf((i % 100) / 100.0),
        i % 2 == 0,
        mutate(mainRef, i, 5),
        mutate(secondRef, i, 1),
        geneNames.map(g => g -> mutate(geneRefs(g), i, 2)).toMap)
    }
  }

  lazy val dataset: DataFrame = {
    val rows = naiveRows.map { r =>
      (r.pk, r.usher, r.dateS, r.unsortedS, r.region, r.country, r.lineage,
        r.division, r.age, r.qc, r.bool, r.main, r.second,
        r.genes("E"), r.genes("M"), r.genes("N"), r.genes("ORF1a"),
        r.genes("ORF1b"), r.genes("S"))
    }
    val df = rows.toDF("primary_key", "usherTree", "date_s", "unsorted_date_s",
      "region", "country", "pango_lineage", "division", "age", "qc_value",
      "test_boolean_column", "seq_main", "seq_second",
      "seq_E", "seq_M", "seq_N", "seq_ORF1a", "seq_ORF1b", "seq_S")
    import org.apache.spark.sql.functions._
    val dated = df
      .withColumn("date", to_date(col("date_s")))
      .withColumn("unsorted_date", to_date(col("unsorted_date_s")))
      .drop("date_s", "unsorted_date_s")
    // diff every sequence column against its reference; insertions for main + E
    // keep the raw (unaligned) nucleotide strings as projectable columns
    val withUnaligned = dated
      .withColumn("unaligned_main", col("seq_main"))
      .withColumn("unaligned_testSecondSequence", col("seq_second"))
    val diffed = Seq(
      ("seq_main", mainRef, ""), ("seq_second", secondRef, "ts_"),
      ("seq_E", geneRefs("E"), "E_"), ("seq_M", geneRefs("M"), "M_"),
      ("seq_N", geneRefs("N"), "N_"), ("seq_ORF1a", geneRefs("ORF1a"), "ORF1a_"),
      ("seq_ORF1b", geneRefs("ORF1b"), "ORF1b_"), ("seq_S", geneRefs("S"), "S_"))
      .foldLeft(withUnaligned) { case (d, (c, ref, p)) =>
        // missing symbol is per-alphabet: N for nucleotides, X for amino
        // acids (in AA, N is Asparagine — a concrete symbol, not missing)
        val missing = if (c == "seq_main" || c == "seq_second") "N" else "X"
        SequenceModel.diff(d, c, ref, missingSyms = Set(missing), prefix = p)
      }
    def insCol(d: DataFrame, name: String, mod: Int, pos: Int, v: String) =
      d.withColumn(name, when(expr(s"pmod(hash(primary_key), $mod)") === 0,
        array(struct(lit(pos).as("pos"), lit(v).as("ins"))))
        .otherwise(array().cast("array<struct<pos:int,ins:string>>")))
    var out = insCol(diffed, "ins", 5, 22204, "CAGAA")
    out = insCol(out, "ts_ins", 9, 2, "GG")
    out = insCol(out, "E_ins", 7, 3, "YY")
    out = insCol(out, "M_ins", 7, 4, "KL")
    out = insCol(out, "N_ins", 7, 5, "QQ")
    out = insCol(out, "ORF1a_ins", 8, 6, "ST")
    out = insCol(out, "ORF1b_ins", 8, 7, "VV")
    out = insCol(out, "S_ins", 3, 214, "Y*EPE")
    out
  }

  lazy val catalog: Catalog = Catalog(
    tables = Map("default" -> dataset.cache()),
    sequences = Map("default" -> (Map(
      "main" -> SeqBinding(mainRef, ""),
      "testSecondSequence" -> SeqBinding(secondRef, "ts_")) ++
      geneNames.map(g => g -> SeqBinding(geneRefs(g), s"${g}_", isAminoAcid = true)))),
    lineageTrees = Map("pango_lineage" -> lineageTree),
    phyloTrees = Map("usherTree" -> phylo),
    lineageAliases = Map("pango_lineage" -> lineageDef.aliases))

  // constructs intentionally not supported yet (documented gaps)
  val knownGaps: Set[String] = Set()

  def allJsonFiles(dir: File): Seq[File] = {
    val (dirs, files) = dir.listFiles().toSeq.partition(_.isDirectory)
    (files.filter(_.getName.endsWith(".json")) ++ dirs.flatMap(allJsonFiles))
      .sortBy(_.getPath)
  }

  allJsonFiles(new File(s"$base/queries")).foreach { f =>
    test(s"golden ${f.getName}") {
      val src = Files.readString(f.toPath)
      val q = jsonString(src, "query").getOrElse(fail(s"no query in ${f.getName}"))
      if (knownGaps.contains(f.getName)) cancel("documented gap")
      val df = Planner.plan(q, catalog)
      assert(df.count() >= 0)
    }
  }

  // ==== value-level replay of the most-used corpus shapes ====
  // Expected values are computed NAIVELY from `naiveRows` (plain Scala
  // string/char work over the generator's own data, no Spark, no reuse of
  // the operators under test); the query text is the REAL corpus file's.

  def corpusQuery(file: String): String = {
    val src = Files.readString(new File(s"$base/queries/$file").toPath)
    jsonString(src, "query").getOrElse(fail(s"no query in $file"))
  }
  def runQ(file: String): DataFrame = Planner.plan(corpusQuery(file), catalog)
  def count1(file: String): Long = runQ(file).head().getLong(0)

  /** Naive sublineage closure: BFS over the parsed YAML child edges,
    * resolving the root alias — independent of LineageTree.descendants'
    * fixpoint logic.
    */
  def naiveSublineages(root: String): Set[String] = {
    val canon = lineageDef.aliases.getOrElse(root, root)
    val out = scala.collection.mutable.Set(canon)
    var frontier = List(canon)
    while (frontier.nonEmpty) {
      val next = frontier.flatMap(n => lineageTree.children.getOrElse(n, Nil))
        .filterNot(out)
      out ++= next
      frontier = next
    }
    out.toSet
  }

  test("replay: count-filter shapes match naive row counts") {
    def n(pred: NRow => Boolean): Long = naiveRows.count(pred).toLong
    assert(count1("matchAll.json") === 100L)
    assert(count1("intBetween.json") ===
      n(r => r.age != null && r.age >= 52 && r.age <= 55))
    assert(count1("intEquals.json") === n(r => r.age != null && r.age == 55))
    assert(count1("dateBetween.json") === n(_.dateS == "2021-03-18"))
    assert(count1("dateBetween_openTo1.json") === n(_.dateS >= "2021-03-17"))
    // float between is to-EXCLUSIVE (reference float_between.cpp)
    assert(count1("floatBetween.json") ===
      n(r => r.qc != null && r.qc >= 0.905 && r.qc < 0.935))
    assert(count1("floatEquals.json") === n(r => r.qc != null && r.qc == 0.9))
    assert(count1("stringEquals.json") === n(_.country == "Switzerland"))
    assert(count1("booleanEquals.json") === n(_.bool))
    assert(count1("Not.json") === n(_.country != "Switzerland"))
    assert(count1("stringSearch_prefix.json") === n(_.pk.startsWith("key_")))
    val b117 = naiveSublineages("B.1.1.7")
    assert(count1("pangoLIneageIncludingSublineages.json") ===
      n(r => b117.contains(r.lineage)))
    assert(count1("pangoLIneageWithoutSublineages.json") ===
      n(r => lineageDef.aliases.getOrElse(r.lineage, r.lineage) ==
        lineageDef.aliases.getOrElse("B.1.1.7", "B.1.1.7")))
    assert(count1("And.json") ===
      n(r => r.country == "Switzerland" && b117.contains(r.lineage)))
    assert(count1("Or.json") === n(r => b117.contains(r.lineage)))
  }

  test("replay: sequence predicate shapes match naive char counts") {
    def n(pred: NRow => Boolean): Long = naiveRows.count(pred).toLong
    // symbol at 1-based position (synthetic sequences are full-length)
    def at(r: NRow, p: Int): Char = r.main.charAt(p - 1)
    assert(count1("N_notIndexed.json") === n(r => at(r, 122) == 'N'))
    // maybe(A) at 122: stored symbol must be ambiguity-compatible with A;
    // the synthetic alphabet is concrete ACGT, so compat = exact A
    assert(count1("Maybe.json") === n(r => at(r, 122) == 'A'))
    assert(count1("Exact.json") === n(r => at(r, 122) == 'A'))
    val nOf = Seq((241, 'T'), (29734, 'T'), (28330, 'G'))
    assert(count1("nOf_2of3_aggregated.json") ===
      n(r => nOf.count { case (p, s) => at(r, p) == s } >= 2))
  }

  test("replay: groupBy / orderBy / limit / offset shapes match naive rows") {
    // OrderByAge: groupBy(age) counts ascending, nulls first
    val ageGroups = naiveRows.groupBy(r => Option(r.age).map(_.toInt))
      .map { case (k, v) => k -> v.size.toLong }
    val expectAges = ageGroups.toSeq.sortBy { case (k, _) => (k.isDefined, k.getOrElse(0)) }
    val gotAges = runQ("OrderByAge.json")
      .collect().map(r => (Option(r.getAs[Integer]("age")).map(_.toInt),
        r.getAs[Long]("count"))).toSeq
    assert(gotAges === expectAges.map { case (k, c) => (k, c) })

    // GroupByDivision ordered by (division, count); nulls first
    val divGroups = naiveRows.groupBy(r => Option(r.division))
      .map { case (k, v) => (k, v.size.toLong) }.toSeq
      .sortBy { case (k, c) => (k.isDefined, k.getOrElse(""), c) }
    val gotDivs = runQ("GroupByDivision.json")
      .collect().map(r => (Option(r.getAs[String]("division")),
        r.getAs[Long]("count"))).toSeq
    assert(gotDivs === divGroups)

    // top-4 lineages by count desc — compare as count multiset (lineage
    // ties at the cut are unordered)
    val topCounts = naiveRows.groupBy(_.lineage).map(_._2.size.toLong)
      .toSeq.sorted.reverse.take(4)
    val gotTop = runQ("GroupByLineageOrderByCountLimit.json")
      .collect().map(_.getAs[Long]("count")).toSeq.sorted.reverse
    assert(gotTop === topCounts)

    // detailsLimitAscending5: the 5 smallest divisions nulls-first — the
    // synthetic data has exactly 5 nulls
    val got5 = runQ("detailsLimitAscending5.json").collect().map(r =>
      Option(r.getString(0))).toSeq
    assert(got5 === Seq.fill(5)(None))

    // OffsetLimitOverlap: rows 91..100 in primary_key string order
    val expectPks = naiveRows.map(_.pk).sorted.drop(90)
    val got = runQ("OffsetLimitOverlap.json").collect()
    assert(got.map(_.getAs[String]("primary_key")).toSeq === expectPks)
    val byPk = naiveRows.map(r => r.pk -> r).toMap
    got.foreach { r =>
      val nr = byPk(r.getAs[String]("primary_key"))
      assert(Option(r.getAs[Integer]("age")) === Option(nr.age))
      assert(r.getAs[String]("country") === nr.country)
    }
  }

  test("replay: aminoAcidMutations distribution matches naive recount") {
    // aaMutDistribution_min0: E gene, minProportion 0.0 — recount naively
    // from the raw mutated gene strings (the generator's 2-positions-per-row
    // mutations are too sparse for the 0.3-threshold corpus variant);
    // coverage = 100 (full-length, no X), so proportion = count/100
    val ref = geneRefs("E")
    val counts = scala.collection.mutable.Map.empty[(Int, Char), Int]
    naiveRows.foreach { r =>
      val s = r.genes("E")
      (0 until ref.length).foreach { k =>
        if (s.charAt(k) != ref.charAt(k))
          counts((k + 1, s.charAt(k))) = counts.getOrElse((k + 1, s.charAt(k)), 0) + 1
      }
    }
    val expected = counts.map { case ((p, sym), c) =>
      (p, ref.charAt(p - 1).toString, sym.toString, c.toLong, c / 100.0)
    }.toSet
    val got = runQ("aaMutDistribution_min0.json")
      .selectExpr("position", "mutationFrom", "mutationTo", "count", "proportion")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getDouble(4))).toSet
    assert(got === expected)
    assert(got.nonEmpty)
    // the corpus query carries an orderBy — verify it end-to-end too
    val ordered = runQ("aaMutDistribution_min0.json")
      .selectExpr("sequenceName", "position", "mutationTo").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSeq
    assert(ordered === ordered.sorted)
  }

  allJsonFiles(new File(s"$base/invalidQueries")).foreach { f =>
    test(s"invalid ${f.getName}") {
      val src = Files.readString(f.toPath)
      val q = jsonString(src, "query").getOrElse(fail(s"no query in ${f.getName}"))
      // must be one of the planner's TYPED errors — a Spark
      // AnalysisException leaking through would mean the planner accepted
      // an invalid query and Spark happened to reject the plan
      val thrown = intercept[Throwable] {
        Planner.plan(q, catalog).count()
      }
      assert(
        thrown.isInstanceOf[Planner.QueryError] ||
          thrown.isInstanceOf[Parser.ParseError] ||
          thrown.isInstanceOf[Lexer.LexError],
        s"expected a typed planner error, got ${thrown.getClass.getName}: " +
          s"${thrown.getMessage}")
    }
  }
}
