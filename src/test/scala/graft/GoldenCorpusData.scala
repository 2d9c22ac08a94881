package graft

import java.io.File
import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import graft.lang.Planner
import graft.lang.Planner.{Catalog, SeqBinding}
import graft.seq.SequenceModel
import graft.trees.{LineageTree, PhyloTree}

/** The reference-corpus fixture shared by [[GoldenCorpusSpec]] (in-process
  * sweep + value replays) and [[HttpCorpusSpec]] (the same corpus through
  * the live HTTP server on both response content types): a synthetic,
  * schema-conforming 100-row dataset built from the reference's own config
  * artifacts (database_config.yaml, lineage_definition.yaml,
  * phylogenetic_tree.nwk), plus the corpus-file readers.
  */
trait GoldenCorpusData { self: SparkSpec =>

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
  // Each synthetic gene reference must be at least as long as the corpus's max
  // queried position for that gene (the planner validates insertion positions
  // against the reference length, matching insertion_contains.cpp:61-65):
  // corpus maxima are E=20 N=377 ORF1a=3676 ORF1b=314 S=969. S uses the real
  // spike length (1273 aa) so the planted S insertion at 214 stays in range.
  val geneLens: Map[String, Int] = Map(
    "E" -> 100, "M" -> 100, "N" -> 400, "ORF1a" -> 3700, "ORF1b" -> 350, "S" -> 1273)
  lazy val geneRefs: Map[String, String] = geneNames.map { g =>
    g -> ("M" + Seq.tabulate(geneLens(g) - 1)(i =>
      "ARNDCQEGHILKMFPSTWYV"((i * 7 + g.length) % 20)).mkString)
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
    import spark.implicits._
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

  def allJsonFiles(dir: File): Seq[File] = {
    val (dirs, files) = dir.listFiles().toSeq.partition(_.isDirectory)
    (files.filter(_.getName.endsWith(".json")) ++ dirs.flatMap(allJsonFiles))
      .sortBy(_.getPath)
  }

  def corpusQuery(file: String): String = {
    val src = Files.readString(new File(s"$base/queries/$file").toPath)
    jsonString(src, "query").getOrElse(sys.error(s"no query in $file"))
  }

  def runQ(file: String): DataFrame = Planner.plan(corpusQuery(file), catalog)
}
