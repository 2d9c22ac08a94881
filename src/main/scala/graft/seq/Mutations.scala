package graft.seq

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The `mutations()` / `insertions()` pipeline-breakers over a diffed
  * sequence DataFrame (reference: operators/mutations_node.cpp, §2.4 of
  * SURVEY.md; query_documentation.md:186-244).
  *
  * Reproduces the reference's counting arithmetic exactly, expressed as
  * DataFrame aggregations:
  *  - explicit diff counts from the exploded muts arrays (O(|diffs|));
  *  - coverage per position via the coverage-interval PREFIX-SUM trick
  *    (mutations_node.cpp:63-136): +1 at cov_start, −1 at cov_end+1,
  *    cumulative sum over the position axis — never a per-row-per-position
  *    explode, so it survives a 100× scale-up;
  *  - reference-symbol counts by subtraction (accumulateFinalCounts,
  *    mutations_node.cpp:191-203).
  */
object Mutations {

  /** Per (position, symbol≠ref[pos]) over the (already filtered) rows:
    * count, coverage, proportion; emit rows with proportion ≥ minProportion.
    * `genomeLength` bounds the position axis (= ref.length).
    *
    * Coverage uses a two-level distributed prefix sum over the position
    * axis (bucketed windows + broadcast bucket offsets), so neither the row
    * count nor the position-axis length ever funnels through a single
    * partition.
    */
  /** Per-position raw coverage (prefix-sum over [cov_start, cov_end]
    * deltas) and interior-missing counts: (pos, covraw, miss). Shared by
    * `mutations()` and ingest-time local-reference adaptation.
    */
  def positionCoverage(filtered: DataFrame, genomeLength: Int,
      prefix: String = ""): DataFrame = {
    val spark = filtered.sparkSession
    // null sequences have null coverage bounds — they contribute nothing
    val deltas = filtered.select(col(s"${prefix}cov_start").as("pos"), lit(1L).as("d"))
      .union(filtered.select((col(s"${prefix}cov_end") + 1).as("pos"), lit(-1L).as("d")))
      .filter(col("pos").isNotNull)
      .groupBy("pos").agg(sum("d").as("d"))

    val positions = spark.range(1, genomeLength + 1)
      .select(col("id").cast("int").as("pos"))
    // two-level cumulative sum: window partitioned by 64k-position buckets
    // (parallel), plus a broadcast-joined running offset over the tiny
    // bucket-totals table — no single-partition window even if the
    // position axis grows far beyond genome scale
    val bucketW = Window.partitionBy("bucket").orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, 0)
    val withBucket = positions.join(deltas, Seq("pos"), "left")
      .na.fill(0, Seq("d"))
      .withColumn("bucket", (col("pos") / 65536).cast("int"))
    val bucketTotals = withBucket.groupBy("bucket")
      .agg(sum("d").as("bsum"))
    val bucketOffsets = bucketTotals
      .withColumn("offset",
        coalesce(sum("bsum").over(
          Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select("bucket", "offset")
    val covRaw = withBucket
      .withColumn("incum", sum("d").over(bucketW))
      .join(broadcast(bucketOffsets), Seq("bucket"))
      .withColumn("covraw", col("incum") + col("offset"))

    val missCounts = filtered.select(explode(col(s"${prefix}missing")).as("pos"))
      .groupBy("pos").agg(count(lit(1)).as("miss"))

    covRaw.join(missCounts, Seq("pos"), "left")
      .na.fill(0, Seq("miss"))
      .select("pos", "covraw", "miss")
  }

  /** `diffRows`, when given, replaces the fact-table explode as the
    * source of the filtered set's (position, sym) diff multiset — the
    * vertical-index fast path (mutations_node.cpp:153-189): the planner
    * passes `postings ⋉ F_ids` so the wide `muts` arrays are never read.
    * Coverage stays row-wise (the interval prefix sum needs cov_start/
    * cov_end/missing from the filtered rows themselves).
    */
  def mutations(filtered: DataFrame, ref: String, minProportion: Double,
      prefix: String = "", invalidSyms: Set[String] = Set(),
      localRef: String = "",
      diffRows: Option[DataFrame] = None): DataFrame = {
    val genomeLength = ref.length
    // storage may be re-based onto an adapted local reference
    // (sequence_column.cpp:157-196 finalize): rows with no stored diff at a
    // position carry the LOCAL reference symbol there; the residual count
    // belongs to it (accumulateFinalCounts, mutations_node.cpp:191-203),
    // while mutationFrom and the "is a mutation" test stay on the GLOBAL
    // reference (addMutationsToOutput, mutations_node.cpp:325-328)
    val lr = if (localRef.isEmpty) ref else localRef

    // ambiguity codes (R, Y, … / B, J, Z) are INVALID_MUTATION_SYMBOLS in
    // the reference: they are excluded from the emitted mutations AND from
    // the coverage denominator (mutations_node.cpp:303-307 sums only
    // VALID_MUTATION_SYMBOLS counts into `total`)
    val exploded = diffRows.getOrElse(
      filtered.select(explode(col(s"${prefix}muts")).as("m"))
        .select(col("m.pos").as("position"), col("m.sym").as("sym")))
    val isAmbig =
      if (invalidSyms.isEmpty) lit(false)
      else col("sym").isin(invalidSyms.toSeq.sorted: _*)
    val mutCounts = exploded.filter(!isAmbig)
      .groupBy(col("position"), col("sym").as("mutation_to"))
      .agg(count(lit(1)).as("count"))
    val ambigCounts = exploded.filter(isAmbig)
      .groupBy(col("position").as("apos")).agg(count(lit(1)).as("amb"))

    val cov = positionCoverage(filtered, genomeLength, prefix)
      .join(ambigCounts, col("pos") === col("apos"), "left")
      .na.fill(0, Seq("amb"))
      .select(col("pos"),
        (col("covraw") - col("miss") - col("amb")).as("coverage"),
        (col("covraw") - col("miss")).as("covnm"))

    val counts =
      if (lr == ref) mutCounts
      else {
        // residual rows (covered, not missing, no stored diff) carry the
        // local reference symbol — at positions where it differs from the
        // global reference they are mutations and must be emitted. The
        // adapted-position test compares the two reference strings directly
        // (two O(1) substrings per position row) instead of an In-list
        // literal, so plan size and filter cost stay O(1) even when most of
        // a 30k genome adapts (the motivating divergent-dataset case)
        val diffTotals = exploded.groupBy(col("position").as("dpos"))
          .agg(count(lit(1)).as("dtot"))
        val residual = cov
          .filter(SequenceModel.refAt(lr, col("pos")) =!=
            SequenceModel.refAt(ref, col("pos")))
          .join(diffTotals, col("pos") === col("dpos"), "left")
          .na.fill(0, Seq("dtot"))
          .select(col("pos").as("position"),
            SequenceModel.refAt(lr, col("pos")).as("mutation_to"),
            (col("covnm") - col("dtot")).as("count"))
          .filter(col("count") > 0)
        mutCounts.unionByName(residual)
          .groupBy("position", "mutation_to")
          .agg(sum("count").as("count"))
      }

    counts.join(cov, col("position") === col("pos")).drop("pos", "covnm")
      .select(
        col("position"),
        SequenceModel.refAt(ref, col("position")).as("mutation_from"),
        col("mutation_to"),
        col("count").cast("bigint").as("count"),
        col("coverage").cast("bigint").as("coverage"),
        round(col("count").cast("double") / col("coverage"), 4).as("proportion"))
      .filter(col("proportion") >= minProportion &&
        col("mutation_to") =!= col("mutation_from"))
  }

  /** `insertions()`: per distinct (position, inserted string): count over
    * the filtered set (reference: operators/insertions_node.cpp).
    * Expects an `ins: array<struct<pos:int, ins:string>>` column.
    * `insRows` (pos, ins), when given, replaces the explode with the
    * vertical-index multiset (`insPostings ⋉ F_ids`), mirroring
    * [[mutations]]' diffRows fast path.
    */
  def insertions(filtered: DataFrame, insCol: String = "ins",
      insRows: Option[DataFrame] = None): DataFrame =
    insRows.getOrElse(
      filtered.select(explode(col(insCol)).as("i"))
        .select(col("i.pos").as("pos"), col("i.ins").as("ins")))
      .groupBy(col("pos").as("position"), col("ins").as("inserted_symbols"))
      .agg(count(lit(1)).as("count"))
}
