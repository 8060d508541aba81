package graft.sinks

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Parquet LAYOUT maintenance — the two table-health jobs a 100 TB lake
  * schedules continuously:
  *
  *  - **Compaction** ([[compactParquet]]): streaming ingest and
  *    fine-grained writes leave thousands of small part files; every
  *    downstream scan then pays per-file open/footer/seek costs and the
  *    driver pays per-file listing. Compacting rewrites a directory into
  *    size-targeted files (ceil(totalBytes / targetBytes) of them).
  *  - **Sort-clustered layout** ([[writeClustered]]): a global range
  *    partition + in-partition sort on the hot filter columns makes each
  *    file's min/max footer stats TIGHT, so a selective predicate prunes
  *    whole files/row-groups at the reader instead of decoding every row
  *    and filtering after — the poor man's z-order, and the difference
  *    between scanning 100 TB and scanning the 2 TB a date/length filter
  *    actually needs (PlanShapeSpec pins the skipping with scan metrics).
  */
object Layout {

  /** Total bytes of the data files under `dir`, RECURSIVE — so a
    * hive-partitioned layout (part files inside `key=value/` subdirs)
    * is sized correctly, not read as zero (driver-side listing — one
    * filesystem call per file, the same cost every scan of the
    * uncompacted directory would pay again and again). */
  def dataBytes(spark: SparkSession, dir: String): Long = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(p, /* recursive = */ true)
    var total = 0L
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.startsWith("part-")) total += f.getLen
    }
    total
  }

  /** Rewrite the parquet directory `inDir` into `outDir` as
    * ceil(totalBytes / targetBytes) files. `shuffle = false` (default)
    * coalesces — no data movement, each output file concatenates input
    * partitions, sizes as even as the inputs allow (and coalesce can
    * only MERGE: if the target count exceeds the read's partition
    * count, the existing files are already under target size and the
    * write keeps them); `shuffle = true` round-robin repartitions for
    * exactly-even files at the cost of moving every row once. Returns
    * the target file count. Refuses an empty directory rather than
    * silently writing one file from zero computed bytes. NOTE: a
    * hive-partitioned input is flattened — at lake scale compact each
    * partition directory (the unit ingest appends to), not the root. */
  def compactParquet(spark: SparkSession, inDir: String, outDir: String,
                     targetBytes: Long = 128L * 1024 * 1024,
                     shuffle: Boolean = false): Int = {
    require(targetBytes > 0, "targetBytes must be > 0")
    val total = dataBytes(spark, inDir)
    require(total > 0, s"no part- data files found under $inDir")
    val n = math.max(1L, math.ceil(total.toDouble / targetBytes).toLong).toInt
    val df = spark.read.parquet(inDir)
    val sized = if (shuffle) df.repartition(n) else df.coalesce(n)
    sized.write.mode("overwrite").parquet(outDir)
    n
  }

  /** Write `df` range-partitioned into `n` files and sorted within each
    * on `cols` — every file covers a disjoint slice of the leading
    * column's domain, so its parquet footer min/max admits or prunes the
    * whole file against a range predicate. */
  def writeClustered(df: DataFrame, outDir: String, n: Int,
                     cols: String*): Unit = {
    require(n >= 1 && cols.nonEmpty, "need n >= 1 and at least one column")
    df.repartitionByRange(n, cols.map(col): _*)
      .sortWithinPartitions(cols.map(col): _*)
      .write.mode("overwrite").parquet(outDir)
  }

  /** Write `df` with a parquet BLOOM FILTER on `keyCol` — the layout for
    * POINT lookups on a column the data is NOT sorted by (sorting buys
    * range skipping on one ordering; bloom filters buy equality skipping
    * on any other key for a few bytes per distinct value). The reader
    * consults the filter per row group and skips groups that definitely
    * lack the key — LayoutSpec measures a shuffled-id lookup decoding
    * only the one admitted group. `expectedNdv` sizes the filter (false-
    * positive rate degrades past it; a false positive only costs a
    * wasted decode, never a wrong result). */
  def writeWithBloom(df: DataFrame, outDir: String, keyCol: String,
                     expectedNdv: Long): Unit = {
    require(expectedNdv >= 1, "expectedNdv must be >= 1")
    df.write.mode("overwrite")
      .option(s"parquet.bloom.filter.enabled#$keyCol", "true")
      .option(s"parquet.bloom.filter.expected.ndv#$keyCol",
        expectedNdv.toString)
      .parquet(outDir)
  }

  /** Write `df` Z-ORDERED on TWO integer columns: each column min-max
    * normalizes to 16 bits, the bits interleave into one 32-bit Morton
    * key, and the data range-partitions + sorts on that key — so each
    * file covers a small SQUARE of the (a, b) plane and its footer
    * min/max stays tight on BOTH columns. [[writeClustered]] buys
    * skipping on one ordering and nothing on any other column; z-order
    * splits the skipping budget across two (each predicate prunes
    * ~sqrt of what a dedicated sort would — the standard multi-column
    * layout trade, Delta/Iceberg's OPTIMIZE ZORDER BY).
    *
    * The normalization needs each column's min/max — one 1-row driver
    * aggregate, the model-exchange pattern. Domain widths must fit the
    * scale multiply (`(x-lo) * 65535` in int64: width under ~2^47);
    * ids/hours/sizes all qualify. The Morton key is a pure-integer
    * projection (32 shift/mask terms, codegen'd map-side) and is
    * DROPPED before the write — layout is physical, the schema doesn't
    * change. */
  def writeZOrdered(df: DataFrame, outDir: String, n: Int,
                    colA: String, colB: String): Unit = {
    require(n >= 1, "need n >= 1")
    import org.apache.spark.sql.functions._
    val mm = df.agg(
      min(col(colA)).cast("long"), max(col(colA)).cast("long"),
      min(col(colB)).cast("long"), max(col(colB)).cast("long")).head()
    // empty input makes every min/max null — say so, instead of the
    // misleading "columns must be non-null"
    require(!(0 until 4).forall(mm.isNullAt),
      "z-order input is empty: nothing to lay out")
    require(!mm.anyNull, "z-order columns must be non-null")
    // enforce the documented domain-width bound: (x-lo)*65535 must stay
    // exact in int64, so each column's width must be under ~2^47 —
    // past it the 16-bit normalization silently degrades. Width via
    // BigInt: raw Long subtraction WRAPS for full-range domains (e.g.
    // signed 64-bit hashes, max - min = -1), which would pass the
    // check for exactly the worst inputs
    def width(hi: Long, lo: Long) = BigInt(hi) - BigInt(lo)
    require(width(mm.getLong(1), mm.getLong(0)) < (BigInt(1) << 47) &&
      width(mm.getLong(3), mm.getLong(2)) < (BigInt(1) << 47),
      "z-order column width must be < 2^47 for exact 16-bit normalization")
    // integer DIV, not the double-returning '/': (x-lo)*65535 reaches
    // width*65535, past double's 2^53 exact range for widths over ~2^37,
    // which would put some values one bucket off — DIV keeps the full
    // documented 2^47 width exact
    def norm(c: String, lo: Long, hi: Long) =
      if (hi == lo) lit(0L)
      else expr(s"(cast($c as bigint) - ${lo}L) * 65535L DIV ${hi - lo}L")
    val a = norm(colA, mm.getLong(0), mm.getLong(1)).cast("long")
    val b = norm(colB, mm.getLong(2), mm.getLong(3)).cast("long")
    val z = (0 until 16).map { i =>
      (shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ + _)
    df.withColumn("__z", z)
      .repartitionByRange(n, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(outDir)
  }

  /** Hive-style partitioned layout: rows land in one directory per
    * distinct partition-column tuple (directory names carry the
    * values), so a reader with an equality/IN predicate on those
    * columns prunes at the LISTING — non-matching files are never
    * opened, not even their footers. This is the coarsest, cheapest
    * tier of the skipping ladder (partition dirs > footer min/max
    * [[writeClustered]] > bloom [[writeWithBloom]]): the first line of
    * defense for the one low-cardinality column every query filters
    * on. Keep partition columns dictionary-sized — one directory per
    * distinct tuple, and the small-files pathology past ~10^4
    * partitions ([[compactParquet]]'s NOTE applies per partition
    * directory). */
  def writePartitioned(df: DataFrame, outDir: String,
                       partCols: String*): Unit = {
    require(partCols.nonEmpty, "need at least one partition column")
    df.write.mode("overwrite").partitionBy(partCols: _*).parquet(outDir)
  }
}
