package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The persisted dedup index for incremental ingest
  * ([[Dedup.incrementalDedup]]): the corpus's exact md5 fingerprint table
  * plus its MinHash LSH band table, built ONCE at corpus-build time and
  * appended per accepted shard. This is the artifact contract that makes
  * 100 TB ingest work — each arriving shard is screened by scanning only
  * ITSELF plus two hash joins against these tables; the corpus text is
  * never re-read.
  *
  * The sketch parameters (shingle n, numHashes, bandSize) are part of the
  * artifact: a probe must use the SAME values the index was built with, so
  * they travel through [[CorpusIndex.build]] / [[CorpusIndex.merged]]
  * rather than being re-supplied at probe time.
  */
final case class CorpusIndex(fingerprints: DataFrame, bands: DataFrame,
                             n: Int, numHashes: Int, bandSize: Int) {

  /** Persist both tables under `path` (parquet dirs `fingerprints/` and
    * `bands/`); reload with [[CorpusIndex.read]]. Sketch params are
    * encoded in the bands path so a mismatched probe fails loudly. */
  def write(path: String): Unit = {
    fingerprints.write.mode("overwrite").parquet(s"$path/fingerprints")
    bands.write.mode("overwrite")
      .parquet(s"$path/bands_n${n}_h${numHashes}_b$bandSize")
  }

  /** The accept step of the ingest loop: a new index with `docs` (the
    * shard rows that passed screening) merged in. Fingerprints stay
    * distinct; bands union by name. */
  def merged(docs: DataFrame, idCol: String, textCol: String): CorpusIndex =
    CorpusIndex(
      fingerprints.union(Dedup.corpusFingerprints(docs, textCol)).distinct(),
      bands.unionByName(
        Dedup.minhashBandsFromDocs(docs, idCol, textCol, n, numHashes,
          bandSize)),
      n, numHashes, bandSize)
}

object CorpusIndex {

  /** Build the index from a corpus — one scan of the text, both sketch
    * tables fully map-side until their final distinct/band aggs. */
  def build(docs: DataFrame, idCol: String, textCol: String,
            n: Int = 3, numHashes: Int = 8, bandSize: Int = 2): CorpusIndex =
    CorpusIndex(
      Dedup.corpusFingerprints(docs, textCol),
      Dedup.minhashBandsFromDocs(docs, idCol, textCol, n, numHashes,
        bandSize),
      n, numHashes, bandSize)

  /** Reload a persisted index. The sketch params are recovered from the
    * bands directory name [[CorpusIndex.write]] encoded. Discovery goes
    * through the Hadoop FileSystem of `path` itself — the index lives on
    * whatever (shared) filesystem [[CorpusIndex.write]] targeted, and a
    * driver-local `java.io.File` listing would see nothing for an
    * `hdfs://`/`s3://` index. */
  def read(spark: SparkSession, path: String): CorpusIndex = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dirs =
      if (fs.exists(root)) fs.listStatus(root)
      else Array.empty[org.apache.hadoop.fs.FileStatus]
    val bandsDir = dirs.toSeq
      .map(_.getPath.getName).filter(_.startsWith("bands_"))
      .sorted.headOption.getOrElse(
        sys.error(s"no bands_n*_h*_b* directory under $path"))
    val m = "bands_n(\\d+)_h(\\d+)_b(\\d+)".r
    bandsDir match {
      case m(n, h, b) =>
        CorpusIndex(
          spark.read.parquet(s"$path/fingerprints"),
          spark.read.parquet(s"$path/$bandsDir"),
          n.toInt, h.toInt, b.toInt)
      case _ => sys.error(s"unparseable bands directory name: $bandsDir")
    }
  }
}
