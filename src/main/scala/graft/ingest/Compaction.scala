package graft.ingest

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Small-file compaction for streaming-ingest output: frequent flushes
  * (short trigger intervals × many writer tasks) leave parquet leaves
  * full of KB-scale files, and at 100 TB the resulting footer/open
  * overhead dominates scan time. `compactLeaf` rewrites one directory
  * into ⌈bytes / targetFileBytes⌉ files; `compactPartitioned` walks a
  * hive-style layout (the `y=/m=/d=/h=` ingest tree) and compacts every
  * leaf, skipping leaves already at or under the target file count.
  *
  * The rewrite goes to a sibling temp dir, then swaps via delete+rename
  * — crash-safe in the sense that the data always exists in at least
  * one of the two locations, but NOT atomic for concurrent readers;
  * run it on closed partitions (older than the ingest watermark), which
  * is the standard operating procedure for layout maintenance without a
  * table format.
  */
object Compaction {

  final case class CompactionStats(dir: String, filesBefore: Int, filesAfter: Int,
                                   bytes: Long, compacted: Boolean)

  val FilesCompacted = "ingestor_compaction_files_removed_total"

  private def parquetFiles(fs: FileSystem, dir: Path) =
    fs.listStatus(dir).filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))

  /** Rewrites the parquet files directly under `dir` (non-recursive)
    * into files of ~`targetFileBytes`. No-op when already compact.
    *
    * `sortBy` preserves a CLUSTERED layout through the rewrite: the
    * default round-robin `repartition` scatters rows arbitrarily, which
    * is fine for the time-partitioned ingest tree (files within a
    * y/m/d/h leaf carry no intra-leaf order contract) but DESTROYS a
    * z-ordered or range-sorted table's min/max locality — every output
    * file would span the whole key range and parquet stats stop
    * skipping (measured 10.4×→1.0× at sf1, ZorderSf1Probe). Passing the
    * cluster key (e.g. the persisted z-key column) rewrites via
    * range-repartition + within-partition sort instead, so compacted
    * files keep disjoint key ranges at one extra shuffle's cost —
    * identical asymptotics, the standard OPTIMIZE-style maintenance
    * rewrite.
    */
  def compactLeaf(spark: SparkSession, dir: String,
                  targetFileBytes: Long = 128L * 1024 * 1024,
                  sortBy: Seq[String] = Nil): CompactionStats = {
    require(targetFileBytes > 0)
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    val files = parquetFiles(fs, path)
    val bytes = files.map(_.getLen).sum
    val want = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    if (files.length <= want)
      return CompactionStats(dir, files.length, files.length, bytes, compacted = false)

    val tmp = new Path(path.getParent, s".compact-tmp-${path.getName}")
    fs.delete(tmp, true)
    val reread = spark.read.parquet(dir)
    val rewritten =
      if (sortBy.isEmpty) reread.repartition(want)
      else {
        import org.apache.spark.sql.functions.col
        reread.repartitionByRange(want, sortBy.map(col): _*)
          .sortWithinPartitions(sortBy.map(col): _*)
      }
    rewritten.write.mode("overwrite").parquet(tmp.toString)
    // swap: remove originals, move rewritten files in, drop the temp dir
    files.foreach(f => fs.delete(f.getPath, false))
    parquetFiles(fs, tmp).foreach { f =>
      fs.rename(f.getPath, new Path(path, f.getPath.getName))
    }
    fs.delete(tmp, true)
    val after = parquetFiles(fs, path).length
    IngestMetrics.inc(FilesCompacted, (files.length - after).toLong)
    CompactionStats(dir, files.length, after, bytes, compacted = true)
  }

  /** Compacts every leaf directory under `root` that directly contains
    * parquet files (hive-style partition tree). Returns per-leaf stats.
    */
  def compactPartitioned(spark: SparkSession, root: String,
                         targetFileBytes: Long = 128L * 1024 * 1024,
                         sortBy: Seq[String] = Nil): Seq[CompactionStats] = {
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sessionState.newHadoopConf())

    def leaves(p: Path): Seq[Path] = {
      val entries = fs.listStatus(p)
      val dirs = entries.filter(_.isDirectory).map(_.getPath)
        .filterNot(_.getName.startsWith("."))
      val hasParquet = entries.exists(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      (if (hasParquet) Seq(p) else Seq.empty) ++ dirs.flatMap(leaves)
    }
    leaves(rootPath).map(p => compactLeaf(spark, p.toString, targetFileBytes, sortBy))
  }
}
