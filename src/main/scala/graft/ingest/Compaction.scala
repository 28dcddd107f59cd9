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
    * into files of ~`targetFileBytes`. No-op when already compact. */
  def compactLeaf(spark: SparkSession, dir: String,
                  targetFileBytes: Long = 128L * 1024 * 1024): CompactionStats = {
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
    spark.read.parquet(dir).repartition(want)
      .write.mode("overwrite").parquet(tmp.toString)
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
                         targetFileBytes: Long = 128L * 1024 * 1024): Seq[CompactionStats] = {
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sessionState.newHadoopConf())

    def leaves(p: Path): Seq[Path] = {
      val entries = fs.listStatus(p)
      val dirs = entries.filter(_.isDirectory).map(_.getPath)
        .filterNot(_.getName.startsWith("."))
      val hasParquet = entries.exists(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      (if (hasParquet) Seq(p) else Seq.empty) ++ dirs.flatMap(leaves)
    }
    leaves(rootPath).map(p => compactLeaf(spark, p.toString, targetFileBytes))
  }
}
