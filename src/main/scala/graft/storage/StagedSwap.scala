package graft.storage

import org.apache.hadoop.fs.{FileSystem, Path}

/** File-level staged swap of one `date=` partition (r16).
  *
  * The r15 staged compactions committed by swapping whole partition
  * DIRECTORIES (move live aside, move staged in), which forced the
  * rewrite to run inside the write lock: any file appended to the live
  * partition after the rewrite's snapshot would be silently dropped by
  * the directory swap. This protocol commits at FILE granularity
  * against an explicit snapshot — the exact files the rewrite read —
  * so the rewrite can run on a background thread while appends keep
  * landing: post-snapshot files are simply never touched by the
  * commit. This is the reference's background-compactor contract
  * (`tsdb/db.go:54-70` run loop driving `compact.go:128-332`): the
  * head keeps appending while a block compaction rewrites only the
  * source blocks it planned over.
  *
  * Layout for a root `R` and date `D` (all underscore-prefixed, so the
  * table's own file index never lists them):
  *
  *   R/_compacting-D   staged rewrite output (written by the
  *                          caller; a `date=D` subdir or flat files)
  *   R/_swapout-D      snapshot files moved aside mid-commit
  *   R/_swapout-D/_swapped_in
  *                          marker: every snapshot file is aside and
  *                          move-in has begun
  *
  * Commit sequence (metadata-only, so callers can hold it under a
  * brief reader quiesce):
  *   1. move every snapshot file from the live partition into the
  *      swapout dir;
  *   2. create the `_swapped_in` marker;
  *   3. move every staged file into the live partition (Spark part
  *      file names carry a per-job UUID, so they cannot collide with
  *      files appended post-snapshot);
  *   4. drop the swapout and staging dirs.
  *
  * Crash recovery ([[recover]], idempotent, run once at boot) keys on
  * the marker: absent → the crash fell inside step 1 and NO staged
  * file is live yet, so restoring the swapout files rolls the
  * partition back to its exact pre-commit state (post-snapshot appends
  * included — they never left); present → every snapshot file is
  * aside, so rolling FORWARD (finish step 3 from the staging dir,
  * which still holds every not-yet-moved file under its committed
  * name) yields the exact post-commit state. Either way the cost is a
  * directory of renames — never a rebuild-from-source heal.
  *
  * Readers: the commit window is the only moment a query planning
  * against a stale listing can miss the partition's rows (the r15
  * advisor's silent-miss note) — the serving write path therefore
  * holds the commit under a short admission-gate quiesce and swaps a
  * fresh engine in immediately after; a drain timeout falls back to
  * committing anyway (bounded staleness beats an unboundedly deferred
  * compaction). Standalone callers (specs, tools) are single-process
  * single-reader and take the documented exposure.
  */
object StagedSwap {

  def stagingDir(root: Path, date: String): Path =
    new Path(root, s"_compacting-$date")

  def swapoutDir(root: Path, date: String): Path =
    new Path(root, s"_swapout-$date")

  def livePartition(root: Path, date: String): Path =
    new Path(root, s"date=$date")

  private def marker(swapout: Path): Path = new Path(swapout, "_swapped_in")

  private def parquetFiles(fs: FileSystem, dir: Path): Seq[Path] =
    if (!fs.exists(dir)) Nil
    else fs.listStatus(dir)
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      .map(_.getPath).toSeq

  /** The live partition's current parquet files — the set a rewrite
    * must read and the ONLY set [[commit]] will remove. */
  def snapshot(fs: FileSystem, root: Path, date: String): Seq[Path] =
    parquetFiles(fs, livePartition(root, date))

  /** Where the staged files landed: a partitioned write puts them
    * under `date=D` inside the staging dir, a flat write at its
    * top level. */
  private def stagedPartition(fs: FileSystem, root: Path,
      date: String): Path = {
    val s = stagingDir(root, date)
    val sub = new Path(s, s"date=$date")
    if (fs.exists(sub)) sub else s
  }

  /** Swap the staged rewrite in for exactly `snapshot`'s files.
    * Returns false — with the staging dir cleaned up and the live
    * partition untouched — when the preconditions no longer hold:
    * the staging dir is empty (a concurrent full-tier heal rebuilt
    * the store out from under the rewrite) or a snapshot file is
    * gone (the partition itself was rebuilt). Both mean the rewrite
    * is stale and must be abandoned, never half-applied. */
  def commit(fs: FileSystem, root: Path, date: String,
      snapshot: Seq[Path]): Boolean = {
    val staged = parquetFiles(fs, stagedPartition(fs, root, date))
    if (staged.isEmpty || snapshot.exists(f => !fs.exists(f))) {
      abort(fs, root, date)
      return false
    }
    val live = livePartition(root, date)
    val swapout = swapoutDir(root, date)
    fs.delete(swapout, true)
    fs.mkdirs(swapout)
    snapshot.foreach { f =>
      if (!fs.rename(f, new Path(swapout, f.getName)))
        throw new java.io.IOException(
          s"StagedSwap.commit: move-aside $f failed")
    }
    fs.create(marker(swapout), true).close()
    staged.foreach { g =>
      if (!fs.rename(g, new Path(live, g.getName)))
        throw new java.io.IOException(
          s"StagedSwap.commit: move-in $g failed")
    }
    fs.delete(swapout, true)
    fs.delete(stagingDir(root, date), true)
    true
  }

  /** Drop a staged rewrite that will not be committed. */
  def abort(fs: FileSystem, root: Path, date: String): Unit = {
    fs.delete(stagingDir(root, date), true)
    ()
  }

  /** Heal every interrupted swap under `root` (see the class doc for
    * the two windows); then drop any orphaned staging dirs (a crash
    * before the commit started — the rewrite output is disposable).
    * Idempotent; call once per boot before anything reads the table. */
  def recover(fs: FileSystem, root: Path): Unit = {
    if (!fs.exists(root)) return
    fs.listStatus(root)
      .filter(_.getPath.getName.startsWith("_swapout-"))
      .foreach { sw =>
        val date = sw.getPath.getName.stripPrefix("_swapout-")
        val live = livePartition(root, date)
        fs.mkdirs(live)
        if (fs.exists(marker(sw.getPath))) {
          // roll forward: the snapshot is fully aside; finish the
          // move-in from staging (skipping files a pre-crash step 3
          // already placed), then drop the aside copies
          parquetFiles(fs, stagedPartition(fs, root, date)).foreach { g =>
            val dest = new Path(live, g.getName)
            if (fs.exists(dest)) fs.delete(g, false)
            else if (!fs.rename(g, dest))
              throw new java.io.IOException(
                s"StagedSwap.recover: roll-forward $g failed")
          }
        } else {
          // roll back: no staged file went live; restore the aside
          // snapshot files (post-snapshot appends never moved)
          parquetFiles(fs, sw.getPath).foreach { f =>
            val dest = new Path(live, f.getName)
            if (!fs.exists(dest) && !fs.rename(f, dest))
              throw new java.io.IOException(
                s"StagedSwap.recover: roll-back $f failed")
          }
        }
        fs.delete(sw.getPath, true)
        fs.delete(stagingDir(root, date), true)
      }
    fs.listStatus(root)
      .filter(_.getPath.getName.startsWith("_compacting-"))
      .foreach(s => fs.delete(s.getPath, true))
  }
}

/** Per-date geometric-compaction watermarks, persisted beside the data
  * (r16). The r15 doubling gates kept `last compacted bytes` per date
  * in server memory only, so a restart saw `2 × 0` and mass-compacted
  * every over-threshold date inline on its first write. One small
  * underscore file per tier root (`date=bytes` lines, rewritten whole
  * on each compaction — compactions are geometric, so writes are rare
  * and the file is one line per retained date) makes the cadence
  * restart-stable; a torn or missing file degrades to the old
  * behavior: one early compaction, then the doubling resumes. */
object CompactionWatermarks {

  private def file(root: Path): Path = new Path(root, "_compact_watermarks")

  def load(fs: FileSystem, root: Path)
      : scala.collection.mutable.Map[String, Long] = {
    val m = scala.collection.mutable.Map.empty[String, Long]
    val p = file(root)
    scala.util.Try {
      if (fs.exists(p)) {
        val in = fs.open(p)
        val text =
          try new String(in.readAllBytes(),
            java.nio.charset.StandardCharsets.UTF_8)
          finally in.close()
        text.linesIterator.filter(_.contains("=")).foreach { line =>
          val i = line.lastIndexOf('=')
          scala.util.Try(line.substring(i + 1).trim.toLong)
            .foreach(b => m(line.substring(0, i)) = b)
        }
      }
    }
    m
  }

  def save(fs: FileSystem, root: Path,
      m: scala.collection.Map[String, Long]): Unit = {
    val out = fs.create(file(root), true)
    try out.write(m.toSeq.sortBy(_._1)
      .map { case (d, b) => s"$d=$b\n" }.mkString
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }
}
