package graft.streaming

import org.apache.spark.sql.DataFrame

/** Builders for FINITE multi-batch file-stream sources.
  *
  * Structured Streaming's file source lists new files per trigger and,
  * under `maxFilesPerTrigger=1`, admits them oldest-modification-time
  * first — so a directory of single-file parquet datasets with PINNED
  * mtimes is a deterministic multi-micro-batch source: file k becomes
  * data micro-batch k. That is the fixture shape the multi-batch
  * streaming rows need (d174's SpaceSaving merge, q51's late-data
  * watermark): real state-store merges across a real batch boundary,
  * with arrival order controlled instead of left to directory listing
  * luck. [[StreamRunner.runToBatchChangelog]] / `runToBatchMulti`
  * enforce that the split actually happened.
  */
object FileSource {

  /** Write `df` as exactly ONE parquet file named `name` directly under
    * `dir`, mtime pinned to `mtime`. A normal `df.write.parquet(path)`
    * produces a DIRECTORY of part files plus `_SUCCESS`, which the file
    * stream source would list as several files (batch boundaries then
    * depend on partition count); this stages through `coalesce(1)` and
    * moves the single part file to its final name. The staging dir is
    * dot-prefixed so the source's hidden-file filter (and any
    * `pathGlobFilter=*.parquet`) can never see half-written data.
    */
  def writePinned(df: DataFrame, dir: java.io.File, name: String,
                  mtime: Long): Unit = {
    val staging = new java.io.File(dir, s".stage_$name")
    df.coalesce(1).write.mode("overwrite").parquet(staging.toString)
    val part = staging.listFiles().find(f =>
      f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .getOrElse(sys.error(s"no part file written under $staging"))
    val dst = new java.io.File(dir, name)
    java.nio.file.Files.move(part.toPath, dst.toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    Option(staging.listFiles).foreach(_.foreach(_.delete()))
    staging.delete()
    // a silently unpinned mtime would leave batch order to listing luck
    // — the exact nondeterminism this helper exists to remove
    if (!dst.setLastModified(mtime))
      sys.error(s"could not pin mtime on $dst")
    ()
  }
}
