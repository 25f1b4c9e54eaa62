package graft.sources

import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}

/** Recursive file listing that picks the right primitive per filesystem.
  *
  * `FileSystem.listFiles(path, recursive = true)` materializes a
  * `LocatedFileStatus` per file, and on the LOCAL filesystem that costs
  * ~6 ms/file (block-location + checksum plumbing): measured 1024 files
  * in 5.5–6.0 s, vs 0.04 s for a plain `listStatus` stack walk — a 150×
  * pathology that turned SegmentCompaction's marker commit and recovery
  * into multi-second pauses on a many-file local store (`ScaleProbe
  * compaction_recovery`). On HDFS the recursive listing is a batched
  * server-side iterator and on S3A it is a flat prefix LIST
  * (O(files/page) requests vs the walk's O(directories)), so those KEEP
  * `listFiles`. Everything here is metadata-only; no data bytes move.
  */
object FsWalk {

  /** Every file under `root` (depth-first; empty if `root` is missing). */
  def files(fs: FileSystem, root: Path): Seq[FileStatus] = {
    if (!fs.exists(root)) return Seq.empty
    if (Option(fs.getUri.getScheme).forall(_ == "file")) {
      val out = Seq.newBuilder[FileStatus]
      val stack = scala.collection.mutable.Stack[Path](root)
      while (stack.nonEmpty) {
        fs.listStatus(stack.pop()).foreach { s =>
          if (s.isDirectory) stack.push(s.getPath) else out += s
        }
      }
      out.result()
    } else {
      val it = fs.listFiles(root, true)
      val out = Seq.newBuilder[FileStatus]
      while (it.hasNext) out += it.next()
      out.result()
    }
  }
}
