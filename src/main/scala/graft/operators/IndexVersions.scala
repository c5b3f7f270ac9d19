package graft.operators

import org.apache.hadoop.fs.{FileContext, FileSystem, Options, Path}
import org.apache.spark.sql.SparkSession

/** Versioned publication for on-disk indexes (SURVEY G11/H18, r9).
  *
  * The r8 maintenance operations swapped live directories in place
  * (delete + rename), which is safe only inside a single-writer
  * maintenance window — a search that listed files mid-swap could read
  * a half-deleted tree. This helper gives every rewriting maintenance
  * op the LSM publication discipline instead:
  *
  *   - each rebuild/compaction writes a complete NEW versioned
  *     directory (`cells.v3/`, `postings.v2/`, ...) next to the live
  *     one, touching nothing a reader could be using;
  *   - a tiny `CURRENT` pointer file names the published version, and
  *     flipping it is one ATOMIC overwrite-rename (FileContext rename
  *     with Options.Rename.OVERWRITE — POSIX-atomic locally, atomic on
  *     HDFS);
  *   - `open()` resolves through `CURRENT` and PINS the resolved path,
  *     so an open index keeps serving its snapshot even while a newer
  *     version is being written or published;
  *   - a crash anywhere before the flip leaves `CURRENT` — and
  *     therefore every reader — on the old version; the partial new
  *     directory is overwritten by the next attempt;
  *   - old versions are reclaimed only by an explicit vacuum in a
  *     maintenance window, never by publication itself.
  *
  * Legacy layouts (an unversioned `cells/` from an r7/r8 build, with
  * no `CURRENT`) resolve as version 0 at the unversioned path, so
  * existing indexes keep opening.
  */
private[graft] object IndexVersions {

  private def fileSystem(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())

  /** The published version, if a readable CURRENT pointer exists. */
  def current(spark: SparkSession, dir: String): Option[Long] = {
    val fs = fileSystem(spark, dir)
    val p = new Path(s"$dir/CURRENT")
    if (!fs.exists(p)) None
    else scala.util.Try {
      val in = fs.open(p)
      try {
        val out = new java.io.ByteArrayOutputStream()
        org.apache.hadoop.io.IOUtils.copyBytes(in, out, 4096, false)
        new String(out.toByteArray, "UTF-8").trim.toLong
      } finally in.close()
    }.toOption
  }

  /** Resolve the live data directory for `base` ("cells", "postings"):
    * CURRENT wins; an unversioned legacy directory resolves as
    * version 0; otherwise the highest complete-looking version on disk
    * (a CURRENT lost to manual surgery); a fresh dir resolves to the
    * legacy path, which the caller's read will then fail on loudly.
    */
  def resolve(spark: SparkSession, dir: String, base: String): (String, Long) =
    current(spark, dir) match {
      case Some(v) => (s"$dir/$base.v$v", v)
      case None =>
        val fs = fileSystem(spark, dir)
        if (fs.exists(new Path(s"$dir/$base"))) (s"$dir/$base", 0L)
        else {
          val vs =
            if (!fs.exists(new Path(dir))) Seq.empty[Long]
            else fs.listStatus(new Path(dir)).toSeq
              .map(_.getPath.getName)
              .filter(_.startsWith(s"$base.v"))
              .flatMap(n => scala.util.Try(
                n.stripPrefix(s"$base.v").toLong).toOption)
          if (vs.nonEmpty) (s"$dir/$base.v${vs.max}", vs.max)
          else (s"$dir/$base", 0L)
        }
    }

  /** Atomically flip CURRENT to `v` (write-tmp + overwrite-rename). */
  def publish(spark: SparkSession, dir: String, v: Long): Unit =
    atomicWrite(spark, dir, "CURRENT", v)

  private def atomicWrite(spark: SparkSession, dir: String,
                          name: String, v: Long): Unit = {
    val fs = fileSystem(spark, dir)
    val tmp = new Path(s"$dir/$name.tmp")
    val cur = new Path(s"$dir/$name")
    val out = fs.create(tmp, true)
    try out.write(v.toString.getBytes("UTF-8")) finally out.close()
    val fc = FileContext.getFileContext(new Path(dir).toUri,
      spark.sessionState.newHadoopConf())
    fc.rename(tmp, cur, Options.Rename.OVERWRITE)
  }

  /** The SAME-VERSION mutation counter: CURRENT only moves on a
    * publish (rebuild/compaction/retrain), but append/upsert/delete/
    * tombstone ops mutate the live version's directories WITHOUT a
    * flip — a watcher keyed to CURRENT alone would keep serving the
    * pre-mutation file listing forever (r11 ADVICE). Every in-version
    * mutator bumps this tiny `GEN` file (same atomic overwrite-rename
    * as CURRENT), so (CURRENT, GEN) together fingerprint everything
    * that can change what a search reads. Absent on indexes that were
    * never mutated in-version — fingerprints as None, which still
    * transitions to Some on the first bump.
    */
  def generation(spark: SparkSession, dir: String): Option[Long] = {
    val fs = fileSystem(spark, dir)
    val p = new Path(s"$dir/GEN")
    if (!fs.exists(p)) None
    else scala.util.Try {
      val in = fs.open(p)
      try {
        val out = new java.io.ByteArrayOutputStream()
        org.apache.hadoop.io.IOUtils.copyBytes(in, out, 4096, false)
        new String(out.toByteArray, "UTF-8").trim.toLong
      } finally in.close()
    }.toOption
  }

  /** Bump the mutation counter — call at the END of any op that
    * changes the live version's data without flipping CURRENT.
    * Maintenance is single-writer by contract (the same sanction the
    * mutations themselves rely on), so read-inc-write needs no CAS.
    */
  def bumpGeneration(spark: SparkSession, dir: String): Unit =
    atomicWrite(spark, dir, "GEN", generation(spark, dir).getOrElse(0L) + 1L)

  /** Reclaim every version of `base` (and its `alsoBases` side
    * relations, e.g. tombstones) other than `keep`, plus the legacy
    * unversioned directories when a versioned one is live. Maintenance
    * window only: a reader pinned to an older version loses its files.
    */
  def vacuum(spark: SparkSession, dir: String, keep: Long,
             bases: Seq[String]): Unit = {
    val fs = fileSystem(spark, dir)
    if (!fs.exists(new Path(dir))) return
    fs.listStatus(new Path(dir)).foreach { st =>
      val n = st.getPath.getName
      val drop = bases.exists { b =>
        (n == b && keep > 0L) ||
        (n.startsWith(s"$b.v") &&
          scala.util.Try(n.stripPrefix(s"$b.v").toLong).toOption
            .exists(_ != keep))
      }
      if (drop) fs.delete(st.getPath, true)
    }
  }
}
