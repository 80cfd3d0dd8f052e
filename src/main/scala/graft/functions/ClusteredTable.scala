package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CLUSTERED TABLE MAINTENANCE — the day-two problem after
  * [[ZorderLayout]] solves day one: new data keeps arriving, and a
  * layout that is only ever written once decays into a pile of
  * unclustered appends that no box predicate can skip. This is the
  * LSM shape every production lakehouse OPTIMIZE implements, reduced
  * to its mechanism on plain parquet:
  *
  *   - `append(df)` lands a delta directory untouched — ingest never
  *     pays a sort or shuffle (at 100 TB the ingest path must be a
  *     straight write; clustering on the hot path would couple ingest
  *     latency to layout quality);
  *   - `optimize()` folds the newest base version + every un-folded
  *     delta into base version K+1 via [[ZorderLayout.write]] (static
  *     z-buckets, z-sorted within each), then records WHICH deltas it
  *     folded in a manifest INSIDE the version directory;
  *   - `read()` returns newest-complete-base ∪ deltas-not-in-its-
  *     manifest: box predicates prune the base through its zfile
  *     partitions + tight footers, and pay full price only on the
  *     (small, recent) unfolded tail — the classic LSM read bill.
  *
  * Crash safety without a transaction log, the MaterializedViewStream
  * discipline: a version is visible only when its `_MANIFEST` exists
  * (written AFTER the parquet `_SUCCESS`), so a crash mid-optimize
  * leaves a torn, invisible version that the next optimize simply
  * overwrites; deltas are never deleted by optimize itself — they
  * become garbage the moment a complete manifest names them, and
  * `vacuum()` reclaims them at leisure. Re-running optimize after any
  * crash point is idempotent: it re-reads the same newest-complete
  * version and the same un-folded delta set, and rewrites the same
  * next version. Readers are never wrong, only (pre-vacuum) redundant
  * on disk, never in results.
  */
object ClusteredTable {

  private def baseRoot(root: String) = new java.io.File(root, "base")
  private def deltaRoot(root: String) = new java.io.File(root, "delta")

  /** Complete base versions (have both parquet _SUCCESS and _MANIFEST),
    * ascending.
    */
  private def versions(root: String): Seq[(Long, java.io.File)] =
    Option(baseRoot(root).listFiles()).getOrElse(Array.empty).toSeq
      .filter(f => f.isDirectory && f.getName.startsWith("v="))
      .filter(f => new java.io.File(f, "_SUCCESS").exists() &&
        new java.io.File(f, "_MANIFEST").exists())
      .map(f => (f.getName.stripPrefix("v=").toLong, f))
      .sortBy(_._1)

  private def manifest(versionDir: java.io.File): Set[String] = {
    val f = new java.io.File(versionDir, "_MANIFEST")
    val src = scala.io.Source.fromFile(f, "UTF-8")
    try src.getLines().filter(_.nonEmpty).toSet finally src.close()
  }

  private def deltaDirs(root: String): Seq[java.io.File] =
    Option(deltaRoot(root).listFiles()).getOrElse(Array.empty).toSeq
      .filter(f => f.isDirectory && f.getName.startsWith("d=") &&
        new java.io.File(f, "_SUCCESS").exists())
      .sortBy(_.getName)

  /** Land one ingest batch as delta `d=<name>` — a plain parquet write,
    * no clustering. `name` must be unique per batch (a batch id, an
    * ingest timestamp); re-writing the same name overwrites, which makes
    * replayed ingest batches idempotent the FsStreamPublisher way.
    */
  def append(df: DataFrame, root: String, name: String): Unit =
    df.write.mode("overwrite")
      .parquet(new java.io.File(deltaRoot(root), s"d=$name").getPath)

  /** Fold newest base + all un-folded deltas into the next z-ordered
    * base version. Returns the new version id (or the current one if
    * there was nothing to fold). Idempotent from any crash point.
    */
  def optimize(s: SparkSession, root: String, d1Col: String, d2Col: String,
      bits: Int, numFiles: Int): Long = {
    val vs = versions(root)
    val current = vs.lastOption
    val folded = current.map { case (_, dir) => manifest(dir) }.getOrElse(Set.empty)
    val pending = deltaDirs(root).filter(d => !folded.contains(d.getName))
    if (pending.isEmpty && current.isDefined) return current.get._1
    val parts = current.map { case (_, dir) =>
        // drop the layout's own columns: the fold recomputes them
        s.read.parquet(dir.getPath).drop("zkey", "zfile")
      }.toSeq ++
      pending.map(d => s.read.parquet(d.getPath))
    val all = parts.reduce(_ unionByName _)
    val next = current.map(_._1 + 1).getOrElse(0L)
    val nextDir = new java.io.File(baseRoot(root), s"v=$next")
    ZorderLayout.write(all, d1Col, d2Col, bits, numFiles, nextDir.getPath)
    // visibility point: the manifest names every delta this version
    // absorbed; written last, atomically (tmp + rename)
    val names = (folded ++ pending.map(_.getName)).toSeq.sorted
    val tmp = new java.io.File(baseRoot(root), s".manifest-$next.tmp")
    val w = new java.io.OutputStreamWriter(
      new java.io.FileOutputStream(tmp), "UTF-8")
    try w.write(names.mkString("\n")) finally w.close()
    val fin = new java.io.File(nextDir, "_MANIFEST")
    if (!tmp.renameTo(fin)) throw new java.io.IOException(s"manifest rename failed: $fin")
    next
  }

  /** Snapshot read: newest complete base ∪ deltas its manifest does not
    * name. The base arrives with its `zfile` partition column (box
    * predicates prune it); deltas get zfile = -1 so the schema lines up
    * and a zfile filter never accidentally excludes unclustered rows.
    *
    * TIME TRAVEL: `asOfVersion = Some(k)` reads "the table as of
    * optimize #k" — base version k's folded content, with NO delta
    * tail. That snapshot is exact, deterministic, and stable forever
    * (a live read's delta tail keeps growing, so including "deltas not
    * in k's manifest" would make the same time-travel call return
    * different answers at different times). Old versions are retained
    * until vacuum, so the travel horizon is the vacuum cadence — the
    * Delta/Iceberg retention contract, on plain parquet.
    */
  def read(s: SparkSession, root: String, asOfVersion: Option[Long] = None): DataFrame = {
    asOfVersion.foreach { v =>
      val dir = versions(root).find(_._1 == v).map(_._2)
        .getOrElse(throw new IllegalArgumentException(
          s"no complete base version v=$v at $root (vacuumed, torn, or never written)"))
      return s.read.parquet(dir.getPath)
    }
    val vs = versions(root)
    val base = vs.lastOption.map { case (_, dir) =>
      s.read.parquet(dir.getPath)
    }
    val folded = vs.lastOption.map { case (_, dir) => manifest(dir) }.getOrElse(Set.empty)
    val pending = deltaDirs(root).filter(d => !folded.contains(d.getName))
    val deltas = pending.map { d =>
      val df = s.read.parquet(d.getPath)
      base match {
        case Some(b) =>
          df.withColumn("zkey", lit(null).cast(b.schema("zkey").dataType))
            .withColumn("zfile", lit(-1).cast(b.schema("zfile").dataType))
        case None => df
      }
    }
    (base.toSeq ++ deltas) match {
      case Seq() => throw new IllegalStateException(s"empty clustered table at $root")
      case parts => parts.reduce(_ unionByName _)
    }
  }

  /** Streaming ingest hand-off: a foreachBatch function landing each
    * micro-batch as delta `d=b<batchId>`. foreachBatch is
    * at-least-once; the batch-id-derived name makes a replayed batch
    * overwrite its own delta (the FsStreamPublisher discipline), so the
    * table never double-ingests. optimize()/vacuum() run out-of-band on
    * whatever cadence the operator chooses — ingest never waits on
    * layout work.
    */
  def sink(root: String): (DataFrame, Long) => Unit =
    (df: DataFrame, batchId: Long) => append(df, root, f"b$batchId%012d")

  /** Reclaim storage made redundant by the newest complete base: deltas
    * its manifest names, and superseded base versions. Safe at any
    * time — readers only ever consult the newest complete version.
    * Returns the number of directories removed.
    */
  def vacuum(root: String): Int = {
    def rmTree(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(rmTree)
      f.delete()
    }
    val vs = versions(root)
    val folded = vs.lastOption.map { case (_, dir) => manifest(dir) }.getOrElse(Set.empty)
    val staleDeltas = deltaDirs(root).filter(d => folded.contains(d.getName))
    val staleBases = vs.dropRight(1).map(_._2)
    (staleDeltas ++ staleBases).foreach(rmTree)
    staleDeltas.size + staleBases.size
  }
}
