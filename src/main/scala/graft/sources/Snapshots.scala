package graft.sources

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned snapshot commits over plain parquet (EXT — the ACID
  * primitive behind Delta/Iceberg, surfaced as a library op): writers
  * stage immutable data files, then PUBLISH atomically by moving a
  * manifest (the file list) into `_manifests/v<N>.list`. Readers resolve
  * a manifest and read exactly its files, so they see every committed
  * snapshot fully or not at all — snapshot isolation — and any retained
  * older version stays readable (time travel) since published files are
  * never mutated.
  *
  * Commit protocol, local-filesystem edition:
  *  - data files land under `data/<uuid>/` (stage dir named by writer —
  *    never reused, so a crashed writer leaves only invisible garbage);
  *  - the manifest is written to a temp name and hard-LINKED to
  *    `v<N>.list`; link(2) fails with EEXIST if vN exists, which IS the
  *    optimistic concurrency check — the loser re-reads the latest
  *    version and retries (same contract as a table format's
  *    conditional log append; on an object store this becomes a
  *    put-if-absent). NOT a rename: POSIX rename(2) silently replaces
  *    an existing target, which turns "conditional" into
  *    last-writer-wins.
  *
  * The driver-side state is manifest-sized (#files), the table-format
  * log-replay bound, same as [[Manifest]]. Scoped to one writer process
  * per JVM-visible filesystem; cross-datacenter coordination is a
  * catalog's job, not a file protocol's.
  */
object Snapshots {

  private val ManifestDir = "_manifests"

  private def manifestDir(root: String): Path = {
    val p = Paths.get(root, ManifestDir)
    Files.createDirectories(p)
    p
  }

  /** Branch manifest namespace: `<root>/_manifests/branches/<name>/`.
    * Branches share the root's `data/` pool (manifests hold
    * root-relative paths), so branching never copies data — the
    * Iceberg/Nessie layout. */
  private def branchPath(root: String, branch: String): Path = {
    require(branch.nonEmpty && branch.forall(c =>
      c.isLetterOrDigit || c == '-' || c == '_'),
      s"branch names are [A-Za-z0-9_-], got '$branch'")
    Paths.get(root, ManifestDir, "branches", branch)
  }

  /** Creating accessor — ONLY [[createBranch]] may mint the directory. */
  private def branchDir(root: String, branch: String): Path = {
    val p = branchPath(root, branch)
    Files.createDirectories(p)
    p
  }

  /** Non-creating resolver for every read/append/drop entry point: a
    * lookup of a branch that was never created must throw, not leave a
    * stray empty directory under `_manifests/branches/` that [[vacuum]]
    * then scans forever (the side-effect-free read discipline). */
  private def branchDirExisting(root: String, branch: String): Path = {
    val p = branchPath(root, branch)
    if (!Files.isDirectory(p) || !Files.exists(p.resolve("base")))
      throw new IllegalArgumentException(
        s"branch '$branch' does not exist at $root")
    p
  }

  private def versionOf(p: Path): Option[Long] = {
    val n = p.getFileName.toString
    if (n.startsWith("v") && n.endsWith(".list"))
      n.stripPrefix("v").stripSuffix(".list").toLongOption
    else None
  }

  /** Directory listing with the stream CLOSED (Files.list holds an fd
    * open until closed — commit retry loops and bench reruns would
    * otherwise accumulate handles for the JVM's lifetime). */
  private def listDir(p: Path): Seq[Path] = {
    val s = Files.list(p)
    try s.iterator().asScala.toSeq finally s.close()
  }

  /** All published versions, ascending — manifest-listing-sized driver
    * state, the same bound as [[latestVersion]]. */
  def versions(root: String): Seq[Long] =
    listDir(manifestDir(root)).flatMap(versionOf).sorted

  /** Highest published version, if any commit exists. */
  def latestVersion(root: String): Option[Long] = {
    val vs = listDir(manifestDir(root)).flatMap(versionOf)
    if (vs.isEmpty) None else Some(vs.max)
  }

  private def filesOf(root: String, v: Long): Seq[String] =
    Files.readAllLines(manifestDir(root).resolve(s"v$v.list")).asScala
      .toSeq.filter(_.nonEmpty)

  /** Rebase-aware atomic publication — the ONE optimistic-concurrency
    * loop every commit flavor shares. Each attempt re-resolves the
    * CURRENT latest manifest, derives the new file list from it via
    * `rebase(latestFiles)`, and link(2)s onto exactly latest+1; a
    * lost race (v already taken) loops, so the rebase closure always
    * sees the files it is racing against. This is what makes commit
    * semantics (append keeps concurrent appends, delete re-probes
    * concurrently appended files) hold under contention — a retry that
    * only bumped the version number would publish a manifest derived
    * from a stale base, silently dropping the winner's files (the
    * round-5 commitClustered(append) lost-update bug).
    *
    * `rebase` may be called multiple times and must be idempotent over
    * already-processed files. */
  private def latestVersionAt(dir: Path): Option[Long] = {
    val vs = listDir(dir).flatMap(versionOf)
    if (vs.isEmpty) None else Some(vs.max)
  }

  private def filesAt(dir: Path, v: Long): Seq[String] =
    Files.readAllLines(dir.resolve(s"v$v.list")).asScala
      .toSeq.filter(_.nonEmpty)

  private def publishRebased(root: String)
      (rebase: Seq[String] => Seq[String]): Long =
    publishRebasedAt(manifestDir(root))(rebase)

  private def publishRebasedAt(dir: Path)
      (rebase: Seq[String] => Seq[String]): Long = {
    while (true) {
      val base = latestVersionAt(dir)
      val files = rebase(base.map(filesAt(dir, _)).getOrElse(Nil))
      require(files.nonEmpty, "refusing to publish an empty manifest")
      val v = base.getOrElse(0L) + 1
      val tmp = Files.createTempFile(dir, s".v$v-", ".tmp")
      Files.write(tmp, files.mkString("\n").getBytes("UTF-8"))
      // put-if-absent via hard link, NOT ATOMIC_MOVE: on POSIX a move is
      // rename(2), which silently REPLACES an existing target — the
      // round-5 protocol's FileAlreadyExistsException was unreachable,
      // making every "conditional" publication last-writer-wins (a real
      // race overwrote the winner's manifest; round-6's interleaving
      // spec caught it). link(2) fails with EEXIST, which is the
      // conditional create this protocol needs; the linked content is
      // already fully written, so readers never see a torn manifest. On
      // an object store this becomes a genuine put-if-absent.
      try {
        Files.createLink(dir.resolve(s"v$v.list"), tmp)
        Files.deleteIfExists(tmp)
        return v
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          Files.deleteIfExists(tmp) // lost the race: rebase and retry
      }
    }
    -1L // unreachable
  }

  /** Publication for commits whose file list does not depend on the
    * previous version (plain [[commit]] / non-append clustered). */
  private def publish(root: String, files: Seq[String]): Long =
    publishRebased(root)(_ => files)

  /** Stage `df` under a fresh uuid dir and return its relative file
    * list (sorted). */
  private def stageData(df: DataFrame, root: String): Seq[String] = {
    val stage = s"data/${java.util.UUID.randomUUID()}"
    df.write.parquet(s"$root/$stage")
    listDir(Paths.get(root, stage))
      .map(_.getFileName.toString)
      .filter(n => n.endsWith(".parquet") && !n.startsWith("."))
      .map(n => s"$stage/$n").sorted
  }

  /** Commit `df` as the next version of the table at `root`; returns the
    * published version number. Data is staged under a fresh uuid dir
    * first; publication is the single conditional manifest link. */
  def commit(df: DataFrame, root: String): Long = {
    val files = stageData(df, root)
    require(files.nonEmpty, "refusing to commit an empty snapshot")
    publish(root, files)
  }

  /** Commit `df` range-clustered on LONG column `statCol` into `nFiles`
    * files WITH a per-file [min,max,rows] stats sidecar (`_stats` inside
    * the stage dir — stats are a property of the immutable FILES, so
    * they travel with the stage and survive being carried by reference
    * through appends/deletes). This is the missing half that turns the
    * snapshot protocol into a miniature table format: versioned atomic
    * commits AND stats-based file skipping ([[readBand]]) from the same
    * manifests — what [[Manifest]] does for a static dir, now
    * transactional and incremental. Set `append` to carry the previous
    * version's files (each stage keeps its own sidecar, so a version's
    * stats resolve per-stage). */
  def commitClustered(spark: SparkSession, df: DataFrame, root: String,
      statCol: String, nFiles: Int, append: Boolean = false): Long = {
    require(df.schema(statCol).dataType ==
      org.apache.spark.sql.types.LongType,
      s"stat column $statCol must be LONG (convert timestamps via unix_micros first)")
    val clustered = df.repartitionByRange(nFiles,
      org.apache.spark.sql.functions.col(statCol))
    val files = stageData(clustered, root)
    require(files.nonEmpty, "refusing to commit an empty snapshot")
    val stageDir = files.head.split("/").take(2).mkString("/")
    // one pruned scan of the staged files -> #files stats rows
    import org.apache.spark.sql.functions.{col => c, count, input_file_name, lit, max, min}
    val stats = spark.read.parquet(s"$root/$stageDir")
      .groupBy(input_file_name().as("f"))
      .agg(min(c(statCol)).as("mn"), max(c(statCol)).as("mx"),
        count(lit(1)).as("n"))
      .collect()
      .map { r =>
        val rel = r.getString(0).replaceFirst("^file:/*", "/")
        s"${Paths.get(rel).getFileName}\t${r.getLong(1)}\t${r.getLong(2)}\t${r.getLong(3)}"
      }.sorted
    Files.write(Paths.get(root, stageDir, "_stats"),
      stats.mkString("\n").getBytes("UTF-8"))
    if (!append) publish(root, files)
    // append rides the rebase loop: the previous file list is resolved
    // INSIDE each attempt, so losing a race to a concurrent commit
    // re-reads the winner's manifest instead of dropping its files
    else publishRebased(root)(prev => prev ++ files)
  }

  /** Band read `statCol ∈ [lo, hi)` through a version's per-stage stats
    * sidecars: plan a scan over ONLY the files whose [min,max]
    * intersects, residual filter on top — exact result
    * ([[Manifest.prunedBandRead]]'s contract) with snapshot isolation
    * and time travel. Files from stages without a sidecar (plain
    * [[commit]]/[[commitAppend]]) are conservatively always read. */
  def readBand(spark: SparkSession, root: String, statCol: String,
      lo: Long, hi: Long, asOf: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.functions.{col => c}
    val v = asOf.orElse(latestVersion(root)).getOrElse(
      throw new IllegalArgumentException(s"no committed snapshot at $root"))
    val all = Files.readAllLines(manifestDir(root).resolve(s"v$v.list"))
      .asScala.toSeq.filter(_.nonEmpty)
    val byStage = all.groupBy(f => f.split("/").take(2).mkString("/"))
    val keep = byStage.toSeq.flatMap { case (stage, files) =>
      val sidecar = Paths.get(root, stage, "_stats")
      if (!Files.exists(sidecar)) files
      else {
        val ranges = Files.readAllLines(sidecar).asScala.map { line =>
          val p = line.split("\t")
          p(0) -> (p(1).toLong, p(2).toLong)
        }.toMap
        files.filter { f =>
          val name = Paths.get(f).getFileName.toString
          ranges.get(name).forall { case (mn, mx) => mx >= lo && mn < hi }
        }
      }
    }
    val src =
      if (keep.isEmpty) read(spark, root, Some(v)).limit(0)
      else spark.read.parquet(keep.map(f => s"$root/$f"): _*)
    src.filter(c(statCol) >= lo && c(statCol) < hi)
  }

  /** APPEND commit: publish a new version whose manifest = the previous
    * latest version's files + `df`'s newly staged files — the
    * append-only table shape a streaming sink needs (each micro-batch
    * becomes one version; readers always see a whole number of
    * batches, never a torn one). Same atomic-move publication; on a
    * lost race the loser re-reads the NEW latest manifest so no
    * concurrent append is dropped. */
  def commitAppend(df: DataFrame, root: String): Long = {
    val newFiles = stageData(df, root)
    require(newFiles.nonEmpty, "refusing to append an empty batch")
    publishRebased(root)(prev => prev ++ newFiles)
  }

  /** Copy-on-write DELETE (the erasure primitive — GDPR-style "remove
    * every row matching `predicate`"): publish a new version whose
    * manifest carries UNTOUCHED files by reference and replaces only the
    * files that actually contain matches with filtered rewrites. File
    * granularity is what makes erasure affordable at 100 TB: a delete
    * keyed like the table's clustering touches a handful of files, not
    * the table (pair with [[Manifest.stageClustered]]-style layout).
    * Readers on older versions still see the pre-delete data until
    * [[vacuum]] — physical erasure completes when vacuum drops the old
    * manifests, the two-phase contract every table format has.
    * Returns (newVersion, carriedFiles, rewrittenFiles). */
  /** (continued) Concurrency: the publication rides [[publishRebased]],
    * so a delete racing a [[commitAppend]] cannot drop the appended
    * files — on a lost race the rebase re-probes exactly the files the
    * winner added (idempotent bookkeeping below) and rewrites any that
    * match before re-attempting. A race against a writer that REMOVED a
    * file this delete already rewrote (concurrent delete/delete) is a
    * genuine write-write conflict and aborts with
    * ConcurrentModificationException — the table-format answer; retry
    * the whole delete against the new version. `raceHook` runs once
    * after the initial probe/rewrite, before the first publication
    * attempt — the deterministic interleaving seam SnapshotsSpec uses to
    * prove the rebase (no-op in production use). */
  def commitDelete(spark: SparkSession, root: String,
      predicate: org.apache.spark.sql.Column,
      raceHook: () => Unit = () => ()): (Long, Int, Int) = {
    import org.apache.spark.sql.functions.{coalesce, input_file_name, lit, not}
    latestVersion(root).getOrElse(
      throw new IllegalArgumentException(s"no committed snapshot at $root"))
    // keep rows where the predicate is NOT TRUE: a NULL-evaluating
    // predicate (e.g. equality on a nullable column) must KEEP the row —
    // filter(!predicate) silently erased it (Not(NULL) = NULL)
    val keepPred = not(coalesce(predicate, lit(false)))
    // idempotent probe bookkeeping across rebase attempts: every file
    // ever probed maps to touched/untouched; rewrites accumulate
    val probed = scala.collection.mutable.Map.empty[String, Boolean]
    val rewrites = scala.collection.mutable.ArrayBuffer.empty[String]
    def probeAndRewrite(files: Seq[String]): Unit = {
      val fresh = files.filterNot(probed.contains)
      if (fresh.isEmpty) return
      // file-granular match probe: one pruned pass, #files-bounded result
      val touchedAbs = spark.read.parquet(fresh.map(f => s"$root/$f"): _*)
        .withColumn("__f", input_file_name())
        .filter(predicate)
        .select("__f").distinct().collect().map(_.getString(0)).toSet
      def isTouched(rel: String) =
        touchedAbs.exists(a => a.endsWith(rel) || a.endsWith(s"/$rel"))
      val (touched, untouched) = fresh.partition(isTouched)
      untouched.foreach(probed(_) = false)
      touched.foreach(probed(_) = true)
      if (touched.nonEmpty)
        rewrites ++= stageData(
          spark.read.parquet(touched.map(f => s"$root/$f"): _*)
            .filter(keepPred), root)
    }
    var hookPending = true
    var carriedCount = 0
    val v = publishRebased(root) { latest =>
      probeAndRewrite(latest)
      val gone = probed.collect {
        case (f, true) if !latest.contains(f) => f }
      if (gone.nonEmpty)
        throw new java.util.ConcurrentModificationException(
          s"concurrent writer removed files this delete rewrote " +
            s"(${gone.mkString(", ")}); retry the delete against the " +
            "new version")
      val carried = latest.filter(f => !probed(f))
      carriedCount = carried.size
      // a delete matching every row publishes an EMPTY table version
      // (the rewrite's 0-row part file carries the schema); an empty
      // file list here is the writer corner of producing no files at
      // all and is rejected by publishRebased's nonEmpty require
      if (hookPending) { hookPending = false; raceHook() }
      carried ++ rewrites
    }
    (v, carriedCount, rewrites.size)
  }

  /** MERGE (the upsert primitive — the table-format `MERGE INTO` in one
    * batch): apply a change set keyed on `key` — matched rows are
    * REPLACED by their change row (or DELETED when the change's
    * `deleteCol` is true), unmatched non-delete changes INSERT — and
    * publish the result as one new version. File-granular like
    * [[commitDelete]]: untouched files carry by reference; only files
    * actually holding a matched key are rewritten (matched rows
    * removed — their replacements ride the single staged upsert batch,
    * which also carries the inserts). A tombstone for an absent key is
    * a no-op, not an error (CDC streams routinely replay tombstones).
    * Change keys must be unique per batch — ENFORCED with a loud
    * batch-sized check before anything stages (real MERGE INTO aborts
    * on multiple source matches; silently staging every duplicate
    * would publish duplicate-key rows in the new version). Last-writer
    * semantics need an ordering column — pre-collapse with
    * [[graft.ops.Events]]-style latest-per-key before calling.
    *
    * Concurrency rides [[publishRebased]] with [[commitDelete]]'s
    * idempotent probe bookkeeping: a racing append's files are
    * re-probed on rebase; a racing writer removing a file this merge
    * rewrote aborts with ConcurrentModificationException. Returns
    * (newVersion, carriedFiles, rewrittenOrAddedFiles). */
  def commitMerge(spark: SparkSession, root: String, changes: DataFrame,
      key: String, deleteCol: String = "_delete",
      raceHook: () => Unit = () => ()): (Long, Int, Int) = {
    import org.apache.spark.sql.functions.{broadcast, coalesce, col, count, input_file_name, lit, not}
    latestVersion(root).getOrElse(
      throw new IllegalArgumentException(s"no committed snapshot at $root"))
    // unique-key precondition, checked LOUDLY before anything stages:
    // one change-batch-sized aggregate (the bitmapDistinct precondition
    // discipline applied at the driver, since merge is an action)
    require(changes.groupBy(col(key)).agg(count(lit(1)).as("__n"))
        .filter(col("__n") > 1).isEmpty,
      s"commitMerge requires unique change keys per batch (MERGE INTO " +
        s"aborts on multiple source matches); collapse to latest-per-" +
        s"key on '$key' with an explicit ordering first")
    val dataCols = changes.columns.filterNot(_ == deleteCol).map(col(_))
    val upserts = changes
      .filter(not(coalesce(col(deleteCol), lit(false))))
      .select(dataCols: _*)
    val keys = changes.select(col(key)).distinct()
    val probed = scala.collection.mutable.Map.empty[String, Boolean]
    val rewrites = scala.collection.mutable.ArrayBuffer.empty[String]
    def probeAndRewrite(files: Seq[String]): Unit = {
      val fresh = files.filterNot(probed.contains)
      if (fresh.isEmpty) return
      val touchedAbs = spark.read.parquet(fresh.map(f => s"$root/$f"): _*)
        .withColumn("__f", input_file_name())
        .join(broadcast(keys), Seq(key))
        .select("__f").distinct().collect().map(_.getString(0)).toSet
      def isTouched(rel: String) =
        touchedAbs.exists(a => a.endsWith(rel) || a.endsWith(s"/$rel"))
      val (touched, untouched) = fresh.partition(isTouched)
      untouched.foreach(probed(_) = false)
      touched.foreach(probed(_) = true)
      if (touched.nonEmpty)
        rewrites ++= stageData(
          spark.read.parquet(touched.map(f => s"$root/$f"): _*)
            .join(broadcast(keys), Seq(key), "left_anti"), root)
    }
    // the upsert batch stages ONCE — inserts and replacements share it
    // (an all-tombstone batch stages no files; fine, the manifest keeps
    // the carried + rewritten survivors)
    val upsertFiles = stageData(upserts, root)
    var hookPending = true
    var carriedCount = 0
    val v = publishRebased(root) { latest =>
      probeAndRewrite(latest)
      val gone = probed.collect {
        case (f, true) if !latest.contains(f) => f }
      if (gone.nonEmpty)
        throw new java.util.ConcurrentModificationException(
          s"concurrent writer removed files this merge rewrote " +
            s"(${gone.mkString(", ")}); retry the merge against the " +
            "new version")
      val carried = latest.filter(f => !probed(f))
      carriedCount = carried.size
      if (hookPending) { hookPending = false; raceHook() }
      carried ++ rewrites ++ upsertFiles
    }
    (v, carriedCount, rewrites.size + upsertFiles.size)
  }

  /** COMPACTION (the OPTIMIZE primitive): rewrite the current version's
    * data into `targetFiles` files and publish the result as a new
    * version — the small-files answer for a table fed by streaming
    * appends (each micro-batch commit leaves one small file; scan cost
    * and manifest length grow per batch until someone bin-packs).
    * Contents are IDENTICAL by construction — compaction is pure
    * physical reorganization, which is what lets readers keep using the
    * table mid-compaction (snapshot isolation) and lets [[vacuum]]
    * reclaim the small files once the retention window passes.
    *
    * Concurrency rides [[publishRebased]] like [[commitDelete]]: files
    * a concurrent append adds after the compaction read simply CARRY
    * into the new manifest uncompacted (they'll be picked up by the
    * next compaction — no data loss, no conflict), while a concurrent
    * writer REMOVING a compacted source file (a racing delete) aborts
    * with ConcurrentModificationException. Returns
    * (newVersion, filesBefore, filesAfter). */
  def compact(spark: SparkSession, root: String,
      targetFiles: Int = 1, raceHook: () => Unit = () => ()): (Long, Int, Int) = {
    require(targetFiles >= 1, s"targetFiles >= 1, got $targetFiles")
    val v = latestVersion(root).getOrElse(
      throw new IllegalArgumentException(s"no committed snapshot at $root"))
    val source = filesOf(root, v)
    val rewritten = stageData(
      spark.read.parquet(source.map(f => s"$root/$f"): _*)
        .coalesce(targetFiles), root)
    var hookPending = true
    val newV = publishRebased(root) { latest =>
      val gone = source.filterNot(latest.contains)
      if (gone.nonEmpty)
        throw new java.util.ConcurrentModificationException(
          s"concurrent writer removed compacted source files " +
            s"(${gone.mkString(", ")}); retry the compaction")
      if (hookPending) { hookPending = false; raceHook() }
      latest.filterNot(source.contains) ++ rewritten
    }
    (newV, source.size, rewritten.size)
  }

  /** File-level delta between two versions: the rows of every file that
    * `toV`'s manifest lists and `fromV`'s does not. For append-only
    * histories this IS the data that arrived in between — recovered
    * from two manifest reads, no row diffing, no change journal: the
    * incremental-consumer shape where a downstream view reads each
    * version delta exactly once ([[graft.ops.Cdc.mergeAggState]] is the
    * canonical consumer, and its insert-only contract is the same
    * contract stated here: COW deletes rewrite files, so a delta across
    * a delete would re-surface rewritten rows — consume appends only). */
  def readVersionDelta(spark: SparkSession, root: String,
      fromV: Long, toV: Long): DataFrame = {
    require(fromV < toV, s"need fromV < toV, got $fromV >= $toV")
    val dir = manifestDir(root)
    def filesOf(v: Long): Seq[String] = {
      val p = dir.resolve(s"v$v.list")
      require(Files.exists(p), s"version $v was never published at $root")
      Files.readAllLines(p).asScala.toSeq.filter(_.nonEmpty)
    }
    val before = filesOf(fromV).toSet
    val added = filesOf(toV).filterNot(before)
    require(added.nonEmpty, s"no files added between v$fromV and v$toV")
    spark.read.parquet(added.map(f => s"$root/$f"): _*)
  }

  /** Garbage-collect staging data: delete every file under `data/` that
    * no RETAINED manifest references, then drop manifests older than
    * `keepLast` versions. Time travel keeps working for the retained
    * window; orphan stages from crashed writers go away. Returns the
    * number of data files deleted. Safe ordering: manifests are removed
    * FIRST so a concurrent reader can never resolve a version whose
    * files are being deleted (it fails at manifest resolution instead —
    * the table-format vacuum contract). */
  def vacuum(root: String, keepLast: Int = 2): Int = {
    require(keepLast >= 1, s"must retain at least 1 version, got $keepLast")
    val dir = manifestDir(root)
    val versions = listDir(dir)
      .flatMap(p => versionOf(p).map(_ -> p)).sortBy(_._1)
    val (drop, keep) = versions.splitAt(math.max(0, versions.size - keepLast))
    drop.foreach { case (_, p) => Files.deleteIfExists(p) }
    // OPEN BRANCHES keep their references live: a vacuum racing a WAP
    // audit must not reclaim files only a branch manifest points at
    val branchLists = {
      val b = dir.resolve("branches")
      if (!Files.exists(b)) Seq.empty
      else listDir(b).filter(Files.isDirectory(_))
        .flatMap(bd => listDir(bd).filter(p => versionOf(p).isDefined))
    }
    val live = (keep.map(_._2) ++ branchLists).flatMap { p =>
      Files.readAllLines(p).asScala.filter(_.nonEmpty)
    }.toSet
    // a live stage's _stats sidecar must survive with its files
    val liveStages = live.map(f => f.split("/").take(2).mkString("/"))
    val dataRoot = Paths.get(root, "data")
    if (!Files.exists(dataRoot)) return 0
    var deleted = 0
    val walk = Files.walk(dataRoot)
    val entries = try walk.iterator().asScala.toSeq finally walk.close()
    entries.reverse.foreach { p =>
      if (Files.isRegularFile(p)) {
        val rel = Paths.get(root).relativize(p).toString
        val keepIt = live.contains(rel) ||
          (p.getFileName.toString == "_stats" &&
            liveStages.contains(rel.split("/").take(2).mkString("/")))
        if (!keepIt) { Files.deleteIfExists(p); deleted += 1 }
      } else if (Files.isDirectory(p) && p != dataRoot) {
        // prune now-empty stage dirs (best effort)
        try Files.delete(p) catch { case _: Exception => () }
      }
    }
    deleted
  }

  /** Read a snapshot: the latest published version, or `asOf` a specific
    * one. Plans a scan over exactly the manifest's files — uncommitted
    * staging data is structurally invisible. */
  def read(spark: SparkSession, root: String,
      asOf: Option[Long] = None): DataFrame = {
    val v = asOf.orElse(latestVersion(root)).getOrElse(
      throw new IllegalArgumentException(s"no committed snapshot at $root"))
    val list = manifestDir(root).resolve(s"v$v.list")
    require(Files.exists(list), s"version $v was never published at $root")
    val files = Files.readAllLines(list).asScala.toSeq
      .filter(_.nonEmpty).map(f => s"$root/$f")
    require(files.nonEmpty, s"version $v has an empty manifest at $root")
    spark.read.parquet(files: _*)
  }

  /** Create `branch` at the CURRENT main state — the write-audit-publish
    * (WAP) entry point: branch v1 references exactly main's latest file
    * list (no data copied — manifests are root-relative into the shared
    * `data/` pool), and the base main version is recorded for
    * [[fastForward]]'s conflict check. Returns the base version. */
  def createBranch(root: String, branch: String): Long = {
    val base = latestVersion(root).getOrElse(
      throw new IllegalArgumentException(s"no committed snapshot at $root"))
    val dir = branchDir(root, branch)
    // the base file is the existence token, written CREATE_NEW so two
    // racing createBranch calls decide a single winner ATOMICALLY at the
    // filesystem (a check-then-write would let the loser overwrite the
    // winner's base and publish v2 on top of its v1, silently breaking
    // the put-if-absent discipline publishRebasedAt exists for)
    try Files.write(dir.resolve("base"), base.toString.getBytes("UTF-8"),
      java.nio.file.StandardOpenOption.CREATE_NEW)
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        throw new IllegalArgumentException(
          s"branch '$branch' already exists at $root")
    }
    val v = publishRebasedAt(dir)(_ => filesOf(root, base))
    // v != 1 means manifests predate our base token — a dropBranch raced
    // this create halfway; surface it rather than adopt the orphan state
    if (v != 1L)
      throw new java.util.ConcurrentModificationException(
        s"branch '$branch' had stale manifests at creation (v$v); " +
          "drop and re-create it")
    base
  }

  /** Append a batch to `branch` — staged into the shared data pool,
    * published only into the branch's manifest line: main readers never
    * see it until [[fastForward]]. Same rebase loop as
    * [[commitAppend]], so concurrent branch writers compose. */
  def commitAppendToBranch(df: DataFrame, root: String,
      branch: String): Long = {
    val dir = branchDirExisting(root, branch)
    val newFiles = stageData(df, root)
    require(newFiles.nonEmpty, "refusing to append an empty batch")
    publishRebasedAt(dir)(prev => prev ++ newFiles)
  }

  /** Read `branch`'s latest state (the audit side of WAP). */
  def readBranch(spark: SparkSession, root: String,
      branch: String): DataFrame = {
    val dir = branchDirExisting(root, branch)
    val v = latestVersionAt(dir).getOrElse(
      throw new IllegalArgumentException(
        s"branch '$branch' does not exist at $root"))
    val files = filesAt(dir, v).map(f => s"$root/$f")
    require(files.nonEmpty, s"branch '$branch' has an empty manifest")
    spark.read.parquet(files: _*)
  }

  /** PUBLISH (the P of WAP): fast-forward main to the branch's audited
    * state in one conditional manifest link. Requires main to still sit
    * at the branch's recorded base version — if any writer advanced
    * main since the branch was cut, the audit ran against a stale base
    * and the publish aborts with ConcurrentModificationException
    * (re-branch from the new main and re-audit; blind re-application
    * would drop the interleaved commit's files). Returns the new main
    * version. */
  def fastForward(root: String, branch: String): Long = {
    val dir = branchDirExisting(root, branch)
    val base = Files.readString(dir.resolve("base")).trim.toLong
    val bv = latestVersionAt(dir).getOrElse(
      throw new IllegalStateException(s"branch '$branch' has no manifest"))
    val files = filesAt(dir, bv)
    publishRebased(root) { _ =>
      val cur = latestVersion(root).getOrElse(0L)
      if (cur != base)
        throw new java.util.ConcurrentModificationException(
          s"main advanced v$base -> v$cur since branch '$branch' was " +
            "cut; re-branch from the new main and re-audit")
      files
    }
  }

  /** Remove `branch`'s manifest line (after [[fastForward]] or an
    * abandoned audit) — open branches pin their files against
    * [[vacuum]], so dropping the branch is what releases them. */
  def dropBranch(root: String, branch: String): Unit = {
    val dir = branchDirExisting(root, branch)
    listDir(dir).foreach(Files.deleteIfExists(_))
    Files.deleteIfExists(dir)
  }

  /** Schema-evolved read: like [[read]] but unions columns ACROSS the
    * version's files (`mergeSchema`) — the additive-evolution contract
    * every table format promises: a [[commitAppend]] batch may carry NEW
    * columns; old files surface them as NULL, old readers (plain
    * [[read]]) keep seeing their original schema untouched. Kept as a
    * separate entry point because schema merging pays a per-file footer
    * reconciliation at planning time — the evolved read is the opt-in
    * path, not a tax on every scan. Column REMOVAL/retyping is not
    * evolution (it breaks old readers) and has no API here by design. */
  def readEvolved(spark: SparkSession, root: String,
      asOf: Option[Long] = None): DataFrame = {
    val v = asOf.orElse(latestVersion(root)).getOrElse(
      throw new IllegalArgumentException(s"no committed snapshot at $root"))
    val list = manifestDir(root).resolve(s"v$v.list")
    require(Files.exists(list), s"version $v was never published at $root")
    val files = Files.readAllLines(list).asScala.toSeq
      .filter(_.nonEmpty).map(f => s"$root/$f")
    require(files.nonEmpty, s"version $v has an empty manifest at $root")
    spark.read.option("mergeSchema", "true").parquet(files: _*)
  }
}
