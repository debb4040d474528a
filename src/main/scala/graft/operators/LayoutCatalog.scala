package graft.operators

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Durable, corpus-snapshot-keyed home for layout artifacts — the
  * catalog behind the bucketed edge corpus ([[EdgeLayout]]) and the
  * persisted IVF centroids ([[Ivf.persistedCentroidsCosine]]).
  *
  * The 100 TB contract these artifacts exist for is "pay the shuffle /
  * training once AT INGEST, then every job reuses it" — which only
  * holds if the artifact survives the JVM that built it. Until round 9
  * both artifacts lived under run-tagged `java.io.tmpdir` paths keyed
  * in process-local maps: collision-safe, but every new JVM re-paid
  * the edge derivation (~14 s at sf0.1) and the Lloyd training. This
  * catalog promotes them to durable artifacts:
  *
  *   - **Root**: `$GRAFT_LAYOUT_ROOT` (env), else the
  *     `graft.layout.root` system property, else
  *     `spark-warehouse/graft_layouts` — resolved per call so tests
  *     can redirect it.
  *   - **Key**: every artifact directory name embeds a CONTENT
  *     FINGERPRINT of the corpus files it was derived from
  *     (name|size|mtime per file, hashed). A corpus snapshot maps to
  *     exactly one artifact; a changed snapshot maps to a NEW
  *     directory, never a silent stale read.
  *   - **Commit protocol**: builders write into a process-tagged
  *     `.tmp_*` sibling and publish with an atomic directory rename.
  *     If the rename loses a race (another JVM published the same
  *     fingerprint first) the loser deletes its temp and reads the
  *     winner — identical bytes by construction, since every build is
  *     deterministic in the fingerprinted inputs. A crashed builder
  *     leaves only an unpublished `.tmp_*` orphan, never a torn
  *     published artifact.
  *   - **Retention**: publishing fingerprint F for corpus base B
  *     deletes B's siblings with OTHER fingerprints (their snapshot is
  *     gone, so any reader of them is already stale) and sweeps
  *     `.tmp_*` orphans older than a day. Disk use is therefore
  *     bounded at one live artifact per (kind, corpus), fixing the
  *     round-9 unbounded tmpdir accumulation.
  *
  * Versioning: bump the artifact kind's version segment (e.g.
  * `edges_v2`) whenever the BUILD semantics change, so an upgraded
  * engine never misreads an old layout as current.
  */
object LayoutCatalog {

  /** Per-process tag for unpublished temp builds (pid + JVM start
    * nanos): concurrent builders never share a temp path. */
  val processTag: String =
    java.lang.Long.toHexString(ProcessHandle.current().pid()) + "x" +
      java.lang.Long.toHexString(System.nanoTime() & 0xffffffffL)

  /** Catalog root — re-read per call (not cached) so a test can
    * point the catalog at a scratch directory via the system
    * property. */
  def root: File = new File(
    sys.env.getOrElse("GRAFT_LAYOUT_ROOT",
      sys.props.getOrElse("graft.layout.root",
        "spark-warehouse/graft_layouts")))

  /** Content fingerprint of `tables` under corpus dir `dir`:
    * SHA-256 over each file's (name, size, mtime), 16 hex chars. A
    * table may be a single `.parquet` file or a directory of parts —
    * both fingerprint every regular file under the path. Missing
    * paths fingerprint as their name alone (stable, but then unable
    * to detect content changes — callers should pass tables that
    * exist). */
  def fingerprint(dir: String, tables: Seq[String]): String = {
    val sb = new StringBuilder
    tables.sorted.foreach { t =>
      val f = new File(dir, s"$t.parquet")
      def add(g: File): Unit = {
        sb.append(g.getName).append('|').append(g.length())
          .append('|').append(g.lastModified()).append('\n')
      }
      if (f.isDirectory)
        f.listFiles().sortBy(_.getName).filter(_.isFile).foreach(add)
      else if (f.isFile) add(f)
      else sb.append(t).append("|absent\n")
    }
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.digest(sb.toString.getBytes(StandardCharsets.UTF_8))
      .take(8).map(b => f"${b & 0xff}%02x").mkString
  }

  /** Filesystem-safe corpus base name ("/root/testdata/sf0.001" →
    * "root_testdata_sf0.001"). */
  def sanitize(s: String): String =
    s.replaceAll("[^A-Za-z0-9._-]+", "_").replaceAll("^_+", "")

  /** Deterministic 16-hex content key of a predicate list (the
    * expressions' SQL forms, hashed). Split-artifact names (LSM
    * archive / segment / compacted) embed it so two different delta
    * splits can NEVER resolve to the same artifact: without it, a
    * grown predicate list silently reused the shorter list's archive
    * — which still contained the new days' rows — and the union view
    * double-counted them. 64 bits of digest, not 32: a collision at
    * the same (dir, tag, segment position) would silently resurrect
    * exactly the double-count bug this key exists to prevent, and
    * 32-bit birthday risk is non-trivial for long-lived many-split
    * deployments; name length is not a constraint here. */
  def predKey(preds: Seq[org.apache.spark.sql.Column]): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.digest(preds
        .map(c => org.apache.spark.sql.graftbridge.Bridge.expression(c).sql)
        .mkString("|").getBytes(StandardCharsets.UTF_8))
      .take(8).map(b => f"${b & 0xff}%02x").mkString
  }

  /** The published artifact directory for (kind, corpus base,
    * fingerprint) — e.g. `<root>/edges_v2/sf0.001_ab12cd34ef567890`. */
  def publishedDir(kind: String, base: String, fp: String): File =
    new File(new File(root, kind), s"${base}_$fp")

  /** True iff `dir` is a fully published artifact. The `_meta` commit
    * marker is written into the TEMP directory before the atomic
    * rename, so publication is a single rename: a dir without `_meta`
    * can only be a torn relic of a pre-v2 builder (or a crashed
    * non-atomic filesystem move) and must be rebuilt. */
  def isPublished(dir: File): Boolean = new File(dir, "_meta").isFile

  /** Build-then-publish: calls `build(tmpDir)` to produce the artifact
    * under an unpublished temp sibling, then atomically renames it to
    * `dest` and stamps the commit marker. Returns `dest`. If another
    * process published first, the local temp is discarded and the
    * winner is used. Also applies the retention sweep for `dest`'s
    * corpus base. */
  def buildAndPublish(dest: File, build: File => Unit): File = {
    if (isPublished(dest)) return dest
    val parent = dest.getParentFile
    parent.mkdirs()
    val tmp = new File(parent, s".tmp_${processTag}_${dest.getName}")
    deleteRecursively(tmp)
    build(tmp)
    // Stamp the commit marker INSIDE the temp dir so that publication
    // is the single atomic rename below: a published dest always has
    // _meta from its first visible instant, and "dest exists without
    // _meta" can never describe a freshly published artifact — so the
    // torn-dest cleanup cannot race a concurrent winner's data.
    Files.write(new File(tmp, "_meta").toPath,
      s"fp=${dest.getName}\nbuilt_by=$processTag\n"
        .getBytes(StandardCharsets.UTF_8))
    if (dest.exists() && !isPublished(dest)) deleteRecursively(dest)
    val renamed = tmp.renameTo(dest)
    if (renamed) {
      buildsPublished.incrementAndGet()
    } else {
      // lost the publish race (or dest appeared concurrently): the
      // winner's bytes are identical by deterministic construction
      deleteRecursively(tmp)
      require(isPublished(dest),
        s"layout publish failed and no published artifact at $dest")
    }
    retain(dest)
    dest
  }

  /** Retention: keep only `published` among its corpus base's
    * fingerprint siblings, and sweep day-old unpublished temps. A
    * sibling counts as a stale fingerprint of the SAME corpus only if
    * its name is exactly `base + '_' + 16-hex-fingerprint` — a bare
    * startsWith would make sanitized bases prefix-ambiguous (corpus
    * `sf1` publishing must not delete the live artifact of corpus
    * `sf1_b`, whose name also starts with `sf1_`). */
  private def retain(published: File): Unit = {
    val name = published.getName
    // publishedDir always appends '_' + fingerprint, but retain must
    // stay total over arbitrary dest names: skip retention rather
    // than throw on a name with no underscore
    if (name.lastIndexOf('_') < 0) return
    val base = name.substring(0, name.lastIndexOf('_'))
    val sameCorpus =
      (java.util.regex.Pattern.quote(base) + "_[0-9a-f]{16}").r
    val dayAgo = System.currentTimeMillis() - 24L * 3600 * 1000
    Option(published.getParentFile.listFiles()).getOrElse(Array.empty)
      .foreach { f =>
        val stale =
          (sameCorpus.matches(f.getName) && f.getName != name) ||
            (f.getName.startsWith(".tmp_") && f.lastModified() < dayAgo)
        if (stale) deleteRecursively(f)
      }
  }

  /** Count of artifacts PUBLISHED by this process — a test hook: a
    * warm resolve from disk must not move it. */
  val buildsPublished = new java.util.concurrent.atomic.AtomicLong()

  def deleteRecursively(f: File): Unit = {
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
    f.delete(): Unit
  }
}
